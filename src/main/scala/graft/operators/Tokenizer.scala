package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich, Haddow & Birch,
  * ACL 2016) — the tokenizer-training step of a training-data pipeline,
  * distributed the way the published recipe scales: the corpus is
  * touched ONCE (a word-frequency aggregate — the only corpus-scale
  * scan), and the merge loop iterates over the compact (word, count)
  * vocabulary table, never the corpus. Each iteration is one
  * pair-frequency aggregate over vocab plus a 1-row argmax collect
  * (bounded, like a k-means centroid pull) — a FIT operator, not a
  * per-row transform.
  *
  * Symbol-sequence representation: symbols ride a single string with
  * every symbol wrapped in its own `\u0001` pair —
  * `␁a␁␁b␁␁c␁␁</w>␁`. A merge of (l, r) is then the plain string
  * replacement `␁l␁␁r␁ → ␁lr␁`, which is EXACTLY greedy leftmost
  * non-overlapping BPE application: the match consumes only its own
  * delimiters, so back-to-back occurrences (`l r l r`) each match, while
  * overlapping ones (`a a a` under (a,a)) collapse left-first — and
  * plain `replace` has identical semantics in Spark and DuckDB, which is
  * what makes the k-step unrolled oracle possible (`q_bpe_merges`).
  * Symbols never contain the separator; a mid-symbol false match is
  * impossible because every boundary in the search string is a
  * delimiter pair.
  */
object Tokenizer {
  val Sep = "\u0001"
  val EndOfWord = "</w>"

  /** word → wrapped initial symbols: `␁c₁␁␁c₂␁…␁</w>␁`. */
  private def initialSyms(word: Column): Column =
    concat(regexp_replace(word, "(.)", Sep + "$1" + Sep),
      lit(Sep + EndOfWord + Sep))

  /** Wrapped symbol string → symbol array (split on runs of separators,
    * dropping the empty edges).
    */
  def symbolsOf(syms: Column): Column =
    filter(split(syms, s"$Sep+"), s => s =!= "")

  /** One corpus-scale scan: whitespace word frequencies, symbols
    * initialized to characters + the end-of-word marker.
    */
  def bpeVocab(df: DataFrame, textCol: String): DataFrame =
    Spread.compute(df, xxhash64(Cols.qcol(textCol)))
      .select(explode(split(trim(Cols.qcol(textCol)), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", initialSyms(col("word")))

  /** Adjacent-pair frequencies over a vocab (syms, cnt) table: the
    * aggregate each BPE iteration ranks. Weighted by word count; a
    * single-symbol word contributes nothing.
    */
  def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), symbolsOf(col("syms")).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(col("cnt"), explode(transform(
        // sequence is safe: size ≥ 2 here, so the range ascends
        sequence(lit(1), size(col("ss")) - 1),
        j => struct(element_at(col("ss"), j).as("l"),
          element_at(col("ss"), j + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("freq"))

  /** Learn `nMerges` merge rules. Returns (step, merge_left, merge_right,
    * freq) — the merge table IS the trained tokenizer artifact. Ties
    * break (freq desc, l asc, r asc) so training is deterministic and
    * engine-mirrorable. Stops early if the vocabulary runs out of pairs.
    */
  def learnBpeMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"learnBpeMerges: nMerges must be ≥1, got $nMerges")
    val spark = df.sparkSession
    val vocab0 = bpeVocab(df, textCol).cache()
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = bpePairCounts(vocab)
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect() // 1 bounded row per iteration — the argmax
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, f))
        vocab = applyMerge(vocab, l, r)
        step += 1
      }
    }
    val out = spark.createDataFrame(merges.toSeq)
      .toDF("step", "merge_left", "merge_right", "freq")
    out.count() // materialize before releasing the cached base
    vocab0.unpersist()
    out
  }

  /** Apply one merge rule to a vocab's wrapped symbol strings. */
  def applyMerge(vocab: DataFrame, l: String, r: String): DataFrame =
    vocab.withColumn("syms", call_function("replace", col("syms"),
      lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep)))

  /** Segment a corpus with a learned merge list: re-derives each word's
    * symbols by replaying the merges (k chained literal replaces — ONE
    * corpus-scale projection, no joins), and emits per-document BPE
    * token counts. The downstream twin of [[learnBpeMerges]]; the
    * token-count column is what packing/quota operators consume.
    */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val words = Spread.compute(df, Cols.qcol(idCol))
      .select(Cols.qcol(idCol).as("doc_id"),
        explode(split(trim(Cols.qcol(textCol)), "\\s+")).as("word"))
    val merged = merges.foldLeft(initialSyms(col("word"))) {
      case (acc, (l, r)) => call_function("replace", acc,
        lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
    words
      .select(col("doc_id"), size(symbolsOf(merged)).as("word_tokens"))
      .groupBy(col("doc_id"))
      .agg(sum(col("word_tokens")).as("bpe_tokens"))
  }
}
