package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the filter/scrub/split trio every
  * large-scale training-data pipeline runs after dedup and quality
  * scoring (the reference's cleaning stage, re-aimed at documents the
  * way C4/Gopher-style pipelines are):
  *
  *  - repetition signals (duplicate words / duplicate word-bigrams):
  *    boilerplate and spam score high and get filtered;
  *  - PII redaction (emails, phone numbers → placeholder tokens);
  *  - deterministic content-hash train/validation split.
  *
  * All pure Column algebra over one scan — no shuffle, no UDFs; the
  * bigram distinct count reuses the native `shingles_of` expression.
  */
object Curation {

  /** Repetition signals per document (C4/Gopher-style quality filters):
    * `dup_word_ratio` = 1 − |distinct tokens| / |tokens|,
    * `dup_2gram_ratio` = 1 − |distinct word bigrams| / |bigrams|.
    * High values flag boilerplate (navigation bars, keyword stuffing,
    * generated spam) that survives exact and near dedup because each
    * DOCUMENT is unique while its CONTENT is internally repetitive.
    *
    * One projected token array feeds both ratios; distinct bigrams come
    * from the native `shingles_of` (single pass, insertion-order
    * distinct). A one-token document has no bigram: its ratio is 0 by
    * convention (nothing repeats).
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nToks = size(col("_rep_toks"))
    df.withColumn("_rep_toks", toks)
      .withColumn("dup_word_ratio",
        round(lit(1d) - size(array_distinct(col("_rep_toks"))).cast("double") / nToks, 4))
      .withColumn("dup_2gram_ratio",
        round(lit(1d) -
          size(call_function("shingles_of", col("_rep_toks"), lit(2))).cast("double")
            / greatest(nToks - 1, lit(1)), 4))
      .drop("_rep_toks")
  }

  /** RE2/Java-portable PII patterns (mirrored verbatim by the DuckDB
    * oracle). Deliberately precision-leaning: a training-corpus scrub
    * wants no false redaction of ordinary prose.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Replace every email / phone match with a placeholder token. Pure
    * `regexp_replace` — codegen'd, streams through the scan.
    */
  def redactPII(text: Column,
                emailToken: String = "<EMAIL>",
                phoneToken: String = "<PHONE>"): Column =
    regexp_replace(regexp_replace(text, EmailPattern, emailToken),
      PhonePattern, phoneToken)

  /** Count of PII matches (for scrub-rate monitoring dashboards). Phones
    * are counted AFTER email redaction, mirroring [[redactPII]]'s order —
    * a digit run inside an email address must not count twice, so the
    * count equals the placeholders actually emitted. Pass the SAME
    * `emailToken` given to [[redactPII]]: a custom digit-bearing token
    * would otherwise be phone-counted here but not in the redaction.
    */
  def piiMatchCount(text: Column, emailToken: String = "<EMAIL>"): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(regexp_replace(text, EmailPattern, emailToken),
        lit(PhonePattern), lit(0)))

  /** Deterministic train/validation split on CONTENT hash: the last hex
    * nibble of md5(text) (uniform over 16 values) goes to `train` when
    * below `trainSixteenths`. Content-derived, so the assignment is
    * stable across runs, partitionings, and engines — row order or
    * random seeds never leak validation documents into training. Exact
    * duplicates land on the same side by construction (one more reason
    * dedup runs first).
    */
  def hashSplit(text: Column, trainSixteenths: Int = 14): Column = {
    require(trainSixteenths >= 1 && trainSixteenths <= 15,
      s"hashSplit: trainSixteenths must be in [1,15], got $trainSixteenths")
    val nibble = instr(lit("0123456789abcdef"), substring(md5(text), 32, 1)) - 1
    when(nibble < trainSixteenths, "train").otherwise("val")
  }
}
