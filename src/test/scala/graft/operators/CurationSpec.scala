package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: known ratios incl. one-token and fully-repetitive docs") {
    val docs = Seq(
      (1L, "a b c d"),        // all distinct: 0, 0
      (2L, "a a a a"),        // 1 distinct word of 4; 1 distinct bigram of 3
      (3L, "x"),              // one token: both 0 by convention
      (4L, "a b a b a")       // 2 distinct of 5; bigrams ab,ba,ab,ba → 2 of 4
    ).toDF("doc_id", "text")
    val out = Curation.repetitionSignals(docs, "text")
      .select("doc_id", "dup_word_ratio", "dup_2gram_ratio")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((0.0, 0.0)))
    assert(out(2L) == ((0.75, 0.6667)))
    assert(out(3L) == ((0.0, 0.0)))
    assert(out(4L) == ((0.6, 0.5)))
  }

  test("redactPII replaces emails and phones; counts match; prose untouched") {
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org today"),
      (2L, "call +1 (555) 010-7788 or 555-010-9999 now"),
      (3L, "no pii here, just words and the number seven")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Curation.redactPII(col("text")).as("clean"),
        Curation.piiMatchCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("reach me at <EMAIL> today", 1)))
    assert(out(2L) == (("call <PHONE> or <PHONE> now", 2)))
    assert(out(3L) == (("no pii here, just words and the number seven", 0)))
  }

  test("piiMatchCount does not double-count a digit run inside an email") {
    val docs = Seq((1L, "reach 5550107788@carrier.com")).toDF("doc_id", "text")
    val out = docs.select(Curation.redactPII(col("text")).as("clean"),
      Curation.piiMatchCount(col("text")).as("n")).head()
    assert(out.getString(0) == "reach <EMAIL>")
    assert(out.getInt(1) == 1, "one redaction emitted -> count must be 1")
  }

  test("piiMatchCount honors a custom digit-bearing email token") {
    // counting must mask with the SAME token redactPII emits: a
    // digit-bearing token is itself phone-matchable, so the phone pass
    // sees (and replaces) it — the count tracks the replacements actually
    // performed only if both functions share the token
    val docs = Seq((1L, "reach 5550107788@carrier.com or 555-010-9999"))
      .toDF("doc_id", "text")
    val tok = "<pii:00000001>"
    val out = docs.select(
      Curation.redactPII(col("text"), emailToken = tok).as("clean"),
      Curation.piiMatchCount(col("text"), emailToken = tok).as("n")).head()
    // 3 replacements: 1 email, 1 real phone, 1 digit run inside the token
    assert(out.getString(0) == "reach <pii:<PHONE>> or <PHONE>")
    assert(out.getInt(1) == 3, "count must equal the replacements performed")
  }

  test("hashSplit: deterministic, content-based, dups co-assigned, ratio sane") {
    val docs = spark.range(0, 2000)
      .select(col("id"), concat(lit("document number "), col("id")).as("text"))
    val labeled = docs.select(col("id"), col("text"),
      Curation.hashSplit(col("text")).as("s"))
    // deterministic: same content → same side, regardless of row identity
    val twice = labeled.unionByName(labeled)
      .groupBy(col("text")).agg(count_distinct(col("s")).as("sides"))
    assert(twice.agg(max(col("sides"))).head().getLong(0) == 1L)
    // only the two labels, with roughly the 14/16 proportion
    val byLabel = labeled.groupBy(col("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val"))
    val trainFrac = byLabel("train").toDouble / 2000
    assert(trainFrac > 0.8 && trainFrac < 0.95, s"train fraction $trainFrac")
    // bounds check on the knob
    intercept[IllegalArgumentException] {
      Curation.hashSplit(col("text"), trainSixteenths = 0)
    }
  }
}
