package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishTokenCount") {
    val df = Seq("the cat  sat", "hello, world!").toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishTokenCount(col("text")).as("b")).collect()
    assert(out(0).getInt(0) == 3) // double space collapses
    assert(out(1).getInt(0) == 2)
    assert(out(1).getInt(1) == 4) // hello , world !
  }

  test("langId picks the language with most marker words") {
    val df = Seq(
      "the cat is in the house and a dog",
      "el perro y la casa en los campos",
      "le chat et les maisons des villes",
      "der hund ist ein tier und das haus",
      "zzz qqq xxx"
    ).toDF("text")
    val langs = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "fr", "de", "und"))
  }

  test("qualityScore fields on a known sentence") {
    val df = Seq((1L, "the quick fox!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "text").head()
    assert(r.getAs[Int]("n_chars_q") == 14)
    assert(r.getAs[Int]("n_words") == 3)
    assert(r.getAs[Double]("stopword_ratio") == 0.3333) // "the" of 3
    assert(r.getAs[Double]("punct_ratio") == 0.0714)    // 1 of 14
  }

  test("fingerprint: order-sensitive, exact-dup stable") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
