package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. worked example: {low:5, lower:2, newest:6, widest:3}
  private def classic = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("bpeVocab + bpePairCounts: word frequencies and adjacent pairs by hand") {
    val v = Tokenizer.bpeVocab(classic, "text")
    assert(v.collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
      == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
    val pairs = Tokenizer.bpePairCounts(v)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("e", "s")) == 9L)   // newest + widest
    assert(pairs(("s", "t")) == 9L)
    assert(pairs(("t", Tokenizer.EndOfWord)) == 9L)
    assert(pairs(("l", "o")) == 7L)   // low + lower
    assert(pairs(("o", "w")) == 7L)
    assert(pairs(("w", Tokenizer.EndOfWord)) == 5L)
  }

  test("learnBpeMerges: the classic first five merges, deterministic tie-breaks") {
    val m = Tokenizer.learnBpeMerges(classic, "text", nMerges = 5)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // freq-9 three-way tie (e,s)(s,t)(t,</w>) breaks lexicographically to
    // (e,s); the chain then follows the paper: es+t, est+</w>, then the
    // freq-7 (l,o)(o,w) tie breaks to (l,o), enabling lo+w
    assert(m.toSeq == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", Tokenizer.EndOfWord, 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("overlapping pairs merge greedily left-first; vocabulary exhaustion stops early") {
    val aaaa = Seq((1L, "aaaa")).toDF("doc_id", "text")
    // pairs of a,a,a,a,</w>: (a,a)=3 (every adjacent position counts)
    val pairs = Tokenizer.bpePairCounts(Tokenizer.bpeVocab(aaaa, "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("a", "a")) == 3L)
    // merge (a,a): greedy leftmost → [aa, aa, </w>], NOT [a, aa, a…]
    val merged = Tokenizer.applyMerge(Tokenizer.bpeVocab(aaaa, "text"), "a", "a")
      .select(Tokenizer.symbolsOf(col("syms"))).as[Seq[String]].head()
    assert(merged == Seq("aa", "aa", Tokenizer.EndOfWord))
    // a two-char word runs out of pairs before 10 merges: stops early
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Tokenizer.learnBpeMerges(tiny, "text", nMerges = 10).collect()
    assert(m.length == 2) // (a,b) then (ab,</w>) — then one symbol left
    intercept[IllegalArgumentException] {
      Tokenizer.learnBpeMerges(tiny, "text", nMerges = 0)
    }
  }

  test("bpeTokenCounts: replayed merges segment exactly as the trained vocab") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", Tokenizer.EndOfWord),
      ("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "low newest"), (2L, "lower")).toDF("doc_id", "text")
    val out = Tokenizer.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // low → [low, </w>] (2); newest → [n, e, w, est</w>] (4)
    // lower → [low, e, r, </w>] (4)
    assert(out == Map(1L -> 6L, 2L -> 4L))
  }
}
