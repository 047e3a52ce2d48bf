package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1L, "John Smith"),    // in-block typo pair with 2
    (2L, "john smyth"),    // folded: blocks "john" both — dist 1
    (3L, "Jon Smith"),     // first-4 typo: block "jon " — MISSED by prefix pass
    (4L, "mary jones"),
    (5L, "mary jonez"),    // dist 1, block "mary"
    (6L, "completely different")
  ).toDF("id", "name")

  test("blockedFuzzyPairs: folded in-block pairs at maxDist; prefix typos miss; id_a < id_b") {
    val pairs = Linkage.blockedFuzzyPairs(people, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 1), (4L, 5L, 1)),
      s"case folds, in-block dist<=1 pairs only, got $pairs")
    // the missed first-4 typo is the DOCUMENTED blocking trade-off: a
    // second pass on an independent key (suffix block) catches it
    val suffixKey = substring(reverse(lower(trim(col("name")))), 1, 4)
    val pass2 = Linkage.blockedFuzzyPairs(people, "id", "name",
        blockKey = Some(suffixKey))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pass2.contains((1L, 3L)),
      s"suffix-block pass must catch the prefix typo, got $pass2")
    // maxDist honored: at 0 only exact folded duplicates pair
    val exact = Linkage.blockedFuzzyPairs(
      people.unionByName(Seq((7L, "JOHN SMITH ")).toDF("id", "name")),
      "id", "name", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 7L)), s"got $exact")
  }

  test("hot block fails loudly instead of going quadratic") {
    val hot = (1 to 50).map(i => (i.toLong, s"aaaa suffix $i")).toDF("id", "name")
    val e = intercept[Exception] {
      Linkage.blockedFuzzyPairs(hot, "id", "name", maxBlockSize = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("block")),
      s"expected the hot-block guard, got $e")
  }

  test("fuzzyDedup: transitive chains collapse to one canonical entity; singletons survive") {
    // chain: A~B (dist 1), B~C (dist 1), but A~C dist 2 — connected
    // components must still make one entity of the three
    val chain = Seq(
      (10L, "acme corp"),
      (11L, "acme corpx"),
      (12L, "acme corpxy"),
      (20L, "zeta llc")
    ).toDF("id", "name")
    val out = Linkage.fuzzyDedup(chain, "id", "name")
      .select("id", "canonical")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L), s"got $out")
    // quality-based survivor policy composes via keepBestPerCluster
    val withQ = chain.withColumn("quality", col("id") % 10)
    val clusters = Linkage.fuzzyDedup(chain, "id", "name")
      .select(col("id"), col("canonical"))
    val best = Dedup.keepBestPerCluster(withQ, clusters, "id", "canonical", "quality")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(best == Set(12L, 20L), s"highest-quality member survives, got $best")
  }
}
