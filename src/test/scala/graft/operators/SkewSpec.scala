package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // hot key "h" with 500 rows over 100 distinct values; cold keys tiny
    val hot = (0 until 500).map(i => ("h", s"v${i % 100}"))
    val cold = Seq(("c1", "x"), ("c1", "x"), ("c2", null))
    (hot ++ cold).toDF("k", "v")
  }

  test("countDistinctSalted equals count_distinct exactly") {
    val expected = skewed.groupBy("k").agg(count_distinct(col("v")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.countDistinctSalted(skewed, Seq("k"), "v", "ndv", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
    assert(salted("h") == 100L && salted("c1") == 1L && salted("c2") == 0L)
  }

  test("keyHistogram surfaces the hot key first with its share") {
    val h = Skew.keyHistogram(skewed, Seq("k"), topN = 2).collect()
    assert(h(0).getString(0) == "h")
    assert(h(0).getLong(1) == 500L)
    assert(h(0).getAs[Double]("share") > 0.99 * 500.0 / 503.0)
  }

  test("saltedJoin matches the plain join and spreads the hot key") {
    // 10k-row hot key (rows DIFFER off-key, the common real shape) plus a
    // tail, joined to a 3-row dim
    val big = ((1 to 10000).map(i => (1L, s"hot$i")) ++
      (2 to 50).map(i => (i.toLong, s"k$i"))).toDF("k", "payload")
    val dim = Seq((1L, "dim1"), (2L, "dim2"), (99L, "unmatched")).toDF("k", "attr")

    val plain = big.join(dim, Seq("k"), "left")
      .groupBy(col("k"), col("attr")).count()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 8, joinType = "left")
      .groupBy(col("k"), col("attr")).count()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(salted == plain)

    // the content salt ACTUALLY spreads the hot key's rows across buckets
    val spread = big.filter(col("k") === 1L)
      .select(Skew.saltColumn(big.columns.map(col).toIndexedSeq, 8).as("s"))
      .select(count_distinct(col("s"))).head().getLong(0)
    assert(spread == 8L, s"hot key occupied $spread of 8 buckets")

    // inner form: 10000 hot-key matches + one k=2 match
    assert(Skew.saltedJoin(big, dim, Seq("k"), 8).count() == 10001)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("k"), 8, joinType = "full")
    }
  }

  test("saltedJoin spreadIdenticalRows covers byte-identical duplicate floods") {
    // all 10k hot rows byte-identical: the content hash maps them to ONE
    // bucket (retry-safe but no spread) — the round-robin mode spreads
    // them and still joins correctly
    val big = ((1 to 10000).map(_ => (1L, "hot")) ++
      (2 to 50).map(i => (i.toLong, s"k$i"))).toDF("k", "payload")
    val dim = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "attr")
    val out = Skew.saltedJoin(big, dim, Seq("k"), buckets = 8,
      spreadIdenticalRows = true)
    assert(out.count() == 10001)
    val perBucket = big.filter(col("k") === 1L)
      .select(pmod(monotonically_increasing_id(), lit(8L)).as("s"))
      .select(count_distinct(col("s"))).head().getLong(0)
    assert(perBucket > 1L, "identical rows must spread over multiple buckets")
  }

  test("saltColumn is deterministic and bounded") {
    val s = skewed.select(Skew.saltColumn(Seq(col("v")), 8).as("salt"))
      .agg(min("salt"), max("salt")).head()
    assert(s.getInt(0) >= 0 && s.getInt(1) < 8)
  }

  test("saltedJoin tolerates map-typed payload columns (salts on hashable cols only)") {
    val big = Seq(
      (1L, Map("a" -> "b"), "x"), (1L, Map("c" -> "d"), "y"),
      (2L, Map.empty[String, String], "z")
    ).toDF("k", "props", "v")
    val small = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, Seq("k"), buckets = 4)
      .select(col("k"), col("v"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "x", "one"), (1L, "y", "one"), (2L, "z", "two")))
  }
}
