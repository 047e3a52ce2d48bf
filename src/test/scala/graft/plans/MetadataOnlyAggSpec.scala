package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.TableLog

/** The metadata-only aggregate rule: a global COUNT/MIN/MAX the manifest
  * can answer exactly plans as a LocalRelation (zero scan tasks); every
  * gate that could make the metadata answer differ from the scan blocks
  * the rewrite and the ordinary plan runs.
  */
class MetadataOnlyAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("metaagg_").toString + "/t"

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case l: LocalRelation => l }.isDefined &&
      p.collectFirst { case l: LogicalRelation => l }.isEmpty
  }

  private def graftDf(dir: String): DataFrame =
    spark.read.format("graft").load(dir)

  test("count(*)/count(col)/min/max fold from the manifest, zero scan") {
    val dir = tmp()
    val df = Seq(
      (1L, Some(10), 1.5d, "a"),
      (2L, None, -2.0d, "b"),
      (3L, Some(7), 0.25d, "c"),
      (4L, Some(99), 8.5d, "d")
    ).toDF("id", "n", "x", "s").repartition(2)
    TableLog.append(spark, dir, df, statsCols = Seq("id", "n", "x", "s"))

    val agg = graftDf(dir).agg(
      count(lit(1)).as("cnt"), count(col("n")).as("cnt_n"),
      min(col("n")).as("min_n"), max(col("n")).as("max_n"),
      min(col("x")).as("min_x"), max(col("x")).as("max_x"),
      min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    assert(isMetadataOnly(agg), agg.queryExecution.optimizedPlan.toString)
    assert(rows(agg) == Seq(Seq(4L, 3L, 7, 99, -2.0d, 8.5d, 1L, 4L)))

    // same through SQL over a USING graft view
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW meta_v USING graft OPTIONS (path '$dir')")
    val sqlAgg = spark.sql("SELECT count(*) AS c, max(x) AS mx FROM meta_v")
    assert(isMetadataOnly(sqlAgg))
    assert(rows(sqlAgg) == Seq(Seq(4L, 8.5d)))
  }

  test("deletion vectors: count(*) stays metadata-exact, min/max/count(col) fall back") {
    val dir = tmp()
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("id", "v").repartition(4)
    TableLog.append(spark, dir, df, statsCols = Seq("id", "v"))
    TableLog.deleteWhere(spark, dir, col("v") > 90, mode = "dv")

    val cnt = graftDf(dir).agg(count(lit(1)).as("c"))
    assert(isMetadataOnly(cnt))
    assert(rows(cnt) == Seq(Seq(90L)))

    // the dv'd rows might have carried the extreme / been null — no rewrite,
    // and the scan still answers correctly
    val mx = graftDf(dir).agg(max(col("v")).as("m"), count(col("v")).as("c"))
    assert(!isMetadataOnly(mx))
    assert(rows(mx) == Seq(Seq(90, 90L)))
  }

  test("filters, grouping, DISTINCT, and computed inputs block the rewrite") {
    val dir = tmp()
    TableLog.append(spark, dir,
      Seq((1L, 5), (2L, 5), (3L, 9)).toDF("id", "v"), statsCols = Seq("id", "v"))
    val g = graftDf(dir)
    assert(!isMetadataOnly(g.filter(col("v") > 1).agg(count(lit(1)).as("c"))))
    assert(!isMetadataOnly(g.groupBy(col("v")).agg(count(lit(1)).as("c"))))
    assert(!isMetadataOnly(g.agg(countDistinct(col("v")).as("c"))))
    assert(!isMetadataOnly(g.agg(max(col("v") + 1).as("m"))))
    assert(!isMetadataOnly(g.agg(sum(col("v")).as("s"))))
    // every blocked plan still answers right
    assert(rows(g.agg(countDistinct(col("v")).as("c"))) == Seq(Seq(2L)))
  }

  test("all-NULL files contribute via null counts; an all-NULL column is SQL NULL") {
    val dir = tmp()
    // file A: values, file B: all-null in n (proven by its null count)
    val a = Seq((1L, Some(3))).toDF("id", "n")
    val b = Seq((2L, Option.empty[Int]), (3L, Option.empty[Int])).toDF("id", "n")
    TableLog.append(spark, dir, a.coalesce(1), statsCols = Seq("id", "n"))
    TableLog.append(spark, dir, b.coalesce(1), statsCols = Seq("id", "n"))
    val agg = graftDf(dir).agg(min(col("n")).as("mn"), max(col("n")).as("mx"),
      count(col("n")).as("c"))
    assert(isMetadataOnly(agg), agg.queryExecution.optimizedPlan.toString)
    assert(rows(agg) == Seq(Seq(3, 3, 1L)))

    val dir2 = tmp()
    TableLog.append(spark, dir2,
      Seq((1L, Option.empty[Int]), (2L, Option.empty[Int])).toDF("id", "n").coalesce(1),
      statsCols = Seq("id", "n"))
    val agg2 = graftDf(dir2).agg(min(col("n")).as("mn"), count(col("n")).as("c"))
    assert(isMetadataOnly(agg2))
    assert(rows(agg2) == Seq(Seq(null, 0L)))
  }

  test("long stats beyond 2^53 are not double-exact — falls back to the scan") {
    val dir = tmp()
    val big = (1L << 53) + 1L
    TableLog.append(spark, dir, Seq((1L, big), (2L, 5L)).toDF("id", "v").coalesce(1),
      statsCols = Seq("id", "v"))
    val agg = graftDf(dir).agg(max(col("v")).as("m"))
    assert(!isMetadataOnly(agg))
    assert(rows(agg) == Seq(Seq(big)))
    // the small-long sibling rewrites fine
    val ok = graftDf(dir).agg(max(col("id")).as("m"))
    assert(isMetadataOnly(ok))
    assert(rows(ok) == Seq(Seq(2L)))
  }

  test("string and decimal extremes never rewrite (truncation / value-space loss)") {
    val dir = tmp()
    val df = Seq((1L, "aa", BigDecimal("12.34")), (2L, "zz", BigDecimal("99.99")))
      .toDF("id", "s", "d").coalesce(1)
    TableLog.append(spark, dir, df, statsCols = Seq("id", "s", "d"))
    val sAgg = graftDf(dir).agg(max(col("s")).as("m"))
    val dAgg = graftDf(dir).agg(max(col("d")).as("m"))
    assert(!isMetadataOnly(sAgg) && !isMetadataOnly(dAgg))
    assert(rows(sAgg) == Seq(Seq("zz")))
  }

  test("columns without harvested stats fall back; version pins fold that version") {
    val dir = tmp()
    TableLog.append(spark, dir, Seq((1L, 5)).toDF("id", "v"), statsCols = Seq("id"))
    TableLog.append(spark, dir, Seq((2L, 9)).toDF("id", "v"), statsCols = Seq("id"))
    // v has no stats and no null counts → scan (still right)
    val noStats = graftDf(dir).agg(max(col("v")).as("m"))
    assert(!isMetadataOnly(noStats))
    assert(rows(noStats) == Seq(Seq(9)))
    // count(*) at versionAsOf 1 folds the pinned manifest
    val v1 = spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .agg(count(lit(1)).as("c"))
    assert(isMetadataOnly(v1))
    assert(rows(v1) == Seq(Seq(1L)))
  }

  test("renamed columns resolve through the column mapping") {
    val dir = tmp()
    TableLog.append(spark, dir, Seq((1L, 5), (2L, 9)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    TableLog.renameColumn(spark, dir, "v", "val")
    val agg = graftDf(dir).agg(max(col("val")).as("m"), count(col("val")).as("c"))
    assert(isMetadataOnly(agg), agg.queryExecution.optimizedPlan.toString)
    assert(rows(agg) == Seq(Seq(9, 2L)))
  }
}
