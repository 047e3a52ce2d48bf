package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Nested-field stats pruning (round 17; the r16 verdict's widest
  * real-user gap): manifest stats and every bounds consumer key by the
  * parquet footer's own DOTTED path (`payload.kind`), so a predicate
  * on a struct field drives file skipping exactly like a top-level
  * column — struct-typed event tables are the most common wide-table
  * shape, and before this a `payload.event_type = 'click'` read every
  * file. Pins: range/equality/IS NULL pruning on one- and two-level
  * chains, CoW touch-set derivation from nested predicates (untouched
  * files carry verbatim), conservative keep-all on unanalyzable nested
  * shapes, and head-segment translation under column mapping.
  */
class TableLogNestedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def stageStruct(dir: String): Unit = {
    // three kinds × deep geo struct; ranged by kind so files separate
    val df = spark.range(0, 300).select(
      col("id").as("k"),
      struct(
        element_at(array(lit("click"), lit("view"), lit("buy")),
          (col("id") % 3 + 1).cast("int")).as("kind"),
        (col("id") % 100).cast("double").as("score"),
        struct((col("id") % 90).cast("double").as("lat"),
          col("id").cast("double").as("lon")).as("geo")).as("payload"))
    TableLog.append(spark, dir,
      df.repartitionByRange(6, col("payload.kind"), col("k")),
      statsCols = Seq("k", "payload.kind", "payload.score",
        "payload.geo.lat"))
  }

  test("nested equality and range predicates prune files via dotted stats") {
    val dir = tmpDir("tlog_nested")
    stageStruct(dir)
    val eq = TableLog.scanWhere(spark, dir, col("payload.kind") === "buy")
    assert(eq.filesRead < eq.filesTotal,
      s"nested equality must prune (${eq.filesRead}/${eq.filesTotal})")
    assert(eq.df.count() == 100L)
    assert(eq.df.select("payload.kind").distinct().as[String]
      .collect().toSeq == Seq("buy"))
    // two-level chain bounds too
    val deep = TableLog.scanWhere(spark, dir, col("payload.geo.lat") < -1.0)
    assert(deep.filesRead == 0,
      s"out-of-range two-level predicate must prune everything " +
        s"(${deep.filesRead}/${deep.filesTotal})")
    // and the pruned result is still exact
    val rng = TableLog.scanWhere(spark, dir,
      col("payload.kind") === "click" && col("payload.score") >= 0.0)
    assert(rng.df.count() == 100L)
  }

  test("nested IS NULL / IS NOT NULL prune through leaf null counts") {
    val dir = tmpDir("tlog_nested_null")
    val withNulls = spark.range(0, 100).select(
      col("id").as("k"),
      struct(
        when(col("id") < 50, lit("x")).as("tag"), // nulls only in low half
        col("id").cast("double").as("score")).as("payload"))
    TableLog.append(spark, dir,
      withNulls.repartitionByRange(4, col("k")),
      statsCols = Seq("k", "payload.tag"))
    val isNull = TableLog.scanWhere(spark, dir, col("payload.tag").isNull)
    assert(isNull.filesRead < isNull.filesTotal,
      s"zero-null files must skip IS NULL (${isNull.filesRead}/${isNull.filesTotal})")
    assert(isNull.df.count() == 50L)
    val notNull = TableLog.scanWhere(spark, dir, col("payload.tag").isNotNull)
    assert(notNull.df.count() == 50L)
  }

  test("CoW delete on a nested predicate derives its touch set; untouched files carry verbatim") {
    val dir = tmpDir("tlog_nested_cow")
    stageStruct(dir)
    val pre = TableLog.liveFilesAt(spark, dir)
    TableLog.deleteWhere(spark, dir,
      col("payload.kind") === "view" && col("k") < 30L)
    val post = TableLog.liveFilesAt(spark, dir)
    val carried = pre.map(_.path).toSet.intersect(post.map(_.path).toSet)
    assert(carried.nonEmpty,
      "files outside the nested predicate's box must carry verbatim")
    val all = TableLog.readAt(spark, dir)
    assert(all.count() == 290L)
    assert(all.filter(col("payload.kind") === "view" && col("k") < 30L)
      .count() == 0L)
  }

  test("unanalyzable nested shapes stay conservative: scan keeps all, scoped OPTIMIZE refuses") {
    val dir = tmpDir("tlog_nested_cons")
    stageStruct(dir)
    // an expression OVER a nested field (not a bare chain) proves no
    // bound — the scan must read everything, never drop a file
    val fuzzy = TableLog.scanWhere(spark, dir,
      upper(col("payload.kind")) === "BUY")
    assert(fuzzy.filesRead == fuzzy.filesTotal,
      "computed nested shapes must keep every file")
    assert(fuzzy.df.count() == 100L)
    // and the scoped rewrites refuse it loudly (they exist to avoid
    // exactly the silent full-table cost keep-all implies)
    intercept[IllegalArgumentException] {
      TableLog.compactTable(spark, dir,
        where = Some(upper(col("payload.kind")) === "BUY"))
    }
  }

  test("nested SET: UPDATE rebuilds struct fields in place, siblings and schema untouched") {
    val dir = tmpDir("tlog_nested_set")
    stageStruct(dir)
    val schemaBefore = TableLog.readAt(spark, dir).schema
    TableLog.updateWhere(spark, dir,
      col("payload.kind") === "view" && col("k") < 30L,
      Map("payload.kind" -> lit("seen")))
    val after = TableLog.readAt(spark, dir)
    assert(after.schema == schemaBefore, "a nested SET never changes the schema")
    assert(after.filter(col("payload.kind") === "seen").count() == 10L)
    assert(after.count() == 300L)
    // sibling fields of updated rows carry their original values
    val r = after.filter(col("payload.kind") === "seen" && col("k") === 1L).head()
    assert(r.getStruct(1).getDouble(1) == 1.0, "sibling score must be untouched")
    // two-level path
    TableLog.updateWhere(spark, dir, col("k") === 0L,
      Map("payload.geo.lat" -> lit(99.5)))
    assert(TableLog.readAt(spark, dir).filter(col("k") === 0L)
      .select("payload.geo.lat").head().getDouble(0) == 99.5)
    assert(TableLog.readAt(spark, dir).filter(col("k") === 0L)
      .select("payload.geo.lon").head().getDouble(0) == 0.0)
    // whole-column + nested on the same head is ambiguous — refused
    val amb = intercept[IllegalArgumentException] {
      TableLog.updateWhere(spark, dir, col("k") === 1L, Map(
        "payload" -> col("payload"),
        "payload.kind" -> lit("x")))
    }
    assert(amb.getMessage.contains("ambiguous"), amb.getMessage)
    // unknown leaf and non-struct descent refuse loudly
    intercept[IllegalArgumentException] {
      TableLog.updateWhere(spark, dir, col("k") === 1L,
        Map("payload.nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      TableLog.updateWhere(spark, dir, col("k") === 1L,
        Map("payload.score.deeper" -> lit(1)))
    }
    // the SQL form: UPDATE … SET payload.score = …
    val view = s"ns_${dir.hashCode.toHexString}"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view USING graft OPTIONS (path '$dir')")
    graft.sources.GraftSql.exec(spark,
      s"UPDATE $view SET payload.score = payload.score + 1000 WHERE k = 5")
    assert(TableLog.readAt(spark, dir).filter(col("k") === 5L)
      .select("payload.score").head().getDouble(0) == 1005.0)
    spark.sql(s"DROP VIEW $view")
  }

  test("column mapping: a renamed struct column's nested stats map through the head segment") {
    val dir = tmpDir("tlog_nested_cm")
    stageStruct(dir)
    TableLog.renameColumn(spark, dir, "payload", "event")
    // old files carry physical name `payload`; the logical predicate on
    // `event.kind` must translate its head and still prune
    val pr = TableLog.scanWhere(spark, dir, col("event.kind") === "buy")
    assert(pr.filesRead < pr.filesTotal,
      s"renamed head must still prune (${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.count() == 100L)
    assert(pr.df.select("event.kind").distinct().as[String]
      .collect().toSeq == Seq("buy"))
  }
}
