package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `DESCRIBE LAYOUT` — the clustering-quality report (round 18): the
  * observable the OPTIMIZE loop watches, computed from the manifest
  * alone. These specs pin the metric's discrimination (clustered ≪
  * random), the multi-column box row on a z-order layout, translation
  * through a rename, the SQL form, and the refusal without columns.
  */
class TableLogLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def report(dir: String, cols: Seq[String]): Map[String, (Double, Double)] =
    TableLog.describeLayout(spark, dir, cols).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(5))).toMap

  test("clustered files read as tight extents; a random layout reads as ~full-range") {
    val rows = (0 until 4096).map(i => (i.toLong, (i % 64).toDouble))
    val clustered = tmpDir("tll_c")
    TableLog.append(spark, clustered,
      rows.toDF("k", "v").repartitionByRange(16, col("k")),
      statsCols = Seq("k"))
    val cRep = report(clustered, Seq("k"))("k")
    assert(cRep._1 < 0.12, s"range-clustered avg_extent must be tight, got ${cRep._1}")
    assert(cRep._2 < 2.5, s"point predicate must expect ~1 file, got ${cRep._2}")
    // arrival-order (round-robin) layout: every file spans the range
    val random = tmpDir("tll_r")
    TableLog.append(spark, random,
      rows.toDF("k", "v").repartition(16), statsCols = Seq("k"))
    val rRep = report(random, Seq("k"))("k")
    assert(rRep._1 > 0.8, s"random layout avg_extent must read wide, got ${rRep._1}")
    assert(rRep._2 > 12.0, s"point predicate must expect ~all files, got ${rRep._2}")
    // a file MISSING the stat counts as extent 1 (conservative)
    TableLog.append(spark, clustered, Seq((99999L, 0.0)).toDF("k", "v"))
    val after = report(clustered, Seq("k"))("k")
    assert(after._2 > cRep._2, "an unknown file must raise the estimate")
  }

  test("the (box) row measures z-order hyper-rectangles; strings map monotone") {
    val grid = (0 until 4096).map(i =>
      (i.toLong, (i % 64).toDouble, (i / 64).toDouble)).toDF("id", "x", "y")
    val dir = tmpDir("tll_z")
    TableLog.append(spark, dir,
      DataSink.zOrderLayout(grid, Seq("x", "y"), bitsPerCol = 6,
        curve = "morton", targetFiles = 16).drop("_zval"),
      statsCols = Seq("x", "y"))
    val rep = TableLog.describeLayout(spark, dir, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // each file is a small box: the VOLUME is far tighter than either
    // single-column extent (the z-order promise made observable)
    assert(rep("(box)") < rep("x") && rep("(box)") < rep("y"),
      s"box volume must undercut both extents: $rep")
    assert(rep("(box)") < 0.2, s"z-order boxes must be tight, got ${rep("(box)")}")
    // string columns report through the monotone fixed-width view
    val sdir = tmpDir("tll_s")
    TableLog.append(spark, sdir,
      (0 until 1024).map(i => (i.toLong, f"t${i % 32}%02d")).toDF("k", "s")
        .repartitionByRange(8, col("s")),
      statsCols = Seq("s"))
    val sRep = report(sdir, Seq("s"))("s")
    assert(sRep._1 < 0.25, s"string-clustered extent must be tight, got ${sRep._1}")
  }

  test("SQL form, rename translation, and the no-columns refusal") {
    val dir = tmpDir("tll_sql")
    TableLog.append(spark, dir,
      (0 until 1024).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
        .repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    // the renamed LOGICAL name reports through the frozen physical stats
    TableLog.renameColumn(spark, dir, "k", "id")
    val rep = report(dir, Seq("id"))("id")
    assert(rep._1 < 0.2, s"rename must not lose the layout report, got $rep")
    // SQL: DESCRIBE LAYOUT graft.`path` (id)
    val viaSql = spark.sql(s"DESCRIBE LAYOUT graft.`$dir` (id)").collect()
    assert(viaSql.length == 1 && viaSql.head.getString(0) == "id")
    assert(viaSql.head.getDouble(3) < 0.2)
    // no columns given, no graft.cluster.cols declared → loud
    val e = intercept[IllegalArgumentException] {
      TableLog.describeLayout(spark, dir)
    }
    assert(e.getMessage.contains("graft.cluster.cols"), e.getMessage)
    // declared clustering is the default column set
    TableLog.setTableProperties(spark, dir, Map("graft.cluster.cols" -> "id"))
    assert(TableLog.describeLayout(spark, dir).collect()
      .head.getString(0) == "id")
  }
}
