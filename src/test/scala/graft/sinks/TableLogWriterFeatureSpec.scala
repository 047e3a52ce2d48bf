package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The writer-feature guard — the other half of the format contract
  * (reader features landed r14): a table whose head declares a writer
  * feature this library does not implement REFUSES every commit path
  * (the contract would be silently broken otherwise — unvalidated rows
  * past a CHECK, logical-named files under a column mapping), while
  * READS stay open: an unknown writer feature never blocks a reader.
  */
class TableLogWriterFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def headManifest(dir: String): java.io.File =
    new java.io.File(s"$dir/_log").listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.contains("checkpoint"))
      .maxBy(_.getName)

  /** Stamp a future writer feature onto the head manifest — the
    * synthetic "newer writer touched this table" fixture.
    */
  private def stampFutureFeature(dir: String, feature: String): Unit = {
    val m = headManifest(dir)
    val body = new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
    val stamped = body.stripSuffix("}") + s""","wfeatures":["$feature"]}"""
    java.nio.file.Files.write(m.toPath, stamped.getBytes("UTF-8"))
    // hand-editing invalidates Hadoop's checksum sidecar
    new java.io.File(m.getParentFile, s".${m.getName}.crc").delete()
  }

  test("a future writer feature refuses every commit path but leaves reads open") {
    val dir = tmpDir("wfeat_future")
    TableLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    stampFutureFeature(dir, "vector-index-v9")
    // reads: open — unknown WRITER features never gate a reader
    assert(TableLog.readAt(spark, dir).count() == 2L)
    assert(TableLog.readChanges(spark, dir, 0L).count() == 2L)
    // writes: every path refuses loudly, before any rename
    def refusal(f: => Any): String = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("writer feature") &&
        e.getMessage.contains("vector-index-v9"), e.getMessage)
      e.getMessage
    }
    refusal(TableLog.append(spark, dir, Seq((3L, "c")).toDF("k", "s")))
    refusal(TableLog.deleteWhere(spark, dir, col("k") === 1L))
    refusal(TableLog.commitTxnMarker(spark, dir, "app", 1L))
    refusal(TableLog.compactTable(spark, dir))
    // the table is untouched by all those refusals
    assert(TableLog.currentVersion(spark, dir) == 1L)
    assert(TableLog.readAt(spark, dir).count() == 2L)
  }

  test("our own contracts stamp as writer features and we keep committing through them") {
    val dir = tmpDir("wfeat_own")
    TableLog.append(spark, dir, Seq((1L, "a")).toDF("k", "s"))
    TableLog.addCheckConstraint(spark, dir, "k_pos", "k > 0")
    TableLog.setTableProperties(spark, dir, Map("graft.cluster.cols" -> "k"))
    TableLog.renameColumn(spark, dir, "s", "label")
    val head = headManifest(dir)
    val body = new String(java.nio.file.Files.readAllBytes(head.toPath), "UTF-8")
    Seq("constraints", "colmap", "clustering").foreach(f =>
      assert(body.contains(s""""$f""""),
        s"the head manifest must declare writer feature $f: $body"))
    // we implement all three: committing on top still works
    assert(TableLog.append(spark, dir,
      Seq((2L, "b")).toDF("k", "label")) == 5L)
    assert(TableLog.readAt(spark, dir).count() == 2L)
  }
}
