package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** COPY INTO: idempotent file ingest over the table log — each source
  * file loads exactly once however often the command re-runs, the
  * ledger survives checkpoints, and the usual write rules (schema,
  * constraints) apply.
  */
class TableLogCopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def stage(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = s"$dir/_stage_$name"
    rows.toDF("k", "s").coalesce(1).write.parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("files load exactly once across re-runs; new arrivals load incrementally") {
    val src = tmpDir("ci_src")
    val dir = tmpDir("ci_tab")
    stage(src, "a", Seq((1L, "a1"), (2L, "a2")))
    stage(src, "b", Seq((3L, "b1")))
    val r1 = TableLog.copyInto(spark, dir, s"$src/*.parquet")
    assert(r1.loadedFiles == 2 && r1.skippedFiles == 0 && r1.loadedRows == 3L)
    assert(r1.version.contains(1L))
    assert(TableLog.readAt(spark, dir).count() == 3L)
    // a verbatim re-run converges: nothing loads, no commit lands
    val r2 = TableLog.copyInto(spark, dir, s"$src/*.parquet")
    assert(r2.version.isEmpty && r2.loadedFiles == 0 && r2.skippedFiles == 2)
    assert(TableLog.currentVersion(spark, dir) == 1L)
    // two late arrivals: ONLY they load
    stage(src, "c", Seq((4L, "c1")))
    stage(src, "d", Seq((5L, "d1"), (6L, "d2")))
    val r3 = TableLog.copyInto(spark, dir, s"$src/*.parquet")
    assert(r3.loadedFiles == 2 && r3.skippedFiles == 2 && r3.loadedRows == 3L)
    assert(TableLog.readAt(spark, dir).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 6L))
    assert(TableLog.history(spark, dir).last.op == "copyinto")
  }

  test("the ledger folds through a checkpoint; an empty glob refuses loudly") {
    val src = tmpDir("ci_ck_src")
    val dir = tmpDir("ci_ck_tab")
    stage(src, "a", Seq((1L, "a")))
    TableLog.copyInto(spark, dir, s"$src/*.parquet")
    TableLog.checkpoint(spark, dir)
    // post-checkpoint: the pre-checkpoint file must STILL be skipped
    stage(src, "b", Seq((2L, "b")))
    val r = TableLog.copyInto(spark, dir, s"$src/*.parquet")
    assert(r.loadedFiles == 1 && r.skippedFiles == 1)
    assert(TableLog.readAt(spark, dir).count() == 2L)
    intercept[IllegalArgumentException] {
      TableLog.copyInto(spark, dir, s"$src/*.nothere")
    }
  }

  test("CSV ingest with options; table schema pins later runs; constraints apply") {
    val src = tmpDir("ci_csv_src")
    val dir = tmpDir("ci_csv_tab")
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "one.csv"),
      "k,price\n1,10.5\n2,20.5\n".getBytes)
    val r1 = TableLog.copyInto(spark, dir, s"$src/*.csv", format = "csv",
      options = Map("header" -> "true", "inferSchema" -> "true"))
    assert(r1.loadedRows == 2L)
    TableLog.addCheckConstraint(spark, dir, "price_pos", "price > 0")
    // a later CSV violating the constraint refuses the whole commit
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "two.csv"),
      "k,price\n3,-1.0\n".getBytes)
    val e = intercept[Exception] {
      TableLog.copyInto(spark, dir, s"$src/*.csv", format = "csv",
        options = Map("header" -> "true"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("price_pos")))
    assert(TableLog.readAt(spark, dir).count() == 2L)
    // the refused file is NOT in the ledger: fixing it upstream re-loads
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "two.csv"),
      "k,price\n3,1.0\n".getBytes)
    val r2 = TableLog.copyInto(spark, dir, s"$src/*.csv", format = "csv",
      options = Map("header" -> "true"))
    assert(r2.loadedFiles == 1 && r2.loadedRows == 1L)
    assert(TableLog.readAt(spark, dir).count() == 3L)
  }
}
