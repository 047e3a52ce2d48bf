package graft.sinks

import java.sql.Date

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hive-partitioned CONVERT TO GRAFT — the zero-copy adoption path for
  * the date-partitioned lake layout (round 16; closes the r15 adoption
  * gap). Pins: partition values lift into REAL columns (Spark basePath
  * discovery, typed by inference), partition predicates prune through
  * the ordinary constant min=max stats, post-convert appends and dv
  * deletes compose, and mixed layouts still refuse.
  */
class TableLogConvertPartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def stage(dir: String): Unit =
    spark.range(0, 300)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("p"),
        concat(lit("v"), col("id") % 5).as("s"))
      .repartition(2)
      .write.partitionBy("p").mode("overwrite").parquet(dir)

  test("partitioned convert: values lift into columns, content matches the plain read") {
    val dir = tmpDir("tconv_part")
    stage(dir)
    val expect = spark.read.parquet(dir).select("k", "p", "s")
      .collect().map(_.toSeq).toSet
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    val got = TableLog.readAt(spark, dir)
    assert(got.columns.toSeq.sorted == Seq("k", "p", "s"))
    assert(got.select("k", "p", "s").collect().map(_.toSeq).toSet == expect)
    assert(got.count() == 300L)
    // the partition column really is typed by inference (int, not string)
    assert(got.schema("p").dataType == org.apache.spark.sql.types.IntegerType)
    assert(got.filter(col("p") === 1).count() ==
      spark.read.parquet(dir).filter(col("p") === 1).count())
  }

  test("partition predicates prune files via constant min=max stats") {
    val dir = tmpDir("tconv_prune")
    stage(dir)
    TableLog.convertToGraft(spark, dir)
    val pr = TableLog.scanWhere(spark, dir, col("p") === 1)
    assert(pr.filesRead < pr.filesTotal,
      s"partition predicate must prune (${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.count() == 100L)
    // IS NULL prunes too: every adopted file records 0 nulls for p
    val nn = TableLog.scanWhere(spark, dir, col("p").isNull)
    assert(nn.filesRead == 0, "no file holds null partition values")
  }

  test("date-typed partitions prune on date predicates") {
    val dir = tmpDir("tconv_date")
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-02-01"),
      (4L, "2024-03-01"))
      .toDF("k", "ds").select(col("k"), col("ds").cast("date").as("d"))
      .write.partitionBy("d").mode("overwrite").parquet(dir)
    TableLog.convertToGraft(spark, dir)
    val got = TableLog.readAt(spark, dir)
    assert(got.schema("d").dataType == org.apache.spark.sql.types.DateType)
    val pr = TableLog.scanWhere(spark, dir,
      col("d") === lit(Date.valueOf("2024-02-01")))
    assert(pr.filesRead < pr.filesTotal,
      s"date partition predicate must prune (${pr.filesRead}/${pr.filesTotal})")
    assert(pr.df.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("post-convert appends and dv deletes compose with adopted entries") {
    val dir = tmpDir("tconv_mix")
    stage(dir)
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    // append lands under data/ with the FULL schema (p is a plain column)
    TableLog.append(spark, dir,
      Seq((1000L, "vx", 7)).toDF("k", "s", "p")
        .select(col("k"), col("s"), col("p").cast("int").as("p")),
      statsCols = Seq("k"))
    val all = TableLog.readAt(spark, dir)
    assert(all.count() == 301L)
    assert(all.filter(col("p") === 7).select("k").as[Long].collect().toSeq ==
      Seq(1000L))
    // dv delete touches adopted partitioned files — deleted rows must
    // stay deleted through the basePath dv arm
    TableLog.deleteWhere(spark, dir, col("k").isin(5L, 6L), mode = "dv")
    val after = TableLog.readAt(spark, dir)
    assert(after.count() == 299L)
    assert(after.filter(col("k").isin(5L, 6L)).count() == 0L)
    // and the partition column still reads correctly on dv'd files
    assert(after.groupBy("p").count().count() == 4L) // p ∈ {0,1,2,7}
  }

  test("multipart checkpoint carries pcols entries") {
    val dir = tmpDir("tconv_ckpt")
    stage(dir)
    TableLog.convertToGraft(spark, dir)
    TableLog.snapshotCacheClear()
    val before = TableLog.liveFilesAt(spark, dir)
    TableLog.checkpoint(spark, dir, multipartMinEntries = 1)
    TableLog.snapshotCacheClear()
    assert(TableLog.liveFilesAt(spark, dir) == before)
    assert(TableLog.readAt(spark, dir).count() == 300L)
  }

  test("adopted lake lifecycle: CoW update prunes on the partition col, maintenance composes") {
    val dir = tmpDir("tconv_life")
    stage(dir)
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    // a CoW update whose predicate names ONLY the partition column must
    // derive its touch set from the constant min=max stats — untouched
    // partitions' adopted entries carry over verbatim
    val preEntries = TableLog.liveFilesAt(spark, dir)
    TableLog.updateWhere(spark, dir, col("p") === 2,
      Map("s" -> lit("touched")), statsCols = Seq("k"))
    val postEntries = TableLog.liveFilesAt(spark, dir)
    val carried = preEntries.map(_.path).toSet
      .intersect(postEntries.map(_.path).toSet)
    assert(carried.nonEmpty,
      "untouched partitions' adopted entries must carry over verbatim")
    assert(postEntries.exists(_.pcols.isEmpty),
      "rewritten rows land as table-local files")
    val all = TableLog.readAt(spark, dir)
    assert(all.filter(col("p") === 2 && col("s") =!= "touched").count() == 0L)
    assert(all.filter(col("p") =!= 2 && col("s") === "touched").count() == 0L)
    assert(all.count() == 300L)
    // maintenance composes: compact + (multipart) checkpoint + vacuum,
    // then the table still reads and still prunes on the partition col
    TableLog.checkpoint(spark, dir, multipartMinEntries = 1)
    TableLog.snapshotCacheClear()
    val pr = TableLog.scanWhere(spark, dir, col("p") === 0)
    assert(pr.filesRead < pr.filesTotal)
    assert(pr.df.count() == 100L)
  }

  test("dv delete on a partition-column predicate deletes the right rows (basePath position scan)") {
    val dir = tmpDir("tconv_dvpart")
    stage(dir)
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    // the predicate names ONLY directory-encoded columns: the position
    // scan must materialize them through the basePath arm, or the
    // delete silently matches nothing (the review finding)
    TableLog.deleteWhere(spark, dir, col("p") === 1 && col("k") < 10, mode = "dv")
    val after = TableLog.readAt(spark, dir)
    assert(after.count() == 297L, "exactly the p=1, k<10 rows must go")
    assert(after.filter(col("p") === 1 && col("k") < 10).count() == 0L)
    assert(after.filter(col("p") === 1).count() == 97L)
    // and the keyed change feed attributes the dv delete with REAL
    // partition values on the pre-images (remove-side pcols reconstruct
    // from the path)
    val v = TableLog.currentVersion(spark, dir)
    val feed = TableLog.readChanges(spark, dir, v - 1, v)
    val dels = feed.filter(col("_change_type") === "delete")
    assert(dels.count() == 3L)
    assert(dels.filter(col("p").isNull).count() == 0L,
      "delete pre-images must carry the real partition values, not nulls")
  }

  test("deep layouts: identical filenames across a 3-level hive tree keep distinct dv keys") {
    // Spark dynamic-partition writes reuse part filenames across
    // partition directories, so a year=/month=/day= tree holds files
    // that differ ONLY in the year segment. A dv key truncated to the
    // last three path segments would collide for them: the delete
    // would attribute positions to BOTH files (write side) and the
    // anti-join would drop the twin's rows too (read side) — silent
    // cross-file loss. The key now spans all partition segments.
    val root = tmpDir("tconv_deep")
    def land(ks: Seq[Long], year: Int): Unit = {
      val stageDir = tmpDir("tconv_deep_stage")
      ks.toDF("k").coalesce(1).write.mode("overwrite").parquet(stageDir)
      val src = new java.io.File(stageDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val leaf = new java.io.File(s"$root/year=$year/month=1/day=2")
      assert(leaf.mkdirs())
      // the SAME basename in both leaves — the collision under test
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(leaf, "part-00000.parquet").toPath)
    }
    land(0L to 9L, 2020)
    land(100L to 109L, 2021)
    // no statsCols: nothing prunes, so the dv position scan touches
    // BOTH files and the write-side keying is exercised, not dodged
    TableLog.convertToGraft(spark, root)
    TableLog.deleteWhere(spark, root, col("k").isin(0L, 1L, 2L), mode = "dv")
    val after = TableLog.readAt(spark, root)
    assert(after.count() == 17L, "only the three matching rows may go")
    assert(after.filter(col("year") === 2021).count() == 10L,
      "the 2021 twin (same filename, same positions) must keep every row")
    assert(after.filter(col("year") === 2020).select("k").as[Long]
      .collect().toSet == (3L to 9L).toSet)
    // and a second delete against the OTHER file keys independently
    TableLog.deleteWhere(spark, root, col("k") === 100L, mode = "dv")
    val fin = TableLog.readAt(spark, root)
    assert(fin.count() == 16L)
    assert(fin.filter(col("year") === 2020).count() == 7L)
    assert(fin.filter(col("year") === 2021).select("k").as[Long]
      .collect().toSet == (101L to 109L).toSet)
  }

  test("CDF over a commit touching adopted entries emits the exact diff, no spurious pairs") {
    val dir = tmpDir("tconv_cdf")
    stage(dir)
    TableLog.convertToGraft(spark, dir, statsCols = Seq("k"))
    // a CoW update rewrites touched adopted files into table-local
    // files: unchanged rows in touched files must CANCEL across the
    // remove/add sides — possible only if the remove side reads its
    // partition columns for real
    TableLog.updateWhere(spark, dir, col("p") === 0 && col("k") === 0,
      Map("s" -> lit("bumped")), statsCols = Seq("k"))
    val v = TableLog.currentVersion(spark, dir)
    val feed = TableLog.readChanges(spark, dir, v - 1, v, keys = Seq("k"))
    val rows = feed.select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((0L, "update_preimage"), (0L, "update_postimage")),
      s"only the touched key may appear in the feed, got ${rows.take(5)}")
  }

  test("mixed / non-hive layouts still refuse (subdir and loose-root forms)") {
    val dir = tmpDir("tconv_bad")
    stage(dir)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(dir, "not_a_partition"))
    val e = intercept[IllegalArgumentException] {
      TableLog.convertToGraft(spark, dir)
    }
    assert(e.getMessage.contains("non-partition"))
    // loose parquet beside partition dirs: adopting would silently drop
    // its rows — refuse
    val dir2 = tmpDir("tconv_bad2")
    stage(dir2)
    val src = new java.io.File(tmpDir("tconv_loose"))
    Seq((99L, "x")).toDF("k", "s").coalesce(1).write
      .mode("overwrite").parquet(src.getAbsolutePath)
    val part = src.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir2, "loose.parquet").toPath)
    val e2 = intercept[IllegalArgumentException] {
      TableLog.convertToGraft(spark, dir2)
    }
    assert(e2.getMessage.contains("loose"), e2.getMessage)
  }
}
