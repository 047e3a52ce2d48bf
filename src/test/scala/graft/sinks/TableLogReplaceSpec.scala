package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** replaceWhere — the atomic backfill: delete-matching + insert-batch
  * as ONE commit, touch set stats-pruned from the predicate.
  */
class TableLogReplaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** 40 rows in 4 range-clustered files: k 1–10 / 11–20 / 21–30 / 31–40. */
  private def staged(): String = {
    val dir = tmpDir("tlrepl")
    TableLog.append(spark, dir,
      (1L to 40L).map(k => (k, s"old_$k")).toDF("k", "s")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    dir
  }

  test("one commit swaps the window; rows outside are byte-identical files") {
    val dir = staged()
    val before = TableLog.readAt(spark, dir)
      .filter(col("k") < 11L || col("k") > 20L)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val v = TableLog.replaceWhere(spark, dir,
      Seq((11L, "new_11"), (15L, "new_15")).toDF("k", "s"),
      col("k").between(11L, 20L), statsCols = Seq("k"))
    assert(v == 2L, "replace must be ONE commit")
    assert(TableLog.history(spark, dir).last.op == "replace")
    val after = TableLog.readAt(spark, dir).as[(Long, String)].collect().toMap
    assert(after.size == 32, "10 window rows out, 2 in")
    assert(after(11L) == "new_11" && after(15L) == "new_15")
    assert(!(12L to 20L).filterNot(_ == 15L).exists(after.contains))
    assert(after(1L) == "old_1" && after(40L) == "old_40")
    // untouched files carry over verbatim: same physical paths serve
    // the rows outside the window
    val outside = TableLog.readAt(spark, dir)
      .filter(col("k") < 11L || col("k") > 20L)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(outside == before,
      "files disjoint from the window must not rewrite")
    // time travel: the pre-replace snapshot is intact
    assert(TableLog.readAt(spark, dir, 1L).count() == 40L)
  }

  test("batch rows outside the window refuse loudly; NULL predicate rows too") {
    val dir = staged()
    intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, dir, Seq((25L, "spill")).toDF("k", "s"),
        col("k").between(11L, 20L))
    }
    // NULL-predicate row: k null → predicate null → violation
    intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, dir,
        Seq((Option.empty[Long], "nullk")).toDF("k", "s"),
        col("k").between(11L, 20L))
    }
    // nothing committed by either refusal
    assert(TableLog.currentVersion(spark, dir) == 1L)
  }

  test("empty-match window is a pure atomic insert; NULL table rows are kept") {
    val dir = tmpDir("tlrepl_null")
    TableLog.append(spark, dir,
      Seq((Option(1L), "a"), (Option.empty[Long], "nullrow")).toDF("k", "s"))
    // the window matches nothing live (k 100–200): delete arm is empty,
    // the batch still lands in the same single commit
    TableLog.replaceWhere(spark, dir, Seq((Option(150L), "new")).toDF("k", "s"),
      col("k").between(100L, 200L))
    val rows = TableLog.readAt(spark, dir).as[(Option[Long], String)]
      .collect().toSet
    assert(rows == Set((Some(1L), "a"), (None, "nullrow"), (Some(150L), "new")),
      "NULL-predicate table rows are KEPT (DELETE semantics); the batch inserts")
  }

  test("dv-carrying files: replaced window does not resurrect dv'd rows") {
    val dir = staged()
    // dv-delete k=12 first (merge-on-read), THEN replace a window
    // overlapping that file — the rewrite must not resurrect k=12's row
    TableLog.deleteWhere(spark, dir, col("k") === 12L, mode = "dv")
    TableLog.replaceWhere(spark, dir, Seq((18L, "new_18")).toDF("k", "s"),
      col("k").between(15L, 20L))
    val ks = TableLog.readAt(spark, dir).select("k").as[Long].collect().toSet
    assert(!ks.contains(12L), "dv'd row must stay deleted through the rewrite")
    assert(ks.contains(11L) && ks.contains(13L) && ks.contains(14L))
    assert(ks.contains(18L) && !ks.contains(16L))
  }

  test("SQL connector: Overwrite + replaceWhere option routes to the backfill arm") {
    val dir = staged()
    Seq((13L, "sql_13")).toDF("k", "s")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "k BETWEEN 11 AND 20").save(dir)
    val after = TableLog.readAt(spark, dir).as[(Long, String)].collect().toMap
    assert(after.size == 31 && after(13L) == "sql_13" && after(1L) == "old_1")
    assert(TableLog.history(spark, dir).last.op == "replace")
    // a violating batch refuses through the connector too
    intercept[IllegalArgumentException] {
      Seq((5L, "bad")).toDF("k", "s")
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "k BETWEEN 11 AND 20").save(dir)
    }
    // first write on a fresh dir degrades to a violation-checked write
    val fresh = tmpDir("tlrepl_fresh")
    Seq((12L, "boot")).toDF("k", "s")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "k BETWEEN 11 AND 20").save(fresh)
    assert(TableLog.readAt(spark, fresh).count() == 1L)
  }
}
