package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bounded concurrency soak — the deployment the lakehouse block
  * advertises, running for real: one INGEST thread committing batches,
  * one MAINTENANCE thread looping `maintainAuto` (compaction →
  * checkpoint → vacuum, default in-flight grace), one READER thread
  * folding head snapshots and tailing the change feed — all
  * simultaneously against one table. The invariants under soak: no
  * thread throws (auto-rebase absorbs the CAS races maintenance loses;
  * the grace window keeps vacuum off in-flight staging), every
  * ingested row is present exactly once at the end, and the final
  * change-feed replay reconstructs the same multiset the snapshots
  * show. ~20 commits each side keeps the spec inside CI time while
  * still forcing dozens of CAS collisions.
  */
class TableLogSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("ingest + maintenance + readers soak: no failures, exactly-once rows, feed replays") {
    val dir = tmpDir("soak")
    TableLog.append(spark, dir, Seq((0L, 0L)).toDF("k", "batch"),
      statsCols = Seq("k"))
    TableLog.setTableProperties(spark, dir, Map(
      "graft.compact.minFileMB" -> "64",
      "graft.compact.minSmallFiles" -> "2",
      // deep retention: the READER thread time-travels near head, and
      // retention racing it is vacuum-watermark semantics already pinned
      // elsewhere — this soak targets the write/maintain/read interplay
      "graft.retain.keepVersions" -> "50"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val batches = 18
    val rowsPerBatch = 40
    val writer = new Thread(() => try {
      (1 to batches).foreach { b =>
        val df = ((b * 1000L) until (b * 1000L + rowsPerBatch))
          .map(k => (k, b.toLong)).toDF("k", "batch")
          .repartition(2)
        TableLog.append(spark, dir, df, statsCols = Seq("k"))
      }
    } catch { case t: Throwable => errs.add(t); () })
    @volatile var stop = false
    val maintainer = new Thread(() => try {
      while (!stop) {
        TableLog.maintainAuto(spark, dir)
        Thread.sleep(25)
      }
    } catch { case t: Throwable => errs.add(t); () })
    val reader = new Thread(() => try {
      while (!stop) {
        val head = TableLog.currentVersion(spark, dir)
        // a pinned head snapshot must read consistently mid-churn
        val n = TableLog.readAt(spark, dir, head).count()
        require(n >= 1L, s"head snapshot $head read empty")
        // and the tail of the feed stays touch-set-sized and readable
        TableLog.readChanges(spark, dir, math.max(head - 2, 0L), head).count()
        Thread.sleep(15)
      }
    } catch { case t: Throwable => errs.add(t); () })
    writer.start(); maintainer.start(); reader.start()
    writer.join(180000)
    stop = true
    maintainer.join(60000); reader.join(60000)
    assert(errs.isEmpty, {
      val t = errs.peek()
      s"soak must run clean, got ${errs.size} failure(s): $t\n" +
        Option(t).map(_.getStackTrace.take(8).mkString("\n")).getOrElse("")
    })
    // exactly-once: every ingested key present once, nothing lost to a
    // maintenance race, nothing duplicated by a rebase replay
    val keys = TableLog.readAt(spark, dir).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    val expected = (0L +: (1 to batches).flatMap(b =>
      (b * 1000L) until (b * 1000L + rowsPerBatch)).map(identity)).sorted
    assert(keys.length == expected.length && keys == expected,
      s"exactly-once violated: got ${keys.length} rows, want ${expected.length}")
    // the feed replays the whole history to the same multiset (compact
    // commits emit nothing — rows were preserved)
    val replayed = TableLog.readChanges(spark, dir, 0L)
    val net = replayed.groupBy("k").agg(
      sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("n"))
    assert(net.filter(col("n") =!= 1).isEmpty,
      "change-feed replay must net to exactly one live image per key")
  }
}
