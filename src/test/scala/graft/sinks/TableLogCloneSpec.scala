package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Shallow clone: a zero-copy fork whose v1 references the source's
  * immutable data files by absolute path. The contract under test:
  * nothing is copied at clone time, reads (including deletion vectors
  * inherited OR added on the clone) are exact, the two histories are
  * independent afterwards, maintenance self-contains the clone, and
  * the clone's vacuum can never reclaim source bytes.
  */
class TableLogCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def parquetsUnder(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir, "data")
    if (!d.exists()) Nil
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(d)
    }
  }

  private def ks(dir: String, v: Long = -1L): Seq[Long] =
    TableLog.readAt(spark, dir, v).select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("cloneShallow is zero-copy, reads exactly, and histories are independent") {
    val src = tmpDir("clone_src")
    val dst = tmpDir("clone_dst")
    TableLog.append(spark, src, (1L to 40L).map(k => (k, s"v$k")).toDF("k", "s")
      .repartition(4), statsCols = Seq("k"))
    TableLog.append(spark, src, (41L to 50L).map(k => (k, s"v$k")).toDF("k", "s"))
    val v = TableLog.cloneShallow(spark, src, dst)
    assert(v == 1L)
    assert(parquetsUnder(dst).isEmpty, "a shallow clone must write no data files")
    assert(ks(dst) == (1L to 50L))
    // stats carried verbatim: the clone prunes as the source does
    val pruned = TableLog.scanPruned(spark, dst, Seq(("k", 45.0, 45.0)))
    assert(pruned.filesRead < pruned.filesTotal,
      s"clone stats must prune (${pruned.filesRead}/${pruned.filesTotal})")
    // independence: each side's commits are invisible to the other
    TableLog.append(spark, src, Seq((99L, "late")).toDF("k", "s"))
    assert(ks(dst) == (1L to 50L), "a source append must not reach the clone")
    TableLog.append(spark, dst, Seq((77L, "fork")).toDF("k", "s"))
    assert(ks(src) == ((1L to 50L) :+ 99L), "a clone append must not reach the source")
    assert(ks(dst) == ((1L to 50L) :+ 77L))
    // clone time travel: v1 is the fork point
    assert(ks(dst, 1L) == (1L to 50L))
    assert(TableLog.history(spark, dst).head.op == "clone")
    // a clone refuses a non-empty destination
    intercept[IllegalArgumentException] { TableLog.cloneShallow(spark, src, dst) }
  }

  test("clone at an explicit version forks that snapshot") {
    val src = tmpDir("clone_ver_src")
    val dst = tmpDir("clone_ver_dst")
    TableLog.append(spark, src, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    TableLog.deleteWhere(spark, src, col("k") === 1L)
    val dstV = tmpDir("clone_ver_dst1")
    TableLog.cloneShallow(spark, src, dstV, version = 1L)
    assert(ks(dstV) == Seq(1L, 2L), "version-pinned clone forks the OLD snapshot")
    TableLog.cloneShallow(spark, src, dst) // latest: after the delete
    assert(ks(dst) == Seq(2L))
  }

  test("dv point-deletes work on inherited files; CoW + compaction self-contain; vacuum never touches the source") {
    val src = tmpDir("clone_dv_src")
    val dst = tmpDir("clone_dv_dst")
    TableLog.append(spark, src, (1L to 30L).map(k => (k, s"v$k")).toDF("k", "s")
      .repartition(3), statsCols = Seq("k"))
    // a dv already on the source at clone time must carry over
    TableLog.deleteWhere(spark, src, col("k") === 7L, mode = "dv")
    TableLog.cloneShallow(spark, src, dst)
    assert(ks(dst) == (1L to 30L).filterNot(_ == 7L), "inherited dv anti-applies")
    // a NEW dv recorded on the clone against an inherited (absolute-path)
    // file: positions key by dvKey, so the erasure lands
    TableLog.deleteWhere(spark, dst, col("k") === 13L, mode = "dv")
    assert(ks(dst) == (1L to 30L).filterNot(k => k == 7L || k == 13L))
    assert(ks(src) == (1L to 30L).filterNot(_ == 7L),
      "a clone-side dv must not reach the source")
    assert(parquetsUnder(dst).isEmpty, "dv deletes still write no clone data")
    // CoW update on the clone rewrites touched inherited files locally
    TableLog.updateWhere(spark, dst, col("k") === 20L,
      set = Map("s" -> lit("upd")), statsCols = Seq("k"))
    assert(TableLog.readAt(spark, dst).filter(col("k") === 20L)
      .select("s").head().getString(0) == "upd")
    assert(parquetsUnder(dst).nonEmpty, "a CoW rewrite writes under the clone")
    // compaction materializes EVERYTHING into the clone's own dir: the
    // clone is now self-contained (no absolute entries left)
    TableLog.compactTable(spark, dst, statsCols = Seq("k"))
    val live = TableLog.history(spark, dst).last.add
    assert(live.forall(f => !TableLog.isAbsEntry(f.path)),
      "compaction must self-contain the clone")
    val expected = (1L to 30L).filterNot(k => k == 7L || k == 13L)
    assert(ks(dst) == expected)
    // vacuum on the clone reclaims only clone-local garbage; every
    // source file survives and the source still reads exactly
    val srcFilesBefore = parquetsUnder(src).map(_.getAbsolutePath).toSet
    TableLog.vacuum(spark, dst, keepVersions = 1)
    assert(parquetsUnder(src).map(_.getAbsolutePath).toSet == srcFilesBefore,
      "clone vacuum must never delete source bytes")
    assert(ks(src) == (1L to 30L).filterNot(_ == 7L))
    assert(ks(dst) == expected)
  }

  test("clone of a clone carries absolute entries verbatim; change feed sees the clone as inserts") {
    val a = tmpDir("clone_chain_a")
    val b = tmpDir("clone_chain_b")
    val c = tmpDir("clone_chain_c")
    TableLog.append(spark, a, Seq((1L, "x"), (2L, "y")).toDF("k", "s"))
    TableLog.cloneShallow(spark, a, b)
    TableLog.cloneShallow(spark, b, c)
    assert(ks(c) == Seq(1L, 2L))
    assert(parquetsUnder(b).isEmpty && parquetsUnder(c).isEmpty)
    // the feed: a clone commit diffs as its rows inserted at v1
    val feed = TableLog.readChanges(spark, c, fromVersion = 0L)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(feed.count() == 2L)
  }
}
