package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def viewMap(viewDir: String): Map[String, (java.math.BigDecimal, Long)] =
    AggView.read(spark, viewDir).collect()
      .map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap

  test("refresh folds the change feed: incremental == from-scratch, exactly-once, tombstones") {
    val t = tmpDir("aggv_t")
    val v = tmpDir("aggv_v")
    def row(g: String, x: Double, id: Long) = (id, g, x)
    TableLog.append(spark, t,
      Seq(row("a", 1.5, 1), row("a", 2.5, 2), row("b", 10.0, 3), row("c", 7.0, 4))
        .toDF("id", "g", "x").repartitionByRange(2, col("id")),
      statsCols = Seq("id"))
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").contains(1L))
    assert(viewMap(v).map { case (g, (s, c)) => (g, s.doubleValue(), c) }.toSet ==
      Set(("a", 4.0, 2L), ("b", 10.0, 1L), ("c", 7.0, 1L)))
    // already current → no-op; replay of the same table version skips
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").isEmpty)
    // a CoW delete wipes group c and thins group a
    TableLog.deleteWhere(spark, t, col("x") === 7.0 || col("x") === 2.5)
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").isDefined)
    val m = viewMap(v)
    assert(m.keySet == Set("a", "b"), s"group c must tombstone away from read(): $m")
    assert(m("a")._1.doubleValue() == 1.5 && m("a")._2 == 1L)
    // the tombstone row exists underneath (atomic single-commit design)…
    val raw = TableLog.readAt(spark, v).filter(col("cnt") === 0L).collect()
    assert(raw.length == 1 && raw.head.getString(0) == "c")
    // …and compact clears it
    AggView.compact(spark, v)
    assert(TableLog.readAt(spark, v).filter(col("cnt") === 0L).count() == 0L)
    // an update shifts a sum without changing counts
    TableLog.updateWhere(spark, t, col("g") === "b", Map("x" -> (col("x") + 0.25)))
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").isDefined)
    assert(viewMap(v)("b")._1.doubleValue() == 10.25 && viewMap(v)("b")._2 == 1L)
    // incremental result == a fresh view built from the current state in
    // one refresh — EXACT decimal equality, not a tolerance check
    val v2 = tmpDir("aggv_v2")
    AggView.refresh(spark, v2, t, Seq("g"), "x")
    assert(viewMap(v) == viewMap(v2))
    // a refresh over a no-row-change range (compaction) lands a marker
    TableLog.compactTable(spark, t, targetFileMB = 1024)
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").isDefined)
    assert(AggView.refresh(spark, v, t, Seq("g"), "x").isEmpty)
    assert(viewMap(v) == viewMap(v2))
    // the view itself time-travels: its first version is the bootstrap
    assert(AggView.read(spark, v, 1L).collect().length == 3)
  }

  private def mmMap(viewDir: String): Map[String, (Double, Any, Any, Long)] =
    AggView.read(spark, viewDir).collect().map { r =>
      r.getString(0) -> (r.getDecimal(1).doubleValue(),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        r.getLong(4))
    }.toMap

  test("refreshMulti MIN/MAX: retired extremes recompute, insert folds tighten, tombstones hold") {
    val t = tmpDir("aggmm_t")
    val v = tmpDir("aggmm_v")
    val ms = Seq(AggView.Measure("x", "sum"), AggView.Measure("x", "min"),
      AggView.Measure("x", "max"))
    TableLog.append(spark, t,
      Seq((1L, "a", 1.0), (2L, "a", 5.0), (3L, "a", 9.0),
        (4L, "b", 10.0), (5L, "b", 20.0), (6L, "c", 7.0))
        .toDF("id", "g", "x").repartitionByRange(2, col("id")),
      statsCols = Seq("id"))
    assert(AggView.refreshMulti(spark, v, t, Seq("g"), ms).contains(1L))
    assert(mmMap(v) == Map(
      "a" -> (15.0, 1.0, 9.0, 3L),
      "b" -> (30.0, 10.0, 20.0, 2L),
      "c" -> (7.0, 7.0, 7.0, 1L)))
    // replay skips
    assert(AggView.refreshMulti(spark, v, t, Seq("g"), ms).isEmpty)
    // DELETE RETIRES a's max (9) and ALL of c: a must recompute its
    // extremes from the base table, c must tombstone
    TableLog.deleteWhere(spark, t, col("x") === 9.0 || col("g") === "c")
    assert(AggView.refreshMulti(spark, v, t, Seq("g"), ms).isDefined)
    assert(mmMap(v) == Map(
      "a" -> (6.0, 1.0, 5.0, 2L),
      "b" -> (30.0, 10.0, 20.0, 2L)))
    val tomb = TableLog.readAt(spark, v).filter(col("cnt") === 0L).collect()
    assert(tomb.length == 1 && tomb.head.getString(0) == "c" &&
      tomb.head.isNullAt(2) && tomb.head.isNullAt(3),
      "a vanished group must tombstone with NULL extremes")
    // a delete that does NOT touch the extremes folds without recompute,
    // and an insert above the max tightens through the fold
    TableLog.deleteWhere(spark, t, col("x") === 5.0)   // a: between min and max
    TableLog.append(spark, t, Seq((7L, "b", 99.0), (8L, "a", 0.5))
      .toDF("id", "g", "x"), statsCols = Seq("id"))
    assert(AggView.refreshMulti(spark, v, t, Seq("g"), ms).isDefined)
    assert(mmMap(v) == Map(
      "a" -> (1.5, 0.5, 1.0, 2L),
      "b" -> (129.0, 10.0, 99.0, 3L)))
    // incremental == a fresh from-scratch view of the current state
    val v2 = tmpDir("aggmm_v2")
    AggView.refreshMulti(spark, v2, t, Seq("g"), ms)
    assert(mmMap(v) == mmMap(v2))
    // a resurrected group replaces its tombstone
    TableLog.append(spark, t, Seq((9L, "c", 3.0)).toDF("id", "g", "x"),
      statsCols = Seq("id"))
    assert(AggView.refreshMulti(spark, v, t, Seq("g"), ms).isDefined)
    assert(mmMap(v)("c") == (3.0, 3.0, 3.0, 1L))
    // loud guards
    intercept[IllegalArgumentException] {
      AggView.refreshMulti(spark, v, t, Seq("g"), Seq(AggView.Measure("x", "median")))
    }
  }

  test("refresh refuses NULL group keys loudly (null != null would duplicate rows)") {
    val t = tmpDir("aggv_nullg")
    val v = tmpDir("aggv_nullg_v")
    TableLog.append(spark, t,
      Seq((1L, Some("a"), 1.0), (2L, Option.empty[String], 2.0))
        .toDF("id", "g", "x"))
    val e = intercept[IllegalArgumentException] {
      AggView.refresh(spark, v, t, Seq("g"), "x")
    }
    assert(e.getMessage.contains("NULL"))
    // null VALUES are fine — they count rows and add zero to the sum
    val t2 = tmpDir("aggv_nullv")
    val v2 = tmpDir("aggv_nullv_v")
    TableLog.append(spark, t2,
      Seq((1L, "a", Option.empty[Double]), (2L, "a", Some(3.0)))
        .toDF("id", "g", "x"))
    AggView.refresh(spark, v2, t2, Seq("g"), "x")
    val row = AggView.read(spark, v2).collect().head
    assert(row.getDecimal(1).doubleValue() == 3.0 && row.getLong(2) == 2L)
  }

  test("two CONCURRENT refreshers: the delta applies exactly once (marker skip or loud loss, never double)") {
    val t = tmpDir("aggrace_t")
    val v = tmpDir("aggrace_v")
    val ms = Seq(AggView.Measure("x", "sum"), AggView.Measure("x", "min"),
      AggView.Measure("x", "max"))
    TableLog.append(spark, t,
      (1L to 40L).map(k => (k, s"g${k % 4}", k * 1.0)).toDF("id", "g", "x")
        .repartitionByRange(2, col("id")), statsCols = Seq("id"))
    AggView.refreshMulti(spark, v, t, Seq("g"), ms)
    // one table delta, two racers trying to fold it in simultaneously
    TableLog.append(spark, t, Seq((100L, "g0", 50.0)).toDF("id", "g", "x"),
      statsCols = Seq("id"))
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    def racer(): Thread = new Thread(() => {
      try { AggView.refreshMulti(spark, v, t, Seq("g"), ms); () }
      catch {
        case _: TableLog.TableLogConflictException => conflicts.incrementAndGet(); ()
      }
    })
    val ts = Seq(racer(), racer())
    ts.foreach(_.start()); ts.foreach(_.join())
    // whatever the interleaving (serial no-op skip, marker-based rebase
    // refusal, or CAS conflict), the delta lands EXACTLY once
    val tableV = TableLog.currentVersion(spark, t)
    val markers = TableLog.history(spark, v)
      .flatMap(_.txn).count(_ == ("aggview", tableV))
    assert(markers == 1,
      s"exactly one view commit may carry the marker for table version $tableV " +
        s"(got $markers, ${conflicts.get()} loud conflicts)")
    val fresh = tmpDir("aggrace_fresh")
    AggView.refreshMulti(spark, fresh, t, Seq("g"), ms)
    assert(mmMap(v) == mmMap(fresh),
      "the raced view must equal a from-scratch view — no double-applied delta")
  }
}
