package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained SUM/COUNT materialized view over a
  * [[TableLog]] table — the lakehouse form of a materialized view with
  * incremental refresh (the standard IVM delta rule for distributive
  * aggregates, implemented from the algebra: inserts add, deletes
  * subtract; reference parity: the warehouse summary tables
  * `db_loader.py` rebuilds per run, maintained here without rebuilds).
  *
  * Why this scales: a refresh reads the table's CHANGE FEED since the
  * last refreshed version ([[TableLog.readChanges]] — bounded by the
  * touched files of the intervening commits, never the table), folds it
  * into per-group deltas (one partial-aggregated groupBy over the
  * changes), and lands ONE [[TableLog.mergeInto]] commit on the view —
  * whose own touch set is the view files holding the affected groups.
  * A 100 TB fact table with a million-row daily delta refreshes its
  * views for the cost of the delta, while every version of the view
  * stays time-travel-readable and the refresh is exactly-once.
  *
  * Sums accumulate in DECIMAL(30,6), so increments are EXACT and
  * order-independent — the incrementally-maintained sum equals the
  * from-scratch sum bit-for-bit, which is what makes the equivalence
  * spec (and the DuckDB oracle) a hash match rather than a tolerance
  * check.
  *
  * Exactly-once: each refresh commit carries the txn marker
  * `(viewApp, tableVersion)`; a crashed-and-replayed refresh finds the
  * marker and skips. A group whose count reaches zero stays as a
  * zero-count TOMBSTONE row inside one atomic commit (two commits —
  * update + delete — could be split by a crash and replay would skip
  * the second half); [[read]] filters tombstones, and the periodic
  * [[compact]] clears them as CoW maintenance.
  */
object AggView {

  private val SumType = "decimal(30,6)"

  /** Bring the view at `viewDir` up to date with `tableDir`'s latest
    * version. Returns the view's new version, or None if already
    * current (or if this table version was already refreshed — replay).
    */
  def refresh(spark: SparkSession, viewDir: String, tableDir: String,
              groupCols: Seq[String], valueCol: String,
              viewApp: String = "aggview"): Option[Long] = {
    require(groupCols.nonEmpty, "AggView.refresh: groupCols must be non-empty")
    val tableV = TableLog.currentVersion(spark, tableDir)
    require(tableV > 0L, s"AggView.refresh: $tableDir has no committed versions")
    val last = TableLog.lastCommittedBatch(spark, viewDir, viewApp).getOrElse(0L)
    if (tableV <= last) return None
    val g = groupCols.map(col)
    val changes = TableLog.readChanges(spark, tableDir, last, tableV)
    val sign = when(col("_change_type") === "insert", 1).otherwise(-1)
    // null values contribute 0 to the sum but still count rows (a
    // group of all-null values must not carry a NULL sum into the
    // additive merge, where it would poison every later increment)
    val delta = changes.groupBy(g: _*).agg(
        coalesce(sum(sign.cast(SumType) * col(valueCol).cast(SumType)),
          lit(0).cast(SumType)).as("d_sum"),
        sum(sign.cast("long")).as("d_cnt"))
      .filter(col("d_cnt") =!= 0L || col("d_sum") =!= 0.0)
    // SQL null != null: a NULL group key would match neither the view
    // lookup nor the merge's anti-join and duplicate its row on every
    // refresh — refuse loudly instead of silently corrupting the view
    require(delta.filter(g.map(_.isNull).reduce(_ || _)).isEmpty,
      s"AggView.refresh: NULL values in group columns ${groupCols.mkString(", ")} " +
        "are not mergeable (SQL null != null) — coalesce them upstream")
    val viewV = TableLog.currentVersion(spark, viewDir)
    if (viewV > 0L && delta.isEmpty) {
      // nothing changed any group (e.g. a compaction-only range): land a
      // marker-only empty append so the next refresh starts after
      // tableV instead of re-reading this range forever
      val schema = TableLog.readAt(spark, viewDir).schema
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      return Some(TableLog.append(spark, viewDir, empty,
        txn = Some(viewApp -> tableV)))
    }
    if (viewV == 0L) {
      val first = delta.select(g ++ Seq(col("d_sum").cast(SumType).as("sum_val"),
        col("d_cnt").as("cnt")): _*)
      Some(TableLog.append(spark, viewDir, first, statsCols = groupCols,
        expectedParent = Some(0L), txn = Some(viewApp -> tableV)))
    } else {
      // only the affected groups join against the current view — the
      // merge's stats pruning then touches only the files holding them
      val cur = TableLog.readAt(spark, viewDir)
        .select(g ++ Seq(col("sum_val").as("_old_sum"), col("cnt").as("_old_cnt")): _*)
      val merged = delta.join(cur, groupCols, "left")
        .select(g ++ Seq(
          (coalesce(col("_old_sum"), lit(0).cast(SumType)) + col("d_sum"))
            .cast(SumType).as("sum_val"),
          (coalesce(col("_old_cnt"), lit(0L)) + col("d_cnt")).as("cnt")): _*)
      Some(TableLog.mergeInto(spark, viewDir, merged, groupCols,
        statsCols = groupCols, txn = Some(viewApp -> tableV)))
    }
  }

  /** The live view, tombstone-free. */
  def read(spark: SparkSession, viewDir: String, version: Long = -1L): DataFrame =
    TableLog.readAt(spark, viewDir, version).filter(col("cnt") =!= 0L)

  /** CoW maintenance: clear zero-count tombstone rows. */
  def compact(spark: SparkSession, viewDir: String,
              statsCols: Seq[String] = Nil): Long =
    TableLog.deleteWhere(spark, viewDir, col("cnt") === 0L, statsCols = statsCols)
}
