package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-management utilities.
  *
  * AQE already splits skewed JOIN partitions and map-side partial
  * aggregation absorbs skew for algebraic aggregates (sum/count/min/max).
  * What neither fixes is `count_distinct` over a skewed or huge key: the
  * distinct-value state for a hot key must all land in one task. The
  * salted two-phase form here splits the VALUE space instead, so state is
  * bounded by buckets, not by the hottest key.
  */
object Skew {

  /** Exact distinct count per key, skew-proof: phase 1 groups by
    * (keys, hash(value) % buckets) — disjoint value slices, so the
    * per-slice exact distinct counts SUM to the true distinct count in
    * phase 2. The hottest key's state is spread over `buckets` tasks.
    *
    * vs `count_distinct`: same exactness, but no single-task bottleneck
    * and no OOM on a hot key at 100 TB.
    */
  def countDistinctSalted(df: DataFrame, keys: Seq[String], valueCol: String,
                          outCol: String, buckets: Int = 64): DataFrame = {
    // No null pre-filter: it would drop keys whose values are ALL null,
    // which count_distinct keeps (as 0). count_distinct already ignores
    // nulls inside each slice.
    val slice = pmod(hash(col(valueCol)), lit(buckets))
    df.groupBy(keys.map(col) :+ slice.as("_slice"): _*)
      .agg(count_distinct(col(valueCol)).as("_slice_ndv"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_slice_ndv")).as(outCol))
  }

  /** Key-frequency diagnostic: the `topN` heaviest keys with their share
    * of the table — the first thing to look at when a stage straggles.
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("rows"))
    val total = df.count().toDouble
    counts
      .withColumn("share", round(col("rows") / total, 6))
      .orderBy(col("rows").desc)
      .limit(topN)
  }

  /** Salt column for manually pre-splitting a hot aggregation key:
    * deterministic (hash of `from` columns), never random — reruns and
    * retries must land rows in the same bucket.
    */
  def saltColumn(from: Seq[Column], buckets: Int): Column =
    pmod(hash(from: _*), lit(buckets))

  /** Skew-proof equi-join for the contexts AQE's skew splitting cannot
    * reach (streaming micro-batches run with AQE disabled; some plans pin
    * their shuffle before AQE can intervene): every row of the big side
    * salts into one of `buckets` sub-keys — row-varying salt, NOT derived
    * from the key, or the hot key would stay together — while the small
    * side replicates across all buckets, and the join runs on
    * (keys, salt). The hottest key's rows spread over `buckets` tasks
    * instead of one straggler.
    *
    * Salt derivation is a real trade-off, so it is a switch:
    *  - default (content hash of every big-side column): DETERMINISTIC —
    *    a stage retry that recomputes a shuffle partition reassigns
    *    identical salts, so no row duplicates or disappears under
    *    partial recomputation. Spreads any hot key whose rows differ in
    *    SOME column; rows byte-identical across ALL columns share a
    *    bucket (dedup upstream, or flip the switch).
    *  - `spreadIdenticalRows = true` (round-robin row ids): spreads even
    *    byte-identical duplicates, but carries the classic rand-salting
    *    caveat — a recomputed partition can assign different salts, so
    *    only use it where the lineage is retry-free (checkpointed input,
    *    foreachBatch over a persisted micro-batch) or duplicates
    *    dominate the hot key.
    *
    * Cost: `buckets`× replication of `small` — use when `small` is too
    * big to broadcast but far smaller than `big`. Only join types that
    * preserve `small` replication semantics are allowed (each big row
    * still matches exactly its key's small rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner",
                 spreadIdenticalRows: Boolean = false): DataFrame = {
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"saltedJoin: $joinType would duplicate unmatched replicated rows; " +
        "right/full joins need the unsalted form")
    val salt =
      if (spreadIdenticalRows)
        pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int")
      else {
        // hash() rejects map-typed input — salt over the hashable columns
        // only (join keys are always hashable, so this is never empty;
        // rows differing ONLY in a map column share a bucket)
        def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case _: org.apache.spark.sql.types.MapType => false
          case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
          case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
          case _ => true
        }
        val saltCols = big.schema.fields.filter(f => hashable(f.dataType))
          .map(f => col(f.name)).toIndexedSeq
        saltColumn(saltCols, buckets)
      }
    val salted = big.withColumn("_salt", salt)
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
