package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics layer — the reference's SQL views
  * (`/root/reference/src/load/schema.sql`) re-expressed as declarative
  * DataFrame plans over the star schema, plus the time-series queries the
  * reference's Airflow jobs imply.
  *
  * Join strategy: `region`/`nation` are O(10^2) rows at ANY scale factor —
  * always broadcast. `customer`/`supplier`/`part` grow with SF; they are
  * left to AQE, which picks broadcast at small SF and shuffled hash at
  * 100 TB. Fact-fact joins (orders ⋈ lineitem) shuffle on the join key and
  * benefit from AQE skew splitting.
  */
object Analytics {

  import org.apache.spark.sql.Column

  /** Money-sum: sum in DECIMAL(30,6) rather than double. Double summation
    * is order-dependent, and with 32 partial aggregates the row order is
    * nondeterministic — a sum landing near a .005 boundary rounds
    * differently run-to-run (and engine-to-engine). Casting each summand
    * to decimal makes the aggregate exact and the rounding deterministic;
    * DECIMAL(30,6) holds 1e23 so it cannot overflow at 100 TB.
    */
  private def moneySum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(30,6)")), scale).cast("double")

  /** Order-independent money average: exact decimal(30,6) sum divided by
    * the non-null count, rounded as double. A plain `avg(double)` sums
    * in nondeterministic partial-agg merge order, so a group mean near a
    * rounding boundary flips run-to-run and engine-vs-oracle — the same
    * flap [[moneySum]] exists to prevent.
    */
  def moneyAvg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast("decimal(30,6)")).cast("double") / count(c), scale)

  /** Flagship pricing summary (TPC-H Q1 shape): the multi-aggregate scan
    * every warehouse is judged on. Pure partial-agg — no shuffle of raw
    * rows, only of the 6-group state.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")) * (lit(1d) + col("l_tax"))).as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Per-order revenue via BUCKETED staging tables — the co-located
    * fact-fact join: both sides land as `numBuckets` hash buckets on the
    * order key ([[graft.sinks.DataSink.writeBucketed]]), so the
    * sort-merge join (forced with a merge hint — a broadcast would hide
    * the point) reads matching buckets side by side with ZERO Exchange,
    * and the per-order aggregation reuses the same partitioning (group
    * keys ⊇ bucket key). This is how two 50 TB fact tables join without
    * moving either; the one-shuffle alternative is `orderSummary`.
    */
  def orderRevenueBucketed(spark: org.apache.spark.sql.SparkSession,
                           orders: DataFrame, lineitem: DataFrame,
                           numBuckets: Int = 8): DataFrame = {
    graft.sinks.DataSink.dropStagingTable(spark, "graft_bkt_orders")
    graft.sinks.DataSink.dropStagingTable(spark, "graft_bkt_lineitem")
    graft.sinks.DataSink.writeBucketed(
      orders.select(col("o_orderkey"), col("o_orderstatus")),
      "graft_bkt_orders", Seq("o_orderkey"), numBuckets, sortCols = Seq("o_orderkey"))
    graft.sinks.DataSink.writeBucketed(
      lineitem.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "graft_bkt_lineitem", Seq("l_orderkey"), numBuckets, sortCols = Seq("l_orderkey"))
    spark.table("graft_bkt_lineitem")
      .join(spark.table("graft_bkt_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderstatus"))
      .agg(moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("o_orderkey"))
  }

  /** v_order_summary (schema.sql:208): per-order rollup with customer
    * geography. orders ⋈ lineitem shuffles on orderkey; nation broadcast.
    */
  def orderSummary(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                   lineitem: DataFrame): DataFrame = {
    val items = Spread.compute(lineitem, col("l_orderkey")).groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("item_count"),
      moneySum(col("l_extendedprice")).as("total_price"),
      moneySum(col("l_extendedprice") * col("l_discount")).as("total_discount"))
    orders
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(items, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
        col("c_name"), col("n_name").as("nation"),
        coalesce(col("item_count"), lit(0L)).as("item_count"),
        coalesce(col("total_price"), lit(0d)).as("total_price"),
        coalesce(col("total_discount"), lit(0d)).as("total_discount"))
      .orderBy(col("o_orderkey"))
  }

  /** v_delivery_performance (schema.sql:230): per-geography conditional
    * aggregation (delivered/canceled analogs = order status F/P/O).
    */
  def deliveryPerformance(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame): DataFrame =
    orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("total_orders"),
        moneyAvg(col("o_totalprice")).as("avg_order_price"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_count"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending_count"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_count"))
      .orderBy(col("nation"))

  /** Star join: revenue by part brand and supplier nation. Dim tables
    * broadcast; the single big shuffle is lineitem's groupBy.
    */
  def starJoin(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
               nation: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_brand"), col("n_name").as("supp_nation"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("p_brand"), col("supp_nation"))

  /** Top-N rows per group via ranked window — partitioned by group key so
    * the sort is per-group, never global.
    */
  def topNPerGroup(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                   n: Int): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(moneySum(col("o_totalprice")).as("total_spend"))
    val w = Window.partitionBy(col("nation")).orderBy(col("total_spend").desc, col("c_custkey"))
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("n_name").as("nation"), col("c_custkey"), col("c_name"), col("total_spend"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .orderBy(col("nation"), col("rank"))
  }

  /** [[topNPerGroup]] computed through the `top_k_any` bounded-heap
    * aggregate instead of a ranked window — identical output (same
    * oracle), different physical shape: per-nation heaps partial-merge
    * map-side, no per-group sort. Registered separately so the bench
    * compares both formulations on real data.
    */
  def topNPerGroupHeap(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                       n: Int): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(moneySum(col("o_totalprice")).as("total_spend"))
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("n_name").as("nation"), col("c_custkey"), col("c_name"), col("total_spend"))
      .groupBy(col("nation"))
      // payload leads with c_custkey: top_k_any breaks score ties by
      // ascending payload order = ascending custkey, matching the window
      // version's (total_spend DESC, c_custkey ASC)
      .agg(call_function("top_k_any", col("total_spend"),
        struct(col("c_custkey"), col("c_name")), lit(n)).as("tk"))
      .select(col("nation"), posexplode(col("tk")).as(Seq("_pos", "item")))
      .select(col("nation"), col("item.payload.c_custkey").as("c_custkey"),
        col("item.payload.c_name").as("c_name"),
        col("item.score").as("total_spend"),
        (col("_pos") + 1).cast("int").as("rank"))
      .orderBy(col("nation"), col("rank"))
  }

  /** Daily revenue with running cumulative total. The cumulative window is
    * global-ordered but runs over the AGGREGATED series (one row per day)
    * — tiny regardless of fact size.
    */
  def dailyRevenue(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("order_count"))
    val w = Window.orderBy(col("order_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_revenue", round(sum(col("revenue")).over(w), 2))
      .orderBy(col("order_day"))
  }

  /** Hierarchical subtotals via ROLLUP — (flag, status), (flag), and the
    * grand total in ONE pass (Spark expands grouping sets before the
    * partial agg, so it is still a single shuffle of group state).
    */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    Spread.compute(lineitem)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Wide per-user activity matrix via PIVOT over a FIXED type list —
    * pivoting on explicit values keeps the schema static (an unpinned
    * pivot needs a driver-side distinct pass to discover columns, a
    * full extra job at 100 TB).
    */
  def userActivityPivot(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))

  /** Exact order-value percentiles per geography — the SLA-style rollup
    * the reference's delivery view implies but can't express in SQLite.
    * One array-percentile aggregate (single sort per group), split into
    * scalar columns. The approx path at 100 TB swaps `percentile` for
    * `approx_percentile` unchanged.
    */
  def deliveryPercentiles(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame): DataFrame =
    orders
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("_p"))
      .select(col("nation"),
        round(col("_p").getItem(0), 4).as("p50"),
        round(col("_p").getItem(1), 4).as("p90"),
        round(col("_p").getItem(2), 4).as("p99"))
      .orderBy(col("nation"))

  /** 7-day moving average over the daily revenue series (sliding ROWS
    * frame). The window runs over the AGGREGATED one-row-per-day series —
    * tiny regardless of fact size, like [[dailyRevenue]]'s running total.
    */
  def movingAvgRevenue(orders: DataFrame, days: Int = 7): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(moneySum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy(col("order_day")).rowsBetween(-(days - 1), Window.currentRow)
    daily
      .withColumn("avg_7d", round(avg(col("revenue")).over(w), 4))
      .orderBy(col("order_day"))
  }

  /** Customers with no orders — LEFT ANTI join (the warehouse "orphans"
    * check). Anti joins broadcast/shuffle exactly like inner joins but
    * ship only the left side forward; at scale prefer this over
    * NOT IN/except-distinct formulations that need an extra aggregate.
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Gap-based sessionization over the events stream (batch form): a new
    * session starts when a user is idle > `gapMinutes`. lag + cumulative
    * sum over a per-user window — shuffles once on user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // double epoch (not long): event timestamps carry sub-second precision;
    // NTZ→TIMESTAMP first (UTC session = same wall clock), then to seconds.
    def epochSec(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("double")
    val newSession = when(
      epochSec(col("ts")) - epochSec(lag(col("ts"), 1).over(byUser)) > gapMinutes * 60d, 1L
    ).otherwise(when(lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
    events
      .withColumn("session_seq", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("event_count"),
        moneySum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Tumbling-window event aggregation, batch form of the streaming job in
    * `graft.streaming.EventStreams`. date_trunc keeps it SQL-portable.
    */
  /** Ordered FUNNEL analysis: how many users progress through the event
    * stages IN ORDER (each stage's event at-or-after the user's previous
    * stage's first completion — the e-commerce click→view→purchase
    * conversion question). Stage k's completion time is the user's
    * EARLIEST stage-k event at-or-after their stage-(k−1) completion;
    * output is one row per stage with the surviving user count —
    * integer-exact, so the oracle mirror is trivial.
    *
    * Scale shape: one aggregate per stage over that stage's events only
    * (filter pushed to the scan), joined user-keyed to the previous
    * stage's completions — k−1 hash exchanges on user_id for a k-stage
    * funnel, each carrying ≤|users| rows, never raw events. No windows,
    * no per-user sort.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"funnel: need ≥2 stages, got $stages")
    require(stages.distinct.size == stages.size,
      s"funnel: stages must be distinct, got $stages")
    val reserved = Set("_user", "_t", "_ts")
    val clashes = Seq(userCol, typeCol, tsCol).filter(reserved.contains)
    require(clashes.isEmpty,
      s"funnel: column names $clashes collide with internal staging names $reserved — rename them first")
    val u = Cols.qcol(userCol); val t = Cols.qcol(typeCol); val ts = Cols.qcol(tsCol)
    // stage 1: first occurrence per user
    var done = events.filter(t === stages.head)
      .groupBy(u.as("_user")).agg(min(ts).as("_t"))
    val counts = scala.collection.mutable.ArrayBuffer(
      (1, stages.head, done.count()))
    stages.toSeq.zipWithIndex.drop(1).foreach { case (st, i) =>
      val cand = events.filter(t === st)
        .select(u.as("_user"), ts.as("_ts"))
      done = cand.join(done, Seq("_user"))
        .filter(col("_ts") >= col("_t"))
        .groupBy(col("_user")).agg(min(col("_ts")).as("_t"))
      counts += ((i + 1, st, done.count()))
    }
    val spark = events.sparkSession
    spark.createDataFrame(counts.toSeq).toDF("stage", "event_type", "users")
  }

  /** REPEAT-PURCHASE interval distribution: per-customer gaps between
    * consecutive orders (days), bucketed into a reorder-latency
    * histogram — the "how fast do customers come back" view. The lag
    * window partitions by customer (parallelism = customer population);
    * gaps and counts are integer-exact; the share divides once and
    * rounds to 4.
    */
  def purchaseIntervals(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = orders
      .withColumn("_prev", lag(to_date(col("o_orderdate").cast("timestamp")), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("_gap",
        datediff(to_date(col("o_orderdate").cast("timestamp")), col("_prev")))
    val bucketed = gaps.withColumn("bucket",
      when(col("_gap") <= 7, "0-7d")
        .when(col("_gap") <= 30, "8-30d")
        .when(col("_gap") <= 90, "31-90d")
        .when(col("_gap") <= 365, "91-365d")
        .otherwise("365d+"))
    val counts = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("gaps"))
    val tot = counts.agg(sum(col("gaps")).as("_t"))
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("gaps"),
        round(col("gaps").cast("double") / col("_t"), 4).as("share"))
  }

  /** Rolling z-score ANOMALY detection on daily revenue: each day is
    * scored against the mean/stddev of the `windowDays` PRECEDING days
    * (the day itself excluded — an anomaly must not dilute its own
    * baseline). Moments derive from decimal-exact Σx and Σx² window
    * sums with the textbook `(Σx² − (Σx)²/n)/(n−1)` sample variance in
    * double — the identical arithmetic DuckDB runs, so z-scores match
    * at round(4). Days with fewer than 2 predecessors get a null z
    * (undefined baseline), never a fabricated 0.
    *
    * The window runs over the DAILY revenue table — calendar-bounded
    * (one row per day), the same documented tiny-table exception as the
    * quota windows; fact-scale work is the one day-keyed aggregate.
    */
  def revenueAnomalies(orders: DataFrame, windowDays: Int = 7,
                       zThreshold: Double = 2.0): DataFrame = {
    require(windowDays >= 2,
      s"revenueAnomalies: windowDays must be ≥2, got $windowDays")
    require(zThreshold > 0,
      s"revenueAnomalies: zThreshold must be positive, got $zThreshold")
    val daily = orders
      .groupBy(to_date(col("o_orderdate").cast("timestamp")).as("day"))
      .agg(round(sum(col("o_totalprice").cast("decimal(30,6)")), 2)
        .cast("double").as("revenue"))
    val w = Window.orderBy(col("day")).rowsBetween(-windowDays, -1)
    val n = count(col("revenue")).over(w)
    val sx = sum(col("revenue").cast("decimal(30,6)")).over(w).cast("double")
    val sxx = sum((col("revenue") * col("revenue")).cast("decimal(30,6)"))
      .over(w).cast("double")
    daily
      .withColumn("_n", n).withColumn("_sx", sx).withColumn("_sxx", sxx)
      .withColumn("base_mean",
        when(col("_n") >= 2, round(col("_sx") / col("_n"), 4)))
      .withColumn("_var",
        (col("_sxx") - col("_sx") * col("_sx") / col("_n")) / (col("_n") - 1))
      .withColumn("z",
        when(col("_n") >= 2 && col("_var") > 0,
          round((col("revenue") - col("_sx") / col("_n")) / sqrt(col("_var")), 4)))
      // non-null boolean: a day without a defined baseline is NOT
      // flagged (and null-vs-NaN boolean renderings differ across
      // engines — a nullable flag column is a false-mismatch trap)
      .withColumn("is_anomaly",
        when(col("z").isNotNull, abs(col("z")) > zThreshold).otherwise(lit(false)))
      .select(col("day"), col("revenue"), col("base_mean"), col("z"),
        col("is_anomaly"))
  }

  /** Per-user event TRANSITION matrix: counts and row-normalized
    * probabilities of consecutive (prev → next) event-type pairs — the
    * Markov view of the clickstream. Consecutive means adjacent in the
    * user's (ts, event_id) order; the lag window partitions by user, so
    * parallelism is the user population, never a single task. Counts
    * are exact; probabilities divide once and round to 4.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("transitions"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("transitions")).as("_tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("transitions"),
        round(col("transitions").cast("double") / col("_tot"), 4).as("prob"))
  }

  /** RFM customer segmentation: quintile scores for Recency (days since
    * last order — lower is better), Frequency (order count) and Monetary
    * (decimal-exact revenue), plus a coarse segment label. Quintile cuts
    * come from the exact `percentile` aggregate (interpolation matches
    * DuckDB's `quantile_cont` — the q_ppl_buckets precedent), broadcast
    * back; scores are strict-`>` comparison sums, so the bucketing is
    * engine-deterministic. Monetary rounds to 2 BEFORE the cuts so both
    * engines rank identical values.
    *
    * Scale shape: one customer-keyed aggregate (partial → exchange on
    * custkey), one 1-row reference-date aggregate and one 3-array cut
    * aggregate (both broadcast) — the customer table crosses the wire
    * once.
    */
  def rfmSegments(orders: DataFrame): DataFrame =
    rfmFromStats(orders.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate").cast("timestamp"))).as("_last"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice").cast("decimal(30,6)")), 2)
          .cast("double").as("monetary")))

  /** RFM scoring over pre-aggregated per-customer stats
    * `(o_custkey, _last date, frequency, monetary)` — split out so the
    * streaming snapshot twin ([[graft.streaming.EventStreams
    * .rfmSnapshotSink]]) can maintain the re-aggregatable stats
    * incrementally (max / sum merges) and reuse the identical quintile
    * scoring. The reference date is the max `_last` across customers —
    * equal to the batch form's max order date by construction.
    */
  private[graft] def rfmFromStats(cust: DataFrame): DataFrame = {
    val ref = cust.agg(max(col("_last")).as("_ref"))
    val base = cust.crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("_ref"), col("_last")))
    val qs = "array(0.2, 0.4, 0.6, 0.8)"
    val cuts = base.agg(
      expr(s"percentile(recency_days, $qs)").as("_rc"),
      expr(s"percentile(frequency, $qs)").as("_fc"),
      expr(s"percentile(monetary, $qs)").as("_mc"))
    def above(v: Column, cs: Column): Column =
      (0 to 3).map(i => when(v > cs.getItem(i), 1).otherwise(0)).reduce(_ + _)
    base.crossJoin(broadcast(cuts))
      .withColumn("r_score", lit(5) - above(col("recency_days"), col("_rc")))
      .withColumn("f_score", lit(1) + above(col("frequency"), col("_fc")))
      .withColumn("m_score", lit(1) + above(col("monetary"), col("_mc")))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk_loyal")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
  }

  /** ABC (Pareto) revenue classification: items ranked by discounted
    * revenue; class A covers the leading `aShare` of total revenue, B up
    * to `bShare`, C the tail. Revenue sums are decimal-exact and round
    * to 2 BEFORE ranking; the cumulative share divides two decimals cast
    * to double, so the class boundaries are engine-deterministic.
    *
    * The cumulative window runs over the ITEM CATALOG (one row per
    * part — bounded by the catalog, not the fact table), the same
    * documented tiny/bounded-table exception as the quota windows; the
    * fact-scale work is the one part-keyed revenue aggregate.
    */
  def abcAnalysis(lineitem: DataFrame, aShare: Double = 0.8,
                  bShare: Double = 0.95): DataFrame = {
    require(aShare > 0 && aShare < bShare && bShare < 1,
      s"abcAnalysis: need 0 < aShare < bShare < 1, got $aShare, $bShare")
    val rev = lineitem.groupBy(col("l_partkey"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,6)")), 2).cast("double").as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum(col("revenue").cast("decimal(30,6)")).as("_tot"))
    rev.crossJoin(broadcast(tot))
      // decimal sums (exact), then DOUBLE division: decimal-division
      // scale rules differ across engines, double division does not —
      // and the 2-dp sums are exactly representable in double
      .withColumn("cum_share",
        sum(col("revenue").cast("decimal(30,6)")).over(w).cast("double")
          / col("_tot").cast("double"))
      .withColumn("abc_class",
        when(col("cum_share") <= aShare, "A")
          .when(col("cum_share") <= bShare, "B")
          .otherwise("C"))
      .select(col("l_partkey"), col("revenue"),
        round(col("cum_share"), 6).as("cum_share"), col("abc_class"))
  }

  /** MARKET-BASKET affinity: support / confidence / lift for every item
    * pair co-occurring in ≥ `minPairCount` baskets (the cross-sell
    * question over order line items). All counts are exact integers;
    * the ratios divide in one fixed association
    * (`lift = (pair/cA)/(cB/N)`) and round to 4, so the oracle mirror
    * is bit-deterministic.
    *
    * Scale shape: the pair generator self-joins baskets on the order
    * key — replication is Σ basket², so a pathological basket (one
    * order with a million items) would melt an executor; any basket
    * over `maxBasketSize` fails LOUDLY in-plan (raise_error, the
    * rangeJoin guard pattern) rather than hanging. Item counts and the
    * order total are broadcast sides; the only corpus-scale exchanges
    * are the basket distinct and the pair aggregate, both on compact
    * keys.
    */
  def basketAffinity(lineitem: DataFrame, orderCol: String, itemCol: String,
                     minPairCount: Long = 3, maxBasketSize: Int = 10000): DataFrame = {
    require(minPairCount >= 1,
      s"basketAffinity: minPairCount must be ≥1, got $minPairCount")
    require(maxBasketSize >= 2,
      s"basketAffinity: maxBasketSize must be ≥2, got $maxBasketSize")
    val baskets = lineitem
      .select(Cols.qcol(orderCol).as("_o"), Cols.qcol(itemCol).as("_i"))
      .distinct()
    val sizes = baskets.groupBy(col("_o")).agg(count(lit(1)).as("_bn"))
    val guarded = baskets.join(sizes, Seq("_o"))
      .withColumn("_i", when(col("_bn") <= maxBasketSize, col("_i"))
        .otherwise(raise_error(concat(
          lit(s"basketAffinity: basket "), col("_o").cast("string"),
          lit(s" has "), col("_bn").cast("string"),
          lit(s" items (> $maxBasketSize) — quadratic replication; " +
            "clean the basket or raise maxBasketSize deliberately")))))
      .select(col("_o"), col("_i"))
    val nOrders = baskets.agg(countDistinct(col("_o")).as("_n"))
    val itemCounts = baskets.groupBy(col("_i")).agg(count(lit(1)).as("_ic"))
    val a = guarded.select(col("_o"), col("_i").as("item_a"))
    val b = guarded.select(col("_o"), col("_i").as("item_b"))
    a.join(b, Seq("_o"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minPairCount)
      .join(broadcast(itemCounts.select(col("_i").as("item_a"), col("_ic").as("_ca"))),
        Seq("item_a"))
      .join(broadcast(itemCounts.select(col("_i").as("item_b"), col("_ic").as("_cb"))),
        Seq("item_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        round(col("pair_count").cast("double") / col("_n"), 4).as("support"),
        round(col("pair_count").cast("double") / col("_ca"), 4).as("confidence"),
        round((col("pair_count").cast("double") / col("_ca")) /
          (col("_cb").cast("double") / col("_n")), 4).as("lift"))
  }

  /** Weekly COHORT RETENTION: users grouped by the ISO week of their
    * first event (the cohort), counted by how many are active k weeks
    * later — the standard retention triangle. `week_offset` is exact
    * integer day arithmetic (floor(days/7)); counts are distinct users,
    * so the whole result is integer-exact.
    *
    * Scale shape: first-event per user is one user-keyed aggregate; the
    * activity join is user-keyed; the final (cohort, offset) aggregate
    * carries distinct-user state. Three exchanges total, none carrying
    * raw event payloads beyond (user, day).
    */
  /** Frozen cohort-assignment table `(user, cohort_week)` from landed
    * history — the static reference the streaming retention twin
    * ([[graft.streaming.EventStreams.cohortSnapshotSink]]) scores
    * against (a stream must not re-derive its own cohorts: they would
    * drift with batch composition). Identical arithmetic to the
    * assignment [[cohortRetention]] computes inline.
    */
  def cohortAssignments(events: DataFrame, userCol: String,
                        tsCol: String): DataFrame = {
    val u = Cols.qcol(userCol); val ts = Cols.qcol(tsCol)
    events.select(u.as("_user"), to_date(ts.cast("timestamp")).as("_day"))
      .groupBy(col("_user"))
      .agg(min(col("_day")).as("_first_day"))
      .select(col("_user").as(userCol),
        date_trunc("week", col("_first_day")).cast("date").as("cohort_week"))
  }

  /** Weekly cohort retention triangle. `mode = "exact"` (default) counts
    * distinct users per (cohort, offset) — oracle-checkable, but the
    * distinct state per cell grows with users, which is the triangle's
    * only super-scaling term (the saturated probe's 4.0× at 16×).
    * `mode = "sketch"` replaces the per-cell distinct set with an HLL
    * sketch ([[cohortCellSketches]]): state per cell is one `2^lgK`-byte
    * sketch regardless of user count, and the sketches are MERGEABLE, so
    * the streaming twin can maintain the triangle with O(cells) state
    * instead of O(cells × users) (the [[activeUsers]] treatment; error
    * bounded in AnalyticsSpec).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxWeeks: Int = 12, mode: String = "exact",
                      lgK: Int = 12): DataFrame = {
    require(maxWeeks >= 1, s"cohortRetention: maxWeeks must be ≥1, got $maxWeeks")
    require(mode == "exact" || mode == "sketch",
      s"cohortRetention: mode must be exact or sketch, got '$mode'")
    val u = Cols.qcol(userCol); val ts = Cols.qcol(tsCol)
    val acts = events.select(u.as("_user"),
      to_date(ts.cast("timestamp")).as("_day"))
    val first = acts.groupBy(col("_user"))
      .agg(min(col("_day")).as("_first_day"))
      .withColumn("cohort_week", date_trunc("week", col("_first_day")).cast("date"))
    val triples = acts.join(first, Seq("_user"))
      .withColumn("week_offset",
        floor(datediff(col("_day"), col("cohort_week")) / 7).cast("int"))
      .filter(col("week_offset") <= maxWeeks)
    if (mode == "exact")
      triples.groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("_user")).as("active_users"))
    else
      cohortRetentionFromSketches(cohortCellSketches(
        triples.select(col("cohort_week"), col("week_offset"), col("_user")), lgK))
  }

  /** Per-(cohort, offset) HLL sketch partials from assigned activity
    * triples `(cohort_week, week_offset, _user)` — the mergeable unit
    * shared by [[cohortRetention]]'s sketch mode and the streaming
    * snapshot sink ([[graft.streaming.EventStreams.cohortSnapshotSink]]
    * sketch mode): partials from different batches union via
    * `hll_union_agg`, so cross-batch repeat activity dedups inside the
    * sketch instead of requiring the full triple set in state.
    */
  def cohortCellSketches(triples: DataFrame, lgK: Int = 12): DataFrame =
    triples.groupBy(col("cohort_week"), col("week_offset"))
      .agg(hll_sketch_agg(col("_user"), lit(lgK)).as("_sk"))

  /** Estimate step over a `(cohort_week, week_offset, _sk)` cell-sketch
    * table — the batch-shaped triangle.
    */
  def cohortRetentionFromSketches(cells: DataFrame): DataFrame =
    cells.select(col("cohort_week"), col("week_offset"),
      hll_sketch_estimate(col("_sk")).as("active_users"))

  /** Top common event JOURNEYS: the most frequent length-n event-type
    * sequences across users. Per user, events sort into one ordered path
    * (ties on the timestamp break by event id — deterministic); the
    * path's DISTINCT n-grams (native `shingles_of`; paths shorter than n
    * collapse to one whole-path gram, the shingle convention) count ONE
    * per user, so the metric is "users whose journey contains this
    * pattern" — document frequency, immune to a single bot looping a
    * pattern thousands of times.
    *
    * Cost shape: one shuffle on the user for the path collect, one
    * partial-aggregated count on the (short) journey string, and a
    * bounded TakeOrdered for the top-k — no window over the full gram
    * table. The per-user collect is the only state that grows with a
    * user's activity, so it is bounded by `maxEventsPerUser` with a loud
    * in-plan failure (the basketAffinity cap discipline): a user over
    * the cap is a bot to filter upstream, not a row to silently truncate.
    */
  def commonJourneys(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String, n: Int = 3, topK: Int = 20,
                     maxEventsPerUser: Int = 10000): DataFrame = {
    require(n >= 2, s"commonJourneys: n must be ≥2, got $n")
    require(topK >= 1, s"commonJourneys: topK must be ≥1, got $topK")
    require(maxEventsPerUser >= n,
      s"commonJourneys: maxEventsPerUser must be ≥ n, got $maxEventsPerUser")
    val u = Cols.qcol(userCol); val ts = Cols.qcol(tsCol)
    val paths = events
      .select(u.as("_user"), struct(ts.as("_ts"), Cols.qcol(idCol).as("_id"),
        Cols.qcol(typeCol).as("_t")).as("_e"))
      .groupBy(col("_user"))
      .agg(sort_array(collect_list(col("_e"))).as("_es"))
      .select(col("_user"),
        when(size(col("_es")) > maxEventsPerUser,
          raise_error(concat(lit("commonJourneys: user "),
            col("_user").cast("string"),
            lit(s" exceeds $maxEventsPerUser events — filter upstream")))
            .cast("array<string>"))
          .otherwise(transform(col("_es"), e => e.getField("_t")))
          .as("_path"))
    paths
      .select(explode(call_function("shingles_of", col("_path"), lit(n)))
        .as("journey"))
      .groupBy(col("journey")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("journey")).limit(topK)
  }

  /** MULTI-TOUCH attribution: each purchase's value split across the
    * clicks that preceded it within the lookback window —
    * `model = "linear"` (equal split across the n touching clicks) or
    * `"time_decay"` (weight `0.5^(Δt/halfLifeSec)`, recency-favoring,
    * normalized per purchase so every purchase distributes exactly its
    * value). The marketing-analytics refinement of last/first-touch:
    * the pair generation IS [[graft.operators.Temporal.attributeWithin]]
    * (bin-bucketed, ≤2-bin replication), the per-purchase normalizer is
    * one keyed aggregate over the pair table, and credits re-aggregate
    * per click through decimal partials — nothing beyond the pair
    * volume moves. Output: (click id, credited value, touches).
    */
  def multiTouchAttribution(clicks: DataFrame, purchases: DataFrame,
                            leftKeys: Seq[String], rightKeys: Seq[String],
                            clickTs: String, purchaseTs: String,
                            clickIdCol: String, purchaseIdCol: String,
                            valueCol: String,
                            maxLagSec: Long, model: String = "linear",
                            halfLifeSec: Long = 900L): DataFrame = {
    require(model == "linear" || model == "time_decay",
      s"multiTouchAttribution: model must be linear or time_decay, got '$model'")
    require(halfLifeSec > 0,
      s"multiTouchAttribution: halfLifeSec must be positive, got $halfLifeSec")
    require(purchases.columns.contains(purchaseIdCol),
      s"multiTouchAttribution: purchases must carry '$purchaseIdCol'")
    val reserved = Set("_w", "_wsum", "_credit")
    val clash = (clicks.columns ++ purchases.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"multiTouchAttribution: column names ${clash.toSeq} collide with internal staging names")
    val pairs = Temporal.attributeWithin(clicks, purchases, leftKeys, rightKeys,
      clickTs, purchaseTs, maxLagSec)
    val w =
      if (model == "linear") lit(1.0)
      else pow(lit(0.5),
        (unix_micros(Cols.qcol(purchaseTs).cast("timestamp")) -
          unix_micros(Cols.qcol(clickTs).cast("timestamp"))).cast("double") /
          lit(halfLifeSec * 1e6))
    // per-purchase normalizer as a WINDOW over the pair table (decimal
    // sum — order-free), not a self-join back onto it; partitions are
    // one purchase's touching clicks, bounded by the lookback window
    val byPurchase = Window.partitionBy(Cols.qcol(purchaseIdCol))
    pairs.withColumn("_w", w)
      .withColumn("_wsum",
        sum(col("_w").cast("decimal(30,12)")).over(byPurchase).cast("double"))
      .withColumn("_credit",
        Cols.qcol(valueCol).cast("double") * col("_w") / col("_wsum"))
      .groupBy(Cols.qcol(clickIdCol))
      .agg(round(sum(col("_credit").cast("decimal(30,12)")).cast("double"), 4)
        .as("credited"),
        count(lit(1)).as("touches"))
  }

  /** Sliding-window ACTIVE USERS (WAU/MAU-style): for each active day,
    * the distinct users seen in the `windowDays` window ending that day.
    *
    * `mode = "exact"`: distinct (user, day) pairs explode to the ≤
    * `windowDays` window-end days they contribute to (an equi-join
    * shuffle on the window day — never a non-equi BNLJ), semi-joined to
    * observed days, then count-distinct per window. Replication factor
    * IS windowDays — exact mode is the audit path and the oracle form.
    *
    * `mode = "sketch"`: the 100 TB path — the pre-aggregated sketch
    * table pattern (Druid/Trino convention): ONE fact-scale pass builds
    * a per-day datasketches HLL sketch (`hll_sketch_agg`, mergeable,
    * built once and REUSED by every window containing that day), then a
    * calendar-RANGE window over the |days|-row sketch table UNION-merges
    * and estimates. No windowDays× replication, no second fact-scale
    * shuffle; gaps in the calendar are handled by the range frame (a
    * rows frame would silently stretch windows across gaps). Estimate
    * accuracy vs exact is bounded in AnalyticsSpec.
    */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windowDays: Int = 7, mode: String = "exact",
                  lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"activeUsers: windowDays must be ≥1, got $windowDays")
    require(mode == "exact" || mode == "sketch",
      s"activeUsers: mode must be exact or sketch, got '$mode'")
    val u = Cols.qcol(userCol); val ts = Cols.qcol(tsCol)
    val pairs = events.select(u.as("_user"),
      to_date(ts.cast("timestamp")).as("day")).distinct()
    if (mode == "exact") {
      val days = pairs.select(col("day")).distinct()
      pairs
        .select(col("_user"), explode(sequence(col("day"),
          date_add(col("day"), windowDays - 1))).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("_user")).as("active_users"))
    } else {
      val perDay = pairs.groupBy(col("day"))
        .agg(hll_sketch_agg(col("_user"), lit(lgK)).as("_sk"))
      activeUsersFromSketches(perDay, windowDays)
    }
  }

  /** The windowed union+estimate step over a per-day sketch table
    * `(day, _sk)` — shared by [[activeUsers]]' sketch mode and the
    * streaming snapshot sink
    * ([[graft.streaming.EventStreams.activeUsersSink]], which maintains
    * the sketch table incrementally and re-estimates per batch).
    */
  def activeUsersFromSketches(perDay: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1,
      s"activeUsersFromSketches: windowDays must be ≥1, got $windowDays")
    // RANGE frame on days-since-epoch: calendar distance, not row count
    val w = Window.orderBy(col("_dn"))
      .rangeBetween(-(windowDays - 1).toLong, Window.currentRow)
    perDay
      .withColumn("_dn", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("active_users",
        hll_sketch_estimate(hll_union_agg(col("_sk"), lit(true)).over(w)))
      .select(col("day"), col("active_users"))
  }

  /** Holt linear-trend forecast (double exponential smoothing) per
    * group over a pre-aggregated time series — the demand-forecast
    * primitive for the logistics domain (reference: order/revenue
    * trend reporting; Holt 1957 / Hyndman & Athanasopoulos FPP §8.2,
    * implemented from the recurrence statement):
    * `level_t = α·y_t + (1−α)(level_{t−1} + trend_{t−1})`,
    * `trend_t = β(level_t − level_{t−1}) + (1−β)·trend_{t−1}`,
    * initialized `level_1 = y_1, trend_1 = 0`; the h-step forecast is
    * `level_n + h·trend_n`.
    *
    * Scale shape: the input is a DAILY-AGGREGATED series, so each
    * group's state is O(|days|) — calendar-bounded like the cohort
    * triangle, never event-volume-bounded. One groupBy collects the
    * (date, value) points per group, a native `aggregate` HOF folds
    * the recurrence IN ORDER (an interpreted expression, but over
    * |groups| rows of |days|-element arrays — nothing row-scale; the
    * smoothing recursion is inherently sequential per group, and a
    * window over it would sort the same data and still fold
    * row-at-a-time), and the horizon explodes to `horizon` rows per
    * group. No self-joins, no iteration; the exchanges carry (group,
    * day) aggregates, never raw events.
    * Null dates/values drop; the fixed operation order makes an
    * engine mirror replay the fold bit-for-bit (consumers round).
    */
  def holtForecast(daily: DataFrame, groupCols: Seq[String], dateCol: String,
                   valueCol: String, alpha: Double, beta: Double,
                   horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"holtForecast: alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"holtForecast: beta in [0,1], got $beta")
    require(horizon >= 1, s"holtForecast: horizon must be ≥1, got $horizon")
    require(groupCols.nonEmpty, "holtForecast: groupCols must be non-empty")
    val g = groupCols.map(Cols.qcol)
    val pts = daily
      .select(g :+ Cols.qcol(dateCol).as("_d") :+
        Cols.qcol(valueCol).cast("double").as("_v"): _*)
      .filter(col("_d").isNotNull && col("_v").isNotNull)
    val series = pts.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("_d"), col("_v")))).as("_s"))
    val fitted = series.withColumn("_fit",
      aggregate(col("_s"),
        struct(lit(0.0).as("level"), lit(0.0).as("trend"), lit(0).as("n")),
        (acc, x) => {
          val y = x.getField("_v")
          val lvl = acc.getField("level")
          val tr = acc.getField("trend")
          val n = acc.getField("n")
          // the recurrence, with level_t spelled identically in both
          // uses so a SQL mirror reproduces the exact operation order
          val newLevel = when(n === 0, y)
            .otherwise(lit(alpha) * y + lit(1 - alpha) * (lvl + tr))
          val newTrend = when(n === 0, lit(0.0))
            .otherwise(lit(beta) * (newLevel - lvl) + lit(1 - beta) * tr)
          struct(newLevel.as("level"), newTrend.as("trend"), (n + 1).as("n"))
        }))
    fitted
      .withColumn("step", explode(sequence(lit(1), lit(horizon))))
      .select(g ++ Seq(col("step"),
        round(col("_fit.level") + col("step") * col("_fit.trend"), 6)
          .as("forecast")): _*)
  }

  /** Per-group simple OLS `y = intercept + slope·x` via the closed-form
    * normal equations — the price-elasticity / demand-curve regression
    * (slope of ln(qty) on ln(price) IS the elasticity), computable in
    * ONE partial-aggregated pass: six sufficient statistics
    * (n, Σx, Σy, Σx², Σxy, Σy²) accumulate through DECIMAL(30,12)
    * partials (order-independent — a regression near a rounding
    * boundary cannot flap between runs or engines), and the
    * slope/intercept/R² assembly is a fixed double expression over
    * them. No window, no second pass, no driver math: the exchange
    * carries six numbers per group at any data scale. Degenerate
    * groups (constant x, or constant y for R²) yield NULL rather than
    * ±∞. Nulls and non-finite x/y drop.
    */
  def groupOls(df: DataFrame, groupCols: Seq[String],
               xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupOls: groupCols must be non-empty")
    val g = groupCols.map(Cols.qcol)
    def dsum(c: Column): Column =
      sum(c.cast("decimal(30,12)")).cast("double")
    val pts = Spread.compute(df)
      .select(g :+ Cols.qcol(xCol).cast("double").as("_x") :+
        Cols.qcol(yCol).cast("double").as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull &&
        !isnan(col("_x")) && !isnan(col("_y")))
    val stats = pts.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      dsum(col("_x")).as("_sx"), dsum(col("_y")).as("_sy"),
      dsum(col("_x") * col("_x")).as("_sxx"),
      dsum(col("_x") * col("_y")).as("_sxy"),
      dsum(col("_y") * col("_y")).as("_syy"))
    val num = col("n") * col("_sxy") - col("_sx") * col("_sy")
    val denX = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val denY = col("n") * col("_syy") - col("_sy") * col("_sy")
    val slope = when(denX === 0.0, lit(null).cast("double"))
      .otherwise(num / denX)
    stats.select(g ++ Seq(col("n"),
      round(slope, 6).as("slope"),
      round((col("_sy") - slope * col("_sx")) / col("n"), 6).as("intercept"),
      round(when(denX === 0.0 || denY === 0.0, lit(null).cast("double"))
        .otherwise(num * num / (denX * denY)), 6).as("r2")): _*)
  }

  /** Holt-Winters ADDITIVE seasonal forecast (triple exponential
    * smoothing, period `period` — weekly demand cycles at m=7; FPP
    * §8.3 recurrences implemented from the statement):
    * `level_t = α(y_t − s_{t−m}) + (1−α)(level_{t−1} + trend_{t−1})`,
    * `trend_t = β(level_t − level_{t−1}) + (1−β)trend_{t−1}`,
    * `s_t = γ(y_t − (level_{t−1} + trend_{t−1})) + (1−γ)s_{t−m}`,
    * zero-initialized seasonals (`s_1 = 0`, first season burns in) and
    * `level_1 = y_1, trend_1 = 0`; the h-step forecast adds the ring
    * slot t = n+h reads: `level_n + h·trend_n + s_{n+h−m·⌈…⌉}`.
    *
    * Same one-exchange shape as [[holtForecast]] — the fold's state
    * gains an m-slot seasonal RING (read `(t−1) mod m`, rewritten by
    * slice+concat), still O(m + 1) per group however long the series.
    * Fixed operation order; an engine mirror carries the same ring
    * through a recursive CTE and lands on identical bits.
    */
  def holtWintersForecast(daily: DataFrame, groupCols: Seq[String],
                          dateCol: String, valueCol: String,
                          alpha: Double, beta: Double, gamma: Double,
                          period: Int, horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"holtWintersForecast: alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"holtWintersForecast: beta in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"holtWintersForecast: gamma in [0,1], got $gamma")
    require(period >= 2, s"holtWintersForecast: period must be ≥2, got $period")
    require(horizon >= 1, s"holtWintersForecast: horizon must be ≥1, got $horizon")
    require(groupCols.nonEmpty, "holtWintersForecast: groupCols must be non-empty")
    val m = period
    val g = groupCols.map(Cols.qcol)
    val pts = daily
      .select(g :+ Cols.qcol(dateCol).as("_d") :+
        Cols.qcol(valueCol).cast("double").as("_v"): _*)
      .filter(col("_d").isNotNull && col("_v").isNotNull)
    val series = pts.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("_d"), col("_v")))).as("_s"))
    val fitted = series.withColumn("_fit",
      aggregate(col("_s"),
        struct(lit(0.0).as("level"), lit(0.0).as("trend"),
          array_repeat(lit(0.0), m).as("seas"), lit(0).as("n")),
        (acc, x) => {
          val y = x.getField("_v")
          val lvl = acc.getField("level")
          val tr = acc.getField("trend")
          val seas = acc.getField("seas")
          val n = acc.getField("n")
          val pos0 = pmod(n, lit(m)) // 0-based ring slot for this point
          val sPrev = element_at(seas, (pos0 + 1).cast("int"))
          val newLevel = when(n === 0, y)
            .otherwise(lit(alpha) * (y - sPrev) + lit(1 - alpha) * (lvl + tr))
          val newTrend = when(n === 0, lit(0.0))
            .otherwise(lit(beta) * (newLevel - lvl) + lit(1 - beta) * tr)
          val sNew = when(n === 0, lit(0.0))
            .otherwise(lit(gamma) * (y - (lvl + tr)) + lit(1 - gamma) * sPrev)
          val newSeas = concat(
            slice(seas, lit(1), pos0.cast("int")),
            array(sNew),
            slice(seas, (pos0 + 2).cast("int"), (lit(m) - pos0 - 1).cast("int")))
          struct(newLevel.as("level"), newTrend.as("trend"),
            newSeas.as("seas"), (n + 1).as("n"))
        }))
    fitted
      .withColumn("step", explode(sequence(lit(1), lit(horizon))))
      .select(g ++ Seq(col("step"),
        round(col("_fit.level") + col("step") * col("_fit.trend") +
          element_at(col("_fit.seas"),
            (pmod(col("_fit.n") + col("step") - 1, lit(m)) + 1).cast("int")), 6)
          .as("forecast")): _*)
  }

  /** Demand ANOMALY flags from [[holtForecast]]'s one-step-ahead
    * residuals: each point's expectation is the model's forecast made
    * BEFORE seeing it (`level_{t−1} + trend_{t−1}`), and a point is
    * anomalous when its residual exceeds `zThreshold` standard
    * deviations of the group's residuals — the self-calibrating
    * "today broke the trend" monitor (the PSI/profile-drift siblings
    * compare distributions; this scores individual days).
    *
    * Same scale shape as the forecast: one fold per group (the fold
    * additionally carries the per-step prediction array, O(|days|)
    * like the series itself), one explode back to rows, and a
    * per-group σ from DECIMAL partial sums (order-independent, so the
    * flag boundary cannot flap between runs or engines). The first
    * point of a series has no expectation and is never flagged.
    */
  def holtAnomalies(daily: DataFrame, groupCols: Seq[String], dateCol: String,
                    valueCol: String, alpha: Double, beta: Double,
                    zThreshold: Double = 3.0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"holtAnomalies: alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"holtAnomalies: beta in [0,1], got $beta")
    require(zThreshold > 0, s"holtAnomalies: zThreshold must be positive, got $zThreshold")
    require(groupCols.nonEmpty, "holtAnomalies: groupCols must be non-empty")
    val g = groupCols.map(Cols.qcol)
    val pts = daily
      .select(g :+ Cols.qcol(dateCol).as("_d") :+
        Cols.qcol(valueCol).cast("double").as("_v"): _*)
      .filter(col("_d").isNotNull && col("_v").isNotNull)
    val series = pts.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("_d"), col("_v")))).as("_s"))
    val folded = series.withColumn("_preds",
      aggregate(col("_s"),
        struct(lit(0.0).as("level"), lit(0.0).as("trend"), lit(0).as("n"),
          array().cast("array<double>").as("preds")),
        (acc, x) => {
          val y = x.getField("_v")
          val lvl = acc.getField("level")
          val tr = acc.getField("trend")
          val n = acc.getField("n")
          val pred = when(n === 0, lit(null).cast("double")).otherwise(lvl + tr)
          val newLevel = when(n === 0, y)
            .otherwise(lit(alpha) * y + lit(1 - alpha) * (lvl + tr))
          val newTrend = when(n === 0, lit(0.0))
            .otherwise(lit(beta) * (newLevel - lvl) + lit(1 - beta) * tr)
          struct(newLevel.as("level"), newTrend.as("trend"), (n + 1).as("n"),
            concat(acc.getField("preds"), array(pred)).as("preds"))
        }).getField("preds"))
    // checkpoint the folded residual rows ONCE: they feed BOTH the σ
    // aggregate (broadcast build) and the join probe side, and the
    // sequential per-group fold is the operator's whole cost — without
    // this the fold pipeline runs twice per query. The table is one row
    // per (group, day) — calendar-bounded, never event-volume-bounded,
    // so materializing it is safe at any scale.
    val rows = folded
      .select(g :+ posexplode(arrays_zip(col("_s"), col("_preds"))): _*)
      .select(g ++ Seq(col("col._s._d").as("_d"), col("col._s._v").as("_v"),
        col("col._preds").as("expected")): _*)
      .withColumn("_err", col("_v") - col("expected"))
      .filter(col("_err").isNotNull)
      .localCheckpoint(true)
    // order-independent σ: decimal partial sums of e and e², assembled
    // in a fixed double expression both engines can replay
    val stats = rows.groupBy(g: _*).agg(
      sum(col("_err").cast("decimal(30,12)")).cast("double").as("_se"),
      sum((col("_err") * col("_err")).cast("decimal(30,12)")).cast("double").as("_se2"),
      count(lit(1)).as("_n"))
    rows.join(broadcast(stats), groupCols)
      .withColumn("_sigma",
        sqrt(greatest(col("_se2") / col("_n") -
          (col("_se") / col("_n")) * (col("_se") / col("_n")), lit(0.0))))
      .select(g ++ Seq(col("_d").as("day"), col("_v").as("value"),
        round(col("expected"), 4).as("expected"),
        round(col("_err"), 4).as("residual"),
        (abs(col("_err")) > lit(zThreshold) * col("_sigma")).as("anomaly")): _*)
  }

  def eventWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        moneySum(col("value")).as("total_value"),
        count_distinct(col("user_id")).as("distinct_users"))
      .orderBy(col("window_start"), col("event_type"))
}
