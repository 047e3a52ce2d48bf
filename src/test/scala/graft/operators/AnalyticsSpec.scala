package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("pricingSummary aggregates per (returnflag, linestatus)") {
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.1, 0.05),
      ("A", "F", 20.0, 200.0, 0.2, 0.05),
      ("R", "O", 5.0, 50.0, 0.0, 0.0)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Analytics.pricingSummary(li).collect()
    assert(out.length == 2)
    val af = out.find(_.getString(0) == "A").get
    assert(af.getAs[Double]("sum_qty") == 30.0)
    assert(af.getAs[Double]("sum_base_price") == 300.0)
    // 100*0.9 + 200*0.8 = 250; charge = 250 * 1.05
    assert(af.getAs[Double]("sum_disc_price") == 250.0)
    assert(af.getAs[Double]("sum_charge") == 262.5)
    assert(af.getAs[Long]("count_order") == 2L)
  }

  test("sessionize splits on idle gap and aggregates per session") {
    val ev = Seq(
      (1L, 10L, "2026-01-01 10:00:00", 1.0),
      (2L, 10L, "2026-01-01 10:10:00", 2.0),
      (3L, 10L, "2026-01-01 11:00:00", 4.0),  // 50 min gap > 30 → new session
      (4L, 20L, "2026-01-01 09:00:00", 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Analytics.sessionize(ev, 30).collect()
    assert(out.length == 3)
    val u10 = out.filter(_.getAs[Long]("user_id") == 10L)
    assert(u10.map(_.getAs[Long]("event_count")).toSeq == Seq(2L, 1L))
    assert(u10(0).getAs[Double]("session_value") == 3.0)
    assert(u10(1).getAs[Double]("session_value") == 4.0)
  }

  test("topNPerGroup ranks by spend within nation") {
    val orders = Seq((1L, 100L, 50.0), (2L, 100L, 50.0), (3L, 101L, 30.0), (4L, 102L, 999.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((100L, "alice", 1), (101L, "bob", 1), (102L, "eve", 2))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((1, "FRANCE"), (2, "PERU")).toDF("n_nationkey", "n_name")
    val out = Analytics.topNPerGroup(orders, customer, nation, 1).collect()
    assert(out.length == 2)
    val fr = out.find(_.getAs[String]("nation") == "FRANCE").get
    assert(fr.getAs[String]("c_name") == "alice" && fr.getAs[Double]("total_spend") == 100.0)
    assert(out.find(_.getAs[String]("nation") == "PERU").get.getAs[String]("c_name") == "eve")
  }

  test("dailyRevenue running total accumulates in date order") {
    val orders = Seq(
      ("2026-01-02 00:00:00", 10.0), ("2026-01-01 00:00:00", 5.0), ("2026-01-02 00:00:00", 1.0)
    ).toDF("o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
    val out = Analytics.dailyRevenue(orders).collect()
    assert(out.map(_.getAs[Double]("revenue")).toSeq == Seq(5.0, 11.0))
    assert(out.map(_.getAs[Double]("cum_revenue")).toSeq == Seq(5.0, 16.0))
  }

  test("pricingRollup emits subtotals and a grand total") {
    val li = Seq(
      ("A", "F", 100.0, 0.0), ("A", "O", 50.0, 0.0), ("R", "F", 10.0, 0.0)
    ).toDF("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
    val out = Analytics.pricingRollup(li).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getDouble(2)))
    assert(out.length == 6) // 3 leaves + 2 flag subtotals + 1 grand total
    assert(out.contains((None, None, 160.0)))        // grand total
    assert(out.contains((Some("A"), None, 150.0)))   // flag subtotal
    assert(out.contains((Some("A"), Some("F"), 100.0)))
  }

  test("userActivityPivot produces a fixed wide schema with zero fills") {
    val ev = Seq((10L, "click"), (10L, "click"), (10L, "view"), (11L, "purchase"))
      .toDF("user_id", "event_type")
    val out = Analytics.userActivityPivot(ev, Seq("click", "view", "purchase"))
    assert(out.columns.toSeq == Seq("user_id", "click", "view", "purchase"))
    val rows = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(10L) == ((2L, 1L, 0L)))
    assert(rows(11L) == ((0L, 0L, 1L)))
  }

  test("funnel: ordered progression only, at-or-after boundary, guards") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: click → view → purchase, strictly ordered → all 3 stages
      (1L, "click", ts("2026-01-01 10:00:00")),
      (1L, "view", ts("2026-01-01 10:05:00")),
      (1L, "purchase", ts("2026-01-01 10:10:00")),
      // user 2: purchase BEFORE its view → stops after stage 2
      (2L, "click", ts("2026-01-01 09:00:00")),
      (2L, "purchase", ts("2026-01-01 09:10:00")),
      (2L, "view", ts("2026-01-01 09:20:00")),
      // user 3: view+purchase at the SAME instant as click → at-or-after
      // keeps the whole chain
      (3L, "click", ts("2026-01-01 08:00:00")),
      (3L, "view", ts("2026-01-01 08:00:00")),
      (3L, "purchase", ts("2026-01-01 08:00:00")),
      // user 4: no click → never enters the funnel
      (4L, "view", ts("2026-01-01 07:00:00")),
      (4L, "purchase", ts("2026-01-01 07:30:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("click", "view", "purchase"))
      .orderBy(col("stage")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1, "click", 3L), (2, "view", 3L), (3, "purchase", 2L)))
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "event_type", "ts", Seq("click"))
    }
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("click", "click", "view"))
    }
    // internal staging-name collision fails loudly, not silently wrong
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev.withColumnRenamed("ts", "_ts"),
        "user_id", "event_type", "_ts", Seq("click", "view"))
    }
  }

  test("purchaseIntervals: per-customer gaps, bucket boundaries, single-order exclusion") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, 1L, ts("2026-01-01")), (2L, 1L, ts("2026-01-08")),  // gap 7 → 0-7d
      (3L, 1L, ts("2026-02-08")),                               // gap 31 → 31-90d
      (4L, 2L, ts("2026-01-01")), (5L, 2L, ts("2026-01-09")),  // gap 8 → 8-30d
      (6L, 3L, ts("2026-01-01")))                               // single order: no gap
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Analytics.purchaseIntervals(orders)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "0-7d" -> ((1L, 0.3333)), "8-30d" -> ((1L, 0.3333)),
      "31-90d" -> ((1L, 0.3333))))
  }

  test("revenueAnomalies: exact rolling moments, self-exclusion, null baselines") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (ts("2026-01-01"), 10.0), (ts("2026-01-02"), 12.0), (ts("2026-01-03"), 11.0),
      (ts("2026-01-04"), 10.0), (ts("2026-01-05"), 100.0))
      .toDF("o_orderdate", "o_totalprice")
    val out = Analytics.revenueAnomalies(orders, windowDays = 3, zThreshold = 2.0)
      .collect().map(r => r.getDate(0).toString ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Boolean]))).toMap
    // day1: no predecessors; day2: one → null z, unflagged (false)
    assert(out("2026-01-01") == ((None, Some(false))))
    assert(out("2026-01-02") == ((None, Some(false))))
    // day3 baseline [10,12]: mean 11, var 2 → z = 0
    assert(out("2026-01-03") == ((Some(0.0), Some(false))))
    // day4 baseline [10,12,11]: mean 11, var 1 → z = -1
    assert(out("2026-01-04") == ((Some(-1.0), Some(false))))
    // day5 baseline [12,11,10]: mean 11, var 1 → z = 89 → anomaly
    assert(out("2026-01-05") == ((Some(89.0), Some(true))))
    // a zero-variance baseline yields null z, not a division blowup
    val flat = Seq((ts("2026-02-01"), 5.0), (ts("2026-02-02"), 5.0),
      (ts("2026-02-03"), 5.0), (ts("2026-02-04"), 50.0))
      .toDF("o_orderdate", "o_totalprice")
    val f = Analytics.revenueAnomalies(flat, windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> Option(r.get(3))).toMap
    assert(f("2026-02-04").isEmpty)
    intercept[IllegalArgumentException] {
      Analytics.revenueAnomalies(orders, windowDays = 1)
    }
  }

  test("eventTransitions: per-user adjacency, exact counts, row-normalized probs") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, "A", ts("2026-01-01 10:00:00")),
      (1L, 2L, "B", ts("2026-01-01 10:01:00")),
      (1L, 3L, "A", ts("2026-01-01 10:02:00")),
      (1L, 4L, "C", ts("2026-01-01 10:03:00")),
      (2L, 5L, "B", ts("2026-01-01 09:00:00")),
      (2L, 6L, "A", ts("2026-01-01 09:30:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Analytics.eventTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // user1: A→B, B→A, A→C; user2: B→A. No cross-user C→B transition.
    assert(out == Map(
      ("A", "B") -> ((1L, 0.5)), ("A", "C") -> ((1L, 0.5)),
      ("B", "A") -> ((2L, 1.0))))
  }

  test("rfmSegments: quintile scores by hand, recency inverted, segment labels") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // five customers, clearly separated R/F/M profiles
    val orders = Seq(
      // cust 1: recent + frequent + big → champion
      (1L, ts("2026-06-10"), 1000.0), (1L, ts("2026-06-09"), 1000.0),
      (1L, ts("2026-06-08"), 1000.0), (1L, ts("2026-06-07"), 1000.0),
      (1L, ts("2026-06-06"), 1000.0),
      // cust 2: old + frequent → at_risk_loyal
      (2L, ts("2026-01-01"), 500.0), (2L, ts("2026-01-02"), 500.0),
      (2L, ts("2026-01-03"), 500.0), (2L, ts("2026-01-04"), 500.0),
      // cust 3: recent + rare → recent
      (3L, ts("2026-06-10"), 100.0),
      // cust 4: old + rare → hibernating
      (4L, ts("2026-02-01"), 50.0),
      // cust 5: middling
      (5L, ts("2026-04-01"), 300.0), (5L, ts("2026-04-02"), 300.0),
      (5L, ts("2026-04-03"), 300.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.rfmSegments(orders)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3),
          r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toMap
    // recency_days from ref 2026-06-10: c1=0 c2=157 c3=0 c4=129 c5=68
    assert(out(1L)._1 == 0 && out(2L)._1 == 157 && out(5L)._1 == 68)
    assert(out(1L)._2 == 5L && out(1L)._3 == 5000.0)
    // cuts over [0,0,68,129,157]: p20=0, p40=40.8, p60=92.4, p80=134.6
    // scores r: c1,c3 → 0 > 0 false → 5; c5: 68>0, 68>40.8 → 5-2=3
    assert(out(1L)._4 == 5 && out(3L)._4 == 5 && out(5L)._4 == 3)
    assert(out(2L)._4 == 1 && out(4L)._4 == 2) // 129 > p20,p40,p60 → 2
    assert(out(1L)._7 == "champion")
    assert(out(2L)._7 == "at_risk_loyal")
    assert(out(3L)._7 == "recent")
    assert(out(4L)._7 == "hibernating")
    assert(out(5L)._7 == "regular")
  }

  test("abcAnalysis: cumulative shares classify A/B/C deterministically") {
    // revenues 50, 30, 15, 5 → cum shares .5, .8, .95, 1.0
    val li = Seq(
      (101L, 50.0, 0.0), (102L, 30.0, 0.0), (103L, 15.0, 0.0), (104L, 5.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Analytics.abcAnalysis(li)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    assert(out(101L) == ((50.0, 0.5, "A")))
    assert(out(102L) == ((30.0, 0.8, "A")))  // boundary: <= 0.8 stays A
    assert(out(103L) == ((15.0, 0.95, "B"))) // boundary: <= 0.95 stays B
    assert(out(104L) == ((5.0, 1.0, "C")))
    // discount reduces revenue before ranking
    val disc = Analytics.abcAnalysis(
        li.withColumn("l_discount", when(col("l_partkey") === 101L, 0.9).otherwise(0.0)))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(disc(102L) == "A") // 101's revenue collapses to 5 → 102 leads
    intercept[IllegalArgumentException] {
      Analytics.abcAnalysis(li, aShare = 0.9, bShare = 0.8)
    }
  }

  test("basketAffinity: hand support/confidence/lift, dup lines collapse, oversize fails") {
    // orders: 1:{A,B,C} 2:{A,B} 3:{A} 4:{B,D} — N=4
    // pair (A,B): count 2; support 2/4; conf 2/cA=2/3; lift conf/(cB/4)
    val li = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "A"), // dup line item collapses
      (2L, "A"), (2L, "B"),
      (3L, "A"),
      (4L, "B"), (4L, "D"))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketAffinity(li, "l_orderkey", "l_partkey",
        minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(("A", "B")))
    val (c, s, cf, lf) = out(("A", "B"))
    assert(c == 2L && s == 0.5 && cf == r4(2.0 / 3))
    assert(lf == r4((2.0 / 3) / (3.0 / 4))) // cB=3 baskets contain B
    // minPairCount=1 admits the singletons too
    assert(Analytics.basketAffinity(li, "l_orderkey", "l_partkey",
      minPairCount = 1).count() == 4) // AB, AC, BC, BD
    // an oversized basket fails loudly in-plan
    val big = (1 to 20).map(i => (9L, s"P$i")).toDF("l_orderkey", "l_partkey")
    val e = intercept[Exception] {
      Analytics.basketAffinity(li.union(big), "l_orderkey", "l_partkey",
        maxBasketSize = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("basketAffinity: basket")), s"got: $e")
  }

  test("cohortRetention: ISO-week cohorts, integer week offsets, distinct users") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2026-01-05 is a Monday
    val ev = Seq(
      (1L, ts("2026-01-06 10:00:00")), // cohort w/o 2026-01-05, offset 0
      (1L, ts("2026-01-07 10:00:00")), // same week — still offset 0, distinct once
      (1L, ts("2026-01-14 10:00:00")), // 9 days after cohort Monday → offset 1
      (2L, ts("2026-01-05 00:00:00")), // cohort Monday itself
      (2L, ts("2026-01-19 23:00:00")), // exactly 14 days → offset 2
      (3L, ts("2026-01-13 12:00:00"))) // cohort w/o 2026-01-12, offset 0 only
      .toDF("user_id", "ts")
    val out = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2026-01-05", 0) -> 2L, // users 1 and 2 in their first week
      ("2026-01-05", 1) -> 1L, // user 1
      ("2026-01-05", 2) -> 1L, // user 2
      ("2026-01-12", 0) -> 1L)) // user 3
    intercept[IllegalArgumentException] {
      Analytics.cohortRetention(ev, "user_id", "ts", maxWeeks = 0)
    }
  }

  test("commonJourneys: document-frequency trigram counts, short-path collapse, bot cap") {
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      // u1: a b c d → grams "a b c", "b c d"
      (1L, 1L, "a", t(0)), (2L, 1L, "b", t(1)), (3L, 1L, "c", t(2)), (4L, 1L, "d", t(3)),
      // u2: a b c → "a b c"
      (5L, 2L, "a", t(0)), (6L, 2L, "b", t(1)), (7L, 2L, "c", t(2)),
      // u3: one event → whole-path gram "x"
      (8L, 3L, "x", t(0)),
      // u4 loops a b c twice → DISTINCT grams {a b c, b c a, c a b}:
      // "a b c" must count ONCE for this user
      (9L, 4L, "a", t(0)), (10L, 4L, "b", t(1)), (11L, 4L, "c", t(2)),
      (12L, 4L, "a", t(3)), (13L, 4L, "b", t(4)), (14L, 4L, "c", t(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.commonJourneys(ev, "user_id", "event_type", "ts",
        "event_id", n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a b c") == 3L, s"doc-frequency must count u4 once: $out")
    assert(out("b c d") == 1L && out("x") == 1L)
    assert(out("b c a") == 1L && out("c a b") == 1L)

    val e = intercept[Exception] {
      Analytics.commonJourneys(ev, "user_id", "event_type", "ts",
        "event_id", n = 3, topK = 10, maxEventsPerUser = 5).collect()
    }
    assert(e.getMessage.contains("exceeds 5 events"))
  }

  test("multiTouchAttribution: linear splits equally, decay favors recency, value conserved") {
    def t(m: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime + m * 60000L)
    // purchase 100 at 10:30 touched by clicks at 10:00 and 10:15 (30m
    // and 15m before); purchase 101 at 12:00 touched by click 3 alone
    val clicks = Seq((1L, 10L, t(0)), (1L, 11L, t(15)), (1L, 12L, t(110)))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = Seq((1L, 100L, t(30), 30.0), (1L, 101L, t(120), 7.0))
      .toDF("p_user", "purchase_id", "purchase_ts", "p_value")
    def run(model: String) = Analytics.multiTouchAttribution(
        clicks, purchases, Seq("user_id"), Seq("p_user"),
        "click_ts", "purchase_ts", "click_id", "purchase_id", "p_value",
        maxLagSec = 1800L, model = model, halfLifeSec = 900L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lin = run("linear")
    assert(lin == Map(10L -> 15.0, 11L -> 15.0, 12L -> 7.0), s"got $lin")
    val dec = run("time_decay")
    // half-life 15m: click 11 (15m old, w=0.5) gets twice click 10's
    // (30m old, w=0.25) share → 20 vs 10; solo click keeps full value
    assert(math.abs(dec(11L) - 20.0) < 1e-6 && math.abs(dec(10L) - 10.0) < 1e-6
      && dec(12L) == 7.0, s"got $dec")
    // conservation: every attributed purchase distributes exactly its value
    assert(math.abs(lin.values.sum - 37.0) < 1e-6)
    assert(math.abs(dec.values.sum - 37.0) < 1e-6)
    intercept[IllegalArgumentException] {
      Analytics.multiTouchAttribution(clicks, purchases, Seq("user_id"),
        Seq("p_user"), "click_ts", "purchase_ts", "click_id", "purchase_id",
        "p_value", 1800L, model = "u_shaped")
    }
  }

  test("activeUsers: exact window counts honor calendar gaps; sketch matches exact") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    val ev = Seq(
      (1L, t("2026-01-01")), (2L, t("2026-01-01")),
      (2L, t("2026-01-02")),
      (3L, t("2026-01-10"))  // after a gap: its 3-day window must NOT
                             // reach back across the gap to day 1-2
    ).toDF("user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = canon(Analytics.activeUsers(ev, "user_id", "ts", windowDays = 3))
    assert(exact == Map("2026-01-01" -> 2L, "2026-01-02" -> 2L, "2026-01-10" -> 1L),
      s"got $exact")
    // datasketches HLL is exact at these cardinalities — the sketch path
    // must agree bit-for-bit here, which also pins the RANGE (not rows)
    // frame: a rows frame would stretch day 10's window across the gap
    val sk = canon(Analytics.activeUsers(ev, "user_id", "ts", windowDays = 3,
      mode = "sketch"))
    assert(sk == exact, s"sketch=$sk exact=$exact")
    intercept[IllegalArgumentException] {
      Analytics.activeUsers(ev, "user_id", "ts", mode = "bogus")
    }
  }

  test("activeUsers sketch tracks exact within HLL error at scale") {
    val rnd = new scala.util.Random(7)
    val ev = (1 to 20000).map { _ =>
      (rnd.nextInt(3000).toLong,
        java.sql.Timestamp.valueOf(f"2026-01-${1 + rnd.nextInt(28)}%02d 09:00:00"))
    }.toDF("user_id", "ts")
    val exact = Analytics.activeUsers(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val sk = Analytics.activeUsers(ev, "user_id", "ts", windowDays = 7,
        mode = "sketch")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(sk.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      assert(math.abs(sk(d) - n) <= math.max(3.0, 0.05 * n),
        s"day $d: sketch ${sk(d)} vs exact $n")
    }
  }

  test("cohortRetention sketch mode tracks exact within HLL error; same cells") {
    val rnd = new scala.util.Random(11)
    val ev = (1 to 20000).map { _ =>
      (rnd.nextInt(3000).toLong,
        java.sql.Timestamp.valueOf(f"2026-01-${1 + rnd.nextInt(28)}%02d 09:00:00"))
    }.toDF("user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val exact = canon(Analytics.cohortRetention(ev, "user_id", "ts"))
    val sk = canon(Analytics.cohortRetention(ev, "user_id", "ts", mode = "sketch"))
    assert(sk.keySet == exact.keySet, "sketch mode must emit the same cells")
    exact.foreach { case (cell, n) =>
      assert(math.abs(sk(cell) - n) <= math.max(3.0, 0.05 * n),
        s"cell $cell: sketch ${sk(cell)} vs exact $n")
    }
    intercept[IllegalArgumentException] {
      Analytics.cohortRetention(ev, "user_id", "ts", mode = "bogus")
    }
  }

  test("holtForecast: hand-computed recurrence, per-group isolation, degenerate series") {
    // α = β = 0.5 over [10, 20, 30]:
    //   t1: level 10,    trend 0
    //   t2: level 15,    trend 2.5
    //   t3: level 23.75, trend 5.625  → h-step forecast 23.75 + 5.625h
    val daily = Seq(
      ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 20.0), ("A", "2024-01-03", 30.0),
      ("B", "2024-01-01", 100.0)) // single point: flat forecast
      .toDF("g", "day", "v").withColumn("day", to_date(col("day")))
    val out = Analytics.holtForecast(daily, Seq("g"), "day", "v",
        alpha = 0.5, beta = 0.5, horizon = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("A", 1)) == 29.375 && out(("A", 2)) == 35.0 && out(("A", 3)) == 40.625)
    // a one-point series has zero trend: the forecast is the point
    assert(out(("B", 1)) == 100.0 && out(("B", 3)) == 100.0)
    assert(out.size == 6)
    // rows with null date or value drop before the fold
    val withNulls = daily.unionByName(Seq(("A", null.asInstanceOf[String], 999.0))
      .toDF("g", "day", "v").withColumn("day", to_date(col("day"))))
    val out2 = Analytics.holtForecast(withNulls, Seq("g"), "day", "v",
        alpha = 0.5, beta = 0.5, horizon = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out2(("A", 1)) == 29.375)
    intercept[IllegalArgumentException] {
      Analytics.holtForecast(daily, Seq("g"), "day", "v", 0.0, 0.5, 3)
    }
    intercept[IllegalArgumentException] {
      Analytics.holtForecast(daily, Seq("g"), "day", "v", 0.5, 0.5, 0)
    }
  }

  test("groupOls: exact line recovered, degenerate groups null, groups isolated") {
    val pts = Seq(
      ("A", 1.0, 3.0), ("A", 2.0, 5.0), ("A", 3.0, 7.0),   // y = 2x + 1 exactly
      ("B", 4.0, 10.0), ("B", 4.0, 20.0),                   // constant x: no slope
      ("C", 1.0, 9.0), ("C", 2.0, 9.0))                     // constant y: slope 0, r2 null
      .toDF("g", "x", "y")
    val out = Analytics.groupOls(pts, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(out("A") == ((3L, 2.0, 1.0, 1.0)))
    assert(out("B")._2 == null && out("B")._3 == null && out("B")._4 == null)
    assert(out("C") == ((2L, 0.0, 9.0, null)))
    // NaN and null points drop before the fit
    val noisy = pts.unionByName(Seq(("A", Double.NaN, 1.0)).toDF("g", "x", "y"))
    assert(Analytics.groupOls(noisy, Seq("g"), "x", "y")
      .filter(col("g") === "A").head().getDouble(2) == 2.0)
  }

  test("holtWintersForecast: hand-traced seasonal ring, alternating pattern recovered") {
    // α=0.5, β=0, γ=0.2, m=2 over [10, 20, 12, 22, 14] — hand trace:
    //   t1: level 10,     seas [0, 0]
    //   t2: level 15,     seas [0, 2]       (s = .2(20−10))
    //   t3: level 13.5,   seas [−0.6, 2]    (s = .2(12−15))
    //   t4: level 16.75,  seas [−0.6, 3.3]  (s = .2(22−13.5)+.8·2)
    //   t5: level 15.675, seas [−1.03, 3.3] (s = .2(14−16.75)+.8(−0.6))
    // h=1 reads slot 2 (3.3), h=2 slot 1 (−1.03): the alternation is
    // back in the forecast, which plain Holt cannot produce
    val daily = Seq(("A", "2024-01-01", 10.0), ("A", "2024-01-02", 20.0),
      ("A", "2024-01-03", 12.0), ("A", "2024-01-04", 22.0), ("A", "2024-01-05", 14.0))
      .toDF("g", "day", "v").withColumn("day", to_date(col("day")))
    val out = Analytics.holtWintersForecast(daily, Seq("g"), "day", "v",
        alpha = 0.5, beta = 0.0, gamma = 0.2, period = 2, horizon = 4)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(math.abs(out(1) - (15.675 + 3.3)) < 1e-5, s"got ${out(1)}")
    assert(math.abs(out(2) - (15.675 - 1.03)) < 1e-5, s"got ${out(2)}")
    // the ring repeats with period 2
    assert(out(3) == out(1) && out(4) == out(2))
    intercept[IllegalArgumentException] {
      Analytics.holtWintersForecast(daily, Seq("g"), "day", "v", 0.5, 0.0, 0.2, 1, 4)
    }
  }

  test("holtAnomalies: a planted spike flags, the smooth trend does not, first point excluded") {
    // clean linear trend 10,20,…,100 with day 8 spiked to 500
    val daily = (1 to 10).map { i =>
      ("A", f"2024-01-$i%02d", if (i == 8) 500.0 else i * 10.0)
    }.toDF("g", "day", "v").withColumn("day", to_date(col("day")))
    val out = Analytics.holtAnomalies(daily, Seq("g"), "day", "v",
        alpha = 0.5, beta = 0.5, zThreshold = 2.0)
      .collect().map(r => (r.getDate(1).toString,
        r.getDouble(4), r.getBoolean(5)))
    // the first point has no one-step-ahead expectation → absent
    assert(out.length == 9 && !out.exists(_._1 == "2024-01-01"))
    val flagged = out.filter(_._3).map(_._1).toSet
    assert(flagged == Set("2024-01-08"), s"only the spike flags: got $flagged")
    assert(out.find(_._1 == "2024-01-08").get._2 > 300.0,
      "the spike's residual must be the large positive surprise")
    // a second group must calibrate independently (tight σ → tiny
    // wiggles flag there even though they'd vanish inside A's spike σ)
    val two = daily.unionByName(
      (1 to 10).map(i => ("B", f"2024-01-$i%02d",
        if (i == 9) 2.0 else 1.0)).toDF("g", "day", "v")
        .withColumn("day", to_date(col("day"))))
    val byG = Analytics.holtAnomalies(two, Seq("g"), "day", "v",
        alpha = 0.5, beta = 0.5, zThreshold = 2.0)
      .collect().groupBy(_.getString(0))
    assert(byG("B").exists(r => r.getBoolean(5)),
      "group B's own σ must expose its relative spike")
    intercept[IllegalArgumentException] {
      Analytics.holtAnomalies(daily, Seq("g"), "day", "v", 0.5, 0.5, 0.0)
    }
  }

  test("deliveryPerformance splits counts by order status") {
    val orders = Seq((1L, 100L, "F", 10.0), (2L, 100L, "O", 20.0), (3L, 100L, "F", 30.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq((100L, 1)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((1, "KENYA")).toDF("n_nationkey", "n_name")
    val r = Analytics.deliveryPerformance(orders, customer, nation).head()
    assert(r.getAs[Long]("total_orders") == 3L)
    assert(r.getAs[Long]("fulfilled_count") == 2L)
    assert(r.getAs[Long]("open_count") == 1L)
    assert(r.getAs[Long]("pending_count") == 0L)
    assert(r.getAs[Double]("avg_order_price") == 20.0)
  }
}
