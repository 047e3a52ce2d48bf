package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversineKm: golden distances") {
    val d = Seq((51.5074, -0.1278, 48.8566, 2.3522))
      .toDF("a", "b", "c", "dd")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("dd")))
      .head().getDouble(0)
    assert(math.abs(d - 343.5) < 1.0, s"London-Paris ≈ 343.5 km, got $d")
    val eq = Seq((0.0, 0.0, 0.0, 1.0)).toDF("a", "b", "c", "dd")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("dd")))
      .head().getDouble(0)
    assert(math.abs(eq - 111.195) < 0.01, s"1° lon at the equator ≈ 111.195 km, got $eq")
    val z = Seq((12.34, 56.78, 12.34, 56.78)).toDF("a", "b", "c", "dd")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("dd")))
      .head().getDouble(0)
    assert(z == 0.0)
  }

  test("nearestSite: argmin with lowest-id tie-break; null coords drop; site-count guard") {
    val points = Seq((1L, Some(10.0), 10.0), (2L, Some(50.2), 50.2),
      (3L, Option.empty[Double], 5.0))
      .toDF("pid", "lat", "lon")
    val sites = Seq((100L, 11.0, 11.0), (200L, 50.0, 50.0), (300L, 11.0, 11.0))
      .toDF("sid", "lat", "lon")
    val out = Geo.nearestSite(points, sites, "pid", "sid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // point 1 is equidistant from sites 100 and 300 → lowest id wins
    assert(out == Map(1L -> 100L, 2L -> 200L), s"got $out")
    intercept[IllegalArgumentException] {
      Geo.nearestSite(points, sites, "pid", "sid", maxSites = 2)
    }
  }

  test("radiusJoin == brute force; pairs unique; pole and cell-explosion guards") {
    // deterministic spread incl. a high-lat site (75°) where the lon
    // span widening matters, and points straddling cell boundaries
    val points = (1 to 400).map { i =>
      (i.toLong, ((i * 13) % 120) - 60 + 0.25, ((i * 29) % 300) - 150 + 0.25)
    }.toDF("pid", "lat", "lon")
    val sites = Seq(
      (1L, 0.0, 0.0), (2L, 45.0, 90.0), (3L, -30.0, -120.0), (4L, 75.0, 10.0))
      .toDF("sid", "lat", "lon")
    val grid = Geo.radiusJoin(points, sites, "pid", "sid",
        radiusKm = 2000.0, cellDeg = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(grid.distinct.length == grid.length, "each pair must meet exactly once")
    val brute = points.crossJoin(sites.select(col("sid"),
        col("lat").as("slat"), col("lon").as("slon")))
      .withColumn("d", Geo.haversineKm(col("lat"), col("lon"), col("slat"), col("slon")))
      .filter(col("d") <= 2000.0)
      .select("pid", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid.toSet == brute, s"grid=${grid.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture must produce matches")
    // a polar site fails loudly
    val e = intercept[Exception] {
      Geo.radiusJoin(points, Seq((9L, 87.0, 0.0)).toDF("sid", "lat", "lon"),
        "pid", "sid", radiusKm = 500.0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("pole")), s"got $e")
    // absurd radius/cell ratio fails loudly instead of exploding
    val e2 = intercept[Exception] {
      Geo.radiusJoin(points, sites, "pid", "sid",
        radiusKm = 15000.0, cellDeg = 0.01, maxCellsPerSite = 1000L).collect()
    }
    assert(messages(e2).exists(m => m != null && m.contains("cells")), s"got $e2")
  }

  test("radiusJoin: hair-inside-radius ring at high latitude == brute force (exact lon bound)") {
    // points placed by the direct spherical geodesic at 0.999r and
    // 1.002r from a 70° site, across all bearings — the east/west
    // extremes are exactly where the planar lon span r/(R·cosφ)
    // undercovers the circle and a cell-boundary straddle could lose a
    // pair; the exact asin(sin(r/R)/cosφ) bound must recover them all
    val (slat, slon, r) = (70.0, 10.0, 500.0)
    def dest(bearingDeg: Double, distKm: Double): (Double, Double) = {
      val (f1, l1, th, d) = (math.toRadians(slat), math.toRadians(slon),
        math.toRadians(bearingDeg), distKm / Geo.EarthRadiusKm)
      val f2 = math.asin(math.sin(f1) * math.cos(d) +
        math.cos(f1) * math.sin(d) * math.cos(th))
      val l2 = l1 + math.atan2(math.sin(th) * math.sin(d) * math.cos(f1),
        math.cos(d) - math.sin(f1) * math.sin(f2))
      (math.toDegrees(f2), math.toDegrees(l2))
    }
    val points = (0 until 144).map { i =>
      val (la, lo) = dest(i * 2.5, if (i % 2 == 0) r * 0.999 else r * 1.002)
      (i.toLong, la, lo)
    }.toDF("pid", "lat", "lon")
    val sites = Seq((1L, slat, slon)).toDF("sid", "lat", "lon")
    val grid = Geo.radiusJoin(points, sites, "pid", "sid",
        radiusKm = r, cellDeg = 5.0)
      .select("point_id").collect().map(_.getLong(0)).toSet
    val brute = points
      .withColumn("d", Geo.haversineKm(col("lat"), col("lon"), lit(slat), lit(slon)))
      .filter(col("d") <= r)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(grid == brute, s"grid=${grid.size} brute=${brute.size}")
    assert(brute.size >= 70, "the inside half of the ring must qualify")
  }

  test("radiusJoin: full-ring span covers the whole raw longitude range, not a site-centered half-span") {
    // a 79° site with a 2500 km radius wraps every longitude at the top
    // of its lat span (sinRatio ≥ 1). Points near the antimeridian on
    // the OTHER side of the raw range (site lon 170, point lon -170)
    // are genuinely in radius but land in cells a site-centered ±180°
    // interval never replicates to — the full-ring branch must explode
    // over the entire raw [-180, 180] cell range
    val sites = Seq((1L, 79.0, 170.0)).toDF("sid", "lat", "lon")
    val points = Seq(
      (1L, 79.0, -170.0),  // 20° across the antimeridian: ~424 km, in radius
      (2L, 70.0, -10.0),   // far side, lower lat: ~3449 km, out of radius
      (3L, 79.0, 160.0))   // same side: in radius
      .toDF("pid", "lat", "lon")
    val got = Geo.radiusJoin(points, sites, "pid", "sid",
        radiusKm = 2500.0, cellDeg = 5.0)
      .select("point_id").collect().map(_.getLong(0)).toSet
    val brute = points
      .withColumn("d", Geo.haversineKm(col("lat"), col("lon"), lit(79.0), lit(170.0)))
      .filter(col("d") <= 2500.0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(brute.contains(1L), "fixture: the antimeridian point must be in radius")
    assert(got == brute, s"full-ring coverage must find cross-antimeridian pairs: " +
      s"got $got expected $brute")
  }
}
