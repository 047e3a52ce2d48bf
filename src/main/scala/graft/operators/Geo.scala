package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives for the logistics domain — distance between
  * (lat, lon) points, nearest-site assignment (orders → closest
  * warehouse), and a radius join (points within R km of any site). The
  * reference schema carries no coordinates, but a logistics warehouse
  * is the first thing a delivery-performance pipeline adds; these are
  * the Spark-first shapes for it.
  *
  * Scale design: [[nearestSite]] broadcasts the (small) site table and
  * partial-aggregates the argmin map-side, so the exchange carries one
  * candidate row per point per partition — never the point×site cross
  * product. [[radiusJoin]] is the 2-D generalization of
  * [[Temporal.rangeJoin]]'s bin bucketing: sites replicate to the grid
  * cells their radius bounding box overlaps (bounded, loud on
  * explosion), points map to exactly ONE cell, the join is a plain hash
  * equi-join on the cell id, and the exact haversine predicate
  * re-checks after — each qualifying pair meets exactly once, no
  * dedup pass, no cartesian anywhere.
  */
object Geo {

  val EarthRadiusKm = 6371.0088
  private val KmPerDegLat = math.Pi * EarthRadiusKm / 180.0

  /** Great-circle distance in km (haversine). Pure double arithmetic in
    * a fixed operation order, so an engine mirror replays it
    * bit-for-bit up to libm ulp differences (consumers round).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Assign every point to its nearest site: broadcast the site table,
    * score per (point, site), take the per-point argmin as a `min` over
    * `struct(dist, siteId)` — lexicographic struct ordering IS the
    * argmin with a deterministic lowest-id tie-break, and the aggregate
    * partial-combines map-side so the exchange carries group state, not
    * the cross product. Sites must be a SMALL table (warehouses, hubs —
    * counted loudly against `maxSites`); null coordinates drop.
    */
  def nearestSite(points: DataFrame, sites: DataFrame,
                  pointIdCol: String, siteIdCol: String,
                  latCol: String = "lat", lonCol: String = "lon",
                  maxSites: Int = 10000): DataFrame = {
    val nSites = sites.count()
    require(nSites > 0 && nSites <= maxSites,
      s"nearestSite: site table must be small and non-empty (broadcast side), " +
        s"got $nSites rows vs maxSites=$maxSites")
    val p = points.select(Cols.qcol(pointIdCol).as("point_id"),
        Cols.qcol(latCol).cast("double").as("_plat"),
        Cols.qcol(lonCol).cast("double").as("_plon"))
      .filter(col("_plat").isNotNull && col("_plon").isNotNull)
    val s = sites.select(Cols.qcol(siteIdCol).as("_sid"),
        Cols.qcol(latCol).cast("double").as("_slat"),
        Cols.qcol(lonCol).cast("double").as("_slon"))
      .filter(col("_slat").isNotNull && col("_slon").isNotNull)
    p.crossJoin(broadcast(s))
      .select(col("point_id"),
        struct(
          haversineKm(col("_plat"), col("_plon"), col("_slat"), col("_slon"))
            .as("dist_km"),
          col("_sid").as("site_id")).as("_cand"))
      .groupBy(col("point_id"))
      .agg(min(col("_cand")).as("_best"))
      .select(col("point_id"), col("_best.site_id").as("site_id"),
        col("_best.dist_km").as("dist_km"))
  }

  /** All (point, site) pairs within `radiusKm` — the 2-D bin-bucketed
    * join: each site explodes to every `cellDeg`-degree grid cell its
    * radius bounding box overlaps (lat span from the km/degree
    * constant; lon span from the EXACT spherical bound
    * `asin(sin(r/R)/cos φ)` at the minimum cos over the lat span, so
    * the box always covers the circle), each point maps to exactly
    * ONE cell, the join runs on the cell id and the exact haversine
    * predicate re-checks after. Pairs meet exactly once (the point's
    * cell). Sites above |lat| `maxAbsLat` fail LOUDLY — near the poles
    * the lon span degenerates toward the whole ring (and this planar
    * grid does not wrap the dateline; feed lon in a safe band or
    * pre-rotate).
    */
  def radiusJoin(points: DataFrame, sites: DataFrame,
                 pointIdCol: String, siteIdCol: String,
                 radiusKm: Double, cellDeg: Double = 5.0,
                 latCol: String = "lat", lonCol: String = "lon",
                 maxCellsPerSite: Long = 100000L,
                 maxAbsLat: Double = 80.0): DataFrame = {
    require(radiusKm > 0, s"radiusJoin: radiusKm must be positive, got $radiusKm")
    require(cellDeg > 0, s"radiusJoin: cellDeg must be positive, got $cellDeg")
    val latSpan = radiusKm / KmPerDegLat
    val p = points.select(Cols.qcol(pointIdCol).as("point_id"),
        Cols.qcol(latCol).cast("double").as("_plat"),
        Cols.qcol(lonCol).cast("double").as("_plon"))
      .filter(col("_plat").isNotNull && col("_plon").isNotNull)
      .withColumn("_latc", floor(col("_plat") / cellDeg))
      .withColumn("_lonc", floor(col("_plon") / cellDeg))
    val s0 = sites.select(Cols.qcol(siteIdCol).as("site_id"),
        Cols.qcol(latCol).cast("double").as("_slat"),
        Cols.qcol(lonCol).cast("double").as("_slon"))
      .filter(col("_slat").isNotNull && col("_slon").isNotNull)
      .withColumn("_slat", when(abs(col("_slat")) > maxAbsLat,
        raise_error(concat(lit(s"radiusJoin: site latitude beyond ±$maxAbsLat ("),
          col("_slat").cast("string"),
          lit(") — the planar grid degenerates near the poles"))))
        .otherwise(col("_slat")))
    // min cos over the site's lat span = cos at the largest |lat| the
    // box reaches (clamped away from zero); the lon half-span at
    // latitude φ is the EXACT spherical bound asin(sin(r/R)/cos φ) —
    // strictly wider than the planar r/(R·cos φ), which is NOT a
    // superset of the circle and could miss a pair within a hair of the
    // radius across a cell boundary; evaluating at cosMin (the smallest
    // cos the circle reaches) keeps the box a SUPERSET at every
    // latitude in the span. Ratio ≥ 1 means the circle wraps every
    // longitude at some latitude in the span → full-ring span.
    val maxAbs = greatest(abs(col("_slat") - latSpan), abs(col("_slat") + latSpan))
    val cosMin = greatest(cos(radians(least(maxAbs, lit(89.9)))), lit(0.01))
    val sinR =
      if (radiusKm / EarthRadiusKm >= math.Pi / 2) 1.0
      else math.sin(radiusKm / EarthRadiusKm)
    val sinRatio = lit(sinR) / cosMin
    val lonSpan = when(sinRatio >= 1.0, lit(180.0))
      .otherwise(degrees(asin(sinRatio)))
    // full ring (ratio ≥ 1): the circle wraps EVERY longitude at some
    // latitude in the span — a site-centered ±180° interval is the
    // wrong cover, because points bucket their RAW lon in [-180, 180]
    // while a site at lon 170 would replicate over [-10, 350] and miss
    // every in-radius point below -10; explode over the whole raw
    // longitude cell range instead
    val fullRing = sinRatio >= 1.0
    val sReplicated = s0
      .withColumn("_lat_lo", floor((col("_slat") - latSpan) / cellDeg))
      .withColumn("_lat_hi", floor((col("_slat") + latSpan) / cellDeg))
      .withColumn("_lon_lo", when(fullRing, floor(lit(-180.0) / cellDeg))
        .otherwise(floor((col("_slon") - lonSpan) / cellDeg)))
      .withColumn("_lon_hi", when(fullRing, floor(lit(180.0) / cellDeg))
        .otherwise(floor((col("_slon") + lonSpan) / cellDeg)))
      .withColumn("_cells",
        (col("_lat_hi") - col("_lat_lo") + 1) * (col("_lon_hi") - col("_lon_lo") + 1))
      .withColumn("_lat_lo", when(col("_cells") <= maxCellsPerSite, col("_lat_lo"))
        .otherwise(raise_error(concat(
          lit(s"radiusJoin: a site replicates to more than $maxCellsPerSite cells — " +
            "widen cellDeg or shrink radiusKm"))).cast("long")))
      .withColumn("_latc", explode(sequence(col("_lat_lo"), col("_lat_hi"))))
      .withColumn("_lonc", explode(sequence(col("_lon_lo"), col("_lon_hi"))))
      .select(col("site_id"), col("_slat"), col("_slon"), col("_latc"), col("_lonc"))
    p.join(sReplicated, Seq("_latc", "_lonc"))
      .withColumn("dist_km",
        haversineKm(col("_plat"), col("_plon"), col("_slat"), col("_slon")))
      .filter(col("dist_km") <= radiusKm)
      .select(col("point_id"), col("site_id"), col("dist_km"))
  }
}
