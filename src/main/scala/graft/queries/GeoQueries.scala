package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoFunctions._
import graft.operators.TrackPipeline

/** Geospatial query family over the track domain (the reference is a
  * GPS-track connector; reference `task.ts:29-32,139-142` relays
  * point geometry, and its CoT peer library ships turf
  * destination/ellipse helpers — reference `task.ts:2`).
  *
  * The testdata has no coordinate columns, so lat/lon are DERIVED
  * from `events` by exact integer arithmetic (portable: both engines
  * compute bit-identical doubles), confined to a band
  * lat ∈ [30, 60), lon ∈ [-120, -60) — a realistic continental
  * operating area that also keeps haversine inputs far from the
  * antipodal asin() singularity where cross-engine ulp drift would
  * amplify.
  *
  * Quantization: transcendental results collapse onto a fixed grid
  * via `floor(x*scale + 0.5)/scale` — pure-double step functions
  * that stay in whole-stage codegen (the first DECIMAL-cast
  * formulation benched 3.5 s on the geofence query at sf0.1 from
  * per-pair BigDecimal churn; see GeoFunctions.distDm). Values
  * derived from ALREADY-quantized inputs (speeds, sums of
  * deci-meter longs) are exact with no further hazard.
  *
  * Scale design per query is in the entry comments; the common theme:
  * the stations dimension is tiny (25 rows → ≤225 after neighbor
  * expansion) and ALWAYS broadcast — no plan here shuffles the fact
  * side except the per-key window/aggregate that defines the query.
  */
object GeoQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Derived track coordinates (see object doc). */
  private def withGeo(df: DataFrame): DataFrame = df
    .withColumn("lat",
      lit(30.0) + (col("event_id") * 37 % 3000).cast("double") / 100.0)
    .withColumn("lon",
      lit(-120.0) +
        ((col("event_id") * 73 + col("user_id") * 131) % 6000)
          .cast("double") / 100.0)

  /** 25 fixed stations derived from `nation` — the broadcastable dim. */
  private def stations(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "nation").select(
      col("n_nationkey").cast("long").as("st_id"),
      (lit(30.0) + (col("n_nationkey") * 613 % 3000).cast("double") / 100.0)
        .as("st_lat"),
      (lit(-120.0) + (col("n_nationkey") * 937 % 6000).cast("double") / 100.0)
        .as("st_lon"))

  /** Shared oracle CTE prologue — the SQL mirror of withGeo/stations. */
  private val ptsCte =
    """pts AS (
         SELECT event_id, user_id, ts, value,
           30.0 + CAST(event_id * 37 % 3000 AS DOUBLE) / 100.0 AS lat,
           -120.0 + CAST((event_id * 73 + user_id * 131) % 6000 AS DOUBLE)
             / 100.0 AS lon
         FROM events)"""

  private val stCte =
    """st AS (
         SELECT CAST(n_nationkey AS BIGINT) AS st_id,
           30.0 + CAST(n_nationkey * 613 % 3000 AS DOUBLE) / 100.0 AS st_lat,
           -120.0 + CAST(n_nationkey * 937 % 6000 AS DOUBLE) / 100.0 AS st_lon
         FROM nation)"""

  /** RAW haversine SQL between named column pairs — association
    * mirrors [[GeoFunctions.haversineM]] exactly.
    */
  private def havSql(lat1: String, lon1: String,
                     lat2: String, lon2: String): String =
    s"""12742017.6 * asin(sqrt(
          sin(($lat2 - $lat1) * 0.017453292519943295 / 2)
            * sin(($lat2 - $lat1) * 0.017453292519943295 / 2)
          + cos($lat1 * 0.017453292519943295)
            * cos($lat2 * 0.017453292519943295)
            * (sin(($lon2 - $lon1) * 0.017453292519943295 / 2)
               * sin(($lon2 - $lon1) * 0.017453292519943295 / 2))))"""

  /** SQL mirror of [[GeoFunctions.distDm]]: integer deci-meters. */
  private def dmSql(lat1: String, lon1: String,
                    lat2: String, lon2: String): String =
    s"CAST(floor((${havSql(lat1, lon1, lat2, lon2)}) * 10.0 + 0.5) AS BIGINT)"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-track motion enrichment: distance, initial bearing and
    // speed between consecutive points of each entity — the first
    // thing any track analytics computes downstream of the
    // reference's relay. One shuffle (window partition by entity);
    // at 100 TB the partition key is the entity id, so state per
    // task is one track's points — no skew beyond the busiest
    // device.
    "q_geo_track_enrich" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      withGeo(ev(s, dir))
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .withColumn("pms", lag(unix_millis(col("ts")), 1).over(w))
        .withColumn("dist_m",
          distQ(col("plat"), col("plon"), col("lat"), col("lon")))
        .withColumn("dt_s",
          (unix_millis(col("ts")) - col("pms")).cast("double") / 1000.0)
        .select(
          col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("time_ms"),
          col("dist_m"),
          bearingQ(col("plat"), col("plon"), col("lat"), col("lon"))
            .as("bearing_deg"),
          // dist_m and dt_s are already engine-identical, so the
          // speed quantize is exact (no transcendental hazard left)
          when(col("dt_s") > 0,
            floor(col("dist_m") / col("dt_s") * 10000.0 + 0.5) / 10000.0)
            .as("speed_mps"))
        .orderBy(col("event_id"))
    },

    // Radius join: all points within 150 km of any station, via
    // 3°-grid blocking — the scale-correct spatial join. The station
    // side expands to its 3×3 neighbor cells (≤225 rows, broadcast);
    // the fact side computes one cell key map-side and hash-joins —
    // NO cross product, NO fact shuffle before the final per-station
    // aggregate. Blocking is lossless here: 150 km < 3° in both axes
    // over the operating band (min cos(lat) = cos 60° → 1° lon ≥
    // 55.66 km), so a qualifying pair's cells differ by at most 1.
    "q_geo_radius_join" -> { (s, dir) =>
      val pts = withGeo(ev(s, dir))
        .withColumn("cell", cellKey(col("lat"), col("lon"), 3.0))
      val st9 = stations(s, dir)
        .withColumn("di", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dj", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("cell",
          cellKeyOff(col("st_lat"), col("st_lon"), 3.0, col("di"), col("dj")))
      pts.join(broadcast(st9), "cell")
        .withColumn("dm",
          distDm(col("st_lat"), col("st_lon"), col("lat"), col("lon")))
        .filter(col("dm") <= 1500000L)
        .groupBy(col("st_id"))
        .agg(count(lit(1)).as("n_pts"),
          count_distinct(col("user_id")).as("n_users"),
          (min(col("dm")) / 10.0).as("min_m"))
        .orderBy(col("st_id"))
    },

    // Nearest-station assignment (voronoi partition of the fleet):
    // argmin over the broadcast dim packed into ONE long —
    // min(dm*32 + st_id) — so the whole argmin is a primitive-long
    // hash aggregate with map-side partials (no window sort, no
    // struct ordering); ties break toward the smaller station id by
    // construction. Deci-meter longs keep the per-station SUM exact
    // and order-independent.
    "q_geo_nearest_station" -> { (s, dir) =>
      withGeo(ev(s, dir))
        .crossJoin(broadcast(stations(s, dir)))
        .select(col("event_id"),
          (distDm(col("st_lat"), col("st_lon"), col("lat"), col("lon"))
            * 32 + col("st_id")).as("key"))
        .groupBy(col("event_id")).agg(min(col("key")).as("k"))
        .select((col("k") % 32).as("st_id"), expr("k div 32").as("dm"))
        .groupBy(col("st_id"))
        .agg(count(lit(1)).as("n_pts"),
          (sum(col("dm")).cast("double") / 10.0).as("sum_m"))
        .orderBy(col("st_id"))
    },

    // Geofence enter/exit detection: flag every point where an
    // entity crosses a 100 km station fence (the reference's
    // emergency/alert domain — `task.ts:125` classifies beacons; a
    // real TAK deployment alerts on fence transitions). The
    // containment check is ZERO-join: the 25 station coordinates
    // unroll into a codegen'd least() of inlined haversines
    // (GeoFunctions.minStationDistQ) evaluated map-side. The only
    // shuffle is the per-entity lag window.
    "q_geo_geofence" -> { (s, dir) =>
      val sts = stations(s, dir).orderBy(col("st_id")).collect()
        .toSeq.map(r => (r.getDouble(1), r.getDouble(2)))
      val minDq = minStationDistQ(col("lat"), col("lon"), sts)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // fanOut keyed on the window partition key (r13): the 25
      // inlined haversines per row ran single-threaded in the
      // one-row-group scan; hashing by user_id parallelizes the trig
      // AND satisfies the lag window's clustering, so the plan still
      // has exactly one exchange. No-op at scale.
      graft.Tables.fanOut(withGeo(ev(s, dir)), col("user_id"))
        .withColumn("min_dq", minDq)
        .withColumn("inside", col("min_dq") <= 100000.0)
        .withColumn("pinside", lag(col("inside"), 1).over(w))
        .filter(col("pinside").isNotNull && col("inside") =!= col("pinside"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("time_ms"),
          col("min_dq").as("min_m"),
          when(col("inside"), lit("enter")).otherwise(lit("exit"))
            .as("transition"))
        .orderBy(col("event_id"))
    },

    // Turf-destination analogue (reference `task.ts:2` — node-cot's
    // range rings): project each entity's LATEST point forward along
    // its course. latest-per-key is the reference's A1 aggregate;
    // the projection is pure map-side math.
    "q_geo_destination" -> { (s, dir) =>
      val latest = TrackPipeline
        .latestPerKey(withGeo(ev(s, dir)), "user_id", "ts", "event_id")
        .select(col("user_id"),
          col("latest.lat").as("lat"), col("latest.lon").as("lon"),
          (col("latest.value") % 360.0).as("course"),
          (lit(500.0) + (col("latest.event_id") % 100).cast("double") * 25.0)
            .as("dist_m"),
          unix_millis(col("latest.ts")).as("time_ms"))
      val (dlat, dlon) = destination(
        col("lat"), col("lon"), col("course"), col("dist_m"))
      latest.select(col("user_id"), col("time_ms"), col("course"),
          col("dist_m"), dlat.as("dest_lat"), dlon.as("dest_lon"))
        .orderBy(col("user_id"))
    },

    // Z-order keys: 16-bit lat/lon bins interleaved to a 32-bit
    // Morton key — integer-exact in both engines (no transcendentals
    // involved). The key itself is the point; ZOrderSpec measures the
    // row-group skipping a morton-clustered layout buys.
    "q_geo_zorder" -> { (s, dir) =>
      withGeo(ev(s, dir)).select(
          col("event_id"),
          latBin16(col("lat")).as("lat_bin"),
          lonBin16(col("lon")).as("lon_bin"),
          mortonKey(col("lat"), col("lon")).as("morton"))
        .orderBy(col("event_id"))
    },

    // Grid-density hotspots: bucket points into 1° cells (exact —
    // the derived coordinates are rationals with power-of-ten
    // denominators, so floor() is integer semantics), then score
    // each cell against its 3×3 neighborhood mean via a 9-way offset
    // explode over the CELL AGGREGATE — the kernel join touches
    // |cells|·9 rows, never points, which is what makes KDE-style
    // smoothing affordable when the fact table is 100 TB. Top-10 by
    // density ratio is sort+limit (TakeOrderedAndProject).
    "q_geo_grid_hotspots" -> { (s, dir) =>
      val cells = withGeo(ev(s, dir))
        .groupBy(floor(col("lat")).cast("long").as("cla"),
          floor(col("lon")).cast("long").as("clo"))
        .agg(count(lit(1)).as("n"))
      val neighbors = cells
        .withColumn("dx", explode(expr("array(-1, 0, 1)")))
        .withColumn("dy", explode(expr("array(-1, 0, 1)")))
        .groupBy((col("cla") + col("dx")).as("cla"),
          (col("clo") + col("dy")).as("clo"))
        .agg(sum(col("n")).as("nbhd_n"), count(lit(1)).as("nbhd_cells"))
      cells.join(neighbors, Seq("cla", "clo"))
        .select(col("cla").as("lat_cell"), col("clo").as("lon_cell"),
          col("n"), col("nbhd_n"), col("nbhd_cells"),
          round(col("n") * col("nbhd_cells") / col("nbhd_n"), 4)
            .as("density_ratio"))
        .orderBy(col("density_ratio").desc, col("lat_cell"),
          col("lon_cell"))
        .limit(10)
    },

    // Per-entity track summary — bounding box, centroid and point
    // count per entity, the "flight envelope" row a track UI lists
    // before rendering any geometry: one hash aggregate over the
    // derived coordinates (min/max exact; centroid via DECIMAL
    // coordinate sums — the coordinates are exact 2-decimal
    // doubles, so the sums are exact and the division is the only
    // double, pinned at round(4)). Top-20 widest boxes by span.
    "q_geo_track_summary" -> { (s, dir) =>
      val pts = withGeo(ev(s, dir))
        .select(col("user_id").as("entity"), col("lat"), col("lon"))
      pts.groupBy(col("entity"))
        .agg(count(lit(1)).as("n_points"),
          min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
          min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"),
          sum(col("lat").cast("decimal(18,6)"))
            .cast("decimal(28,6)").as("slat"),
          sum(col("lon").cast("decimal(18,6)"))
            .cast("decimal(28,6)").as("slon"))
        .select(col("entity"), col("n_points"),
          col("lat_min"), col("lat_max"), col("lon_min"),
          col("lon_max"),
          round(col("slat").cast("double") / col("n_points"), 4)
            .as("centroid_lat"),
          round(col("slon").cast("double") / col("n_points"), 4)
            .as("centroid_lon"),
          round((col("lat_max") - col("lat_min")) *
            (col("lon_max") - col("lon_min")), 4).as("bbox_area"))
        .orderBy(col("bbox_area").desc, col("entity"))
        .limit(20)
    }
  )

  val oracles: Map[String, String] = Map(

    "q_geo_track_enrich" ->
      s"""WITH $ptsCte,
         lagged AS (
           SELECT event_id, user_id, epoch_ms(ts) AS time_ms, lat, lon,
             LAG(lat) OVER w AS plat,
             LAG(lon) OVER w AS plon,
             LAG(epoch_ms(ts)) OVER w AS pms
           FROM pts
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         dists AS (
           SELECT event_id, user_id, time_ms, lat, lon, plat, plon,
             CAST(${dmSql("plat", "plon", "lat", "lon")} AS DOUBLE) / 10.0
               AS dist_m,
             CAST(time_ms - pms AS DOUBLE) / 1000.0 AS dt_s
           FROM lagged)
         SELECT event_id, user_id, time_ms, dist_m,
           floor(((atan2(sin((lon - plon) * 0.017453292519943295)
                      * cos(lat * 0.017453292519943295),
                    cos(plat * 0.017453292519943295)
                      * sin(lat * 0.017453292519943295)
                    - sin(plat * 0.017453292519943295)
                      * cos(lat * 0.017453292519943295)
                      * cos((lon - plon) * 0.017453292519943295))
              * 57.29577951308232 + 360.0) % 360.0)
             * 1000000.0 + 0.5) / 1000000.0 AS bearing_deg,
           CASE WHEN dt_s > 0 THEN
             floor(dist_m / dt_s * 10000.0 + 0.5) / 10000.0
           END AS speed_mps
         FROM dists ORDER BY event_id""",

    "q_geo_radius_join" ->
      s"""WITH $ptsCte, $stCte,
         pairs AS (
           SELECT st_id, user_id,
             ${dmSql("st_lat", "st_lon", "lat", "lon")} AS dm
           FROM pts, st)
         SELECT st_id, count(*) AS n_pts,
           count(DISTINCT user_id) AS n_users,
           CAST(min(dm) AS DOUBLE) / 10.0 AS min_m
         FROM pairs WHERE dm <= 1500000
         GROUP BY st_id ORDER BY st_id""",

    "q_geo_nearest_station" ->
      s"""WITH $ptsCte, $stCte,
         pairs AS (
           SELECT event_id,
             ${dmSql("st_lat", "st_lon", "lat", "lon")} * 32 + st_id AS key
           FROM pts, st),
         assigned AS (
           SELECT event_id, min(key) AS k FROM pairs GROUP BY event_id)
         SELECT k % 32 AS st_id, count(*) AS n_pts,
           CAST(sum(k // 32) AS DOUBLE) / 10.0 AS sum_m
         FROM assigned GROUP BY k % 32 ORDER BY st_id""",

    "q_geo_geofence" ->
      s"""WITH $ptsCte, $stCte,
         md AS (
           SELECT event_id, user_id, ts,
             floor(min(${havSql("st_lat", "st_lon", "lat", "lon")})
               * 10.0 + 0.5) / 10.0 AS min_dq
           FROM pts, st GROUP BY event_id, user_id, ts),
         flagged AS (
           SELECT event_id, user_id, epoch_ms(ts) AS time_ms,
             min_dq AS min_m,
             (min_dq <= 100000.0) AS inside,
             LAG(min_dq <= 100000.0) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS pinside
           FROM md)
         SELECT event_id, user_id, time_ms, min_m,
           CASE WHEN inside THEN 'enter' ELSE 'exit' END AS transition
         FROM flagged
         WHERE pinside IS NOT NULL AND inside != pinside
         ORDER BY event_id""",

    "q_geo_destination" ->
      s"""WITH $ptsCte,
         latest AS (
           SELECT user_id, epoch_ms(ts) AS time_ms, lat, lon,
             value % 360.0 AS course,
             500.0 + CAST(event_id % 100 AS DOUBLE) * 25.0 AS dist_m
           FROM pts
           QUALIFY row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) = 1),
         proj AS (
           SELECT *, asin(
               sin(lat * 0.017453292519943295) * cos(dist_m / 6371008.8)
               + cos(lat * 0.017453292519943295) * sin(dist_m / 6371008.8)
                 * cos(course * 0.017453292519943295)) AS phi2
           FROM latest)
         SELECT user_id, time_ms, course, dist_m,
           CAST(CAST(phi2 * 57.29577951308232 AS DECIMAL(18,6)) AS DOUBLE)
             AS dest_lat,
           CAST(CAST(
             (lon * 0.017453292519943295 + atan2(
                sin(course * 0.017453292519943295) * sin(dist_m / 6371008.8)
                  * cos(lat * 0.017453292519943295),
                cos(dist_m / 6371008.8)
                  - sin(lat * 0.017453292519943295) * sin(phi2)))
             * 57.29577951308232 AS DECIMAL(18,6)) AS DOUBLE) AS dest_lon
         FROM proj ORDER BY user_id""",

    "q_geo_zorder" ->
      s"""WITH $ptsCte,
         bins AS (
           SELECT event_id,
             CAST(floor((lat + 90.0) / 180.0 * 65536.0) AS BIGINT) AS bla,
             CAST(floor((lon + 180.0) / 360.0 * 65536.0) AS BIGINT) AS blo
           FROM pts),
         s1 AS (SELECT event_id, bla, blo,
             ((bla | (bla << 8)) & 16711935) AS a,
             ((blo | (blo << 8)) & 16711935) AS o FROM bins),
         s2 AS (SELECT event_id, bla, blo,
             ((a | (a << 4)) & 252645135) AS a,
             ((o | (o << 4)) & 252645135) AS o FROM s1),
         s3 AS (SELECT event_id, bla, blo,
             ((a | (a << 2)) & 858993459) AS a,
             ((o | (o << 2)) & 858993459) AS o FROM s2),
         s4 AS (SELECT event_id, bla, blo,
             ((a | (a << 1)) & 1431655765) AS a,
             ((o | (o << 1)) & 1431655765) AS o FROM s3)
         SELECT event_id, bla AS lat_bin, blo AS lon_bin,
           (a | (o << 1)) AS morton
         FROM s4 ORDER BY event_id""",

    "q_geo_grid_hotspots" ->
      s"""WITH $ptsCte,
         cells AS (
           SELECT CAST(floor(lat) AS BIGINT) AS cla,
             CAST(floor(lon) AS BIGINT) AS clo,
             count(*) AS n
           FROM pts GROUP BY 1, 2),
         offs AS (
           SELECT a.dx, b.dy
           FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                (SELECT unnest([-1, 0, 1]) AS dy) b),
         nbhd AS (
           SELECT cla + dx AS cla, clo + dy AS clo,
             CAST(sum(n) AS BIGINT) AS nbhd_n,
             count(*) AS nbhd_cells
           FROM cells, offs
           GROUP BY 1, 2)
         SELECT c.cla AS lat_cell, c.clo AS lon_cell, c.n,
           b.nbhd_n, b.nbhd_cells,
           round(c.n * b.nbhd_cells / b.nbhd_n, 4) AS density_ratio
         FROM cells c JOIN nbhd b
           ON c.cla = b.cla AND c.clo = b.clo
         ORDER BY density_ratio DESC, lat_cell, lon_cell
         LIMIT 10""",

    "q_geo_track_summary" ->
      s"""WITH $ptsCte,
         g AS (
           SELECT user_id AS entity, count(*) AS n_points,
             min(lat) AS lat_min, max(lat) AS lat_max,
             min(lon) AS lon_min, max(lon) AS lon_max,
             CAST(sum(CAST(lat AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS slat,
             CAST(sum(CAST(lon AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS slon
           FROM pts GROUP BY 1)
         SELECT entity, n_points, lat_min, lat_max, lon_min, lon_max,
           round(slat::DOUBLE / n_points, 4) AS centroid_lat,
           round(slon::DOUBLE / n_points, 4) AS centroid_lon,
           round((lat_max - lat_min) * (lon_max - lon_min), 4)
             AS bbox_area
         FROM g
         ORDER BY bbox_area DESC, entity LIMIT 20"""
  )
}
