package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Geodesic functions + the grid-blocked radius join
  * (graft.functions.GeoFunctions, graft.queries.GeoQueries).
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head.getDouble(0)

  test("haversine: 1 degree of latitude is ~111.195 km") {
    val d = one(haversineM(lit(40.0), lit(-100.0), lit(41.0), lit(-100.0)))
    assert(math.abs(d - 111194.93) < 50.0, s"got $d")
  }

  test("haversine: symmetric and zero at identity") {
    val ab = one(haversineM(lit(40.0), lit(-100.0), lit(52.5), lit(-63.25)))
    val ba = one(haversineM(lit(52.5), lit(-63.25), lit(40.0), lit(-100.0)))
    assert(ab == ba)
    assert(one(haversineM(lit(40.0), lit(-100.0), lit(40.0), lit(-100.0))) == 0.0)
  }

  test("bearing: north is 0, east is ~90 (cos-corrected)") {
    val n = one(bearingQ(lit(40.0), lit(-100.0), lit(41.0), lit(-100.0)))
    val e = one(bearingQ(lit(40.0), lit(-100.0), lit(40.0), lit(-99.0)))
    assert(math.abs(n - 0.0) < 0.01, s"north bearing $n")
    assert(math.abs(e - 89.68) < 0.1, s"east bearing $e")
  }

  test("destination round-trip: projected point is distM away") {
    val (dlat, dlon) = destination(lit(45.0), lit(-90.0), lit(60.0), lit(10000.0))
    val row = Seq(1).toDF("x")
      .select(dlat.as("la"), dlon.as("lo")).head
    val back = one(haversineM(lit(45.0), lit(-90.0),
      lit(row.getDouble(0)), lit(row.getDouble(1))))
    assert(math.abs(back - 10000.0) < 1.0, s"round-trip distance $back")
  }

  test("morton key matches a bit-by-bit Scala interleave") {
    def interleave(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
      }
    val pts = Seq((40.0, -100.0), (59.99, -60.01), (30.0, -120.0),
      (45.123, -87.654))
    val got = pts.toDF("lat", "lon")
      .select(latBin16(col("lat")).as("a"), lonBin16(col("lon")).as("b"),
        mortonKey(col("lat"), col("lon")).as("m"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == interleave(r.getLong(0), r.getLong(1)),
        s"morton mismatch for bins ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("radius join blocking is lossless vs the naive cross join") {
    val blocked = graft.queries.GeoQueries
      .defs("q_geo_radius_join")(spark, sf("0.001")).collect()

    // naive: no cells, straight cross product + filter
    val ev = Tables(spark, sf("0.001"), "events")
      .withColumn("lat",
        lit(30.0) + (col("event_id") * 37 % 3000).cast("double") / 100.0)
      .withColumn("lon", lit(-120.0) +
        ((col("event_id") * 73 + col("user_id") * 131) % 6000)
          .cast("double") / 100.0)
    val st = Tables(spark, sf("0.001"), "nation").select(
      col("n_nationkey").cast("long").as("st_id"),
      (lit(30.0) + (col("n_nationkey") * 613 % 3000).cast("double") / 100.0)
        .as("st_lat"),
      (lit(-120.0) + (col("n_nationkey") * 937 % 6000).cast("double") / 100.0)
        .as("st_lon"))
    val naive = ev.crossJoin(st)
      .withColumn("dm",
        distDm(col("st_lat"), col("st_lon"), col("lat"), col("lon")))
      .filter(col("dm") <= 1500000L)
      .groupBy(col("st_id"))
      .agg(count(lit(1)).as("n_pts"),
        count_distinct(col("user_id")).as("n_users"),
        (min(col("dm")) / 10.0).as("min_m"))
      .orderBy(col("st_id"))
      .collect()

    assert(blocked.map(_.toString).toSeq == naive.map(_.toString).toSeq,
      "blocked radius join disagrees with the naive cross join")
    assert(blocked.nonEmpty, "radius join found no pairs at sf0.001")
  }

  test("radius join plan: broadcast hash join on the cell key, no cartesian") {
    withoutAqe {
      val plan = graft.queries.GeoQueries
        .defs("q_geo_radius_join")(spark, sf("0.001"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"station side should broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("SortMergeJoin"),
        s"radius join must not cross or shuffle the fact side:\n$plan")
    }
  }

  test("measured: radius-join shuffle tracks the dims, not the facts") {
    // the fact side never shuffles pre-rollup: what crosses the wire
    // is the count_distinct's (station, user) partials plus the
    // 25-row rollup — bounded by the DIM cardinalities (stations ×
    // users), a small fraction of the fact count at every scale (in
    // this testdata the user dim itself grows with SF, so the
    // absolute number grows; the fact-relative budget is the
    // invariant)
    def at(d: String): (Long, Long) = {
      val facts = Tables(spark, sf(d), "events").count()
      val rows = shuffledRecords {
        graft.queries.GeoQueries.defs("q_geo_radius_join")(spark, sf(d))
          .collect()
      }
      (rows, facts)
    }
    val (s1, f1) = at("0.001")
    val (s2, f2) = at("0.01")
    info(s"radius join shuffle: sf0.001=$s1/$f1 facts, " +
      s"sf0.01=$s2/$f2 facts")
    assert(s1 * 5 < f1, s"sf0.001 shuffle not dim-bounded: $s1 of $f1")
    assert(s2 * 5 < f2, s"sf0.01 shuffle not dim-bounded: $s2 of $f2")
  }

  test("nearest-station assignment agrees with the window formulation") {
    val agg = graft.queries.GeoQueries
      .defs("q_geo_nearest_station")(spark, sf("0.001")).collect()

    val ev = Tables(spark, sf("0.001"), "events")
      .withColumn("lat",
        lit(30.0) + (col("event_id") * 37 % 3000).cast("double") / 100.0)
      .withColumn("lon", lit(-120.0) +
        ((col("event_id") * 73 + col("user_id") * 131) % 6000)
          .cast("double") / 100.0)
    val st = Tables(spark, sf("0.001"), "nation").select(
      col("n_nationkey").cast("long").as("st_id"),
      (lit(30.0) + (col("n_nationkey") * 613 % 3000).cast("double") / 100.0)
        .as("st_lat"),
      (lit(-120.0) + (col("n_nationkey") * 937 % 6000).cast("double") / 100.0)
        .as("st_lon"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("dm"), col("st_id"))
    val windowed = ev.crossJoin(st)
      .withColumn("dm",
        distDm(col("st_lat"), col("st_lon"), col("lat"), col("lon")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("st_id"))
      .agg(count(lit(1)).as("n_pts"),
        (sum(col("dm")).cast("double") / 10.0).as("sum_m"))
      .orderBy(col("st_id"))
      .collect()
    assert(agg.map(_.toString).toSeq == windowed.map(_.toString).toSeq)
  }

  test("q_geo_grid_hotspots: kernel bounds and ratio ordering") {
    val rows = SparkEntry.queries("q_geo_grid_hotspots")(spark, sf())
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val cells = r.getAs[Long]("nbhd_cells")
      assert(cells >= 1 && cells <= 9, s"3×3 kernel bound: $r")
      assert(r.getAs[Long]("nbhd_n") >= r.getAs[Long]("n"),
        s"neighborhood must include the cell itself: $r")
      assert(r.getAs[Double]("density_ratio") > 0)
    }
    val ratios = rows.map(_.getAs[Double]("density_ratio"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
  }

  test("q_geo_track_summary: centroid inside bbox, spans non-negative") {
    val rows = SparkEntry.queries("q_geo_track_summary")(spark, sf())
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val latMin = r.getAs[Double]("lat_min")
      val latMax = r.getAs[Double]("lat_max")
      val lonMin = r.getAs[Double]("lon_min")
      val lonMax = r.getAs[Double]("lon_max")
      assert(latMin <= latMax && lonMin <= lonMax)
      val cLat = r.getAs[Double]("centroid_lat")
      val cLon = r.getAs[Double]("centroid_lon")
      assert(cLat >= latMin - 1e-4 && cLat <= latMax + 1e-4,
        s"centroid lat outside bbox: $r")
      assert(cLon >= lonMin - 1e-4 && cLon <= lonMax + 1e-4,
        s"centroid lon outside bbox: $r")
      assert(r.getAs[Double]("bbox_area") >= 0)
    }
    // non-degeneracy: the per-entity identities above hold for ANY
    // aggregation — tracks genuinely move, so a coordinate-formula
    // regression that freezes every entity at a point must fail
    // (exact values are pinned by the DuckDB oracle)
    assert(rows.exists(_.getAs[Double]("bbox_area") > 0),
      "every track degenerate to a point — coordinates inert")
  }
}
