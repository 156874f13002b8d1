package graft

import org.apache.spark.sql.functions._
import graft.operators.TrackPipeline

/** Algebraic laws of the pipeline operators (SURVEY.md §5.3):
  * latest-per-key == sort-desc-then-first, retention idempotence,
  * upsert/dedup absorption — checked over seeded random inputs
  * (deterministic across runs).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private type Row4 = (Long, java.sql.Timestamp, Long, Double)

  /** Seeded random batches; ids unique within a batch. */
  private def genRows(seed: Long, n: Int = 40): List[Row4] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      (1L + rng.nextInt(5),
        new java.sql.Timestamp(1700000000000L + rng.nextInt(100000)),
        i * 1000L + seed, // unique tie-break id
        rng.nextDouble() * 200 - 100)
    }.toList
  }

  private val trials = 1L to 15L

  test("latestPerKey == sort-desc-then-first per key") {
    trials.foreach { seed =>
      val rows = genRows(seed)
      val got = TrackPipeline
        .latestPerKey(rows.toDF("key", "ts", "id", "v"), "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.maxBy(r => (r._2.getTime, r._3))._3
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("retention filter is idempotent") {
    trials.foreach { seed =>
      val df = genRows(seed).toDF("key", "ts", "id", "v")
      val cutoff = lit("2023-11-14 22:13:30").cast("timestamp")
      val once = TrackPipeline.retained(df, "ts", cutoff)
      val twice = TrackPipeline.retained(once, "ts", cutoff)
      assert(once.count() == twice.count(), s"seed=$seed")
    }
  }

  test("upsert(snapshot, fresh) == latestPerKey(snapshot ∪ fresh)") {
    trials.foreach { seed =>
      val snap = genRows(seed).toDF("key", "ts", "id", "v")
      val fresh = genRows(seed + 1000).toDF("key", "ts", "id", "v")
      val viaUpsert = TrackPipeline.upsert(snap, fresh, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val direct = TrackPipeline
        .latestPerKey(snap.unionByName(fresh), "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      assert(viaUpsert == direct, s"seed=$seed")
    }
  }

  test("last-write-wins absorbs duplicate delivery") {
    trials.foreach { seed =>
      val df = genRows(seed).toDF("key", "ts", "id", "v")
      val doubled = df.unionByName(df)
      val a = TrackPipeline.latestPerKey(doubled, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val b = TrackPipeline.latestPerKey(df, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      assert(a == b, s"seed=$seed")
    }
  }
}
