package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Gates for the deterministic k-means family. The embeddings corpus
  * is isotropic-random (label structure is NOT geometrically
  * recoverable — same-label mean cosine ≈ 0.0016 vs 0.0003 across
  * labels), so there is no purity gate; what k-means must guarantee
  * regardless of data is Lloyd's monotone objective descent,
  * bit-determinism, and the map-side assignment plan.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sf("0.01"), "embeddings")

  private def meanDist(iters: Int): Double =
    Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 10,
        iters = iters)
      .agg(avg($"dist")).as[Double].head()

  test("Lloyd iterations monotonically decrease the objective") {
    val d0 = meanDist(0) // assignment to raw seeds
    val d1 = meanDist(1)
    val d2 = meanDist(2)
    assert(d1 <= d0 + 1e-12 && d2 <= d1 + 1e-12,
      s"objective must not increase: iters0=$d0 iters1=$d1 iters2=$d2")
    assert(d1 < d0, s"first update step should improve on raw seeds ($d0 -> $d1)")
  }

  test("assignment is bit-deterministic across invocations") {
    def run() = Clustering.kmeansAssign(emb, "vec_id", "embedding",
        k = 10, iters = 2)
      .select($"id", $"cid", $"dist").as[(Long, Int, Double)]
      .collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("every row is assigned exactly once, to a live cluster") {
    val a = Clustering.kmeansAssign(emb, "vec_id", "embedding",
      k = 10, iters = 2)
    assert(a.count() == emb.count())
    assert(a.select($"id").distinct().count() == emb.count())
    val k = a.select($"cid").distinct().count()
    assert(k >= 2 && k <= 10, s"implausible live-cluster count $k")
  }

  test("clusterSample: at most perCluster rows, contiguous ranks from 1") {
    val s = Clustering.clusterSample(emb, "vec_id", "embedding",
      k = 10, iters = 2, perCluster = 5)
    val byCluster = s.groupBy($"cid")
      .agg(count(lit(1)).as("n"), min($"rank").as("lo"),
        max($"rank").as("hi"))
      .as[(Int, Long, Int, Int)].collect()
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (cid, n, lo, hi) =>
      assert(n <= 5 && lo == 1 && hi == n,
        s"cluster $cid: n=$n ranks [$lo,$hi]")
    }
  }

  test("assignment plan: centroids broadcast, no sort-merge join") {
    val plan = Clustering.kmeansAssign(emb, "vec_id", "embedding",
        k = 10, iters = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"row stream must never shuffle for a join:\n$plan")
  }
}
