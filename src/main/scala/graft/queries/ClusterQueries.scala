package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Clustering

/** Semantic-clustering operators over `embeddings` (curation
  * north-star family): deterministic Lloyd k-means assignment and
  * the cluster-balanced diversity sample built on it. Both
  * oracle-exact — seeding, distances, and centroid means follow the
  * engine-portable recipes documented on
  * [[graft.operators.Clustering]].
  *
  * The oracle unrolls the two Lloyd iterations as CTEs (seeds → a1 →
  * c1 → a2 → c2 → a3); dim 64 is hardcoded in the update CTEs'
  * `range(1, 65)` like the ANN oracles hardcode their parameters —
  * change the Scala defaults and this SQL must change with them.
  */
object ClusterQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Shared kmeans CTE prefix: `v` (double vectors), seeds `s0`,
    * two assign/update rounds, final assignment `a3` (filter rn=1).
    */
  private val kmeansCtes: String = {
    def assignCte(name: String, cents: String) =
      s"""$name AS (
           SELECT id, cid, dist, vec,
             row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
           FROM (
             SELECT v.id, ct.cid, v.vec,
               list_sum([(v.vec[i] - ct.c[i]) * (v.vec[i] - ct.c[i])
                         for i in range(1, len(v.vec) + 1)]) AS dist
             FROM v CROSS JOIN $cents ct))"""
    def updateCtes(u: String, c: String, a: String) =
      s"""$u AS (
           SELECT cid, p,
             CAST(sum(q) AS DOUBLE) /
               (1000000.0 * CAST(count(*) AS DOUBLE)) AS m
           FROM (
             SELECT cid, t.i AS p,
               CAST(floor(vec[t.i] * 1000000.0 + 0.5) AS BIGINT) AS q
             FROM $a, range(1, 65) AS t(i)
             WHERE rn = 1)
           GROUP BY cid, p),
         $c AS (SELECT cid, list(m ORDER BY p) AS c FROM $u GROUP BY cid)"""
    s"""WITH v AS (
         SELECT vec_id AS id,
           [embedding[i]::DOUBLE
            for i in range(1, len(embedding) + 1)] AS vec
         FROM embeddings),
       s0 AS (
         SELECT CAST(row_number() OVER
             (ORDER BY md5(CAST(id AS VARCHAR)), id) AS INTEGER) AS cid,
           vec AS c
         FROM v
         QUALIFY row_number() OVER
           (ORDER BY md5(CAST(id AS VARCHAR)), id) <= 10),
       ${assignCte("a1", "s0")},
       ${updateCtes("u1", "c1", "a1")},
       ${assignCte("a2", "c1")},
       ${updateCtes("u2", "c2", "a2")},
       ${assignCte("a3", "c2")}"""
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k-means cluster assignment (k=10, 2 Lloyd rounds): which
    // semantic bucket each embedding lands in, and how tight.
    "q_cluster_kmeans" -> { (s, dir) =>
      Clustering.kmeansAssign(emb(s, dir), "vec_id", "embedding",
          k = 10, iters = 2)
        .select(col("id").as("vec_id"), col("cid").as("cluster"),
          round(col("dist"), 6).as("dist"))
        .orderBy(col("vec_id"))
    },

    // SemDeDup: k-means blocking + within-cluster cosine prune.
    // Pairwise cosine runs only inside clusters (Σ|cluster|², the
    // SemDeDup scale contract); verdict per row, earlier id wins.
    "q_semdedup_prune" -> { (s, dir) =>
      Clustering.semDedupPrune(emb(s, dir), "vec_id", "embedding",
          k = 10, iters = 2, threshold = 0.35)
        .select(col("id").as("vec_id"), col("cid").as("cluster"),
          col("kept"))
        .orderBy(col("vec_id"))
    },

    // Cluster-balanced diversity sample: 5 hash-first rows per final
    // cluster — the "cover the semantic space" training-mix pick.
    "q_sample_cluster" -> { (s, dir) =>
      Clustering.clusterSample(emb(s, dir), "vec_id", "embedding",
          k = 10, iters = 2, perCluster = 5)
        .select(col("id").as("vec_id"), col("cid").as("cluster"),
          col("rank"))
        .orderBy(col("cluster"), col("rank"))
    }
  )

  val oracles: Map[String, String] = Map(

    "q_cluster_kmeans" ->
      s"""$kmeansCtes
         SELECT id AS vec_id, cid AS cluster, round(dist, 6) AS dist
         FROM a3 WHERE rn = 1 ORDER BY vec_id""",

    "q_semdedup_prune" ->
      s"""$kmeansCtes,
         f AS (SELECT id, cid, vec FROM a3 WHERE rn = 1)
         SELECT f.id AS vec_id, f.cid AS cluster,
           NOT EXISTS (
             SELECT 1 FROM f b
             WHERE b.cid = f.cid AND b.id < f.id
               AND (list_sum([f.vec[i] * b.vec[i]
                              for i in range(1, len(f.vec) + 1)]) /
                    sqrt(
                      list_sum([f.vec[i] * f.vec[i]
                                for i in range(1, len(f.vec) + 1)]) *
                      list_sum([b.vec[i] * b.vec[i]
                                for i in range(1, len(b.vec) + 1)])))
                 >= 0.35) AS kept
         FROM f ORDER BY vec_id""",

    "q_sample_cluster" ->
      s"""$kmeansCtes
         SELECT id AS vec_id, cid AS cluster, CAST(rank AS INTEGER) AS rank
         FROM (
           SELECT id, cid,
             row_number() OVER (PARTITION BY cid
               ORDER BY md5(CAST(id AS VARCHAR)), id) AS rank
           FROM a3 WHERE rn = 1)
         WHERE rank <= 5
         ORDER BY cluster, rank"""
  )
}
