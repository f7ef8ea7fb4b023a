package graft.operators

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table —
  * the LLM-pipeline similarity-search surface.
  *
  * Two paths:
  *  - `sim_ann_bruteforce`: exact top-k by cosine. Query side is tiny →
  *    Spark broadcasts it; the corpus side streams — at 100 TB this is a
  *    single scan + per-partition top-k (TakeOrdered-shaped), no shuffle
  *    of the corpus.
  *  - `sim_ann_bucketed`: sign-bit LSH bucket (axis-aligned hyperplanes)
  *    as the IVF-style coarse quantizer — candidates only within the
  *    query's bucket, turning the scan into a keyed equi-join.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  val queries: Map[String, Q] = Map(
    // Exact brute-force top-k cosine for the first 20 vectors as queries.
    // Scale shape: the ~20-row QUERY side is broadcast and the corpus
    // streams (never the reverse — broadcasting the corpus OOMs every
    // executor at 100 TB). Top-k is two-phase: per-scan-partition top-k
    // first (keyed on (q_id, partition), so parallelism stays at the scan
    // width), then a final merge ranking over ≤ partitions×K survivors —
    // no stage funnels the full corpus×queries stream through |queries|
    // tasks.
    "sim_ann_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"))
      val cand = e.select(col("vec_id").as("n_id"), col("v").as("n_v"))
      val partial = Window.partitionBy("q_id", "pt")
        .orderBy(col("sim").desc, col("n_id").asc)
      val fin = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id").asc)
      broadcast(q).join(cand, col("q_id") =!= col("n_id"))
        .withColumn("sim", Vectors.cosineRounded(col("q_v"), col("n_v")))
        .withColumn("pt", spark_partition_id())
        .withColumn("rk1", row_number().over(partial))
        .filter(col("rk1") <= K)
        .withColumn("rk", row_number().over(fin))
        .filter(col("rk") <= K)
        .select("q_id", "n_id", "sim", "rk")
    }),

    // IVF-style ANN: deterministic coarse quantizer (first 8 vectors as
    // centroids ≙ a trained codebook), every vector assigned to its
    // nearest cell, queries probe their 2 nearest cells (nprobe=2) and
    // rank candidates by cosine. At 100 TB: assignment is a broadcast
    // join against the tiny codebook + one keyed shuffle on cell; the
    // probe never scans outside its cells.
    "sim_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("c_v"))
      def d2 = round(aggregate(
        zip_with(col("v"), col("c_v"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x), 6)
      val byDist = Window.partitionBy("vec_id")
        .orderBy(col("d2").asc, col("c_id").asc)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rk", row_number().over(byDist))
        .filter(col("rk") === 1)
        .select(col("vec_id").as("n_id"), col("v").as("n_v"),
          col("c_id").as("cell"))
      val probed = e.filter(col("vec_id") < 30)
        .crossJoin(broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rk", row_number().over(byDist))
        .filter(col("rk") <= 2)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"),
          col("c_id").as("cell"))
      val bySim = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id").asc)
      probed.join(assigned, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", Vectors.cosineRounded(col("q_v"), col("n_v")))
        .withColumn("rk", row_number().over(bySim))
        .filter(col("rk") <= 3)
        .select("q_id", "n_id", "sim", "rk")
    }),

    // LSH-bucketed ANN: 8 sign bits of the leading components as the
    // coarse bucket; top-3 within bucket.
    "sim_ann_bucketed" -> ((s, d) => {
      val e = emb(s, d).withColumn("bucket", Vectors.signBucket(col("v"), 8))
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("bucket"))
      val cand = e.select(col("vec_id").as("n_id"), col("v").as("n_v"),
        col("bucket"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id").asc)
      q.join(cand, Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", Vectors.cosineRounded(col("q_v"), col("n_v")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("bucket", "q_id", "n_id", "sim", "rk")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
         |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY sim DESC, n_id ASC) AS rk FROM s)
         |SELECT q_id, n_id, sim, rk FROM r WHERE rk <= $K""".stripMargin,
    "sim_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cents AS (SELECT vec_id AS c_id, v AS c_v FROM e WHERE vec_id < 8),
        |dist AS (
        |  SELECT e.vec_id, e.v, c.c_id,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> (e.v[i] - c.c_v[i]) * (e.v[i] - c.c_v[i]))), 6) AS d2
        |  FROM e, cents c),
        |assigned AS (
        |  SELECT vec_id AS n_id, v AS n_v, c_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY d2 ASC, c_id ASC) AS rk FROM dist) t
        |  WHERE rk = 1),
        |probed AS (
        |  SELECT vec_id AS q_id, v AS q_v, c_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY d2 ASC, c_id ASC) AS rk
        |    FROM dist WHERE vec_id < 30) t
        |  WHERE rk <= 2),
        |scored AS (
        |  SELECT p.q_id, a.n_id,
        |    round(list_cosine_similarity(p.q_v, a.n_v), 4) AS sim
        |  FROM probed p JOIN assigned a ON p.cell = a.cell
        |  WHERE p.q_id <> a.n_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY sim DESC, n_id ASC) AS rk FROM scored)
        |SELECT q_id, n_id, sim, rk FROM r WHERE rk <= 3""".stripMargin,
    "sim_ann_bucketed" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    list_sum(list_transform(generate_series(0, 7), i ->
        |      CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS bucket
        |  FROM embeddings),
        |s AS (
        |  SELECT q.bucket, q.vec_id AS q_id, c.vec_id AS n_id,
        |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 50),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY sim DESC, n_id ASC) AS rk FROM s)
        |SELECT bucket, q_id, n_id, sim, rk FROM r WHERE rk <= 3""".stripMargin
  )
}
