package graft.operators

import graft.Tables
import graft.Par.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity / ANN operators over the embeddings table
  * (64-dim L2-unit-normalized ⟹ cosine ≡ dot product; SURVEY.md §1.3,
  * §2.9).
  *
  * Scale design: q_sim_cosine_topk is the exact brute-force baseline
  * (O(n²) pairs — the oracle-checkable ground truth). q_ann_ivf is the
  * scale path: an IVF-style probe that dots the query against K coarse
  * centroids, picks the best partition, and searches only there —
  * at 100 TB the centroids come from offline k-means and the partition is
  * a bucketed/partitioned table, so a query touches 1/K of the data. Here
  * the label column stands in for the trained quantizer (deterministic,
  * oracle-checkable); the plumbing — centroid build, probe, partition-local
  * top-k — is the real thing.
  *
  * All dot products accumulate in DOUBLE with sequential fold order
  * (aggregate() in Spark, list_inner_product on DOUBLE[] in DuckDB) and are
  * rounded via Par.r6 before any ranking cut, with id tie-breaks, so the
  * top-k frontier is deterministic cross-engine.
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  /** Raw float arrays — graft_dot (custom codegen Expression, see
    * graft.functions.DotProductFloat) folds them in double directly,
    * with the same sequential accumulation order as the zip_with/aggregate
    * pipeline it replaced (oracle parity unchanged, ~3× faster). */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))

  private val dotExpr = "graft_dot(x, y)"

  /** Top-10 most similar pairs, exact brute force (a < b halves the work;
    * one side broadcast — no shuffle of the quadratic intermediate). */
  private val cosineTopk: Q = (s, d) => {
    val e = vecs(s, d)
    val a = e.select(col("vec_id").as("va"), col("v").as("x"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("y"))
    a.join(broadcast(b), col("va") < col("vb"))
      .withColumn("sim_r", r6(expr(dotExpr)))
      .select("va", "vb", "sim_r")
      .orderBy(col("sim_r").desc, col("va"), col("vb"))
      .limit(10)
  }

  /** Embedding-cosine near-duplicate pairs (threshold form of the above —
    * the near-dup operator for multimodal/embedding columns). */
  private val dedupEmbed: Q = (s, d) => {
    val e = vecs(s, d)
    val a = e.select(col("vec_id").as("va"), col("v").as("x"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("y"))
    a.join(broadcast(b), col("va") < col("vb"))
      .withColumn("sim_r", r6(expr(dotExpr)))
      .filter(col("sim_r") >= 0.3)
      .select("va", "vb", "sim_r")
      .orderBy("va", "vb")
  }

  /** (vec_id, label, pos, val) long form — the layout every aggregate
    * below keys on; at scale this is the column-exploded table you'd
    * pre-materialize (or keep as arrays and use codegen'd folds). */
  private def dims(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos"),
        col("col").cast("double").as("val"))

  /** Per-label centroid, then the member nearest to its centroid —
    * the medoid-style representative per class. */
  private val knnLabel: Q = (s, d) => {
    val dm = dims(s, d)
    val cent = dm.groupBy("label", "pos").agg(avg("val").as("c"))
    val sims = dm.join(cent, Seq("label", "pos"))
      .groupBy("label", "vec_id")
      .agg(sum(col("val") * col("c")).as("sim"))
      .withColumn("sim_r", r6(col("sim")))
    val w = Window.partitionBy("label")
      .orderBy(col("sim_r").desc, col("vec_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("label", "vec_id", "sim_r")
      .orderBy("label")
  }

  /** IVF-style ANN: queries = vec_id < 5; probe = argmax centroid dot;
    * then exact top-3 within the probed partition only. */
  private val annIvf: Q = (s, d) => {
    val dm = dims(s, d)
    val cent = dm.groupBy("label", "pos").agg(avg("val").as("c"))
    val qd = dm.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("pos"), col("val").as("qval"))
    val qc = qd.join(cent.withColumnRenamed("label", "clabel"), Seq("pos"))
      .groupBy("qid", "clabel")
      .agg(r6(sum(col("qval") * col("c"))).as("csim"))
    val wq = Window.partitionBy("qid").orderBy(col("csim").desc, col("clabel"))
    val probe = qc.withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1)
      .select(col("qid"), col("clabel").as("label"))
    val cand = probe.join(dm, Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .join(qd, Seq("qid", "pos"))
      .groupBy("qid", "vec_id")
      .agg(r6(sum(col("val") * col("qval"))).as("sim_r"))
    val wr = Window.partitionBy("qid").orderBy(col("sim_r").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("vec_id").as("nid"), col("sim_r"))
      .orderBy("qid", "rank")
  }

  val queries: Map[String, Q] = Map(
    "q_sim_cosine_topk" -> cosineTopk,
    "q_dedup_embed" -> dedupEmbed,
    "q_sim_knn_label" -> knnLabel,
    "q_ann_ivf" -> annIvf)

  val oracle: Map[String, String] = Map(
    "q_sim_cosine_topk" ->
      """SELECT va, vb, sim_r FROM (
           SELECT a.vec_id AS va, b.vec_id AS vb,
                  floor((list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))
                        * 1000000 + 0.5) / 1000000.0 AS sim_r
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
         ORDER BY sim_r DESC, va, vb LIMIT 10""",
    "q_dedup_embed" ->
      """SELECT va, vb, sim_r FROM (
           SELECT a.vec_id AS va, b.vec_id AS vb,
                  floor((list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))
                        * 1000000 + 0.5) / 1000000.0 AS sim_r
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
         WHERE sim_r >= 0.3 ORDER BY va, vb""",
    "q_sim_knn_label" ->
      """WITH dm AS (
           SELECT vec_id, label,
                  CAST(unnest(generate_series(1, len(embedding))) - 1
                       AS INTEGER) AS pos,
                  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS val
           FROM embeddings),
         cent AS (SELECT label, pos, avg(val) AS c
                  FROM dm GROUP BY label, pos),
         sims AS (
           SELECT dm.label, dm.vec_id,
                  floor((sum(dm.val * cent.c)) * 1000000 + 0.5) / 1000000.0
                    AS sim_r
           FROM dm JOIN cent ON dm.label = cent.label AND dm.pos = cent.pos
           GROUP BY dm.label, dm.vec_id)
         SELECT label, vec_id, sim_r FROM (
           SELECT label, vec_id, sim_r,
                  row_number() OVER (PARTITION BY label
                    ORDER BY sim_r DESC, vec_id) AS rn
           FROM sims) t
         WHERE rn = 1 ORDER BY label""",
    "q_ann_ivf" ->
      """WITH dm AS (
           SELECT vec_id, label,
                  CAST(unnest(generate_series(1, len(embedding))) - 1
                       AS INTEGER) AS pos,
                  CAST(unnest(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS val
           FROM embeddings),
         cent AS (SELECT label, pos, avg(val) AS c
                  FROM dm GROUP BY label, pos),
         qd AS (SELECT vec_id AS qid, pos, val FROM dm WHERE vec_id < 5),
         qc AS (
           SELECT qd.qid, cent.label AS clabel,
                  floor((sum(qd.val * cent.c)) * 1000000 + 0.5) / 1000000.0
                    AS csim
           FROM qd JOIN cent ON qd.pos = cent.pos
           GROUP BY qd.qid, cent.label),
         probe AS (
           SELECT qid, clabel AS label FROM (
             SELECT qid, clabel, row_number() OVER (PARTITION BY qid
               ORDER BY csim DESC, clabel) AS rn
             FROM qc) t WHERE rn = 1),
         cand AS (
           SELECT probe.qid, dm.vec_id,
                  floor((sum(dm.val * qd.val)) * 1000000 + 0.5) / 1000000.0
                    AS sim_r
           FROM probe
           JOIN dm ON dm.label = probe.label AND dm.vec_id != probe.qid
           JOIN qd ON qd.qid = probe.qid AND qd.pos = dm.pos
           GROUP BY probe.qid, dm.vec_id)
         SELECT qid, CAST(rnk AS BIGINT) AS rank, vec_id AS nid, sim_r
         FROM (SELECT qid, vec_id, sim_r,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY sim_r DESC, vec_id) AS rnk
               FROM cand) t
         WHERE rnk <= 3 ORDER BY qid, rank""")
}
