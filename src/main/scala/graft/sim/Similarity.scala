package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (BASELINE north-star
  * "similarity search"): brute-force cosine top-k as the correctness
  * baseline, and an IVF-style two-stage path as the scale story.
  *
  * Scale design: brute force is O(|Q|·N) — fine when the query set is small
  * and broadcast (as here: the N×|Q| join broadcasts the queries, so the
  * corpus streams through map-side with no shuffle; the only exchange is the
  * per-query top-k). The IVF variant assigns every vector to its nearest
  * coarse centroid (here: deterministic anchor vectors; at scale, k-means
  * centroids broadcast the same way) and searches only the query's cell —
  * the standard nprobe=1 trade of recall for a ~|cells|× cost cut. Both
  * paths share one bit-reproducible cosine: a left-fold dot/norm formula
  * that the DuckDB oracle mirrors operation-for-operation.
  */
object Similarity {

  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
  }

  /** Codegen'd native expression (graft.functions.CosineSim); bit-identical
    * to the left-fold HOF formula and the DuckDB oracle's list_sum. */
  private val cosExpr = "round(cosine_sim(va, vb), 6)"

  private val duckCos =
    "round(list_sum(list_transform(range(1, len(va) + 1), i -> va[i] * vb[i])) / " +
      "sqrt(list_sum(list_transform(va, x -> x * x)) * " +
      "list_sum(list_transform(vb, x -> x * x))), 6)"

  /** Nearest-anchor assignment (anchors = vec_id 0,1,2 as stand-in coarse
    * centroids; ties break to the lowest anchor id). */
  private def assignments(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs(s, d)
    val anchors = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("anchor_id"), col("v").as("vb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos6").desc, col("anchor_id").asc)
    e.select(col("vec_id"), col("v").as("va"))
      .crossJoin(broadcast(anchors))
      .withColumn("cos6", expr(cosExpr))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("anchor_id"), col("cos6"))
  }

  private val duckAssign =
    """assign AS (
      |  SELECT vec_id, anchor_id, cos6 FROM (
      |    SELECT q.vec_id, a.anchor_id, COS_FORMULA AS cos6,
      |           row_number() OVER (PARTITION BY q.vec_id
      |                              ORDER BY COS_FORMULA DESC, a.anchor_id ASC) AS rn
      |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va FROM embeddings) q,
      |         (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS vb
      |          FROM embeddings WHERE vec_id < 3) a)
      |  WHERE rn = 1)""".stripMargin
      .replace("COS_FORMULA", duckCos)

  val defs: Seq[QueryDef] = Seq(

    /** Brute-force cosine top-5 for queries vec_id < 8 (self excluded). */
    QueryDef(
      "sim_topk_brute",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("v").as("va"))
        val c = e.select(col("vec_id").as("cand_id"), col("v").as("vb"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos6").desc, col("cand_id").asc)
        c.crossJoin(broadcast(q))
          .filter(col("cand_id") =!= col("q_id"))
          .withColumn("cos6", expr(cosExpr))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("cand_id"), col("cos6"), col("rank"))
          .orderBy("q_id", "rank")
      },
      Some(s"""SELECT q_id, cand_id, cos6, CAST(rank AS INTEGER) AS rank FROM (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, $duckCos AS cos6,
              |         row_number() OVER (PARTITION BY q.vec_id
              |                            ORDER BY $duckCos DESC, c.vec_id ASC) AS rank
              |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
              |        FROM embeddings WHERE vec_id < 8) q,
              |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
              |  WHERE c.vec_id <> q.vec_id)
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    /** Top-k via the bounded typed Aggregator (graft.functions.TopK): same
      * result as the window formulation (same oracle), but partial buffers
      * cap the shuffle at O(queries × k) — the formulation that survives
      * millions of candidates per query. */
    QueryDef(
      "sim_topk_agg",
      (s, d) => {
        import s.implicits._
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("v").as("va"))
        val c = e.select(col("vec_id").as("cand_id"), col("v").as("vb"))
        val scored = c.crossJoin(broadcast(q))
          .filter(col("cand_id") =!= col("q_id"))
          .withColumn("cos6", expr(cosExpr))
          .select(col("q_id"), col("cand_id"), col("cos6"))
          .as[(Long, Long, Double)]
        scored.groupByKey(_._1)
          .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
          .agg(graft.functions.TopK.topK(5).toColumn)
          .flatMap { case (qid, entries) =>
            entries.zipWithIndex.map { case (en, i) => (qid, en.id, en.score, i + 1) }
          }
          .toDF("q_id", "cand_id", "cos6", "rank")
          .withColumn("rank", col("rank").cast("int"))
          .orderBy("q_id", "rank")
      },
      Some(s"""SELECT q_id, cand_id, cos6, CAST(rank AS INTEGER) AS rank FROM (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, $duckCos AS cos6,
              |         row_number() OVER (PARTITION BY q.vec_id
              |                            ORDER BY $duckCos DESC, c.vec_id ASC) AS rank
              |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
              |        FROM embeddings WHERE vec_id < 8) q,
              |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
              |  WHERE c.vec_id <> q.vec_id)
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    /** IVF cell assignment for every vector. */
    QueryDef(
      "sim_ivf_assign",
      (s, d) => assignments(s, d).orderBy("vec_id"),
      Some(s"""WITH $duckAssign
              |SELECT vec_id, anchor_id, cos6 FROM assign ORDER BY vec_id""".stripMargin)),

    /** ANN search, IVF nprobe=1: candidates limited to the query's cell. */
    QueryDef(
      "sim_ann_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = vecs(s, d)
        val asg = assignments(s, d).select(col("vec_id"), col("anchor_id"))
        val ev = e.join(asg, "vec_id")
        val q = ev.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("va"), col("anchor_id").as("cell"))
        val c = ev.select(col("vec_id").as("cand_id"), col("v").as("vb"), col("anchor_id").as("cell2"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos6").desc, col("cand_id").asc)
        c.join(broadcast(q), c("cell2") === q("cell") && c("cand_id") =!= q("q_id"))
          .withColumn("cos6", expr(cosExpr))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("cand_id"), col("cos6"), col("rank"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $duckAssign,
              |ev AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.anchor_id
              |       FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id)
              |SELECT q_id, cand_id, cos6, CAST(rank AS INTEGER) AS rank FROM (
              |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, $duckCos AS cos6,
              |         row_number() OVER (PARTITION BY q.vec_id
              |                            ORDER BY $duckCos DESC, c.vec_id ASC) AS rank
              |  FROM (SELECT vec_id, v AS va, anchor_id FROM ev WHERE vec_id < 8) q
              |  JOIN (SELECT vec_id, v AS vb, anchor_id FROM ev) c
              |    ON c.anchor_id = q.anchor_id AND c.vec_id <> q.vec_id)
              |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),
  )
}
