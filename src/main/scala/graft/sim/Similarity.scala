package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (BASELINE north-star
  * "similarity search"): brute-force cosine top-k as the correctness
  * baseline, and a trained IVF (k-means) two-stage path as the scale story.
  *
  * Scale design: brute force is O(|Q|·N) — fine when the query set is small
  * and broadcast (the N×|Q| join broadcasts the queries, so the corpus
  * streams through map-side with no shuffle; the only exchange is the
  * per-query top-k). The IVF variant trains K coarse centroids with Lloyd's
  * iterations, assigns every vector to its nearest centroid, and searches
  * only the query's `NProbe` nearest cells — the standard recall/cost trade
  * (at 100 TB, K grows ~√N and centroids stay a broadcast table). All paths
  * share one bit-reproducible cosine: a left-fold dot/norm formula the
  * DuckDB oracle mirrors operation-for-operation.
  */
object Similarity {

  /** Embedding dimensionality of the fixture corpus (TESTDATA.md); the
    * Spark side reads array sizes dynamically, the oracle SQL needs the
    * constant. */
  val Dim = 64

  /** IVF shape: K coarse cells, `Iters` Lloyd's rounds, `NProbe` cells
    * searched per query. K matches the fixture's label-cluster count; at
    * scale these become tuning knobs (K ~ √N). */
  val K = 5
  val Iters = 3
  val NProbe = 3

  /** At-scale IVF sizing: K = ⌊√N⌋ cells, so cell population and centroid
    * count grow together (~√N each) — the standard IVF knob. NProbe stays a
    * fixed probe budget: as K grows with the corpus the probed FRACTION
    * K⁻¹·NProbe shrinks, which is exactly how a 100 TB index keeps per-query
    * work sublinear. Both engines derive K from the same COUNT, so the
    * oracle replays the √N-sized training verbatim. */
  val SqrtNProbe = 8
  def sqrtK(n: Long): Int = math.max(2, math.sqrt(n.toDouble).toInt)

  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
  }

  /** Codegen'd native expression (graft.functions.CosineSim); bit-identical
    * to the left-fold HOF formula and the DuckDB oracle's list_sum. */
  private val cosExpr = "round(cosine_sim(va, vb), 6)"

  private def duckCosOf(a: String, b: String): String =
    s"round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) / " +
      s"sqrt(list_sum(list_transform($a, x -> x * x)) * " +
      s"list_sum(list_transform($b, x -> x * x))), 6)"

  private val duckCos = duckCosOf("va", "vb")

  /** Centroids as a broadcastable literal DataFrame: (cid INT, cv array<double>). */
  private def centroidsDf(s: SparkSession, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    cents.toDF("cid", "cv")
  }

  /** Nearest-centroid assignment: rank `round(cosine, 6)` descending, ties
    * to the lowest centroid id. One narrow pass over the corpus against a
    * broadcast centroid table + a row_number window on vec_id. */
  private def nearest(e: DataFrame, cdf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos6").desc, col("cid").asc)
    e.crossJoin(broadcast(cdf))
      .withColumn("cos6", expr("round(cosine_sim(v, cv), 6)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("cos6"))
  }

  /** Lloyd's k-means over the embeddings with ENGINE-EXACT arithmetic, so
    * the DuckDB oracle can replay training bit-for-bit:
    *  - component sums are quantized to integer micro-units
    *    (`CAST(round(x*1e6) AS BIGINT)`) — integer addition is exact and
    *    order-independent, where a float sum would depend on aggregation
    *    order no two engines share;
    *  - centroid components are the IEEE-exact double
    *    `sum_micro / (n * 1e6)` (sums stay far below 2^53);
    *  - assignment ranks `round(cosine, 6)` with ties to the lowest cid.
    * Init = the first K vectors. Per-iteration centroids are collected to
    * the driver (K×Dim doubles — model state, the same pattern Spark ML's
    * KMeans uses) and re-broadcast as literals, keeping every iteration a
    * flat two-shuffle job. A cell that loses all members drops out — in
    * both engines identically, since every step is deterministic. */
  def trainKMeans(s: SparkSession, d: String, k: Int = K, iters: Int = Iters)
      : Seq[(Int, Seq[Double])] =
    graft.Artifacts.memo(trained,
      s"${graft.Artifacts.contentKey(d, "embeddings")}|$k|$iters")(
      trainKMeansUncached(s, d, k, iters))

  /** Trained models are deterministic functions of (corpus CONTENT, K,
    * Iters), so the driver memoizes them like any ANN index artifact —
    * repeated queries (assign / search / dedup) share one training run,
    * and an in-place corpus rewrite provably retrains instead of serving
    * a stale model (the [[graft.Artifacts]] content-signature key). */
  private val trained =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]

  /** Corpus cardinality per corpus content, memoized with the same
    * discipline as [[trained]]: `sim_ann_ivf_sqrtn` sizes its index from N
    * on every invocation, and an uncached count() would re-scan the corpus
    * before the query even plans. */
  def corpusSize(s: SparkSession, d: String): Long =
    graft.Artifacts.memo(corpusN, graft.Artifacts.contentKey(d, "embeddings"))(
      vecs(s, d).count())

  private val corpusN = scala.collection.concurrent.TrieMap.empty[String, Long]

  private[sim] def trainKMeansUncached(s: SparkSession, d: String, k: Int, iters: Int)
      : Seq[(Int, Seq[Double])] = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < k).orderBy("vec_id")
      .collect().toSeq.map(r => (r.getLong(0).toInt, r.getSeq[Double](1)))
    for (_ <- 0 until iters) {
      val asg = nearest(e, centroidsDf(s, cents)).select(col("vec_id"), col("cid"))
      cents = asg.join(e, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("j", "x")))
        .groupBy(col("cid"), col("j"))
        .agg(sum(expr("CAST(round(x * 1000000) AS BIGINT)")).as("sm"),
          count(lit(1)).as("c"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(j, " +
          "CAST(sm AS DOUBLE) / (c * 1000000.0) AS comp))), p -> p.comp)").as("cv"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
    }
    cents
  }

  /** Trained-cell assignment for every vector — (vec_id, cell, cos6) — as a
    * PERSISTED parquet artifact per (corpus content, k): the assignment
    * table is half of every IVF serving plan (probe joins, cell blocking,
    * the IVF-PQ composite), and recomputing the broadcast-nearest scan per
    * consumer is per-query corpus cost the index already paid. Same
    * content-key + atomic-publish discipline as the MinHash signature
    * table; at 100 TB this is the cell-assignment column of the index. */
  private def cellsStored(s: SparkSession, d: String, k: Int): DataFrame =
    graft.Artifacts.indexParquet(s, s"ivf_cells_k$k", d, "embeddings")(
      nearest(vecs(s, d).select(col("vec_id"), col("v")),
          centroidsDf(s, trainKMeans(s, d, k, Iters)))
        .select(col("vec_id"), col("cid").as("cell"), col("cos6")))

  /** Trained-cell assignment for every vector: (vec_id, cell, cos6). */
  def assignCells(s: SparkSession, d: String): DataFrame = cellsStored(s, d, K)

  /** UPDATED versions of the indexed `vec_id % 5 = 0` vectors — components
    * rotated left one position — the deterministic "document re-embedded
    * after an edit" stand-in both engines can state literally (rotation
    * changes the direction, so assignments genuinely move; a scalar rescale
    * would be cosine-invariant and test nothing). */
  def rotatedArrivals(s: SparkSession, d: String): DataFrame =
    vecs(s, d).filter(expr("vec_id % 5 = 0"))
      .select(col("vec_id"),
        expr("concat(slice(v, 2, size(v) - 1), array(element_at(v, 1)))").as("v"))

  /** INDEX MAINTENANCE (the st_ann_upsert batch semantics): re-arrived
    * vectors are assigned against the TRAINED centroids — no retrain, the
    * operational property IVF buys — and supersede their stored assignment
    * latest-wins. Output: per re-arrival, the stored cell, the new cell,
    * and whether it moved (the mover count is the retraining-pressure
    * metric: movers accumulate as the corpus drifts from the trained
    * snapshot, the same signal st_cell_drift watches distributionally).
    * Plan shape: the stored assignment artifact is probed (no corpus
    * re-scan); only the arrival slice touches the centroid broadcast. */
  def upsertAssign(s: SparkSession, d: String): DataFrame = {
    val cdf = centroidsDf(s, trainKMeans(s, d, K, Iters))
    val newAsg = nearest(rotatedArrivals(s, d), cdf)
      .select(col("vec_id"), col("cid").as("new_cell"))
    val old = assignCells(s, d).select(col("vec_id"), col("cell").as("old_cell"))
    newAsg.join(old, "vec_id")
      .select(col("vec_id"), col("old_cell"), col("new_cell"),
        (col("old_cell") =!= col("new_cell")).as("moved"))
      .orderBy("vec_id")
  }

  /** Oracle SQL for `st_ann_upsert` — lives here to reuse the private
    * k-means replay ([[duckKmeansChain]]) and cosine builders. */
  def upsertOracleSql: String =
    s"""WITH ${duckKmeansChain()},
       |arr AS (SELECT vec_id, list_concat(v[2:], [v[1]]) AS v2 FROM e
       |        WHERE vec_id % 5 = 0),
       |na AS (SELECT vec_id, cid AS new_cell FROM (
       |  SELECT a.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY a.vec_id
       |                            ORDER BY ${duckCosOf("a.v2", "c.cv")} DESC,
       |                                     c.cid ASC) AS rn
       |  FROM arr a, c$Iters c) WHERE rn = 1)
       |SELECT n.vec_id, s.cell AS old_cell, n.new_cell,
       |       s.cell <> n.new_cell AS moved
       |FROM na n JOIN assign s USING (vec_id) ORDER BY vec_id""".stripMargin

  /** DuckDB WITH-fragment replaying k-means training and the final
    * assignment — `assign` ends as (vec_id, cell, cos6). Shared by every
    * oracle that consumes trained cells (also graft.dedup's embedding
    * near-dup). `kExpr` is a SQL expression for the cell count, so the
    * √N-scaled variant can derive K from the corpus itself. */
  def duckKmeansChain(kExpr: String = K.toString, iters: Int = Iters): String = {
    val sb = new StringBuilder
    sb ++= "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    sb ++= s"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv FROM e WHERE vec_id < ($kExpr)),\n"
    for (i <- 1 to iters) {
      val cos = duckCosOf("e.v", "c.cv")
      sb ++= s"a$i AS (SELECT vec_id, cid FROM (\n"
      sb ++= s"  SELECT e.vec_id, c.cid,\n"
      sb ++= s"         row_number() OVER (PARTITION BY e.vec_id\n"
      sb ++= s"                            ORDER BY $cos DESC, c.cid ASC) AS rn\n"
      sb ++= s"  FROM e, c${i - 1} c) WHERE rn = 1),\n"
      sb ++= s"c$i AS (SELECT cid, list(comp ORDER BY jj) AS cv FROM (\n"
      sb ++= s"  SELECT a.cid, jj,\n"
      sb ++= s"         CAST(SUM(CAST(round(e.v[jj] * 1000000) AS BIGINT)) AS DOUBLE)\n"
      sb ++= s"           / (COUNT(*) * 1000000.0) AS comp\n"
      sb ++= s"  FROM a$i a JOIN e USING (vec_id), (SELECT unnest(range(1, ${Dim + 1})) AS jj)\n"
      sb ++= s"  GROUP BY a.cid, jj)\n"
      sb ++= s"GROUP BY cid),\n"
    }
    val cos = duckCosOf("e.v", "c.cv")
    sb ++= s"assign AS (SELECT vec_id, cid AS cell, cos6 FROM (\n"
    sb ++= s"  SELECT e.vec_id, c.cid, $cos AS cos6,\n"
    sb ++= s"         row_number() OVER (PARTITION BY e.vec_id\n"
    sb ++= s"                            ORDER BY $cos DESC, c.cid ASC) AS rn\n"
    sb ++= s"  FROM e, c$iters c) WHERE rn = 1)"
    sb.toString
  }

  /** Exact brute-force cosine top-k for the fixed query set (vec_id < 8):
    * queries broadcast over one corpus scan, self excluded, per-query
    * window rank — the ground truth the cosine ANN paths are evaluated
    * against. Zero-norm candidates are EXCLUDED before ranking: cosine_sim
    * yields NaN for them (see [[graft.functions.CosineSim]]'s edge note),
    * NaN has no similarity rank, and without the filter the window
    * formulation would sort NaN first while the bounded TopK aggregator
    * drops it — this filter is what keeps sim_topk_brute ≡ sim_topk_agg
    * and pins the convention the oracles mirror (their 0/0 is likewise
    * excluded in [[duckBruteSql]]/[[duckBruteCte]]). */
  private def bruteTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("va"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("vb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos6").desc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("cos6", expr(cosExpr))
      .filter(col("cos6").isNotNull && !isnan(col("cos6")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cand_id"), col("cos6"), col("rank"))
  }

  /** Exact brute-force DOT-PRODUCT top-k for the fixed query set — the
    * MIPS ground truth. Serves `sim_mips_topk` directly and is the exact
    * side of the PQ recall eval (ADC scores approximate the DOT metric, so
    * a cosine ground truth would conflate metric mismatch with
    * quantization loss). No NaN guard needed: a dot product of finite
    * vectors is always finite, zero-norm included. */
  private def bruteMipsTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("va"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("vb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ip").desc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("ip", expr("dot_product(va, vb)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cand_id"),
        expr("round(ip, 6)").as("ip6"), col("rank"))
  }

  /** Standalone brute-force cosine top-`k` oracle — ONE text for
    * `sim_topk_brute` and `sim_topk_agg` (previously two byte-identical
    * copies). `NOT isnan(cos)` mirrors [[bruteTopK]]'s zero-norm exclusion;
    * under NULL-on-0/0 DuckDB semantics the predicate is NULL and the row
    * drops the same way. */
  private def duckBruteSql(k: Int): String =
    s"""SELECT q_id, cand_id, cos6, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id, $duckCos AS cos6,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY $duckCos DESC, c.vec_id ASC) AS rank
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
       |        FROM embeddings WHERE vec_id < 8) q,
       |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
       |  WHERE c.vec_id <> q.vec_id AND NOT isnan($duckCos))
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** The same ranking as a `brute AS (...)` CTE projected to (q_id,
    * cand_id) — the exact-cosine ground-truth block of the IVF recall
    * evals (`sim_ann_recall`, `sim_nprobe_sweep`). */
  private def duckBruteCte(k: Int): String =
    s"""brute AS (SELECT q_id, cand_id FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |                            ORDER BY $duckCos DESC, c.vec_id ASC) AS rank
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
       |        FROM embeddings WHERE vec_id < 8) q,
       |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
       |  WHERE c.vec_id <> q.vec_id AND NOT isnan($duckCos)) WHERE rank <= $k)""".stripMargin

  /** Dot-metric twin of [[duckBruteCte]] — the exact ground truth of the
    * PQ recall eval ([[duckPqRecallSql]]), mirroring [[bruteMipsTopK]]. */
  private def duckMipsBruteCte(k: Int): String =
    s"""brute AS (SELECT q_id, cand_id FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY ${duckDotOf("q.va", "c.vb")} DESC, c.vec_id ASC) AS rank
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
       |        FROM embeddings WHERE vec_id < 8) q,
       |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
       |  WHERE c.vec_id <> q.vec_id) WHERE rank <= $k)""".stripMargin

  /** The IVF probe block shared by EVERY IVF-served path (`sim_ann_ivf`,
    * `sim_ann_ivf_sqrtn`, `sim_mips_ivf`, `sim_ann_filtered`,
    * `sim_ivf_pq`): rank the broadcast centroids per query under
    * `metricFn`, keep each query's top `nprobe` cells. One audited home,
    * the bucketedPairs discipline — callers project (q_id, probe_cell,
    * …) from the returned frame. `e` must carry (vec_id, v) plus any
    * pass-through columns the caller needs (e.g. label). */
  private def ivfProbes(e: DataFrame, cdf: DataFrame, nprobe: Int,
      metricFn: String): DataFrame = {
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("psc").desc, col("cid").asc)
    e.filter(col("vec_id") < 8)
      .crossJoin(broadcast(cdf))
      .withColumn("psc", expr(s"round($metricFn(v, cv), 6)"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
  }

  /** IVF probe/search shape shared by the cosine and dot serving paths:
    * assign the corpus to trained cells, probe each query's `nprobe`
    * nearest cells under `metricFn` (centroids broadcast via [[ivfProbes]],
    * corpus never shuffled by the probe), exact re-rank the union of
    * probed cells to top-3 under the same metric. One body for
    * [[annIvfSearch]] and [[mipsIvfSearch]] — previously two near-verbatim
    * copies that a probe/re-rank fix would have had to hit twice. */
  private def ivfSearch(s: SparkSession, d: String, k: Int, nprobe: Int,
      metricFn: String, scoreCol: String): DataFrame = {
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val cdf = centroidsDf(s, trainKMeans(s, d, k, Iters))
    val asg = cellsStored(s, d, k).select(col("vec_id"), col("cell"))
    val probes = ivfProbes(e, cdf, nprobe, metricFn)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("cid").as("probe_cell"))
    val c = e.join(asg, "vec_id")
      .select(col("vec_id").as("cand_id"), col("v").as("vb"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col(scoreCol).desc, col("cand_id").asc)
    c.join(broadcast(probes),
        c("cell") === probes("probe_cell") && col("cand_id") =!= col("q_id"))
      .withColumn(scoreCol, expr(s"round($metricFn(va, vb), 6)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("cand_id"), col(scoreCol), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** Cosine IVF serving — `sim_ann_ivf` and the √N-scaled variant. */
  private def annIvfSearch(s: SparkSession, d: String, k: Int, nprobe: Int): DataFrame =
    ivfSearch(s, d, k, nprobe, "cosine_sim", "cos6")

  /** IVF serving under the INNER-PRODUCT metric (the faiss
    * IndexIVF/METRIC_INNER_PRODUCT shape): the SAME trained index — raw-
    * vector centroids + stored cell assignments, no retrain, no second
    * index — probed by centroid dot product, with the probed union exact-
    * dot re-ranked. This is how one physical index serves both the cosine
    * queries (sim_ann_ivf) and the dot-trained retrieval models
    * (sim_mips_topk is the brute ground truth); recall vs brute MIPS is
    * asserted in SimilaritySpec. Plan shape identical to [[annIvfSearch]]
    * by construction (shared [[ivfSearch]] body). */
  private def mipsIvfSearch(s: SparkSession, d: String, k: Int, nprobe: Int): DataFrame =
    ivfSearch(s, d, k, nprobe, "dot_product", "ip6")

  private def duckDotOf(a: String, b: String): String =
    s"round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), 6)"

  /** Shared probe/candidate/ranked-result CTE text of the IVF oracle under
    * a given metric, ending in `ivfranked(q_id, cand_id, <scoreCol>,
    * rank)` — the oracle twin of [[ivfProbes]]+[[ivfSearch]], consumed by
    * the cosine search oracle ([[duckAnnIvfSql]]), the dot search oracle
    * ([[duckMipsIvfSql]]) and the recall-eval oracle. */
  private def duckIvfCtes(nprobe: Int,
      metricOf: (String, String) => String = duckCosOf,
      scoreCol: String = "cos6"): String = {
    val pm = metricOf("e.v", "c.cv")
    s"""probes AS (SELECT vec_id AS q_id, va, probe_cell FROM (
       |  SELECT e.vec_id, e.v AS va, c.cid AS probe_cell,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY $pm DESC, c.cid ASC) AS rn
       |  FROM e, c${Iters} c WHERE e.vec_id < 8) WHERE rn <= $nprobe),
       |cands AS (SELECT a.vec_id AS cand_id, e.v AS vb, a.cell
       |          FROM assign a JOIN e USING (vec_id)),
       |ivfranked AS (
       |  SELECT p.q_id, c.cand_id, ${metricOf("p.va", "c.vb")} AS $scoreCol,
       |         row_number() OVER (PARTITION BY p.q_id
       |                            ORDER BY ${metricOf("p.va", "c.vb")} DESC, c.cand_id ASC) AS rank
       |  FROM probes p JOIN cands c
       |    ON c.cell = p.probe_cell AND c.cand_id <> p.q_id)""".stripMargin
  }

  /** Oracle for [[mipsIvfSearch]]: the shared k-means replay, probes and
    * re-rank under the dot metric. */
  private def duckMipsIvfSql(nprobe: Int): String =
    s"""WITH ${duckKmeansChain()},
       |${duckIvfCtes(nprobe, duckDotOf, "ip6")}
       |SELECT q_id, cand_id, ip6, CAST(rank AS INTEGER) AS rank
       |FROM ivfranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** Oracle for [[annIvfSearch]] over a given training chain + probe budget. */
  private def duckAnnIvfSql(chain: String, nprobe: Int): String =
    s"""WITH $chain,
       |${duckIvfCtes(nprobe)}
       |SELECT q_id, cand_id, cos6, CAST(rank AS INTEGER) AS rank
       |FROM ivfranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** Random-hyperplane (sign-random-projection) LSH shape: RpBands bands of
    * RpBandBits sign bits — the TRAINING-FREE complement to the IVF path
    * (no k-means pass over the corpus; hyperplanes are data-independent, so
    * codes for new vectors never require re-fitting — the property that
    * matters for an append-only 100 TB corpus). Collision probability per
    * bit is 1 − θ/π (θ = the pair's angle), so same-band candidates skew
    * toward high cosine; candidates are verified with the exact native
    * cosine like every other near-dup path. */
  val RpBands: Int = graft.functions.RpBandCodesImpl.Bands
  val RpBandBits: Int = graft.functions.RpBandCodesImpl.BandBits

  /** Total hyperplanes. The ±1 component for plane `p`, dim `i` is the high
    * bit of md5("rp:p:i") — a fixed public derivation BOTH engines compute
    * themselves (the same md5-family trick as the MinHash oracle). Vector
    * components are quantized to integer micro-units before the projection
    * (`CAST(round(x*1e6) AS BIGINT)` — the k-means contract), so the dot is
    * an integer SUM: exact, order-independent, no float-parity games. */
  private val RpPlanes = RpBands * RpBandBits

  /** CORPUS-ADAPTIVE band width (round 16 — found by the 100×-replica
    * probe, the sqrtK discipline applied to LSH): a FIXED band width has a
    * fixed code space (16 bands × 2⁸ values = 4096 buckets), so bucket
    * sizes grow linearly with the corpus and candidate-pair mass grows
    * QUADRATICALLY — measured at the 200k-vector point: every one of the
    * 4096 buckets held >100 vectors, 950 were over the MaxBucket cap, and
    * the kept pair mass was 699M pairs (DiagBuckets; the cap bounds
    * per-bucket memory, never total mass, and once every bucket overflows
    * the cap recall collapses to zero). The SAME 128 hyperplanes therefore
    * REGROUP into wider bands as N grows — thresholds keep the expected
    * bucket load ≤ 64 at each regime boundary (N ≤ 64·2^bits), so pair
    * mass stays ~linear in N. Both engines derive bits from the same
    * COUNT(*) (the sim_ann_ivf_sqrtn precedent), and at every fixture
    * scale the ladder yields today's 16×8 shape, so established oracles
    * and plans are untouched.
    *
    * The recall trade is real and documented: wider bands are more
    * selective, so per-band match probability p^bits falls. For true
    * near-duplicates (cos ≥ 0.95, p ≈ 0.936/bit) recall is ~99.9% at 8-bit
    * bands, ~97% at 16-bit (8 bands), ~40% at 32-bit (4 bands) — past the
    * 16-bit regime (N > 4M vectors) the TRAINED √N-cell IVF path
    * (dd_embed_cosine / dd_semantic_dedup) is the production near-dup
    * screen; RP-LSH remains the training-free screen for append-heavy
    * corpora below that. Widths stay multiples of the kernel's 8-bit
    * codes so regrouping is pure bit-packing over the unchanged plane
    * set. */
  private val RpShape: Seq[(Long, Int)] = Seq(16384L -> 8, 4194304L -> 16)
  private val RpBitsMax = 32

  def rpBitsFor(n: Long): Int =
    RpShape.collectFirst { case (t, b) if n <= t => b }.getOrElse(RpBitsMax)

  /** The same ladder as SQL over `COUNT(*)` — generated from [[RpShape]]
    * so the two engines cannot drift. */
  private def rpShapeSql(from: String): String =
    "SELECT CASE " +
      RpShape.map { case (t, b) => s"WHEN COUNT(*) <= $t THEN $b" }.mkString(" ") +
      s" ELSE $RpBitsMax END AS bits FROM $from"

  /** Regroup the kernel's 16 8-bit band codes (a `codes` column) into
    * `128/bits` bands of `bits` sign bits — pure bit-packing over the
    * unchanged plane set: grouped band gi's bit (j·8 + k) is code
    * gi·g+j's bit k, exactly the oracle's `p // bits` / `1 << (p % bits)`
    * grouping of plane p. Identity at `bits = 8` (the fixture regime) so
    * the established plan is byte-for-byte untouched there. Shared with
    * SimilaritySpec's regroup-equivalence property. */
  private[graft] def rpBandedCodes(bits: Int): Column = {
    val g = bits / RpBandBits
    require(g >= 1 && RpBands % g == 0, s"bits=$bits must be a multiple of $RpBandBits")
    if (g == 1) col("codes")
    else expr(s"transform(sequence(0, ${RpBands / g - 1}), gi -> " +
      s"aggregate(sequence(0, ${g - 1}), CAST(0 AS BIGINT), " +
      s"(acc, j) -> acc + shiftleft(element_at(codes, gi * $g + j + 1), " +
      s"$RpBandBits * j)))")
  }

  /** In-engine ±1 derivation, shared literal text shape for both dialects
    * (`cat` = the engine's string concat of 'rp:', p, ':', i). */
  private def sgnCase(cat: String): String =
    s"CASE WHEN substr(md5($cat), 1, 1) IN ('0','1','2','3','4','5','6','7') " +
      "THEN 1 ELSE -1 END"

  /** PRODUCT QUANTIZATION (PQ) shape: the corpus is compressed to
    * `PqM` codes per vector (one per `PqSub`-dim subspace, each from a
    * `PqKs`-entry sub-codebook) — 8 bytes a vector here, vs 512 bytes of
    * raw doubles. Queries score candidates from the codes alone (ADC:
    * query-subvector · sub-centroid, summed over subspaces), which is how
    * FAISS-style engines afford billion-vector serving: the raw corpus
    * never pages in. Training is Lloyd's per subspace with ENGINE-EXACT
    * integer arithmetic: subvectors quantized to micro-units once, L2
    * distances and centroid means in BIGINT (`sum div n` — truncating
    * division in BOTH engines), ties to the lowest code. At fixture scale
    * PqKs=8 keeps the oracle replay small; at 100 TB the knobs become
    * PqKs=256 (one byte per code) and the same plan trains per-shard. */
  val PqM = 8
  val PqSub: Int = Dim / PqM
  val PqKs = 16

  /** Subvector view of the corpus in exact integer micro-units. */
  private def pqSubVecs(s: SparkSession, d: String, m: Int): DataFrame =
    vecs(s, d).select(col("vec_id"), expr(
      s"transform(slice(v, ${m * PqSub + 1}, $PqSub), " +
        "x -> CAST(round(x * 1000000) AS BIGINT))").as("vm"))

  private val pqDist2 =
    "aggregate(zip_with(vm, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"

  /** Nearest sub-centroid by integer L2; ties to the lowest code. */
  private def pqNearest(e: DataFrame, cdf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2").asc, col("cid").asc)
    e.crossJoin(broadcast(cdf))
      .withColumn("dist2", expr(pqDist2))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("code"), col("dist2"))
  }

  private def pqCentsDf(s: SparkSession, cents: Seq[(Int, Seq[Long])]): DataFrame = {
    import s.implicits._
    cents.toDF("cid", "cv")
  }

  private val pqTrained = scala.collection.concurrent.TrieMap
    .empty[String, IndexedSeq[Seq[(Int, Seq[Long])]]]

  /** The trained PQ model (all M sub-codebooks), memoized per corpus
    * CONTENT with the same index-artifact discipline as [[trainKMeans]].
    * Driver state is M×PqKs×PqSub longs — model-sized, never data-sized. */
  def trainPq(s: SparkSession, d: String): IndexedSeq[Seq[(Int, Seq[Long])]] =
    graft.Artifacts.memo(pqTrained, graft.Artifacts.contentKey(d, "embeddings"))(
      (0 until PqM).map(m => trainPqSub(s, d, m)))

  private def trainPqSub(s: SparkSession, d: String, m: Int): Seq[(Int, Seq[Long])] = {
    val e = pqSubVecs(s, d, m)
    var cents: Seq[(Int, Seq[Long])] = e.filter(col("vec_id") < PqKs).orderBy("vec_id")
      .collect().toSeq.map(r => (r.getLong(0).toInt, r.getSeq[Long](1)))
    for (_ <- 0 until Iters) {
      val asg = pqNearest(e, pqCentsDf(s, cents)).select(col("vec_id"), col("code"))
      cents = asg.join(e, "vec_id")
        .select(col("code"), posexplode(col("vm")).as(Seq("j", "x")))
        .groupBy(col("code"), col("j"))
        .agg(sum(col("x")).as("sm"), count(lit(1)).as("c"))
        .groupBy(col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(j, sm div c AS comp))), " +
          "p -> p.comp)").as("cv"))
        .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1)
    }
    cents
  }

  /** All M subvectors of every vector in ONE narrow pass:
    * (vec_id, m, vm) — the encode path must not scan the corpus once per
    * subspace (measured 2.05 s → one-pass form; at 100 TB, M passes would
    * be M full reads). */
  private def pqSubVecsAll(s: SparkSession, d: String): DataFrame =
    vecs(s, d).select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${PqM - 1}), m -> transform(" +
        s"slice(v, m * $PqSub + 1, $PqSub), " +
        "x -> CAST(round(x * 1000000) AS BIGINT)))")).as(Seq("m", "vm")))

  /** The full codebook as one broadcastable table: (m, cid, cv) — M×Ks
    * rows. */
  private def pqCodebookDf(s: SparkSession,
      model: IndexedSeq[Seq[(Int, Seq[Long])]]): DataFrame = {
    import s.implicits._
    model.zipWithIndex
      .flatMap { case (cents, m) => cents.map { case (cid, cv) => (m, cid, cv) } }
      .toDF("m", "cid", "cv")
  }

  /** Every vector's PQ code per subspace — (vec_id, m, code, dist2) — as a
    * PERSISTED parquet artifact: the code table IS the PQ index (N×M small
    * ints; what a FAISS index file stores), and all three serving consumers
    * (`sim_pq_codes`, `sim_pq_topk`, `sim_ivf_pq`) probe the stored table
    * instead of re-encoding the corpus per query. */
  def pqAssignAll(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "pq_codes", d, "embeddings")(
      pqAssignAllUncached(s, d))

  /** One corpus scan, one broadcast join on the subspace id, one window
    * ranked within (vec_id, m). */
  private def pqAssignAllUncached(s: SparkSession, d: String): DataFrame = {
    val model = trainPq(s, d)
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist2").asc, col("cid").asc)
    pqSubVecsAll(s, d)
      .join(broadcast(pqCodebookDf(s, model)), "m")
      .withColumn("dist2", expr(pqDist2))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"), col("dist2"))
  }

  /** PQ ADC top-k serving as a frame — (q_id, cand_id, score, rank ≤ k):
    * queries stay exact while candidates are scored from their persisted
    * codes against the broadcast codebook (see `sim_pq_topk`). Shared by
    * the serving query and the recall eval so both rank identically. */
  private def pqTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val model = trainPq(s, d)
    val q = pqSubVecsAll(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("m"), col("vm").as("qv"))
    val db = pqAssignAll(s, d)
      .select(col("vec_id").as("cand_id"), col("m"), col("code"))
      .join(broadcast(pqCodebookDf(s, model).withColumnRenamed("cid", "code")),
        Seq("m", "code"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    db.join(broadcast(q), "m")
      .withColumn("sc",
        expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("sc")).as("score"))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** DuckDB chain for one PQ subspace (`e` must already exist): emits
    * m{m}e (micro subvectors), m{m}c0..c{Iters} (training), m{m}asg
    * (final code + distortion per vector). */
  private def duckPqSubChain(m: Int): String = {
    val lo = m * PqSub + 1
    val hi = m * PqSub + PqSub
    def dist(e: String, c: String) =
      s"list_sum(list_transform(range(1, ${PqSub + 1}), " +
        s"j -> ($e.vm[j] - $c.cv[j]) * ($e.vm[j] - $c.cv[j])))"
    val sb = new StringBuilder
    sb ++= s"m${m}e AS (SELECT vec_id, list_transform(v[$lo:$hi], " +
      s"x -> CAST(round(x * 1000000) AS BIGINT)) AS vm FROM e),\n"
    sb ++= s"m${m}c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, vm AS cv " +
      s"FROM m${m}e WHERE vec_id < $PqKs),\n"
    for (i <- 1 to Iters) {
      sb ++= s"m${m}a$i AS (SELECT vec_id, cid FROM (\n"
      sb ++= s"  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id\n"
      sb ++= s"           ORDER BY ${dist("e", "c")} ASC, c.cid ASC) AS rn\n"
      sb ++= s"  FROM m${m}e e, m${m}c${i - 1} c) WHERE rn = 1),\n"
      sb ++= s"m${m}c$i AS (SELECT cid, list(comp ORDER BY jj) AS cv FROM (\n"
      sb ++= s"  SELECT a.cid, jj, CAST(SUM(e.vm[jj]) AS BIGINT) // COUNT(*) AS comp\n"
      sb ++= s"  FROM m${m}a$i a JOIN m${m}e e USING (vec_id), " +
        s"(SELECT unnest(range(1, ${PqSub + 1})) AS jj)\n"
      sb ++= s"  GROUP BY a.cid, jj)\nGROUP BY cid),\n"
    }
    sb ++= s"m${m}asg AS (SELECT vec_id, cid AS code, dist2 FROM (\n"
    sb ++= s"  SELECT e.vec_id, c.cid, ${dist("e", "c")} AS dist2,\n"
    sb ++= s"         row_number() OVER (PARTITION BY e.vec_id\n"
    sb ++= s"           ORDER BY ${dist("e", "c")} ASC, c.cid ASC) AS rn\n"
    sb ++= s"  FROM m${m}e e, m${m}c$Iters c) WHERE rn = 1)"
    sb.toString
  }

  private def duckPqChains: String =
    (0 until PqM).map(duckPqSubChain).mkString(",\n")

  private def duckPqCodesSql: String = {
    val union = (0 until PqM)
      .map(m => s"SELECT vec_id, $m AS m, code, dist2 FROM m${m}asg")
      .mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$duckPqChains,
       |u AS ($union)
       |SELECT vec_id, array_to_string(list(CAST(code AS VARCHAR) ORDER BY m), ' ') AS codes,
       |       CAST(SUM(dist2) AS BIGINT) AS dist2_total
       |FROM u GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** ADC scoring selects shared by the PQ top-k oracle and its recall
    * eval: per subspace, query subvector · assigned sub-centroid. */
  private def duckPqScoreSel: String = (0 until PqM).map { m =>
    s"""SELECT q.vec_id AS q_id, a.vec_id AS cand_id,
       |       list_sum(list_transform(range(1, ${PqSub + 1}), j -> q.vm[j] * c.cv[j])) AS sc
       |FROM m${m}e q, m${m}asg a JOIN m${m}c$Iters c ON a.code = c.cid
       |WHERE q.vec_id < 8""".stripMargin
  }.mkString("\nUNION ALL ")

  /** The PQ top-3 CTE chain (training replay + ADC ranking) shared by
    * `sim_pq_topk` and `sim_pq_recall`. Emits `r` (ranked candidates). */
  private def duckPqRankedCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$duckPqChains,
       |sc AS ($duckPqScoreSel),
       |tot AS (SELECT q_id, cand_id, CAST(SUM(sc) AS BIGINT) AS score
       |        FROM sc GROUP BY q_id, cand_id),
       |r AS (SELECT q_id, cand_id, score,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY score DESC, cand_id ASC) AS rank
       |      FROM tot WHERE cand_id <> q_id)""".stripMargin

  private def duckPqTopkSql: String =
    s"""WITH $duckPqRankedCtes
       |SELECT q_id, cand_id, score, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** Oracle for `sim_pq_recall`: the PQ ADC top-3 against the exact
    * brute-force DOT-metric top-3 ([[duckMipsBruteCte]] — the metric ADC
    * approximates), hits counted per query from the exact side. */
  private def duckPqRecallSql: String =
    s"""WITH $duckPqRankedCtes,
       |pq AS (SELECT q_id, cand_id FROM r WHERE rank <= 3),
       |${duckMipsBruteCte(3)}
       |SELECT b.q_id, CAST(COUNT(p.cand_id) AS BIGINT) AS n_hits,
       |       (1000 * CAST(COUNT(p.cand_id) AS BIGINT)) // 3 AS recall_permille
       |FROM brute b LEFT JOIN pq p
       |  ON p.q_id = b.q_id AND p.cand_id = b.cand_id
       |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin

  /** Oracle for `sim_ivf_pq`: k-means chain (coarse cells) + all M PQ
    * sub-chains, probe the NProbe nearest cells per query, ADC-score only
    * the candidates assigned to probed cells. */
  private def duckIvfPqSql: String = {
    val pcos = duckCosOf("e.v", "c.cv")
    val scoreSel = (0 until PqM).map { m =>
      s"""SELECT p.q_id, g.vec_id AS cand_id,
         |       list_sum(list_transform(range(1, ${PqSub + 1}), j -> q.vm[j] * c.cv[j])) AS sc
         |FROM probes p
         |JOIN assign g ON g.cell = p.probe_cell AND g.vec_id <> p.q_id
         |JOIN m${m}asg a ON a.vec_id = g.vec_id
         |JOIN m${m}c$Iters c ON a.code = c.cid
         |JOIN m${m}e q ON q.vec_id = p.q_id""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ${duckKmeansChain()},
       |$duckPqChains,
       |probes AS (SELECT vec_id AS q_id, probe_cell FROM (
       |  SELECT e.vec_id, c.cid AS probe_cell,
       |         row_number() OVER (PARTITION BY e.vec_id
       |                            ORDER BY $pcos DESC, c.cid ASC) AS rn
       |  FROM e, c$Iters c WHERE e.vec_id < 8) WHERE rn <= $NProbe),
       |sc AS ($scoreSel),
       |tot AS (SELECT q_id, cand_id, CAST(SUM(sc) AS BIGINT) AS score
       |        FROM sc GROUP BY q_id, cand_id),
       |r AS (SELECT q_id, cand_id, score,
       |             row_number() OVER (PARTITION BY q_id
       |                                ORDER BY score DESC, cand_id ASC) AS rank
       |      FROM tot)
       |SELECT q_id, cand_id, score, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    /** Hyperplane-LSH near-dup candidates over the embeddings: each vector
      * gets RpBands band codes from sign-random projections; same (band,
      * code) ⇒ candidate pair, capped per bucket (graft.dedup.Dedup
      * .MaxBucket — a degenerate corpus collapsing to few codes must not go
      * quadratic), verified by exact cosine ≥ 0.35. Banded-candidate
      * contract like dd_simhash_pairs: the oracle derives the SAME
      * hyperplanes (md5 signs) and the same integer micro-unit dots, so
      * both engines emit the same (recall-limited) pair set.
      *
      * Scale shape: the projection is a NARROW MAP — the codegen'd native
      * kernel (graft.functions.RpBandCodes) computes all RpPlanes signed
      * integer dots per row against a per-JVM constant ±1 matrix and packs
      * them into band codes in one pass. The earlier matrix-multiply-as-join
      * formulation (exploded components × broadcast plane table → two wide
      * aggregations) shuffled N×Dim×RpPlanes intermediate rows for what is
      * per-row arithmetic with a constant operand; the kernel removes that
      * exchange entirely, leaving the (band, code) bucket groupBy as the
      * LSH path's only shuffle — the one the algorithm inherently needs.
      * Quantization stays in SQL (`CAST(round(x*1e6) AS BIGINT)`) so float
      * rounding parity with the oracle is untouched; the kernel is pure
      * integer arithmetic and bit-identical to the SUM(xm*sgn) form (spec:
      * RpBandCodesSpec proves equality against the exploded formulation). */
    QueryDef(
      "sim_rp_pairs",
      (s, d) => {
        val e = vecs(s, d).select(col("vec_id"), col("v"))
        // Corpus-adaptive band width (see RpShape): the kernel's 16 8-bit
        // codes regroup into 128/bits bands of bits/8 codes each — pure
        // bit-packing over the unchanged plane set, identity at fixture
        // scale (g = 1 keeps the established plan byte-for-byte).
        val bits = rpBitsFor(corpusSize(s, d))
        val withCodes = e.withColumn("codes",
          expr("rp_band_codes(transform(v, x -> CAST(round(x * 1000000) AS BIGINT)))"))
        val postings = withCodes
          .select(col("vec_id"), col("v"),
            posexplode(rpBandedCodes(bits)).as(Seq("bi", "bv")))
        graft.dedup.Dedup
          .bucketedPairs(postings, struct(col("vec_id"), col("v")), col("bi"), col("bv"))
          .select(col("p.x.vec_id").as("vec_a"), col("p.y.vec_id").as("vec_b"),
            expr("round(cosine_sim(p.x.v, p.y.v), 6)").as("cos6"))
          .filter(col("cos6") >= 0.35)
          .distinct()
          .orderBy("vec_a", "vec_b")
      },
      Some(
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |shape AS (${rpShapeSql("e")}),
           |planes AS (SELECT p.p, i.i,
           |    ${sgnCase("'rp:' || CAST(p.p AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)")} AS sgn
           |  FROM (SELECT unnest(range(0, $RpPlanes)) AS p) p,
           |       (SELECT unnest(range(0, $Dim)) AS i) i),
           |comps AS (SELECT vec_id, i.i, CAST(round(v[i.i + 1] * 1000000) AS BIGINT) AS xm
           |          FROM e, (SELECT unnest(range(0, $Dim)) AS i) i),
           |dots AS (SELECT vec_id, p, SUM(xm * sgn) AS dm
           |         FROM comps JOIN planes USING (i) GROUP BY vec_id, p),
           |codes AS (SELECT vec_id, p // sh.bits AS bi,
           |                 CAST(SUM(CASE WHEN dm >= 0
           |                           THEN (CAST(1 AS BIGINT) << (p % sh.bits)) ELSE 0 END)
           |                      AS BIGINT) AS bv
           |          FROM dots, shape sh GROUP BY vec_id, p // sh.bits),
           |keep AS (SELECT bi, bv FROM codes GROUP BY bi, bv
           |         HAVING COUNT(*) <= ${graft.dedup.Dedup.MaxBucket}),
           |ev AS (SELECT c.vec_id, c.bi, c.bv, e.v FROM codes c JOIN e USING (vec_id))
           |SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b,
           |       ${duckCosOf("a.v", "c.v")} AS cos6
           |FROM ev a JOIN keep k ON a.bi = k.bi AND a.bv = k.bv
           |     JOIN ev c ON c.bi = a.bi AND c.bv = a.bv AND a.vec_id < c.vec_id
           |WHERE ${duckCosOf("a.v", "c.v")} >= 0.35
           |ORDER BY vec_a, vec_b""".stripMargin)),

    /** Brute-force cosine top-5 for queries vec_id < 8 (self excluded;
      * zero-norm candidates have no rank — see [[bruteTopK]]). */
    QueryDef(
      "sim_topk_brute",
      (s, d) => bruteTopK(s, d, 5).orderBy("q_id", "rank"),
      Some(duckBruteSql(5))),

    /** Top-k via the bounded typed Aggregator (graft.functions.TopK): same
      * result as the window formulation (same oracle — [[duckBruteSql]]),
      * but partial buffers cap the shuffle at O(queries × k) — the
      * formulation that survives millions of candidates per query. The
      * explicit NaN filter mirrors [[bruteTopK]]'s: TopK already drops NaN
      * at reduce, so the filter is what makes the equivalence to the
      * window path hold by construction, not by the aggregator's side
      * behavior. */
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
          .filter(col("cos6").isNotNull && !isnan(col("cos6")))
          .select(col("q_id"), col("cand_id"), col("cos6"))
          .as[(Long, Long, Double)]
        scored.groupByKey(_._1)
          .mapValues(t => graft.functions.TopK.Scored(t._2, t._3))
          .agg(graft.functions.TopK.topK(5).toColumn)
          .flatMap { case (qid, entries) =>
            entries.zipWithIndex.map { case (en, i) => (qid, en.id, en.score, i + 1) }
          }
          .toDF("q_id", "cand_id", "cos6", "rank")
          .orderBy("q_id", "rank")
      },
      Some(duckBruteSql(5))),

    /** Trained IVF cell assignment for every vector (k-means, K cells,
      * Iters Lloyd's rounds — the oracle replays training exactly). */
    QueryDef(
      "sim_ivf_assign",
      (s, d) => assignCells(s, d).orderBy("vec_id"),
      Some(s"""WITH ${duckKmeansChain()}
              |SELECT vec_id, cell, cos6 FROM assign ORDER BY vec_id""".stripMargin)),

    /** ANN search over the trained IVF index, nprobe=NProbe: each query
      * searches its NProbe nearest cells only; exact cosine re-ranks the
      * candidates. Recall vs sim_topk_brute is asserted ≥0.9 in
      * SimilaritySpec. */
    QueryDef(
      "sim_ann_ivf",
      (s, d) => annIvfSearch(s, d, K, NProbe),
      Some(duckAnnIvfSql(duckKmeansChain(), NProbe))),

    /** ANN over a √N-SIZED IVF index: K = ⌊√N⌋ cells (22 at sf0.01, 44 at
      * sf0.1 — vs the fixture-cluster-count K=5 above), fixed NProbe probe
      * budget. This is the configuration the at-scale tuning note on [[K]]
      * promises: cells and centroids both grow ~√N, the probed fraction
      * NProbe/K SHRINKS as the corpus grows, and the oracle derives the
      * same K from COUNT(*) and replays the larger training run verbatim.
      * Recall vs brute force asserted in SimilaritySpec. */
    QueryDef(
      "sim_ann_ivf_sqrtn",
      (s, d) => annIvfSearch(s, d, sqrtK(corpusSize(s, d)), SqrtNProbe),
      Some(duckAnnIvfSql(
        duckKmeansChain("SELECT greatest(2, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) FROM e"),
        SqrtNProbe))),

    /** ANN RECALL@3 EVAL — index quality as an operator, not a one-off
      * notebook: per query, how many of the exact brute-force top-3 the
      * IVF search returned (1000‰ = perfect). Production runs this
      * continuously on a query sample after every index rebuild — a recall
      * regression is corpus drift or a bad training run, and it must
      * surface BEFORE serving degrades. Cost is the brute pass on the
      * SAMPLE only (queries broadcast over one corpus scan); the IVF side
      * reuses the memoized trained index. The left join from the exact
      * top-3 guarantees every query reports, hits or not. */
    QueryDef(
      "sim_ann_recall",
      (s, d) => {
        val ivf = annIvfSearch(s, d, K, NProbe)
          .select(col("q_id"), col("cand_id")).withColumn("hit", lit(1))
        bruteTopK(s, d, 3)
          .select(col("q_id"), col("cand_id"))
          .join(ivf, Seq("q_id", "cand_id"), "left_outer")
          .groupBy(col("q_id"))
          .agg(count(col("hit")).as("n_hits"))
          .withColumn("recall_permille", expr("(1000 * n_hits) div 3"))
          .orderBy("q_id")
      },
      Some(s"""WITH ${duckKmeansChain()},
              |${duckIvfCtes(NProbe)},
              |ivf AS (SELECT q_id, cand_id FROM ivfranked WHERE rank <= 3),
              |${duckBruteCte(3)}
              |SELECT b.q_id, CAST(COUNT(i.cand_id) AS BIGINT) AS n_hits,
              |       (1000 * CAST(COUNT(i.cand_id) AS BIGINT)) // 3 AS recall_permille
              |FROM brute b LEFT JOIN ivf i
              |  ON i.q_id = b.q_id AND i.cand_id = b.cand_id
              |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin)),

    /** NPROBE TUNING SWEEP — the recall-vs-probe-budget curve an IVF
      * operator is actually tuned on: aggregate recall@3 vs brute force at
      * nprobe ∈ {1, 2, 4}, one row per setting. This is the artifact a
      * capacity review reads — "what recall does each unit of probe budget
      * buy on OUR corpus" — and it must come from the same engine-exact
      * index the serving path uses (the memoized trained model + stored
      * cell table; the oracle replays training and ranks candidates per
      * (nprobe, query) from one shared probe ranking). Cost: the brute
      * pass runs ONCE on the 8-query sample; each sweep point reuses the
      * persisted index, so the sweep is 3 candidate joins, not 3 index
      * builds. Monotonicity (more probes ⇒ recall can only rise) is
      * spec-asserted.
      *
      * Empty-sample contract (the dd_band_tuning omission rule): with an
      * empty query sample the arm-wise agg would emit (np, 0, 0, NULL)
      * rows where the oracle's GROUP BY emits none — the n_queries > 0
      * filter states the oracle's omission explicitly (applied BEFORE the
      * recall projection so the div-by-zero NULL is never even formed;
      * never fires on the fixtures). */
    QueryDef(
      "sim_nprobe_sweep",
      (s, d) => {
        val brute = bruteTopK(s, d, 3).select(col("q_id"), col("cand_id"))
        Seq(1, 2, 4).map { np =>
          val ivf = annIvfSearch(s, d, K, np)
            .select(col("q_id"), col("cand_id")).withColumn("hit", lit(1))
          brute.join(ivf, Seq("q_id", "cand_id"), "left_outer")
            .agg(countDistinct(col("q_id")).as("n_queries"),
              count(col("hit")).as("n_hits"))
            .filter(col("n_queries") > 0)
            .select(lit(np).as("nprobe"), col("n_queries"), col("n_hits"),
              expr("(1000 * n_hits) div (3 * n_queries)").as("recall_permille"))
        }.reduce(_.unionAll(_)).orderBy("nprobe")
      },
      Some {
        val pcos = duckCosOf("e.v", "c.cv")
        s"""WITH ${duckKmeansChain()},
           |probes0 AS (SELECT e.vec_id AS q_id, e.v AS va, c.cid AS probe_cell,
           |              row_number() OVER (PARTITION BY e.vec_id
           |                                 ORDER BY $pcos DESC, c.cid ASC) AS rn
           |            FROM e, c$Iters c WHERE e.vec_id < 8),
           |npv AS (SELECT unnest([1, 2, 4]) AS nprobe),
           |cands AS (SELECT a.vec_id AS cand_id, e.v AS vb, a.cell
           |          FROM assign a JOIN e USING (vec_id)),
           |vis AS (SELECT n.nprobe, p.q_id, c.cand_id,
           |          row_number() OVER (PARTITION BY n.nprobe, p.q_id
           |            ORDER BY ${duckCosOf("p.va", "c.vb")} DESC, c.cand_id ASC)
           |            AS rank
           |        FROM probes0 p JOIN npv n ON p.rn <= n.nprobe
           |             JOIN cands c
           |               ON c.cell = p.probe_cell AND c.cand_id <> p.q_id),
           |ivf AS (SELECT nprobe, q_id, cand_id FROM vis WHERE rank <= 3),
           |${duckBruteCte(3)},
           |x AS (SELECT n.nprobe, b.q_id, b.cand_id, i.cand_id AS hit
           |      FROM npv n CROSS JOIN brute b
           |      LEFT JOIN ivf i ON i.nprobe = n.nprobe AND i.q_id = b.q_id
           |           AND i.cand_id = b.cand_id)
           |SELECT CAST(nprobe AS INTEGER) AS nprobe,
           |       CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
           |       CAST(COUNT(hit) AS BIGINT) AS n_hits,
           |       (1000 * CAST(COUNT(hit) AS BIGINT)) // (3 * COUNT(DISTINCT q_id))
           |         AS recall_permille
           |FROM x GROUP BY nprobe ORDER BY nprobe""".stripMargin
      }),

    /** FILTERED ANN — top-3 within the query's LABEL, the
      * metadata-predicate vector search every retrieval system serves
      * ("nearest within this category/tenant/language"). The predicate is
      * applied PRE-scoring, inside the candidate join condition, so the
      * exact-cosine re-rank touches only label-matching candidates from the
      * probed cells — the pre-filter strategy, correct when the filter is
      * selective enough that probed cells still hold matches (the fixture's
      * 10 labels ≈ 10% selectivity; a near-empty post-filter result is the
      * signal to raise nprobe, which [[SqrtNProbe]]'s scaling note covers).
      * Same artifact-probing plan as sim_ann_ivf plus one narrow label
      * attach on each side; queries and their labels ride the same
      * broadcast. A query whose probed cells hold fewer than 3 same-label
      * candidates reports fewer rows — in both engines, by construction. */
    QueryDef(
      "sim_ann_filtered",
      (s, d) => {
        val e = vecs(s, d).select(col("vec_id"), col("v"), col("label"))
        val cdf = centroidsDf(s, trainKMeans(s, d, K, Iters))
        val asg = cellsStored(s, d, K).select(col("vec_id"), col("cell"))
        val probes = ivfProbes(e, cdf, NProbe, "cosine_sim")
          .select(col("vec_id").as("q_id"), col("v").as("va"),
            col("label").as("q_label"), col("cid").as("probe_cell"))
        val c = e.join(asg, "vec_id")
          .select(col("vec_id").as("cand_id"), col("v").as("vb"),
            col("cell"), col("label"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos6").desc, col("cand_id").asc)
        c.join(broadcast(probes),
            c("cell") === probes("probe_cell") &&
              col("label") === col("q_label") && col("cand_id") =!= col("q_id"))
          .withColumn("cos6", expr(cosExpr))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("q_label").as("label"), col("cand_id"),
            col("cos6"), col("rank"))
          .orderBy("q_id", "rank")
      },
      Some {
        val pcos = duckCosOf("e.v", "c.cv")
        s"""WITH ${duckKmeansChain()},
           |lab AS (SELECT vec_id, label FROM embeddings),
           |probes AS (SELECT vec_id AS q_id, va, q_label, probe_cell FROM (
           |  SELECT e.vec_id, e.v AS va, l.label AS q_label, c.cid AS probe_cell,
           |         row_number() OVER (PARTITION BY e.vec_id
           |                            ORDER BY $pcos DESC, c.cid ASC) AS rn
           |  FROM e JOIN lab l USING (vec_id), c$Iters c
           |  WHERE e.vec_id < 8) WHERE rn <= $NProbe),
           |cands AS (SELECT a.vec_id AS cand_id, e.v AS vb, a.cell, l.label
           |          FROM assign a JOIN e USING (vec_id) JOIN lab l USING (vec_id)),
           |r AS (SELECT p.q_id, p.q_label AS label, c.cand_id,
           |             ${duckCosOf("p.va", "c.vb")} AS cos6,
           |             row_number() OVER (PARTITION BY p.q_id
           |                                ORDER BY ${duckCosOf("p.va", "c.vb")} DESC,
           |                                         c.cand_id ASC) AS rank
           |      FROM probes p JOIN cands c
           |        ON c.cell = p.probe_cell AND c.label = p.q_label
           |           AND c.cand_id <> p.q_id)
           |SELECT q_id, label, cand_id, cos6, CAST(rank AS INTEGER) AS rank
           |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    /** EMBEDDING QUANTIZATION (asymmetric per-vector uint8) — the 4x
      * memory/IO compression step before an ANN index ships to serving:
      * q_i = (v_i + m) * 127 / (2m) with m = max|v_i|, mapping [-m, m] to
      * [0, 127]. All arithmetic in integer micro-units (the sim_rp_pairs
      * discipline): floats become `round(v * 1e6)` BIGINTs first, so both
      * engines compute bit-identical codes — no float division anywhere,
      * and integer division agrees because BOTH engines truncate toward
      * zero (Spark `div` ≡ DuckDB `//`; every operand here is non-negative
      * anyway, so even a floor-vs-truncate disagreement couldn't bite).
      * A narrow one-pass map (no shuffle, no model
      * state); emitted checksums (sum/min/max of codes) keep the oracle
      * row compact while pinning every code. */
    QueryDef(
      "sim_quantize_u8",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("vm"))
        .withColumn("m",
          expr("greatest(aggregate(vm, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x))), CAST(1 AS BIGINT))"))
        .withColumn("q", expr("transform(vm, x -> ((x + m) * 127) div (2 * m))"))
        .select(col("vec_id"), col("m").as("scale_micro"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
          expr("array_min(q)").as("q_min"), expr("array_max(q)").as("q_max"))
        .orderBy("vec_id"),
      Some("""WITH vm AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
             |  FROM embeddings),
             |mm AS (SELECT vec_id, vm,
             |         greatest(list_max(list_transform(vm, x -> abs(x))), 1) AS m
             |       FROM vm),
             |q AS (SELECT vec_id, m,
             |        list_transform(vm, x -> ((x + m) * 127) // (2 * m)) AS q
             |      FROM mm)
             |SELECT vec_id, CAST(m AS BIGINT) AS scale_micro,
             |       CAST(list_sum(q) AS BIGINT) AS q_sum,
             |       CAST(list_min(q) AS BIGINT) AS q_min,
             |       CAST(list_max(q) AS BIGINT) AS q_max
             |FROM q ORDER BY vec_id""".stripMargin)),

    /** QUANTIZED MIPS top-k — the serving path over [[sim_quantize_u8]]'s
      * codes: rank candidates by the DEQUANTIZED inner product
      * ma·mb·Σ(2qa_i−127)(2qb_i−127) (each code dequantizes to
      * m·(2q/127 − 1); the constant 1/127² divisor cannot change ranks and
      * is dropped, so every score is an exact BIGINT and both engines rank
      * identically — no float ulp anywhere, the property the float cosine
      * path can't give the oracle). Same distributed shape as
      * sim_topk_brute: queries broadcast, one window per query for the
      * top-k; at scale the scan reads 64-byte codes instead of 256-byte
      * floats — the 4× IO cut is the point of quantized serving.
      *
      * Exactness envelope (the k-means-sum-bound discipline): worst-case
      * |score| = ma·mb·Dim·127², which fits BIGINT only while the max
      * |component| stays ≲ 3.0 (scale m ≤ 3e6 micro at Dim=64). Beyond it
      * Spark's non-ANSI multiply wraps silently while DuckDB's checked
      * arithmetic errors — SimilaritySpec pins the fixture inside the
      * envelope so the boundary can't be crossed unnoticed. */
    QueryDef(
      "sim_topk_q8",
      (s, d) => {
        val q8 = Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
              .as("vm"))
          .withColumn("m",
            expr("greatest(aggregate(vm, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x))), CAST(1 AS BIGINT))"))
          .select(col("vec_id"), col("m"),
            expr("transform(vm, x -> ((x + m) * 127) div (2 * m))").as("q"))
        val qs = q8.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("m").as("ma"), col("q").as("qa"))
        val cs = q8.select(col("vec_id").as("cand_id"), col("m").as("mb"), col("q").as("qb"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("cand_id").asc)
        cs.crossJoin(broadcast(qs))
          .filter(col("cand_id") =!= col("q_id"))
          .withColumn("score", expr(
            "ma * mb * aggregate(zip_with(qa, qb, (a, b) -> (2 * a - 127) * (2 * b - 127)), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("cand_id"), col("score"), col("rank"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH vm AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
             |  FROM embeddings),
             |q8 AS (SELECT vec_id,
             |         greatest(list_max(list_transform(vm, x -> abs(x))), 1) AS m,
             |         list_transform(vm, x ->
             |           ((x + greatest(list_max(list_transform(vm, y -> abs(y))), 1)) * 127)
             |             // (2 * greatest(list_max(list_transform(vm, y -> abs(y))), 1))) AS q
             |       FROM vm),
             |sc AS (SELECT qq.vec_id AS q_id, c.vec_id AS cand_id,
             |         CAST(qq.m * c.m * list_sum(list_transform(range(1, len(qq.q) + 1),
             |           i -> (2 * qq.q[i] - 127) * (2 * c.q[i] - 127))) AS BIGINT) AS score
             |       FROM (SELECT * FROM q8 WHERE vec_id < 8) qq, q8 c
             |       WHERE c.vec_id <> qq.vec_id)
             |SELECT q_id, cand_id, score, CAST(rank AS INTEGER) AS rank FROM (
             |  SELECT q_id, cand_id, score,
             |         row_number() OVER (PARTITION BY q_id
             |                            ORDER BY score DESC, cand_id ASC) AS rank
             |  FROM sc)
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    /** EMBEDDING OUTLIER DETECTION — the data-quality pass that flags
      * mislabeled / off-distribution vectors before they poison training:
      * per-label mean embedding (integer micro-unit component sums, the
      * k-means discipline, so the oracle replays the centroid exactly),
      * then the 3 LOWEST cosine-to-own-centroid vectors per label. Shape:
      * one explode+groupBy for the centroids (a label-count-sized frame,
      * broadcast back), a narrow scoring pass over the corpus, and a
      * per-label bottom-k window — the corpus is never shuffled except for
      * that final k-row-per-label ranking. */
    QueryDef(
      "sim_centroid_outliers",
      (s, d) => {
        val e = vecs(s, d)
        val cent = e.select(col("label"), posexplode(col("v")).as(Seq("j", "x")))
          .groupBy(col("label"), col("j"))
          .agg(sum(expr("CAST(round(x * 1000000) AS BIGINT)")).as("sm"),
            count(lit(1)).as("c"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(j, " +
            "CAST(sm AS DOUBLE) / (c * 1000000.0) AS comp))), p -> p.comp)").as("cv"))
        val w = Window.partitionBy(col("label"))
          .orderBy(col("cos6").asc, col("vec_id").asc)
        e.join(broadcast(cent), "label")
          .withColumn("cos6", expr("round(cosine_sim(v, cv), 6)"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("label"), col("vec_id"), col("cos6"),
            col("rank").cast("int").as("rank"))
          .orderBy("label", "rank")
      },
      Some {
        val cos = duckCosOf("e.v", "c.cv")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
           |cent AS (SELECT label, list(comp ORDER BY jj) AS cv FROM (
           |  SELECT label, jj,
           |         CAST(SUM(CAST(round(v[jj] * 1000000) AS BIGINT)) AS DOUBLE)
           |           / (COUNT(*) * 1000000.0) AS comp
           |  FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS jj)
           |  GROUP BY label, jj) GROUP BY label),
           |sc AS (SELECT e.label, e.vec_id, $cos AS cos6
           |       FROM e JOIN cent c USING (label))
           |SELECT label, vec_id, cos6, CAST(rank AS INTEGER) AS rank
           |FROM (SELECT *, row_number() OVER (PARTITION BY label
           |        ORDER BY cos6 ASC, vec_id ASC) AS rank FROM sc)
           |WHERE rank <= 3 ORDER BY label, rank""".stripMargin
      }),

    /** PER-DIMENSION feature statistics over the embedding corpus — the
      * drift/collapse monitor run before training (a dead or exploding
      * dimension shows up as degenerate sum/sumsq). Component sums in
      * exact integer micro-units (sumsq ≤ N·10¹² stays far inside BIGINT
      * at fixture scale; at 100 TB this becomes a DECIMAL(38) or per-shard
      * partial, same plan), so both engines agree bit-for-bit; the mean is
      * the one IEEE-exact double division both compute identically. Shape:
      * explode + ONE partial-aggregated shuffle of Dim keys — map-side
      * combine reduces every partition to Dim rows before the exchange. */
    QueryDef(
      "sim_dim_stats",
      (s, d) => vecs(s, d)
        .select(posexplode(col("v")).as(Seq("j", "x")))
        .select(col("j"), expr("CAST(round(x * 1000000) AS BIGINT)").as("xm"))
        .groupBy(col("j"))
        .agg(count(lit(1)).as("n"), sum(col("xm")).as("sum_micro"),
          sum(expr("xm * xm")).as("sumsq_micro2"))
        .withColumn("mean", expr("CAST(sum_micro AS DOUBLE) / (n * 1000000.0)"))
        .select(col("j").cast("int").as("j"), col("n"), col("sum_micro"),
          col("sumsq_micro2"), col("mean"))
        .orderBy("j"),
      Some(s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |x AS (SELECT jj, CAST(round(v[jj] * 1000000) AS BIGINT) AS xm
              |      FROM e, (SELECT unnest(range(1, ${Dim + 1})) AS jj))
              |SELECT CAST(jj - 1 AS INTEGER) AS j, COUNT(*) AS n,
              |       CAST(SUM(xm) AS BIGINT) AS sum_micro,
              |       CAST(SUM(xm * xm) AS BIGINT) AS sumsq_micro2,
              |       CAST(SUM(xm) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean
              |FROM x GROUP BY jj ORDER BY j""".stripMargin)),

    /** APPROXIMATE k-NN GRAPH over the whole corpus — the structure behind
      * semantic-dedup clustering and graph-based ANN serving (every vector's
      * top-3 same-cell neighbors by exact cosine). Blocking is the √N-sized
      * IVF index: with K=⌊√N⌋ cells the within-cell pair mass is ~N²/K =
      * N^1.5, i.e. ~√N candidates per vertex — sublinear per vertex and
      * embarrassingly cell-parallel, vs the N² brute graph that is
      * impossible at 100 TB (where this shape gets a cell-size cap, the
      * MaxBucket discipline of graft.dedup, and multi-assign for recall at
      * cell borders). One shuffle keyed on the cell id expands pairs; the
      * per-src top-3 window ranks only same-cell candidates. The oracle
      * replays the identical training run and blocking, so rows match
      * exactly; isolated singleton cells yield no edges in both engines. */
    QueryDef(
      "sim_knn_graph",
      (s, d) => {
        val e = vecs(s, d).select(col("vec_id"), col("v"))
        val k = sqrtK(corpusSize(s, d))
        val asg = cellsStored(s, d, k).select(col("vec_id"), col("cell"))
        val av = e.join(asg, "vec_id")
        val a = av.select(col("vec_id").as("src"), col("v").as("va"), col("cell"))
        val b = av.select(col("vec_id").as("dst"), col("v").as("vb"), col("cell"))
        val w = Window.partitionBy(col("src"))
          .orderBy(col("cos6").desc, col("dst").asc)
        a.join(b, "cell")
          .filter(col("src") =!= col("dst"))
          .withColumn("cos6", expr(cosExpr))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("src"), col("dst"), col("cos6"), col("rank"))
          .orderBy("src", "rank")
      },
      Some(s"""WITH ${duckKmeansChain(
               "SELECT greatest(2, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) FROM e")},
           |av AS (SELECT a.vec_id, a.cell, e.v FROM assign a JOIN e USING (vec_id)),
           |p AS (SELECT x.vec_id AS src, y.vec_id AS dst,
           |             ${duckCosOf("x.v", "y.v")} AS cos6
           |      FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
           |r AS (SELECT src, dst, cos6,
           |             row_number() OVER (PARTITION BY src
           |                                ORDER BY cos6 DESC, dst ASC) AS rank
           |      FROM p)
           |SELECT src, dst, cos6, CAST(rank AS INTEGER) AS rank
           |FROM r WHERE rank <= 3 ORDER BY src, rank""".stripMargin)),

    /** PQ CODEBOOK ENCODING — the index-build half of product quantization:
      * every vector reduced to its M sub-codes (emitted as a space-joined
      * string: the driver compare can't hash list columns) plus the total
      * quantization distortion, the number PQ tuning watches. One narrow
      * pass per subspace against its broadcast sub-codebook, union, one
      * vec_id rollup. The oracle replays all M trainings from the same
      * integer arithmetic. */
    QueryDef(
      "sim_pq_codes",
      (s, d) => pqAssignAll(s, d)
        .groupBy(col("vec_id"))
        .agg(expr("array_join(transform(array_sort(collect_list(struct(m, code))), " +
          "p -> CAST(p.code AS STRING)), ' ')").as("codes"),
          sum(col("dist2")).as("dist2_total"))
        .orderBy("vec_id"),
      Some(duckPqCodesSql)),

    /** PQ TOP-K SERVING (ADC — asymmetric distance computation): queries
      * stay exact while candidates are scored from their CODES alone
      * (query-subvector · assigned sub-centroid, summed over subspaces, all
      * BIGINT micro² — bit-identical cross-engine). This is the
      * billion-vector serving shape: the scoring join touches the M×Ks
      * codebook (broadcast) and the N×M code table — never the raw
      * vectors. Recall vs exact brute force is asserted in SimilaritySpec;
      * rank ties break to the lowest candidate id in both engines. */
    QueryDef(
      "sim_pq_topk",
      (s, d) => pqTopK(s, d, 3)
        .select(col("q_id"), col("cand_id"), col("score"), col("rank"))
        .orderBy("q_id", "rank"),
      Some(duckPqTopkSql)),

    /** PQ RECALL@3 EVAL — the `sim_ann_recall` discipline applied to the
      * OTHER index half: per query, how many of the exact top-3 the
      * compressed ADC serving path returned (1000‰ = lossless ranking).
      * The exact side is the DOT-metric brute force ([[bruteMipsTopK]]):
      * ADC scores are query·reconstructed-candidate inner products, so a
      * cosine ground truth would conflate quantization loss with metric
      * mismatch whenever candidate norms spread (exactly what
      * `sim_norm_audit` measures) and 1000‰ would be unreachable even at
      * infinite codebook size. PQ is a lossy code; production watches this
      * number after every codebook retrain, because distortion creep
      * (corpus drift away from the trained centroids) degrades serving
      * silently while `sim_pq_codes`' dist2_total still looks plausible.
      * Cost: the brute pass runs on the QUERY SAMPLE only (queries
      * broadcast over one corpus scan); the PQ side probes the persisted
      * code table + memoized codebook — no training, no raw-vector scan.
      * The left join from the exact top-3 guarantees every query reports,
      * hits or not. */
    QueryDef(
      "sim_pq_recall",
      (s, d) => {
        val pq = pqTopK(s, d, 3)
          .select(col("q_id"), col("cand_id")).withColumn("hit", lit(1))
        bruteMipsTopK(s, d, 3)
          .select(col("q_id"), col("cand_id"))
          .join(pq, Seq("q_id", "cand_id"), "left_outer")
          .groupBy(col("q_id"))
          .agg(count(col("hit")).as("n_hits"))
          .withColumn("recall_permille", expr("(1000 * n_hits) div 3"))
          .orderBy("q_id")
      },
      Some(duckPqRecallSql)),

    /** IVF-PQ COMPOSITE SERVING — the two index halves composed into the
      * FAISS `IndexIVFPQ` shape that actually serves billion-vector
      * corpora: the coarse IVF quantizer prunes the corpus to each query's
      * NProbe nearest cells, and ONLY those candidates are ADC-scored from
      * their PQ codes (query-subvector · assigned sub-centroid, summed
      * over subspaces, all BIGINT micro² — bit-identical cross-engine).
      * Per-query work is therefore (NProbe/K of the corpus) × (M code
      * lookups against a broadcast M×Ks codebook) — sublinear candidate
      * count AND compressed candidate representation; the raw vectors
      * appear nowhere in the serving plan (`.explain` shows the code table
      * + two broadcasts, no embeddings column past the probe stage).
      *
      * Scale shape: both inputs are the PERSISTED index artifacts the
      * standalone paths already build (memoized coarse centroids + PQ
      * codebooks; cell-assignment and code tables are linear one-pass
      * maps), so serving cost is independent of training. At 100 TB the
      * knobs become K~√N cells (probed fraction shrinks as the corpus
      * grows — the sim_ann_ivf_sqrtn argument) and PqKs=256 codes/byte;
      * the plan is unchanged. Tie ranks break to the lowest cand_id in
      * both engines; recall vs exact brute force asserted in
      * SimilaritySpec. */
    QueryDef(
      "sim_ivf_pq",
      (s, d) => {
        val model = trainPq(s, d)
        val e = vecs(s, d).select(col("vec_id"), col("v"))
        val cdf = centroidsDf(s, trainKMeans(s, d))
        val probes = ivfProbes(e, cdf, NProbe, "cosine_sim")
          .select(col("vec_id").as("q_id"), col("cid").as("probe_cell"))
        // The serving index: (cand_id, cell, m, code) — codes + coarse cell,
        // never the raw vectors.
        val serving = pqAssignAll(s, d)
          .select(col("vec_id").as("cand_id"), col("m"), col("code"))
          .join(assignCells(s, d).select(col("vec_id").as("cand_id"), col("cell")),
            "cand_id")
        val q = pqSubVecsAll(s, d).filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("m"), col("vm").as("qv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("cand_id").asc)
        serving
          .join(broadcast(probes),
            col("cell") === col("probe_cell") && col("cand_id") =!= col("q_id"))
          .join(broadcast(pqCodebookDf(s, model).withColumnRenamed("cid", "code")),
            Seq("m", "code"))
          .join(broadcast(q), Seq("q_id", "m"))
          .withColumn("sc",
            expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .groupBy(col("q_id"), col("cand_id"))
          .agg(sum(col("sc")).as("score"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("cand_id"), col("score"), col("rank"))
          .orderBy("q_id", "rank")
      },
      Some(duckIvfPqSql)),

    /** MAXIMUM-INNER-PRODUCT top-k (MIPS) — retrieval models trained with a
      * dot-product objective (DPR/two-tower recommenders) must be SERVED by
      * dot product: the argmax differs from cosine whenever candidate norms
      * differ, so reusing a cosine top-k silently biases toward unit-norm
      * candidates. Exact brute formulation here (the recall oracle);
      * candidates score with the codegen'd native [[graft.functions
      * .DotProduct]] against broadcast queries, rank desc / ties to min
      * cand_id, emit k=5 in integer-micro-free 6-dp rounding.
      *
      * Scale path (documented, spec-checked in SimilaritySpec): MIPS
      * reduces to cosine by norm augmentation — append
      * sqrt(M²−‖x‖²) to each candidate (M = max candidate norm, a 1-row
      * broadcast scalar) and 0 to each query; augmented-cosine order equals
      * dot order per query, so the EXISTING IVF/LSH cosine index serves
      * MIPS with no new index structure. The brute pass stays
      * O(queries×corpus) with a candidates-side scan that never shuffles
      * (queries broadcast), same shape as sim_topk_brute; the bounded TopK
      * aggregator (sim_topk_agg) is the million-candidate formulation. */
    QueryDef(
      "sim_mips_topk",
      (s, d) => bruteMipsTopK(s, d, 5).orderBy("q_id", "rank"),
      Some("""SELECT q_id, cand_id, round(ip, 6) AS ip6, CAST(rank AS INTEGER) AS rank FROM (
             |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
             |         list_sum(list_transform(range(1, len(va) + 1), i -> va[i] * vb[i])) AS ip,
             |         row_number() OVER (PARTITION BY q.vec_id
             |           ORDER BY list_sum(list_transform(range(1, len(va) + 1),
             |                                            i -> va[i] * vb[i])) DESC,
             |                    c.vec_id ASC) AS rank
             |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS va
             |        FROM embeddings WHERE vec_id < 8) q,
             |       (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vb FROM embeddings) c
             |  WHERE c.vec_id <> q.vec_id)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    /** MIPS served through the trained IVF index — see [[mipsIvfSearch]]. */
    QueryDef(
      "sim_mips_ivf",
      (s, d) => mipsIvfSearch(s, d, K, NProbe),
      Some(duckMipsIvfSql(NProbe))),

    /** EMBEDDING NORM AUDIT — per label: count and min/max/mean squared
      * norm in exact integer micro-units (quantize each component to
      * micro, square, sum — identical integer arithmetic in both engines;
      * no sqrt, so no float rounding anywhere). The embedding-health
      * monitor: collapsing norms = a dying encoder, exploding norms =
      * training instability, and norm SPREAD is precisely what makes dot
      * ranking diverge from cosine ranking (the sim_mips_* motivation) —
      * a spread audit tells you whether the distinction matters for your
      * corpus. One narrow scan + partial-aggregating O(labels) rollup. */
    QueryDef(
      "sim_norm_audit",
      (s, d) => vecs(s, d)
        .withColumn("norm2_micro", expr(
          "aggregate(transform(v, x -> CAST(round(x * 1000000) AS BIGINT)), 0L, " +
            "(a, y) -> a + y * y) div 1000000"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("norm2_micro")).as("min_norm2_micro"),
          max(col("norm2_micro")).as("max_norm2_micro"),
          expr("sum(norm2_micro) div count(1)").as("avg_norm2_micro"))
        .orderBy("label"),
      Some("""WITH n AS (SELECT label,
             |         CAST(list_sum(list_transform(
             |           list_transform(CAST(embedding AS DOUBLE[]),
             |                          x -> CAST(round(x * 1000000) AS BIGINT)),
             |           y -> y * y)) // 1000000 AS BIGINT) AS norm2_micro
             |       FROM embeddings)
             |SELECT label, COUNT(*) AS n_vecs,
             |       CAST(MIN(norm2_micro) AS BIGINT) AS min_norm2_micro,
             |       CAST(MAX(norm2_micro) AS BIGINT) AS max_norm2_micro,
             |       CAST(CAST(SUM(norm2_micro) AS BIGINT) // COUNT(*) AS BIGINT)
             |         AS avg_norm2_micro
             |FROM n GROUP BY label ORDER BY label""".stripMargin)),
  )
}
