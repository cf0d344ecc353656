package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming ANN-index operations: arriving vectors probed against the
  * TRAINED serving index without retraining — the operational property IVF
  * buys (centroids are a snapshot artifact; new traffic only needs the
  * narrow nearest-cell map). The monitored product is CELL DRIFT: when the
  * arriving traffic's cell distribution diverges from the indexed corpus's,
  * the index is stale (corpus drift) and retraining is due — the ANN
  * analog of the st_drift shard monitor, watched continuously in any
  * production vector pipeline.
  */
object EmbedStream {

  /** Streaming-source schema for the embeddings fixture parquet. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** STREAM-LEGAL nearest-cell assignment: a per-row fold over the literal
    * centroid table (K entries — model-sized, shipped in the plan like any
    * broadcast model). The batch path's row_number window
    * (Similarity.nearest) is illegal on a stream; this fold computes the
    * same answer — `round(cos, 6)` maximized, ties to the LOWEST cid —
    * because centroids fold in ascending-cid order and only a strictly
    * greater cosine replaces the running best (EmbedStreamSpec pins the
    * tie case and stream≡batch on the fixture). */
  def cellExpr(s: SparkSession, cents: Seq[(Int, Seq[Double])], v: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    val centsLit = typedLit(cents.sortBy(_._1))
    val init = struct(lit(-2.0).as("best"), lit(-1).as("cid"))
    aggregate(centsLit, init, (acc, c) => {
      val c6 = round(call_function("cosine_sim", c.getField("_2"), v), 6)
      when(c6 > acc.getField("best"),
        struct(c6.as("best"), c.getField("_1").as("cid"))).otherwise(acc)
    }).getField("cid")
  }

  /** Arriving-vector cell counts as an incremental stream over a directory
    * of arriving embedding files: narrow nearest-cell map + ONE aggregation
    * over K cell keys (state O(K), not O(vectors)); complete-mode memory
    * sink, AvailableNow. */
  def runCellCountStream(spark: SparkSession, embDir: String,
      cents: Seq[(Int, Seq[Double])],
      queryName: String = "embed_cell_counts"): DataFrame = {
    val q = spark.readStream.schema(embSchema).parquet(embDir)
      .withColumn("cell",
        cellExpr(spark, cents, col("embedding").cast("array<double>")))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_new"))
      .writeStream.outputMode("complete").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName).orderBy("cell")
  }

  /** Registered batch variant (the st_* convention: batch semantics under
    * the oracle, stream ≡ batch pinned by EmbedStreamSpec). Fixture split:
    * vec_id % 5 ≠ 0 is the indexed corpus, % 5 = 0 the arriving traffic;
    * BOTH sides read the persisted cell-assignment artifact (one narrow
    * probe each — the index is never retrained), then per-cell shares and
    * the absolute drift are exact integer permilles. */
  val defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef(
      "st_cell_drift",
      (s, d) => {
        val asg = graft.sim.Similarity.assignCells(s, d)
          .select(col("vec_id"), col("cell"))
        val idx = asg.filter(expr("vec_id % 5 <> 0"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n_index"))
        val nw = asg.filter(expr("vec_id % 5 = 0"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n_new"))
        val joined = idx.join(nw, Seq("cell"), "full_outer")
          .na.fill(0L, Seq("n_index", "n_new"))
        val tot = joined.agg(sum(col("n_index")).as("tot_index"),
          sum(col("n_new")).as("tot_new"))
        joined.crossJoin(broadcast(tot))
          .withColumn("index_permille", expr("(1000 * n_index) div tot_index"))
          .withColumn("new_permille", expr("(1000 * n_new) div tot_new"))
          .withColumn("drift_permille", expr("abs(new_permille - index_permille)"))
          .select(col("cell"), col("n_index"), col("n_new"),
            col("index_permille"), col("new_permille"), col("drift_permille"))
          .orderBy("cell")
      },
      Some(s"""WITH ${graft.sim.Similarity.duckKmeansChain()},
              |idx AS (SELECT cell, COUNT(*) AS n_index FROM assign
              |        WHERE vec_id % 5 <> 0 GROUP BY cell),
              |nw AS (SELECT cell, COUNT(*) AS n_new FROM assign
              |       WHERE vec_id % 5 = 0 GROUP BY cell),
              |j AS (SELECT coalesce(i.cell, w.cell) AS cell,
              |             coalesce(i.n_index, 0) AS n_index,
              |             coalesce(w.n_new, 0) AS n_new
              |      FROM idx i FULL OUTER JOIN nw w ON i.cell = w.cell),
              |tot AS (SELECT CAST(SUM(n_index) AS BIGINT) AS tot_index,
              |               CAST(SUM(n_new) AS BIGINT) AS tot_new FROM j)
              |SELECT cell, n_index, n_new,
              |       (1000 * n_index) // tot_index AS index_permille,
              |       (1000 * n_new) // tot_new AS new_permille,
              |       abs((1000 * n_new) // tot_new
              |           - (1000 * n_index) // tot_index) AS drift_permille
              |FROM j, tot ORDER BY cell""".stripMargin)))
}
