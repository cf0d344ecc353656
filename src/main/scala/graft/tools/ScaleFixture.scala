package graft.tools

import org.apache.spark.sql.functions._

/** Stage a 10×-replicated copy of the sf0.1 fixture for the pair-family
  * extra-decade measurement (tools/scaling.py): no sf1 fixture ships, so the
  * next decade point is synthesized by replication with DISJOINT content per
  * replica — the shape where true pair output grows exactly 10× (linearly),
  * so any super-linear runtime growth is engine cost, not output mass:
  *
  *  - documents: every token gets a replica prefix (`r3the quick…`), an
  *    injective per-replica token map — intra-replica shingle/gram/simhash
  *    near-dup structure is isomorphic to the original, cross-replica
  *    overlap is zero by construction.
  *  - part: `p_size += 100·r`. Both fuzzy-join passes block on p_size, so
  *    blocks are replica-disjoint while names/brands (and the name-prefix-12
  *    block structure) stay bit-identical per replica.
  *  - embeddings: each replica's vectors are component-ROTATED by r —
  *    intra-replica dot products (and thus the RP-LSH bucket structure) are
  *    exactly preserved, cross-replica similarity decorrelates.
  *  - lineitem / events (round 12, for the NON-pair decade point —
  *    an_percentile/agg_rollup/json_extract): plain 10× replication with
  *    id shifts. Group keys (l_returnflag/l_linestatus) stay identical, so
  *    per-group value mass grows 10× — exactly the axis the exact
  *    percentile's group-buffer and the rollup's grouping-set expansion
  *    must absorb at scale.
  *
  * Ids shift by r·10⁷ per replica. Idempotent via a versioned `_STAGED`
  * marker (content bump restages when the table set grows). */
object ScaleFixture {
  val Replicas = 10
  val IdStride = 10000000L
  val MarkerVersion = "staged-v2"

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1x")
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val marker = new java.io.File(out, "_STAGED")
    if (marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim == MarkerVersion) {
      println(s"[scalefixture] $out already staged")
      return
    }
    val s = graft.Sessions.local("32")
    def replicated(table: String) =
      s.read.parquet(s"$src/$table.parquet")
        .select(col("*"), explode(expr(s"sequence(0, ${Replicas - 1})")).as("r"))

    replicated("documents")
      .withColumn("doc_id", col("doc_id") + col("r") * IdStride)
      .withColumn("text", expr(
        "array_join(transform(split(trim(text), ' +'), " +
          "t -> concat('r', CAST(r AS STRING), t)), ' ')"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    replicated("part")
      .withColumn("p_partkey", col("p_partkey") + col("r") * IdStride)
      .withColumn("p_size", col("p_size") + col("r") * 100)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    replicated("embeddings")
      .withColumn("vec_id", col("vec_id") + col("r") * IdStride)
      .withColumn("embedding", expr(
        "concat(slice(embedding, r + 1, size(embedding) - r), " +
          "slice(embedding, 1, r))"))
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    replicated("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * IdStride)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    replicated("events")
      .withColumn("event_id", col("event_id") + col("r") * IdStride)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    Seq("documents", "part", "embeddings", "lineitem", "events").foreach { t =>
      println(s"[scalefixture] $t rows = ${s.read.parquet(s"$out/$t.parquet").count()}")
    }
    java.nio.file.Files.write(marker.toPath, (MarkerVersion + "\n").getBytes("UTF-8"))
    s.stop()
  }
}
