package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deduplication operators over `documents` / `embeddings` (BASELINE
  * north-star "dedup"): exact, MinHash-LSH, n-gram Jaccard, SimHash, and
  * embedding-cosine near-dup.
  *
  * Design for the 100 TB case:
  *  - Exact dedup is a fingerprint group-by — one shuffle on the md5 key.
  *  - MinHash-LSH: per-doc signatures are computed with higher-order array
  *    functions (narrow, codegen), then candidates come from a self-join on
  *    (band, band-hash) — the classic band-bucket join. The join key space is
  *    large (md5 of a quarter-signature), so the shuffle distributes well and
  *    no pairwise O(n²) comparison ever happens.
  *  - n-gram Jaccard runs on the inverted shingle index (explode → bucket →
  *    pair-expand → count), again avoiding the quadratic cross product;
  *    buckets above [[MaxBucket]] (stop-shingles / hot bands) are dropped
  *    from candidate generation, bounding the per-key expansion.
  *  - SimHash reduces each doc to a compact code; near-dup candidates come
  *    from multi-band LSH (4 bands x 15 bits of a 60-bit code) plus a
  *    Hamming-distance filter (`bit_count(xor)`), never all-pairs.
  *  - The MinHash function family is `md5(seed:shingle)` with *string* min:
  *    lexicographic min of a uniform hash is a valid min-wise hash and is
  *    bit-reproducible in any engine with md5 (the oracle requirement).
  */
object Dedup {

  private val toks = "split(trim(text), ' +')"

  /** MinHash-LSH shape: 64 hashes in 16 bands of 4. P(pair becomes a
    * candidate) = 1-(1-j⁴)¹⁶ — ≥0.8-Jaccard pairs are caught with
    * probability ~0.9996; extra bands cost only integer mins. */
  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand = 4

  /** Distinct word 3-gram shingles, one row per (doc_id, shingle).
    *
    * Row-form on purpose: posexplode + lead() keeps the whole pipeline in
    * whole-stage codegen. The array-HOF formulation (transform/element_at/
    * array_distinct) is interpreted and measured ~1.7 ms/doc — it dominated
    * the dedup queries. The window shuffle partitions by doc_id, which is
    * exactly how it distributes at scale. */
  private[graft] def shingleRows(s: SparkSession, d: String): DataFrame =
    shingleRowsOf(Tables.documents(s, d))

  /** [[shingleRows]] over an arbitrary (doc_id, text) frame — the
    * frame-parameterized form for callers that shingle a SUBSET (the
    * corpus pipeline's eval dictionary shingles only the eval source;
    * the monolithic form forced a full-corpus shingle pass that a
    * doc_id join then threw away, since Catalyst can't push the join
    * below the per-doc window + distinct). */
  private[graft] def shingleRowsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"), posexplode(expr(toks)).as(Seq("pos", "w0")))
      .withColumn("w1", lead(col("w0"), 1).over(w))
      .withColumn("w2", lead(col("w0"), 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("sng"))
      .distinct()
  }

  /** Positional 8-token shingles, one row per (doc_id, pos, gh) — the
    * repeated-substring index grain. Same relational discipline as
    * [[shingleRows]] (posexplode + leads over ONE doc_id window, every md5
    * computed once in codegen), with the token array materialized BEFORE
    * the explode (the winnowedFpRows round-9 lesson: a sibling projection
    * above the Generate re-runs the split per exploded row). Positions are
    * kept (no distinct): the mass numerator counts POSITIONS, so a doc
    * that repeats boilerplate internally weighs each occurrence.
    *
    * Fingerprint width — 48 bits, INTENTIONALLY, the winnowing family's
    * width (TextStats.winnowedFpRows, same md5_prefix48 kernel): the
    * collision budget is the birthday bound ~2^24 ≈ 16 M distinct grams
    * before collisions perturb counts, and each collision inflates ONE
    * gram's repeat count by one posting — a statistical nudge to a
    * mass-permille, never a correctness break (the consumers threshold
    * aggregate mass, they don't assert identity). A corpus whose distinct
    * 8-gram count approaches 2^24 per screened partition should move this
    * one call site to a 64-bit prefix (conv of 16 hex chars caps at
    * Long.MaxValue); the shuffle key widens, nothing else changes. */
  private def gram8Rows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 8"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "w0")))
      .withColumn("g8", concat_ws(" ",
        col("w0") +: (1 to 7).map(i => lead(col("w0"), i).over(w)): _*))
      .withColumn("w7", lead(col("w0"), 7).over(w))
      .filter(col("w7").isNotNull)
      .select(col("doc_id"), col("pos"),
        expr("md5_prefix48(g8)").as("gh"))
  }

  /** Bucket-size cap for candidate generation. A stop-shingle or hot band
    * otherwise collects one huge doc list whose pair expansion is quadratic
    * — the 100 TB killer. A key shared by more than this many docs carries
    * no near-dup signal, so such buckets are dropped from pair generation
    * (standard stop-shingle removal). EVERY bucketed candidate generator's
    * oracle mirrors the cap with a `keep … HAVING COUNT(*) <= cap` CTE, so
    * both engines always state the same semantics (at sf0.1 the cap FIRES
    * for simhash band buckets — one holds 1,371 docs — and stays dormant for
    * shingle buckets, max 25 docs; either way the engines agree by
    * construction). The adversarial case is covered by DedupSpec's
    * hot-shingle property. */
  val MaxBucket = 1000

  /** `dd_line_dedup` span width (tokens per pseudo-line). Small enough that
    * the fixture's ~40-word vocabulary produces real cross-document span
    * collisions (3 tokens ≈ 6.4e4 combinations vs ~2e4 spans at sf0.01),
    * which is the boilerplate-repeat regime the operator exists for. */
  val LineTok = 3

  /** Width of the `pos` field in the packed line-keeper key (2^20 — spans
    * per doc, i.e. docs under ~3M tokens at [[LineTok]]=3). */
  private val LinePosW = 1048576L

  /** Largest doc_id the packed key can carry without overflowing a BIGINT
    * (doc_id * [[LinePosW]] + pos ≤ Long.MaxValue for pos < LinePosW). */
  private val LineMaxDoc = Long.MaxValue / LinePosW

  /** The packed line-keeper key `doc_id * 2^20 + pos`: min over ONE scalar
    * BIGINT hash-aggregates with map-side combine (a struct min forces
    * SortAggregate + per-task sorts — PlanShapeSpec pins the aggregate
    * shape), and ordering matches (doc_id, pos) lexicographic while the
    * fields are in range. The width contract is ENFORCED, not just stated:
    * an out-of-range row (pos ≥ 2^20, i.e. a ≥3M-token doc, or doc_id ≥
    * 2^43) raises loudly instead of silently bleeding its keepers into the
    * neighboring doc_id's key range — at 100 TB a silent mis-attribution
    * would corrupt removal counts with no error anywhere downstream. The
    * guard is three integer compares per span row inside codegen. */
  private val packedLineKey: String =
    s"""CASE WHEN pos >= 0 AND pos < $LinePosW
       |          AND doc_id >= 0 AND doc_id < $LineMaxDoc
       |     THEN doc_id * $LinePosW + pos
       |     ELSE raise_error(concat('packed line key out of range: doc_id=',
       |            CAST(doc_id AS STRING), ' pos=', CAST(pos AS STRING))) END"""
      .stripMargin.replace('\n', ' ')

  /** Decode the doc side of [[packedLineKey]]. */
  private val packedLineDoc: String = s"kp div $LinePosW"

  /** Span rows `(doc_id, pos, line)` — the [[LineTok]]-token consecutive
    * non-overlapping pseudo-line stream the whole line-dedup family shares
    * (dd_line_dedup, dd_line_dedup_apply, dd_dedup_funnel's line stage).
    * Expects `doc_id`, token array `t`, and span count `nl`; the partial
    * tail span is outside the line model on both engines. */
  private def lineSpans(docs: DataFrame): DataFrame =
    docs.filter(col("nl") >= 1)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, CAST(nl AS INT) - 1), " +
          s"i -> array_join(slice(t, i * $LineTok + 1, $LineTok), ' '))"))
          .as(Seq("pos", "line")))

  /** Global first-occurrence keeper per distinct line — `(line, kp)` where
    * kp is the min [[packedLineKey]]. ONE map-combinable aggregation: the
    * million-copy cookie banner collapses to one partial per task, never
    * one partition (the window form would sort every copy in one place). */
  private def lineKeepers(lines: DataFrame): DataFrame =
    lines.groupBy(col("line")).agg(min(expr(packedLineKey)).as("kp"))

  /** Expand each bucket's sorted element list `ds` into its (x, y) element
    * pairs (x before y in sort order) — the shared tail of EVERY bucketed
    * candidate generator in the engine (shingle/minhash/simhash buckets
    * here, hyperplane-LSH code buckets in graft.sim, fuzzy-join blocks in
    * graft.ops), with the `cap` filter bounding the quadratic per-bucket
    * expansion in ONE audited place. Elements may be scalars or structs;
    * the result is `p.x` / `p.y` of the element type, with the bucket
    * frame's OTHER columns (e.g. the bucket key) carried through so a
    * consumer that needs them (dd_embed_cosine's `cell`) doesn't join
    * back. */
  def cappedElementPairs(buckets: DataFrame, cap: Int = MaxBucket): DataFrame =
    buckets
      .filter(size(col("ds")) <= cap)
      .withColumn("p", explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS x, y AS y))))")))
      .drop("ds")

  /** Scalar-id convenience over [[cappedElementPairs]]: (doc_a, doc_b).
    * No production caller remains since jaccardPairs moved onto
    * [[bucketedIdPairs]] (the full skeleton, whose capped collect bounds
    * buckets before any list exists); retained for DedupSpec's direct cap
    * property over a hand-built bucket frame. */
  private[graft] def bucketPairs(buckets: DataFrame, cap: Int = MaxBucket): DataFrame =
    cappedElementPairs(buckets, cap)
      .select(col("p.x").as("doc_a"), col("p.y").as("doc_b"))

  /** The FULL postings→pairs skeleton (VERDICT r13 #7): invert a postings
    * frame by `keys` into sorted per-bucket element lists, drop hot buckets
    * over [[MaxBucket]], expand per-bucket element pairs — the shape every
    * bucketed candidate generator repeats (shingle/minhash/simhash/winnow/
    * frame/cell buckets here, pHash bands in graft.mm, hyperplane-LSH codes
    * in graft.sim, fuzzy-join blocks in graft.ops). `elem` may be a scalar
    * id or a struct carrying a payload (codes/vectors ride the bucket rows
    * so the verify step needs no join back); result is the key columns plus
    * `p.x` / `p.y` of the element type.
    *
    * The cap is enforced INSIDE the collect, in one pass: the native
    * [[graft.functions.CollectSortedCapped collect_sorted_capped]]
    * aggregate keeps at most cap+1 elements per partial buffer and
    * replaces an over-cap bucket's list with a sticky overflow flag (the
    * bucket evals to NULL, filtered here), so no buffer anywhere ever
    * holds an over-cap bucket. Without the bound, a stop-shingle shared
    * by ~100M docs would materialize one ~GB array row just to be
    * discarded by the size filter — the 100 TB OOM the cap exists to
    * prevent. This replaced the round-14/15 two-pass form (map-combined
    * counting pass → broadcast hot-key left-anti → collect_list), which
    * had the same memory bound but computed the postings subplan twice
    * and probed an anti-join per row — measured at sf0.1 over the
    * six-query pair family: 6.9s two-pass vs 5.7s one-pass
    * (dd_winnow_pairs −35%), identical oracle results by construction
    * (a bucket is dropped iff its true non-null element count exceeds
    * the cap — CollectCappedSpec pins equivalence bucket-by-bucket).
    * The size filter in [[cappedElementPairs]] stays as a defensive
    * second statement of the cap. NULL-keyed postings are DROPPED: a
    * null blocking key carries no co-occurrence signal, every oracle's
    * equi-join keep-CTE drops them anyway (NULL = NULL is UNKNOWN in
    * SQL), and without the filter Spark would pair the null bucket the
    * oracle never sees (latent today — derived keys are md5/xxhash of
    * non-null input — but a nullable key like jn_fuzzy's p_brand makes
    * it real). `keys` must be NAMED columns (`col("bk")` /
    * `expr(..).as("bv")`) — the groupBy and null filter use those
    * names. */
  def bucketedPairs(postings: DataFrame, elem: Column, keys: Column*): DataFrame = {
    graft.functions.GraftFunctions.register(postings.sparkSession)
    val p = postings.select((keys :+ elem.as("__e")): _*)
    val keyNames = p.columns.dropRight(1).toSeq
    val nonNull = p.filter(keyNames.map(col(_).isNotNull).reduce(_ && _))
    cappedElementPairs(
      nonNull.groupBy(keyNames.map(col): _*)
        .agg(expr(s"collect_sorted_capped(__e, $MaxBucket)").as("ds"))
        .filter(col("ds").isNotNull))
  }

  /** [[bucketedPairs]] for plain doc_id elements: (doc_a, doc_b) with
    * doc_a < doc_b (the sorted-bucket order). */
  private[graft] def bucketedIdPairs(postings: DataFrame, keys: Column*): DataFrame =
    bucketedPairs(postings, col("doc_id"), keys: _*)
      .select(col("p.x").as("doc_a"), col("p.y").as("doc_b"))

  /** Per-doc 64-component MinHash signature (columns mh0..mh63).
    *
    * Kirsch-Mitzenmacher family: hash_i(s) = (h1 + i*h2m) mod P derived
    * from ONE md5 per shingle (h1 = hex[1..15], h2m = hex[17..31] mod P)
    * — 64 minhashes for the md5 cost of one, and every operation is
    * plain BIGINT math the oracle reproduces exactly. P = 2^31-1 keeps
    * h1 + 63*h2m < 2^61 (no overflow in either engine).
    *
    * Shaped as explode → partial-aggregated `min` per (doc, seed) → band
    * keys from the grouped rows, NOT as nested array HOFs: the HOF form
    * lets CollapseProject inline the 1280-md5 signature expression into
    * every band-key reference (observed ~80× recompute), while this form
    * computes each md5 once inside codegen and gets map-side combine on
    * the min — the formulation that also scales out (the shuffle key is
    * (doc, seed), perfectly distributed). */
  private def minhashSig(s: SparkSession, d: String): DataFrame = {
    val hs = shingleRows(s, d).select(col("doc_id"), md5(col("sng")).as("m"))
    val hh = hs.select(col("doc_id"),
      expr("CAST(conv(substr(m, 1, 15), 16, 10) AS BIGINT)").as("h1"),
      expr("CAST(conv(substr(m, 17, 15), 16, 10) AS BIGINT) % 2147483647").as("h2m"))
    val minAggs = (0 until NumHashes).map(i =>
      min(expr(s"(h1 + $i * h2m) % 2147483647")).as(s"mh$i"))
    hh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
  }

  /** Band keys for a b-bands × r-rows layout over stored minhash columns
    * mh0..mh{b*r-1} — ONE generator for every layout consumer
    * ([[minhashPairs]] and the dd_band_tuning sweep), so a hash-family or
    * delimiter change can't desynchronize the layouts. */
  private def bandKeyCols(b: Int, r: Int): Seq[Column] =
    (0 until b).map { bi =>
      val cols = (0 until r).map(j => s"mh${bi * r + j}")
      expr(s"md5(concat_ws('|', $bi, ${cols.mkString(", ")}))")
    }

  /** The 64 minhash components as DuckDB select items (`mh0..mh63`),
    * mirroring [[minhashSig]]'s Kirsch-Mitzenmacher family. */
  private val duckMins: String = (0 until NumHashes)
    .map(i => s"MIN((h1 + $i * h2m) % 2147483647) AS mh$i")
    .mkString(",\n          ")

  /** [[bandKeyCols]]'s DuckDB twin: the band-key md5 list for a b×r
    * layout, for use inside `unnest([...])`. */
  private def duckBandList(b: Int, r: Int): String =
    (0 until b).map { bi =>
      val cols = (0 until r).map(j => s"mh${bi * r + j}").mkString(", ")
      s"md5(concat_ws('|', $bi, $cols))"
    }.mkString(",\n            ")

  /** DuckDB CTE chain `hs/hh/sig` deriving the 64-component signature
    * table from a `(doc_id, sng)` relation `src` — stated ONCE for the
    * three minhash oracles (lsh, quality, band tuning), which previously
    * hand-copied it; a hash-family change now edits one definition on each
    * side. Pre-stripped: embed anywhere inside an outer stripMargin
    * string. */
  private def duckSigChain(src: String): String =
    s"""hs AS (SELECT doc_id, md5(sng) AS m FROM $src),
       |hh AS (SELECT doc_id, CAST(('0x' || substr(m, 1, 15)) AS BIGINT) AS h1,
       |              CAST(('0x' || substr(m, 17, 15)) AS BIGINT) % 2147483647 AS h2m
       |       FROM hs),
       |sig AS (SELECT doc_id,
       |          $duckMins
       |        FROM hh GROUP BY doc_id)""".stripMargin

  /** [[minhashSig]] as a parquet artifact, built once per corpus CONTENT
    * (the winnowFpIndexPath / k-means-model discipline: a signature table
    * is an INDEX, not per-query cost). Every consumer — band expansion,
    * and the quality eval's two signature joins — probes the stored table
    * instead of re-deriving 64 minhashes from the shingle stream; at scale
    * this is the difference between one signature build per corpus and one
    * per query. Keyed by [[graft.Artifacts]] content signature, so an
    * in-place dataset rewrite forces a rebuild instead of serving stale
    * signatures. */
  private def minhashSigStored(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "mh_sig", d, "documents")(minhashSig(s, d))

  /** MinHash-LSH candidate pairs from [[minhashSig]]: 16 bands × 4 rows,
    * capped band buckets, deduped across bands. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val sig = minhashSigStored(s, d)
    val bands = sig.select(col("doc_id"),
      explode(array(bandKeyCols(NumBands, RowsPerBand): _*)).as("bk"))
    bucketedIdPairs(bands, col("bk")).distinct()
  }

  /** Per-doc 32-bit SimHash: for each bit j, majority vote of distinct-token
    * hash bits (+1/-1), ties resolve to 1 (`>= 0`). One narrow pass via the
    * native simhash32 expression (graft.functions.SimHash32) — the exploded
    * tokens×32-bits formulation costs two wide shuffles and is kept only as
    * the DuckDB oracle. Registration comes from GraftExtensions (Sessions);
    * the explicit register() covers foreign sessions. */
  private def simhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr(s"simhash32(array_distinct($toks))").as("simhash"))
  }

  private val duckSimhash =
    """sims AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j)
      |                              ELSE 0 END) AS BIGINT) AS simhash
      |  FROM (
      |    SELECT doc_id, j,
      |           SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |    FROM (
      |      SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS h
      |      FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), ' +'))) AS t
      |            FROM documents)),
      |         (SELECT unnest(range(0, 32)) AS j)
      |    GROUP BY doc_id, j)
      |  GROUP BY doc_id)""".stripMargin

  /** 60-bit SimHash codes via the native simhash60 expression (15 md5 hex
    * chars per token hash — the width that supports 15-bit LSH bands). */
  private def simhash60(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr(s"simhash60(array_distinct($toks))").as("simhash"))
  }

  /** [[simhash60]] as a parquet artifact, built once per corpus CONTENT —
    * the [[minhashSigStored]] discipline applied to the suite's slowest
    * query: the 60-bit code table is a per-corpus INDEX (one narrow pass
    * over the text), and the banded pair expansion should probe the stored
    * codes, not re-tokenize + re-hash the corpus on every run. */
  private def simhash60Stored(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "simhash60", d, "documents")(simhash60(s, d))

  /** The SimHash near-dup pair graph (banded candidates, Hamming ≤ 10) as a
    * parquet artifact built FROM the stored code table — the [[jaccardPairs]]
    * discipline applied to the Hamming family: the expansion's pair mass is
    * the expensive part (sum of kept-bucket sizes squared), it is a pure
    * function of the corpus snapshot, and every consumer should probe the
    * materialized graph rather than re-expand buckets per query. */
  private def simhashPairGraph(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "simhash_pairs", d, "documents") {
      val sh = simhash60Stored(s, d)
      val bandKeys = (0 until SimBands).map(b =>
        struct(lit(b).as("bi"),
          expr(s"shiftright(simhash, ${b * SimBandBits}) & $SimBandMask").as("bv")))
      val bands = sh
        .select(col("doc_id"), col("simhash"), explode(array(bandKeys: _*)).as("bk"))
      bucketedPairs(bands, struct(col("doc_id"), col("simhash")), col("bk"))
        .select(col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"),
          expr("CAST(bit_count(p.x.simhash ^ p.y.simhash) AS INTEGER)").as("hamming"))
        .filter(col("hamming") <= 10)
        .distinct()
    }

  /** Multi-band LSH shape over the 60-bit code: 4 bands x 15 bits. */
  val SimBands = 4
  val SimBandBits = 15
  private val SimBandMask = (1 << SimBandBits) - 1

  private val duckSimhash60 =
    """sims AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j)
      |                              ELSE 0 END) AS BIGINT) AS simhash
      |  FROM (
      |    SELECT doc_id, j,
      |           SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |    FROM (
      |      SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
      |      FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), ' +'))) AS t
      |            FROM documents)),
      |         (SELECT unnest(range(0, 60)) AS j)
      |    GROUP BY doc_id, j)
      |  GROUP BY doc_id)""".stripMargin

  /** Inverted-index Jaccard pairs ≥ `permille`: candidate intersections
    * come from [[bucketedIdPairs]] over xxhash64(shingle) postings (the
    * audited invert → capped-collect → expand skeleton), and the
    * per-doc distinct-shingle counts `n` are a direct aggregation of the
    * SAME postings — uncapped on purpose: dropping hot shingles bounds
    * pair generation but must not shrink a doc's denominator. The
    * expensive scan → posexplode → window → distinct shingle subtree is
    * identical under both consumers (n and the capped bucket build), so
    * Catalyst's ReuseExchange computes the distinct exchange once and the
    * second pass is a shuffle re-read, not a corpus re-scan. */
  /** DuckDB CTE chain mirroring [[jaccardPairs]], ending in `jac(doc_a,
    * doc_b, jaccard_permille)`. The `keep` CTE states the [[MaxBucket]] cap
    * the Spark side applies in [[bucketedPairs]]' capped collect: hot
    * shingles are dropped from candidate generation in BOTH engines
    * (per-doc counts `n` stay uncapped on both sides — dropping a hot
    * shingle bounds pair mass, never a doc's denominator). Fixture shingle
    * buckets stay far under the cap today, but the semantics must agree by
    * construction, not by fixture luck. */
  private val duckInterChain: String =
    s"""toksq AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i ->
       |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingles FROM toksq),
       |n AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(shingles) AS sng FROM sh),
       |keep AS (SELECT sng FROM ex GROUP BY sng HAVING COUNT(*) <= $MaxBucket),
       |inter AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, COUNT(*) AS i
       |          FROM ex a JOIN keep k ON a.sng = k.sng
       |               JOIN ex c ON a.sng = c.sng AND a.doc_id < c.doc_id
       |          GROUP BY 1, 2)""".stripMargin

  private def duckJaccard(permille: Int): String =
    s"""$duckInterChain,
       |jac AS (SELECT doc_a, doc_b, (1000 * i) // (na.n + nb.n - i) AS jaccard_permille
       |        FROM inter JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |        WHERE (1000 * i) // (na.n + nb.n - i) >= $permille)""".stripMargin

  /** Truncate lineage between label-propagation rounds. With a configured
    * checkpoint dir this is a RELIABLE checkpoint (blocks on the cluster
    * store, survives executor loss — required for the iterative loop on a
    * real cluster, where one lost executor would otherwise invalidate an
    * unrecoverable lineage chain); without one it falls back to
    * executor-local blocks, the right trade in local mode.
    *
    * Lifecycle: each round REASSIGNS `labels`, dropping the only reference
    * to the previous round's checkpoint, so intermediate rounds don't pin
    * storage for the life of the session — local blocks are unpersisted by
    * the ContextCleaner on GC, and reliable checkpoint FILES are deleted
    * the same way because graft.Sessions sets
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (without it,
    * a 10-round CC would strand ~12 pair-graph-sized snapshots per
    * invocation on the cluster store). Only the returned labels frame's
    * checkpoint outlives the loop. */
  private def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Distributed connected components by min-label propagation WITH pointer
    * doubling: each round every node takes the min label among itself, its
    * neighbors, and the label OF its current label (the doubling step —
    * chains collapse in O(log diameter) rounds where a pure neighbor-min
    * walk needs one round per hop). Each round is two joins + one groupBy
    * over checkpointed frames ([[ckpt]]: RELIABLE when a checkpoint dir is
    * configured — how GraphX/GraphFrames' CC survives executor loss); the
    * convergence count reads the materialized step frame, costing no extra
    * shuffle. Returns (labels, rounds): every node of `pairs`, labeled by
    * the min node id of its component.
    *
    * Stats-compounding note: checkpoint snapshots the round's estimated
    * sizeInBytes into the next round's LogicalRDD, and Catalyst's default
    * join-stats estimate is the PRODUCT of child sizes — so the estimate's
    * BigInt digit count roughly doubles per round here (two labels-derived
    * join inputs). That exact mechanism made the BPE training loop's
    * driver time explode at depth (TextStats.bpeMergesUncached, fixed by
    * removing its self-joins); THIS loop is safe because pointer doubling
    * converges in O(log diameter) rounds and bucket caps bound component
    * diameter — ≤ ~10 rounds ⇒ ~2^10·20 digits, microseconds of stats
    * arithmetic. If the loop shape ever changes to one round per hop,
    * re-audit. */
  private[dedup] def connectedComponents(pairs: DataFrame): (DataFrame, Int) = {
    val p = ckpt(pairs)
    val sym = p.unionAll(p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = ckpt(sym.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")))
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      val nbrMin = sym.join(labels, sym("doc_b") === labels("doc_id"))
        .groupBy(sym("doc_a").as("nbr_key")).agg(min(col("cluster_id")).as("nbr_min"))
      val hop = labels.select(col("doc_id").as("hop_key"), col("cluster_id").as("hop_min"))
      val step = ckpt(labels
        .join(nbrMin, labels("doc_id") === nbrMin("nbr_key"), "left_outer")
        .join(hop, labels("cluster_id") === hop("hop_key"), "left_outer")
        .select(labels("doc_id"), labels("cluster_id").as("old"),
          least(labels("cluster_id"),
            least(coalesce(col("nbr_min"), labels("cluster_id")),
              coalesce(col("hop_min"), labels("cluster_id")))).as("cluster_id")))
      converged = step.filter(col("cluster_id") < col("old")).count() == 0
      labels = step.select(col("doc_id"), col("cluster_id"))
    }
    (labels, rounds)
  }

  /** The near-dup pair graph (all co-shingle pairs with their exact
    * Jaccard) as a parquet artifact, built once per corpus CONTENT — the
    * same index discipline as [[winnowFpIndexPath]] and
    * [[minhashSigStored]]. Six queries consume this graph at different
    * thresholds (clean, cluster, matrix, manifest, eval, the ngram query
    * itself); in production it is built per corpus snapshot and probed,
    * not re-derived from the shingle stream per consumer. */
  private[graft] def jaccardPairs(s: SparkSession, d: String, permille: Int): DataFrame =
    graft.Artifacts.indexParquet(s, "jac_pairs", d, "documents")(
      jaccardPairsUncached(s, d))
      .filter(col("jaccard_permille") >= permille)

  /** Same-cell cosine pairs `(cell, vec_a, vec_b, cos6)` with vec_a <
    * vec_b — the shared candidate+verify stage of [[defs dd_embed_cosine]]
    * and [[defs dd_semantic_dedup]], routed through [[bucketedPairs]] so
    * IVF-cell blocking gets the same audited hot-bucket discipline as
    * every other candidate generator (previously each query hand-rolled
    * the cell-keyed self-join with NO cap, so one degenerate cell — a
    * collapsed centroid, an all-zeros embedding cluster — went quadratic).
    * Trained cells are ~√N ≈ far under [[MaxBucket]] at fixture scales, so
    * the cap is dormant and both engines agree by construction (the
    * oracles state the same HAVING cap). Vectors ride the bucket rows as
    * struct elements, so cosine verification needs no join back to the
    * embedding table.
    *
    * Persisted as a content-keyed parquet artifact (the jac_pairs /
    * simhash_pairs discipline): the pair graph is built once per corpus
    * CONTENT and both consumers probe the stored graph — unthresholded
    * (all same-cell pairs with their cos6), so a threshold change is a
    * stored-column filter, not a rebuild. */
  private def cellCosPairs(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.indexParquet(s, "cell_cos_pairs", d, "embeddings")(
      cellCosPairsUncached(s, d))

  private def cellCosPairsUncached(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val asg = graft.sim.Similarity.assignCells(s, d)
      .select(col("vec_id"), col("cell"))
    bucketedPairs(e.join(asg, "vec_id"), struct(col("vec_id"), col("v")), col("cell"))
      .select(col("cell"),
        col("p.x.vec_id").as("vec_a"), col("p.y.vec_id").as("vec_b"),
        expr("round(cosine_sim(p.x.v, p.y.v), 6)").as("cos6"))
  }

  /** The [[MaxBucket]] cap over trained cells as a DuckDB CTE — the oracle
    * mirror of [[cellCosPairs]]'s hot-bucket drop (assumes `ev`
    * (vec_id, v, cell) in scope). */
  private def duckCellKeep: String =
    s"keepc AS (SELECT cell FROM ev GROUP BY cell HAVING COUNT(*) <= $MaxBucket)"

  private[dedup] def jaccardPairsUncached(s: SparkSession, d: String): DataFrame = {
    val postings = shingleRows(s, d)
      // xxhash64(shingle): an 8-byte shuffle key instead of a ~20-byte
      // string (collisions ~2^-64 per pair, perturbing one count at most)
      .select(xxhash64(col("sng")).as("sk"), col("doc_id"))
    val n = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = bucketedIdPairs(postings, col("sk"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    val na = n.select(col("doc_id").as("doc_a"), col("n").as("na"))
    val nb = n.select(col("doc_id").as("doc_b"), col("n").as("nb"))
    inter.join(na, "doc_a").join(nb, "doc_b")
      .withColumn("jaccard_permille", expr("(1000 * i) div (na + nb - i)"))
  }

  val defs: Seq[QueryDef] = Seq(

    /** Exact dedup: group by normalized-text fingerprint; keeper = min id. */
    QueryDef(
      "dd_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy("fp"),
      Some("""SELECT md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp,
             |       COUNT(*) AS n_docs, MIN(doc_id) AS keeper
             |FROM documents GROUP BY fp ORDER BY fp""".stripMargin)),

    /** Priority-aware canonical selection — the production exact-dedup
      * variant: within each exact-dup group keep the doc from the
      * highest-priority SOURCE (rank = numeric suffix of `source`; lower =
      * more curated), ties by min doc_id. "Curated beats crawl" is how real
      * training pipelines choose the canonical copy; plain min-id keeps
      * whichever copy happened to be ingested first. One window shuffle on
      * the fingerprint (same key as dd_exact — at scale the two share a
      * partitioning). */
    QueryDef(
      "dd_exact_priority",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ranked = Tables.documents(s, d)
          .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), " +", " "))))
          // try_cast + sentinel: a source outside the 'srcN' scheme ranks
          // LAST deterministically in both engines (a plain CAST returns
          // NULL→NULLS FIRST in Spark but ERRORS in DuckDB)
          .withColumn("src_rank",
            expr("coalesce(try_cast(substr(source, 4) AS INT), 2147483647)"))
        val byFp = Window.partitionBy(col("fp"))
        ranked
          .withColumn("rn", row_number().over(byFp.orderBy(col("src_rank"), col("doc_id"))))
          .withColumn("n_docs", count(lit(1)).over(byFp))
          .filter(col("rn") === 1)
          .select(col("fp"), col("doc_id").as("keeper"),
            col("source").as("keeper_source"), col("n_docs"))
          .orderBy("fp")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, source,
             |         md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp,
             |         COALESCE(TRY_CAST(substr(source, 4) AS INT), 2147483647) AS src_rank
             |  FROM documents)
             |SELECT fp, keeper, keeper_source, n_docs FROM (
             |  SELECT fp, doc_id AS keeper, source AS keeper_source,
             |         COUNT(*) OVER (PARTITION BY fp) AS n_docs,
             |         row_number() OVER (PARTITION BY fp ORDER BY src_rank, doc_id) AS rn
             |  FROM r) WHERE rn = 1 ORDER BY fp""".stripMargin)),

    /** MinHash-LSH candidate pairs — see [[minhashPairs]] for the shape. */
      QueryDef(
      "dd_minhash_lsh",
      (s, d) => minhashPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(
        s"""WITH toksq AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i ->
           |         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingles FROM toksq),
           |shq AS (SELECT doc_id, unnest(shingles) AS sng FROM sh),
           |${duckSigChain("shq")},
           |bands AS (SELECT doc_id, unnest([
           |            ${duckBandList(NumBands, RowsPerBand)}]) AS bk FROM sig),
           |keep AS (SELECT bk FROM bands GROUP BY bk HAVING COUNT(*) <= $MaxBucket)
           |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
           |FROM bands a JOIN keep k ON a.bk = k.bk
           |     JOIN bands c ON c.bk = a.bk AND a.doc_id < c.doc_id
           |ORDER BY doc_a, doc_b""".stripMargin)),

    /** Exact n-gram Jaccard over the inverted shingle index; permille via
      * integer division; threshold 200‰. */
    QueryDef(
      "dd_ngram_jaccard",
      (s, d) => jaccardPairs(s, d, permille = 200)
        .select(col("doc_a"), col("doc_b"), col("jaccard_permille"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH ${duckJaccard(200)}
              |SELECT doc_a, doc_b, jaccard_permille FROM jac
              |ORDER BY doc_a, doc_b""".stripMargin)),

    /** N-GRAM CONTAINMENT screen — the ASYMMETRIC companion to Jaccard:
      * C = |A∩B| / min(|A|, |B|), the fraction of the SMALLER doc's
      * shingles found in the other. Jaccard misses the quote/superset
      * case — a short doc fully embedded in a long one scores
      * |A|/(|A|+|B|-|A|) ≈ |A|/|B| (arbitrarily low) on Jaccard but 1000‰
      * on containment — and that case is exactly how boilerplate, quoted
      * passages, and page-plus-chrome crawls survive Jaccard-only dedup in
      * real training corpora (the reason suffix-array/containment screens
      * exist alongside MinHash). `contained_doc` names the swallowed side
      * (the smaller gram set; ties to doc_a), which is the copy a
      * containment-aware cleaner would drop or trim.
      *
      * Cost at 100 TB: ZERO new index work — probes the same persisted
      * pair-graph artifact as the Jaccard family ([[jaccardPairs]] stores
      * i/na/nb per co-shingle pair precisely so every derived coefficient
      * is a column expression over the stored graph, not a new corpus
      * pass), then one integer division per pair. Threshold 500‰. */
    QueryDef(
      "dd_containment",
      (s, d) => jaccardPairs(s, d, permille = 0)
        .withColumn("containment_permille", expr("(1000 * i) div least(na, nb)"))
        .filter(col("containment_permille") >= 500)
        .withColumn("contained_doc", expr("if(na <= nb, doc_a, doc_b)"))
        .select(col("doc_a"), col("doc_b"), col("containment_permille"),
          col("contained_doc"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $duckInterChain,
              |cont AS (SELECT doc_a, doc_b,
              |               (1000 * i) // least(na.n, nb.n) AS containment_permille,
              |               CASE WHEN na.n <= nb.n THEN doc_a ELSE doc_b END AS contained_doc
              |        FROM inter JOIN n na ON na.doc_id = doc_a
              |             JOIN n nb ON nb.doc_id = doc_b)
              |SELECT doc_a, doc_b, containment_permille, contained_doc FROM cont
              |WHERE containment_permille >= 500 ORDER BY doc_a, doc_b""".stripMargin)),

    /** WINNOWED near-dup candidates: the inverted index is built over the
      * tx_winnowing fingerprints instead of the full shingle posting list —
      * ~1/5 the index size (one selected hash per 5-gram window) while the
      * winnowing guarantee still surfaces every pair sharing a run of ≥ 8
      * tokens. Same audited bucket shape as every other candidate
      * generator (capped buckets, sorted pair expansion); pairs must share
      * ≥ 2 selected fingerprints, which drops the single-window accidental
      * collisions. This is the index you ship when the shingle index
      * itself is the storage problem at 100 TB. */
    QueryDef(
      "dd_winnow_pairs",
      (s, d) => {
        val postings = graft.text.TextStats.winnowedFpRows(s, d)
          .select(col("doc_id"), col("fp"))
        bucketedIdPairs(postings, col("fp"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ${graft.text.TextStats.duckWinnowChain},
              |f AS (SELECT doc_id, unnest(fps) AS fp FROM m),
              |keep AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= $MaxBucket),
              |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
              |          FROM f a JOIN keep k ON a.fp = k.fp
              |               JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2)
              |SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
              |ORDER BY doc_a, doc_b""".stripMargin)),

    /** CROSS-SHARD INCREMENTAL dedup — the production 100 TB loop: the
      * already-ingested corpus is represented ONLY by its persisted
      * winnowed-fingerprint index (the artifact [[graft.text.TextStats
      * .winnowedFpRows]] pins; built once per dataset dir and reused, the
      * same artifact discipline as the k-means model), and each NEW batch
      * is screened against that index without touching the old documents.
      * Fixture split: docs with doc_id % 5 ≠ 0 are the indexed corpus,
      * % 5 = 0 the incoming batch (the batch predicate pushes through the
      * fingerprint window to the scan, so only batch docs are tokenized).
      * A batch doc sharing ≥ 2 winnowed fingerprints with the index is a
      * near-dup of the corpus — the dd_winnow_pairs threshold. Unlike pair
      * expansion, probing is LINEAR: the index side is distinct on fp, so a
      * hot fingerprint matches each batch posting once and no bucket cap is
      * needed. At scale the index outweighs the batch by orders of
      * magnitude; the inner probe join lets AQE broadcast the batch side so
      * the index is only streamed, never shuffled (persisting the index
      * bucketed by fp makes even rebuild-free merges co-located). */
    QueryDef(
      "dd_incremental",
      (s, d) => {
        val idx = s.read.parquet(winnowFpIndexPath(s, d))
        val batch = graft.text.TextStats.winnowedFpRows(s, d)
          .filter(expr("doc_id % 5 = 0"))
          .select(col("doc_id"), col("fp"))
        incrementalNearDup(batch, idx)
      },
      Some(s"""WITH ${graft.text.TextStats.duckWinnowChain},
              |f AS (SELECT doc_id, unnest(fps) AS fp FROM m),
              |idx AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 <> 0),
              |newb AS (SELECT doc_id, fp FROM f WHERE doc_id % 5 = 0),
              |hits AS (SELECT n.doc_id, COUNT(*) AS n_fps, COUNT(i.fp) AS n_hits
              |         FROM newb n LEFT JOIN idx i ON n.fp = i.fp GROUP BY 1)
              |SELECT doc_id, CAST(n_fps AS BIGINT) AS n_fps,
              |       CAST(n_hits AS BIGINT) AS n_hits,
              |       CASE WHEN n_hits >= 2 THEN 'dup_corpus' ELSE 'keep' END AS status
              |FROM hits ORDER BY doc_id""".stripMargin)),

    /** REPEATED-SUBSTRING MASS — the signal behind substring-level dedup
      * (repeated long runs across documents are memorization fuel even when
      * whole docs are unique): per doc, the share of its 8-token shingle
      * positions whose shingle occurs in ≥ 2 DISTINCT documents. A full
      * near-dup scores 1000‰; templated boilerplate shows up as a partial
      * mass long before any whole-doc detector fires. Shape at scale: one
      * doc_id window builds the positional 8-gram stream (7 leads, one
      * sort, each md5 computed exactly ONCE — hashes truncated to the
      * 48-bit prefix, 12 hex chars, [[gram8Rows]]'s stated collision
      * budget, to shrink shuffle width), then a single (gh, doc_id) partial
      * aggregation collapses positions to postings and EVERYTHING after
      * runs on the postings frame: the cross-doc df is a gh-window count
      * over it and the per-doc rollup a second aggregation — no probe join,
      * no second pass over the gram stream (the naive index+probe form
      * recomputed the md5 projection on the probe side of its reused
      * exchange). The df side is corpus-derived and corpus-sized, so
      * nothing here is broadcast. */
    QueryDef(
      "dd_substring_mass",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val gd = gram8Rows(s, d)
          .groupBy(col("gh"), col("doc_id")).agg(count(lit(1)).as("npos"))
        gd.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy(col("doc_id"))
          .agg(sum(col("npos")).as("n_grams"),
            sum(when(col("nd") >= 2, col("npos")).otherwise(0L)).as("n_repeated"))
          .withColumn("mass_permille", expr("(1000 * n_repeated) div n_grams"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
             |           FROM documents),
             |g AS (SELECT doc_id, i AS pos,
             |             CAST(('0x' || substr(md5(array_to_string(tk[i+1:i+8], ' ')), 1, 12))
             |                  AS BIGINT) AS gh
             |      FROM t, unnest(range(0, len(tk) - 8 + 1)) AS u(i)
             |      WHERE len(tk) >= 8),
             |rep AS (SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS nd
             |                        FROM g GROUP BY gh) WHERE nd >= 2)
             |SELECT doc_id, COUNT(*) AS n_grams,
             |       CAST(SUM(CASE WHEN r.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_repeated,
             |       (1000 * CAST(SUM(CASE WHEN r.gh IS NOT NULL THEN 1 ELSE 0 END)
             |                    AS BIGINT)) // COUNT(*) AS mass_permille
             |FROM g LEFT JOIN rep r USING (gh)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /** Per-doc 32-bit SimHash code. */
    QueryDef(
      "dd_simhash",
      (s, d) => simhash(s, d).orderBy("doc_id"),
      Some(s"""WITH $duckSimhash
              |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin)),

    /** SimHash near-dup candidates: multi-band LSH over the 60-bit code —
      * 4 bands × 15 bits (32768 buckets per band, the key space an 8-bit
      * single band lacked), candidates unioned across bands, Hamming ≤ 10
      * verify. Buckets are built with the capped-collect skeleton (not a
      * self-join, which would recompute the simhash scan on both sides) and
      * carry (doc_id, simhash) structs so the Hamming verify happens inside
      * the pair expansion with no join back. The query probes the persisted
      * [[simhashPairGraph]] artifact (built once per corpus content from the
      * stored code table). The oracle states the same banded semantics as an
      * OR of band equalities. */
    QueryDef(
      "dd_simhash_pairs",
      (s, d) => simhashPairGraph(s, d).orderBy("doc_a", "doc_b"),
      Some(
        // banded form with the MaxBucket cap mirrored (the cap DOES trigger
        // at sf0.1: one band bucket holds 1371 docs), so both engines drop
        // the same hot buckets before pair expansion
        s"""WITH $duckSimhash60,
           |bands AS (SELECT doc_id, simhash, b.b AS bi,
           |                 (simhash >> ($SimBandBits * b.b)) & $SimBandMask AS bv
           |          FROM sims, (SELECT unnest(range(0, $SimBands)) AS b) b),
           |keep AS (SELECT bi, bv FROM bands GROUP BY bi, bv
           |         HAVING COUNT(*) <= $MaxBucket)
           |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
           |       CAST(bit_count(xor(a.simhash, c.simhash)) AS INTEGER) AS hamming
           |FROM bands a JOIN keep k ON a.bi = k.bi AND a.bv = k.bv
           |     JOIN bands c ON c.bi = a.bi AND c.bv = a.bv AND a.doc_id < c.doc_id
           |WHERE bit_count(xor(a.simhash, c.simhash)) <= 10
           |ORDER BY doc_a, doc_b""".stripMargin)),

    /** End-to-end corpus cleaning — the composite an LLM-data pipeline
      * actually runs: quality gate (token count + stopword ratio) →
      * exact-dup removal (keep min doc_id per fingerprint) → near-dup
      * removal (drop the higher id of every ≥0.5-Jaccard pair, greedy by
      * id). Each stage is one of the verified operators above; composed
      * they stay three shuffles end to end, and the shared jaccardPairs
      * scaffolding keeps the shingle subtree to ONE computation. */
    QueryDef(
      "dd_clean_corpus",
      (s, d) => cleanCorpusKeepers(s, d).orderBy("doc_id"),
      Some(s"""WITH q AS (
              |  SELECT doc_id, md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
              |  FROM documents
              |  WHERE len(string_split_regex(trim(text), ' +')) BETWEEN 10 AND 1000
              |    AND (100 * len(list_filter(string_split_regex(trim(text), ' +'),
              |                               t -> t IN ('the', 'a', 'of', 'and', 'to'))))
              |        // len(string_split_regex(trim(text), ' +')) < 40),
              |keepers AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY fp),
              |${duckJaccard(500)},
              |losers AS (SELECT DISTINCT doc_b AS doc_id FROM jac)
              |SELECT doc_id FROM keepers
              |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
              |ORDER BY doc_id""".stripMargin)),

    /** CROSS-SOURCE DUPLICATION MATRIX — which sources duplicate each
      * other: the ≥ 0.5-Jaccard near-dup pairs rolled up to unordered
      * (source, source) cells. This is the data-sourcing report behind
      * "drop crawl X, it's 80% a copy of crawl Y" decisions. The pair list
      * is orders of magnitude smaller than the corpus, so the two
      * source-lookup joins shuffle pair-sized data against the (doc_id,
      * source) projection; least/greatest canonicalizes the cell before the
      * final handful-of-keys aggregation. */
    QueryDef(
      "dd_dup_matrix",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
        jaccardPairs(s, d, permille = 500)
          .select(col("doc_a"), col("doc_b"))
          .join(src.toDF("doc_a", "src_a"), Seq("doc_a"))
          .join(src.toDF("doc_b", "src_b"), Seq("doc_b"))
          .select(least(col("src_a"), col("src_b")).as("src_lo"),
            greatest(col("src_a"), col("src_b")).as("src_hi"))
          .groupBy(col("src_lo"), col("src_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_lo", "src_hi")
      },
      Some(s"""WITH ${duckJaccard(500)}
              |SELECT least(a.source, b.source) AS src_lo,
              |       greatest(a.source, b.source) AS src_hi,
              |       COUNT(*) AS n_pairs
              |FROM jac j JOIN documents a ON j.doc_a = a.doc_id
              |           JOIN documents b ON j.doc_b = b.doc_id
              |GROUP BY 1, 2 ORDER BY src_lo, src_hi""".stripMargin)),

    /** TRAINING-SHARD MANIFEST — the full corpus-to-shards pipeline as ONE
      * declarative plan: clean (quality gate → exact-dedup canonical →
      * near-dup drop, the dd_clean_corpus stages) → deterministic md5
      * train/val/test split (the an_train_split recipe) → per (split,
      * source) packing accounting at the tx_pack_sequences window size.
      * This is the nightly job's output contract: how many docs, tokens,
      * and 256-token packed sequences each shard cell ships. Composing
      * verified operators keeps every stage's scale shape (the jaccard
      * subtree still computes once; the split adds NO shuffle — it rides
      * the final (split, source) aggregation); n_sequences is the
      * concat-and-cut ceil-div on the aggregated token total, exact
      * integer arithmetic in both engines. */
    QueryDef(
      "dd_shard_manifest",
      (s, d) => {
        val kept = cleanCorpusKeepers(s, d)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), expr(s"size($toks)").as("n_tokens"))
          .join(kept, Seq("doc_id"), "left_semi")
          .withColumn("bucket",
            expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"))
          .withColumn("split",
            expr("CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END"))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"))
          .withColumn("n_sequences", expr("(n_tokens + 255) div 256"))
          .orderBy("split", "source")
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
              |  FROM documents
              |  WHERE len(string_split_regex(trim(text), ' +')) BETWEEN 10 AND 1000
              |    AND (100 * len(list_filter(string_split_regex(trim(text), ' +'),
              |                               t -> t IN ('the', 'a', 'of', 'and', 'to'))))
              |        // len(string_split_regex(trim(text), ' +')) < 40),
              |keepers AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY fp),
              |${duckJaccard(500)},
              |losers AS (SELECT DISTINCT doc_b AS doc_id FROM jac),
              |kept AS (SELECT doc_id FROM keepers
              |         WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
              |rows_ AS (
              |  SELECT d.source,
              |         len(string_split_regex(trim(d.text), ' +')) AS n_tokens,
              |         CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
              |                        AS BIGINT) % 100 < 80 THEN 'train'
              |              WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
              |                        AS BIGINT) % 100 < 90 THEN 'val'
              |              ELSE 'test' END AS split
              |  FROM documents d JOIN kept k USING (doc_id))
              |SELECT split, source, COUNT(*) AS n_docs,
              |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
              |       (CAST(SUM(n_tokens) AS BIGINT) + 255) // 256 AS n_sequences
              |FROM rows_ GROUP BY split, source ORDER BY split, source""".stripMargin)),

    /** Near-dup cluster assignment — [[connectedComponents]] over the
      * ≥0.5-Jaccard pair graph, the transitive step a production dedup
      * pipeline runs after candidate generation (pairwise "drop the higher
      * id" under-merges chains A~B~C). Output: every doc appearing in a
      * pair, labeled by the min doc_id of its component. The oracle computes
      * the same fixpoint as a DuckDB recursive-CTE transitive closure — an
      * independent algorithm, so agreement checks the semantics, not the
      * implementation. */
    QueryDef(
      "dd_dup_clusters",
      (s, d) => connectedComponents(
        jaccardPairs(s, d, permille = 500).select(col("doc_a"), col("doc_b")))
        ._1.orderBy("doc_id"),
      Some(s"""WITH RECURSIVE
             |${duckJaccard(500)},
             |edges AS (SELECT doc_a AS a, doc_b AS b FROM jac
             |          UNION ALL SELECT doc_b, doc_a FROM jac),
             |reach(a, r) AS (
             |  SELECT DISTINCT a, a FROM edges
             |  UNION
             |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.a = e.b)
             |SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a
             |ORDER BY doc_id""".stripMargin)),

    /** BEST-REPRESENTATIVE SELECTION per near-dup cluster — the FineWeb /
      * Gopher keep rule: within each transitive duplicate cluster keep the
      * LONGEST document (ties → min doc_id), not the min-id canonical.
      * Min-id keep is arbitrary — when a truncated scrape and its full
      * original land in one cluster, the pipeline must keep the full copy.
      * Emitted per clustered doc: cluster, length, keep/drop verdict.
      *
      * Distributed shape: rides [[connectedComponents]] over the PERSISTED
      * ≥0.5-Jaccard pair graph (no new corpus pass), one doc-keyed length
      * attach, then the argmax is a map-combinable MAX of ONE packed BIGINT
      * — n_tokens·2^32 + (2^32−1−doc_id), so max-by-length ties break to
      * min-id in the same scalar op (the dd_line_dedup packing discipline;
      * contract: n_tokens < 2^31, doc_id < 2^32 — ENFORCED with a
      * raise_error guard like [[packedLineKey]], so an out-of-range doc
      * fails the job instead of silently electing the wrong keeper). A
      * struct argmax would force SortAggregate; the packed form combines
      * map-side, so a million-doc boilerplate cluster costs one partial per
      * task. Verdict join is cluster-keyed, pair-graph-sized. */
    QueryDef(
      "dd_cluster_best",
      (s, d) => {
        val clusters = connectedComponents(
          jaccardPairs(s, d, permille = 500).select(col("doc_a"), col("doc_b")))._1
        val len = Tables.documents(s, d)
          .select(col("doc_id"), expr(s"CAST(size($toks) AS BIGINT)").as("n_tokens"))
        val cl = clusters.join(len, Seq("doc_id"))
        val best = cl.groupBy(col("cluster_id"))
          .agg(max(expr(
            "CASE WHEN n_tokens >= 0 AND n_tokens < 2147483648 " +
              "AND doc_id >= 0 AND doc_id <= 4294967295 " +
              "THEN n_tokens * 4294967296 + (4294967295 - doc_id) " +
              "ELSE raise_error(concat('packed best key out of range: doc_id=', " +
              "CAST(doc_id AS STRING), ' n_tokens=', CAST(n_tokens AS STRING))) END"))
            .as("kb"))
          .select(col("cluster_id"), expr("4294967295 - (kb % 4294967296)").as("best_doc"))
        cl.join(best, Seq("cluster_id"))
          .withColumn("status",
            when(col("doc_id") === col("best_doc"), "keep").otherwise("drop"))
          .select(col("doc_id"), col("cluster_id"), col("n_tokens"), col("status"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
             |${duckJaccard(500)},
             |edges AS (SELECT doc_a AS a, doc_b AS b FROM jac
             |          UNION ALL SELECT doc_b, doc_a FROM jac),
             |reach(a, r) AS (
             |  SELECT DISTINCT a, a FROM edges
             |  UNION
             |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.a = e.b),
             |cl AS (SELECT a AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY a),
             |len AS (SELECT doc_id,
             |          CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
             |        FROM documents),
             |j AS (SELECT c.doc_id, c.cluster_id, l.n_tokens
             |      FROM cl c JOIN len l USING (doc_id)),
             |b AS (SELECT cluster_id,
             |        MAX(n_tokens * 4294967296 + (4294967295 - doc_id)) AS kb
             |      FROM j GROUP BY cluster_id)
             |SELECT j.doc_id, j.cluster_id, j.n_tokens,
             |       CASE WHEN j.doc_id = 4294967295 - (kb % 4294967296)
             |            THEN 'keep' ELSE 'drop' END AS status
             |FROM j JOIN b USING (cluster_id) ORDER BY j.doc_id""".stripMargin)),

    /** Embedding-cosine near-dup, IVF-cell blocked: candidates are pairs in
      * the same trained k-means cell (graft.sim.Similarity — the oracle
      * replays training exactly), verified with the exact native cosine.
      * Blocking by learned cell replaces the earlier fixed-cardinality
      * `label` block, and the per-cell all-pairs expansion rides
      * [[cellCosPairs]] — the shared [[bucketedPairs]] skeleton, so cells
      * are capped at [[MaxBucket]] like every other candidate block (at
      * scale K grows ~√N so per-cell pair mass stays bounded; a degenerate
      * cell is dropped, the standard IVF dedup trade). Dot/norm use the
      * identical left-fold formula in both engines. */
    QueryDef(
      "dd_embed_cosine",
      (s, d) => cellCosPairs(s, d)
        .filter(col("cos6") >= 0.35)
        .select(col("vec_a"), col("vec_b"), col("cell"), col("cos6"))
        .orderBy("vec_a", "vec_b"),
      Some(s"""WITH ${graft.sim.Similarity.duckKmeansChain()},
             |ev AS (SELECT e.vec_id, e.v, a.cell FROM e JOIN assign a USING (vec_id)),
             |$duckCellKeep,
             |p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.cell,
             |        list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * c.v[i])) AS dot,
             |        list_sum(list_transform(a.v, x -> x * x)) AS na,
             |        list_sum(list_transform(c.v, x -> x * x)) AS nb
             |      FROM ev a JOIN keepc k ON k.cell = a.cell
             |           JOIN ev c ON a.cell = c.cell AND a.vec_id < c.vec_id)
             |SELECT vec_a, vec_b, cell, round(dot / sqrt(na * nb), 6) AS cos6
             |FROM p WHERE round(dot / sqrt(na * nb), 6) >= 0.35
             |ORDER BY vec_a, vec_b""".stripMargin)),

    /** SEMANTIC DEDUP (the SemDeDup shape): embedding-level dedup as a
      * per-vector KEEP VERDICT, not just a pair list — within each trained
      * IVF cell, a vector is dropped when a LOWER-ID vector in the same
      * cell sits above the cosine threshold, so exactly one representative
      * per near-duplicate semantic group survives (the min-id keep rule,
      * dd_exact's canonical discipline applied to embeddings). This is the
      * semantic counterpart of text near-dup: paraphrases and re-encodes
      * that share no n-grams land in one cell with cosine ~1 and dedup
      * here, invisibly to every lexical screen.
      *
      * Scale shape: identical to [[defs dd_embed_cosine]] — the pair
      * stream IS [[cellCosPairs]] (cell-blocked pair mass N²/K = N^1.5,
      * cell-parallel, hot cells capped at [[MaxBucket]] through the shared
      * [[bucketedPairs]] skeleton, annotated `pairs` in SCALING.md); the
      * verdict adds one vec-keyed rollup and a left join from the
      * cell-assignment ARTIFACT — the pair stream is never re-scanned.
      * A vector is dropped when a LOWER-id same-cell vector clears the
      * threshold, so the dup count groups by the PAIR'S LARGER side
      * (cellCosPairs' vec_b). */
    QueryDef(
      "dd_semantic_dedup",
      (s, d) => {
        val asg = graft.sim.Similarity.assignCells(s, d)
          .select(col("vec_id"), col("cell"))
        val dups = cellCosPairs(s, d)
          .filter(col("cos6") >= 0.35)
          .groupBy(col("vec_b"))
          .agg(count(lit(1)).as("n_dups"))
          .withColumnRenamed("vec_b", "vec_id")
        asg.join(dups, Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cell"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"))
          .withColumn("status",
            when(col("n_dups") > 0, "drop").otherwise("keep"))
          .orderBy("vec_id")
      },
      Some(s"""WITH ${graft.sim.Similarity.duckKmeansChain()},
             |ev AS (SELECT e.vec_id, e.v, a.cell FROM e JOIN assign a USING (vec_id)),
             |$duckCellKeep,
             |p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
             |        list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * c.v[i])) AS dot,
             |        list_sum(list_transform(a.v, x -> x * x)) AS na,
             |        list_sum(list_transform(c.v, x -> x * x)) AS nb
             |      FROM ev a JOIN keepc k ON k.cell = a.cell
             |           JOIN ev c ON a.cell = c.cell AND a.vec_id > c.vec_id),
             |dd AS (SELECT vec_a AS vec_id, COUNT(*) AS n_dups FROM p
             |       WHERE round(dot / sqrt(na * nb), 6) >= 0.35 GROUP BY vec_a)
             |SELECT a.vec_id, a.cell,
             |       CAST(COALESCE(dd.n_dups, 0) AS BIGINT) AS n_dups,
             |       CASE WHEN COALESCE(dd.n_dups, 0) > 0 THEN 'drop'
             |            ELSE 'keep' END AS status
             |FROM assign a LEFT JOIN dd USING (vec_id) ORDER BY a.vec_id""".stripMargin)),

    /** DECONTAMINATION: flag corpus documents that share any word 3-gram
      * with a benchmark/eval set (stand-in: the src0 documents) — the
      * GPT-3-style n-gram overlap scrub every pretraining pipeline runs so
      * eval answers don't leak into training data. Shape at 100 TB: the
      * benchmark side is first PRE-AGGREGATED to a shingle → distinct-doc-
      * count dictionary (one row per shingle — bounded by the eval suite's
      * vocabulary, tiny) and BROADCAST to the corpus shingle stream, so the
      * join emits at most one match per corpus shingle row; joining the raw
      * per-bench-doc shingle rows instead would fan out |bench docs| copies
      * of every stop-shingle — the hot-key explosion the MaxBucket cap
      * guards elsewhere, avoided here by construction since dropping hot
      * shingles would cost decontamination RECALL (eval leakage). The
      * shared shingle subtree is computed once (ReuseExchange, same as
      * dd_ngram_jaccard). Output per contaminated doc: distinct overlapping
      * shingles and total bench-doc incidences (sum over shared shingles of
      * the bench docs containing each). */
    QueryDef(
      "dd_decontaminate",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
        val sh = shingleRows(s, d)
        val benchDict = sh.join(src.filter(col("source") === "src0"), "doc_id")
          .groupBy(col("sng")).agg(countDistinct(col("doc_id")).as("nb"))
        val corpus = sh.join(src.filter(col("source") =!= "src0"), "doc_id")
          .select(col("doc_id"), col("sng"))
        corpus.join(broadcast(benchDict), "sng")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared_shingles"),
            sum(col("nb")).as("n_bench_incidences"))
          .orderBy("doc_id")
      },
      Some("""WITH toksq AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t
             |               FROM documents),
             |sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i ->
             |          t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingles FROM toksq),
             |ex AS (SELECT doc_id, unnest(shingles) AS sng FROM sh0),
             |benchdict AS (SELECT e.sng, COUNT(DISTINCT e.doc_id) AS nb FROM ex e
             |              JOIN documents d ON d.doc_id = e.doc_id
             |              WHERE d.source = 'src0' GROUP BY e.sng),
             |corpus AS (SELECT e.doc_id, e.sng FROM ex e
             |           JOIN documents d ON d.doc_id = e.doc_id WHERE d.source <> 'src0')
             |SELECT c.doc_id, COUNT(*) AS n_shared_shingles,
             |       CAST(SUM(b.nb) AS BIGINT) AS n_bench_incidences
             |FROM corpus c JOIN benchdict b ON c.sng = b.sng
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    /** BLOOM-FILTER build + probe, SQL-native: the broadcast pre-join
      * pruning structure a 100 TB pipeline puts in front of an expensive
      * join (probe the filter, ship only probable members). The filter over
      * the src0 members' fingerprints is k=4 md5-derived 12-bit positions
      * (the Kirsch-Mitzenmacher trick the MinHash family already uses;
      * 12 bits rather than a production 2^30+ so the false-positive path
      * actually FIRES on the fixture and the oracle pins its exact count) —
      * its DISTINCT position set is ≤ 4·|members| rows of one SMALLINT-
      * range value, broadcastable at any corpus size that has a bounded
      * member side. A doc probes positive iff ALL 4 of its positions are
      * set. Because both engines derive identical positions from identical
      * md5s, the exact false-positive count is DETERMINISTIC and the oracle
      * hash-checks it (not just a bound) — and n_false_neg must be zero by
      * construction in any correct Bloom filter, which the oracle states as
      * a literal 0. */
    QueryDef(
      "dd_bloom_probe",
      (s, d) => {
        val fp = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
        def positions(df: DataFrame) = (0 until 4).map(i =>
          df.select(col("doc_id"), col("source"),
            expr(s"CAST(conv(substr(md5(fp), ${1 + 4 * i}, 3), 16, 10) AS BIGINT)").as("pos")))
          .reduce(_ unionAll _)
        val filterSet = positions(fp.filter(col("source") === "src0"))
          .select(col("pos")).distinct()
        val probed = positions(fp)
          .join(broadcast(filterSet.withColumn("set1", lit(1))), Seq("pos"), "left_outer")
          .groupBy(col("doc_id"), col("source"))
          .agg((count(col("set1")) === 4).as("bloom_hit"))
        probed
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
            sum(when(col("bloom_hit") && col("source") =!= "src0", 1L).otherwise(0L))
              .as("n_false_pos"),
            sum(when(!col("bloom_hit") && col("source") === "src0", 1L).otherwise(0L))
              .as("n_false_neg"))
          .orderBy("source")
      },
      Some("""WITH fp AS (SELECT doc_id, source,
             |              md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
             |            FROM documents),
             |pos AS (SELECT doc_id, source,
             |          CAST(('0x' || substr(md5(fp), 1 + 4 * i, 3)) AS BIGINT) AS pos
             |        FROM fp, range(0, 4) r(i)),
             |fset AS (SELECT DISTINCT pos FROM pos WHERE source = 'src0'),
             |probed AS (SELECT p.doc_id, p.source, COUNT(f.pos) = 4 AS bloom_hit
             |           FROM pos p LEFT JOIN fset f ON p.pos = f.pos
             |           GROUP BY p.doc_id, p.source)
             |SELECT source, COUNT(*) AS n_docs,
             |       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
             |       CAST(SUM(CASE WHEN bloom_hit AND source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_false_pos,
             |       CAST(0 AS BIGINT) AS n_false_neg
             |FROM probed GROUP BY source ORDER BY source""".stripMargin)),

    /** DUPLICATION RATE BY SOURCE — the provenance diagnostic behind source
      * weighting decisions: per source, how many of its docs are exact
      * duplicates of ANY doc in the corpus (same normalized fingerprint as
      * [[dd_exact]] — the two share a partitioning at scale), and how many
      * duplicate a doc from a DIFFERENT source. A source with high
      * cross-source dup mass is re-crawling someone else's corpus and
      * should be down-weighted, not deduped doc-by-doc. Scale shape: one
      * fingerprint shuffle builds per-fp (copies, distinct sources), one
      * join back on the same key, one partial-agg shuffle on source —
      * no windows, no broadcasts of data-sized state. */
    QueryDef(
      "dd_source_dup_rate",
      (s, d) => {
        val doc = Tables.documents(s, d).select(col("doc_id"), col("source"),
          md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
        val grp = doc.groupBy(col("fp"))
          .agg(count(lit(1)).as("n_copies"),
            countDistinct(col("source")).as("n_sources"))
        doc.join(grp, "fp")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_copies") >= 2, 1L).otherwise(0L)).as("n_dup"),
            sum(when(col("n_sources") >= 2, 1L).otherwise(0L)).as("n_cross_dup"))
          .withColumn("dup_permille", expr("(1000 * n_dup) div n_docs"))
          .orderBy("source")
      },
      Some("""WITH doc AS (SELECT doc_id, source,
             |               md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
             |             FROM documents),
             |grp AS (SELECT fp, COUNT(*) AS n_copies,
             |               COUNT(DISTINCT source) AS n_sources
             |        FROM doc GROUP BY fp)
             |SELECT source, COUNT(*) AS n_docs,
             |       CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |       CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_cross_dup,
             |       (1000 * CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT))
             |         // COUNT(*) AS dup_permille
             |FROM doc JOIN grp USING (fp)
             |GROUP BY source ORDER BY source""".stripMargin)),

    /** CHUNK-LEVEL NEAR-DUP MASS over content-defined chunks — the
      * edit-robust upgrade of [[dd_substring_mass]]: a doc that shares
      * PARAGRAPHS with another (boilerplate, syndication, partial
      * re-crawl) lights up by shared-chunk mass even when whole-doc
      * fingerprints all differ, and CDC boundaries mean an insertion only
      * perturbs the chunks it touches. Chunk identity is the additive
      * fingerprint + gram count from graft.text.TextStats.cdcChunkIndex —
      * the PERSISTED chunk index (~1/16 the gram count: one entry per
      * chunk, not per gram — the storage math that makes chunk indexes
      * affordable at 100 TB), so serving probes the artifact instead of
      * re-chunking the corpus. One chunk-key shuffle counts distinct docs
      * per chunk, one join back on the same key, one doc rollup. */
    QueryDef(
      "dd_cdc_dedup",
      (s, d) => {
        val ch = graft.text.TextStats.cdcChunkIndex(s, d)
          .select(col("doc_id"), col("chunk_seq"), col("cg"), col("cfp"))
        val idx = ch.groupBy(col("cfp"), col("cg"))
          .agg(countDistinct(col("doc_id")).as("nd"))
        ch.join(idx, Seq("cfp", "cg"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"),
            sum(col("cg")).as("n_grams"),
            sum(when(col("nd") >= 2, col("cg")).otherwise(0L)).as("shared_grams"))
          .withColumn("shared_permille", expr("(1000 * shared_grams) div n_grams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${graft.text.TextStats.duckCdcChain},
             |ch AS (SELECT doc_id, chunk_seq, COUNT(*) AS cg,
             |              CAST(SUM(ghash) AS BIGINT) AS cfp
             |       FROM c GROUP BY doc_id, chunk_seq),
             |idx AS (SELECT cfp, cg, COUNT(DISTINCT doc_id) AS nd
             |        FROM ch GROUP BY cfp, cg)
             |SELECT doc_id, COUNT(*) AS n_chunks,
             |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             |       CAST(SUM(cg) AS BIGINT) AS n_grams,
             |       CAST(SUM(CASE WHEN nd >= 2 THEN cg ELSE 0 END) AS BIGINT)
             |         AS shared_grams,
             |       (1000 * CAST(SUM(CASE WHEN nd >= 2 THEN cg ELSE 0 END) AS BIGINT))
             |         // CAST(SUM(cg) AS BIGINT) AS shared_permille
             |FROM ch JOIN idx USING (cfp, cg)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /** MINHASH ESTIMATOR QUALITY — the index-tuning eval for the LSH
      * family (the dd_* analog of sim_ann_recall): for every MinHash-LSH
      * candidate pair, the signature's Jaccard ESTIMATE (matching
      * components / 64) next to the EXACT shingle Jaccard, plus the
      * per-pair error. Signature resolution and band layout are tuned on
      * exactly this table — run it after every knob change, before the
      * index is trusted at scale. Cost is pair-sized: signatures join the
      * candidate pairs (never all pairs), and the exact side reuses the
      * capped inverted-index intersection counts (a candidate with no
      * shared shingle scores exact 0 — a band false positive, visible as
      * est >> exact). */
    QueryDef(
      "dd_minhash_quality",
      (s, d) => {
        val sig = minhashSigStored(s, d)
        val arr = array((0 until NumHashes).map(i => col(s"mh$i")): _*)
        val sa = sig.select(col("doc_id").as("doc_a"), arr.as("sa"))
        val sb = sig.select(col("doc_id").as("doc_b"), arr.as("sb"))
        val est = minhashPairs(s, d).join(sa, "doc_a").join(sb, "doc_b")
          .withColumn("nm", expr(
            "aggregate(zip_with(sa, sb, (x, y) -> CAST(x = y AS BIGINT)), " +
              "0L, (acc, v) -> acc + v)"))
          .select(col("doc_a"), col("doc_b"),
            expr(s"(1000 * nm) div $NumHashes").as("est_permille"))
        val jac = jaccardPairs(s, d, permille = 0)
          .select(col("doc_a"), col("doc_b"),
            col("jaccard_permille").as("exact_permille"))
        est.join(jac, Seq("doc_a", "doc_b"), "left_outer")
          .withColumn("exact_permille", coalesce(col("exact_permille"), lit(0L)))
          .withColumn("err_permille", abs(col("est_permille") - col("exact_permille")))
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val nm = (0 until NumHashes)
          .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
          .mkString(" +\n|             ")
        s"""WITH $duckInterChain,
           |${duckSigChain("ex")},
           |bands AS (SELECT doc_id, unnest([
           |            ${duckBandList(NumBands, RowsPerBand)}]) AS bk FROM sig),
           |keepb AS (SELECT bk FROM bands GROUP BY bk HAVING COUNT(*) <= $MaxBucket),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
           |         FROM bands a JOIN keepb k ON a.bk = k.bk
           |              JOIN bands c ON c.bk = a.bk AND a.doc_id < c.doc_id),
           |est AS (SELECT cand.doc_a, cand.doc_b,
           |          ($nm) AS nm
           |        FROM cand JOIN sig sa ON sa.doc_id = cand.doc_a
           |             JOIN sig sb ON sb.doc_id = cand.doc_b),
           |fin AS (SELECT e.doc_a, e.doc_b,
           |          (1000 * nm) // $NumHashes AS est_permille,
           |          COALESCE((1000 * i) // (na.n + nb.n - i), 0) AS exact_permille
           |        FROM est e
           |        LEFT JOIN inter ON inter.doc_a = e.doc_a AND inter.doc_b = e.doc_b
           |        JOIN n na ON na.doc_id = e.doc_a
           |        JOIN n nb ON nb.doc_id = e.doc_b)
           |SELECT doc_a, doc_b, CAST(est_permille AS BIGINT) AS est_permille,
           |       CAST(exact_permille AS BIGINT) AS exact_permille,
           |       CAST(abs(est_permille - exact_permille) AS BIGINT) AS err_permille
           |FROM fin ORDER BY doc_a, doc_b""".stripMargin
      }),

    /** LINE-LEVEL DEDUP (the C4 / RefinedWeb boilerplate rule) — dedup at
      * LINE granularity across the whole corpus, not document granularity:
      * every occurrence of a line after its global first keep is removed,
      * which is what strips repeated navigation chrome, cookie banners and
      * license boilerplate that document-level near-dup can never touch.
      * The fixture corpus has no newlines, so a "line" is the deterministic
      * proxy both engines derive identically: consecutive non-overlapping
      * [[LineTok]]-token spans (the partial tail span is dropped). The keep
      * rule is first-occurrence by (doc_id, pos) — ONE window over the line
      * hash, the same global-canonical discipline as dd_exact's min-doc
      * pick. Emitted per document: span count, spans removed, tokens kept.
      *
      * Distributed shape: tokenization is materialized BEFORE the explode
      * (the tx_winnowing lesson), and the keep decision is an AGGREGATION,
      * not a window — each line's keeper is `min(struct(doc_id, pos))`
      * (identical semantics to first-by-(doc_id, pos), which the oracle
      * replays as rn = 1), and a doc's removed count is just its line count
      * minus the lines it keeps, read off the keeper table with NO join
      * back to the raw line stream. That matters at 100 TB because
      * boilerplate lines are BY DEFINITION hot keys: a window form sorts
      * every copy of a million-copy cookie banner in one partition, while
      * the min-struct aggregate collapses copies map-side to one partial
      * per task. Two map-combinable shuffles (line-keyed, then doc-keyed),
      * no pair expansion anywhere — linear end to end. */
    QueryDef(
      "dd_line_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), expr(toks).as("t"))
          .withColumn("nl", expr(s"CAST(size(t) AS BIGINT) div $LineTok"))
        // Keeper rule: [[lineKeepers]] — min packed (doc_id, pos) BIGINT,
        // map-combinable, width contract enforced in packedLineKey.
        val keepPerDoc = lineKeepers(lineSpans(docs))
          .groupBy(expr(packedLineDoc).as("doc_id"))
          .agg(count(lit(1)).as("n_kept"))
        docs.select(col("doc_id"), col("nl").as("n_lines"))
          .join(keepPerDoc, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_lines"),
            (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
          .withColumn("n_tokens_kept", expr(s"$LineTok * (n_lines - n_removed)"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t
             |           FROM documents),
             |d AS (SELECT doc_id, t, CAST(len(t) // $LineTok AS BIGINT) AS nl FROM t),
             |l AS (SELECT doc_id, i AS pos,
             |        array_to_string(t[i * $LineTok + 1 : i * $LineTok + $LineTok], ' ') AS line
             |      FROM d, unnest(range(0, nl)) AS u(i)),
             |r AS (SELECT doc_id,
             |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
             |      FROM l),
             |p AS (SELECT doc_id,
             |        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
             |      FROM r GROUP BY doc_id)
             |SELECT d.doc_id, d.nl AS n_lines,
             |       COALESCE(p.n_removed, 0) AS n_removed,
             |       CAST($LineTok * (d.nl - COALESCE(p.n_removed, 0)) AS BIGINT)
             |         AS n_tokens_kept
             |FROM d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    /** LSH BAND-LAYOUT TUNING — the b×r trade table MinHash-LSH is tuned
      * on: for each layout of the SAME 64 stored hashes (8×8, 16×4, 32×2),
      * the capped candidate-pair count, how many candidates are true ≥0.5
      * pairs, and the resulting recall/precision (permille). More rows per
      * band ⇒ fewer, higher-precision candidates; more bands ⇒ higher
      * recall at more pair mass — this query turns the S-curve algebra
      * into measured numbers on THIS corpus, the dd_* analog of
      * sim_nprobe_sweep (eval-as-operator: rerun per corpus, not per
      * notebook). Ground truth is the persisted ≥0.5 Jaccard pair graph;
      * candidates come from the persisted signature table — three band
      * expansions, zero new corpus passes, every bucket through the shared
      * cap.
      *
      * Shape note (round 15, measured): the per-arm loop LOOKS like it
      * executes the pair skeleton six times (three arms, `cands` consumed
      * by two aggregations each), but Spark's exchange reuse shares the
      * skeleton's shuffles between the two consumers, so only the cheap
      * post-exchange stages repeat. The "obvious" rewrite — one
      * (bands, rws, bk)-keyed postings frame through ONE skeleton pass +
      * one left-join aggregation, the oracle's UNION ALL shape — was
      * built and benched at sf0.1: 2.8s vs 1.5s here at equal total CPU
      * (~54 cpu-s both; the unified form's single wide aggregation loses
      * the smaller per-arm sort runs and reuses nothing). Keep the loop.
      *
      * The one real divergence the analysis found IS fixed: a layout
      * whose every bucket is over-cap yields zero candidates, where the
      * arm-wise `agg` emitted a (b, r, 0, 0, 0, 0) row but the oracle's
      * GROUP BY omits the arm — the n_cands > 0 filter states the
      * oracle's omission explicitly (never fires on the fixtures; all
      * three arms have candidates). */
    QueryDef(
      "dd_band_tuning",
      (s, d) => {
        val sig = minhashSigStored(s, d)
        val jac = jaccardPairs(s, d, permille = 500).select(col("doc_a"), col("doc_b"))
        val tot = jac.agg(count(lit(1)).as("n_true_total"))
        Seq((8, 8), (16, 4), (32, 2)).map { case (b, r) =>
          val cands = bucketedIdPairs(
            sig.select(col("doc_id"),
              explode(array(bandKeyCols(b, r): _*)).as("bk")),
            col("bk")).distinct()
          cands.agg(count(lit(1)).as("n_cands"))
            .crossJoin(cands.join(jac, Seq("doc_a", "doc_b"), "left_semi")
              .agg(count(lit(1)).as("n_true_cands")))
            .crossJoin(tot)
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              col("n_cands"), col("n_true_cands"),
              expr("CASE WHEN n_true_total = 0 THEN 0 " +
                "ELSE (1000 * n_true_cands) div n_true_total END").as("recall_permille"),
              expr("CASE WHEN n_cands = 0 THEN 0 " +
                "ELSE (1000 * n_true_cands) div n_cands END").as("precision_permille"))
        }.reduce(_.unionAll(_))
          .filter(col("n_cands") > 0)
          .orderBy("bands")
      },
      Some {
        val bandArms = Seq((8, 8), (16, 4), (32, 2)).flatMap { case (b, r) =>
          (0 until b).map { bi =>
            val cols = (0 until r).map(j => s"mh${bi * r + j}").mkString(", ")
            s"SELECT $b AS bands, $r AS rws, doc_id, " +
              s"md5(concat_ws('|', $bi, $cols)) AS bk FROM sig"
          }
        }.mkString("\n|  UNION ALL ")
        s"""WITH ${duckJaccard(500)},
           |${duckSigChain("ex")},
           |bands AS (
           |  $bandArms),
           |bkeep AS (SELECT bands, bk FROM bands GROUP BY bands, bk
           |          HAVING COUNT(*) <= $MaxBucket),
           |cand AS (SELECT DISTINCT a.bands, a.rws, a.doc_id AS doc_a, c.doc_id AS doc_b
           |         FROM bands a JOIN bkeep k ON k.bands = a.bands AND k.bk = a.bk
           |              JOIN bands c ON c.bands = a.bands AND c.bk = a.bk
           |                   AND a.doc_id < c.doc_id),
           |tot AS (SELECT COUNT(*) AS n_true_total FROM jac),
           |st AS (SELECT cand.bands, cand.rws,
           |         COUNT(*) AS n_cands,
           |         CAST(SUM(CASE WHEN jac.doc_a IS NOT NULL THEN 1 ELSE 0 END)
           |              AS BIGINT) AS n_true_cands
           |       FROM cand LEFT JOIN jac
           |         ON jac.doc_a = cand.doc_a AND jac.doc_b = cand.doc_b
           |       GROUP BY cand.bands, cand.rws)
           |SELECT CAST(bands AS INTEGER) AS bands,
           |       CAST(rws AS INTEGER) AS rows_per_band,
           |       n_cands, n_true_cands,
           |       CASE WHEN tot.n_true_total = 0 THEN 0
           |            ELSE (1000 * n_true_cands) // tot.n_true_total END
           |         AS recall_permille,
           |       CASE WHEN n_cands = 0 THEN 0
           |            ELSE (1000 * n_true_cands) // n_cands END AS precision_permille
           |FROM st, tot ORDER BY bands""".stripMargin
      }),

    /** DEDUP FUNNEL — per-source token mass surviving each pipeline stage:
      * raw → quality gate → exact dedup (min-doc per fingerprint) →
      * near-dup drop (≥0.5 Jaccard losers) → line-level dedup of the
      * surviving corpus. The per-release accounting table a training team
      * actually watches: which stage is eating which source's tokens. The
      * first four stages restate [[cleanCorpusKeepers]]'s exact semantics
      * (same gate, same canonical pick, same loser set); the line stage
      * runs the dd_line_dedup keeper rule over ONLY the surviving docs, so
      * its mass is the tokens the packed corpus actually ships (span-
      * covered tokens: partial tail spans are outside the line model on
      * both sides).
      *
      * Scale shape: stage verdicts are doc-keyed flags carried in ONE
      * frame (no per-stage corpus re-scan); the near-dup set probes the
      * persisted pair-graph artifact; the line stage adds the standard
      * two line-keyed map-combinable shuffles; final rollup is
      * O(sources). */
    QueryDef(
      "dd_dedup_funnel",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            // NULL-total (TextStats.nTokensAs): non-ANSI size(NULL) is -1,
            // which would leak into the tok_raw sums the oracle leaves NULL.
            expr(graft.text.TextStats.nTokensAs("BIGINT")).as("n_tokens"),
            expr(s"size(filter($toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))")
              .as("n_stop"),
            md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
          .withColumn("q_ok",
            expr("n_tokens BETWEEN 10 AND 1000 AND (100 * n_stop) div n_tokens < 40"))
        val exactKeep = base.filter(col("q_ok"))
          .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(true).as("e_ok"))
        val nearLoser = jaccardPairs(s, d, permille = 500)
          .select(col("doc_b").as("doc_id")).distinct()
          .withColumn("n_bad", lit(true))
        val flagged = base
          .join(exactKeep, Seq("doc_id"), "left_outer")
          .join(nearLoser, Seq("doc_id"), "left_outer")
          .withColumn("e_ok", coalesce(col("e_ok"), lit(false)))
          .withColumn("s_ok", col("e_ok") && coalesce(col("n_bad"), lit(false)) =!= true)
        val surv = flagged.filter(col("s_ok"))
          .select(col("doc_id"), col("source"), expr(toks).as("t"))
          .withColumn("nl", expr(s"CAST(size(t) AS BIGINT) div $LineTok"))
        val lineTok = lineKeepers(lineSpans(surv))
          .select(expr(packedLineDoc).as("doc_id"))
          .groupBy(col("doc_id")).agg(expr(s"$LineTok * count(1)").as("tok_line_doc"))
        val lineBySrc = surv.select(col("doc_id"), col("source"))
          .join(lineTok, Seq("doc_id"), "left_outer")
          .groupBy(col("source"))
          .agg(sum(coalesce(col("tok_line_doc"), lit(0L))).as("tok_line"))
        flagged.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("tok_raw"),
            sum(when(col("q_ok"), col("n_tokens")).otherwise(0L)).as("tok_quality"),
            sum(when(col("e_ok"), col("n_tokens")).otherwise(0L)).as("tok_exact"),
            sum(when(col("s_ok"), col("n_tokens")).otherwise(0L)).as("tok_near"))
          .join(lineBySrc, Seq("source"), "left_outer")
          .withColumn("tok_line", coalesce(col("tok_line"), lit(0L)))
          .orderBy("source")
      },
      Some(s"""WITH ${duckJaccard(500)},
             |base AS (
             |  SELECT doc_id, source,
             |         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
             |           AS n_tokens,
             |         len(list_filter(string_split_regex(trim(text), ' +'),
             |                         t -> t IN ('the', 'a', 'of', 'and', 'to')))
             |           AS n_stop,
             |         md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp,
             |         string_split_regex(trim(text), ' +') AS t
             |  FROM documents),
             |b2 AS (SELECT *, (n_tokens BETWEEN 10 AND 1000
             |                  AND (100 * n_stop) // n_tokens < 40) AS q_ok FROM base),
             |ek AS (SELECT MIN(doc_id) AS doc_id FROM b2 WHERE q_ok GROUP BY fp),
             |nl_ AS (SELECT DISTINCT doc_b AS doc_id FROM jac),
             |fl AS (SELECT b2.*, (ek.doc_id IS NOT NULL) AS e_ok,
             |              (ek.doc_id IS NOT NULL AND nl_.doc_id IS NULL) AS s_ok
             |       FROM b2 LEFT JOIN ek USING (doc_id) LEFT JOIN nl_ USING (doc_id)),
             |surv AS (SELECT doc_id, source, t,
             |                CAST(len(t) // $LineTok AS BIGINT) AS nl FROM fl WHERE s_ok),
             |l AS (SELECT doc_id, source, i AS pos,
             |        array_to_string(t[i * $LineTok + 1 : i * $LineTok + $LineTok], ' ')
             |          AS line
             |      FROM surv, unnest(range(0, nl)) AS u(i)),
             |kp AS (SELECT MIN(doc_id * 1048576 + pos) AS kp FROM l GROUP BY line),
             |lt AS (SELECT kp // 1048576 AS doc_id,
             |              CAST($LineTok * COUNT(*) AS BIGINT) AS tok_line_doc
             |       FROM kp GROUP BY 1),
             |ls AS (SELECT s.source,
             |              CAST(SUM(COALESCE(lt.tok_line_doc, 0)) AS BIGINT) AS tok_line
             |       FROM surv s LEFT JOIN lt USING (doc_id) GROUP BY s.source),
             |agg AS (SELECT source,
             |          CAST(SUM(n_tokens) AS BIGINT) AS tok_raw,
             |          CAST(SUM(CASE WHEN q_ok THEN n_tokens ELSE 0 END) AS BIGINT)
             |            AS tok_quality,
             |          CAST(SUM(CASE WHEN e_ok THEN n_tokens ELSE 0 END) AS BIGINT)
             |            AS tok_exact,
             |          CAST(SUM(CASE WHEN s_ok THEN n_tokens ELSE 0 END) AS BIGINT)
             |            AS tok_near
             |        FROM fl GROUP BY source)
             |SELECT agg.source, tok_raw, tok_quality, tok_exact, tok_near,
             |       COALESCE(ls.tok_line, 0) AS tok_line
             |FROM agg LEFT JOIN ls ON ls.source = agg.source
             |ORDER BY agg.source""".stripMargin)),

    /** DELETION-PROPAGATION MANIFEST (the right-to-be-forgotten report):
      * given a tombstone set (here the deterministic doc_id % 97 = 0 rule
      * both engines state), what happens to each PERSISTED index artifact —
      * artifacts with per-row doc attribution (the MinHash signature table,
      * the SimHash code table, the Jaccard pair graph) support targeted
      * `delete_rows`, while the winnowed-fp index stores DISTINCT
      * fingerprints with NO doc attribution, so deletion forces a
      * `rebuild`; its n_purged is the fingerprint count that must disappear
      * afterwards (fps unique to tombstoned ingested docs — an fp shared
      * with any live doc survives the rebuild). This is a real design
      * consequence surfaced as data: deduplicated indexes trade deletability
      * for size, and a compliance pass must know which is which.
      *
      * Scale shape: each count probes the artifact (or, for the winnow
      * uniqueness test, the winnow posting stream) with map-combinable
      * aggregates and ONE anti-join on fp; output is 4 rows. The tombstone
      * predicate stands in for a broadcast tombstone dictionary — swapping
      * `% 97 = 0` for a semi-join against a tombstone table changes no plan
      * shape (the dd_decontaminate broadcast discipline). */
    QueryDef(
      "dd_purge_manifest",
      (s, d) => {
        val tomb = "doc_id % 97 = 0"
        val mh = minhashSigStored(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum(when(expr(tomb), 1L).otherwise(0L)).as("n_purged"))
          .select(lit("mh_sig").as("artifact"), lit("delete_rows").as("action"),
            col("n_rows"), col("n_purged"))
        val sh = simhash60Stored(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum(when(expr(tomb), 1L).otherwise(0L)).as("n_purged"))
          .select(lit("simhash60").as("artifact"), lit("delete_rows").as("action"),
            col("n_rows"), col("n_purged"))
        val jp = jaccardPairs(s, d, permille = 0).agg(
          count(lit(1)).as("n_rows"),
          sum(when(expr("doc_a % 97 = 0 OR doc_b % 97 = 0"), 1L).otherwise(0L))
            .as("n_purged"))
          .select(lit("jac_pairs").as("artifact"), lit("delete_rows").as("action"),
            col("n_rows"), col("n_purged"))
        // doc-ATTRIBUTED winnow postings as their own artifact: the
        // uniqueness test deletion requires can't use the fp-only index
        // (no attribution — that's the point of the rebuild verdict), and
        // recomputing the posting stream per compliance query would be the
        // manifest's only non-probe cost.
        val wPost = graft.Artifacts.indexParquet(s, "winnow_post", d, "documents")(
          graft.text.TextStats.winnowedFpRows(s, d)
            .filter(expr("doc_id % 5 <> 0")).select(col("doc_id"), col("fp")))
        val wGone = wPost.filter(expr(tomb)).select(col("fp")).distinct()
          .join(wPost.filter(expr(s"NOT ($tomb)")).select(col("fp")).distinct(),
            Seq("fp"), "left_anti")
        val wn = s.read.parquet(winnowFpIndexPath(s, d))
          .agg(count(lit(1)).as("n_rows"))
          .crossJoin(wGone.agg(count(lit(1)).as("n_purged")))
          .select(lit("winnow_idx").as("artifact"), lit("rebuild").as("action"),
            col("n_rows"), col("n_purged"))
        mh.unionAll(sh).unionAll(jp).unionAll(wn).orderBy("artifact")
      },
      Some(s"""WITH ${duckJaccard(0)},
             |${graft.text.TextStats.duckWinnowChain},
             |mh AS (SELECT COUNT(*) AS n_rows,
             |         CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |           AS n_purged
             |       FROM documents
             |       WHERE len(string_split_regex(trim(text), ' +')) >= 3),
             |shc AS (SELECT COUNT(*) AS n_rows,
             |          CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |            AS n_purged
             |        FROM documents),
             |jp AS (SELECT COUNT(*) AS n_rows,
             |         CAST(SUM(CASE WHEN doc_a % 97 = 0 OR doc_b % 97 = 0
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
             |       FROM jac),
             |wpost AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM m
             |          WHERE doc_id % 5 <> 0),
             |wrows AS (SELECT COUNT(DISTINCT fp) AS n_rows FROM wpost),
             |wgone AS (SELECT COUNT(*) AS n_purged FROM
             |            (SELECT DISTINCT fp FROM wpost WHERE doc_id % 97 = 0
             |             EXCEPT
             |             SELECT DISTINCT fp FROM wpost WHERE doc_id % 97 <> 0))
             |SELECT 'jac_pairs' AS artifact, 'delete_rows' AS action, n_rows, n_purged
             |  FROM jp
             |UNION ALL SELECT 'mh_sig', 'delete_rows', n_rows, n_purged FROM mh
             |UNION ALL SELECT 'simhash60', 'delete_rows', n_rows, n_purged FROM shc
             |UNION ALL SELECT 'winnow_idx', 'rebuild', wrows.n_rows,
             |            CAST(wgone.n_purged AS BIGINT) FROM wrows, wgone
             |ORDER BY artifact""".stripMargin)),

    /** LINE-DEDUP APPLY — the other half of [[defs dd_line_dedup]]: not the
      * per-doc removal COUNTS but the cleaned corpus itself, each document
      * re-assembled from only the spans it globally keeps (first occurrence
      * by (doc_id, pos), same packed-BIGINT keeper rule), in original span
      * order. This is the operator a training pipeline actually materializes
      * — C4's rule is "remove the line everywhere but its first occurrence",
      * and the output here IS that corpus (emitted as md5(clean_text) to
      * keep the driver compare narrow; the text column is one alias away).
      *
      * Distributed shape: the keeper table (one row per DISTINCT line) comes
      * from a map-combinable min — the million-copy cookie banner collapses
      * to one partial per task, never one partition. Occurrences then join
      * the keeper table on the line key, a 1:1-match fan-in with no
      * expansion (the keeper side has exactly one row per line, so a hot
      * line fans out to its occurrences and nothing more). The narrow
      * tokenize/explode stream is computed twice — once under the keeper
      * aggregation, once for the join probe; Spark can't reuse the exchange
      * because the agg side's partial combine sits below it — and that is
      * the right trade: both passes are linear map work, while the
      * single-pass alternatives (a window over the line key, or collecting
      * occurrence lists per line) serialize every copy of a hot line into
      * one partition. Re-assembly is a per-doc collect of that doc's own
      * kept spans — bounded by the doc's span count, the same contract as
      * tx_pack_sequences' per-doc token collect. Linear end to end, no pair
      * stage, hot lines stay map-side. */
    QueryDef(
      "dd_line_dedup_apply",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), expr(toks).as("t"))
          .withColumn("nl", expr(s"CAST(size(t) AS BIGINT) div $LineTok"))
        val lines = lineSpans(docs)
        val keep = lineKeepers(lines)
        // The probe-side pack can stay unguarded: every span row also flows
        // through lineKeepers' guarded min in the same job, so an
        // out-of-range row raises there before a silent mismatch here.
        val cleaned = lines.join(keep, Seq("line"))
          .filter(expr(s"doc_id * $LinePosW + pos = kp"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            collect_list(struct(col("pos"), col("line"))).as("pl"))
          .select(col("doc_id"), col("n_kept"),
            md5(expr("array_join(transform(array_sort(pl), x -> x.line), ' ')"))
              .as("clean_md5"))
        docs.select(col("doc_id"))
          .join(cleaned, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("clean_md5"), lit(md5Empty)).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t
             |           FROM documents),
             |d AS (SELECT doc_id, t, CAST(len(t) // $LineTok AS BIGINT) AS nl FROM t),
             |l AS (SELECT doc_id, i AS pos,
             |        array_to_string(t[i * $LineTok + 1 : i * $LineTok + $LineTok], ' ') AS line
             |      FROM d, unnest(range(0, nl)) AS u(i)),
             |k AS (SELECT line, MIN(doc_id * 1048576 + pos) AS kp FROM l GROUP BY line),
             |kept AS (SELECT l.doc_id, l.pos, l.line
             |         FROM l JOIN k ON k.line = l.line
             |              AND l.doc_id * 1048576 + l.pos = k.kp),
             |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |          md5(string_agg(line, ' ' ORDER BY pos)) AS clean_md5
             |        FROM kept GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(agg.n_kept, 0) AS n_kept,
             |       COALESCE(agg.clean_md5, md5('')) AS clean_md5
             |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    /** SOFT dedup — reweight instead of drop (the SoftDeDup idea: keep every
      * copy but downweight it by its duplicate count, so the training
      * sampler sees each unique text with total mass 1 while preserving
      * in-dup-group diversity that hard dedup destroys). Per doc:
      * fingerprint-group size and the integer micro-unit sampling weight
      * 1e6/fp_count, plus the doc's effective (weighted) token mass.
      *
      * Distributed shape: ONE shuffle on the normalized-text fingerprint
      * (the dd_exact key — at scale this query and dd_exact share a
      * partitioning) carrying only (fp, doc_id, n_tokens); the group size
      * is a window count over that exchange, no join-back. Output is
      * corpus-sized but NARROW (3 ints per doc), the per-doc weight column
      * a sampler consumes directly. */
    QueryDef(
      "dd_soft_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .select(col("doc_id"),
            md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"),
            expr(s"CAST(size($toks) AS BIGINT)").as("n_tokens"))
          .withColumn("fp_count", count(lit(1)).over(Window.partitionBy(col("fp"))))
          .select(col("doc_id"), col("fp_count"),
            expr("1000000 div fp_count").as("weight_micro"),
            expr("(n_tokens * 1000000) div fp_count").as("eff_tokens_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (SELECT doc_id,
             |         md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp,
             |         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
             |       FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |        COUNT(*) OVER (PARTITION BY fp) AS fp_count FROM f)
             |SELECT doc_id, fp_count, 1000000 // fp_count AS weight_micro,
             |       (n_tokens * 1000000) // fp_count AS eff_tokens_micro
             |FROM c ORDER BY doc_id""".stripMargin)),

    /** TRAIN/EVAL SPLIT LEAKAGE AUDIT — the check every benchmark-honest
      * pipeline runs after splitting: how many ≥0.5-Jaccard near-dup pairs
      * CROSS the deterministic 80/10/10 md5 split (an_train_split's exact
      * assignment)? A train↔test near-dup is memorized eval data; the audit
      * emits the pair mass per unordered split combination with a leak
      * verdict, so a gate can fail the build when the crossing count is
      * nonzero (dd_decontaminate is the remedial op).
      *
      * Distributed shape: the ≥0.5 pair graph is the PERSISTED artifact
      * (jaccardPairs — no new corpus pass); the split attach is two
      * doc-keyed joins of a 2-column frame against pair-sized data, then an
      * O(split²)=O(9) aggregate. The split column is derived, not stored,
      * so the audit works on any corpus without schema changes. */
    QueryDef(
      "dd_split_leakage",
      (s, d) => {
        val splitOf = "CASE WHEN CAST(conv(substr(md5(CAST(%s AS STRING)), 1, 15), 16, 10) " +
          "AS BIGINT) %% 100 < 80 THEN 'train' WHEN CAST(conv(substr(md5(CAST(%s AS STRING))" +
          ", 1, 15), 16, 10) AS BIGINT) %% 100 < 90 THEN 'val' ELSE 'test' END"
        jaccardPairs(s, d, permille = 500)
          .select(col("doc_a"), col("doc_b"))
          .withColumn("sa", expr(splitOf.format("doc_a", "doc_a")))
          .withColumn("sb", expr(splitOf.format("doc_b", "doc_b")))
          .select(least(col("sa"), col("sb")).as("split_lo"),
            greatest(col("sa"), col("sb")).as("split_hi"))
          .groupBy(col("split_lo"), col("split_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("leaks",
            when(col("split_lo") =!= col("split_hi"), "leak").otherwise("ok"))
          .orderBy("split_lo", "split_hi")
      },
      Some(s"""WITH RECURSIVE
             |${duckJaccard(500)},
             |sp AS (SELECT doc_a, doc_b,
             |         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
             |              WHEN CAST(('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
             |              ELSE 'test' END AS sa,
             |         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
             |              WHEN CAST(('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
             |              ELSE 'test' END AS sb
             |       FROM jac)
             |SELECT LEAST(sa, sb) AS split_lo, GREATEST(sa, sb) AS split_hi,
             |       COUNT(*) AS n_pairs,
             |       CASE WHEN LEAST(sa, sb) <> GREATEST(sa, sb) THEN 'leak' ELSE 'ok' END AS leaks
             |FROM sp GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin)),
  )

  /** md5 of the empty string — the clean_md5 of a document with no kept
    * spans, pinned so both engines state the same constant. */
  private val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"

  /** The dd_clean_corpus keep-set (unordered): quality gate → exact-dedup
    * canonical (min doc_id per fingerprint) → near-dup loser drop at
    * ≥ 0.5 Jaccard. Shared by dd_clean_corpus and the dd_shard_manifest
    * composite so both state the same three-stage plan. */
  private[graft] def cleanCorpusKeepers(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        expr(s"size($toks)").as("n_tokens"),
        expr(s"size(filter($toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))").as("n_stop"),
        md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
      .filter(expr("n_tokens BETWEEN 10 AND 1000 AND (100 * n_stop) div n_tokens < 40"))
    val keepers = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val nearDupLosers = jaccardPairs(s, d, permille = 500)
      .select(col("doc_b").as("doc_id")).distinct()
    keepers.select(col("doc_id"))
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** Screen a batch of (doc_id, fp) fingerprint postings against a
    * persisted DISTINCT-fp index: per doc, how many of its fingerprints the
    * corpus already contains, and the ≥ `minShared` near-dup verdict.
    * Consumes ONLY the batch postings and the index — never the corpus
    * documents (DedupSpec proves it by running against an index file with
    * the old corpus absent). The probe is an inner join on fp with the
    * per-doc totals aggregated separately, so every batch fp survives into
    * `n_fps` while the (corpus-sized) index side is only streamed. */
  def incrementalNearDup(batchFps: DataFrame, fpIndex: DataFrame,
      minShared: Int = 2): DataFrame = {
    val perDoc = batchFps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fps"))
    val hits = batchFps.join(fpIndex.select(col("fp")).distinct(), Seq("fp"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    perDoc.join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_fps"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("status",
        when(col("n_hits") >= minShared, "dup_corpus").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** Winnowed-fingerprint index of the already-ingested shard (doc_id
    * % 5 ≠ 0) as a parquet artifact, built once per corpus CONTENT (the
    * [[graft.Artifacts]] discipline: an index is an artifact of a corpus
    * snapshot, not per-query cost). Returns the path;
    * [[incrementalNearDup]] consumers read the corpus only through this
    * file. */
  def winnowFpIndexPath(s: SparkSession, d: String): String =
    graft.Artifacts.indexParquetPath(s, "winnow_idx", d, "documents")(
      graft.text.TextStats.winnowedFpRows(s, d)
        .filter(expr("doc_id % 5 <> 0"))
        .select(col("fp")).distinct())
}
