package graft.text

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators over the `documents` table: token counting,
  * per-language profiles, quality scoring, heuristic language ID, and
  * document fingerprinting (BASELINE north-star "text analysis").
  *
  * Everything is built from codegen'd `functions._` / higher-order array
  * functions — no UDFs — so the whole pipeline stays inside whole-stage
  * codegen and scales linearly with document count (narrow, no shuffle
  * except the declared group-bys).
  *
  * Ratios are carried as integer permille/percent via integer division so
  * the DuckDB oracle is bit-exact (no double accumulation).
  *
  * Split (round 15) along the file's three concerns, one trait per
  * sibling file, mixed back into this single public object so no call
  * site changes: [[TextDp]] (the DP release mechanism), [[TextBpe]] (the
  * BPE tokenizer lifecycle). This file keeps tokenize/quality/lang-ID,
  * the registered `defs`, the split/mixture planners, and the CDC/winnow
  * fingerprint helpers.
  */
object TextStats extends TextDp with TextBpe {

  /** Whitespace tokenizer shared by every query (and the BPE-ish token
    * estimate): split on runs of spaces after trim. `private[graft]`: the
    * streaming fertility monitor (graft.streaming.DocsStream) must tokenize
    * identically or the gate drifts from the batch oracle. */
  private[graft] val toks = "split(trim(text), ' +')"

  /** NULL-total token count. With `spark.sql.ansi.enabled=false` (the
    * session default), `size(split(NULL))` is -1 in Spark while every
    * DuckDB oracle's `len(NULL)` is NULL — a -1 entering the packing
    * cumulative sum would silently shift every later doc's window index
    * in that source, and a -1 n_tokens would flip quality arithmetic the
    * oracle leaves NULL. NULL text never occurs in the fixtures; this
    * guards external/staged corpora where the column is nullable. */
  private[graft] def nTokensAs(sqlType: String): String =
    s"CAST(CASE WHEN text IS NULL THEN NULL ELSE size($toks) END AS $sqlType)"

  /** Packing window size (tokens per training window) — ONE constant for
    * the pack family (tx_pack_sequences / _sharded / tx_pack_efficiency)
    * and their oracles, which previously each restated the literal. */
  private[graft] val PackWin = 256

  /** The split-doc predicate over a per-source cumulative token sum
    * (`cum`, `n_tokens` in scope). */
  private val isSplitExpr =
    s"(cum - n_tokens) div $PackWin <> (cum - 1) div $PackWin"

  /** The window-index projection the pack family derives from `cum` —
    * stated once so tx_pack_sequences_sharded's claim of reproducing
    * tx_pack_sequences EXACTLY rests on a shared definition, not on three
    * hand-copied expression lists staying in sync. */
  private[graft] def windowIndexCols: Seq[org.apache.spark.sql.Column] = Seq(
    expr(s"(cum - n_tokens) div $PackWin").as("win_first"),
    expr(s"(cum - 1) div $PackWin").as("win_last"),
    expr(s"(cum - n_tokens) % $PackWin").as("offset_in_win"),
    expr(isSplitExpr).as("is_split"))

  /** Two-level sharded prefix sum — the 100 TB shape of the packing
    * cumsum, stated ONCE for [[defs tx_pack_sequences_sharded]] and the
    * corpus pipeline's pack stage: an unsharded per-partition window puts
    * an entire partition key (a dominant source — terabytes at scale) in
    * ONE task. shard = doc_id div 64 bounds every window partition by the
    * shard width; per-shard totals get an exclusive running sum per
    * `partCols` (shard-count-sized — model state) broadcast back as each
    * shard's carry-in. cum = carry_in + cum_in_shard reproduces the
    * unsharded cumulative sum EXACTLY because shard order is doc_id
    * order. Expects `doc_id`, `n_tokens`, and `partCols`; adds `cum`. */
  private[graft] def shardedCum(docs: org.apache.spark.sql.DataFrame,
      partCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = partCols.map(col)
    val withShard = docs.withColumn("shard", expr("doc_id div 64"))
    val wShard = Window.partitionBy(pc :+ col("shard"): _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = withShard.withColumn("cum_in_shard", sum(col("n_tokens")).over(wShard))
    val wCarry = Window.partitionBy(pc: _*).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = withShard.groupBy(pc :+ col("shard"): _*)
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      // carry_in stays NULLABLE (no coalesce): the unsharded cumsum is
      // NULL exactly while a partition's prefix holds no non-NULL count,
      // and a plain `carry_in + cum_in_shard` would also go NULL whenever
      // a NULL-count doc OPENS a shard (NULL + numeric) — both breaking
      // the stated exact equivalence on nullable-text corpora. The CASE
      // below restates the window-sum rule: NULL iff BOTH sides are
      // (no non-NULL seen), else the sum of whichever sides exist.
      .withColumn("carry_in", sum(col("shard_tokens")).over(wCarry))
      .select(pc :+ col("shard") :+ col("carry_in"): _*)
    inShard.join(broadcast(carries), partCols :+ "shard")
      .withColumn("cum",
        when(col("carry_in").isNull && col("cum_in_shard").isNull,
          lit(null).cast("long"))
          .otherwise(coalesce(col("carry_in"), lit(0L)) +
            coalesce(col("cum_in_shard"), lit(0L))))
      .drop("shard", "cum_in_shard", "carry_in")
  }

  /** Per-doc unigram familiarity `(doc_id, n_tokens, <famCol>)` — the
    * integer-micro corpus-frequency score SHARED by tx_unigram_lm (which
    * reports it) and tx_quality_buckets (which derives its cutoffs from
    * it); one definition so the bucket boundaries are provably computed
    * from the same score the LM query reports. Shape: one token shuffle
    * (map-side combined), vocab join NOT broadcast (billions of entries at
    * 100 TB), corpus total as a broadcast 1-row scalar. */
  private def familiarity(s: org.apache.spark.sql.SparkSession, d: String,
      famCol: String): org.apache.spark.sql.DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(toks)).as("tok"))
    val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = tk.agg(count(lit(1)).as("tot"))
    tk.join(freq, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr("(1000000 * cnt) div tot")).as(famCol))
  }

  /** Shared with graft.streaming.DocsStream's landing-zone quality gate —
    * the gate's verdict must be the same expression batch and stream. */
  private[graft] val stopList = "('the', 'a', 'of', 'and', 'to')"

  /** PII battery patterns, shared by [[defs tx_pii_scrub]] and the
    * streaming landing gate (graft.streaming.DocsStream.piiGate) so batch
    * scrub and stream monitor agree on what counts as PII. Escape-free
    * (character classes only) so Java regex and RE2 read them identically;
    * applied in declaration order (email → ip → phone → id), each class
    * counted on the PREVIOUS stage's scrubbed output. */
  private[graft] val PiiEmail = "[a-z0-9._]+@[a-z0-9.]+"
  private[graft] val PiiIp = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
  private[graft] val PiiPhone = "[0-9]{3}-[0-9]{4}"
  private[graft] val PiiId = "[0-9]{6,}"

  /** DuckDB replay of [[mixtureRates]] (CTE chain ending in `r`) — a VAL
    * ABOVE `defs` on purpose: `defs` interpolates it at object init, and a
    * lexically-later val would still be null there. */
  private[graft] val duckMixtureChain =
    """st AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |w AS (SELECT source, n_docs,
      |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000.0) AS BIGINT) AS weight_fp
      |      FROM st),
      |t AS (SELECT SUM(weight_fp) AS sw, SUM(n_docs) AS nd FROM w),
      |r AS (SELECT source, n_docs, weight_fp,
      |        CAST(((nd // 5) * weight_fp) // sw AS BIGINT) AS n_target,
      |        CAST(((((nd // 5) * weight_fp) // sw) * 4294967296) // n_docs AS BIGINT)
      |          AS thresh
      |      FROM w, t)""".stripMargin


  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "tx_tokens",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr(s"size($toks)").as("n_tokens"),
          expr("CAST(length(replace(text, ' ', '')) AS INTEGER)").as("n_chars_nospace"),
          // BPE-ish estimate: alnum runs + residual punctuation, ~chars/4 floor
          expr(s"CAST(size($toks) + length(replace(text, ' ', '')) div 16 AS INTEGER)")
            .as("n_tokens_bpe_est"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS n_tokens,
              |       CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_chars_nospace,
              |       CAST(len(string_split_regex(trim(text), ' +'))
              |            + length(replace(text, ' ', '')) // 16 AS INTEGER) AS n_tokens_bpe_est
              |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "tx_lang_profile",
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .withColumn("avg_chars_micro", expr("(sum_chars * 1000000) div n_docs"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |       COUNT(DISTINCT source) AS n_sources,
             |       (CAST(SUM(n_chars) AS BIGINT) * 1000000) // COUNT(*) AS avg_chars_micro
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "tx_quality",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr(nTokensAs("INT")).as("n_tokens"),
          // NULL-total like n_tokens: the oracle's len(list_filter(NULL))
          // is NULL while non-ANSI size() would return -1.
          expr(s"CAST(CASE WHEN text IS NULL THEN NULL ELSE " +
            s"size(filter($toks, t -> t IN $stopList)) END AS INT)").as("n_stop"))
        .withColumn("pct_stop", expr("(100 * n_stop) div n_tokens"))
        .withColumn("quality_ok",
          expr("n_tokens BETWEEN 10 AND 1000 AND (100 * n_stop) div n_tokens < 40"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS n_tokens,
              |       CAST(len(list_filter(string_split_regex(trim(text), ' +'),
              |                            t -> t IN $stopList)) AS INTEGER) AS n_stop,
              |       (100 * len(list_filter(string_split_regex(trim(text), ' +'),
              |                              t -> t IN $stopList)))
              |         // len(string_split_regex(trim(text), ' +')) AS pct_stop,
              |       (len(string_split_regex(trim(text), ' +')) BETWEEN 10 AND 1000)
              |         AND ((100 * len(list_filter(string_split_regex(trim(text), ' +'),
              |                                     t -> t IN $stopList)))
              |              // len(string_split_regex(trim(text), ' +')) < 40) AS quality_ok
              |FROM documents ORDER BY doc_id""".stripMargin)),

    /** Heuristic n-gram language ID: score the token stream against small
      * per-language marker vocabularies, argmax with a fixed precedence on
      * ties. (Real trigram profiles would be loaded as a broadcast dim; the
      * fixture vocabulary is synthetic so markers are illustrative.) */
    QueryDef(
      "tx_langid",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          col("lang"),
          expr(s"size(filter($toks, t -> t IN ('the', 'a', 'and', 'fast', 'slow')))").as("s_en"),
          expr(s"size(filter($toks, t -> t IN ('data', 'row', 'table', 'batch')))").as("s_de"),
          expr(s"size(filter($toks, t -> t IN ('query', 'filter', 'merge', 'sort')))").as("s_fr"))
        .withColumn("pred_lang",
          expr("CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en' " +
            "WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END"))
        .orderBy("doc_id"),
      Some("""WITH sc AS (
             |  SELECT doc_id, lang,
             |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
             |         t -> t IN ('the', 'a', 'and', 'fast', 'slow'))) AS INTEGER) AS s_en,
             |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
             |         t -> t IN ('data', 'row', 'table', 'batch'))) AS INTEGER) AS s_de,
             |    CAST(len(list_filter(string_split_regex(trim(text), ' +'),
             |         t -> t IN ('query', 'filter', 'merge', 'sort'))) AS INTEGER) AS s_fr
             |  FROM documents)
             |SELECT doc_id, lang, s_en, s_de, s_fr,
             |       CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
             |            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
             |FROM sc ORDER BY doc_id""".stripMargin)),

    /** Top-3 word bigrams per language: n-gram frequency analytics —
      * posexplode+lead bigram stream → (lang, bigram) counts → windowed
      * top-k. Two shuffles; the count shuffle is partial-aggregated. */
    QueryDef(
      "tx_top_bigrams",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val rankW = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("bigram").asc)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(expr(toks)).as(Seq("pos", "w0")))
          .withColumn("w1", lead(col("w0"), 1).over(byDoc))
          .filter(col("w1").isNotNull)
          .select(col("lang"), concat_ws(" ", col("w0"), col("w1")).as("bigram"))
          .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(rankW))
          .filter(col("rk") <= 3)
          .select(col("lang"), col("bigram"), col("n"), col("rk"))
          .orderBy("lang", "rk")
      },
      Some("""WITH toksq AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS t
             |               FROM documents),
             |bg AS (SELECT lang, t[i] || ' ' || t[i + 1] AS bigram
             |       FROM toksq, unnest(range(1, len(t))) AS u(i)),
             |cnt AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2)
             |SELECT lang, bigram, n, CAST(rk AS INTEGER) AS rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY lang
             |                               ORDER BY n DESC, bigram ASC) AS rk
             |  FROM cnt)
             |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin)),

    /** Repetition quality signals (the Gopher-rules family of pretraining
      * filters, Rae et al. 2021): fraction of repeated tokens, most-frequent-
      * token share, and duplicate-bigram share — high values flag boilerplate
      * and degenerate text. Integer percent via `div` for oracle bit-parity.
      * Token and bigram stats are two aggregations over ONE exploded token
      * stream (the window exchange is reused); percentages derive from the
      * per-token counts, so no second scan of the documents. */
    QueryDef(
      "tx_repetition",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val stream = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(expr(toks)).as(Seq("pos", "w0")))
          .withColumn("w1", lead(col("w0"), 1).over(byDoc))
          .withColumn("bigram",
            when(col("w1").isNotNull, concat_ws(" ", col("w0"), col("w1"))))
        val tokStats = stream.groupBy(col("doc_id"), col("w0"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
            max("c").as("top_c"))
        val bgStats = stream.filter(col("w1").isNotNull)
          .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum("c").as("n_bg"), count(lit(1)).as("n_bg_distinct"))
        tokStats.join(bgStats, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tokens"),
            expr("(100 * (n_tokens - n_distinct)) div n_tokens").as("dup_token_pct"),
            expr("(100 * top_c) div n_tokens").as("top_token_pct"),
            expr("(100 * (coalesce(n_bg, 0) - coalesce(n_bg_distinct, 0))) " +
              "div greatest(coalesce(n_bg, 0), 1)").as("dup_bigram_pct"))
          .orderBy("doc_id")
      },
      Some("""WITH toksq AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
             |tok AS (SELECT doc_id, unnest(t) AS w FROM toksq),
             |tc  AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
             |ts  AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |               COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_c
             |        FROM tc GROUP BY 1),
             |bgl AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             |                              i -> t[i] || ' ' || t[i + 1])) AS bg
             |        FROM toksq),
             |bc  AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgl GROUP BY 1, 2),
             |bs  AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bg,
             |               COUNT(*) AS n_bg_distinct FROM bc GROUP BY 1)
             |SELECT ts.doc_id, n_tokens,
             |       (100 * (n_tokens - n_distinct)) // n_tokens AS dup_token_pct,
             |       (100 * top_c) // n_tokens AS top_token_pct,
             |       (100 * (COALESCE(n_bg, 0) - COALESCE(n_bg_distinct, 0)))
             |         // greatest(COALESCE(n_bg, 0), 1) AS dup_bigram_pct
             |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
             |ORDER BY ts.doc_id""".stripMargin)),

    /** Overlapping token-window chunking — the preprocessing step feeding
      * embedding/RAG pipelines: 50-token chunks advancing by 40 (10-token
      * overlap), stable (doc_id, chunk_idx) identity, md5 fingerprint per
      * chunk. One narrow pass (HOF sequence → slice inside codegen, then
      * posexplode); chunk count per doc is ceil-div arithmetic both engines
      * share. At 100 TB this is the shape that matters: no shuffle, output
      * partitioning inherits the scan. */
    QueryDef(
      "tx_chunks",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), expr(toks).as("t"))
        .withColumn("n", size(col("t")))
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, (greatest(n - 50, 0) + 39) div 40), i -> " +
              "slice(t, CAST(i * 40 + 1 AS INT), 50))")).as(Seq("chunk_idx", "ctoks")))
        .select(col("doc_id"),
          col("chunk_idx").cast("int").as("chunk_idx"),
          size(col("ctoks")).as("n_chunk_tokens"),
          md5(array_join(col("ctoks"), " ")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH toksq AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
             |c AS (SELECT doc_id, t,
             |             unnest(range(0, (greatest(len(t) - 50, 0) + 39) // 40 + 1)) AS idx
             |      FROM toksq)
             |SELECT doc_id, CAST(idx AS INTEGER) AS chunk_idx,
             |       CAST(len(list_slice(t, idx * 40 + 1, idx * 40 + 50)) AS INTEGER)
             |         AS n_chunk_tokens,
             |       md5(array_to_string(list_slice(t, idx * 40 + 1, idx * 40 + 50), ' '))
             |         AS chunk_fp
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    /** Unigram-LM familiarity score — corpus-frequency scoring in integer
      * micro-units, the quality-filter signal a real pipeline derives from a
      * reference LM (here: the corpus's own unigram distribution; a doc of
      * common tokens scores high, rare-token noise scores low). Integer
      * arithmetic only — (1e6 × count) div total per token, summed per doc —
      * so both engines agree bit-for-bit with no float log parity games.
      * The 1e6 multiplier keeps `1e6 × cnt` inside BIGINT up to cnt ≈
      * 9.2e12 — a single token occurring nine trillion times — so the
      * arithmetic holds at the 100 TB (~1e13-token) target where a 1e9
      * multiplier would overflow on stop words.
      *
      * Scale shape: token counts are ONE shuffle on the token (map-side
      * combined); the per-doc score joins tokens→counts on the token key
      * (vocab is NOT broadcast — at 100 TB it's billions of entries) and
      * re-aggregates per doc. The corpus total rides along as a broadcast
      * 1-row scalar. */
    QueryDef(
      "tx_unigram_lm",
      (s, d) => familiarity(s, d, "familiarity_micro").orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
             |            FROM documents),
             |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
             |tot AS (SELECT COUNT(*) AS tot FROM tk)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |       CAST(SUM((1000000 * cnt) // tot) AS BIGINT) AS familiarity_micro
             |FROM tk JOIN freq USING (tok), tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /** BIGRAM-LM familiarity — the unigram score's conditional upgrade: per
      * bigram position, (1e6 × count(w0 w1)) div count(w0-as-bigram-head),
      * summed per doc. A doc of common words in UNCOMMON order now scores
      * low where tx_unigram_lm cannot tell — the signal real LM-based
      * quality filters add with context length. Integer arithmetic only
      * (same 1e6 micro-unit discipline and BIGINT headroom analysis as
      * tx_unigram_lm). Scale shape: ONE bigram stream (posexplode + lead
      * over the doc_id window) feeds both count tables; bigram and head
      * counts are partially-aggregated shuffles on their keys; the two
      * scoring joins key on (w0, w1) and w0 — vocab tables are
      * corpus-derived and deliberately NOT broadcast; one doc_id shuffle
      * re-aggregates. Docs under 2 tokens have no bigram and are absent in
      * both engines. */
    QueryDef(
      "tx_bigram_lm",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(expr(toks)).as(Seq("pos", "w0")))
          .withColumn("w1", lead(col("w0"), 1).over(w))
          .filter(col("w1").isNotNull)
          .select(col("doc_id"), col("w0"), col("w1"))
        val c2 = bg.groupBy(col("w0"), col("w1")).agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy(col("w0")).agg(count(lit(1)).as("c1"))
        bg.join(c2, Seq("w0", "w1")).join(c1, Seq("w0"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(expr("(1000000 * c2) div c1")).as("familiarity_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, i AS pos, t[i+1] AS w0, t[i+2] AS w1
             |  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t
             |        FROM documents), unnest(range(0, len(t) - 1)) AS u(i)
             |  WHERE len(t) >= 2),
             |c2 AS (SELECT w0, w1, COUNT(*) AS c2 FROM tk GROUP BY 1, 2),
             |c1 AS (SELECT w0, COUNT(*) AS c1 FROM tk GROUP BY 1)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |       CAST(SUM((1000000 * c2.c2) // c1.c1) AS BIGINT) AS familiarity_micro
             |FROM tk JOIN c2 USING (w0, w1) JOIN c1 USING (w0)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    /** Document fingerprint: md5 of the whitespace-normalized lowercase text
      * — the exact-dedup key (see graft.dedup.Dedup). */
    QueryDef(
      "tx_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), " +", " "))).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    /** SEQUENCE PACKING: lay each source's documents end-to-end (ordered by
      * doc_id) into fixed 256-token training windows — the concat-and-cut
      * packing every LLM pretraining pipeline runs before batching. Emits,
      * per doc, its first/last window index and offset; `is_split` marks a
      * doc straddling a window boundary. One window shuffle partitioned by
      * source — the packing unit IS the parallelism unit, so at 100 TB the
      * pipeline packs per (source, shard) to keep partitions bounded; the
      * per-source prefix sum itself is the standard sequential scan within a
      * partition (no cross-partition dependency). Integer-only arithmetic:
      * Spark `div` truncation equals DuckDB `//` floor on these non-negative
      * operands. */
    QueryDef(
      "tx_pack_sequences",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            expr(nTokensAs("BIGINT")).as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .select(Seq(col("source"), col("doc_id"), col("n_tokens"))
            ++ windowIndexCols: _*)
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
             |                  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
             |           FROM documents),
             |c AS (SELECT source, doc_id, n_tokens,
             |             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |      FROM t)
             |SELECT source, doc_id, n_tokens,
             |       (cum - n_tokens) // $PackWin AS win_first,
             |       (cum - 1) // $PackWin AS win_last,
             |       (cum - n_tokens) % $PackWin AS offset_in_win,
             |       (cum - n_tokens) // $PackWin <> (cum - 1) // $PackWin AS is_split
             |FROM c ORDER BY source, doc_id""".stripMargin)),

    /** SHARDED SEQUENCE PACKING — the 100 TB shape of tx_pack_sequences.
      * The unsharded variant's window puts an entire source in ONE task; a
      * popular source is terabytes, a straggler/OOM at scale. Two-level scan
      * instead: shard = doc_id div 64 (width is a tunable — at scale it grows
      * with the corpus so the shard COUNT stays bounded and the carry table
      * stays broadcastable);
      *  level 1: per-(source, shard) prefix sum — every window partition is
      *           bounded by the shard width, never by a source's size;
      *  level 2: per-shard token totals (n_docs/64 rows), an exclusive
      *           running sum per source = each shard's carry-in offset,
      *           broadcast-joined back.
      * cum = carry_in + cum_in_shard reproduces the unsharded cumulative sum
      * EXACTLY (same oracle output shape as tx_pack_sequences), because
      * shard order is doc_id order. This is the classic two-level parallel
      * prefix scan expressed in pure DataFrame ops. */
    QueryDef(
      "tx_pack_sequences_sharded",
      (s, d) => shardedCum(
          Tables.documents(s, d)
            .select(col("source"), col("doc_id"),
              expr(nTokensAs("BIGINT")).as("n_tokens")),
          Seq("source"))
        .select(Seq(col("source"), col("doc_id"), col("n_tokens"))
          ++ windowIndexCols: _*)
        .orderBy("source", "doc_id"),
      Some(s"""WITH t AS (SELECT source, doc_id,
             |                  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
             |                  doc_id // 64 AS shard
             |           FROM documents),
             |s AS (SELECT source, shard, doc_id, n_tokens,
             |             CAST(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in_shard
             |      FROM t),
             |c AS (SELECT source, shard,
             |             COALESCE(CAST(SUM(SUM(n_tokens)) OVER (PARTITION BY source ORDER BY shard
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS carry_in
             |      FROM t GROUP BY source, shard)
             |SELECT s.source, s.doc_id, s.n_tokens,
             |       (carry_in + cum_in_shard - n_tokens) // $PackWin AS win_first,
             |       (carry_in + cum_in_shard - 1) // $PackWin AS win_last,
             |       (carry_in + cum_in_shard - n_tokens) % $PackWin AS offset_in_win,
             |       (carry_in + cum_in_shard - n_tokens) // $PackWin
             |         <> (carry_in + cum_in_shard - 1) // $PackWin AS is_split
             |FROM s JOIN c USING (source, shard) ORDER BY source, doc_id""".stripMargin)),

    /** SPAN CORRUPTION (the T5/span-denoising objective prep): mask every
      * 5th 3-token span — positions i with (i div 3) % 5 = 0 — replacing
      * each masked span with ONE `<extra_id_k>` sentinel (k = i div 15, the
      * span's order among masked spans) and emitting the corrupted input
      * and the target (the masked tokens, in order) as md5 digests plus
      * exact counts. Deterministic by construction — no RNG, the span
      * schedule is pure integer arithmetic — so the corruption is
      * reproducible across engines, runs, and shards, which is what makes
      * a distributed objective-prep pass auditable (re-running a shard
      * yields byte-identical training pairs). ~20% token corruption rate,
      * the T5 default neighborhood.
      *
      * Scale shape: entirely row-local — one narrow projection of array
      * HOFs inside codegen, zero shuffles before the presentation sort.
      * The corruption schedule being positional (not content-keyed) means
      * NO skew by construction. */
    QueryDef(
      "tx_mask_spans",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), expr(toks).as("tk"))
        .withColumn("n_tokens", expr("CAST(size(tk) AS BIGINT)"))
        .withColumn("corrupted", expr(
          "array_join(filter(transform(sequence(0, CAST(n_tokens AS INT) - 1), " +
            "i -> CASE WHEN (i div 3) % 5 <> 0 THEN tk[i] " +
            "WHEN i % 3 = 0 THEN concat('<extra_id_', CAST(i div 15 AS STRING), '>') " +
            "ELSE NULL END), x -> x IS NOT NULL), ' ')"))
        .withColumn("target", expr(
          "array_join(transform(filter(sequence(0, CAST(n_tokens AS INT) - 1), " +
            "i -> (i div 3) % 5 = 0), i -> tk[i]), ' ')"))
        .withColumn("n_masked", expr(
          "CAST(size(filter(sequence(0, CAST(n_tokens AS INT) - 1), " +
            "i -> (i div 3) % 5 = 0)) AS BIGINT)"))
        .select(col("doc_id"), col("n_tokens"), col("n_masked"),
          md5(col("corrupted")).as("corrupted_md5"),
          md5(col("target")).as("target_md5"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk,
             |                  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
             |                    AS n_tokens
             |           FROM documents),
             |m AS (SELECT doc_id, n_tokens,
             |        array_to_string(list_filter(list_transform(
             |          range(0, n_tokens), i ->
             |            CASE WHEN (i // 3) % 5 <> 0 THEN tk[CAST(i + 1 AS INTEGER)]
             |                 WHEN i % 3 = 0
             |                   THEN '<extra_id_' || CAST(i // 15 AS VARCHAR) || '>'
             |                 ELSE NULL END), x -> x IS NOT NULL), ' ') AS corrupted,
             |        array_to_string(list_transform(list_filter(
             |          range(0, n_tokens), i -> (i // 3) % 5 = 0),
             |          i -> tk[CAST(i + 1 AS INTEGER)]), ' ') AS target,
             |        CAST(len(list_filter(range(0, n_tokens), i -> (i // 3) % 5 = 0))
             |             AS BIGINT) AS n_masked
             |      FROM t)
             |SELECT doc_id, n_tokens, n_masked,
             |       md5(corrupted) AS corrupted_md5, md5(target) AS target_md5
             |FROM m ORDER BY doc_id""".stripMargin)),

    /** BLOCKLIST MASKING: count, per document, the tokens that belong to a
      * corpus-derived blocklist (here: the 5 most frequent tokens, ties
      * broken by token — the PII-scrub / vocabulary-filter plumbing; the
      * fixture text has no PII patterns, so the blocklist is derived so the
      * masking actually fires). At scale the blocklist is tiny and rides a
      * BROADCAST to the token stream — one corpus-count shuffle to build it,
      * one doc_id shuffle to re-aggregate, no join shuffle. */
    QueryDef(
      "tx_mask_blocklist",
      (s, d) => {
        val tk = Tables.documents(s, d)
          .select(col("doc_id"), explode(expr(toks)).as("tok"))
        val top = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(5)
          .select(col("tok"), lit(1).as("hit"))
        tk.join(broadcast(top), Seq("tok"), "left_outer")
          .groupBy(col("doc_id"))
          .agg(count(col("hit")).as("n_masked"), count(lit(1)).as("n_total"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
             |            FROM documents),
             |top AS (SELECT tok FROM tk GROUP BY tok
             |        ORDER BY COUNT(*) DESC, tok LIMIT 5)
             |SELECT tk.doc_id, COUNT(top.tok) AS n_masked, COUNT(*) AS n_total
             |FROM tk LEFT JOIN top ON tk.tok = top.tok
             |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin)),

    /** CORPUS MIXING to a token budget: downsample the corpus to 1/4 of its
      * tokens while EQUALIZING sources — each source gets an equal share of
      * the budget, so over-represented sources are cut hard and small
      * sources keep everything (rate capped at 1000‰). This is the
      * source-weighting step every pretraining data pipeline runs before
      * packing. Sampling is the deterministic md5-permille discipline
      * (an_hash_sample): reproducible across engines, partitionings and
      * reruns. Distributed shape: one per-source token count (map-side
      * partial), two scalar aggregates broadcast back, then a narrow
      * filter — the corpus is never shuffled. All-integer rate arithmetic,
      * identically nested in both engines. */
    QueryDef(
      "tx_mix_budget",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr(s"CAST(size($toks) AS BIGINT)").as("n_tokens"),
            expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 1000")
              .as("bucket"))
        val perSource = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("t_s"))
        val global = perSource.agg(
          sum(col("t_s")).as("total"), count(lit(1)).as("nsrc"))
        val rates = perSource.crossJoin(broadcast(global))
          .select(col("source"),
            expr("least(CAST(1000 AS BIGINT), (1000 * ((total div 4) div nsrc)) div t_s)")
              .as("rate_permille"))
        docs.join(broadcast(rates), "source")
          .filter(col("bucket") < col("rate_permille"))
          .groupBy(col("source"), col("rate_permille"))
          .agg(count(lit(1)).as("n_docs_sampled"), sum(col("n_tokens")).as("n_tokens_sampled"))
          .orderBy("source")
      },
      Some("""WITH docs AS (SELECT doc_id, source,
             |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket
             |  FROM documents),
             |per_source AS (SELECT source, SUM(n_tokens) AS t_s FROM docs GROUP BY source),
             |g AS (SELECT SUM(t_s) AS total, COUNT(*) AS nsrc FROM per_source),
             |rates AS (SELECT source,
             |    CAST(least(CAST(1000 AS BIGINT), (1000 * ((total // 4) // nsrc)) // t_s) AS BIGINT)
             |      AS rate_permille
             |  FROM per_source, g)
             |SELECT d.source, r.rate_permille,
             |       COUNT(*) AS n_docs_sampled,
             |       CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens_sampled
             |FROM docs d JOIN rates r ON d.source = r.source
             |WHERE d.bucket < r.rate_permille
             |GROUP BY d.source, r.rate_permille ORDER BY d.source""".stripMargin)),

    /** TF-IDF-style term salience: top-5 terms per document scored by
      * `tf/df` in integer parts-per-million (reciprocal document frequency
      * instead of log-idf, so the score is EXACT integer arithmetic both
      * engines compute identically — log() ulp differences could flip ranks
      * at rounding boundaries; 1/df preserves the idf ordering for a fixed
      * corpus). Shape: one shuffle for per-doc term counts, one vocab-sized
      * aggregate for document frequencies, a term-keyed join (NOT broadcast
      * — at 100 TB the vocabulary is arbitrarily large and Zipf-skewed, the
      * tx_unigram_lm discipline; AQE splits the hot stopword keys), and a
      * per-doc top-k window. */
    QueryDef(
      "tx_tfidf",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(expr(toks)).as("term"))
        val tf = tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tok.distinct().groupBy(col("term"))
          .agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score_ppm").desc, col("term").asc)
        tf.join(df, "term")
          .withColumn("score_ppm", expr("(tf * 1000000) div df"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score_ppm"), col("rank").cast("int").as("rank"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(string_split_regex(trim(text), ' +')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
             |df AS (SELECT term, COUNT(*) AS df
             |       FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
             |sc AS (SELECT t.doc_id, t.term, t.tf, d.df,
             |         (t.tf * 1000000) // d.df AS score_ppm
             |       FROM tf t JOIN df d USING (term))
             |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             |       CAST(score_ppm AS BIGINT) AS score_ppm, CAST(rank AS INTEGER) AS rank
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY score_ppm DESC, term ASC) AS rank FROM sc)
             |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin)),

    /** WINNOWING-STYLE robust fingerprints (the MOSS near-copy detector
      * shape): hash every 4-token shingle, slide a 5-window over the hash
      * sequence taking each window's MINIMUM, and keep the distinct minima
      * — guarantees any shared run of ≥ 8 tokens contributes at least one
      * common fingerprint, at ~1/w the storage of the full shingle set.
      * Entirely array higher-order functions over each row (one narrow
      * codegen pass, zero shuffles before the final ORDER BY); emitted as
      * per-doc checksums (count/min/max/sum of the distinct minima, 12 hex
      * digits per hash so the sum stays far inside BIGINT) pinning every
      * fingerprint for the oracle. Docs under 8 tokens have no full window
      * and are filtered identically in both engines. */
    QueryDef(
      "tx_winnowing",
      (s, d) =>
        winnowedFpRows(s, d)
          .groupBy(col("doc_id"), col("n_grams"))
          .agg(count(lit(1)).as("n_fps"),
            min(col("fp")).as("fp_min"), max(col("fp")).as("fp_max"),
            sum(col("fp")).as("fp_sum"))
          .select(col("doc_id"), col("n_grams"), col("n_fps"),
            col("fp_min"), col("fp_max"), col("fp_sum"))
          .orderBy("doc_id"),
      Some(s"""WITH $duckWinnowChain
             |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
             |       CAST(len(fps) AS BIGINT) AS n_fps,
             |       CAST(list_min(fps) AS BIGINT) AS fp_min,
             |       CAST(list_max(fps) AS BIGINT) AS fp_max,
             |       CAST(list_sum(fps) AS BIGINT) AS fp_sum
             |FROM m ORDER BY doc_id""".stripMargin)),

    /** QUALITY BUCKETS — the CCNet head/middle/tail split: score every doc
      * with the unigram-LM familiarity (same integer micro-unit scoring as
      * [[tx_unigram_lm]]), derive cutoffs from the corpus (head ≥ mean,
      * middle ≥ mean/2, else tail), and report each bucket's volume. This
      * is the production shape — CCNet applies LM-perplexity CUTOFF
      * CONSTANTS to bucket a corpus, it never globally ranks it — so there
      * is NO global sort/ntile anywhere: the mean is a 1-row broadcast
      * scalar, bucketing is a map-side CASE, and the final aggregate has 3
      * keys. Integer div throughout; both engines agree bit-for-bit. */
    QueryDef(
      "tx_quality_buckets",
      (s, d) => {
        val fam = familiarity(s, d, "fam_micro")
        val cut = fam.agg(expr("sum(fam_micro) div count(1)").as("mean_micro"))
        fam.crossJoin(broadcast(cut))
          .withColumn("bucket", expr(
            "CASE WHEN fam_micro >= mean_micro THEN 'head' " +
              "WHEN fam_micro >= mean_micro div 2 THEN 'middle' " +
              "ELSE 'tail' END"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
            min(col("fam_micro")).as("fam_min"), max(col("fam_micro")).as("fam_max"))
          .orderBy("bucket")
      },
      Some("""WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
             |            FROM documents),
             |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
             |tot AS (SELECT COUNT(*) AS tot FROM tk),
             |fam AS (SELECT doc_id, COUNT(*) AS n_tokens,
             |               CAST(SUM((1000000 * cnt) // tot) AS BIGINT) AS fam_micro
             |        FROM tk JOIN freq USING (tok), tot
             |        GROUP BY doc_id),
             |cut AS (SELECT CAST(SUM(fam_micro) // COUNT(*) AS BIGINT) AS mean_micro
             |        FROM fam)
             |SELECT CASE WHEN fam_micro >= mean_micro THEN 'head'
             |            WHEN fam_micro >= mean_micro // 2 THEN 'middle'
             |            ELSE 'tail' END AS bucket,
             |       COUNT(*) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |       MIN(fam_micro) AS fam_min, MAX(fam_micro) AS fam_max
             |FROM fam, cut
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    /** VOCABULARY PRUNING STATS — the pre-pass of every tokenizer/LM vocab
      * build: per language, how many token TYPES survive a min-count cutoff
      * (here ≥5) and what share of the token MASS they cover. The coverage
      * permille is the number that decides the cutoff — BPE training wants
      * types small and coverage near 1000. Scale shape: two partially-
      * aggregated shuffles, (lang, tok) then lang — map-side combine
      * collapses each partition to its local vocab before either exchange;
      * no joins, no windows, no broadcasts. Integer arithmetic only. */
    QueryDef(
      "tx_vocab_prune",
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("lang"), explode(expr(toks)).as("tok"))
          .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
        tc.groupBy(col("lang"))
          .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
            sum(when(col("cnt") >= 5, 1L).otherwise(0L)).as("n_types_kept"),
            sum(when(col("cnt") >= 5, col("cnt")).otherwise(0L)).as("n_tokens_kept"))
          .withColumn("coverage_permille", expr("(1000 * n_tokens_kept) div n_tokens"))
          .orderBy("lang")
      },
      Some("""WITH tk AS (SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS tok
             |            FROM documents),
             |tc AS (SELECT lang, tok, COUNT(*) AS cnt FROM tk GROUP BY 1, 2)
             |SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             |       COUNT(*) AS n_types,
             |       CAST(SUM(CASE WHEN cnt >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_kept,
             |       CAST(SUM(CASE WHEN cnt >= 5 THEN cnt ELSE 0 END) AS BIGINT)
             |         AS n_tokens_kept,
             |       (1000 * CAST(SUM(CASE WHEN cnt >= 5 THEN cnt ELSE 0 END) AS BIGINT))
             |         // CAST(SUM(cnt) AS BIGINT) AS coverage_permille
             |FROM tc GROUP BY lang ORDER BY lang""".stripMargin)),

    /** CONTENT-DEFINED CHUNKING (CDC) — chunk boundaries from the content
      * itself (a 4-gram rolling hash hitting `% 16 == 0`), not fixed
      * offsets: insert a sentence mid-doc and only the chunks AROUND the
      * edit change identity, where [[tx_chunks]]' fixed windows all shift.
      * That edit-stability is why storage dedup and near-dup corpus
      * screening chunk this way. Emitted per chunk: gram count, additive
      * fingerprint, position span. Same one-window discipline as
      * winnowedFpRows — the lead() gram assembly and the boundary running
      * sum share ONE (doc_id, pos) sort; the grouped rollup keys on
      * (doc_id, chunk_seq) with map-side combine. */
    QueryDef(
      "tx_cdc_chunks",
      (s, d) =>
        cdcChunkIndex(s, d)
          .select(col("doc_id"), col("chunk_seq"), col("cg").as("n_grams"),
            col("cfp").as("fp_sum"), col("pos_first"), col("pos_last"))
          .orderBy("doc_id", "chunk_seq"),
      Some(s"""WITH $duckCdcChain
             |SELECT doc_id, chunk_seq, COUNT(*) AS n_grams,
             |       CAST(SUM(ghash) AS BIGINT) AS fp_sum,
             |       MIN(pos) AS pos_first, MAX(pos) AS pos_last
             |FROM c GROUP BY doc_id, chunk_seq
             |ORDER BY doc_id, chunk_seq""".stripMargin)),

    /** PII SCRUBBING — the privacy-redaction battery every pretraining
      * pipeline runs before text ships: emails, IPv4 addresses, phone-shaped
      * numbers and long account-number digit runs are replaced by typed
      * placeholder tags, with per-document redaction counts as the audit
      * output. The fixture corpus is synthetic and PII-free, so the query
      * PLANTS a deterministic contact footer derived from doc_id (the same
      * concat expression in both engines) and then proves the scrubber
      * strips exactly those spans — on a real corpus the identical battery
      * runs over the raw text. Patterns are written escape-free (character
      * classes only) so Java regex and RE2 agree literally; each pattern is
      * counted on the PREVIOUS stage's output and replaced in the same
      * order (email → ip → phone → id), so a span consumed by an earlier
      * stage can never double-count in a later one. Distributed shape: a
      * narrow per-row map — no shuffle, no UDF, all four regexes inside one
      * whole-stage-codegen projection; the only ordering cost is the
      * driver-contract ORDER BY. */
    QueryDef(
      "tx_pii_scrub",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr("concat(text, ' contact user', CAST(doc_id AS STRING), " +
            "'@example.com tel 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
            "' host 10.0.', CAST(doc_id % 256 AS STRING), '.', " +
            "CAST((doc_id * 7) % 256 AS STRING), ' acct ', " +
            "CAST(100000 + doc_id AS STRING))").as("body"))
        .withColumn("n_emails",
          expr(s"CAST(regexp_count(body, '$PiiEmail') AS BIGINT)"))
        .withColumn("t1", expr(s"regexp_replace(body, '$PiiEmail', '<EMAIL>')"))
        .withColumn("n_ips", expr(s"CAST(regexp_count(t1, '$PiiIp') AS BIGINT)"))
        .withColumn("t2", expr(s"regexp_replace(t1, '$PiiIp', '<IP>')"))
        .withColumn("n_phones",
          expr(s"CAST(regexp_count(t2, '$PiiPhone') AS BIGINT)"))
        .withColumn("t3", expr(s"regexp_replace(t2, '$PiiPhone', '<PHONE>')"))
        .withColumn("n_ids", expr(s"CAST(regexp_count(t3, '$PiiId') AS BIGINT)"))
        .withColumn("clean", expr(s"regexp_replace(t3, '$PiiId', '<ID>')"))
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("n_ids"), md5(col("clean")).as("clean_md5"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id,
             |  text || ' contact user' || CAST(doc_id AS VARCHAR)
             |       || '@example.com tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |       || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             |       || CAST((doc_id * 7) % 256 AS VARCHAR)
             |       || ' acct ' || CAST(100000 + doc_id AS VARCHAR) AS body
             |  FROM documents),
             |s1 AS (SELECT doc_id,
             |  CAST(len(regexp_extract_all(body, '$PiiEmail')) AS BIGINT) AS n_emails,
             |  regexp_replace(body, '$PiiEmail', '<EMAIL>', 'g') AS t1 FROM b),
             |s2 AS (SELECT doc_id, n_emails,
             |  CAST(len(regexp_extract_all(t1, '$PiiIp')) AS BIGINT) AS n_ips,
             |  regexp_replace(t1, '$PiiIp', '<IP>', 'g') AS t2 FROM s1),
             |s3 AS (SELECT doc_id, n_emails, n_ips,
             |  CAST(len(regexp_extract_all(t2, '$PiiPhone')) AS BIGINT) AS n_phones,
             |  regexp_replace(t2, '$PiiPhone', '<PHONE>', 'g') AS t3 FROM s2),
             |s4 AS (SELECT doc_id, n_emails, n_ips, n_phones,
             |  CAST(len(regexp_extract_all(t3, '$PiiId')) AS BIGINT) AS n_ids,
             |  regexp_replace(t3, '$PiiId', '<ID>', 'g') AS clean FROM s3)
             |SELECT doc_id, n_emails, n_ips, n_phones, n_ids, md5(clean) AS clean_md5
             |FROM s4 ORDER BY doc_id""".stripMargin)),

    /** BPE MERGE TRAINING (see [[bpeMerges]]): the first [[BpeRounds]]
      * learned merges — (rank, lhs, rhs, merged, weighted pair count) —
      * trained on the corpus word-frequency dictionary with exact
      * deterministic selection and greedy application; the oracle replays
      * every round. */
    QueryDef(
      "tx_bpe_merges",
      (s, d) => bpeMergesDf(s, d),
      Some(duckBpeSql())),

    /** BPE application (see [[bpeApplyDf]]): per-doc word and subword
      * counts under the learned merge table — the corpus-side half of the
      * tokenizer story (train [[bpeMerges]] / apply here). */
    QueryDef(
      "tx_bpe_apply",
      (s, d) => bpeApplyDf(s, d),
      Some(duckBpeApplySql())),

    /** DATA-MIXTURE SAMPLING — temperature-weighted source mixing, the
      * knob every pretraining data recipe turns: source s gets sampling
      * weight ∝ n_s^(1/2) (temperature α = 0.5 flattens the source
      * distribution so small high-quality sources are up-weighted), a
      * total budget of ⌊N/5⌋ documents is split across sources by those
      * weights, and each source's slice is drawn DETERMINISTICALLY by
      * hash threshold: keep doc iff its 32-bit md5 prefix <
      * target/n_s · 2³². Emits the full per-source accounting — count,
      * fixed-point weight, integer target, realized sample size, and a
      * doc_id-sum checksum of the picked set (so the oracle verifies the
      * exact membership, not just counts).
      *
      * Scale shape: the per-source stats and thresholds are an O(sources)
      * table attached by BROADCAST; selection is a pure scan-parallel
      * predicate on a codegen'd hash ([[graft.functions.Md5Prefix48]]) —
      * no sort, no window, no shuffle of the document stream at all
      * (contrast exact top-k-by-hash per source, which would need a
      * per-source sort; the threshold draw's size is binomial around the
      * target, the standard trade in shard-parallel samplers). Numerics:
      * ONE correctly-rounded IEEE sqrt then fixed-point integer math, so
      * Spark and DuckDB agree bit-for-bit; thresh = target·2³²/n_s stays
      * under 2⁶³ for any corpus where target ≤ 2³⁰. */
    QueryDef(
      "tx_mixture_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val rates = mixtureRates(docs)
        val picked = sampleByThreshold(docs, rates)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("picked_sum"))
        // both sides are O(sources) aggregates — broadcast the accounting
        // side so the initial plan is a BroadcastHashJoin, not a 20-row
        // SortMergeJoin (AQE would convert at runtime; declare it anyway)
        rates.select(col("source"), col("n_docs"), col("weight_fp"), col("n_target"))
          .join(broadcast(picked), Seq("source"), "left_outer")
          .select(col("source"), col("n_docs"), col("weight_fp"), col("n_target"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            coalesce(col("picked_sum"), lit(0L)).as("picked_sum"))
          .orderBy("source")
      },
      Some(s"""WITH $duckMixtureChain,
             |p AS (SELECT d.source, COUNT(*) AS n_sampled,
             |        SUM(d.doc_id) AS picked_sum
             |      FROM documents d JOIN r ON r.source = d.source
             |      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |              < r.thresh
             |      GROUP BY d.source)
             |SELECT r.source, r.n_docs, r.weight_fp, r.n_target,
             |       CAST(COALESCE(p.n_sampled, 0) AS BIGINT) AS n_sampled,
             |       CAST(COALESCE(p.picked_sum, 0) AS BIGINT) AS picked_sum
             |FROM r LEFT JOIN p ON p.source = r.source ORDER BY r.source""".stripMargin)),

    /** DETERMINISTIC STRATIFIED SPLIT — the per-doc ASSIGNMENT TABLE
      * (the artifact downstream jobs join against), complementing
      * `an_train_split` (ops/Analytics.scala), which emits the per-source
      * accounting ROLLUP of a split whose bucket hashes md5 bits 1-60 —
      * overlapping the mixture sampler's draw bits. Here each doc's bucket
      * comes from md5 hex chars 9-12 (16 bits), DISJOINT BY CONSTRUCTION
      * from the 32 bits [[sampleByThreshold]] draws on, so split
      * membership and mixture sampling are provably independent —
      * correlating them would bias the val set toward the sampled mixture.
      * Thresholds are integer 16-bit counts (5% val = 3276/65536, 5% test)
      * so both engines compare exactly; assignment is reproducible from
      * doc_id alone (re-running a shard, or re-splitting after an append,
      * never reshuffles existing docs between splits — the property that
      * keeps eval sets stable across corpus versions).
      *
      * Scale shape: scan-parallel projection, no shuffle except the
      * output's ORDER BY; stratification is free (the hash is uniform
      * within every source). */
    QueryDef(
      "tx_split_assign",
      (s, d) => withSplit(Tables.documents(s, d))
        .select(col("source"), col("doc_id"), col("h16"), col("split"))
        .orderBy("doc_id"),
      Some(s"""SELECT source, doc_id,
             |       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4)) AS BIGINT)
             |         AS h16,
             |       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))
             |                      AS BIGINT) < $SplitValMax THEN 'val'
             |            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))
             |                      AS BIGINT) < $SplitTestMax THEN 'test'
             |            ELSE 'train' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    /** CURRICULUM ORDERING — the deterministic easy→hard training schedule:
      * stage documents by a difficulty proxy (integer avg word length ×100;
      * fixed thresholds 444/457 ≈ corpus tertiles), then define the training
      * order WITHIN each stage by a seedless md5 shuffle. The schedule is a
      * SORT KEY, not a dense rank: sched_key = stage·2⁴⁰ + first-40-bits of
      * md5(doc_id), so the whole assignment is a scan-parallel projection —
      * no global row_number window (which would force a single-partition
      * sort at 100 TB); the pipeline writes the corpus sorted by (sched_key,
      * doc_id) and the trainer streams it in curriculum order. Same
      * reproducibility contract as tx_split_assign: any engine, any
      * partitioning, any day → the same order. */
    QueryDef(
      "tx_curriculum_order",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr(s"(100 * length(replace(text, ' ', ''))) div size($toks)").as("difficulty_c"))
        .withColumn("stage",
          expr("CAST(CASE WHEN difficulty_c < 444 THEN 0 WHEN difficulty_c < 457 THEN 1 " +
            "ELSE 2 END AS INTEGER)"))
        .withColumn("sched_key",
          expr("stage * 1099511627776L + " +
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10) AS BIGINT)"))
        .select(col("doc_id"), col("difficulty_c"), col("stage"), col("sched_key"))
        .orderBy("sched_key", "doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |         (100 * length(replace(text, ' ', '')))
             |           // len(string_split_regex(trim(text), ' +')) AS difficulty_c
             |       FROM documents),
             |st AS (SELECT doc_id, difficulty_c,
             |         CAST(CASE WHEN difficulty_c < 444 THEN 0
             |                   WHEN difficulty_c < 457 THEN 1 ELSE 2 END AS INTEGER) AS stage
             |       FROM t)
             |SELECT doc_id, difficulty_c, stage,
             |       stage * 1099511627776 +
             |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)
             |         AS sched_key
             |FROM st ORDER BY sched_key, doc_id""".stripMargin)),

    /** DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE — per-source doc counts
      * published under ε = ln 3 (sensitivity 1: one document moves one
      * count by one): each count gets DISCRETE two-sided geometric noise
      * drawn by exact inverse-CDF inversion over a 48-bit md5 uniform keyed
      * on (seed tag, source) — see [[dpThresholds]] for the exact
      * rational thresholds both engines share. Deterministic per seed
      * (rerunning the release never re-randomizes — republishing with
      * fresh noise would leak through averaging), negative counts clamp to
      * zero post-noise (standard, does not affect the DP guarantee).
      *
      * THIS REGISTERED FORM IS THE MECHANISM TEST, NOT A RELEASE: it draws
      * from the fixed public [[DpHarnessSeed]] (so DuckDB can replay the
      * noise bit-for-bit) and emits n_raw/noise alongside n_noisy (so the
      * oracle checks the arithmetic). A real release does neither — it
      * passes a secret per-release seed and projects [[DpPublicCols]];
      * that path is exercised by RunCorpusPipeline's data card.
      *
      * Distributed shape: one partial-aggregating count shuffle; the noise
      * draw is a row-local projection over the O(sources) result. */
    QueryDef(
      "tx_dp_histogram",
      (s, d) => dpNoisyCounts(Tables.documents(s, d), "source", seedTag = DpHarnessSeed),
      Some {
        val tArr = dpThresholds.mkString("[", ", ", "]")
        // The Spark side binds the seed as a lit; this oracle interpolates it
        // into SQL text, so escape quotes to keep the two paths equally
        // robust against a future seed constant containing one.
        val seedSql = DpHarnessSeed.replace("'", "''")
        s"""WITH c AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1),
           |u AS (SELECT source, n_raw,
           |        CAST(('0x' || substr(md5('$seedSql' || source), 1, 12)) AS BIGINT) AS u48
           |      FROM c),
           |nz AS (SELECT source, n_raw,
           |         CAST(len(list_filter($tArr, t -> u48 >= t)) - 20 AS INTEGER) AS noise
           |       FROM u)
           |SELECT source, n_raw, noise,
           |       CAST(greatest(n_raw + noise, 0) AS BIGINT) AS n_noisy,
           |       CAST(1098612 AS BIGINT) AS eps_micro
           |FROM nz ORDER BY source""".stripMargin
      }),

    /** PACKING EFFICIENCY ACCOUNTING — what the tx_pack_sequences layout
      * costs, per source: window count (ceil of token mass over the
      * 256-token window), padding waste in the final window, fill
      * permille, and the count of documents SPLIT across a window boundary
      * (split docs are the packing quality metric — cross-document
      * attention contamination unless the trainer masks across boundaries;
      * contiguous packing trades splits for zero inter-doc padding).
      *
      * Distributed shape: the split flags ride the SAME per-source prefix
      * sum tx_pack_sequences computes (the sharded two-level scan is the
      * 100 TB form — tx_pack_sequences_sharded); everything else is pure
      * arithmetic on the O(sources) rollup. */
    QueryDef(
      "tx_pack_efficiency",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            expr(nTokensAs("BIGINT")).as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("is_split", expr(isSplitExpr))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("is_split"), 1L).otherwise(0L)).as("n_split_docs"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            expr(s"(total_tokens + ${PackWin - 1}) div $PackWin").as("n_windows"),
            expr(s"((total_tokens + ${PackWin - 1}) div $PackWin) * $PackWin" +
              " - total_tokens").as("waste_tokens"),
            expr(s"(1000 * total_tokens) div " +
              s"(((total_tokens + ${PackWin - 1}) div $PackWin) * $PackWin)")
              .as("fill_permille"),
            col("n_split_docs"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
             |         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
             |       FROM documents),
             |c AS (SELECT source, doc_id, n_tokens,
             |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |      FROM t),
             |g AS (SELECT source, COUNT(*) AS n_docs,
             |        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |        CAST(SUM(CASE WHEN (cum - n_tokens) // $PackWin <> (cum - 1) // $PackWin
             |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
             |      FROM c GROUP BY source)
             |SELECT source, n_docs, total_tokens,
             |       (total_tokens + ${PackWin - 1}) // $PackWin AS n_windows,
             |       ((total_tokens + ${PackWin - 1}) // $PackWin) * $PackWin - total_tokens AS waste_tokens,
             |       (1000 * total_tokens) // (((total_tokens + ${PackWin - 1}) // $PackWin) * $PackWin)
             |         AS fill_permille,
             |       n_split_docs
             |FROM g ORDER BY source""".stripMargin)),

    /** LENGTH-DISTRIBUTION DRIFT — per source, the total-variation distance
      * of its token-length band mix (32-token bands, capped at band 7) from
      * the corpus mix, with a 10% verdict: the document-quality analog of
      * the event drift monitor (an_shard_drift's exact arithmetic). A
      * source whose length profile walks away from the corpus is a changed
      * scraper, a truncation bug, or injected boilerplate — caught by
      * SHAPE, before any content screen fires. Full source×band grid via
      * the broadcast cross join (absent bands must count as drift), exact
      * integer micro shares. */
    QueryDef(
      "tx_length_drift",
      (s, d) => {
        val b = Tables.documents(s, d)
          .select(col("source"),
            expr(s"least(CAST(size($toks) AS BIGINT) div 32, 7L)").as("band"))
        val sh = b.groupBy(col("source"), col("band")).agg(count(lit(1)).as("cnt"))
        val tot = sh.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
        val g = sh.groupBy(col("band")).agg(sum(col("cnt")).as("gcnt"))
        val gt = g.agg(sum(col("gcnt")).as("gtot"))
        tot.crossJoin(broadcast(g)).crossJoin(broadcast(gt))
          .join(sh, Seq("source", "band"), "left_outer")
          .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
          .withColumn("diff_micro",
            abs(expr("(1000000 * cnt) div tot - (1000000 * gcnt) div gtot")))
          .groupBy(col("source"))
          .agg(sum(col("cnt")).as("n_docs"), sum(col("diff_micro")).as("tv_micro"))
          .withColumn("drift_ok", col("tv_micro") < 100000L)
          .orderBy("source")
      },
      Some("""WITH b AS (SELECT source,
             |         least(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) // 32,
             |               7) AS band
             |       FROM documents),
             |sh AS (SELECT source, band, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
             |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM sh GROUP BY 1),
             |g AS (SELECT band, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM sh GROUP BY 1),
             |gt AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS gtot FROM g)
             |SELECT t.source,
             |       CAST(SUM(COALESCE(s.cnt, 0)) AS BIGINT) AS n_docs,
             |       CAST(SUM(abs((1000000 * COALESCE(s.cnt, 0)) // t.tot
             |                    - (1000000 * g.gcnt) // gt.gtot)) AS BIGINT) AS tv_micro,
             |       CAST(SUM(abs((1000000 * COALESCE(s.cnt, 0)) // t.tot
             |                    - (1000000 * g.gcnt) // gt.gtot)) AS BIGINT) < 100000
             |         AS drift_ok
             |FROM tot t CROSS JOIN g CROSS JOIN gt
             |LEFT JOIN sh s ON s.source = t.source AND s.band = g.band
             |GROUP BY t.source ORDER BY t.source""".stripMargin)),
  )

  /** Split thresholds over the 16 assignment bits: 5% val, 5% test
    * (constant expressions — inlined at the `defs` use sites above). */
  final val SplitValMax = 3276
  final val SplitTestMax = 6553

  /** The [[defs tx_split_assign]] assignment as a frame transform (adds
    * `h16` + `split`), shared with the corpus pipeline so a pipeline run
    * and the registered query can never disagree on membership. */
  private[graft] def withSplit(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // The assignment hash is the native md5_prefix48 — register it on the
    // frame's session so the transform works on sessions not built with
    // GraftExtensions (the simhash()/dd_embed_cosine foreign-session rule).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("h16", expr("md5_prefix48(CAST(doc_id AS STRING)) % 65536"))
      .withColumn("split",
        when(col("h16") < SplitValMax, "val")
          .when(col("h16") < SplitTestMax, "test")
          .otherwise("train"))
  }

  /** Per-source mixture-sampling plan for [[defs tx_mixture_sample]] and
    * the streaming quota-fill monitor (graft.streaming.DocsStream
    * `st_mixture_drift`): doc counts, α=0.5 fixed-point temperature
    * weights, integer budget targets (budget = ⌊N/5⌋), and the 2³²-scaled
    * hash threshold that realizes each target. O(sources) rows — a model
    * table, broadcast by every consumer. */
  private[graft] def mixtureRates(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stats = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_fp",
        expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000.0D) AS BIGINT)"))
    val tot = stats.agg(sum(col("weight_fp")).as("sw"), sum(col("n_docs")).as("nd"))
    stats.crossJoin(broadcast(tot))
      .withColumn("n_target", expr("(nd div 5) * weight_fp div sw"))
      .withColumn("thresh", expr("n_target * 4294967296L div n_docs"))
  }

  /** The mixture draw's keep predicate over an attached `thresh` column —
    * ONE definition shared by [[sampleByThreshold]] and any caller that
    * attaches the rate table itself (graft.streaming.DocsStream
    * .mixtureFill joins rates once for BOTH n_target and thresh rather
    * than paying two broadcast joins per micro-batch), so the draw cannot
    * drift between consumers. */
  private[graft] val mixtureKeepPredicate =
    "md5_prefix48(CAST(doc_id AS STRING)) div 65536 < thresh"

  /** The deterministic mixture draw: keep a doc iff its 32-bit md5 prefix
    * clears its source's threshold. Stream-legal (broadcast static rate
    * table + scan predicate, no sort/window) — the same expression batch
    * and stream, which is what lets DocsStreamSpec pin stream ≡ batch. */
  private[graft] def sampleByThreshold(docs: org.apache.spark.sql.DataFrame,
      rates: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // mixtureKeepPredicate uses the native md5_prefix48 (withSplit rule).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .join(broadcast(rates.select(col("source"), col("thresh"))), Seq("source"))
      .filter(expr(mixtureKeepPredicate))
  }



  /** CDC gram stream: one row per 4-gram with its running chunk number.
    * Boundaries are content-addressed (`ghash % 16 == 0` STARTS a new
    * chunk), so the average chunk is ~16 grams and chunk identity survives
    * edits outside the chunk. Shared by [[tx_cdc_chunks]] and
    * graft.dedup's chunk-level dedup. The 3×lead gram assembly and the
    * boundary cumsum ride ONE (doc_id, pos) window sort — the winnowing
    * lesson (winnowedFpRows). */
  def cdcChunkRows(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val wLead = Window.partitionBy("doc_id").orderBy("pos")
    val wCum = wLead.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 4"))
      .select(col("doc_id"), expr("CAST(size(tk) AS BIGINT) - 3").as("n_grams"),
        posexplode(col("tk")).as(Seq("pos", "tok")))
      .withColumn("g4", concat_ws(" ", col("tok"),
        lead("tok", 1).over(wLead), lead("tok", 2).over(wLead), lead("tok", 3).over(wLead)))
      .filter(col("pos") <= col("n_grams") - 1)
      .withColumn("ghash", expr("md5_prefix48(g4)"))
      .withColumn("chunk_seq",
        sum(when(col("ghash") % 16 === 0, 1L).otherwise(0L)).over(wCum))
      .select(col("doc_id"), col("pos"), col("ghash"), col("chunk_seq"))
  }

  /** The per-chunk CDC INDEX — one row per chunk `(doc_id, chunk_seq)` with
    * gram count `cg`, additive fingerprint `cfp`, and position span —
    * persisted as a content-keyed artifact (same lifecycle as the winnow
    * fingerprint and minhash signature indexes). This is the table storage
    * dedup actually keeps: ~1/16 the gram count, so at 100 TB the index is
    * TB-scale while the gram stream it summarizes would be corpus-scale.
    * Both [[tx_cdc_chunks]] and graft.dedup's chunk-level dedup serve from
    * this artifact; the two-window chunking pass runs once per corpus
    * CONTENT, not once per query. */
  def cdcChunkIndex(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.Artifacts.indexParquet(s, "cdc_chunks", d, "documents")(
      cdcChunkRows(s, d)
        .groupBy(col("doc_id"), col("chunk_seq"))
        .agg(count(lit(1)).as("cg"), sum(col("ghash")).as("cfp"),
          min(col("pos")).cast("long").as("pos_first"),
          max(col("pos")).cast("long").as("pos_last")))

  /** DuckDB CTE chain ending in `c(doc_id, pos, ghash, chunk_seq)` — the
    * oracle replay of [[cdcChunkRows]], shared with the chunk-dedup oracle. */
  lazy val duckCdcChain: String =
    """t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
      |          FROM documents),
      |g AS (SELECT doc_id, i AS pos,
      |        CAST(('0x' || substr(md5(array_to_string(tk[i+1:i+4], ' ')), 1, 12))
      |             AS BIGINT) AS ghash
      |      FROM t, unnest(range(0, len(tk) - 4 + 1)) AS u(i)
      |      WHERE len(tk) >= 4),
      |c AS (SELECT doc_id, pos, ghash,
      |        CAST(SUM(CASE WHEN ghash % 16 = 0 THEN 1 ELSE 0 END)
      |               OVER (PARTITION BY doc_id ORDER BY pos
      |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_seq
      |      FROM g)""".stripMargin

  /** Winnowed fingerprints as DISTINCT (doc_id, n_grams, fp) rows — shared
    * by [[tx_winnowing]]'s checksums and graft.dedup's winnowed candidate
    * generator. RELATIONAL formulation on purpose: 4-grams are assembled
    * from exploded tokens with three lead()s and winnowed with a 5-row
    * frame min, all over ONE doc_id window shuffle, so each gram md5 is
    * computed exactly once inside codegen. The nested-array-HOF form
    * (transform over slices of a grams array) lets CollapseProject inline
    * the whole gram array into every window reference — the minhashSig
    * lesson (graft.dedup.Dedup): measured ~25× slower under a generator at
    * sf0.1.
    *
    * Tokenization is materialized as an array column BEFORE the explode
    * (round 9): with `posexplode(split(text))` in one select, the sibling
    * `size(split(text))` projection lands ABOVE the Generate and re-runs
    * the regex split once per exploded ROW (~54× per doc — 270k splits in
    * a single pre-shuffle task at sf0.1, ~7 s of the measured 11 s).
    * Exploding a pre-computed `tk` array keeps the split per-DOC; the
    * post-Generate `size(tk)` is O(1) against the carried array pointer. */
  def winnowedFpRows(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val wLead = Window.partitionBy("doc_id").orderBy("pos")
    val wMin = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, 4)
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 8"))
      .select(col("doc_id"), expr("CAST(size(tk) AS BIGINT) - 3").as("n_grams"),
        posexplode(col("tk")).as(Seq("pos", "tok")))
      .withColumn("g4", concat_ws(" ", col("tok"),
        lead("tok", 1).over(wLead), lead("tok", 2).over(wLead), lead("tok", 3).over(wLead)))
      .filter(col("pos") <= col("n_grams") - 1)
      .withColumn("ghash", expr("md5_prefix48(g4)"))
      .withColumn("fp", min(col("ghash")).over(wMin))
      .filter(col("pos") <= col("n_grams") - 5)
      .select(col("doc_id"), col("n_grams"), col("fp"))
      .distinct()
  }

  /** DuckDB CTE chain ending in `m(doc_id, grams, fps)` — the oracle replay
    * of [[winnowed]], shared by the tx_winnowing and dd_winnow_pairs
    * oracles. (`lazy`: referenced from `defs`, which initializes first.) */
  lazy val duckWinnowChain: String =
    """t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
      |          FROM documents),
      |g AS (SELECT doc_id,
      |        list_transform(range(0, len(tk) - 4 + 1), i ->
      |          CAST(('0x' || substr(md5(array_to_string(tk[i+1:i+4], ' ')), 1, 12))
      |               AS BIGINT)) AS grams
      |      FROM t WHERE len(tk) >= 8),
      |m AS (SELECT doc_id, grams,
      |        list_distinct(list_transform(range(0, len(grams) - 5 + 1), i ->
      |          list_min(grams[i+1:i+5]))) AS fps
      |      FROM g)""".stripMargin
}
