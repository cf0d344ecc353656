package graft.text

import org.apache.spark.sql.functions._

import graft.Tables

/** The BPE tokenizer lifecycle behind `tx_bpe_merges` / `tx_bpe_apply` /
  * `st_bpe_fertility`: exact relational training (oracle-replayable), the
  * FastBPE-shape driver-heap trainer for production round counts, the
  * word-frequency dictionary with its bounded-collect `minCount` floor, the
  * persisted merge-table artifact and its consumers, and the DuckDB replay
  * SQL. Mixed into [[TextStats]] (split out of TextStats.scala in round 15
  * — same package, no behavior change); all call sites go through
  * `TextStats.*`. Self-typed to the object so shared lexer constants
  * ([[TextStats.toks]]) resolve without duplication. */
private[text] trait TextBpe { this: TextStats.type =>
  /** Merge rounds trained by [[bpeMerges]] (the tokenizer-prep analog of
    * Similarity.Iters: enough rounds to exercise selection, application,
    * and merged-symbol re-pairing on the fixture; a production vocab runs
    * the same loop tens of thousands of times). `final` without a type
    * annotation on purpose: a constant expression is inlined at use sites.
    * (Belt-and-braces since the round-15 split: trait bodies initialize
    * before the TextStats object body anyway, so `defs` — which runs
    * duckBpeSql() during object init — could no longer see an
    * uninitialized 0 even without the inlining.) */
  final val BpeRounds = 8

  /** Character splitter over a `word` column — the symbol alphabet both
    * trainers, the apply dictionary, and the streaming fertility fallback
    * derive pairs from, stated ONCE (the `toks` discipline; four sites
    * previously restated it). filter(x <> ''): Java-regex split("") can
    * emit a trailing empty token the DuckDB splitter doesn't — strip it so
    * both engines pair the same symbols. The JVM-side twin is
    * [[codePointSyms]] (code points, never UTF-16 units). */
  private[graft] val charsExpr = "filter(split(word, ''), x -> x <> '')"

  // In-JVM fast path over the PERSISTED merge-table artifact (below) —
  // private[text] so the rebuild-on-rewrite spec can clear it and prove a
  // fresh JVM reads the published artifact instead of retraining.
  private[text] val bpeModels = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(Long, String, String, String, Long)]]

  /** BPE MERGE TRAINING — the tokenizer-learning step every pretraining
    * pipeline runs before anything tokenizes: learn the first `rounds`
    * byte-pair merges from the corpus, exactly (count-weighted pair
    * frequencies, ties broken to the lexicographically smallest (lhs, rhs),
    * leftmost-greedy non-overlapping application — the standard BPE rules,
    * stated deterministically so the DuckDB oracle replays training
    * verbatim like [[graft.sim.Similarity.duckKmeansChain]] replays
    * k-means).
    *
    * Scale shape — the part that matters at 100 TB: training input is the
    * WORD-FREQUENCY DICTIONARY (one corpus tokenize+count pass — the only
    * corpus-scale step, the same shuffle tx_tokens already pays), and every
    * merge round runs on the vocabulary-sized (word, syms) frame: explode
    * to symbol pairs, one weighted count, a 1-ROW collect of the argmax
    * (model state, the k-means discipline), and a PURE-WINDOW
    * leftmost-greedy rewrite: mark matching positions, group consecutive
    * marks into islands (pos − running match count), keep odd ranks within
    * each island, lag-drop the absorbed right halves — no per-row loop, no
    * UDF, and deliberately NO self-joins (Catalyst's join-stats product
    * compounds through checkpointed rounds — see the in-loop comment).
    * Each round is localCheckpointed so lineage stays one round deep. The trained merge table is a PERSISTED content-keyed artifact
    * (the Artifacts.indexParquetPath discipline — `_SUCCESS` guard, atomic
    * rename): training runs once per corpus content, and every consumer —
    * [[bpeSubwordDict]] behind tx_bpe_apply and st_bpe_fertility — probes
    * the published merge table across sessions exactly like the ANN cell
    * tables and winnow fingerprint indexes. The in-JVM memo on top is only
    * a fast path over the artifact read. */
  def bpeMerges(s: org.apache.spark.sql.SparkSession, d: String,
      rounds: Int = BpeRounds): Seq[(Long, String, String, String, Long)] =
    graft.Artifacts.memo(bpeModels,
      s"${graft.Artifacts.contentKey(d, "documents")}|$rounds") {
      val path = graft.Artifacts.indexParquetPath(
          s, s"bpe_merges_r$rounds", d, "documents") {
        import s.implicits._
        // Path choice by depth (spec-pinned equal): the relational loop
        // for shallow oracle-replayable training, the driver heap once
        // per-round job submission would dominate (production vocabs).
        // This registered path trains EXACT (no dictionary floor) so the
        // artifact replays on any engine; a web-scale caller bounds the
        // collect with wordFreqDict's minCount knob, as the corpus
        // pipeline's tokenizer stage does (RunCorpusPipeline.BpeMinCount).
        val trained =
          if (rounds > DriverHeapCrossover)
            bpeMergesDriverHeap(wordFreqDict(Tables.documents(s, d)), rounds)
          else bpeMergesUncached(Tables.documents(s, d), rounds)
        trained.toDF("merge_rank", "lhs", "rhs", "merged", "n_pairs")
      }
      s.read.parquet(path).orderBy("merge_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    }

  /** Merge-round count above which [[bpeMerges]] trains on the driver heap
    * ([[bpeMergesDriverHeap]]) instead of the per-round relational loop:
    * the relational path costs a flat ~0.2 s of JOB-SUBMISSION LATENCY per
    * round (SCALING.md envelope — data volume is irrelevant past the one
    * dictionary pass), so by 256 rounds the driver path's one-time
    * dictionary collect (~ms at fixture scale, dictionary-sized always)
    * has been repaid hundreds of times. Both paths are proven equal by
    * spec, so the switch is invisible semantically. */
  final val DriverHeapCrossover = 256

  /** FastBPE-shape BPE training, entirely ON THE DRIVER over the collected
    * word-frequency dictionary — the production path for real vocab sizes
    * (10⁴-10⁵ merges), where the relational loop's per-round job submission
    * dominates (see [[bpeMergesUncached]]'s design note; the envelope in
    * SCALING.md measures the crossover). The corpus is still touched
    * exactly once, distributed (the tokenize+count dictionary pass); what
    * moves to the driver is vocabulary-sized model state — the k-means
    * discipline, same as the IVF centroids.
    *
    * Incremental, not recount: pair→weighted-count map plus a LAZY max-heap
    * ((count, lhs, rhs) entries re-pushed on every count change; stale
    * entries discarded on pop when their count no longer matches), and a
    * pair→word-index posting map so a merge touches only words containing
    * the pair (stale postings are skipped by a containment scan). Per
    * affected word: subtract its old adjacent pairs, apply the
    * leftmost-greedy merge, re-add the new ones — O(word length), exactly
    * the FastBPE update rule. Selection order matches the relational path:
    * count desc, then (lhs, rhs) ascending in CODE-POINT order
    * ([[cpCompare]] — identical to Spark's and DuckDB's binary UTF-8
    * string order; plain String.compareTo is UTF-16 order, which sorts a
    * supplementary character BELOW U+E000..U+FFFF by its surrogate halves
    * and would silently pick a different merge on real web text).
    * Equality with [[bpeMergesUncached]] is spec-pinned on the fixture, on
    * seeded adversarial corpora, and on a supplementary-vs-BMP tie. */
  /** Code-point symbols — the JVM twin of [[charsExpr]]. NOT
    * `String.split("")`: that splits between UTF-16 units, halving a
    * supplementary character (𝛼, emoji — ordinary web text) into two
    * lone-surrogate "symbols" that Spark's and DuckDB's splitters never
    * produce, so the driver-heap trainer would learn merges over a
    * different alphabet than the oracle-replayable path (caught by the
    * TextStatsSpec supplementary-tie pin). */
  private def codePointSyms(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Code-point (= binary UTF-8) string order — the tie-break order the
    * relational trainer inherits from Spark's UTF8String comparison and
    * the oracle from DuckDB's VARCHAR order. UTF-8 byte order equals
    * code-point order by construction, so comparing code points avoids
    * the per-comparison byte-array allocation. */
  private def cpCompare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length, b.length)
  }

  private[graft] def bpeMergesDriverHeap(wordFreqs: Seq[(String, Long)],
      rounds: Int): Seq[(Long, String, String, String, Long)] = {
    import scala.collection.mutable
    val freqs = wordFreqs.map(_._2).toArray
    val syms = wordFreqs
      .map(w => mutable.ArrayBuffer.from(codePointSyms(w._1))).toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c // larger count = higher priority
          else {
            val ca = cpCompare(y._2, x._2) // smaller lhs = higher priority
            if (ca != 0) ca else cpCompare(y._3, x._3)
          }
        }
      })
    def bump(p: (String, String), delta: Long): Unit = {
      val n = pairCount.getOrElse(p, 0L) + delta
      if (n <= 0L) pairCount.remove(p) else pairCount(p) = n
      // push on EVERY change (including decreases): the heap must contain
      // an entry carrying the pair's CURRENT count or the lazy pop loses it
      if (n > 0L) heap.enqueue((n, p._1, p._2))
    }
    for (wi <- syms.indices; j <- 0 until syms(wi).length - 1) {
      val p = (syms(wi)(j), syms(wi)(j + 1))
      bump(p, freqs(wi))
      pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
    }
    val out = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (pairCount.getOrElse((top._2, top._3), 0L) == top._1) best = top
      }
      if (best == null) exhausted = true
      else {
        val (c, a, b) = best
        out += ((r.toLong, a, b, a + b, c))
        val posting = pairWords.getOrElse((a, b), mutable.HashSet.empty)
        for (wi <- posting.toArray.sorted) { // sorted: determinism of map state
          val sy = syms(wi)
          var contains = false
          var i = 0
          while (!contains && i < sy.length - 1) {
            if (sy(i) == a && sy(i + 1) == b) contains = true
            i += 1
          }
          if (contains) {
            var j = 0
            while (j < sy.length - 1) { bump((sy(j), sy(j + 1)), -freqs(wi)); j += 1 }
            val ns = mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < sy.length) {
              if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) { ns += (a + b); i += 2 }
              else { ns += sy(i); i += 1 }
            }
            syms(wi) = ns
            j = 0
            while (j < ns.length - 1) {
              val p = (ns(j), ns(j + 1))
              bump(p, freqs(wi))
              pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
              j += 1
            }
          }
        }
        r += 1
      }
    }
    out.toSeq
  }

  /** The one distributed corpus pass feeding [[bpeMergesDriverHeap]]: the
    * word-frequency dictionary (same tokenizer + empty-token filter as the
    * relational path, so both trainers pair identical symbols).
    *
    * `minCount` is the production BOUND on this collect — the one formerly
    * unbounded driver-side collect in the library (VERDICT r13 #1). The
    * in-code 100-TB note used to assume ~10⁶ distinct words, but real
    * web-scale text has 10⁸⁺ (URLs, typos, numbers); every production BPE
    * trainer prunes with a min-count floor before heap training, and the
    * floor bounds the collect because distinct-words-with-freq ≥ F is at
    * most total-tokens / F (a 100-TB corpus at F = 100 collects ≤ ~10⁸/100
    * per 10¹⁰ tokens — dictionary-sized again).
    *
    * Exactness contract (spec-pinned in TextStatsSpec): the floor is an
    * APPROXIMATION KNOB with a stated sufficient exactness condition. Let
    * M = Σ_{pruned w} freq(w)·(len(w)−1) — the total adjacent-pair mass
    * pruning removes; merging only shortens words, so M bounds every
    * pruned pair count at EVERY round, not just round 1. Then (a) the
    * merge SEQUENCE is unchanged whenever each round's selection margin
    * (winner minus runner-up, floored counts) exceeds M, because the true
    * count of any pair p lies in [c_floored(p), c_floored(p) + M]; and
    * (b) if no pruned word contains any pair the trainer selects (rare
    * words over a disjoint symbol range — the common web-noise case), the
    * output is identical INCLUDING the n_pairs counts. Default 1 = no
    * pruning (the oracle-replayable exact path). */
  private[graft] def wordFreqDict(docs: org.apache.spark.sql.DataFrame,
      minCount: Long = 1L): Seq[(String, Long)] =
    docs.select(explode(expr(toks)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= lit(minCount))
      .orderBy(col("word"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Training loop over an explicit documents frame (spec entry point;
    * `onRound` receives (round, seconds) — graft.tools.BpeEnvelope uses it
    * to measure the per-round cost curve at production-like round counts).
    *
    * 100-TB design note: this loop is O(rounds) DRIVER-COORDINATED Spark
    * jobs over the vocabulary-sized dictionary — each round's cost is flat
    * in the corpus (the corpus is touched exactly once, in the initial
    * tokenize+count), but a production 32k-merge vocab means 32k job
    * submissions, and job-submission latency (not data volume) becomes the
    * bottleneck. The documented scale-out for that regime is the FastBPE
    * shape: ONE job computes partition-local (pair → weighted count) maps
    * over the dictionary, the driver merges them into a heap and replays
    * merges against the heap DRIVER-SIDE (the dictionary of a 100-TB corpus
    * is heap-sized: ~10⁶ distinct words × ~10 symbols), re-counting on
    * Spark only when the heap's stale-count bound is exceeded — turning
    * O(vocab) jobs into O(vocab / batch) with identical output (the merge
    * order is a pure function of the counts). The relational per-round loop
    * below is kept as the registered, oracle-replayable form; the envelope
    * measurement (SCALING.md) bounds its per-round cost so the crossover
    * point is a measured number, not a guess. */
  private[graft] def bpeMergesUncached(docs: org.apache.spark.sql.DataFrame,
      rounds: Int,
      onRound: (Int, Double) => Unit = (_, _) => ()): Seq[(Long, String, String, String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val wPos = Window.partitionBy(col("word")).orderBy(col("pos"))
    // localCheckpoint (not persist): each round's frame references
    // the previous round's plan several times, and Catalyst copies shared
    // subtrees during optimization — 8 rounds of persist-only lineage grew
    // the logical plan exponentially (observed as analyzer OOM); truncating
    // to a LogicalRDD per round keeps planning cost flat, the same reason
    // dd_dup_clusters checkpoints its label-propagation loop.
    var words = docs
      .select(explode(expr(toks)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(charsExpr))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    // Exhaustion BREAKS the loop (the driver-heap twin's `exhausted` rule):
    // once the argmax comes back empty `words` can never change, so each
    // remaining round would re-submit an identical guaranteed-empty job —
    // ~0.2 s of pure submission latency per dead round on a small corpus
    // driven to a deep round count.
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val rt0 = System.nanoTime()
      val ex = words
        .select(col("word"), col("freq"), posexplode(col("syms")).as(Seq("pos", "sym")))
        .withColumn("nxt", lead(col("sym"), 1).over(wPos))
      val bestRows = ex.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (bestRows.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (bestRows(0).getString(0), bestRows(0).getString(1), bestRows(0).getLong(2))
        out += ((r.toLong, a, b, a + b, cnt))
        // leftmost-greedy non-overlap: within each run of consecutive
        // matching positions, merge the 1st, 3rd, 5th… ("aaaa" + (a,a)
        // merges positions 0 and 2, never the overlapping 1).
        //
        // PURE-WINDOW formulation (no self-joins) — gaps-and-islands over a
        // running match count: `cum` = matches so far in the word, so
        // `pos - cum` is constant exactly within a consecutive run of
        // matches (the island id), and a second running sum of `m` within
        // (word, island) ranks each match inside its run; keep odd ranks,
        // drop the row AFTER any kept match (lag). Two window partitionings
        // (`word`, then `(word, island)`), zero joins. The earlier
        // formulation rewrote via two left joins against the kept set —
        // semantically identical, but Catalyst's default join-stats
        // estimate is the PRODUCT of child sizeInBytes, and localCheckpoint
        // snapshots the round's stats into the next round's LogicalRDD, so
        // sizeInBytes CUBED every round: its BigInt digit count tripled per
        // round and by round ~13 the driver was spending minutes per round
        // in stats-visitor BigInteger multiplication (thread dumps showed
        // Toom-Cook frames; measured 0.5 s/round through round 11, then
        // 4 s → 18 s → 116 s → 639 s). Window/project/filter estimators
        // scale stats linearly, so per-round cost stays flat at any merge
        // depth — see graft.tools.BpeEnvelope for the measured curve.
        // The rewrite feeds only the NEXT round's argmax: on the final
        // round it would be one full eagerly-checkpointed job whose output
        // nobody reads — ~1/rounds of total training cost, billed by
        // BpeEnvelope into the last round's figure for nothing.
        if (r < rounds) {
          val cumFrame = wPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val marked = ex
            .withColumn("m",
              when(col("sym") === a && col("nxt") === b, 1L).otherwise(0L))
            .withColumn("cum", sum(col("m")).over(cumFrame))
            .withColumn("rr", sum(col("m")).over(
              Window.partitionBy(col("word"), col("pos") - col("cum"))
                .orderBy(col("pos"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("is_k", col("m") === 1L && col("rr") % 2 === 1)
            .withColumn("is_d", coalesce(lag(col("is_k"), 1).over(wPos), lit(false)))
          val next = marked
            .filter(!col("is_d")) // the absorbed right half of each merge
            .withColumn("ns",
              when(col("is_k"), concat(col("sym"), col("nxt"))).otherwise(col("sym")))
            .groupBy(col("word"), col("freq"))
            .agg(expr("transform(sort_array(collect_list(struct(pos, ns))), p -> p.ns)")
              .as("syms"))
            .localCheckpoint(true) // materializes eagerly; truncates lineage
          words = next
        }
      }
      onRound(r, (System.nanoTime() - rt0) / 1e9)
      r += 1
    }
    out.toSeq
  }

  /** [[bpeMerges]] as the registered query frame. */
  def bpeMergesDf(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    bpeMerges(s, d).toDF("merge_rank", "lhs", "rhs", "merged", "n_pairs")
      .orderBy("merge_rank")
  }

  /** Generated DuckDB replay of [[bpeMerges]] — `rounds` rounds of
    * explode → weighted argmax → greedy rewrite, one CTE block per round
    * (MATERIALIZED: each block is referenced several times; inlined CTEs
    * would re-expand the whole chain exponentially). */
  def duckBpeSql(rounds: Int = BpeRounds): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS MATERIALIZED (
             |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
             |         string_split_regex(word, '') AS syms
             |  FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS word
             |        FROM documents)
             |  WHERE word <> '' GROUP BY word)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
        |x$r AS MATERIALIZED (SELECT word, freq, i AS pos, syms[i+1] AS sym, syms[i+2] AS nxt
        |  FROM w${r - 1}, unnest(range(0, len(syms))) AS u(i)),
        |b$r AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        |  FROM x$r WHERE nxt IS NOT NULL GROUP BY 1, 2
        |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
        |k$r AS MATERIALIZED (SELECT word, pos FROM (
        |    SELECT word, pos,
        |           row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS rr
        |    FROM (SELECT x.word, x.pos,
        |                 row_number() OVER (PARTITION BY x.word ORDER BY x.pos) AS rn
        |          FROM x$r x JOIN b$r b ON x.sym = b.a AND x.nxt = b.b))
        |  WHERE rr % 2 = 1),
        |w$r AS MATERIALIZED (SELECT word, freq, list(ns ORDER BY pos) AS syms FROM (
        |    SELECT x.word, x.freq, x.pos,
        |           CASE WHEN k.pos IS NOT NULL THEN x.sym || x.nxt ELSE x.sym END AS ns,
        |           kd.pos AS dpos
        |    FROM x$r x
        |    LEFT JOIN k$r k ON x.word = k.word AND x.pos = k.pos
        |    LEFT JOIN k$r kd ON x.word = kd.word AND x.pos = kd.pos + 1)
        |  WHERE dpos IS NULL GROUP BY word, freq)""".stripMargin
    }
    sb ++= "\nSELECT * FROM (" + (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, " +
        s"a || b AS merged, cnt AS n_pairs FROM b$r").mkString(" UNION ALL ") +
      ") ORDER BY merge_rank"
    sb.toString
  }

  /** Subword-count dictionary under the learned merges: (word, n_sub) for
    * every distinct corpus word — the serving table the fertility monitor
    * and the apply rollup share. Merges arrive as literals from the
    * memoized model; the whole application is one codegen projection. */
  def bpeSubwordDict(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    bpeSubwordDictFor(Tables.documents(s, d), bpeMerges(s, d))

  /** Dictionary builder over explicit inputs (spec entry point). Merge
    * symbols are bound as COLUMN LITERALS (`lit`), never spliced into SQL
    * text: the earlier string-built fold escaped quotes with SQL-standard
    * doubling (''), which Spark's parser reads as two ADJACENT string
    * literals and concatenates — a learned merge containing a quote
    * (don't) silently became a different symbol (dont) — and backslashes
    * were not escaped at all. Literal binding has no escaping layer to get
    * wrong and stays foldable inside whole-stage codegen. */
  private[text] def bpeSubwordDictFor(docs: org.apache.spark.sql.DataFrame,
      merges: Seq[(Long, String, String, String, Long)])
      : org.apache.spark.sql.DataFrame = {
    val applied = merges.foldLeft(col("syms")) { case (inner, (_, a, b, ab, _)) =>
      aggregate(inner, typedLit(Seq.empty[String]), (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
          .otherwise(concat(acc, array(x))))
    }
    docs
      .select(explode(expr(toks)).as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .withColumn("syms", expr(charsExpr))
      .withColumn("n_sub", size(applied).cast("long"))
      .select(col("word"), col("n_sub"))
  }

  /** BPE APPLICATION — tokenize the corpus with the merges [[bpeMerges]]
    * learned: per document, whitespace words and the subword count after
    * applying the 8 learned merges in rank order. Application is ONE
    * codegen projection over the DISTINCT-WORD dictionary: each merge is a
    * left fold over the symbol array (`aggregate`) that replaces a trailing
    * `lhs` with `merged` when `rhs` arrives — equivalent to leftmost-greedy
    * non-overlapping application because the merged symbol is strictly
    * longer than `lhs`, so a just-merged slot can never re-match as the
    * left half of the same pair ("aaa" + (a,a) → [aa, a], by fold and by
    * greedy alike). The merges arrive as LITERALS from the memoized model
    * (serving never retrains), folds nest 8 deep in one whole-stage-codegen
    * expression — no windows, no shuffle on the apply side. The doc rollup
    * joins tokens to the segmented dictionary WITHOUT a broadcast hint (the
    * vocab-join convention: unbounded domain at 100 TB, AQE decides). The
    * oracle reuses the training replay verbatim — its final w8 CTE IS the
    * segmented dictionary. */
  def bpeApplyDf(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val dict = bpeSubwordDict(s, d)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(toks)).as("word"))
      .filter(col("word") =!= "")
      .join(dict, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
      .orderBy("doc_id")
  }

  /** The training replay's WITH-chain alone (w0 … w`rounds`), for oracles
    * that consume the segmented dictionary: w`rounds`.syms is each word's
    * final subword sequence. */
  def duckBpeChain(rounds: Int = BpeRounds): String = {
    val chain = duckBpeSql(rounds)
    chain.substring(0, chain.indexOf("\nSELECT * FROM ("))
  }

  /** Oracle for [[bpeApplyDf]]: the training replay's final `w` CTE is the
    * segmented dictionary; roll doc tokens up against its symbol counts. */
  def duckBpeApplySql(rounds: Int = BpeRounds): String =
    s"""${duckBpeChain(rounds)},
       |tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS word
       |       FROM documents)
       |SELECT t.doc_id, COUNT(*) AS n_words,
       |       CAST(SUM(len(w.syms)) AS BIGINT) AS n_subwords
       |FROM tk t JOIN w$rounds w USING (word)
       |WHERE t.word <> ''
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
}
