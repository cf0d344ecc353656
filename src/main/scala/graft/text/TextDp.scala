package graft.text

import org.apache.spark.sql.functions._

/** The differential-privacy release mechanism behind `tx_dp_histogram` and
  * RunCorpusPipeline's data card: exact inverse-CDF thresholds for the
  * discrete-Laplace (two-sided geometric) noise, the seed-keyed noisy-count
  * transform, and the publishable-column contract. Mixed into [[TextStats]]
  * (split out of TextStats.scala in round 15 — same package, no behavior
  * change); all call sites go through `TextStats.*`. */
private[text] trait TextDp {
  /** Inverse-CDF thresholds for the DISCRETE two-sided geometric noise of
    * [[defs tx_dp_histogram]] (the discrete Laplace mechanism): noise j has
    * P(j) = ((1-α)/(1+α))·α^|j| with α = 1/3 ⇒ ε = ln 3 per count at
    * sensitivity 1. Clipped to [-20, 20] (tail mass 3⁻²⁰ ≈ 3e-10 folds into
    * the extremes). Sampling is u < T_j inversion over a 48-bit uniform:
    * T_j = ⌊2⁴⁸·F(j)⌋ with F(j) = 3^(21-|j|)/(4·3²⁰) for j<0 and
    * 1 − 3^(20-j)/(4·3²⁰) for j≥0 — EXACT BigInt rationals, so the same 40
    * literal thresholds are interpolated into the Spark expression and the
    * DuckDB oracle and every engine draws the identical noise. (ANY real
    * per-row uniform works; md5 keyed on a release tag + the cell key makes
    * the draw reproducible across engines, reruns, and partitionings.) */
  private[graft] val dpThresholds: Seq[Long] = {
    val d = BigInt(4) * BigInt(3).pow(20)
    (-20 to 19).map { j =>
      val num = if (j < 0) BigInt(3).pow(21 + j) else d - BigInt(3).pow(20 - j)
      (((BigInt(1) << 48) * num) / d).toLong
    }
  }

  /** The fixed, PUBLIC seed tag the registered [[defs tx_dp_histogram]]
    * query draws its noise from — harness-only. The DuckDB oracle must
    * recompute the identical noise to hash-match, and that replayability is
    * precisely the capability a real release must deny: under a public seed
    * anyone recomputes noise = f(seed, key) and subtracts it, so the ε
    * accounting is void. Production callers of [[dpNoisyCounts]] pass a
    * SECRET seed instead (see the scaladoc there). */
  private[graft] final val DpHarnessSeed = "dp1:"

  /** The ε = ln 3 discrete-Laplace noisy release as a frame transform: per
    * value of `keyCol`, the raw count plus noise drawn by inverse-CDF
    * inversion of a 48-bit md5 uniform keyed on (seedTag, cell key) — see
    * [[dpThresholds]]. Deterministic per seed: re-running the same release
    * never re-randomizes (fresh noise per rerun would average away).
    *
    * THE SEED IS THE SECRET. The md5 keying makes noise a pure function of
    * (seedTag, key), so the DP guarantee holds only while seedTag is
    * unpublishable: a public seed lets anyone subtract the noise, and two
    * releases sharing a seed over overlapping data difference to exact
    * count deltas. Production rules: one fresh secret seed per release,
    * never stored in any published artifact, never reused across releases.
    * The registered query passes [[DpHarnessSeed]] (public, test-only) so
    * the cross-engine oracle can replay the draw; [[graft.etl
    * .RunCorpusPipeline]] draws a per-release secret and publishes only
    * the noisy column. Shared by both so the mechanism cannot drift.
    *
    * The seed rides a bound literal (`lit`), not string-built SQL, so no
    * seed value can alter the expression. Emits internal columns
    * (`n_raw`, `noise`) for oracle/spec checks — a release must project
    * [[DpPublicCols]] only.
    *
    * `seedTag` has NO default on purpose: a default of [[DpHarnessSeed]]
    * would let a production caller that forgets the argument silently get
    * replayable (public-seed) noise, voiding the guarantee with no
    * compile-time signal. The unsafe choice must be written out —
    * the registered harness query passes [[DpHarnessSeed]] by name. */
  def dpNoisyCounts(df: org.apache.spark.sql.DataFrame, keyCol: String,
      seedTag: String): org.apache.spark.sql.DataFrame = {
    val tArr = dpThresholds.mkString("array(", "L, ", "L)")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_raw"))
      .withColumn("u48",
        conv(substring(md5(concat(lit(seedTag), col(keyCol))), 1, 12), 16, 10)
          .cast("long"))
      .withColumn("noise", expr(s"size(filter($tArr, t -> u48 >= t)) - 20"))
      .select(col(keyCol), col("n_raw"), col("noise"),
        expr("greatest(n_raw + noise, 0L)").as("n_noisy"),
        lit(EpsMicro).as("eps_micro"))
      .orderBy(keyCol)
  }

  /** ε = ln 3 in micro-units (⌊ln(3)·10⁶⌋) — the ONE definition of the
    * mechanism's privacy budget. The emitted `eps_micro` column, the
    * pipeline manifest's `dp_eps_micro` field, and the oracle SQL all
    * interpolate this constant so a retune cannot leave a published
    * record disagreeing with the mechanism that actually ran (round-19
    * review: the manifest restated the literal). */
  final val EpsMicro = 1098612L

  /** The columns of a [[dpNoisyCounts]] result that a release may publish
    * (plus the key column). `n_raw`/`noise`/`u48` exist for the internal
    * oracle and spec checks only — shipping either voids the guarantee. */
  final val DpPublicCols: Seq[String] = Seq("n_noisy", "eps_micro")
}
