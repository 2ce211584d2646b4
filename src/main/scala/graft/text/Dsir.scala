package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how target-like its
  * HASHED n-gram distribution is, then keep the highest-importance
  * slice. The published recipe — hash word unigrams+bigrams into a
  * fixed bucket space, fit bag-of-buckets models on the target and raw
  * corpora, weight = Σ_features log(p_target/p_raw) — maps exactly onto
  * this repo's closed-form-trainer doctrine (the
  * [[TextOps.domainClassifier]] ladder): every moment is an exact
  * integer, the ONE transcendental per bucket is milli-snapped before
  * any composition, per-doc scores are exact BIGINT dot products, and
  * selection membership is a pure integer predicate.
  *
  * What distinguishes DSIR from `domain_classifier` (raw-term NB
  * log-odds): the feature space is the FIXED 4096-bucket hash of
  * unigrams AND bigrams — corpus-INDEPENDENT model size by
  * construction (the published method's point: at 100 TB the model is
  * still ≤ 4096 rows, no df-banding needed), bigram features capture
  * phrase-level domain signal, and the output is a global
  * top-keepMilli‰ SELECTION over the raw pool rather than a per-doc
  * class decision.
  *
  * Numeric contract: bucket = first 3 hex chars of md5(feature) —
  * engine-identical, no hex→int conversion anywhere (the
  * format_string-trap lesson: hex STRINGS compare fine, numeric
  * conversions differ). λ_milli(b) = half-up milli of
  * ln((c_t+1)·(R+v) / ((c_r+1)·(T+v))) with the products taken as
  * doubles multiply-before-divide (identical IEEE chain both engines;
  * exact-integer inputs, so the ln argument is bit-identical — the
  * domainModel precedent). Per-doc weight_milli = Σ_b n_b·λ_milli(b)
  * is an exact BIGINT. The selection grid value
  * g = (w_milli + n_feats·10⁵) div n_feats is a POSITIVE-shifted mean:
  * |λ_milli| < 10⁵ outright (λ_milli ≤ 1000·ln(R+v) and R < 2⁶³ rows
  * ⇒ |λ_milli| < 45 000), so the numerator is strictly positive and
  * integer division is floor == truncation — identical in Spark (`div`)
  * and DuckDB (`//`), whose semantics DIVERGE on negative dividends.
  *
  * Scale: ONE feature explode over the corpus feeds model AND scores
  * (the wordAssoc tokenize-once discipline — the per-(doc, bucket)
  * count table is eagerly checkpointed for its two consumers); the
  * model is ≤ 4096 rows (broadcast), the decision grid is bounded by
  * the λ range (< 2·10⁵ rows, corpus-independent — its window never
  * touches doc rows), and the gate is a broadcast equijoin. Nothing
  * pairwise, nothing sorts the corpus. */
object Dsir {

  /** 16³ buckets: the bucket key IS the 3-hex-char md5 prefix. */
  val BucketHexChars = 3

  /** Positive shift for the grid division (strictly dominates any
    * reachable |λ_milli| — see the numeric contract above). */
  val GridOffset = 100000L

  /** One row per feature OCCURRENCE: (doc_id, source, b). Features are
    * lowercased whitespace unigrams plus adjacent bigrams joined with
    * one space (disjoint from unigrams — tokens never contain ' ').
    * zip_with over two bound slices (the bigramPairs discipline: the
    * sibling-alias O(n²) inlining trap). Null/empty text → null/empty
    * feats → no rows (no evidence, no row — the hostile-sweep
    * contract). */
  private[graft] def featBuckets(d: DataFrame): DataFrame =
    TextOps.lowerToks(d)
      .select(col("doc_id"), col("source"), col("toks"))
      .select(col("doc_id"), col("source"), explode(expr(
        // greatest(·, 0): a 0/1-token doc must still contribute its
        // unigrams — a raw size-1 slice length is NEGATIVE there and
        // Spark's slice throws under ANSI (hostile-sweep contract)
        """concat(toks,
                  zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
                           slice(toks, 2, greatest(size(toks) - 1, 0)),
                           (a, b) -> concat(a, ' ', b)))""")).as("feat"))
      .select(col("doc_id"), col("source"),
        substring(md5(col("feat")), 1, BucketHexChars).as("b"))

  /** Per-(doc, bucket) occurrence counts — the ONE tokenization pass
    * everything else derives from. Callers that consume it more than
    * once checkpoint it (multi-consumer intermediate discipline). */
  private def docBucketCounts(d: DataFrame): DataFrame =
    featBuckets(d)
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("n"))

  /** Model counts + milli-snapped log ratio from a (doc, bucket) count
    * table. Target = the reference source's docs (the domainClassifier
    * refSource convention: the small trusted slice whose distribution
    * the selection should match); raw = the whole pool (target
    * included — deterministic, and c_t ≤ c_r by construction so
    * λ ≤ ln((R+v)/(T+v))). One map-side-combinable agg + a broadcast
    * one-row total; ≤ 4096 output rows at ANY corpus size. */
  private def modelFrom(dc: DataFrame, refSource: String): DataFrame = {
    val cnt = dc.groupBy(col("b"))
      .agg(
        sum(when(col("source") === refSource, col("n"))
          .otherwise(0L)).as("c_t"),
        sum(col("n")).as("c_r"))
    val tot = cnt.groupBy().agg(
      sum(col("c_t")).as("t_total"),
      sum(col("c_r")).as("r_total"),
      count(lit(1)).as("v_size"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("lam_milli",
        floor(log(
          (col("c_t") + 1L).cast("double") *
            (col("r_total") + col("v_size")).cast("double") /
            ((col("c_r") + 1L).cast("double") *
              (col("t_total") + col("v_size")).cast("double"))) *
          lit(1000.0) + lit(0.5)).cast("long"))
      .select("b", "c_t", "c_r", "lam_milli")
  }

  /** The trained importance model as a standalone artifact (what the
    * streaming gate freezes). */
  def dsirModel(d: DataFrame, refSource: String = "src0"): DataFrame =
    modelFrom(docBucketCounts(d), refSource)

  private def weightsFrom(dc: DataFrame, lam: DataFrame): DataFrame =
    dc.join(broadcast(lam.select(col("b"), col("lam_milli"))), "b")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_feats"),
        sum(col("n") * col("lam_milli")).as("w_milli"))
      .withColumn("g",
        expr(s"(w_milli + n_feats * $GridOffset) div n_feats"))

  /** Per-doc importance weights: (doc_id, n_feats, w_milli, g). Docs
    * with zero features (null/empty text) have no evidence and no row —
    * an integer membership rule. When no frozen model is passed, the
    * model trains on the same (checkpointed) bucket-count pass that
    * scores. */
  def dsirWeights(d: DataFrame, refSource: String = "src0",
      model: Option[DataFrame] = None): DataFrame =
    model match {
      case Some(m) => weightsFrom(docBucketCounts(d), m)
      case None =>
        // 2 consumers of the explode+agg pass: model counts + scoring
        val dc = docBucketCounts(d).localCheckpoint(true)
        weightsFrom(dc, modelFrom(dc, refSource))
    }

  /** The frozen GLOBAL decision grid (g → cnt, deficit, tp) from a
    * weights table: the qualityDecisions machinery with the partition
    * key collapsed — DSIR selects from the raw pool globally (matching
    * the target distribution is a corpus-level goal; per-source floors
    * are quality_cut's job). The single-partition window is over the
    * BOUNDED grid only (< 2·10⁵ rows outright, realistically a few
    * hundred — never doc rows). */
  private def decisionsFrom(wts: DataFrame, keepMilli: Long): DataFrame = {
    require(keepMilli >= 1L && keepMilli <= 999L,
      s"keepMilli must be in [1, 999], got $keepMilli")
    val grid = wts.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // 2 consumers: prefix + total
    val w = Window.orderBy(col("g").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = grid.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(w), lit(0L)))
    val tot = grid.groupBy().agg(sum(col("cnt")).as("n_docs"))
    pref.crossJoin(broadcast(tot))
      .withColumn("deficit",
        expr(s"(n_docs * $keepMilli) div 1000") - col("cum_before"))
      .withColumn("tp",
        expr("(deficit * 65536 + cnt - 1) div cnt"))
      .select("g", "cnt", "deficit", "tp")
  }

  /** The frozen decision grid as a standalone artifact (what the
    * streaming gate scores against, next to the model). */
  def dsirDecisions(d: DataFrame, refSource: String = "src0",
      keepMilli: Long = 250L): DataFrame =
    decisionsFrom(dsirWeights(d, refSource), keepMilli)

  /** The gate decision — stateless equijoin + when-chain against a
    * (frozen) decision grid, shared verbatim by [[dsirSelect]] and the
    * streaming gate (the applyQualityGate posture; branch order is
    * load-bearing, the oracle mirrors the CASE order). `scored` must
    * carry (doc_id, g, hex4). */
  private[graft] def applyDsirGate(scored: DataFrame,
      decisions: DataFrame): DataFrame =
    scored.join(decisions, Seq("g"))
      .withColumn("kept",
        when(col("deficit") <= 0L, 0L)
          .when(col("deficit") >= col("cnt"), 1L)
          .when(col("tp") >= 65536L, 1L)
          .when(col("hex4") < format_string("%04x", col("tp")), 1L)
          .otherwise(0L))
      .select("doc_id", "g", "kept")

  /** The salted 16-bit sub-split draw — one definition for batch and
    * stream (pure per-row expression over doc_id). */
  private[graft] def hex4Col: Column =
    substring(md5(concat_ws(":",
      col("doc_id").cast("string"), lit("dsir"))), 1, 4)

  /** Importance SELECTION: keep the top keepMilli‰ of the scored pool
    * by (g desc, salted hex4 asc) — whole grid groups above the global
    * boundary kept, below dropped, the boundary group sub-split
    * doc-granularly at the exact ceil threshold. Deterministic pure
    * function of the (doc_id, corpus) pair; all-integer membership. */
  def dsirSelect(d: DataFrame, refSource: String = "src0",
      keepMilli: Long = 250L): DataFrame = {
    // 2 consumers of the scored pass: decision grid + gate input
    val wts = dsirWeights(d, refSource).localCheckpoint(true)
    applyDsirGate(wts.withColumn("hex4", hex4Col),
      broadcast(decisionsFrom(wts, keepMilli)))
  }

  /** Hashed-FEATURE distribution drift between two crawl eras — the
    * [[graft.operators.Windows.valueDrift]] monitor lifted onto the
    * DSIR bucket space: per bucket, the old-vs-new feature-mass shares,
    * flagged when the absolute share shift exceeds tauMicro per-million
    * of total feature mass. This is the text-side early-warning dual of
    * the payload monitor: a new domain, language, or extractor
    * regression shifts hashed-feature mass long before any quality
    * gate's aggregate moves, and the monitor table is bounded at 16³
    * rows at ANY corpus size (the DSIR model-size argument).
    *
    * The flag is the EXACT integer cross-multiplication
    * |n_old·t_new − n_new·t_old|·10⁶ > τ·t_old·t_new taken in
    * DECIMAL(38,0) (BIGINT wraps near t ≈ 10¹³ features — the
    * word_assoc posture; oracle mirrors with HUGEINT); shares are
    * half-up integer micros, display-only. Scale: one linear feature
    * explode per era, one (era, bucket) hash agg, everything after is
    * ≤ 4096-row arithmetic. */
  def featureDrift(oldD: DataFrame, newD: DataFrame,
      tauMicro: Long = 500L): DataFrame =
    driftFrom(bucketMass(oldD, "n_old"), bucketMass(newD, "n_new"),
      tauMicro)

  /** Per-bucket feature mass of one era — the frozen "old profile"
    * artifact the live monitor compares against (≤ 4096 rows). */
  def bucketMass(d: DataFrame, as: String = "n"): DataFrame =
    featBuckets(d).groupBy(col("b")).agg(count(lit(1)).as(as))

  /** The drift decision from two (bucket, mass) tables — shared
    * VERBATIM by [[featureDrift]] and the live monitor
    * ([[graft.streaming.Streaming.runFeatureDriftMonitor]]), the
    * one-definition discipline. Inputs must carry (b, n_old) and
    * (b, n_new). */
  private[graft] def driftFrom(oldCounts: DataFrame, newCounts: DataFrame,
      tauMicro: Long = 500L): DataFrame = {
    require(tauMicro >= 1L && tauMicro <= 1000000L,
      s"tauMicro must be in [1, 1e6], got $tauMicro")
    val joined = oldCounts
      .join(newCounts, Seq("b"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
      .localCheckpoint(true) // ≤ 4096 rows; feeds totals + the flag scan
    val tots = joined.groupBy().agg(
      sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"))
    joined.crossJoin(broadcast(tots))
      .filter(
        abs(col("n_old").cast("decimal(38,0)") * col("t_new") -
          col("n_new").cast("decimal(38,0)") * col("t_old")) *
          lit(1000000L) >
        lit(tauMicro) * col("t_old").cast("decimal(38,0)") * col("t_new"))
      .select(col("b"), col("n_old"), col("n_new"), col("t_old"),
        col("t_new"),
        expr("CASE WHEN t_old > 0 THEN " +
          "(2 * n_old * 1000000 + t_old) div (2 * t_old) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_old_micro"),
        expr("CASE WHEN t_new > 0 THEN " +
          "(2 * n_new * 1000000 + t_new) div (2 * t_new) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_new_micro"))
  }

  /** Per-source DISTRIBUTIONAL divergence from the corpus — smoothed
    * KL(source ‖ corpus) over the hashed feature space: the
    * "which sources are distributionally redundant vs distinct" view a
    * mixture planner reads next to `vocab_overlap` (lexical overlap)
    * and `mix_plan` (mass weights). A source with near-zero divergence
    * adds no distributional diversity; a high-divergence source is
    * either a genuinely distinct domain or an extractor regression —
    * `feature_drift` tells the two apart era-over-era.
    *
    * Numeric contract (the dsir_weights ladder verbatim): all counts
    * exact integers; per (source, bucket), the ONE transcendental
    * ln((c_s+1)(T_c+V)/((c_c+1)(T_s+V))) is milli-snapped with the
    * multiply-before-divide double chain over exact-integer inputs
    * (bit-identical arg both engines); kl_sum_milli = Σ_b (c_s+1)·λ_b
    * is an exact BIGINT because the sum runs over ALL V corpus buckets
    * (absent buckets contribute their smoothing mass — true zeros
    * widen the sum, the moment doctrine), so Σ(c_s+1) = T_s+V exactly;
    * kl_milli is the POSITIVE-SHIFTED half-up integer division
    * (|λ_milli| < ln(2⁶³)·1000 < 45 000 outright, so shifting by
    * 50 000·D makes the dividend strictly positive — div == floor ==
    * truncation in both engines); kl_nats is one IEEE chain over exact
    * integers, display-only. Overflow: the shifted dividend wraps past
    * D ≈ 4.8·10¹³ smoothed features per source — enforced in-plan by
    * the assert fence (the momentGuard posture), not a comment.
    *
    * Scale: one feature explode (shared shape with dsirWeights), one
    * (source, bucket) hash agg, then EVERYTHING downstream is
    * (|sources| × 4096)-row arithmetic — corpus-independent by the
    * same construction that bounds the DSIR model. */
  def sourceDivergence(d: DataFrame): DataFrame = {
    val MaxSmoothed = 48000000000000L // 4.8e13: 1.9e5·D must fit BIGINT
    // (source, b) counts: feeds the corpus profile AND the grid join
    val sb = docBucketCounts(d)
      .groupBy(col("source"), col("b"))
      .agg(sum(col("n")).as("c_s"))
      .localCheckpoint(true)
    val corpus = sb.groupBy(col("b")).agg(sum(col("c_s")).as("c_c"))
      .localCheckpoint(true) // ≤ 4096 rows; feeds totals + the grid
    val tot = corpus.groupBy().agg(
      sum(col("c_c")).as("t_c"), count(lit(1)).as("v"))
    val st = sb.groupBy(col("source")).agg(sum(col("c_s")).as("t_s"))
    // full |sources| × V grid: smoothing gives absent buckets real mass
    val grid = st.crossJoin(broadcast(corpus)).crossJoin(broadcast(tot))
      .join(sb, Seq("source", "b"), "left")
      .na.fill(0L, Seq("c_s"))
      .withColumn("lam_milli",
        floor(log(
          (col("c_s") + 1L).cast("double") *
            (col("t_c") + col("v")).cast("double") /
            ((col("c_c") + 1L).cast("double") *
              (col("t_s") + col("v")).cast("double"))) *
          lit(1000.0) + lit(0.5)).cast("long"))
    grid.groupBy(col("source"))
      .agg(
        max(col("t_s")).as("t_s"),
        max(col("v")).as("n_buckets"),
        sum((col("c_s") + 1L) * col("lam_milli")).as("kl_sum_milli"))
      // the overflow fence folds into a KEPT column so pruning can't
      // drop it (the momentGuard posture); it checks the COUNT-derived
      // D, never a sum that may already have wrapped
      .withColumn("kl_milli",
        expr(s"""(2 * (kl_sum_milli + (t_s + n_buckets) * 50000)
                  + (t_s + n_buckets)) div (2 * (t_s + n_buckets))
                 - 50000""") +
          coalesce(assert_true(col("t_s") + col("n_buckets") <=
              lit(MaxSmoothed),
            concat(lit("source-divergence overflow fence: "),
              (col("t_s") + col("n_buckets")).cast("string"),
              lit(s" smoothed features in one source exceed " +
                s"$MaxSmoothed — the shifted kl dividend would wrap; " +
                "scope the source or shard the divergence run")))
            .cast("long"), lit(0L)))
      .select(col("source"), col("t_s"), col("n_buckets"),
        col("kl_sum_milli"), col("kl_milli"),
        (col("kl_sum_milli").cast("double") /
          ((col("t_s") + col("n_buckets")).cast("double") * lit(1000.0)))
          .as("kl_nats"))
  }

  /** Per-source accounting for [[dsirSelect]] (the lsh_bucket_audit
    * discipline): scored docs, selected count, the realized half-up
    * milli share, and the exact summed weight — the "which sources
    * does the target distribution favor" view a mixture planner reads
    * next to mix_plan. Oracle embeds the select SQL verbatim. */
  def dsirAudit(d: DataFrame, refSource: String = "src0",
      keepMilli: Long = 250L): DataFrame = {
    // 3 consumers of the scored pass: grid, gate input, weight sums
    val wts = dsirWeights(d, refSource).localCheckpoint(true)
    val sel = applyDsirGate(wts.withColumn("hex4", hex4Col),
      broadcast(decisionsFrom(wts, keepMilli)))
    sel.join(wts.select(col("doc_id"), col("w_milli")), "doc_id")
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_sel"),
        sum(col("w_milli")).as("sum_w_milli"))
      .withColumn("sel_milli",
        expr("(2 * n_sel * 1000 + n_docs) div (2 * n_docs)"))
      .select("source", "n_docs", "n_sel", "sel_milli", "sum_w_milli")
  }
}
