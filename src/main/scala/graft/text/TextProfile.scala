package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus PROFILE diagnostics (SURVEY §2-G): tokenizer-sizing fertility
  * stats and per-document character-class entropy. Both are pure
  * per-row expression maps plus (for fertility) one map-side-combinable
  * aggregation — no joins, no windows, nothing pairwise, so they scale
  * linearly with input splits at any corpus size.
  *
  * Reference behavior being matched: the per-document scoring passes of
  * a training-data curation pipeline (the reference's consume-side
  * analytics surface, fgrzl/streamkit pkg/api/messages.go:23-249 gives
  * the enumerate-and-aggregate contract; the text metrics themselves
  * are the published curation recipes).
  */
object TextProfile {

  /** TOKENIZER FERTILITY per (lang, source) — the sizing table a
    * tokenizer review reads before committing a vocab: how many
    * BPE-ish subword tokens each whitespace word costs (`fert_milli`,
    * the fertility of published tokenizer evaluations) and how many
    * non-space characters each subword token carries
    * (`chars_per_bpe_milli`). A language whose fertility drifts high is
    * under-served by the vocab (it pays more sequence length per word)
    * — the signal that re-balances vocab training data, read next to
    * `vocab_coverage`'s OOV view.
    *
    * Numeric contract: both ratios are HALF-UP integer millis computed
    * entirely in BIGINT — (2·a·1000 + b) div (2·b), the driftFrom
    * pattern — no float round anywhere; zero-denominator groups (a
    * lang/source cell whose every doc is empty) get NULL via CASE, the
    * nullif doctrine. Overflow: a·1000 wraps only past 9.2e15 tokens
    * per (lang, source) cell — a ~50 TB single-cell bound; cells are
    * per-language-per-source, so a corpus that big in ONE cell is
    * re-scoped before this wraps (documented, not fenced: the sums
    * feed a ratio, and unlike the embedding moments a wrap here is
    * caught by the negative-milli sanity of the output). */
  def tokFertility(d: DataFrame): DataFrame =
    d.withColumn("ws",
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long"))
      .withColumn("bpe",
        size(expr(s"regexp_extract_all(text, '${TextOps.BpePattern}', 0)"))
          .cast("long"))
      .withColumn("nsp",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("nsp")).as("nsp_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("ws_tokens"), col("bpe_tokens"), col("nsp_chars"),
        expr("CASE WHEN ws_tokens > 0 THEN " +
          "(2 * bpe_tokens * 1000 + ws_tokens) div (2 * ws_tokens) " +
          "END").as("fert_milli"),
        expr("CASE WHEN bpe_tokens > 0 THEN " +
          "(2 * nsp_chars * 1000 + bpe_tokens) div (2 * bpe_tokens) " +
          "END").as("chars_per_bpe_milli"))

  /** ZIPF rank-frequency AUDIT per language — how power-law-like is
    * each language's token distribution? Natural text obeys Zipf
    * (log-log slope ≈ −1); machine-generated spam, template floods, and
    * extraction damage bend the curve, so the fitted slope is a
    * corpus-health signal read next to [[charEntropy]] (character
    * level) and `vocab_audit` (lexical level).
    *
    * Shape: per-lang token counts (one hash agg), then the top-`k`
    * tokens per lang via the BOUNDED [[graft.functions.MinKByKey]]
    * aggregate — map-side combine ships ≤ k rows per (lang × input
    * partition), NO window, NO sort of the vocabulary (the
    * sample_exact_k doctrine; the row_number formulation is the
    * DuckDB oracle — two-formulation cross-check). The order key
    * encodes (cnt desc, tok asc) as a zero-padded string so the
    * bounded aggregate's ascending order IS the frequency rank, and
    * the count parses back out of the key exactly (cnt < 10¹⁸).
    *
    * Fit: ordinary least squares of y = ln(cnt) on x = ln(rank), both
    * MILLI-SNAPPED before composing (the lam_milli discipline — rank
    * and cnt are exact integers, so the ln args are bit-identical);
    * every moment is an exact BIGINT (n ≤ k = 100 rows per lang:
    * n·Σxy < 2·10¹² outright); `slope_num`/`slope_den` are the exact
    * integer core, slope and r2 are single IEEE chains over them.
    * Membership guard is INTEGER (slope_den > 0 — needs ≥ 2 distinct
    * ranks); a constant-count top set yields r2 NULL via CASE (zero
    * y-variance). */
  def zipfAudit(d: DataFrame, k: Int = 100): DataFrame = {
    require(k >= 2 && k <= 10000, s"k must be in [2, 10000], got $k")
    val cnts = TextOps.lowerToks(d)
      .select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val topK = cnts
      .withColumn("key",
        concat(format_string("%019d", lit(1000000000000000000L) - col("cnt")),
          lit(":"), col("tok")))
      .groupBy(col("lang"))
      .agg(graft.functions.MinKByKey(
        struct(col("key").as("key"), lit(0L).as("id")), k).as("picks"))
      .select(col("lang"), posexplode(col("picks")))
      .select(col("lang"), (col("pos") + 1L).cast("long").as("rnk"),
        (lit(1000000000000000000L) -
          substring(col("col.key"), 1, 19).cast("long")).as("cnt"))
    val snapped = topK.select(col("lang"),
      floor(log(col("rnk").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("x"),
      floor(log(col("cnt").cast("double")) * lit(1000.0) + lit(0.5))
        .cast("long").as("y"))
    snapped.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_top"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lang"), col("n_top"),
        (col("n_top") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n_top") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"),
        (col("n_top") * col("syy") - col("sy") * col("sy"))
          .as("yvar_den"))
      .filter(col("slope_den") > 0L)
      .select(col("lang"), col("n_top"), col("slope_num"),
        col("slope_den"),
        (col("slope_num").cast("double") / col("slope_den").cast("double"))
          .as("slope"),
        when(col("yvar_den") > 0L,
          (col("slope_num").cast("double") * col("slope_num").cast("double")) /
            (col("slope_den").cast("double") * col("yvar_den").cast("double")))
          .as("r2"))
  }

  /** Quality-score CALIBRATION against duplication — does the quality
    * gate actually anti-correlate with the noise it is meant to catch?
    * Per quality quarter (q4, [[TextOps.scoredQ4Full]] verbatim — the
    * one-definition discipline): exact doc count, docs that are
    * exact-duplicate MEMBERS (content digest appears > 1 time — the
    * dedup_exact digest verbatim), the half-up integer-milli dup share,
    * and the token mass at stake. A gate whose high quarters carry the
    * same dup share as its low ones isn't separating signal from noise
    * — the calibration view a curation review reads before trusting
    * quality_cut's boundary. ≤ 5 output rows at any corpus size.
    *
    * Scale: the quality pass is per-row; the digest side is one
    * map-side-combinable hash agg + an equijoin back on the digest —
    * the dedup_exact shape, never pairwise. */
  def qualityCalibration(d: DataFrame): DataFrame = {
    val dg = d.select(col("doc_id"),
      md5(lower(trim(col("text")))).as("digest"))
    val dup = dg.groupBy(col("digest")).agg(count(lit(1)).as("c"))
    val flagged = dg.join(dup, Seq("digest"))
      .select(col("doc_id"),
        when(col("c") > 1L, 1L).otherwise(0L).as("is_dup"))
    TextOps.scoredQ4Full(d)
      .join(flagged, Seq("doc_id"))
      .groupBy(col("q4"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup_docs"),
        sum(col("n_tok")).as("tokens_total"))
      .select(col("q4"), col("n_docs"), col("n_dup_docs"),
        col("tokens_total"),
        expr("(2 * n_dup_docs * 1000 + n_docs) div (2 * n_docs)")
          .as("dup_milli"))
  }

  /** PII DENSITY per source — the release-review companion of
    * [[TextOps.redact]] (same two pattern definitions, so the rollup
    * can only drift from the redactor by the aggregation itself): how
    * much of each source's mass carries emails / long digit runs, as
    * exact match counts plus the half-up integer-milli share of
    * affected docs. The source-level triage view a privacy review reads
    * BEFORE deciding where redaction must run — a source with
    * near-zero density skips the rewrite pass entirely at 100 TB.
    *
    * Match counts come from size(split(text, pat, -1)) − 1 — the
    * no-limit split keeps trailing empties, so the count is exact and
    * mirrors DuckDB's len(regexp_extract_all(...)); null-text docs
    * contribute NULL counts (skipped by sum, counted in n_docs — the
    * corpus_health accounting). One per-row map + one hash agg. */
  def piiDensity(d: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val digits = "[0-9]{6,}"
    def hits(pat: String): Column =
      (size(split(col("text"), pat, -1)) - 1).cast("long")
    d.select(col("source"),
        hits(email).as("e_hits"), hits(digits).as("n_hits"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("e_hits")).as("n_email_hits"),
        sum(col("n_hits")).as("n_num_hits"),
        sum(when(col("e_hits") + col("n_hits") > 0L, 1L).otherwise(0L))
          .as("docs_with_pii"))
      .select(col("source"), col("n_docs"), col("n_email_hits"),
        col("n_num_hits"), col("docs_with_pii"),
        expr("(2 * docs_with_pii * 1000 + n_docs) div (2 * n_docs)")
          .as("pii_docs_milli"))
  }

  /** Character-CLASS entropy per document — the cheap binary-junk /
    * encoding-damage detector run before any tokenizer sees the bytes:
    * a text whose character distribution collapses to one class
    * (digit dumps, base64 blobs rendered as letters, whitespace runs)
    * has near-zero class entropy, while natural prose mixes classes.
    * `junk = 1` marks docs below `tauMicroNats` micro-nats — an
    * ALL-INTEGER membership predicate (the threshold doctrine: engine
    * FP differences can't flip row membership).
    *
    * Numeric contract: five class counts (lower/upper/digit/space/
    * other) are exact integers from length-difference counting; the
    * one transcendental per class, ln(c_k/n), is snapped to the
    * micro grid via floor(·1e6 + 0.5) BEFORE composing (the lam_milli
    * discipline — the ln argument is one IEEE division of exact
    * integers, bit-identical across engines), and the entropy is the
    * single division −h_sum / (n·1e6) of exact integers — no float
    * round anywhere. Zero-length docs have no distribution and no row
    * (the no-evidence contract). Per-row map only: whole-stage
    * codegen end to end, zero shuffles. */
  def charEntropy(d: DataFrame, tauMicroNats: Long = 800000L): DataFrame = {
    require(tauMicroNats >= 1L && tauMicroNats <= 10000000L,
      s"tauMicroNats must be in [1, 1e7], got $tauMicroNats")
    def cnt(pat: String): Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), pat, ""))).cast("long")
    // snapped per-class term: c_k · round_micro(ln(c_k / n)); absent
    // classes contribute exact 0 (lim x→0 of x·ln x)
    def term(c: String): Column =
      when(col(c) > 0L,
        col(c) * floor(log(col(c).cast("double") /
          col("n_chars").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
        .otherwise(0L)
    d.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        cnt("[a-z]").as("c_lower"),
        cnt("[A-Z]").as("c_upper"),
        cnt("[0-9]").as("c_digit"),
        cnt(" ").as("c_space"))
      .filter(col("n_chars") > 0L)
      .withColumn("c_other",
        col("n_chars") - col("c_lower") - col("c_upper") -
          col("c_digit") - col("c_space"))
      .withColumn("h_sum",
        term("c_lower") + term("c_upper") + term("c_digit") +
          term("c_space") + term("c_other"))
      .select(col("doc_id"), col("n_chars"), col("c_lower"),
        col("c_upper"), col("c_digit"), col("c_space"), col("c_other"),
        ((-col("h_sum")).cast("double") /
          (col("n_chars").cast("double") * lit(1000000.0)))
          .as("entropy"),
        when(-col("h_sum") < lit(tauMicroNats) * col("n_chars"), 1L)
          .otherwise(0L).as("junk"))
  }
}
