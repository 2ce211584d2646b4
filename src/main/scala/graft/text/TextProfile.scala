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
