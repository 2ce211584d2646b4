package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic EPOCH-SHUFFLE planning (SURVEY §2-G) — the
  * data-loading-order receipts of a training run.
  *
  * A 100 TB training corpus is not shuffled by a random() pass (not
  * reproducible, not resumable, not auditable); production loaders
  * derive a per-epoch PSEUDORANDOM total order from a keyed hash, shard
  * it, and sort WITHIN shards — any worker can then reconstruct its
  * read order from (epoch, shard) alone, and two runs of the same
  * epoch read identical orders. This module materializes exactly that
  * contract: order key = md5("shuf:<epoch>:<doc_id>") (the repo's
  * derived-key doctrine — md5 over ':'-joined parts is engine-identical,
  * so the full receipt table sits under the hash gate), shard = leading
  * hex chars of the key (ADAPTIVE width, floor 2 = 256 shards; see
  * [[shardChars]]), position = rank of the key within the shard.
  * Different epochs draw INDEPENDENT orders from the same corpus — the
  * cheap, auditable approximation of reshuffling-per-epoch that
  * published training stacks use. */
object Shuffle {

  /** Rows one shard's window sort may hold before the shard key widens.
    * A 10⁶-row partition-local rank is a comfortable single task; the
    * cap is on DOC COUNT (exact, memoized), the one quantity the md5
    * shard distributes uniformly by construction. */
  val TargetDocsPerShard: Long = 1000000L

  /** Shard-key width in hex chars for a corpus of `n` docs: smallest
    * width whose 16^chars shards hold ≤ [[TargetDocsPerShard]] expected
    * docs each, floored at 2 (256 shards — every corpus at or below
    * 256·10⁶ docs keeps the historical 2-char key, so receipts and the
    * oracle are byte-identical at every gate/stress scale). This was
    * the one implicit bound in the family (r15 verdict): a fixed 256
    * shards at the 100 TB design point is a ~400 GB single-task sort
    * per shard — the momentGuard class of silent cliff, now derived
    * from corpus size exactly like LshBuckets' adaptive planes. Capped
    * at 8 chars (4·10⁹ shards) — past that the per-shard expectation
    * is < 1 doc and width no longer buys parallelism. */
  def shardChars(n: Long): Int = {
    var chars = 2
    var cap = 256L * TargetDocsPerShard
    while (n > cap && chars < 8) { chars += 1; cap *= 16L }
    chars
  }

  /** md5 order key for one epoch. `concat` (NOT concat_ws): concat_ws
    * SKIPS nulls, so a null doc_id would silently key as md5("shuf:1:")
    * while the DuckDB oracle's `||` nulls out — a mystery hash-gate
    * mismatch. The id is fenced non-null in-plan instead (the
    * corpus_health / injectivity-require posture): a null id has no
    * deterministic position and must be a named error, not a key. */
  private def orderKey(epoch: Int): Column = {
    val id = coalesce(
      assert_true(col("doc_id").isNotNull,
        lit("epoch_shuffle: null doc_id — a shuffle receipt needs a " +
          "non-null identity")).cast("string"),
      col("doc_id").cast("string"))
    md5(concat(lit("shuf:"), lit(epoch.toString), lit(":"), id))
  }

  /** Resolved shard width: explicit `n` wins; a file-backed corpus
    * derives it from the memoized exact count (LshBuckets.corpusSize —
    * one count per (files, key) per JVM); in-memory test frames keep
    * the 2-char floor (never memoize in-memory corpora). */
  private def resolveChars(d: DataFrame, n: Long): Int =
    if (n >= 0L) shardChars(n)
    else if (d.inputFiles.nonEmpty)
      shardChars(graft.similarity.LshBuckets.corpusSize(d, "epoch_shuffle"))
    else 2

  /** Per-document shuffle receipts for one epoch: (doc_id, epoch,
    * shard_hex, pos, n_tokens). pos is the 1-based rank of the md5
    * order key within the shard — a window PARTITIONED by the shard key,
    * so each task sorts ≤ ~[[TargetDocsPerShard]] rows (the event-log
    * window discipline: never an unpartitioned global sort; md5 keys
    * are uniform, so shards are balanced by construction and
    * [[shuffleBalance]] audits the realized spread). Ties cannot occur
    * under distinct doc_ids (the key embeds the id), and the order-by
    * carries doc_id anyway so even a planted collision stays
    * deterministic. `n` overrides the corpus-size derivation of the
    * shard width (pass the known table cardinality at scale; -1 =
    * derive). */
  def epochShuffle(d: DataFrame, epoch: Int = 1, n: Long = -1L): DataFrame = {
    require(epoch >= 0, s"bad epoch=$epoch")
    val chars = resolveChars(d, n)
    val keyed = TextOps.lowerToks(d)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("k", orderKey(epoch))
      .withColumn("shard_hex", substring(col("k"), 1, chars))
    val w = Window.partitionBy("shard_hex").orderBy(col("k"), col("doc_id"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), lit(epoch.toLong).as("epoch"),
        col("shard_hex"), col("pos"), col("n_tokens"))
  }

  /** Shard-balance sign-off for one epoch's shuffle plan, as ONE
    * auditable row: shard count, doc and token totals, per-shard
    * extremes, and max-over-ideal as the all-integer half-up milli for
    * BOTH docs and token mass (1000 = perfectly level). The number a
    * loader reads before trusting "every worker finishes together" —
    * md5 shards are uniform in EXPECTATION; this is the realized
    * spread, and token mass (not doc count) is what actually gates
    * step time under length skew. One hash agg over the receipts to
    * ≤ 16^chars rows, then a one-row rollup. */
  def shuffleBalance(d: DataFrame, epoch: Int = 1, n: Long = -1L): DataFrame =
    epochShuffle(d, epoch, n)
      .groupBy(col("shard_hex"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("docs_total"),
        sum(col("toks")).as("tokens_total"),
        max(col("n_docs")).as("max_docs"),
        min(col("n_docs")).as("min_docs"),
        max(col("toks")).as("max_tokens"),
        min(col("toks")).as("min_tokens"))
      .withColumn("doc_imb_milli",
        expr("CASE WHEN docs_total > 0 THEN " +
          "(2 * max_docs * n_shards * 1000 + docs_total) div " +
          "(2 * docs_total) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("token_imb_milli",
        expr("CASE WHEN tokens_total > 0 THEN " +
          "(2 * max_tokens * n_shards * 1000 + tokens_total) div " +
          "(2 * tokens_total) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("epoch", lit(epoch.toLong))
      .select(col("epoch"), col("n_shards"), col("docs_total"),
        col("tokens_total"), col("max_docs"), col("min_docs"),
        col("max_tokens"), col("min_tokens"), col("doc_imb_milli"),
        col("token_imb_milli"))
}
