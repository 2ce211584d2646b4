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
  * so the full receipt table sits under the hash gate), shard = first
  * two hex chars (256 shards; the per-shard sort is the parallelism
  * lever — more shard chars at larger corpora), position = rank of the
  * key within the shard. Different epochs draw INDEPENDENT orders from
  * the same corpus — the cheap, auditable approximation of
  * reshuffling-per-epoch that published training stacks use. */
object Shuffle {

  private def orderKey(epoch: Int): Column =
    md5(concat_ws(":", lit("shuf"), lit(epoch.toString),
      col("doc_id").cast("string")))

  /** Per-document shuffle receipts for one epoch: (doc_id, epoch,
    * shard_hex, pos, n_tokens). pos is the 1-based rank of the md5
    * order key within the shard — a window PARTITIONED by the 256
    * shards, so each task sorts corpus/256 rows (the event-log window
    * discipline: never an unpartitioned global sort; md5 keys are
    * uniform, so shards are balanced by construction and
    * [[shuffleBalance]] audits the realized spread). Ties cannot occur
    * under distinct doc_ids (the key embeds the id), and the order-by
    * carries doc_id anyway so even a planted collision stays
    * deterministic. */
  def epochShuffle(d: DataFrame, epoch: Int = 1): DataFrame = {
    require(epoch >= 0, s"bad epoch=$epoch")
    val keyed = TextOps.lowerToks(d)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("k", orderKey(epoch))
      .withColumn("shard_hex", substring(col("k"), 1, 2))
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
    * ≤ 256 rows, then a one-row rollup. */
  def shuffleBalance(d: DataFrame, epoch: Int = 1): DataFrame =
    epochShuffle(d, epoch)
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
