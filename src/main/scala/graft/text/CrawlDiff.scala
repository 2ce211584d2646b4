package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-refresh snapshot diff (SURVEY §2-G) — the incremental-ingest
  * bookkeeping a recurring crawl runs before any curation: classify
  * every document as added / removed / changed / unchanged between two
  * snapshots, keyed by a stable document id and compared by content
  * digest. Downstream consumers re-process ONLY `added ∪ changed`
  * (dedup_incremental's shard), retire `removed` from indexes
  * (purge_reelect's input), and skip the unchanged mass — at 100 TB the
  * diff is what keeps a weekly refresh from being a weekly full run.
  *
  * The operator is a pure digest compare over one full-outer key
  * equijoin — exact, engine-independent, no FP anywhere. Scale: both
  * sides shuffle once on doc_id; snapshots written with
  * `EventLogWriter.writeBucketed`-style bucketing on doc_id diff with
  * ZERO Exchange (the co-bucketed-join fence PlanSpec pins for the
  * event log). Nothing is pairwise and nothing is collected.
  *
  * The registry exercises it over two SYNTHETIC snapshots derived from
  * the `documents` table by pure md5-nibble row functions (membership
  * and mutation are functions of doc_id only — the split_assign
  * discipline — so the DuckDB oracle derives the identical snapshots
  * without any side-channel data). */
object CrawlDiff {

  private def nib(salt: String) =
    substring(md5(concat_ws(":", col("doc_id").cast("string"), lit(salt))),
      1, 1)

  /** The OLD synthetic snapshot: ~14/16 of docs present (md5 nibble on
    * ':old'), and a ~3/16 slice (':mut') carries a pre-mutation digest
    * ('v0:'-salted) so the diff sees them as changed. */
  def syntheticOld(d: DataFrame): DataFrame =
    d.filter(nib("old") < "e")
      .select(col("doc_id"), col("lang"),
        when(nib("mut") < "3", md5(concat(lit("v0:"), col("text"))))
          .otherwise(md5(col("text"))).as("digest"))

  /** The CURRENT synthetic snapshot: ~14/16 present under the ':new'
    * draw, digest = md5(text). Docs in new-but-not-old are `added`,
    * old-but-not-new `removed`, mutated intersection `changed`. */
  def syntheticCurrent(d: DataFrame): DataFrame =
    d.filter(nib("new") < "e")
      .select(col("doc_id"), col("lang"), md5(col("text")).as("digest"))

  /** Per-document diff classification over two (doc_id, lang, digest)
    * snapshots. Digests are non-null by construction, so side presence
    * is read off the digest columns after the full-outer join. */
  def diff(old: DataFrame, cur: DataFrame): DataFrame = {
    val o = old.select(col("doc_id"), col("lang").as("o_lang"),
      col("digest").as("o_digest"))
    val n = cur.select(col("doc_id"), col("lang").as("n_lang"),
      col("digest").as("n_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("o_digest").isNull, "added")
          .when(col("n_digest").isNull, "removed")
          .when(col("o_digest") =!= col("n_digest"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("n_lang"), col("o_lang")).as("lang"))
  }

  /** The refresh-report rollup: document counts per (status, lang) —
    * the number an operator watches per crawl batch (an added/changed
    * spike = re-process cost, a removed spike = link rot or a crawler
    * regression). */
  def report(old: DataFrame, cur: DataFrame): DataFrame =
    diff(old, cur).groupBy(col("status"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** RE-PROCESS queue with PRIORITY — the crawl-scheduler feed over the
    * [[diff]]: added/changed docs (the work) ranked by an ALL-INTEGER
    * priority `q4·2 + (added ? 1 : 0)` — quality first (high-value
    * pages re-process ahead of boilerplate), new content edging changed
    * content at equal quality. q4 is a pure per-doc function of the
    * CURRENT text ([[TextOps.scoredQ4]] — corpus-independent bands), so
    * the oracle derives the identical integer from the full table;
    * `removed` never enters (no current text to process). One diff
    * pass + one doc_id equijoin; no floats anywhere. */
  def recrawlPriority(old: DataFrame, cur: DataFrame,
      texts: DataFrame): DataFrame =
    diff(old, cur)
      .filter(col("status").isin("added", "changed"))
      .join(TextOps.scoredQ4(texts), "doc_id")
      .withColumn("priority", col("q4") * lit(2L) +
        when(col("status") === "added", 1L).otherwise(0L))
      .select("doc_id", "lang", "status", "q4", "priority")

  /** Crawl SCHEDULE from the priority queue (r18) — which DAY each
    * queued page is fetched under a `dailyBudget`-fetches-per-day
    * crawler: the [[recrawlPriority]] queue ordered by (priority desc,
    * salted md5 hex4 asc) is cut into budget-sized days at GROUP
    * granularity (all docs of one (priority, hex4) cell share a day =
    * cum_before div budget — the budget_cut posture: a day's realized
    * load deviates from the budget by at most one cell, and cells are
    * corpus/(10·65536)-sized under this grid). Zero-sort (the
    * curriculum_assign argument): the ONLY window runs over the
    * bounded (priority, hex4) grid — ≤ 10·65536 rows at ANY corpus
    * size — and each doc joins its cell's day back by key.
    * All-integer end to end; day order is a pure deterministic
    * function of (doc_id, corpus). */
  def recrawlSchedule(old: DataFrame, cur: DataFrame, texts: DataFrame,
      dailyBudget: Long = 64L): DataFrame = {
    require(dailyBudget >= 1L, s"bad dailyBudget $dailyBudget")
    import org.apache.spark.sql.expressions.Window
    val pri = recrawlPriority(old, cur, texts)
      .withColumn("hex4", substring(md5(concat_ws(":",
        col("doc_id").cast("string"), lit("sched"))), 1, 4))
    val grid = pri.groupBy(col("priority"), col("hex4"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("priority").desc, col("hex4").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val days = grid
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .select(col("priority"), col("hex4"),
        expr(s"cum_before div $dailyBudget").as("day"))
    pri.join(days, Seq("priority", "hex4"))
      .select("doc_id", "lang", "status", "q4", "priority", "day")
  }
}
