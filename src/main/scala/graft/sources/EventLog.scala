package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical event-log adapter: maps the driver's `events` table onto the
  * streamkit data model (store → space → segment → sequenced entries), cf.
  * reference `pkg/api/messages.go:94-128` (Record/Entry) and
  * `docs/concepts.md` (hierarchy).
  *
  * Mapping: space = event_type, segment = user_id (as string),
  * timestamp = ts, payload = props, sequence = per-segment row_number
  * ordered by (ts, event_id) — deterministic because event_id is unique.
  *
  * Scale note (100 TB): in a production layout the log is written
  * partitioned by `space` and bucketed+sorted by (`segment`, `sequence`),
  * so sequence is materialized at produce time and ConsumeSegment is a
  * partition-pruned, shuffle-free scan. The window-function derivation
  * below exists only because the driver's test parquet is unpartitioned;
  * every operator downstream consumes the canonical view and is agnostic
  * to which layout produced it.
  */
object EventLog {

  /** Raw events table (no derivation) — use when an operator only needs
    * raw aggregates (status/listing ops) so Catalyst can prune columns
    * and skip the sequence-derivation shuffle entirely.
    *
    * The driver's `ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses
    * to map to its µs TimestampType; we read it as a long (nanos) and work
    * in epoch micros. `ts div 1000` truncates real sub-µs digits — that is
    * intentional: DuckDB also reads TIMESTAMP_NS parquet µs-truncated, so
    * both engines see identical ts_us values, and ordering ties at µs
    * granularity are broken by the unique event_id on both sides. */
  def raw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Raw projected to canonical names, WITHOUT sequence derivation. */
  def named(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir).select(
      col("event_type").as("space"),
      col("user_id").cast("string").as("segment"),
      expr("ts div 1000").as("ts_us"),
      col("event_id"),
      col("value"),
      col("props").as("payload"))

  /** Canonical entry view: named + per-segment `sequence` (1-based).
    *
    * `space`/`segment` prefilters are applied on the RAW columns before
    * the rename, because a predicate on `cast(user_id as string)` cannot
    * reach the parquet scan — on the raw columns both prune row groups
    * AND shrink the sequence-derivation window to just the touched
    * segments. The string→long translation is adapter knowledge (the
    * canonical mapping defines segment = string form of user_id). */
  def entries(spark: SparkSession, dir: String,
      space: Option[String] = None,
      segment: Option[String] = None): DataFrame = {
    var r = raw(spark, dir)
    space.foreach(sp => r = r.filter(col("event_type") === sp))
    segment.foreach { sg =>
      r = segmentAsLong(sg).map(id => r.filter(col("user_id") === id))
        .getOrElse(r.filter(col("user_id").cast("string") === sg))
    }
    val w = Window.partitionBy("space", "segment").orderBy("ts_us", "event_id")
    r.select(
        col("event_type").as("space"),
        col("user_id").cast("string").as("segment"),
        expr("ts div 1000").as("ts_us"),
        col("event_id"),
        col("value"),
        col("props").as("payload"))
      .withColumn("sequence", row_number().over(w).cast("long"))
  }

  private def segmentAsLong(sg: String): Option[Long] =
    try Some(sg.toLong) catch { case _: NumberFormatException => None }

  /** DuckDB oracle dual of [[entries]]; prepend to oracle SQL. */
  val CTE: String =
    """WITH entries AS (
      |  SELECT event_type AS space,
      |         CAST(user_id AS VARCHAR) AS segment,
      |         ts,
      |         epoch_us(ts) AS ts_us,
      |         event_id,
      |         value,
      |         props AS payload,
      |         CAST(row_number() OVER (PARTITION BY event_type, user_id
      |                                 ORDER BY ts, event_id) AS BIGINT) AS sequence
      |  FROM events
      |)""".stripMargin
}
