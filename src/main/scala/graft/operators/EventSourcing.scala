package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** eskit event-sourcing semantics (reference `pkg/eskit/store.go`)
  * re-expressed as distributed folds.
  *
  * An aggregate = one segment (`docs/concepts.md`: "segment = aggregate
  * ID"). `LoadEvents(entity, minSequence)` + fold-to-state becomes a
  * grouped aggregation; because the state functions used here (count,
  * sum, last-event) are commutative-monoid + `max_by`, the fold is a
  * one-pass partial-combinable hash agg — no per-aggregate sort, which is
  * what keeps replay viable across billions of aggregates at 100 TB.
  * Arbitrary non-commutative folds get the ordered-iterator treatment in
  * `graft.streaming.EsFold` (flatMapGroupsWithState) instead. */
object EventSourcing {

  /** Replay all aggregates of a space from `minSequence` (exclusive snapshot
    * point, cf. `LoadEvents` `pkg/eskit/store.go:33-41`) to current state. */
  def replayState(entries: DataFrame, space: String,
      afterSequence: Long = 0L): DataFrame =
    entries
      .filter(col("space") === space && col("sequence") > afterSequence)
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("balance"),
        max(col("sequence")).as("last_sequence"),
        max_by(col("ts_us"), col("sequence")).as("last_ts_us"),
        max_by(col("payload"), col("sequence")).as("last_payload"))

  /** Temporal replay: aggregate state as of event time `asOfTsUs`. */
  def stateAsOf(entries: DataFrame, space: String, asOfTsUs: Long): DataFrame =
    entries
      .filter(col("space") === space && col("ts_us") <= asOfTsUs)
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("balance"),
        max(col("sequence")).as("last_sequence"),
        max_by(col("ts_us"), col("sequence")).as("last_ts_us"),
        max_by(col("payload"), col("sequence")).as("last_payload"))

  /** Envelope decode (`pkg/eskit/store.go:42-46`: payloads are JSON
    * envelopes unmarshalled on replay): parse the JSON payload and fold
    * a typed field per aggregate — the "domain event" projection path. */
  def payloadDecode(entries: DataFrame, space: String): DataFrame =
    entries
      .filter(col("space") === space)
      .withColumn("k",
        get_json_object(col("payload"), "$.k").cast("long"))
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        max_by(col("k"), col("sequence")).as("last_k"))

  /** Multi-level rollup read model: (space, day) with ROLLUP totals —
    * one pass produces per-day, per-space, and grand-total rows. */
  def eventsRollup(named: DataFrame): DataFrame =
    named
      .withColumn("day",
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      .rollup(col("space"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Cross-aggregate read-model projection: per-space daily rollup. */
  def projectionDaily(named: DataFrame): DataFrame =
    named
      .groupBy(col("space"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        countDistinct(col("segment")).as("n_active_segments"))
}
