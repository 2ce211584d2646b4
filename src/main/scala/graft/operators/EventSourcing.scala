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
        graft.sources.EventLog.sumValueExact.as("balance"),
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
        graft.sources.EventLog.sumValueExact.as("balance"),
        max(col("sequence")).as("last_sequence"),
        max_by(col("ts_us"), col("sequence")).as("last_ts_us"),
        max_by(col("payload"), col("sequence")).as("last_payload"))

  /** State diff between two points in time — the audit question an
    * event-sourced consumer actually asks ("what changed since t1?"):
    * per segment of `space`, the (n_events, balance) state at `t1Us`
    * vs `t2Us`, restricted to segments that CHANGED in the interval.
    * ONE filtered scan with conditional aggregation — never two
    * replays joined: at 100 TB this halves the log read and removes
    * the join entirely, and the change filter is an integer predicate
    * (event-count growth), so row membership can't hinge on FP. */
  /** Shared cents-level diff (one definition for [[stateDiff]] and
    * [[topMovers]]): exact DECIMAL(38,0) cent balances at both points,
    * so the downstream change magnitude is integer arithmetic too. */
  private def stateDiffCents(entries: DataFrame, space: String, t1Us: Long,
      t2Us: Long): DataFrame = {
    require(t1Us <= t2Us, s"stateDiff needs t1 <= t2: $t1Us > $t2Us")
    import graft.sources.EventLog.valueCents
    entries
      .filter(col("space") === space && col("ts_us") <= t2Us)
      .groupBy(col("space"), col("segment"))
      .agg(
        sum(when(col("ts_us") <= t1Us, 1L).otherwise(0L))
          .as("n_events_before"),
        count(lit(1)).as("n_events_after"),
        sum(when(col("ts_us") <= t1Us, valueCents)
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("cents_before"),
        sum(valueCents).as("cents_after"))
      .filter(col("n_events_after") > col("n_events_before"))
      .withColumn("n_new_events",
        col("n_events_after") - col("n_events_before"))
  }

  def stateDiff(entries: DataFrame, space: String, t1Us: Long,
      t2Us: Long): DataFrame = {
    import graft.sources.EventLog.centsAsValue
    stateDiffCents(entries, space, t1Us, t2Us)
      .select(col("space"), col("segment"), col("n_events_before"),
        col("n_events_after"),
        centsAsValue(col("cents_before")).as("balance_before"),
        centsAsValue(col("cents_after")).as("balance_after"),
        col("n_new_events"))
  }

  /** Top-k segments by absolute balance change in (t1, t2] — the
    * "biggest movers" ranking over [[stateDiff]]. The order key is the
    * EXACT integer cent change with a segment tie-break (a total order
    * — the cut can never flip on an FP ulp), and the plan is a
    * TakeOrdered per partition — never a global sort. */
  def topMovers(entries: DataFrame, space: String, t1Us: Long,
      t2Us: Long, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    import graft.sources.EventLog.centsAsValue
    stateDiffCents(entries, space, t1Us, t2Us)
      .withColumn("abs_change_c",
        abs(col("cents_after") - col("cents_before")))
      .orderBy(col("abs_change_c").desc, col("segment"))
      .limit(k)
      .select(col("segment"),
        centsAsValue(col("cents_before")).as("balance_before"),
        centsAsValue(col("cents_after")).as("balance_after"),
        centsAsValue(col("abs_change_c")).as("abs_change"))
  }

  /** Snapshot materialization (`pkg/eskit/store.go:33-46`: load
    * snapshot, then `LoadEvents(minSequence = snapshot.sequence + 1)`):
    * per-aggregate state as of a global sequence point. Carries the
    * running balance as EXACT integer cents so incremental replay
    * continues the fold with integer adds — snapshot+suffix is then
    * bit-identical to full replay BY CONSTRUCTION (integer addition
    * associates; the old raw-double carry was only
    * equal-after-rounding); display only at presentation. */
  def snapshot(entries: DataFrame, space: String,
      atSequence: Long): DataFrame =
    entries
      .filter(col("space") === space && col("sequence") <= atSequence)
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("s_n"),
        sum(graft.sources.EventLog.valueCents).as("s_cents"),
        max(col("sequence")).as("s_seq"),
        max_by(col("ts_us"), col("sequence")).as("s_ts"),
        max_by(col("payload"), col("sequence")).as("s_payload"))

  /** Replay-from-snapshot: fold only the entries AFTER each aggregate's
    * snapshot sequence (per-segment boundary join, the LoadEvents
    * minSequence cursor) and merge with the snapshot state; aggregates
    * with no new events pass through unchanged. Result ≡ full replay —
    * the oracle asserts exactly that — at the cost of reading only the
    * post-snapshot suffix. */
  def replayFromSnapshot(snap: DataFrame, entries: DataFrame,
      space: String): DataFrame = {
    val scoped = entries.filter(col("space") === space)
    val incr = scoped
      .join(snap.select(col("segment"), col("s_seq")), Seq("segment"), "left")
      .filter(col("s_seq").isNull || col("sequence") > col("s_seq"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("i_n"),
        sum(graft.sources.EventLog.valueCents).as("i_cents"),
        max(col("sequence")).as("i_seq"),
        max_by(col("ts_us"), col("sequence")).as("i_ts"),
        max_by(col("payload"), col("sequence")).as("i_payload"))
    val zero = lit(0L).cast("decimal(38,0)")
    snap.join(incr, Seq("segment"), "full_outer")
      .select(
        lit(space).as("space"),
        col("segment"),
        (coalesce(col("s_n"), lit(0L)) + coalesce(col("i_n"), lit(0L)))
          .as("n_events"),
        graft.sources.EventLog.centsAsValue(
          coalesce(col("s_cents"), zero) + coalesce(col("i_cents"), zero))
          .as("balance"),
        greatest(col("i_seq"), col("s_seq")).as("last_sequence"),
        coalesce(col("i_ts"), col("s_ts")).as("last_ts_us"),
        coalesce(col("i_payload"), col("s_payload")).as("last_payload"))
  }

  /** SNAPSHOT-CADENCE planner (r18) — the cold-load cost model of the
    * snapshot-then-suffix read path ([[replayFromSnapshot]], reference
    * `pkg/eskit/store.go:33-46`): under a "snapshot every `everyN`
    * events" policy, a cold aggregate load pays ONE snapshot read plus
    * its post-snapshot suffix, so per (space, segment) this emits the
    * exact integer accounting — snapshots the policy has taken
    * (`snaps_taken` = n div everyN), the suffix a cold load replays
    * today (`since_snap` = n mod everyN), and the `due` decision once
    * the suffix passes `dueAfter` (an all-integer predicate; the
    * operational alert that an aggregate's next load is getting
    * expensive). The planner view a store operator reads before sizing
    * snapshot cadence: segments with large `since_snap` are exactly the
    * ones whose next cold load pays.
    *
    * Scale: ONE map-side-combinable hash agg over the log — the same
    * shape as [[replayState]]; everything downstream is per-segment
    * integer arithmetic, so the planner costs one log scan at any
    * scale. */
  def snapshotPlan(entries: DataFrame, everyN: Long = 16L,
      dueAfter: Long = 8L): DataFrame = {
    require(everyN >= 1L && dueAfter >= 0L,
      s"bad policy everyN=$everyN dueAfter=$dueAfter")
    entries
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("sequence")).as("last_sequence"))
      .select(col("space"), col("segment"), col("n_events"),
        col("last_sequence"),
        expr(s"n_events div $everyN").as("snaps_taken"),
        expr(s"n_events % $everyN").as("since_snap"),
        when(expr(s"n_events % $everyN") >= dueAfter, 1L).otherwise(0L)
          .as("due"))
  }

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
        graft.sources.EventLog.sumValueExact.as("sum_value"))

  /** Cross-aggregate read-model projection: per-space daily rollup. */
  def projectionDaily(named: DataFrame): DataFrame =
    named
      .groupBy(col("space"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.sources.EventLog.sumValueExact.as("total_value"),
        countDistinct(col("segment")).as("n_active_segments"))
}
