package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch duals of the streaming window operators (Structured Streaming
  * versions live in `graft.streaming`). Window starts are computed with
  * exact integer division on epoch micros (`div`), never float math —
  * float division of epoch-scale numbers mis-floors near boundaries.
  *
  * Scale: tumbling/hopping are pure hash aggs (partial combine); the
  * hopping window uses a slide-index explode (each row → windowLen/slide
  * rows) instead of a range self-join, so cost is linear in input.
  * Sessionization needs per-key order — one shuffle on (space, segment),
  * then partition-local window functions. */
object Windows {

  /** Tumbling window agg per space. */
  def tumbling(named: DataFrame, widthUs: Long): DataFrame =
    named
      .withColumn("window_start_us",
        expr(s"ts_us div $widthUs") * widthUs)
      .groupBy(col("space"), col("window_start_us"))
      .agg(count(lit(1)).as("n"), graft.sources.EventLog.sumValueExact.as("sum_value"))

  /** OHLC bars per (space, tumbling window) — the
    * open/high/low/close/volume rollup every monitoring and trading
    * read-model wants from an event stream. Open/close are the RAW
    * first/last event values by the (ts_us, event_id) total order
    * (event_id is unique, so the order is total and ties can't make
    * the pick ambiguous) via ONE struct-min/max each — the min_by
    * doctrine, never a window over the log (the oracle runs the
    * row_number formulation — two-formulation cross-check); high/low
    * are plain min/max over raw doubles. All four are single raw row
    * values (engine-identical, hash-safe — never a float sum); the
    * volume sum is exact integer cents. One map-side-combinable hash agg:
    * per-group state is O(1), so a hot window cannot spill. */
  def ohlc(named: DataFrame, widthUs: Long): DataFrame = {
    require(widthUs >= 1L, s"bad window width $widthUs")
    named
      .withColumn("window_start_us", expr(s"ts_us div $widthUs") * widthUs)
      .groupBy(col("space"), col("window_start_us"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("value"), struct(col("ts_us"), col("event_id")))
          .as("open"),
        max_by(col("value"), struct(col("ts_us"), col("event_id")))
          .as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        graft.sources.EventLog.sumValueExact.as("sum_value"))
  }

  /** Hopping window (width = k * slide) via slide-index explode. */
  def hopping(named: DataFrame, slideUs: Long, slides: Int): DataFrame =
    named
      .withColumn("k", explode(array((0 until slides).map(lit): _*)))
      .withColumn("window_start_us",
        (expr(s"ts_us div $slideUs") - col("k")) * slideUs)
      .groupBy(col("space"), col("window_start_us"))
      .agg(count(lit(1)).as("n"), graft.sources.EventLog.sumValueExact.as("sum_value"))

  /** Gap-based sessionization per (space, segment): a new session starts
    * when the gap to the previous entry exceeds `gapUs`. */
  def sessionize(entries: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("space", "segment").orderBy("ts_us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    entries
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts_us").isNull ||
          col("ts_us") - col("prev_ts_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("space"), col("segment"), col("session_id"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        graft.sources.EventLog.sumValueExact.as("sum_value"))
  }

  /** Per-space SESSION rollup over [[sessionize]] — the dashboard
    * numbers (how long do sessions run, how much happens inside one):
    * session count, total events, mean duration as the integer half-up
    * µs `(2·Σlen + n) div (2·n)` and mean events-per-session as the
    * integer half-up milli — ALL-INTEGER, no doubles anywhere. The
    * oracle embeds the session derivation verbatim (the reportBlock
    * discipline); everything past sessionize is |spaces|-sized. */
  def sessionStats(entries: DataFrame, gapUs: Long): DataFrame =
    sessionize(entries, gapUs)
      .groupBy(col("space"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("end_us") - col("start_us")).as("len_sum"))
      .select(col("space"), col("n_sessions"), col("n_events"),
        expr("(2 * len_sum + n_sessions) div (2 * n_sessions)")
          .as("mean_len_us"),
        expr("(2 * n_events * 1000 + n_sessions) div (2 * n_sessions)")
          .as("mean_events_milli"))

  /** Exact value quantiles per space. Exact `percentile` is the oracle
    * baseline; at 100 TB swap in `approx_percentile` (t-digest-style
    * mergeable sketch, map-side combinable) — same call shape, bounded
    * error instead of a global sort of each group. */
  def valueQuantiles(named: DataFrame): DataFrame =
    named.groupBy(col("space"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        round(avg(col("value")), 4).as("mean"))

  /** Mergeable-sketch dual of [[valueQuantiles]]: `approx_percentile`
    * (Greenwald-Khanna style summary) combines map-side, so per-group
    * cost is the sketch size, not a sort of the group — the 100 TB path.
    * Rows-only (sketch estimates aren't oracle-reproducible); the spec
    * bounds the error against the exact version. */
  def valueQuantilesApprox(named: DataFrame,
      accuracy: Int = 10000): DataFrame =
    named.groupBy(col("space"))
      .agg(
        round(expr(s"approx_percentile(value, 0.5, $accuracy)"), 4).as("p50"),
        round(expr(s"approx_percentile(value, 0.9, $accuracy)"), 4).as("p90"),
        round(expr(s"approx_percentile(value, 0.99, $accuracy)"), 4).as("p99"),
        round(avg(col("value")), 4).as("mean"))

  /** Ordered event funnel — the step-conversion analysis an
    * event-analytics consumer runs over the log: for each segment
    * (user), step k is reached when a step-k event occurs STRICTLY
    * after the segment's first qualifying step-(k−1) event; the output
    * is one row per step with the count of segments that reached it.
    * Each stage is a segment-keyed aggregate (≤ #segments rows, eagerly
    * checkpointed — it feeds its own count AND the next stage's join),
    * so the per-step cost is one filtered scan + one small join — the
    * funnel chain is inherently sequential but each link is tiny.
    * `named` view (no sequence needed — ordering is by event time). */
  def funnel(named: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    def countRow(reached: DataFrame, step: Int, space: String) =
      reached.groupBy().agg(count(lit(1)).as("n_segments"))
        .select(lit(step.toLong).as("step"), lit(space).as("space"),
          col("n_segments"))
    var reached = named.filter(col("space") === steps.head)
      .groupBy(col("segment")).agg(min(col("ts_us")).as("t"))
      .localCheckpoint(true)
    var out = countRow(reached, 1, steps.head)
    steps.zipWithIndex.drop(1).foreach { case (sp, i) =>
      reached = named.filter(col("space") === sp)
        .select(col("segment"), col("ts_us"))
        .join(reached, "segment")
        .filter(col("ts_us") > col("t"))
        .groupBy(col("segment")).agg(min(col("ts_us")).as("t"))
        .localCheckpoint(true)
      out = out.unionByName(countRow(reached, i + 1, sp))
    }
    out
  }

  /** CONVERSION-LATENCY accounting over the [[funnel]] chain (r20) —
    * rates say WHERE the drop is; this says HOW LONG each surviving
    * step takes: per step k ≥ 2, the exact integer distribution
    * (count, sum, max, half-up mean — the interarrival_stats posture;
    * variance deliberately absent, Σd² overflows BIGINT at month-scale
    * µs gaps) of t_k − t_{k−1} across converting segments, where t_k
    * is the segment's FIRST step-k event strictly after its t_{k−1} —
    * the funnel's own achievement times, reused verbatim so latency
    * and conversion can never disagree about who converted. A
    * lengthening view→click gap with stable conversion is a latency
    * regression in the product path that no rate monitor sees. Steps
    * with zero converters emit NO row (both engines agree via the
    * same emptiness filter — never a divide-by-zero). Scale: the same
    * sequential chain of segment-keyed aggregates as [[funnel]] (each
    * link checkpointed — it feeds its own stats row AND the next
    * link), stats rows are steps-sized. */
  def conversionLatency(named: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    var reached = named.filter(col("space") === steps.head)
      .groupBy(col("segment")).agg(min(col("ts_us")).as("t"))
      .localCheckpoint(true)
    var out: Option[DataFrame] = None
    steps.zipWithIndex.drop(1).foreach { case (sp, i) =>
      val nxt = named.filter(col("space") === sp)
        .select(col("segment"), col("ts_us"))
        .join(reached, "segment")
        .filter(col("ts_us") > col("t"))
        .groupBy(col("segment"))
        .agg(min(col("ts_us")).as("t2"), min(col("t")).as("tprev"))
        .localCheckpoint(true)
      val row = nxt.select((col("t2") - col("tprev")).as("gap"))
        .groupBy()
        .agg(count(lit(1)).as("n_converted"),
          sum(col("gap")).as("sum_gap_us"),
          max(col("gap")).as("max_gap_us"))
        .filter(col("n_converted") > 0L)
        .select(lit((i + 1).toLong).as("step"), lit(sp).as("space"),
          col("n_converted"), col("sum_gap_us"), col("max_gap_us"),
          expr("(2 * sum_gap_us + n_converted) div (2 * n_converted)")
            .as("mean_gap_us"))
      out = Some(out.map(_.unionByName(row)).getOrElse(row))
      reached = nxt.select(col("segment"), col("t2").as("t"))
    }
    out.get
  }

  /** Step-CONVERSION accounting over [[funnel]] — the rates view an
    * analytics consumer actually reads (counts say how many reached a
    * step; rates say WHERE the drop is): per step, the reaching-segment
    * count, the conversion from the previous step, and the overall
    * conversion from step 1 — both as ALL-INTEGER half-up milli (step 1
    * converts at 1000 by definition; a zero upstream yields 0, never a
    * division error). The oracle embeds the funnel SQL verbatim (the
    * reportBlock discipline). Everything past the funnel is
    * steps-sized; the funnel itself is checkpointed (three consumers:
    * the rows, the lag join, the step-1 anchor). */
  def funnelRates(named: DataFrame, steps: Seq[String]): DataFrame = {
    val f = funnel(named, steps).localCheckpoint(true)
    val prev = f.select((col("step") + lit(1L)).as("step"),
      col("n_segments").as("n_prev"))
    val first = f.filter(col("step") === lit(1L))
      .select(col("n_segments").as("n_first"))
    f.join(prev, Seq("step"), "left")
      .crossJoin(broadcast(first))
      .select(col("step"), col("space"), col("n_segments"),
        when(col("n_prev").isNull, lit(1000L))
          .when(col("n_prev") === 0L, lit(0L))
          .otherwise(expr(
            "(2 * n_segments * 1000 + n_prev) div (2 * n_prev)"))
          .as("conv_milli"),
        when(col("n_first") > 0L, expr(
            "(2 * n_segments * 1000 + n_first) div (2 * n_first)"))
          .otherwise(lit(0L)).as("overall_milli"))
  }

  /** First-order TRANSITION MATRIX over user journeys — the Markov
    * generalization of [[funnel]] (a funnel checks ONE ordered path;
    * the matrix measures every adjacent space→space step at once):
    * for each segment's full timeline ordered by (ts_us, event_id),
    * count adjacent (from_space, to_space) pairs and the row-share of
    * each outgoing edge — the empirical transition probability a
    * journey model / next-event predictor trains on, and the drift
    * signal an on-call dashboard watches (a purchase→error edge
    * appearing is a release regression).
    *
    * Numeric contract: counts are exact integers and the displayed
    * row-share is an INTEGER half-up milli — `(2·n·1000 + tot) div
    * (2·tot)` — so there is no floating point anywhere in the operator
    * and engines cannot drift (the bm25 integer-half-up discipline,
    * with even the division eliminated).
    *
    * Scale: the only per-event work is one `lag` window partitioned by
    * segment — hash-distributed across executors, each task sorting
    * only its own segments' rows (never a global sort; in the
    * production bucketed-by-(segment, sequence) layout of
    * [[graft.sources.EventLog]] even that sort is free). Everything
    * downstream is |spaces|²-sized: the matrix agg map-side-combines
    * per partition, and the row-total join broadcasts. */
  def eventTransitions(named: DataFrame): DataFrame = {
    val mat = edgeEvents(named)
      .groupBy(col("from_space"), col("to_space"))
      .agg(count(lit(1)).as("n"))
    val tot = mat.groupBy(col("from_space")).agg(sum(col("n")).as("tot"))
    mat.join(broadcast(tot), "from_space")
      .select(col("from_space"), col("to_space"), col("n"),
        expr("(2 * n * 1000 + tot) div (2 * tot)").as("share_milli"))
  }

  /** Per-arrival journey edges — the ONE adjacency definition behind
    * [[eventTransitions]] and [[transitionDrift]] (the streaming dual
    * re-expresses it as arrival adjacency). An edge carries its
    * ARRIVING event's timestamp, so downstream era attribution is by
    * when the step completed. */
  private[graft] def edgeEvents(named: DataFrame): DataFrame = {
    val w = Window.partitionBy("segment").orderBy("ts_us", "event_id")
    named
      .select(col("segment"), col("space"), col("ts_us"), col("event_id"))
      .withColumn("from_space", lag(col("space"), 1).over(w))
      .filter(col("from_space").isNotNull)
      .select(col("segment"), col("from_space"),
        col("space").as("to_space"), col("ts_us"), col("event_id"))
  }

  /** Transition-matrix DRIFT — the release-regression detector over
    * [[eventTransitions]]: split the log at the midpoint of its time
    * range (old era vs new era, an edge belonging to the era its
    * arriving event lands in) and flag every (from, to) edge whose
    * outgoing SHARE moved by more than `tauMilli` thousandths — a
    * purchase→error edge appearing, a checkout step losing mass. The
    * membership predicate is the ALL-INTEGER cross-multiplication
    * |n_old·tot_new − n_new·tot_old| · 1000 > τ · tot_old · tot_new
    * (never a float share compare), with absent edges as true zeros; a
    * from-space absent from one era has no baseline and is never
    * flagged (tot = 0 zeroes both sides). Displayed shares are the
    * usual integer half-up milli.
    *
    * Scale: one corpus-priced edge pass (the segment-keyed lag window),
    * then everything is ≤ 2·|spaces|²-sized (the per-era count table is
    * eagerly checkpointed — it feeds tots and both era slices).
    * Integer range: the cross products run in DECIMAL(38,0) (plain
    * BIGINT wraps once n·tot·1000 passes 2⁶³ — about 10⁸ transitions
    * per (space, era), reachable at the scale this monitor targets;
    * the Dsir.driftFrom posture, oracle mirrored with HUGEINT). */
  def transitionDrift(named: DataFrame, tauMilli: Long = 5L): DataFrame = {
    require(tauMilli >= 1 && tauMilli <= 1000, s"bad tauMilli=$tauMilli")
    val bounds = named.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"))
    val cnt = edgeEvents(named)
      .crossJoin(broadcast(bounds))
      .withColumn("era",
        when(col("ts_us") * 2 <= col("tmin") + col("tmax"), lit("old"))
          .otherwise(lit("new")))
      .groupBy(col("era"), col("from_space"), col("to_space"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // matrix-sized; feeds tots + both era slices
    val tots = cnt.groupBy(col("era"), col("from_space"))
      .agg(sum(col("n")).as("tot"))
    val edges = cnt.filter(col("era") === "old")
      .select(col("from_space"), col("to_space"), col("n").as("n_old"))
      .join(cnt.filter(col("era") === "new")
        .select(col("from_space"), col("to_space"), col("n").as("n_new")),
        Seq("from_space", "to_space"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    edges
      .join(broadcast(tots.filter(col("era") === "old")
        .select(col("from_space"), col("tot").as("tot_old"))),
        Seq("from_space"), "left")
      .join(broadcast(tots.filter(col("era") === "new")
        .select(col("from_space"), col("tot").as("tot_new"))),
        Seq("from_space"), "left")
      .na.fill(0L, Seq("tot_old", "tot_new"))
      .filter(abs(col("n_old").cast("decimal(38,0)") * col("tot_new") -
        col("n_new").cast("decimal(38,0)") * col("tot_old")) * lit(1000L) >
        lit(tauMilli) * col("tot_old").cast("decimal(38,0)") * col("tot_new"))
      .select(col("from_space"), col("to_space"), col("n_old"),
        col("n_new"), col("tot_old"), col("tot_new"),
        expr("CASE WHEN tot_old > 0 THEN " +
          "(2 * n_old * 1000 + tot_old) div (2 * tot_old) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_old_milli"),
        expr("CASE WHEN tot_new > 0 THEN " +
          "(2 * n_new * 1000 + tot_new) div (2 * tot_new) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_new_milli"))
  }

  /** Era-over-era VALUE-DISTRIBUTION drift per space (r17) — the
    * payload dual of [[transitionDrift]] (that one catches journeys
    * rerouting; this catches the measured VALUES shifting — a fee
    * change, a sensor recalibration, a unit regression — while volume
    * and routes look normal): the log splits at the midpoint of its
    * time range (the one era definition, shared), values bucket into
    * exact integer bins (floor — engine-identical on any double), and
    * every (space, bin) whose within-space share moved more than τ
    * milli is flagged via the ALL-INTEGER cross-multiplication — never
    * a float share compare; absent bins are true zeros. Hostile-value
    * fence mirrored in the oracle: null/NaN/±Inf/|v| ≥ 1e15 rows are
    * excluded BEFORE the bin cast (ANSI casts of NaN/overflow kill the
    * job; the corpus_health posture — the fence is visible, not
    * silent, via the n columns). Scale: one map-side-combinable
    * (era, space, bin) agg — bin cardinality is data-bounded, the
    * checkpointed count table feeds tots + both era slices; everything
    * downstream is matrix-sized. */
  def valueDrift(named: DataFrame, tauMilli: Long = 5L): DataFrame = {
    require(tauMilli >= 1 && tauMilli <= 1000, s"bad tauMilli=$tauMilli")
    val bounds = named.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"))
    val cnt = named
      .filter(col("value").isNotNull && !isnan(col("value")) &&
        abs(col("value")) < lit(1e15))
      .crossJoin(broadcast(bounds))
      .withColumn("era",
        when(col("ts_us") * 2 <= col("tmin") + col("tmax"), lit("old"))
          .otherwise(lit("new")))
      .withColumn("bin", floor(col("value")).cast("long"))
      .groupBy(col("era"), col("space"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // matrix-sized; feeds tots + both era slices
    val tots = cnt.groupBy(col("era"), col("space"))
      .agg(sum(col("n")).as("tot"))
    val bins = cnt.filter(col("era") === "old")
      .select(col("space"), col("bin"), col("n").as("n_old"))
      .join(cnt.filter(col("era") === "new")
        .select(col("space"), col("bin"), col("n").as("n_new")),
        Seq("space", "bin"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    bins
      .join(broadcast(tots.filter(col("era") === "old")
        .select(col("space"), col("tot").as("tot_old"))),
        Seq("space"), "left")
      .join(broadcast(tots.filter(col("era") === "new")
        .select(col("space"), col("tot").as("tot_new"))),
        Seq("space"), "left")
      .na.fill(0L, Seq("tot_old", "tot_new"))
      .filter(abs(col("n_old").cast("decimal(38,0)") * col("tot_new") -
        col("n_new").cast("decimal(38,0)") * col("tot_old")) * lit(1000L) >
        lit(tauMilli) * col("tot_old").cast("decimal(38,0)") * col("tot_new"))
      .select(col("space"), col("bin"), col("n_old"), col("n_new"),
        col("tot_old"), col("tot_new"),
        expr("CASE WHEN tot_old > 0 THEN " +
          "(2 * n_old * 1000 + tot_old) div (2 * tot_old) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_old_milli"),
        expr("CASE WHEN tot_new > 0 THEN " +
          "(2 * n_new * 1000 + tot_new) div (2 * tot_new) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_new_milli"))
  }

  /** DIURNAL-PROFILE drift monitor (r20) — the time-of-day sibling of
    * [[valueDrift]] (that one watches WHAT arrives; this one watches
    * WHEN): per space, the hour-of-day share distribution of the old
    * era vs the new era, flagging hours whose share moved by more than
    * `tauMilli`. A traffic pattern that shifts its daily peak means a
    * timezone-mislabeled mirror, a bot/batch-producer onset, or a
    * geography change in the producer population — none of which any
    * count or value monitor sees, because totals and values are
    * unchanged. Same era scaffold (min/max ts midpoint, one broadcast
    * bounds row), same exact-integer share machinery, same
    * DECIMAL(38,0) cross-multiplied flag predicate (BIGINT wraps at
    * ~1e8 events/space — the valueDrift r19 lesson applied from birth);
    * hour = (ts_us div 3.6e9) mod 24, an all-integer derivation both
    * engines compute identically. Bin cardinality is FIXED at 24, so
    * the per-era count table is ≤ 48·|spaces| rows — the flag join is
    * trivially broadcast at any corpus size. */
  def diurnalDrift(named: DataFrame, tauMilli: Long = 5L): DataFrame = {
    require(tauMilli >= 1 && tauMilli <= 1000, s"bad tauMilli=$tauMilli")
    val bounds = named.agg(min(col("ts_us")).as("tmin"),
      max(col("ts_us")).as("tmax"))
    val cnt = named
      .crossJoin(broadcast(bounds))
      .withColumn("era",
        when(col("ts_us") * 2 <= col("tmin") + col("tmax"), lit("old"))
          .otherwise(lit("new")))
      .withColumn("hour", expr("(ts_us div 3600000000) % 24"))
      .groupBy(col("era"), col("space"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // ≤ 48·|spaces| rows; feeds tots + both eras
    val tots = cnt.groupBy(col("era"), col("space"))
      .agg(sum(col("n")).as("tot"))
    val bins = cnt.filter(col("era") === "old")
      .select(col("space"), col("hour"), col("n").as("n_old"))
      .join(cnt.filter(col("era") === "new")
        .select(col("space"), col("hour"), col("n").as("n_new")),
        Seq("space", "hour"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    bins
      .join(broadcast(tots.filter(col("era") === "old")
        .select(col("space"), col("tot").as("tot_old"))),
        Seq("space"), "left")
      .join(broadcast(tots.filter(col("era") === "new")
        .select(col("space"), col("tot").as("tot_new"))),
        Seq("space"), "left")
      .na.fill(0L, Seq("tot_old", "tot_new"))
      .filter(abs(col("n_old").cast("decimal(38,0)") * col("tot_new") -
        col("n_new").cast("decimal(38,0)") * col("tot_old")) * lit(1000L) >
        lit(tauMilli) * col("tot_old").cast("decimal(38,0)") * col("tot_new"))
      .select(col("space"), col("hour"), col("n_old"), col("n_new"),
        col("tot_old"), col("tot_new"),
        expr("CASE WHEN tot_old > 0 THEN " +
          "(2 * n_old * 1000 + tot_old) div (2 * tot_old) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_old_milli"),
        expr("CASE WHEN tot_new > 0 THEN " +
          "(2 * n_new * 1000 + tot_new) div (2 * tot_new) " +
          "ELSE CAST(0 AS BIGINT) END").as("share_new_milli"))
  }

  /** INTER-ARRIVAL cadence monitor — per space, the distribution of
    * gaps between a segment's consecutive entries (the heartbeat
    * signal: a `max_gap` spike is an outage/stall window, a `mean_gap`
    * drift is load change; gaps are WITHIN-segment so cross-user
    * interleaving never fakes a cadence). ALL-INTEGER output: exact
    * gap count/sum/max in µs and the mean as the integer half-up
    * `(2·sum + n) div (2·n)` — no doubles anywhere (variance is
    * deliberately absent: Σd² overflows BIGINT at month-scale µs gaps;
    * the mean/max pair is the operational signal).
    *
    * Scale: one `lag` window hash-partitioned by (space, segment) —
    * the eventTransitions window argument (each task sorts only its
    * own segments; free in the bucketed production layout) — then one
    * map-side-combinable agg to |spaces| rows. */
  def interarrivalStats(named: DataFrame): DataFrame = {
    val w = Window.partitionBy("space", "segment").orderBy("ts_us", "event_id")
    named
      .select(col("space"), col("segment"), col("ts_us"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("d", col("ts_us") - col("prev_ts"))
      .groupBy(col("space"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("d")).as("sum_gap_us"),
        max(col("d")).as("max_gap_us"))
      .withColumn("mean_gap_us",
        expr("(2 * sum_gap_us + n_gaps) div (2 * n_gaps)"))
  }

  /** Out-edge ENTROPY per space over the [[eventTransitions]] matrix —
    * the journey-predictability monitor (entropy ≈ 0 means the next
    * step after this space is deterministic — a funnel; high entropy
    * means a branching hub; an entropy JUMP on an untouched release is
    * a routing regression). Composes over the matrix operator (one
    * definition; eagerly checkpointed — it is corpus-priced work
    * feeding two consumers here, the totals agg and the term join).
    *
    * Numeric contract (r13 ADVICE: snap the TRANSCENDENTAL, not the
    * composed term — the domain_classifier/bm25 discipline): p = n/tot
    * is ONE double division over exact integers (IEEE-identical both
    * engines), ln(p) alone is snapped to the 1e-6 grid as an INTEGER
    * micro — so a libm ulp is absorbed before anything composes with
    * it — and the entropy is the exact BIGINT sum Σ n·ln_micro(p)
    * divided once: −Σ / (tot·10⁶), a single double expression over
    * exact integers. Summation order can't drift engines; the n·ln
    * products stay in BIGINT for tot ≲ 10¹¹ per from_space (ANSI
    * raises loudly past it, never wraps — scope the era, the
    * emb_drift contract). Everything downstream of the matrix is
    * |spaces|²-sized. */
  def journeyEntropy(named: DataFrame): DataFrame = {
    val m = eventTransitions(named).localCheckpoint(true)
    val tot = m.groupBy(col("from_space"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_out"))
    val p = col("n").cast("double") / col("tot").cast("double")
    m.join(broadcast(tot), "from_space")
      .withColumn("ln_micro",
        round(log(p) * lit(1000000.0), 0).cast("long"))
      .groupBy(col("from_space"))
      .agg(max(col("n_out")).as("n_out"), max(col("tot")).as("tot"),
        sum(col("n") * col("ln_micro")).as("h_sum"))
      .select(col("from_space"), col("n_out"), col("tot"),
        ((-col("h_sum")).cast("double") /
          (col("tot").cast("double") * lit(1000000.0))).as("entropy"))
  }

  /** First/last-TOUCH attribution per segment (r17) — the entry/exit
    * analysis of the journey family ([[eventTransitions]] shows the
    * edges; this shows where each user's journey STARTS and ENDS, the
    * view an acquisition/conversion review reads): per segment, the
    * first- and last-touch space, their timestamps and single-event
    * values (raw row values, never a float sum — a single double is
    * engine-identical and hash-safe), plus exact event and space
    * counts. Argmin/argmax via ONE struct-min/max each over the
    * (ts_us, event_id) total order (event_id is unique, so the order
    * is total and the trailing payload fields can never be compared) —
    * the min_by doctrine, never a window; the oracle runs the
    * row_number formulation (two-formulation cross-check). Scale: one
    * map-side-combinable agg over the log — the combine ships ONE row
    * per segment per input partition, where the window formulation
    * would shuffle EVERY raw event on segment and then sort each
    * segment's event list; per-group state is O(1), so segment skew
    * cannot spill. (A struct min/max buffer is not fixed-width, so
    * Spark plans SortAggregate — the sort is partition-local CPU over
    * already-combined rows, not a per-key sort of the log; PlanSpec
    * pins the no-Window, partial-before-Exchange shape.) */
  def attribution(named: DataFrame): DataFrame =
    named.groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("space")).as("n_spaces"),
        min(struct(col("ts_us"), col("event_id"), col("space"),
          col("value"))).as("f"),
        max(struct(col("ts_us"), col("event_id"), col("space"),
          col("value"))).as("l"))
      .select(col("segment"), col("n_events"), col("n_spaces"),
        col("f.space").as("first_space"),
        col("f.ts_us").as("first_ts_us"),
        col("f.value").as("first_value"),
        col("l.space").as("last_space"),
        col("l.ts_us").as("last_ts_us"),
        col("l.value").as("last_value"))

  /** The (first_space → last_space) ENTRY/EXIT matrix over
    * [[attribution]] — which front doors lead to which exits, with
    * single-touch journeys on the diagonal: segment counts plus the
    * exact mean journey length as an integer half-up milli (n_events
    * sums are exact BIGINTs; the cell's segment count is ≥ 1 by
    * construction). |spaces|²-sized output from one agg over the
    * segment-sized attribution table; the oracle embeds the
    * attribution SQL verbatim (the reportBlock discipline). */
  def attributionMatrix(named: DataFrame): DataFrame =
    attribution(named)
      .groupBy(col("first_space"), col("last_space"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("n_events")).as("n_events"))
      .withColumn("mean_len_milli",
        expr("(2 * n_events * 1000 + n_segments) div (2 * n_segments)"))

  /** Cohort retention matrix — the activation-analytics dual of
    * [[funnel]]: each segment (user) belongs to the cohort of its first
    * active day; output counts, per (cohort_day, day_offset), the
    * segments of that cohort active again `day_offset` days later.
    *
    * Scale shape: three map-side-combinable hash aggs and nothing else —
    * distinct (segment, day); per-segment min(day) + collect_list of the
    * segment's DISTINCT active days (bounded by the day horizon, never
    * the event count) re-exploded against its cohort day; the
    * (cohort_day, offset) rollup. No window (no per-partition sort), no
    * join, no checkpoint — survives any segment skew because every
    * per-group state is O(days), not O(events). */
  def cohortRetention(named: DataFrame,
      dayUs: Long = 86400000000L): DataFrame =
    named
      .select(col("segment"), expr(s"ts_us div $dayUs").as("day"))
      .distinct()
      .groupBy(col("segment"))
      .agg(min(col("day")).as("cohort_day"),
        collect_list(col("day")).as("days"))
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_segments"))

  /** Pairwise Pearson correlation of space activity over the complete
    * hourly grid — the cross-stream co-movement signal (paired with
    * [[anomaly]], the monitoring layer over the log).
    *
    * Numeric contract: every moment (n, Σx, Σx², Σxy) is an EXACT
    * integer — buckets absent from the hourly table are true zeros, so
    * they contribute only to n (grid size) and never to a sum — and the
    * correlation is ONE double expression over those integers, written
    * identically in the oracle: engines can't drift via FP summation
    * order. Zero-variance spaces are excluded by an INTEGER predicate
    * (n·Σx² − Σx·Σx > 0), so row membership is engine-stable too.
    *
    * Scale: one hash agg over the log (the hourly table), then
    * everything downstream is #spaces-sized (pair join keyed on the
    * tiny hour×space table, broadcast stat joins). */
  def spaceCorrelation(named: DataFrame, widthUs: Long): DataFrame = {
    val hourly = named
      .withColumn("h", expr(s"ts_us div $widthUs"))
      .groupBy(col("space"), col("h"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // 3 consumers: grid, per-space stats, Σxy
    val grid = hourly.groupBy()
      .agg((max(col("h")) - min(col("h")) + lit(1L)).as("n"))
    val stats = hourly.groupBy(col("space"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
    val sxy = hourly.as("a").join(hourly.as("b"),
        col("a.h") === col("b.h") && col("a.space") < col("b.space"))
      .groupBy(col("a.space").as("space1"), col("b.space").as("space2"))
      .agg(sum(col("a.c") * col("b.c")).as("sxy"))
    val pairs = stats.select(col("space").as("space1"), col("s").as("sx"),
        col("ss").as("sxx"))
      .join(broadcast(stats.select(col("space").as("space2"),
        col("s").as("sy"), col("ss").as("syy"))),
        col("space1") < col("space2"))
    pairs
      .join(sxy, Seq("space1", "space2"), "left")
      .withColumn("sxy", coalesce(col("sxy"), lit(0L)))
      .crossJoin(broadcast(grid))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
        col("n") * col("syy") - col("sy") * col("sy") > 0)
      .select(col("space1"), col("space2"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double"))), 4).as("corr"))
  }

  /** Per-space integer activity moments over the complete grid —
    * (space, s=Σc, ss=Σc², n=grid buckets) — the OFFLINE baseline the
    * streaming monitor ([[graft.streaming.Streaming.anomalyStream]])
    * scores live windows against. Same moment definitions as
    * [[anomaly]]/[[spaceCorrelation]]. */
  def activityStats(named: DataFrame, widthUs: Long): DataFrame = {
    val hourly = named
      .withColumn("h", expr(s"ts_us div $widthUs"))
      .groupBy(col("space"), col("h"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // 2 consumers: grid + per-space sums
    val grid = hourly.groupBy()
      .agg((max(col("h")) - min(col("h")) + lit(1L)).as("n"))
    hourly.groupBy(col("space"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
      .crossJoin(broadcast(grid))
  }

  /** Hourly activity anomalies per space: buckets whose event count sits
    * ≥ tau standard deviations from the space's full-grid mean. Same
    * integer-moment contract as [[spaceCorrelation]]:
    * z = (n·c − Σx)/√(n·Σx² − Σx²) is one double expression over exact
    * integers, the emit threshold compares the ROUNDED z (CLAUDE.md
    * rule) and zero-variance spaces are excluded by the integer
    * predicate. Absent buckets are true zeros: they widen n (and thus
    * the variance) but are not emitted — dropout detection is a
    * different monitor ([[graft.operators.StreamOps.watermarkAudit]]).
    * One log-sized hash agg + one broadcast stat join. */
  def anomaly(named: DataFrame, widthUs: Long, tau: Double): DataFrame = {
    val hourly = named
      .withColumn("h", expr(s"ts_us div $widthUs"))
      .groupBy(col("space"), col("h"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // 2 consumers: grid + the per-bucket scores
    val grid = hourly.groupBy()
      .agg((max(col("h")) - min(col("h")) + lit(1L)).as("n"))
    val stats = hourly.groupBy(col("space"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
    hourly
      .join(broadcast(stats), "space")
      .crossJoin(broadcast(grid))
      .filter(col("n") * col("ss") - col("s") * col("s") > 0)
      .withColumn("z",
        round((col("n") * col("c") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s"))
            .cast("double")), 4))
      .filter(abs(col("z")) >= tau)
      .select(col("space"), (col("h") * widthUs).as("window_start_us"),
        col("c").as("n_events"), col("z"))
  }

  /** Running cumulative sum per segment of one space, in sequence order.
    * Exact integer cents under the prefix window (the EventLog exact-
    * money recipe): the ordered float prefix accumulates the same way
    * in any engine, but its round() at a half-cent boundary does NOT
    * (the r13 BM25 shortest-string-vs-binary trap) — the integer prefix
    * has no round at all. */
  def running(entries: DataFrame, space: String): DataFrame = {
    val w = Window.partitionBy("space", "segment").orderBy("sequence")
      .rowsBetween(Window.unboundedPreceding, 0)
    entries
      .filter(col("space") === space)
      .select(col("space"), col("segment"), col("sequence"), col("value"))
      .withColumn("running_value",
        graft.sources.EventLog.centsAsValue(
          sum(graft.sources.EventLog.valueCents).over(w)))
  }
}
