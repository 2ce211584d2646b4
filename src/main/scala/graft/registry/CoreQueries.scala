package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.EventLog
import graft.operators.{StreamOps, EventSourcing, Temporal, Windows}
import graft.analytics.Relational

/** Driver bindings for SURVEY §2 families A–D: each query name maps to a
  * concrete parameterization of an operator plus its DuckDB oracle SQL.
  * Column names/aliases and double rounding are kept identical on both
  * sides — the driver sorts columns by name and hashes values. */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  private val HOUR_US = 3600000000L
  private val DAY_US = 86400000000L
  private val SIX_H_US = 21600000000L
  private val GAP_30M_US = 1800000000L
  private val TOL_5M_US = 300000000L
  // epoch micros for fixed demo bounds (UTC)
  private val T_2024_01_05 = 1704412800000000L
  private val T_2024_01_15 = 1705276800000000L
  private val T_2024_01_20 = 1705708800000000L
  private val T_2024_01_25 = 1706140800000000L

  val queries: Map[String, Q] = Map(
    // ── A. stream core ────────────────────────────────────────────────
    "sk_consume_segment" -> ((s, d) =>
      StreamOps.consumeSegment(
        EventLog.entries(s, d, Some("purchase"), Some("42")),
        "purchase", "42",
        minSeq = Some(2L), maxSeq = Some(60L), limit = Some(25))),
    "sk_consume_space" -> ((s, d) =>
      StreamOps.consumeSpace(EventLog.entries(s, d, Some("click")), "click",
        minTsUs = Some(T_2024_01_05), maxTsUs = Some(T_2024_01_25),
        limit = Some(500))),
    "sk_consume_space_offset" -> ((s, d) =>
      StreamOps.consumeSpaceFromOffset(
        EventLog.entries(s, d, Some("view")), "view",
        anchorSegment = "7", anchorSequence = 5L, limit = Some(300))),
    "sk_consume_multi" -> ((s, d) =>
      StreamOps.consumeMulti(EventLog.entries(s, d),
        offsets = Map("click" -> ("7", 5L), "view" -> ("12", 3L)),
        maxTsUs = Some(T_2024_01_20), limit = Some(400))),
    "sk_peek" -> ((s, d) =>
      StreamOps.peek(EventLog.entries(s, d, Some("signup")), "signup")),
    "sk_consume_tail" -> ((s, d) =>
      StreamOps.consumeTail(EventLog.entries(s, d, Some("signup")),
        "signup", k = 3)),
    "sk_get_spaces" -> ((s, d) => StreamOps.getSpaces(EventLog.named(s, d))),
    "sk_get_segments" -> ((s, d) =>
      StreamOps.getSegments(EventLog.named(s, d), "error")),
    "sk_segment_status" -> ((s, d) =>
      StreamOps.segmentStatus(EventLog.named(s, d))),
    "sk_store_status" -> ((s, d) =>
      StreamOps.storeStatus(EventLog.named(s, d))),
    // pre-flight log-health audit (the corpus_health doctrine on the
    // event log): exact-integer counts of every pathology the ingest
    // contract excludes, incl. money values the lossless centile
    // conversion would reject — threshold BEFORE valueCents raises
    "sk_log_health" -> ((s, d) =>
      StreamOps.logHealth(EventLog.raw(s, d))),
    // per-event DLQ verdict (the row-level face of sk_log_health) over
    // the log PLUS a planted canary block — the gate ships known-bad
    // rows through its own classifier so a classifier regression is a
    // visible row-set change, never a quietly empty DLQ
    "sk_quarantine" -> ((s, d) =>
      StreamOps.quarantineWithCanaries(EventLog.raw(s, d))),
    "sk_produce_validate" -> ((s, d) =>
      StreamOps.produceValidate(EventLog.entries(s, d))),
    "sk_consume_dedup" -> ((s, d) =>
      StreamOps.consumeDedup(EventLog.entries(s, d, Some("purchase")))),
    "sk_trx_rollup" -> ((s, d) =>
      StreamOps.trxRollup(EventLog.entries(s, d), batchSize = 10)),
    // recovery audit over REAL per-batch transaction ids (stamped by the
    // produce path, persisted by EventLogWriter.write; ApiSpec proves the
    // write→read roundtrip) — the id is md5(space:segment:batch) so the
    // oracle derives the identical ids
    "sk_trx_recovery" -> ((s, d) =>
      graft.sources.EventLogWriter.trxAudit(
        graft.sources.EventLogWriter.assignTrx(
          EventLog.entries(s, d), batchSize = 10), batchSize = 10)),
    "sk_watermark_audit" -> ((s, d) =>
      StreamOps.watermarkAudit(EventLog.named(s, d), TOL_5M_US)),
    // consumer-group lag monitor: per (group, space) entries behind the
    // committed cursor + event-time distance to head; demo cursors are
    // exact-integer functions of each space's time bounds, so the
    // oracle derives them identically
    "sk_consumer_lag" -> ((s, d) =>
      StreamOps.consumerLag(EventLog.named(s, d))),
    // hot-segment skew audit: two hash aggs, min_by hottest segment,
    // all-integer half-up milli max/mean ratio
    "sk_segment_skew" -> ((s, d) =>
      StreamOps.segmentSkew(EventLog.named(s, d))),
    // update-frequency distribution behind the skew number: power-of-two
    // events-per-segment classes (exact CASE ladder, never a float
    // log2) — the is-compaction-worth-it shape signal
    "sk_key_churn" -> ((s, d) =>
      StreamOps.keyChurn(EventLog.named(s, d))),
    // consumer-group rebalance planner: segments ranked by load within
    // their space, striped round-robin across workers (the
    // SQL-expressible LPT approximation); the only window runs over
    // segment-sized rows
    "sk_rebalance_plan" -> ((s, d) =>
      StreamOps.rebalancePlan(EventLog.named(s, d))),
    // realized imbalance per space: max worker load over ideal as the
    // integer half-up milli; oracle embeds the plan verbatim
    "sk_rebalance_audit" -> ((s, d) =>
      StreamOps.rebalanceAudit(EventLog.named(s, d))),
    // capacity-WEIGHTED rebalance (r23): heterogeneous workers expand
    // into capacity slots (pure integer function of the worker id),
    // load-ranked segments stripe round-robin over the (slot_idx,
    // worker)-ordered slot sequence — proportional assignment with the
    // consecutive-heavy-segments-spread property kept
    "sk_rebalance_capacity" -> ((s, d) =>
      StreamOps.rebalanceCapacityPlan(EventLog.named(s, d))),
    // stale-segment audit: last entry predates the newest quarter of
    // the space's own range — integer cutoff, integer milli share
    "sk_stale_segments" -> ((s, d) =>
      StreamOps.staleSegments(EventLog.named(s, d))),
    // TTL sizing audit (the compact companion): per space, entries +
    // payload bytes a keep-newest-quarter policy would expire vs keep;
    // cutoff = exact-BIGINT quantile of the space's own range
    "sk_retention_audit" -> ((s, d) =>
      StreamOps.retentionAudit(EventLog.named(s, d))),
    // key-compaction planner: exact per-space reclaim under
    // keep-latest-per-segment compaction (survivor via the sequence
    // ordinal — deterministic), half-up integer reclaim share
    "sk_compact_plan" -> ((s, d) =>
      StreamOps.compactPlan(EventLog.entries(s, d))),
    // worker-presence inventory + staleness audit (r17 verdict #2):
    // the reference's clamp/TTL ladder (worker_presence.go:136-167)
    // replayed over a presence log — declared intervals are pure
    // integer functions of the worker key, so the oracle derives the
    // identical ladder; eviction verdicts at the space horizon
    "sk_worker_presence" -> ((s, d) =>
      StreamOps.workerPresence(EventLog.named(s, d))),
    // lease fencing/overlap audit (r17 verdict #2): split-brain
    // detector over a synthesized grant log — per-holder episodes
    // merged by a running-max island scan, then cross-holder overlap
    // by the per-key sweep (exact, not adjacent-pair); all integers
    "sk_lease_audit" -> ((s, d) =>
      StreamOps.leaseAudit(EventLog.entries(s, d))),
    // ── B. event sourcing ─────────────────────────────────────────────
    "es_replay_state" -> ((s, d) =>
      EventSourcing.replayState(
        EventLog.entries(s, d, Some("purchase")), "purchase")),
    "es_replay_from" -> ((s, d) =>
      EventSourcing.replayState(EventLog.entries(s, d, Some("purchase")),
        "purchase", afterSequence = 20L)),
    // load-snapshot + incremental-replay ≡ full replay: the oracle IS the
    // full replay, so the hash match proves the snapshot path equivalent
    "es_replay_from_snapshot" -> ((s, d) => {
      val e = EventLog.entries(s, d, Some("purchase"))
      EventSourcing.replayFromSnapshot(
        EventSourcing.snapshot(e, "purchase", atSequence = 20L),
        e, "purchase")
    }),
    // snapshot-cadence planner: under a snapshot-every-N policy, the
    // exact per-aggregate cold-load suffix and the integer due decision
    "es_snapshot_plan" -> ((s, d) =>
      EventSourcing.snapshotPlan(EventLog.entries(s, d))),
    "es_as_of_time" -> ((s, d) =>
      EventSourcing.stateAsOf(EventLog.entries(s, d, Some("purchase")),
        "purchase", T_2024_01_15)),
    // "what changed since t1" in ONE filtered scan with conditional
    // aggregation — never two replays joined
    "es_state_diff" -> ((s, d) =>
      EventSourcing.stateDiff(EventLog.entries(s, d, Some("purchase")),
        "purchase", T_2024_01_15, T_2024_01_25)),
    // biggest movers over the diff: rounded-change order + segment
    // tie-break → deterministic cut; TakeOrdered, never a global sort
    "es_top_movers" -> ((s, d) =>
      EventSourcing.topMovers(EventLog.entries(s, d, Some("purchase")),
        "purchase", T_2024_01_15, T_2024_01_25, k = 10)),
    "es_projection_daily" -> ((s, d) =>
      EventSourcing.projectionDaily(EventLog.named(s, d))),
    "es_payload_decode" -> ((s, d) =>
      EventSourcing.payloadDecode(EventLog.entries(s, d, Some("signup")),
        "signup")),
    "events_rollup" -> ((s, d) =>
      EventSourcing.eventsRollup(EventLog.named(s, d))),
    // ── C. windows ────────────────────────────────────────────────────
    "win_tumbling" -> ((s, d) =>
      Windows.tumbling(EventLog.named(s, d), HOUR_US)),
    // OHLC bars: open/close via struct-min/max over the (ts_us,
    // event_id) total order (the min_by doctrine — oracle runs the
    // row_number formulation), high/low raw, volume rounded
    "win_ohlc" -> ((s, d) =>
      Windows.ohlc(EventLog.named(s, d), HOUR_US)),
    "win_hopping" -> ((s, d) =>
      Windows.hopping(EventLog.named(s, d), SIX_H_US, slides = 2)),
    "win_session" -> ((s, d) =>
      Windows.sessionize(EventLog.entries(s, d), GAP_30M_US)),
    // per-space session rollup: count, total events, integer half-up
    // mean duration and mean events-per-session milli
    "session_stats" -> ((s, d) =>
      Windows.sessionStats(EventLog.entries(s, d), GAP_30M_US)),
    "win_running" -> ((s, d) =>
      Windows.running(EventLog.entries(s, d, Some("click")), "click")),
    "value_quantiles" -> ((s, d) =>
      Windows.valueQuantiles(EventLog.named(s, d))),
    // ordered step-conversion funnel: segment reaches step k only via an
    // event strictly after its first qualifying step-(k-1) event
    "event_funnel" -> ((s, d) =>
      Windows.funnel(EventLog.named(s, d), Seq("view", "click", "purchase"))),
    // the rates view over the funnel: integer half-up conversion from
    // the previous step and from step 1
    "funnel_rates" -> ((s, d) => Windows.funnelRates(
      EventLog.named(s, d), Seq("view", "click", "purchase"))),
    // how long each surviving step takes: exact integer gap stats over
    // the funnel's own achievement times (latency and conversion can
    // never disagree about who converted)
    "conversion_latency" -> ((s, d) => Windows.conversionLatency(
      EventLog.named(s, d), Seq("view", "click", "purchase"))),
    // cohort-of-first-day retention matrix
    "cohort_retention" -> ((s, d) =>
      Windows.cohortRetention(EventLog.named(s, d))),
    // first-order journey transition matrix (the Markov dual of the
    // funnel): adjacent space->space steps per segment timeline, with
    // an all-integer half-up milli row share
    "event_transitions" -> ((s, d) =>
      Windows.eventTransitions(EventLog.named(s, d))),
    // out-edge entropy per space over the matrix: the journey-
    // predictability monitor (0 = funnel, high = branching hub)
    "journey_entropy" -> ((s, d) =>
      Windows.journeyEntropy(EventLog.named(s, d))),
    // per-space heartbeat: within-segment gap count/sum/max + integer
    // half-up mean, no doubles anywhere
    "interarrival_stats" -> ((s, d) =>
      Windows.interarrivalStats(EventLog.named(s, d))),
    // first/last-touch attribution per segment: entry/exit space +
    // single-event values via one struct-min/max over the (ts_us,
    // event_id) total order — never a window (oracle runs row_number)
    "touch_attribution" -> ((s, d) =>
      Windows.attribution(EventLog.named(s, d))),
    // the (first_space, last_space) entry/exit matrix over attribution;
    // oracle embeds the attribution SQL verbatim
    "touch_matrix" -> ((s, d) =>
      Windows.attributionMatrix(EventLog.named(s, d))),
    // era-over-era matrix drift: all-integer cross-multiplied share
    // predicate, absent edges as true zeros
    "transition_drift" -> ((s, d) =>
      Windows.transitionDrift(EventLog.named(s, d))),
    // the payload dual: era-over-era VALUE-distribution drift per
    // space — floor-binned values, identical integer flag machinery;
    // null/NaN/Inf/huge values fenced before the ANSI bin cast
    "value_drift" -> ((s, d) =>
      Windows.valueDrift(EventLog.named(s, d))),
    // time-of-day mix drift per space (the WHEN sibling of value_drift's
    // WHAT): fixed 24-bin hour shares, same era scaffold, same
    // DECIMAL(38,0) cross-multiplied integer flag
    "diurnal_drift" -> ((s, d) =>
      Windows.diurnalDrift(EventLog.named(s, d))),
    // cross-stream co-movement + per-bucket anomaly monitoring: exact
    // integer moments, one engine-stable double expression at the end
    "space_correlation" -> ((s, d) =>
      Windows.spaceCorrelation(EventLog.named(s, d), HOUR_US)),
    "win_anomaly" -> ((s, d) =>
      Windows.anomaly(EventLog.named(s, d), HOUR_US, tau = 2.0)),
    // temporal joins (operators Spark lacks natively; see
    // graft.operators.Temporal for the scale-safe formulations)
    "asof_join" -> ((s, d) =>
      Temporal.asofJoin(EventLog.entries(s, d), "purchase", "click")),
    "range_join" -> ((s, d) =>
      Temporal.rangeJoinCount(EventLog.entries(s, d), "purchase", "click",
        HOUR_US)),
    // mergeable-sketch dual of value_quantiles — rows-only (sketch
    // estimates aren't oracle-reproducible); spec bounds error vs exact
    "value_quantiles_approx" -> ((s, d) =>
      Windows.valueQuantilesApprox(EventLog.named(s, d))),
    // codec roundtrip: entries → binary → entries must be lossless, so
    // the oracle is simply the plain entry projection
    "sk_codec_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, struct}
      import graft.functions.EntryCodec
      EventLog.entries(s, d, Some("error"))
        .withColumn("bin", EntryCodec.pack(struct(
          col("sequence"), col("ts_us"), col("value"),
          col("space"), col("segment"), col("payload"))))
        .withColumn("e", EntryCodec.unpack(col("bin")))
        .select(col("e.space").as("space"), col("e.segment").as("segment"),
          col("e.sequence").as("sequence"), col("e.ts_us").as("ts_us"),
          col("e.value").as("value"), col("e.payload").as("payload"))
    }),
    // ── D. relational ─────────────────────────────────────────────────
    "q1_pricing" -> ((s, d) => Relational.q1Pricing(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3TopK(s, d)),
    // join-after-cut top parts: agg lineitem alone, TakeOrdered on the
    // rounded revenue + partkey tie-break, THEN name the k survivors
    "part_revenue_topk" -> ((s, d) => Relational.partRevenueTopK(s, d)),
    "q5_region" -> ((s, d) => Relational.q5Region(s, d)),
    "top_customers_per_nation" -> ((s, d) =>
      Relational.topCustomersPerNation(s, d)),
    "q13_distribution" -> ((s, d) => Relational.custOrderDistribution(s, d)),
    "q_semi_anti" -> ((s, d) => Relational.semiAntiCustomers(s, d)),
    "enrich_events" -> ((s, d) =>
      Relational.enrichEvents(EventLog.named(s, d), s, d)),
    "event_pivot" -> ((s, d) =>
      Relational.eventPivot(EventLog.named(s, d))),
    // approx_count_distinct (HLL++): the mergeable-sketch path for
    // distinct counting at scale; rows-only (sketch estimates aren't
    // reproducible in the oracle), spec asserts <5% error vs exact
    "approx_distinct_segments" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      EventLog.named(s, d).groupBy(col("space"))
        .agg(approx_count_distinct(col("segment")).as("approx_segments"),
          count(lit(1)).as("n_entries"))
    }),
  )

  private val E = EventLog.CTE

  /** Rebalance-plan derivation (per-segment loads → load-desc rank →
    * round-robin stripe) — sk_rebalance_audit embeds it verbatim (the
    * reportBlock discipline). */
  private val RebalancePlanCtes = s"""$E,
      seg AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS n_entries
        FROM entries GROUP BY 1, 2),
      plan AS (
        SELECT space, segment, n_entries,
               CAST(row_number() OVER (PARTITION BY space
                 ORDER BY n_entries DESC, segment ASC) AS BIGINT) AS rnk
        FROM seg)"""

  private val RebalancePlanSql = s"""$RebalancePlanCtes
      SELECT space, segment, n_entries, rnk, (rnk - 1) % 4 AS worker
      FROM plan"""

  /** The touch_attribution derivation, named because touch_matrix
    * embeds it verbatim (the reportBlock discipline). */
  private val AttributionSql = s"""$E,
      ranked AS (
        SELECT segment, space, ts_us, value,
               row_number() OVER (PARTITION BY segment
                 ORDER BY ts_us, event_id) AS rna,
               row_number() OVER (PARTITION BY segment
                 ORDER BY ts_us DESC, event_id DESC) AS rnd
        FROM entries),
      agg AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT space) AS BIGINT) AS n_spaces
        FROM entries GROUP BY 1)
      SELECT a.segment, a.n_events, a.n_spaces,
             f.space AS first_space, f.ts_us AS first_ts_us,
             f.value AS first_value,
             l.space AS last_space, l.ts_us AS last_ts_us,
             l.value AS last_value
      FROM agg a
      JOIN (SELECT * FROM ranked WHERE rna = 1) f USING (segment)
      JOIN (SELECT * FROM ranked WHERE rnd = 1) l USING (segment)"""

  /** The win_session derivation, named because session_stats embeds it
    * verbatim (the reportBlock discipline). */
  private val SessionSql = s"""$E,
      flagged AS (
        SELECT space, segment, ts_us, event_id, value,
               CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > $GAP_30M_US
                    THEN 1 ELSE 0 END AS new_session
        FROM entries
        WINDOW w AS (PARTITION BY space, segment ORDER BY ts_us, event_id)),
      sessions AS (
        SELECT space, segment, ts_us, value,
               CAST(sum(new_session) OVER (PARTITION BY space, segment
                 ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM flagged)
      SELECT space, segment, session_id,
             min(ts_us) AS start_us, max(ts_us) AS end_us,
             count(*) AS n_events, CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM sessions GROUP BY 1, 2, 3"""

  /** The event_funnel derivation, named because funnel_rates embeds it
    * verbatim (the reportBlock discipline). */
  /** The funnel achievement-time CTEs, shared VERBATIM by event_funnel,
    * funnel_rates and conversion_latency (one definition: latency and
    * conversion can never disagree about who converted). s2/s3 keep the
    * PREVIOUS step's time alongside their own so the latency view is a
    * projection, not a re-derivation. */
  private val FunnelCtes = s"""$E,
      s1 AS (SELECT segment, min(ts_us) AS t FROM entries
             WHERE space = 'view' GROUP BY 1),
      s2 AS (SELECT e.segment, min(e.ts_us) AS t, min(s1.t) AS tprev
             FROM entries e JOIN s1 ON e.segment = s1.segment
             WHERE e.space = 'click' AND e.ts_us > s1.t GROUP BY 1),
      s3 AS (SELECT e.segment, min(e.ts_us) AS t, min(s2.t) AS tprev
             FROM entries e JOIN s2 ON e.segment = s2.segment
             WHERE e.space = 'purchase' AND e.ts_us > s2.t GROUP BY 1)"""

  private val FunnelSql = s"""$FunnelCtes
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS space,
             CAST(count(*) AS BIGINT) AS n_segments FROM s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT)
      FROM s3"""

  /** The event_transitions derivation, named because journey_entropy
    * embeds it verbatim (the reportBlock discipline). */
  private val ETransSql = s"""$E,
      steps AS (
        SELECT segment, space, ts_us, event_id,
               lag(space) OVER (PARTITION BY segment
                                ORDER BY ts_us, event_id) AS from_space
        FROM entries),
      mat AS (
        SELECT from_space, space AS to_space,
               CAST(count(*) AS BIGINT) AS n
        FROM steps WHERE from_space IS NOT NULL GROUP BY 1, 2),
      tot AS (
        SELECT from_space, CAST(sum(n) AS BIGINT) AS tot
        FROM mat GROUP BY 1)
      SELECT m.from_space, m.to_space, m.n,
             (2 * m.n * 1000 + t.tot) // (2 * t.tot) AS share_milli
      FROM mat m JOIN tot t USING (from_space)"""


  val oracle: Map[String, String] = Map(
    "sk_consume_segment" -> s"""$E
      SELECT space, segment, sequence, ts_us, value, payload FROM entries
      WHERE space = 'purchase' AND segment = '42'
        AND sequence >= 2 AND sequence <= 60
      ORDER BY sequence LIMIT 25""",

    "sk_consume_space" -> s"""$E
      SELECT space, segment, sequence, ts_us, value, payload FROM entries
      WHERE space = 'click'
        AND ts_us >= $T_2024_01_05 AND ts_us <= $T_2024_01_25
      ORDER BY ts_us, segment, sequence LIMIT 500""",

    "sk_consume_space_offset" -> s"""$E,
      anchor AS (
        SELECT ts_us AS a_ts_us, segment AS a_segment,
               sequence AS a_sequence
        FROM entries
        WHERE space = 'view' AND segment = '7' AND sequence = 5)
      SELECT e.space, e.segment, e.sequence, e.ts_us, e.value, e.payload
      FROM entries e CROSS JOIN anchor a
      WHERE e.space = 'view'
        AND (e.ts_us, e.segment, e.sequence) >
            (a.a_ts_us, a.a_segment, a.a_sequence)
      ORDER BY e.ts_us, e.segment, e.sequence LIMIT 300""",

    "sk_consume_multi" -> s"""$E,
      offs(space, segment, seq) AS (
        VALUES ('click', '7', 5), ('view', '12', 3)),
      anchors AS (
        -- LEFT join so an unresolvable anchor yields NULL tuple fields =
        -- "no cursor, read the space from the start" — same fallback the
        -- Spark operator encodes (StreamOps.consumeMulti)
        SELECT o.space AS a_space, e.ts_us AS a_ts_us,
               e.segment AS a_segment, e.sequence AS a_sequence
        FROM offs o LEFT JOIN entries e
          ON e.space = o.space AND e.segment = o.segment
         AND e.sequence = o.seq)
      SELECT e.space, e.segment, e.sequence, e.ts_us, e.value, e.payload
      FROM entries e JOIN anchors a ON e.space = a.a_space
      WHERE (a.a_ts_us IS NULL OR (e.ts_us, e.segment, e.sequence) >
            (a.a_ts_us, a.a_segment, a.a_sequence))
        AND e.ts_us <= $T_2024_01_20
      ORDER BY e.ts_us, e.space, e.segment, e.sequence LIMIT 400""",

    "sk_peek" -> s"""$E
      SELECT space, segment, max(sequence) AS sequence,
             max_by(ts_us, sequence) AS ts_us,
             max_by(value, sequence) AS value,
             max_by(payload, sequence) AS payload
      FROM entries WHERE space = 'signup' GROUP BY space, segment""",

    "sk_consume_tail" -> s"""$E
      SELECT space, segment, sequence, ts_us, value, payload FROM (
        SELECT *, row_number() OVER (PARTITION BY space, segment
          ORDER BY sequence DESC) AS rn
        FROM entries WHERE space = 'signup')
      WHERE rn <= 3""",

    "sk_get_spaces" ->
      "SELECT DISTINCT event_type AS space FROM events ORDER BY space",

    "sk_get_segments" -> """
      SELECT DISTINCT event_type AS space,
             CAST(user_id AS VARCHAR) AS segment
      FROM events WHERE event_type = 'error' ORDER BY segment""",

    "sk_segment_status" -> """
      SELECT event_type AS space, CAST(user_id AS VARCHAR) AS segment,
             CAST(1 AS BIGINT) AS first_sequence,
             count(*) AS last_sequence,
             min(epoch_us(ts)) AS first_ts_us,
             max(epoch_us(ts)) AS last_ts_us
      FROM events GROUP BY 1, 2""",

    "sk_store_status" -> """
      SELECT event_type AS space,
             count(DISTINCT user_id) AS n_segments,
             count(*) AS n_entries,
             min(epoch_us(ts)) AS min_ts_us,
             max(epoch_us(ts)) AS max_ts_us
      FROM events GROUP BY 1""",

    // exact-integer pathology accounting; the bad-value predicate is a
    // lazily-evaluated CASE ladder so the BIGINT cast never sees a
    // non-finite or out-of-range double, and the 9e16 magnitude
    // threshold is the SAME constant the engine uses (boundary
    // agreement by construction)
    "sk_log_health" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_ts,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_segment,
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_space,
             CAST(sum(CASE WHEN event_type = '' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_empty_space,
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_value,
             CAST(sum(CASE
               WHEN value IS NULL THEN 0
               WHEN NOT isfinite(value) OR abs(value) > 9.0e16 THEN 1
               WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) / 100.0
                    <> value THEN 1
               ELSE 0 END) AS BIGINT) AS n_bad_value,
             CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_props,
             CAST(sum(CASE WHEN props IS NOT NULL
               AND NOT json_valid(props) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bad_props
      FROM events""",

    // the quarantine ladder repeated with sk_log_health's branch split
    // (non-finite BEFORE the BIGINT cast); canaries as VALUES — pure
    // constants, ids outside the generator's range
    "sk_quarantine" -> """
      WITH log AS (
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        UNION ALL
        SELECT * FROM (VALUES
          (CAST(9000000001 AS BIGINT), NULL::TIMESTAMP,
           CAST(1 AS BIGINT), 'canary', 1.0::DOUBLE, '{}'),
          (CAST(9000000002 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           NULL, 'canary', 1.0::DOUBLE, '{}'),
          (CAST(9000000003 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), NULL, 1.0::DOUBLE, '{}'),
          (CAST(9000000004 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), '', 1.0::DOUBLE, '{}'),
          (CAST(9000000005 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', NULL, '{}'),
          (CAST(9000000006 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 0.001::DOUBLE, '{}'),
          (CAST(9000000007 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 1.0e17::DOUBLE, '{}'),
          (CAST(9000000008 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 'nan'::DOUBLE, '{}'),
          (CAST(9000000009 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 1.0::DOUBLE, NULL),
          (CAST(9000000010 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 1.0::DOUBLE, '{bad'),
          (CAST(9000000011 AS BIGINT), NULL::TIMESTAMP,
           CAST(1 AS BIGINT), 'canary', 0.001::DOUBLE, '{bad'),
          (CAST(9000000012 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 2.5::DOUBLE, '{"k":1}'),
          (CAST(9000000013 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
           CAST(1 AS BIGINT), 'canary', 1.0::DOUBLE, 'null'))
          AS c(event_id, ts, user_id, event_type, value, props))
      SELECT event_id, reason FROM (
        SELECT event_id,
               CASE WHEN ts IS NULL THEN 'null_ts'
                    WHEN user_id IS NULL THEN 'null_segment'
                    WHEN event_type IS NULL THEN 'null_space'
                    WHEN event_type = '' THEN 'empty_space'
                    WHEN value IS NULL THEN 'null_value'
                    WHEN NOT isfinite(value) OR abs(value) > 9.0e16
                      THEN 'bad_value'
                    WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) / 100.0
                         <> value THEN 'bad_value'
                    WHEN props IS NULL THEN 'null_props'
                    -- NOT json_valid mirrors Spark's
                    -- get_json_object(props,'$') IS NULL including the
                    -- bare-JSON-'null' edge: MEASURED (r17) — Spark
                    -- returns the 4-char STRING 'null' there, not SQL
                    -- NULL, so both engines pass the row; canary
                    -- 9000000013 pins the agreement (the r16 ADVICE
                    -- hypothesized a divergence that tests false)
                    WHEN NOT json_valid(props) THEN 'bad_props'
               END AS reason
        FROM log)
      WHERE reason IS NOT NULL""",

    "sk_produce_validate" -> s"""$E
      SELECT space, segment, count(*) AS n_entries,
             min(sequence) AS min_sequence,
             max(sequence) AS max_sequence,
             count(DISTINCT sequence) AS n_distinct,
             (min(sequence) = 1 AND max(sequence) = count(*)) AS contiguous,
             (count(DISTINCT sequence) = count(*)) AS no_duplicates
      FROM entries GROUP BY 1, 2""",

    "sk_consume_dedup" -> s"""$E
      SELECT space, segment, sequence,
             min_by(ts_us, event_id) AS ts_us,
             min_by(value, event_id) AS value,
             min_by(payload, event_id) AS payload
      FROM entries WHERE space = 'purchase'
      GROUP BY space, segment, sequence""",

    "sk_trx_rollup" -> s"""$E
      SELECT space, segment, (sequence - 1) // 10 AS trx_number,
             count(*) AS n_entries,
             min(sequence) AS min_sequence,
             max(sequence) AS max_sequence,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value,
             (max(sequence) - min(sequence) + 1 = count(*)) AS complete
      FROM entries GROUP BY 1, 2, 3""",

    "sk_trx_recovery" -> s"""$E,
      trx AS (
        SELECT space, segment, sequence, value,
               md5(concat_ws(':', space, segment,
                 CAST((sequence - 1) // 10 AS VARCHAR))) AS trx_id
        FROM entries)
      SELECT space, segment, trx_id,
             count(*) AS n_entries,
             min(sequence) AS first_sequence,
             max(sequence) AS last_sequence,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value,
             (max(sequence) - min(sequence) + 1 = count(*)) AS contiguous,
             (count(*) = 10) AS sealed
      FROM trx GROUP BY 1, 2, 3""",

    "sk_watermark_audit" -> s"""
      WITH ev AS (
        SELECT event_type AS space, epoch_us(ts) AS ts_us, event_id
        FROM events),
      lat AS (
        SELECT space, ts_us,
               max(ts_us) OVER (PARTITION BY space ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
        FROM ev)
      SELECT space, count(*) AS n_entries,
             CAST(sum(CASE WHEN hwm_us IS NOT NULL
                  AND ts_us < hwm_us - $TOL_5M_US THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late,
             max(CASE WHEN hwm_us IS NOT NULL
                  AND ts_us < hwm_us - $TOL_5M_US THEN hwm_us - ts_us
                  ELSE 0 END) AS max_lateness_us
      FROM lat GROUP BY space""",

    // cursors derived from exact-BIGINT space bounds (multiply before
    // divide); lag counts are conditional integer sums
    "sk_consumer_lag" -> s"""
      WITH ev AS (
        SELECT event_type AS space, epoch_us(ts) AS ts_us FROM events),
      b AS (
        SELECT space, min(ts_us) AS tmin, max(ts_us) AS tmax
        FROM ev GROUP BY 1),
      c AS (
        SELECT g.grp, b.space,
               b.tmin + ((b.tmax - b.tmin) * g.grp) // 4 AS cursor_ts_us,
               b.tmax
        FROM b CROSS JOIN
          (SELECT unnest(generate_series(1, 3)) AS grp) g)
      SELECT c.grp, c.space, c.cursor_ts_us,
             CAST(sum(CASE WHEN e.ts_us > c.cursor_ts_us THEN 1 ELSE 0 END)
               AS BIGINT) AS n_behind,
             c.tmax - c.cursor_ts_us AS time_lag_us
      FROM ev e JOIN c ON e.space = c.space
      GROUP BY 1, 2, 3, c.tmax""",

    // same two-level rollup; hottest segment as a window (engine:
    // min_by on (−count, segment)); identical integer milli expression
    "sk_segment_skew" -> s"""$E,
      c AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS c
        FROM entries GROUP BY 1, 2),
      agg AS (
        SELECT space, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(c) AS BIGINT) AS n_entries,
               CAST(max(c) AS BIGINT) AS hot_entries
        FROM c GROUP BY 1),
      hot AS (
        SELECT space, segment AS hot_segment
        FROM (SELECT *, row_number() OVER (PARTITION BY space
                ORDER BY c DESC, segment ASC) AS rn FROM c)
        WHERE rn = 1)
      SELECT a.space, a.n_segments, a.n_entries, h.hot_segment,
             a.hot_entries,
             (2 * a.hot_entries * a.n_segments * 1000 + a.n_entries) //
               (2 * a.n_entries) AS skew_milli
      FROM agg a JOIN hot h ON a.space = h.space""",

    // identical CASE ladder (zero-padded labels sort numerically in
    // both engines); never a float log2
    "sk_key_churn" -> s"""$E,
      c AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS c
        FROM entries GROUP BY 1, 2)
      SELECT space,
             CASE WHEN c = 1 THEN '001' WHEN c = 2 THEN '002'
                  WHEN c <= 4 THEN '003-004' WHEN c <= 8 THEN '005-008'
                  WHEN c <= 16 THEN '009-016' WHEN c <= 32 THEN '017-032'
                  WHEN c <= 64 THEN '033-064' ELSE '065+' END AS bucket,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(c) AS BIGINT) AS n_entries
      FROM c GROUP BY 1, 2""",

    // identical rank + stripe arithmetic; window over segment-sized
    // rows only
    "sk_rebalance_plan" -> RebalancePlanSql,

    // the plan embedded verbatim; all-integer max-over-ideal milli
    "sk_rebalance_audit" -> s"""$RebalancePlanCtes,
      wl AS (
        SELECT space, (rnk - 1) % 4 AS worker,
               CAST(count(*) AS BIGINT) AS segs,
               CAST(sum(n_entries) AS BIGINT) AS wload
        FROM plan GROUP BY 1, 2)
      SELECT space,
             CAST(sum(segs) AS BIGINT) AS n_segments,
             CAST(sum(wload) AS BIGINT) AS n_entries,
             CAST(count(*) AS BIGINT) AS workers_used,
             CAST(max(wload) AS BIGINT) AS max_load,
             CAST(min(wload) AS BIGINT) AS min_load,
             (2 * CAST(max(wload) AS BIGINT) * CAST(count(*) AS BIGINT)
               * 1000 + CAST(sum(wload) AS BIGINT)) //
               (2 * CAST(sum(wload) AS BIGINT)) AS imb_milli
      FROM wl GROUP BY 1""",

    // identical slot expansion + rank/stripe arithmetic; both windows
    // run over bounded tables (segments per space; 3·workers slots)
    "sk_rebalance_capacity" -> s"""$E,
      segc AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS n_entries
        FROM entries GROUP BY 1, 2),
      ranked AS (
        SELECT space, segment, n_entries,
               CAST(row_number() OVER (PARTITION BY space
                 ORDER BY n_entries DESC, segment) AS BIGINT) AS rnk
        FROM segc),
      slots AS (
        SELECT CAST(worker AS BIGINT) AS worker,
               CAST(capacity AS BIGINT) AS capacity,
               CAST(row_number() OVER (ORDER BY slot_idx, worker)
                 AS BIGINT) AS slot_rank
        FROM (
          SELECT worker, 1 + worker % 3 AS capacity,
                 unnest(generate_series(0, worker % 3)) AS slot_idx
          FROM (SELECT unnest(generate_series(0, 3)) AS worker)))
      SELECT r.space, r.segment, r.n_entries, r.rnk, s.worker,
             s.capacity
      FROM ranked r
      JOIN slots s ON ((r.rnk - 1) % 7) + 1 = s.slot_rank""",

    // identical integer cutoff and milli share over the same rollup
    "sk_stale_segments" -> s"""$E,
      seg AS (
        SELECT space, segment, min(ts_us) AS first_ts,
               max(ts_us) AS last_ts
        FROM entries GROUP BY 1, 2),
      b AS (
        SELECT space, min(first_ts) AS tmin, max(last_ts) AS tmax
        FROM seg GROUP BY 1)
      SELECT s.space, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(CASE WHEN s.last_ts <
               b.tmax - ((b.tmax - b.tmin) // 4) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_stale,
             (2 * CAST(sum(CASE WHEN s.last_ts <
               b.tmax - ((b.tmax - b.tmin) // 4) THEN 1 ELSE 0 END)
               AS BIGINT) * 1000 + CAST(count(*) AS BIGINT)) //
               (2 * CAST(count(*) AS BIGINT)) AS stale_milli
      FROM seg s JOIN b ON s.space = b.space
      GROUP BY 1""",

    // the reference clamp/TTL ladder verbatim (≤0 → 30 s observer
    // default; clamp [1,300]; TTL = max(3·renew, 30)); declared
    // intervals are (segment % 9)·60 − 60 — pure integer key functions
    "sk_worker_presence" -> s"""$E,
      pres AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS n_renewals,
               max(ts_us) AS last_seen_us
        FROM entries GROUP BY 1, 2),
      hz AS (SELECT space, max(ts_us) AS as_of_us
             FROM entries GROUP BY 1),
      lad AS (
        SELECT p.space, p.segment, p.n_renewals, p.last_seen_us,
               h.as_of_us,
               (CAST(p.segment AS BIGINT) % 9) * 60 - 60 AS hb_raw_s
        FROM pres p JOIN hz h ON p.space = h.space),
      r AS (
        SELECT *, CAST(CASE WHEN hb_raw_s <= 0 THEN 30
                       ELSE least(greatest(hb_raw_s, 1), 300) END
                  AS BIGINT) AS renew_s
        FROM lad),
      t AS (
        SELECT *, CAST(CASE WHEN renew_s * 3 < 30 THEN 30
                       ELSE renew_s * 3 END AS BIGINT) AS ttl_s,
               as_of_us - last_seen_us AS age_us
        FROM r)
      SELECT space, segment AS worker, n_renewals, hb_raw_s, renew_s,
             ttl_s, last_seen_us, age_us,
             CAST(CASE WHEN age_us > ttl_s * 1000000 THEN 1 ELSE 0 END
               AS INT) AS is_stale
      FROM t""",

    // TWO-FORMULATION oracle (r24, r18 verdict #4 — the doc_similar/
    // es_replay_from_snapshot posture): the GRANT synthesis (ttl
    // self-scaled to the key's own mean gap, multiply before divide) is
    // the shared parameter, but the DETECTOR is derived with
    // EXISTS/NOT-EXISTS interval logic instead of mirroring the
    // engine's running-max island/sweep windows — an episode STARTS at
    // a grant no earlier same-holder grant still covers; each grant
    // anchors to the LATEST start at or before it; an episode is
    // split-brain iff it OVERLAPS some episode ordered before it by
    // (start, holder, ep) on the same key (same-holder episodes are
    // disjoint by construction, so any hit is a different holder —
    // both believed they held the key at once). The hash match then
    // cross-derives the engine's island-merge + running-max sweep.
    "sk_lease_audit" -> s"""$E,
      kb AS (
        SELECT space, segment, min(ts_us) AS kmin, max(ts_us) AS kmax,
               CAST(count(*) AS BIGINT) AS kn
        FROM entries GROUP BY 1, 2),
      g AS (
        SELECT e.space, e.segment, e.ts_us, e.sequence,
               'h' || CAST(e.sequence % 3 AS VARCHAR) AS holder,
               e.ts_us + ((k.kmax - k.kmin) * (1 + e.sequence % 4))
                 // (2 * k.kn) AS end_us
        FROM entries e
        JOIN kb k ON e.space = k.space AND e.segment = k.segment),
      st AS (
        SELECT * FROM g
        WHERE NOT EXISTS (
          SELECT 1 FROM g f
          WHERE f.space = g.space AND f.segment = g.segment
            AND f.holder = g.holder
            AND (f.ts_us < g.ts_us OR
                 (f.ts_us = g.ts_us AND f.sequence < g.sequence))
            AND f.end_us > g.ts_us)),
      m AS (
        SELECT g.space, g.segment, g.holder, g.ts_us, g.end_us,
               (SELECT max(printf('%020d:%020d', st.ts_us, st.sequence))
                FROM st
                WHERE st.space = g.space AND st.segment = g.segment
                  AND st.holder = g.holder
                  AND (st.ts_us < g.ts_us OR
                       (st.ts_us = g.ts_us AND st.sequence <= g.sequence)))
                 AS ep
        FROM g),
      eps AS (
        SELECT space, segment, holder, ep, min(ts_us) AS start_us,
               max(end_us) AS end_us
        FROM m GROUP BY 1, 2, 3, 4),
      fl AS (
        SELECT e.*,
               CASE WHEN EXISTS (
                 SELECT 1 FROM eps f
                 WHERE f.space = e.space AND f.segment = e.segment
                   AND (f.start_us < e.start_us OR
                        (f.start_us = e.start_us AND
                         (f.holder < e.holder OR
                          (f.holder = e.holder AND f.ep < e.ep))))
                   AND f.end_us > e.start_us)
               THEN 1 ELSE 0 END AS split_brain
        FROM eps e)
      SELECT f.space, f.segment AS lease_key, k.kn AS n_grants,
             CAST(count(DISTINCT f.holder) AS BIGINT) AS n_holders,
             CAST(count(*) AS BIGINT) AS n_episodes,
             CAST(sum(f.split_brain) AS BIGINT) AS n_split_brain
      FROM fl f
      JOIN kb k ON f.space = k.space AND f.segment = k.segment
      GROUP BY 1, 2, 3""",

    "sk_retention_audit" -> s"""
      WITH ev AS (
        SELECT event_type AS space, epoch_us(ts) AS ts_us,
               CAST(length(props) AS BIGINT) AS pbytes
        FROM events),
      b AS (
        SELECT space,
               min(ts_us) + ((max(ts_us) - min(ts_us)) * 3) // 4
                 AS cutoff_ts_us
        FROM ev GROUP BY 1)
      SELECT e.space, b.cutoff_ts_us,
             CAST(sum(CASE WHEN e.ts_us < b.cutoff_ts_us THEN 1 ELSE 0 END)
               AS BIGINT) AS n_expired,
             CAST(sum(CASE WHEN e.ts_us < b.cutoff_ts_us THEN e.pbytes
               ELSE 0 END) AS BIGINT) AS bytes_expired,
             CAST(sum(CASE WHEN e.ts_us >= b.cutoff_ts_us THEN 1 ELSE 0
               END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN e.ts_us >= b.cutoff_ts_us THEN e.pbytes
               ELSE 0 END) AS BIGINT) AS bytes_kept
      FROM ev e JOIN b ON e.space = b.space
      GROUP BY 1, 2""",

    // per-segment survivor via max_by over the sequence ordinal, then
    // the space rollup; reclaim share is the half-up integer milli
    "sk_compact_plan" -> s"""$E,
      seg AS (
        SELECT space, segment, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(length(payload)) AS BIGINT) AS bytes_sum,
               CAST(max_by(length(payload), sequence) AS BIGINT)
                 AS last_pbytes
        FROM entries GROUP BY 1, 2)
      SELECT space, CAST(sum(n) AS BIGINT) AS n_entries,
             count(*) AS n_segments,
             CAST(sum(bytes_sum) AS BIGINT) AS bytes_total,
             CAST(sum(last_pbytes) AS BIGINT) AS bytes_live,
             CAST(sum(bytes_sum) - sum(last_pbytes) AS BIGINT)
               AS bytes_reclaimed,
             CASE WHEN CAST(sum(bytes_sum) AS BIGINT) > 0 THEN
               (2 * (CAST(sum(bytes_sum) AS BIGINT) -
                     CAST(sum(last_pbytes) AS BIGINT)) * 1000 +
                CAST(sum(bytes_sum) AS BIGINT))
                 // (2 * CAST(sum(bytes_sum) AS BIGINT))
             END AS reclaim_milli
      FROM seg GROUP BY 1""",

    "es_replay_state" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS balance,
             max(sequence) AS last_sequence,
             max_by(ts_us, sequence) AS last_ts_us,
             max_by(payload, sequence) AS last_payload
      FROM entries WHERE space = 'purchase' GROUP BY 1, 2""",

    "es_replay_from" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS balance,
             max(sequence) AS last_sequence,
             max_by(ts_us, sequence) AS last_ts_us,
             max_by(payload, sequence) AS last_payload
      FROM entries WHERE space = 'purchase' AND sequence > 20
      GROUP BY 1, 2""",

    "es_replay_from_snapshot" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS balance,
             max(sequence) AS last_sequence,
             max_by(ts_us, sequence) AS last_ts_us,
             max_by(payload, sequence) AS last_payload
      FROM entries WHERE space = 'purchase' GROUP BY 1, 2""",

    "es_snapshot_plan" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             max(sequence) AS last_sequence,
             count(*) // 16 AS snaps_taken,
             count(*) % 16 AS since_snap,
             CAST(CASE WHEN count(*) % 16 >= 8 THEN 1 ELSE 0 END
               AS BIGINT) AS due
      FROM entries GROUP BY 1, 2""",

    "es_as_of_time" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS balance,
             max(sequence) AS last_sequence,
             max_by(ts_us, sequence) AS last_ts_us,
             max_by(payload, sequence) AS last_payload
      FROM entries WHERE space = 'purchase' AND ts_us <= $T_2024_01_15
      GROUP BY 1, 2""",

    // integer change predicate (event-count growth) so row membership
    // can't hinge on FP; balances are exact integer cents (the r20
    // TPC-H recipe, applied family-wide in r21) displayed once
    "es_state_diff" -> s"""$E
      SELECT space, segment,
             CAST(sum(CASE WHEN ts_us <= $T_2024_01_15 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_events_before,
             count(*) AS n_events_after,
             CAST(sum(CASE WHEN ts_us <= $T_2024_01_15
                       THEN CAST(floor(value * 100 + 0.5) AS HUGEINT)
                       ELSE 0 END) AS DOUBLE) / 100.0 AS balance_before,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS balance_after,
             CAST(count(*) -
                  sum(CASE WHEN ts_us <= $T_2024_01_15 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new_events
      FROM entries WHERE space = 'purchase' AND ts_us <= $T_2024_01_25
      GROUP BY 1, 2
      HAVING count(*) >
             sum(CASE WHEN ts_us <= $T_2024_01_15 THEN 1 ELSE 0 END)""",

    // exact integer cents end-to-end: the change magnitude (both the
    // order key and the display) is |Δcents| — no float round anywhere
    "es_top_movers" -> s"""$E,
      d AS (
        SELECT segment,
               sum(CASE WHEN ts_us <= $T_2024_01_15
                        THEN CAST(floor(value * 100 + 0.5) AS HUGEINT)
                        ELSE 0 END) AS cents_before,
               sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS cents_after,
               count(*) AS n_after,
               sum(CASE WHEN ts_us <= $T_2024_01_15 THEN 1 ELSE 0 END)
                 AS n_before
        FROM entries WHERE space = 'purchase' AND ts_us <= $T_2024_01_25
        GROUP BY 1
        HAVING count(*) >
               sum(CASE WHEN ts_us <= $T_2024_01_15 THEN 1 ELSE 0 END))
      SELECT segment,
             CAST(cents_before AS DOUBLE) / 100.0 AS balance_before,
             CAST(cents_after AS DOUBLE) / 100.0 AS balance_after,
             CAST(abs(cents_after - cents_before) AS DOUBLE) / 100.0
               AS abs_change
      FROM d ORDER BY abs(cents_after - cents_before) DESC, segment
      LIMIT 10""",

    "es_payload_decode" -> s"""$E
      SELECT space, segment, count(*) AS n_events,
             CAST(sum(CAST(json_extract(payload, '$$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             max(CAST(json_extract(payload, '$$.k') AS BIGINT)) AS max_k,
             max_by(CAST(json_extract(payload, '$$.k') AS BIGINT), sequence)
               AS last_k
      FROM entries WHERE space = 'signup' GROUP BY 1, 2""",

    "events_rollup" -> """
      SELECT event_type AS space, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n_events, CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))""",

    "es_projection_daily" -> """
      SELECT event_type AS space, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS total_value,
             count(DISTINCT user_id) AS n_active_segments
      FROM events GROUP BY 1, 2""",

    "win_tumbling" -> s"""
      SELECT event_type AS space,
             (epoch_us(ts) // $HOUR_US) * $HOUR_US AS window_start_us,
             count(*) AS n, CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events GROUP BY 1, 2""",

    // the row_number formulation of open/close (the engine runs the
    // struct-min/max aggregate — two-formulation cross-check); the
    // (ts_us, event_id) order is total, so both picks are exact
    "win_ohlc" -> s"""
      WITH w AS (
        SELECT event_type AS space, epoch_us(ts) AS ts_us, event_id,
               value,
               (epoch_us(ts) // $HOUR_US) * $HOUR_US AS window_start_us
        FROM events),
      r AS (
        SELECT *,
               row_number() OVER (PARTITION BY space, window_start_us
                 ORDER BY ts_us ASC, event_id ASC) AS rna,
               row_number() OVER (PARTITION BY space, window_start_us
                 ORDER BY ts_us DESC, event_id DESC) AS rnd
        FROM w)
      SELECT space, window_start_us, count(*) AS n,
             max(CASE WHEN rna = 1 THEN value END) AS open,
             max(CASE WHEN rnd = 1 THEN value END) AS close,
             max(value) AS high, min(value) AS low,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM r GROUP BY 1, 2""",

    "win_hopping" -> s"""
      WITH h AS (SELECT 0 AS k UNION ALL SELECT 1)
      SELECT event_type AS space,
             ((epoch_us(ts) // $SIX_H_US) - k) * $SIX_H_US
               AS window_start_us,
             count(*) AS n, CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events CROSS JOIN h GROUP BY 1, 2""",

    "win_session" -> SessionSql,

    // sessions embedded verbatim; all-integer duration/size rollup
    "session_stats" -> s"""
      SELECT space, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             (2 * CAST(sum(end_us - start_us) AS BIGINT) +
              CAST(count(*) AS BIGINT)) //
              (2 * CAST(count(*) AS BIGINT)) AS mean_len_us,
             (2 * CAST(sum(n_events) AS BIGINT) * 1000 +
              CAST(count(*) AS BIGINT)) //
              (2 * CAST(count(*) AS BIGINT)) AS mean_events_milli
      FROM ($SessionSql) x GROUP BY 1""",

    "win_running" -> s"""$E
      SELECT space, segment, sequence, value,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT))
                 OVER (PARTITION BY space, segment ORDER BY sequence
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 100.0 AS running_value
      FROM entries WHERE space = 'click'""",

    "sk_codec_roundtrip" -> s"""$E
      SELECT space, segment, sequence, ts_us, value, payload FROM entries
      WHERE space = 'error'""",

    // the same strictly-after chain as Windows.funnel: per segment,
    // t_k = min event time of step k after t_{k-1}
    "event_funnel" -> FunnelSql,

    // funnel embedded verbatim; integer half-up conv/overall milli
    "funnel_rates" -> s"""
      SELECT f.step, f.space, f.n_segments,
             CAST(CASE WHEN p.n_segments IS NULL THEN 1000
                  WHEN p.n_segments = 0 THEN 0
                  ELSE (2 * f.n_segments * 1000 + p.n_segments) //
                       (2 * p.n_segments) END AS BIGINT) AS conv_milli,
             CAST(CASE WHEN fst.n > 0
                  THEN (2 * f.n_segments * 1000 + fst.n) // (2 * fst.n)
                  ELSE 0 END AS BIGINT) AS overall_milli
      FROM ($FunnelSql) f
      LEFT JOIN ($FunnelSql) p ON f.step = p.step + 1
      CROSS JOIN (SELECT n_segments AS n FROM ($FunnelSql)
                  WHERE step = 1) fst""",

    // the funnel achievement-time CTEs verbatim; steps with zero
    // converters emit NO row in both engines (HAVING mirror of the
    // engine's emptiness filter — never a divide-by-zero)
    "conversion_latency" -> s"""$FunnelCtes
      SELECT CAST(2 AS BIGINT) AS step, 'click' AS space,
             CAST(count(*) AS BIGINT) AS n_converted,
             CAST(sum(t - tprev) AS BIGINT) AS sum_gap_us,
             CAST(max(t - tprev) AS BIGINT) AS max_gap_us,
             (2 * CAST(sum(t - tprev) AS BIGINT) +
                CAST(count(*) AS BIGINT)) //
               (2 * CAST(count(*) AS BIGINT)) AS mean_gap_us
      FROM s2 HAVING count(*) > 0
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase',
             CAST(count(*) AS BIGINT),
             CAST(sum(t - tprev) AS BIGINT),
             CAST(max(t - tprev) AS BIGINT),
             (2 * CAST(sum(t - tprev) AS BIGINT) +
                CAST(count(*) AS BIGINT)) //
               (2 * CAST(count(*) AS BIGINT))
      FROM s3 HAVING count(*) > 0""",

    // same lag-per-segment adjacency; share is the identical all-integer
    // half-up milli expression (// == div for positive operands)
    "event_transitions" -> ETransSql,

    // same adjacency + midpoint era split; identical integer
    // cross-multiplication predicate and half-up milli displays
    "transition_drift" -> s"""$E,
      steps AS (
        SELECT segment, space, ts_us, event_id,
               lag(space) OVER (PARTITION BY segment
                                ORDER BY ts_us, event_id) AS from_space
        FROM entries),
      b AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM entries),
      cnt AS (
        SELECT CASE WHEN s.ts_us * 2 <= b.tmin + b.tmax
                    THEN 'old' ELSE 'new' END AS era,
               s.from_space, s.space AS to_space,
               CAST(count(*) AS BIGINT) AS n
        FROM steps s CROSS JOIN b
        WHERE s.from_space IS NOT NULL
        GROUP BY 1, 2, 3),
      tots AS (SELECT era, from_space, CAST(sum(n) AS BIGINT) AS tot
               FROM cnt GROUP BY 1, 2),
      edges AS (
        SELECT coalesce(o.from_space, nn.from_space) AS from_space,
               coalesce(o.to_space, nn.to_space) AS to_space,
               coalesce(o.n, CAST(0 AS BIGINT)) AS n_old,
               coalesce(nn.n, CAST(0 AS BIGINT)) AS n_new
        FROM (SELECT from_space, to_space, n FROM cnt WHERE era = 'old') o
        FULL OUTER JOIN
             (SELECT from_space, to_space, n FROM cnt WHERE era = 'new') nn
          ON o.from_space = nn.from_space AND o.to_space = nn.to_space),
      j AS (
        SELECT e.from_space, e.to_space, e.n_old, e.n_new,
               coalesce(t1.tot, CAST(0 AS BIGINT)) AS tot_old,
               coalesce(t2.tot, CAST(0 AS BIGINT)) AS tot_new
        FROM edges e
        LEFT JOIN (SELECT from_space, tot FROM tots WHERE era = 'old') t1
          ON e.from_space = t1.from_space
        LEFT JOIN (SELECT from_space, tot FROM tots WHERE era = 'new') t2
          ON e.from_space = t2.from_space)
      SELECT from_space, to_space, n_old, n_new, tot_old, tot_new,
             CASE WHEN tot_old > 0
                  THEN (2 * n_old * 1000 + tot_old) // (2 * tot_old)
                  ELSE CAST(0 AS BIGINT) END AS share_old_milli,
             CASE WHEN tot_new > 0
                  THEN (2 * n_new * 1000 + tot_new) // (2 * tot_new)
                  ELSE CAST(0 AS BIGINT) END AS share_new_milli
      FROM j
      WHERE abs(CAST(n_old AS HUGEINT) * tot_new -
                CAST(n_new AS HUGEINT) * tot_old) * 1000 >
            5 * CAST(tot_old AS HUGEINT) * tot_new""",

    // same within-segment lag; identical integer half-up mean
    "interarrival_stats" -> s"""$E,
      g AS (
        SELECT space,
               ts_us - lag(ts_us) OVER (PARTITION BY space, segment
                 ORDER BY ts_us, event_id) AS d
        FROM entries)
      SELECT space, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(d) AS BIGINT) AS sum_gap_us,
             CAST(max(d) AS BIGINT) AS max_gap_us,
             (2 * CAST(sum(d) AS BIGINT) + CAST(count(*) AS BIGINT)) //
               (2 * CAST(count(*) AS BIGINT)) AS mean_gap_us
      FROM g WHERE d IS NOT NULL GROUP BY 1""",

    // same era split, same integer flag machinery over (space, bin);
    // the hostile-value fence mirrored verbatim before the bin cast
    "value_drift" -> s"""$E,
      b AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM entries),
      cnt AS (
        SELECT CASE WHEN e.ts_us * 2 <= b.tmin + b.tmax
                    THEN 'old' ELSE 'new' END AS era,
               e.space, CAST(floor(e.value) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM entries e CROSS JOIN b
        WHERE e.value IS NOT NULL AND NOT isnan(e.value)
          AND abs(e.value) < 1e15
        GROUP BY 1, 2, 3),
      tots AS (SELECT era, space, CAST(sum(n) AS BIGINT) AS tot
               FROM cnt GROUP BY 1, 2),
      bins AS (
        SELECT coalesce(o.space, nn.space) AS space,
               coalesce(o.bin, nn.bin) AS bin,
               coalesce(o.n, CAST(0 AS BIGINT)) AS n_old,
               coalesce(nn.n, CAST(0 AS BIGINT)) AS n_new
        FROM (SELECT space, bin, n FROM cnt WHERE era = 'old') o
        FULL OUTER JOIN
             (SELECT space, bin, n FROM cnt WHERE era = 'new') nn
          ON o.space = nn.space AND o.bin = nn.bin),
      j AS (
        SELECT e.space, e.bin, e.n_old, e.n_new,
               coalesce(t1.tot, CAST(0 AS BIGINT)) AS tot_old,
               coalesce(t2.tot, CAST(0 AS BIGINT)) AS tot_new
        FROM bins e
        LEFT JOIN (SELECT space, tot FROM tots WHERE era = 'old') t1
          ON e.space = t1.space
        LEFT JOIN (SELECT space, tot FROM tots WHERE era = 'new') t2
          ON e.space = t2.space)
      SELECT space, bin, n_old, n_new, tot_old, tot_new,
             CASE WHEN tot_old > 0
                  THEN (2 * n_old * 1000 + tot_old) // (2 * tot_old)
                  ELSE CAST(0 AS BIGINT) END AS share_old_milli,
             CASE WHEN tot_new > 0
                  THEN (2 * n_new * 1000 + tot_new) // (2 * tot_new)
                  ELSE CAST(0 AS BIGINT) END AS share_new_milli
      FROM j
      WHERE abs(CAST(n_old AS HUGEINT) * tot_new -
                CAST(n_new AS HUGEINT) * tot_old) * 1000 >
            5 * CAST(tot_old AS HUGEINT) * tot_new""",

    // the WHEN sibling: identical era split and flag machinery over the
    // fixed 24-bin hour-of-day grid; hour is the all-integer
    // (ts_us // 3.6e9) % 24 both engines compute identically
    "diurnal_drift" -> s"""$E,
      b AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM entries),
      cnt AS (
        SELECT CASE WHEN e.ts_us * 2 <= b.tmin + b.tmax
                    THEN 'old' ELSE 'new' END AS era,
               e.space, (e.ts_us // 3600000000) % 24 AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM entries e CROSS JOIN b
        GROUP BY 1, 2, 3),
      tots AS (SELECT era, space, CAST(sum(n) AS BIGINT) AS tot
               FROM cnt GROUP BY 1, 2),
      bins AS (
        SELECT coalesce(o.space, nn.space) AS space,
               coalesce(o.hour, nn.hour) AS hour,
               coalesce(o.n, CAST(0 AS BIGINT)) AS n_old,
               coalesce(nn.n, CAST(0 AS BIGINT)) AS n_new
        FROM (SELECT space, hour, n FROM cnt WHERE era = 'old') o
        FULL OUTER JOIN
             (SELECT space, hour, n FROM cnt WHERE era = 'new') nn
          ON o.space = nn.space AND o.hour = nn.hour),
      j AS (
        SELECT e.space, e.hour, e.n_old, e.n_new,
               coalesce(t1.tot, CAST(0 AS BIGINT)) AS tot_old,
               coalesce(t2.tot, CAST(0 AS BIGINT)) AS tot_new
        FROM bins e
        LEFT JOIN (SELECT space, tot FROM tots WHERE era = 'old') t1
          ON e.space = t1.space
        LEFT JOIN (SELECT space, tot FROM tots WHERE era = 'new') t2
          ON e.space = t2.space)
      SELECT space, hour, n_old, n_new, tot_old, tot_new,
             CASE WHEN tot_old > 0
                  THEN (2 * n_old * 1000 + tot_old) // (2 * tot_old)
                  ELSE CAST(0 AS BIGINT) END AS share_old_milli,
             CASE WHEN tot_new > 0
                  THEN (2 * n_new * 1000 + tot_new) // (2 * tot_new)
                  ELSE CAST(0 AS BIGINT) END AS share_new_milli
      FROM j
      WHERE abs(CAST(n_old AS HUGEINT) * tot_new -
                CAST(n_new AS HUGEINT) * tot_old) * 1000 >
            5 * CAST(tot_old AS HUGEINT) * tot_new""",

    // two-formulation attribution: engine runs struct-min/max over the
    // (ts_us, event_id) total order, the oracle the row_number windows;
    // first/last values are raw single-event doubles (never a sum)
    "touch_attribution" -> AttributionSql,

    // the attribution derivation embedded verbatim; mean journey length
    // as the integer half-up milli over exact BIGINTs
    "touch_matrix" -> s"""
      WITH a AS ($AttributionSql)
      SELECT first_space, last_space,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             (2 * CAST(sum(n_events) AS BIGINT) * 1000 +
               CAST(count(*) AS BIGINT)) //
               (2 * CAST(count(*) AS BIGINT)) AS mean_len_milli
      FROM a GROUP BY 1, 2""",

    // matrix embedded verbatim; ln ALONE snapped to the 1e-6 grid
    // before composing (r13 ADVICE), entropy = −Σ n·ln_micro / (tot·1e6)
    // — one double expression over exact BIGINTs
    "journey_entropy" -> s"""
      WITH m AS (SELECT from_space, to_space, n FROM ($ETransSql) x),
      t AS (
        SELECT from_space, CAST(sum(n) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n_out
        FROM m GROUP BY 1)
      SELECT m.from_space, t.n_out, t.tot,
             CAST(-CAST(sum(m.n * CAST(round(ln(CAST(m.n AS DOUBLE) /
               CAST(t.tot AS DOUBLE)) * 1000000.0::DOUBLE, 0) AS BIGINT))
               AS BIGINT) AS DOUBLE) /
               (CAST(t.tot AS DOUBLE) * 1000000.0::DOUBLE) AS entropy
      FROM m JOIN t ON m.from_space = t.from_space
      GROUP BY 1, 2, 3""",

    // same cohort chain: distinct active days → first day per segment →
    // (cohort, offset) rollup; integer day index via floor division
    "cohort_retention" -> s"""$E,
      days AS (SELECT DISTINCT segment, ts_us // $DAY_US AS day
               FROM entries),
      cohort AS (SELECT segment, min(day) AS cohort_day
                 FROM days GROUP BY 1)
      SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
             count(*) AS n_segments
      FROM days d JOIN cohort c ON d.segment = c.segment
      GROUP BY 1, 2""",

    // exact integer moments (absent buckets are true zeros: they widen n
    // only), then ONE double expression written identically to the Spark
    // side — no FP summation-order hazard, integer row-membership guard
    "space_correlation" -> s"""
      WITH hourly AS (
        SELECT event_type AS space, epoch_us(ts) // $HOUR_US AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      grid AS (SELECT max(h) - min(h) + 1 AS n FROM hourly),
      stats AS (SELECT space, CAST(sum(c) AS BIGINT) AS s,
                       CAST(sum(c * c) AS BIGINT) AS ss
                FROM hourly GROUP BY 1),
      xy AS (SELECT a.space AS space1, b.space AS space2,
                    CAST(sum(a.c * b.c) AS BIGINT) AS sxy
             FROM hourly a JOIN hourly b
               ON a.h = b.h AND a.space < b.space
             GROUP BY 1, 2),
      pairs AS (SELECT s1.space AS space1, s2.space AS space2,
                       s1.s AS sx, s1.ss AS sxx, s2.s AS sy, s2.ss AS syy
                FROM stats s1 JOIN stats s2 ON s1.space < s2.space)
      SELECT p.space1, p.space2,
             round(CAST(g.n * coalesce(x.sxy, 0) - p.sx * p.sy AS DOUBLE) /
                   (sqrt(CAST(g.n * p.sxx - p.sx * p.sx AS DOUBLE)) *
                    sqrt(CAST(g.n * p.syy - p.sy * p.sy AS DOUBLE))), 4)
               AS corr
      FROM pairs p LEFT JOIN xy x USING (space1, space2)
      CROSS JOIN grid g
      WHERE g.n * p.sxx - p.sx * p.sx > 0
        AND g.n * p.syy - p.sy * p.sy > 0""",

    "win_anomaly" -> s"""
      WITH hourly AS (
        SELECT event_type AS space, epoch_us(ts) // $HOUR_US AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      grid AS (SELECT max(h) - min(h) + 1 AS n FROM hourly),
      stats AS (SELECT space, CAST(sum(c) AS BIGINT) AS s,
                       CAST(sum(c * c) AS BIGINT) AS ss
                FROM hourly GROUP BY 1),
      z AS (
        SELECT h.space, h.h, h.c,
               round(CAST(g.n * h.c - st.s AS DOUBLE) /
                     sqrt(CAST(g.n * st.ss - st.s * st.s AS DOUBLE)), 4)
                 AS z
        FROM hourly h JOIN stats st USING (space) CROSS JOIN grid g
        WHERE g.n * st.ss - st.s * st.s > 0)
      SELECT space, h * $HOUR_US AS window_start_us, c AS n_events, z
      FROM z WHERE abs(z) >= 2.0""",

    "value_quantiles" -> """
      SELECT event_type AS space,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.9), 4) AS p90,
             round(quantile_cont(value, 0.99), 4) AS p99,
             round(avg(value), 4) AS mean
      FROM events GROUP BY 1""",

    // two-stage so ts ties are broken by event_id exactly like the Spark
    // operator (DuckDB max_by takes no composite key): first the ref
    // timestamp, then max_by(value, event_id) among refs AT that
    // timestamp — deterministic even if two refs share a microsecond
    "asof_join" -> s"""$E,
      p AS (SELECT segment, sequence, ts_us FROM entries
            WHERE space = 'purchase'),
      c AS (SELECT segment, ts_us, event_id, value FROM entries
            WHERE space = 'click'),
      a AS (
        SELECT p.segment, p.sequence, p.ts_us,
               max(c.ts_us) AS ref_ts_us
        FROM p LEFT JOIN c
          ON p.segment = c.segment AND c.ts_us <= p.ts_us
        GROUP BY 1, 2, 3)
      SELECT a.segment, a.sequence, a.ts_us, a.ref_ts_us,
             max_by(c.value, c.event_id) AS ref_value
      FROM a LEFT JOIN c
        ON a.segment = c.segment AND c.ts_us = a.ref_ts_us
      GROUP BY 1, 2, 3, 4""",

    "range_join" -> s"""$E,
      p AS (SELECT segment, sequence, ts_us FROM entries
            WHERE space = 'purchase'),
      c AS (SELECT segment, ts_us FROM entries WHERE space = 'click')
      SELECT p.segment, p.sequence, p.ts_us,
             CAST(count(c.ts_us) AS BIGINT) AS n_recent
      FROM p LEFT JOIN c
        ON p.segment = c.segment
       AND c.ts_us > p.ts_us - $HOUR_US AND c.ts_us <= p.ts_us
      GROUP BY 1, 2, 3""",

    // exact integer units end to end (the r20 third-scale lesson):
    // lossless floor(x·scale + 0.5) per row, order-independent integer
    // sums (HUGEINT here, DECIMAL(38,0) in the engine), one integral
    // half-up + one double division per display — round(sum(double))
    // and round(avg(double)) are order-dependent and drew a one-cent
    // divergence on this family at the 2×-inflated run
    "q1_pricing" -> """
      WITH u AS (
        SELECT l_returnflag, l_linestatus,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 AS cents,
               CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS dp,
               CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tp
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      SELECT l_returnflag, l_linestatus,
             CAST(sum(qty) AS DOUBLE) AS sum_qty,
             CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_base_price,
             CAST((sum(cents * (100 - dp)) + 50) // 100 AS DOUBLE)
               / 100.0 AS sum_disc_price,
             CAST((sum(cents * (100 - dp) * (100 + tp)) + 5000) // 10000
               AS DOUBLE) / 100.0 AS sum_charge,
             CAST((2 * sum(qty) * 1000000 + count(*)) //
               (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty,
             CAST((2 * sum(cents) * 10000 + count(*)) //
               (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_price,
             CAST((2 * sum(dp) * 10000 + count(*)) //
               (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_disc,
             count(*) AS count_order
      FROM u GROUP BY l_returnflag, l_linestatus""",

    // exact BIGINT cent-percent sum + one integer half-up to cents —
    // never round(sum(double)), which drew a one-cent divergence at
    // the 2× third-scale run (order-dependent FP summation)
    "part_revenue_topk" -> """
      WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                   AS BIGINT) *
                 (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
                 AS BIGINT) AS rev_cp,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1),
      r2 AS (
        SELECT l_partkey,
               CAST((rev_cp + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
               n_lines
        FROM rev ORDER BY revenue DESC, l_partkey LIMIT 20)
      SELECT p.p_partkey AS partkey, p.p_name, r.revenue, r.n_lines
      FROM r2 r JOIN part p ON p.p_partkey = r.l_partkey""",

    "q3_topk" -> """
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_orderpriority,
             CAST((sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                 AS BIGINT) *
               (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
               + 50) // 100 AS DOUBLE) / 100.0 AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q5_region" -> """
      SELECT n_name,
             CAST((sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                 AS BIGINT) *
               (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
               + 50) // 100 AS DOUBLE) / 100.0 AS revenue
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY n_name""",

    "q_semi_anti" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE c_mktsegment = 'BUILDING'
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')""",

    "enrich_events" -> """
      SELECT event_type AS space, c_mktsegment,
             count(*) AS n_events, CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0 AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2""",

    "event_pivot" -> """
      SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS total,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_view
      FROM events GROUP BY 1""",

    "q13_distribution" -> """
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count""",

    "top_customers_per_nation" -> """
      WITH spend AS (
        SELECT n_name, c_custkey, c_name,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                 AS BIGINT)) AS DOUBLE) / 100.0 AS total_spend,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3)
      SELECT * FROM (
        SELECT n_name, c_custkey, c_name, total_spend, n_orders,
               CAST(row_number() OVER (PARTITION BY n_name
                 ORDER BY total_spend DESC, c_custkey) AS BIGINT) AS rnk
        FROM spend)
      WHERE rnk <= 3""",
  )
}
