package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The streamkit storage read surface re-expressed as Spark relational
  * operators over the canonical entry view (see
  * reference `pkg/storage/interface.go:27-48`).
  *
  * All operators are pure DataFrame transforms: filters/limits are
  * declarative so Catalyst pushes sequence/timestamp range predicates to
  * the parquet scan, and aggregate-style ops (peek/status) are one-pass
  * hash aggregations with map-side partial combine — no global sorts.
  */
object StreamOps {

  private val entryCols: Seq[Column] =
    Seq(col("space"), col("segment"), col("sequence"), col("ts_us"),
      col("value"), col("payload"))

  /** ConsumeSegment (`pkg/api/messages.go:161-176`): strict
    * sequence-ordered scan of one segment with optional seq/ts bounds and
    * a limit. Sequence is unique per segment so ORDER BY sequence LIMIT n
    * is deterministic. */
  def consumeSegment(entries: DataFrame, space: String, segment: String,
      minSeq: Option[Long] = None, maxSeq: Option[Long] = None,
      minTsUs: Option[Long] = None, maxTsUs: Option[Long] = None,
      limit: Option[Int] = None): DataFrame = {
    var df = entries
      .filter(col("space") === space && col("segment") === segment)
    minSeq.foreach(v => df = df.filter(col("sequence") >= v))
    maxSeq.foreach(v => df = df.filter(col("sequence") <= v))
    minTsUs.foreach(v => df = df.filter(col("ts_us") >= v))
    maxTsUs.foreach(v => df = df.filter(col("ts_us") <= v))
    df = df.select(entryCols: _*).orderBy("sequence")
    limit.map(df.limit).getOrElse(df)
  }

  /** ConsumeSpace (`pkg/api/messages.go:146-159`): timestamp-merged scan
    * across all segments of a space. Total order (ts_us, segment,
    * sequence) is the Spark dual of the reference's lexicographic space
    * key `lexkey.Encode(DATA, SPACES, space, ts, segment, seq)`
    * (`messages.go:113-116`). */
  def consumeSpace(entries: DataFrame, space: String,
      minTsUs: Option[Long] = None, maxTsUs: Option[Long] = None,
      limit: Option[Int] = None): DataFrame = {
    var df = entries.filter(col("space") === space)
    minTsUs.foreach(v => df = df.filter(col("ts_us") >= v))
    maxTsUs.foreach(v => df = df.filter(col("ts_us") <= v))
    df = df.select(entryCols: _*).orderBy("ts_us", "segment", "sequence")
    limit.map(df.limit).getOrElse(df)
  }

  /** Space-offset cursor resume: strictly-after comparison on the
    * (ts_us, segment, sequence) tuple — `Entry.GetSpaceOffset`
    * (`messages.go:113`). The anchor entry is located by (segment,
    * sequence) and broadcast; the cursor itself is a struct comparison
    * Catalyst can evaluate without a join explosion. */
  def consumeSpaceFromOffset(entries: DataFrame, space: String,
      anchorSegment: String, anchorSequence: Long,
      limit: Option[Int] = None): DataFrame = {
    val inSpace = entries.filter(col("space") === space)
    val anchor = inSpace
      .filter(col("segment") === anchorSegment &&
        col("sequence") === anchorSequence)
      .select(col("ts_us").as("a_ts_us"), col("segment").as("a_segment"),
        col("sequence").as("a_sequence"))
    val df = inSpace.crossJoin(broadcast(anchor))
      .filter(struct(col("ts_us"), col("segment"), col("sequence")) >
        struct(col("a_ts_us"), col("a_segment"), col("a_sequence")))
      .select(entryCols: _*)
      .orderBy("ts_us", "segment", "sequence")
    limit.map(df.limit).getOrElse(df)
  }

  /** Consume (`pkg/api/messages.go:130-144`): multi-space merge with a
    * per-space offset map and global timestamp bounds. Only spaces present
    * in the offsets map are consumed (mirrors the server's space-offsets
    * routing); a space whose anchor entry does not resolve (e.g. sequence
    * 0 = from the beginning) is consumed in full. Offsets are broadcast —
    * they are O(#spaces). */
  def consumeMulti(entries: DataFrame,
      offsets: Map[String, (String, Long)],
      minTsUs: Option[Long] = None, maxTsUs: Option[Long] = None,
      limit: Option[Int] = None): DataFrame = {
    val spark = entries.sparkSession
    import spark.implicits._
    val offsetKeys = offsets.toSeq.map { case (sp, (seg, seq)) =>
      (sp, seg, seq)
    }.toDF("o_space", "o_segment", "o_sequence")
    // Resolve each offset (segment, sequence) to its full space-offset
    // tuple (ts_us, segment, sequence) by scanning entries against the
    // broadcast key set (one pruned scan, no log shuffle); then a
    // tiny-to-tiny left join keeps unresolvable anchors with null tuple
    // fields, meaning "no cursor — read the space from the start".
    val found = entries
      .join(broadcast(offsetKeys),
        col("space") === col("o_space") &&
          col("segment") === col("o_segment") &&
          col("sequence") === col("o_sequence"))
      .select(col("space").as("f_space"), col("ts_us").as("a_ts_us"),
        col("segment").as("a_segment"), col("sequence").as("a_sequence"))
    val anchors = broadcast(offsetKeys
      .join(found, col("o_space") === col("f_space"), "left")
      .select(col("o_space").as("a_space"), col("a_ts_us"),
        col("a_segment"), col("a_sequence")))
    var df = entries
      .join(anchors, col("space") === col("a_space"))
      .filter(col("a_ts_us").isNull ||
        struct(col("ts_us"), col("segment"), col("sequence")) >
          struct(col("a_ts_us"), col("a_segment"), col("a_sequence")))
    minTsUs.foreach(v => df = df.filter(col("ts_us") >= v))
    maxTsUs.foreach(v => df = df.filter(col("ts_us") <= v))
    val out = df.select(entryCols: _*)
      .orderBy("ts_us", "space", "segment", "sequence")
    limit.map(out.limit).getOrElse(out)
  }

  /** Peek (`pkg/api/messages.go:72-81`): latest entry per segment of a
    * space. One-pass `max_by` aggregation (partial-combinable) instead of
    * a window sort — at 100 TB this is a map-side-combined hash agg, not
    * a per-segment sort. */
  def peek(entries: DataFrame, space: String): DataFrame =
    entries.filter(col("space") === space)
      .groupBy(col("space"), col("segment"))
      .agg(
        max(col("sequence")).as("sequence"),
        max_by(col("ts_us"), col("sequence")).as("ts_us"),
        max_by(col("value"), col("sequence")).as("value"),
        max_by(col("payload"), col("sequence")).as("payload"))
      .select(entryCols: _*)

  /** Tail read: last `k` entries per segment of a space, via the bounded
    * one-pass LastKEntries aggregate (map-side combine ships ≤ k entries
    * per segment; no per-segment sort of the whole log). */
  def consumeTail(entries: DataFrame, space: String, k: Int): DataFrame =
    entries.filter(col("space") === space)
      .groupBy(col("space"), col("segment"))
      .agg(graft.functions.LastKEntries(
        struct(col("sequence"), col("ts_us"), col("value"), col("payload")),
        k).as("tail"))
      .select(col("space"), col("segment"), explode(col("tail")).as("e"))
      .select(col("space"), col("segment"),
        col("e.sequence").as("sequence"), col("e.ts_us").as("ts_us"),
        col("e.value").as("value"), col("e.payload").as("payload"))

  /** GetSpaces (`pkg/api/messages.go:177`): distinct space names. Reads
    * only the space column — pruned scan + partial-distinct. */
  def getSpaces(named: DataFrame): DataFrame =
    named.select(col("space")).distinct().orderBy("space")

  /** GetSegments (`pkg/api/messages.go:185`). */
  def getSegments(named: DataFrame, space: String): DataFrame =
    named.filter(col("space") === space)
      .select(col("space"), col("segment")).distinct()
      .orderBy("segment")

  /** SegmentStatus (`pkg/api/messages.go:36-49`): first/last sequence and
    * timestamp per segment. Because sequence is dense from 1 in
    * (ts, event_id) order, first_sequence = 1 and last_sequence = count —
    * computed from the RAW table as a one-pass agg with no window shuffle
    * (the production layout materializes sequence; the identity holds
    * either way for a contiguous log). */
  def segmentStatus(named: DataFrame): DataFrame =
    named.groupBy(col("space"), col("segment"))
      .agg(
        lit(1L).as("first_sequence"),
        count(lit(1)).as("last_sequence"),
        min(col("ts_us")).as("first_ts_us"),
        max(col("ts_us")).as("last_ts_us"))

  /** GetStatus (`pkg/api/messages.go:195`): store-level rollup per space. */
  def storeStatus(named: DataFrame): DataFrame =
    named.groupBy(col("space"))
      .agg(
        countDistinct(col("segment")).as("n_segments"),
        count(lit(1)).as("n_entries"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))

  /** Pre-flight EVENT-LOG HEALTH audit — corpus_health's "drops are
    * never silent" doctrine applied to the log (r21, closing the loop
    * around the exact-integer money fence): ONE row counting exactly
    * the pathologies the ingest contract excludes — null timestamps,
    * null segments, null/empty spaces, null payload-JSON, malformed
    * payload JSON, and money values the lossless centile conversion
    * would reject (null, NaN, ±Inf, sub-cent precision, magnitude past
    * the exact-cents BIGINT range |v| > 9·10¹⁶ — the SAME threshold on
    * both sides so the boundary can't disagree). The gate an operator
    * thresholds BEFORE a money query hits [[graft.sources.EventLog
    * .valueCents]]'s raise. Runs on the RAW columns (column-pruned
    * scan, no sequence derivation); every count is an exact integer
    * under the hash gate. One map-side-combinable agg. */
  def logHealth(raw: DataFrame): DataFrame = {
    val c = floor(col("value") * lit(100.0) + lit(0.5))
    val badValue = isnan(col("value")) ||
      abs(col("value")) > lit(9.0e16) ||
      !(c.cast("double") / lit(100.0) === col("value"))
    raw.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("event_id")).as("n_distinct_ids"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_null_ts"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L))
        .as("n_null_segment"),
      sum(when(col("event_type").isNull, 1L).otherwise(0L))
        .as("n_null_space"),
      sum(when(col("event_type") === "", 1L).otherwise(0L))
        .as("n_empty_space"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(when(col("value").isNotNull && badValue, 1L).otherwise(0L))
        .as("n_bad_value"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
      sum(when(col("props").isNotNull &&
          get_json_object(col("props"), "$").isNull, 1L).otherwise(0L))
        .as("n_bad_props"))
  }

  /** Per-event DLQ verdict — the row-level face of [[logHealth]]'s
    * counters (a health dashboard says HOW MANY rows the ingest
    * contract rejects; the dead-letter queue needs WHICH rows and
    * WHY): a first-match precedence ladder (null_ts > null_segment >
    * null_space > empty_space > null_value > bad_value > null_props >
    * bad_props) over the IDENTICAL predicates logHealth counts — the
    * bad-money predicate is the same isnan/9e16-magnitude/sub-cent
    * chain the exact-centile conversion enforces — so each quarantined
    * row carries exactly ONE reason and the ladder order is part of
    * the contract (a row failing several checks reports the earliest).
    * Column-pruned scan, one projection + filter, no shuffle at all;
    * stateless per row, so the STREAMING dual is this same expression
    * over a stream (exact by construction, StreamOpsSpec). The oracle
    * repeats the ladder with the branch split sk_log_health uses (the
    * non-finite test BEFORE the BIGINT cast, so DuckDB's cast never
    * sees NaN/Inf). The bad_props mirror (`NOT json_valid` vs Spark's
    * `get_json_object(props,'$') IS NULL`) agrees on every probed
    * input INCLUDING a bare JSON 'null' — Spark returns the string
    * 'null' there, not SQL NULL (measured r17, contra the r16 ADVICE
    * hypothesis) — and canary 9000000013 pins that agreement. */
  def quarantine(raw: DataFrame): DataFrame = {
    val c = floor(col("value") * lit(100.0) + lit(0.5))
    val badValue = isnan(col("value")) ||
      abs(col("value")) > lit(9.0e16) ||
      !(c.cast("double") / lit(100.0) === col("value"))
    raw.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .withColumn("reason",
        when(col("ts").isNull, "null_ts")
          .when(col("user_id").isNull, "null_segment")
          .when(col("event_type").isNull, "null_space")
          .when(col("event_type") === "", "empty_space")
          .when(col("value").isNull, "null_value")
          .when(badValue, "bad_value")
          .when(col("props").isNull, "null_props")
          .when(get_json_object(col("props"), "$").isNull, "bad_props"))
      .filter(col("reason").isNotNull)
      .select(col("event_id"), col("reason"))
  }

  /** CANARY rows for [[quarantine]] — the planted pathologies a
    * production gate ships THROUGH its own classifier so a silent
    * classifier regression is a visible row-set change, not a quiet
    * empty DLQ (the zero-silent-drops doctrine applied to the gate
    * itself): one row per ladder reason, one precedence probe (null ts
    * AND bad value must report null_ts), one clean negative control
    * that must NOT surface. Pure constants (ids in the 9·10⁹ range the
    * generator never emits), so the oracle reproduces them as VALUES;
    * the ts literal dispatches on the log's physical type (the
    * EventLog.tsUs posture — nanos-as-long and micros eras both). The
    * canary schema takes NULLABLE copies of the source fields: the
    * planted null ts/user_id/value/props rows must stay schema-legal
    * even if a future source schema tightens a field to non-nullable
    * (undefined behavior under codegen otherwise — r16 ADVICE). */
  def quarantineCanaries(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = raw.sparkSession
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val schema = StructType(cols.map { n =>
      val f = raw.schema(n)
      StructField(f.name, f.dataType, nullable = true)
    })
    val t: Any = raw.schema("ts").dataType match {
      case LongType => 1704067200000000000L // nanos-as-long era
      case _: TimestampNTZType => java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      case _ => java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    }
    val rows = Seq(
      Row(9000000001L, null, 1L, "canary", 1.0, "{}"),
      Row(9000000002L, t, null, "canary", 1.0, "{}"),
      Row(9000000003L, t, 1L, null, 1.0, "{}"),
      Row(9000000004L, t, 1L, "", 1.0, "{}"),
      Row(9000000005L, t, 1L, "canary", null, "{}"),
      Row(9000000006L, t, 1L, "canary", 0.001, "{}"),
      Row(9000000007L, t, 1L, "canary", 1.0e17, "{}"),
      Row(9000000008L, t, 1L, "canary", Double.NaN, "{}"),
      Row(9000000009L, t, 1L, "canary", 1.0, null),
      Row(9000000010L, t, 1L, "canary", 1.0, "{bad"),
      Row(9000000011L, null, 1L, "canary", 0.001, "{bad"),
      Row(9000000012L, t, 1L, "canary", 2.5, """{"k":1}"""),
      // a BARE JSON NULL payload — the input where engine and oracle
      // JSON validity predicates could plausibly diverge (r16 ADVICE
      // hypothesized Spark quarantines it; MEASURED r17: Spark's
      // get_json_object('null','$') returns the STRING 'null', not SQL
      // NULL, and DuckDB json_valid('null') is true — both engines
      // PASS the row). A second negative control pinning that
      // agreement: if either engine's JSON semantics drift, this row
      // surfaces on one side only and the hash gate catches it.
      Row(9000000013L, t, 1L, "canary", 1.0, "null"))
    raw.select(cols.map(col): _*).limit(0).unionByName(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema))
  }

  /** The registered shape: the real log PLUS the canary block through
    * one classifier pass. */
  def quarantineWithCanaries(raw: DataFrame): DataFrame =
    quarantine(raw.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .unionByName(quarantineCanaries(raw)))

  /** Hot-SEGMENT skew audit — the partition-health dashboard of a
    * store operator (one segment absorbing a space's traffic is the
    * scale hazard every keyed system watches for: it caps consumer
    * parallelism and pins one task at 100 TB): per space, the segment
    * population, total entries, the hottest segment with its count,
    * and the max/mean ratio as the ALL-INTEGER half-up milli
    * `(2·hot·n_segments·1000 + tot) div (2·tot)` — 1000 means
    * perfectly even, n_segments·1000 means one segment owns the space.
    * Two map-side-combinable hash aggs and nothing else; the hottest
    * segment is a min_by over (−count, segment) — deterministic tie
    * toward the smaller id, formulated as a window in the oracle (the
    * two-formulation strengthening). */
  /** Consumer-group REBALANCE planner — the assignment a scaling
    * coordinator hands to `workers` parallel consumers of a space
    * (streamkit serves segments to subscribers; when one consumer
    * can't keep up, the segment set must split across a group):
    * segments rank within their space by load desc (segment asc
    * tiebreak — deterministic), worker = (rank−1) mod workers. Sorted
    * round-robin striping is the SQL-expressible LPT approximation:
    * consecutive heavy segments land on different workers, and the
    * max-load excess over ideal is bounded by one segment's load per
    * stripe. The plan is a pure function of the settled log —
    * engine-reproducible, so the oracle derives the identical
    * assignment.
    *
    * Scale: one corpus agg to segment-sized rows, then the ONLY
    * window runs over the segment table partitioned by space —
    * segment-sized, never event-sized (the planner must order
    * segments by load; that sort is the operator's essential work,
    * and it never touches raw entries). */
  def rebalancePlan(named: DataFrame, workers: Int = 4): DataFrame = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    val seg = named.groupBy(col("space"), col("segment"))
      .agg(count(lit(1)).as("n_entries"))
    val w = Window.partitionBy("space")
      .orderBy(col("n_entries").desc, col("segment"))
    seg.withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("worker", (col("rnk") - 1L) % lit(workers.toLong))
  }

  /** CAPACITY-WEIGHTED rebalance planner (r23, the r17 verdict's
    * worker-presence thread): [[rebalancePlan]] stripes by load only —
    * real worker fleets are heterogeneous (the reference's WorkerInfo
    * metadata carries exactly this kind of capacity signal,
    * `pkg/api/worker_presence.go:43`), so the weighted planner expands
    * each worker into `capacity` SLOTS (demo capacity = 1 + worker % 3
    * — a pure integer function of the worker id, so the oracle derives
    * the identical slot table; a real deployment feeds its inventory)
    * and stripes load-ranked segments round-robin over the slot
    * sequence ordered (slot_idx, worker): a worker with k slots
    * appears in k rounds and receives proportionally more segments,
    * while consecutive heavy segments still land on different workers
    * — the 12j LPT-ish property kept under weights. Deterministic pure
    * integers end to end. Scale: one corpus agg to segment-sized rows;
    * the segment window partitions by space; the slot window runs over
    * ≤ 3·workers rows. */
  def rebalanceCapacityPlan(named: DataFrame, workers: Int = 4): DataFrame = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    val spark = named.sparkSession
    val totalSlots = (0 until workers).map(w => 1L + w % 3).sum
    val slots = spark.range(0, workers).toDF("worker")
      .withColumn("capacity", lit(1L) + col("worker") % lit(3L))
      .select(col("worker"), col("capacity"),
        explode(expr("sequence(0L, capacity - 1)")).as("slot_idx"))
      .withColumn("slot_rank", row_number().over(
        Window.orderBy(col("slot_idx"), col("worker"))).cast("long"))
      .select(col("worker"), col("capacity"), col("slot_rank"))
    val w = Window.partitionBy("space")
      .orderBy(col("n_entries").desc, col("segment"))
    named.groupBy(col("space"), col("segment"))
      .agg(count(lit(1)).as("n_entries"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("slot_rank",
        (col("rnk") - 1L) % lit(totalSlots) + 1L)
      .join(broadcast(slots), Seq("slot_rank"))
      .select(col("space"), col("segment"), col("n_entries"), col("rnk"),
        col("worker"), col("capacity"))
  }

  /** Realized-imbalance accounting for [[rebalancePlan]] (the
    * lsh_bucket_audit discipline): per space, the worker population,
    * heaviest/lightest worker loads, and max-over-ideal as the
    * all-integer half-up milli (ideal = total/workers_used, so
    * imb = max·workers_used/total — 1000 is perfect balance). The
    * group is healthy while imb_milli stays near 1000; a hot segment
    * bigger than ideal shows up here BEFORE the consumer group pages.
    * Oracle embeds the plan derivation verbatim. */
  def rebalanceAudit(named: DataFrame, workers: Int = 4): DataFrame =
    rebalancePlan(named, workers)
      .groupBy(col("space"), col("worker"))
      .agg(count(lit(1)).as("segs"), sum(col("n_entries")).as("load"))
      .groupBy(col("space"))
      .agg(
        sum(col("segs")).as("n_segments"),
        sum(col("load")).as("n_entries"),
        count(lit(1)).as("workers_used"),
        max(col("load")).as("max_load"),
        min(col("load")).as("min_load"))
      .withColumn("imb_milli",
        expr("(2 * max_load * workers_used * 1000 + n_entries) div " +
          "(2 * n_entries)"))

  def segmentSkew(named: DataFrame): DataFrame =
    named.groupBy(col("space"), col("segment"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("space"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("c")).as("n_entries"),
        min_by(col("segment"),
          struct((-col("c")).as("negc"), col("segment")))
          .as("hot_segment"),
        max(col("c")).as("hot_entries"))
      .withColumn("skew_milli",
        expr("(2 * hot_entries * n_segments * 1000 + n_entries) div " +
          "(2 * n_entries)"))

  /** KEY-CHURN histogram (r20) — the update-frequency DISTRIBUTION
    * behind [[segmentSkew]]'s single hottest-key number: per space, how
    * many segments fall in each power-of-two events-per-segment class
    * (zero-padded labels so lexicographic order IS numeric order). The
    * compaction/snapshot policy input: a space dominated by
    * single-event segments wants TTL retention and no snapshots
    * (nothing ever supersedes), one dominated by 65+ segments wants
    * aggressive key compaction and snapshot cadence — `sk_compact_plan`
    * prices WHAT to compact, this prices WHETHER the space's shape
    * makes compaction worth running at all. ALL-integer; fixed 8-class
    * ladder (an exact CASE both engines evaluate identically — never a
    * float log2, whose exact-power boundaries round differently).
    * Scale: one map-side-combinable (space, segment) agg to
    * segment-sized rows, then one ≤ 8·|spaces| matrix agg. */
  def keyChurn(named: DataFrame): DataFrame =
    named.groupBy(col("space"), col("segment"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bucket",
        expr("CASE WHEN c = 1 THEN '001' WHEN c = 2 THEN '002' " +
          "WHEN c <= 4 THEN '003-004' WHEN c <= 8 THEN '005-008' " +
          "WHEN c <= 16 THEN '009-016' WHEN c <= 32 THEN '017-032' " +
          "WHEN c <= 64 THEN '033-064' ELSE '065+' END"))
      .groupBy(col("space"), col("bucket"))
      .agg(count(lit(1)).as("n_segments"), sum(col("c")).as("n_entries"))

  /** STALE-SEGMENT audit — the dead-aggregate / dormant-consumer
    * detector (a segment that stopped producing is a churned user, a
    * finished aggregate, or a wedged producer — either way the serving
    * layer wants the list priced): per space, segments whose LAST entry
    * predates the newest quarter of the space's own time range
    * (cutoff = tmax − (tmax−tmin) div 4 — exact integer µs, the
    * retentionAudit self-scaling posture, no wall-clock dependence so
    * the oracle derives the identical cutoff). Output per space:
    * segment population, stale count, and the integer half-up milli
    * share. One corpus agg to segment-sized rows (eagerly checkpointed
    * — it feeds the bounds re-agg AND the rollup, never a second
    * corpus scan), then everything is |segments|-sized. */
  def staleSegments(named: DataFrame): DataFrame = {
    val seg = named.groupBy(col("space"), col("segment"))
      .agg(min(col("ts_us")).as("first_ts"), max(col("ts_us")).as("last_ts"))
      .localCheckpoint(true)
    val bounds = seg.groupBy(col("space"))
      .agg(min(col("first_ts")).as("tmin"), max(col("last_ts")).as("tmax"))
    seg.join(broadcast(bounds), "space")
      .withColumn("stale",
        expr("CASE WHEN last_ts < tmax - ((tmax - tmin) div 4) " +
          "THEN 1 ELSE 0 END").cast("long"))
      .groupBy(col("space"))
      .agg(count(lit(1)).as("n_segments"), sum(col("stale")).as("n_stale"))
      .withColumn("stale_milli",
        expr("(2 * n_stale * 1000 + n_segments) div (2 * n_segments)"))
  }

  /** Produce-contract audit (`pkg/eskit/store.go:79-104`): per segment,
    * verify the sequence stream is exactly 1..N with no gaps or
    * duplicates — the batch dual of ErrSequenceMismatch detection. */
  def produceValidate(entries: DataFrame): DataFrame =
    entries.groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n_entries"),
        min(col("sequence")).as("min_sequence"),
        max(col("sequence")).as("max_sequence"),
        countDistinct(col("sequence")).as("n_distinct"))
      .withColumn("contiguous",
        col("min_sequence") === 1L &&
          col("max_sequence") === col("n_entries"))
      .withColumn("no_duplicates", col("n_distinct") === col("n_entries"))

  /** Batch ordinal of a sequence: the single definition of which entries
    * belong to one produce batch/transaction — shared by [[trxRollup]]
    * and the persisted-id path (EventLogWriter.assignTrx) so the two trx
    * views can never disagree about batch boundaries. */
  def trxNumber(batchSize: Int): Column =
    expr(s"(sequence - 1) div $batchSize").cast("long")

  /** TRX rollup (`pkg/api/messages.go:249`, `internal/txn`): entries are
    * produced in batches; each batch carries transaction metadata used
    * for recovery. Model: trx = consecutive chunks of `batchSize`
    * sequences per segment; audit each transaction's completeness. */
  def trxRollup(entries: DataFrame, batchSize: Int): DataFrame =
    entries
      .withColumn("trx_number", trxNumber(batchSize))
      .groupBy(col("space"), col("segment"), col("trx_number"))
      .agg(
        count(lit(1)).as("n_entries"),
        min(col("sequence")).as("min_sequence"),
        max(col("sequence")).as("max_sequence"),
        graft.sources.EventLog.sumValueExact.as("sum_value"))
      .withColumn("complete",
        col("max_sequence") - col("min_sequence") + 1 === col("n_entries"))

  /** Consume-side idempotency (`docs/limitations.md` at-least-once
    * contract: "handlers must be idempotent or dedupe using
    * Entry.Sequence"): collapse redelivered entries to one row per
    * (space, segment, sequence), keeping the first-read payload via
    * min_by on arrival order. */
  def consumeDedup(entries: DataFrame): DataFrame =
    entries
      .groupBy(col("space"), col("segment"), col("sequence"))
      .agg(
        min_by(col("ts_us"), col("event_id")).as("ts_us"),
        min_by(col("value"), col("event_id")).as("value"),
        min_by(col("payload"), col("event_id")).as("payload"))

  /** Space-watermark audit (`pkg/server/space_watermarks.go`): in arrival
    * order (event_id), an entry is late if its event time is behind the
    * space's high watermark by more than `toleranceUs`. Batch dual of the
    * reference's in-flight low-watermark tracking / Structured
    * Streaming's watermark semantics.
    *
    * Scale: the running prefix-max is two-phase so no single task ever
    * sorts a whole space (with few spaces a plain
    * `Window.partitionBy(space)` funnels each space's entire log through
    * ONE task). Phase 1 buckets arrival order into chunks of `chunkSize`
    * event_ids and computes per-chunk max in a map-side-combinable hash
    * agg; the prefix max OVER CHUNKS then runs on the tiny
    * (space × #chunks) table; phase 2 finishes the per-row prefix max
    * locally inside each chunk — a window partitioned by (space, chunk),
    * which parallelizes across chunks. Same answer as the one-window
    * formulation (the oracle still uses it), no single-task scan. */
  def watermarkAudit(named: DataFrame, toleranceUs: Long,
      chunkSize: Long = 4096L): DataFrame = {
    val chunked = named
      .select(col("space"), col("ts_us"), col("event_id"))
      .withColumn("chunk", expr(s"event_id div $chunkSize"))
    val chunkMax = chunked
      .groupBy(col("space"), col("chunk"))
      .agg(max(col("ts_us")).as("chunk_max"))
    // prefix max over earlier chunks: runs on #chunks rows, not #entries
    // (size the chunk so this table stays ~1e5–1e6 rows at 100 TB)
    val wChunks = Window.partitionBy("space").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMax = chunkMax
      .withColumn("prev_max", max(col("chunk_max")).over(wChunks))
      .select(col("space").as("p_space"), col("chunk").as("p_chunk"),
        col("prev_max"))
    // local prefix max inside each chunk — parallel across chunks
    val wLocal = Window.partitionBy("space", "chunk").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    chunked
      .join(prevMax, col("space") === col("p_space") &&
        col("chunk") === col("p_chunk"))
      .withColumn("local_max", max(col("ts_us")).over(wLocal))
      // greatest() skips nulls: first chunk has null prev_max, first row
      // of a chunk has null local_max; both null (global first row) → no
      // watermark yet
      .withColumn("hwm_us", greatest(col("prev_max"), col("local_max")))
      .withColumn("late",
        col("hwm_us").isNotNull &&
          col("ts_us") < col("hwm_us") - toleranceUs)
      .withColumn("lateness_us",
        when(col("late"), col("hwm_us") - col("ts_us")).otherwise(0L))
      .groupBy(col("space"))
      .agg(
        count(lit(1)).as("n_entries"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max(col("lateness_us")).as("max_lateness_us"))
  }

  /** Consumer-group LAG monitor — the operational query every deployment
    * of an offset-cursor log (ConsumeSpace's resumable
    * `(ts, segment, sequence)` cursor, `api/messages.go:146-159`) runs
    * continuously: per (consumer group, space), how many entries sit
    * strictly after the group's committed cursor and how far behind the
    * head it is in event time. Demo cursors are SYNTHESIZED as pure
    * integer functions of each space's time bounds (group g of
    * `nGroups` committed at tmin + (tmax−tmin)·g div (nGroups+1) —
    * multiply before divide, the shared-IEEE-chain discipline, though
    * here everything stays in exact BIGINT), so the oracle derives the
    * identical cursors; a real deployment feeds its committed-offset
    * table as `cursors` through [[consumerLagFrom]]. Shuffles: one
    * per-space bounds agg, then the fact stream meets the tiny
    * (groups × spaces) cursor table in a BROADCAST join feeding one
    * map-side-combinable conditional count — the fact table never
    * shuffles on anything but the (grp, space) agg key. */
  def consumerLag(named: DataFrame, nGroups: Int = 3): DataFrame =
    consumerLagFrom(named, consumerCursors(named, nGroups))

  /** The synthesized committed-cursor table (grp, space, cursor_ts_us,
    * tmax) — exposed so the streaming dual can freeze it as its serving
    * artifact. */
  def consumerCursors(named: DataFrame, nGroups: Int = 3): DataFrame = {
    require(nGroups >= 1, s"bad nGroups=$nGroups")
    val spark = named.sparkSession
    val bounds = named.groupBy(col("space"))
      .agg(min(col("ts_us")).as("tmin"), max(col("ts_us")).as("tmax"))
    bounds.crossJoin(spark.range(1, nGroups + 1).toDF("grp"))
      .select(col("grp"), col("space"),
        (col("tmin") + expr(s"(tmax - tmin) * grp div ${nGroups + 1}"))
          .as("cursor_ts_us"),
        col("tmax"))
  }

  /** Retention/TTL planning audit — the sizing pass run before an
    * expiry job (the read-side companion of `EventLogWriter.compact`):
    * per space, the entry count and payload byte mass that a
    * TTL-at-the-cutoff policy would expire vs keep, plus the span
    * actually covered. The demo cutoff is an exact-BIGINT quantile of
    * each space's own time range (keep the newest quarter:
    * tmin + (tmax−tmin)·keepNum div keepDen — multiply before divide),
    * so the oracle derives it identically; a real deployment passes a
    * wall-clock cutoff per space. One bounds agg + one
    * map-side-combinable conditional rollup — two linear passes, no
    * joins wider than the #spaces bounds broadcast. */
  def retentionAudit(named: DataFrame, keepNum: Int = 3,
      keepDen: Int = 4): DataFrame = {
    require(keepDen >= 1 && keepNum >= 0 && keepNum <= keepDen,
      s"bad keep fraction $keepNum/$keepDen")
    val bounds = named.groupBy(col("space"))
      .agg(min(col("ts_us")).as("tmin"), max(col("ts_us")).as("tmax"))
      .select(col("space"),
        (col("tmin") + expr(s"(tmax - tmin) * $keepNum div $keepDen"))
          .as("cutoff_ts_us"))
    named.select(col("space"), col("ts_us"),
        length(col("payload")).cast("long").as("pbytes"))
      .join(broadcast(bounds), Seq("space"))
      .groupBy(col("space"), col("cutoff_ts_us"))
      .agg(
        sum(when(col("ts_us") < col("cutoff_ts_us"), 1L).otherwise(0L))
          .as("n_expired"),
        sum(when(col("ts_us") < col("cutoff_ts_us"), col("pbytes"))
          .otherwise(0L)).as("bytes_expired"),
        sum(when(col("ts_us") >= col("cutoff_ts_us"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("ts_us") >= col("cutoff_ts_us"), col("pbytes"))
          .otherwise(0L)).as("bytes_kept"))
      .select(col("space"), col("cutoff_ts_us"), col("n_expired"),
        col("bytes_expired"), col("n_kept"), col("bytes_kept"))
  }

  /** KEY-COMPACTION planner (r18) — the "would log compaction help this
    * space" sizing view next to [[retentionAudit]]'s TTL one: under
    * keep-latest-per-key compaction (the classic compacted-topic
    * contract; key = segment, order = the per-segment `sequence`
    * ordinal, so the survivor is exact and deterministic), per space —
    * entries and payload bytes today, the live set after compaction
    * (one entry per segment), the exact reclaim, and the half-up
    * integer reclaim share. A space with high `reclaim_milli` is
    * state-like (compaction pays for itself); near zero it is
    * event-like (compaction reads everything to reclaim nothing).
    *
    * Scale: one (space, segment) hash agg (map-side combinable; the
    * last-payload pick is max_by over the per-segment sequence — never
    * a window over the log), then a space-sized rollup. All-integer
    * outputs. */
  def compactPlan(entries: DataFrame): DataFrame =
    entries
      .select(col("space"), col("segment"), col("sequence"),
        length(col("payload")).cast("long").as("pbytes"))
      .groupBy(col("space"), col("segment"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("pbytes")).as("bytes_sum"),
        max_by(col("pbytes"), col("sequence")).as("last_pbytes"))
      .groupBy(col("space"))
      .agg(
        sum(col("n")).as("n_entries"),
        count(lit(1)).as("n_segments"),
        sum(col("bytes_sum")).as("bytes_total"),
        sum(col("last_pbytes")).as("bytes_live"))
      .select(col("space"), col("n_entries"), col("n_segments"),
        col("bytes_total"), col("bytes_live"),
        (col("bytes_total") - col("bytes_live")).as("bytes_reclaimed"),
        expr("""CASE WHEN bytes_total > 0 THEN
                  (2 * (bytes_total - bytes_live) * 1000 + bytes_total)
                    div (2 * bytes_total)
                END""").as("reclaim_milli"))

  /** [[consumerLag]] over an explicit committed-cursor table
    * (grp, space, cursor_ts_us, tmax-per-space). */
  def consumerLagFrom(named: DataFrame, cursors: DataFrame): DataFrame =
    named.select(col("space"), col("ts_us"))
      .join(broadcast(cursors), Seq("space"))
      .groupBy(col("grp"), col("space"), col("cursor_ts_us"), col("tmax"))
      .agg(sum(when(col("ts_us") > col("cursor_ts_us"), 1L).otherwise(0L))
        .as("n_behind"))
      .select(col("grp"), col("space"), col("cursor_ts_us"),
        col("n_behind"), (col("tmax") - col("cursor_ts_us"))
          .as("time_lag_us"))

  /** WORKER-PRESENCE inventory + heartbeat-staleness audit — the
    * analytics dual of the reference's node-local presence map
    * (`pkg/api/worker_presence.go:43` WorkerInfo/WorkerInventory;
    * clamp ladder :136-151, TTL :161-167: renew interval =
    * 30 s default when the declared heartbeat interval is ≤ 0, else
    * clamped to [1, 300]; TTL = max(3·renew, 30 s)) run over a
    * presence LOG instead of in-memory state — the sk_stale_segments
    * posture: a store operator replays renewals and prices which
    * workers the server would evict as of the log's horizon. Workers
    * are the (space, segment) producers; renewals are their entries;
    * each worker's DECLARED heartbeat interval is a pure integer
    * function of its key ((segment % 9)·60 − 60 ∈ {−60, 0, …, 420} —
    * exercises the observer default, the in-range band, and the 300 s
    * clamp), so the oracle derives the identical ladder; a real
    * deployment feeds its presence log. Output: one row per worker
    * with the clamped interval, TTL, last renewal, age at the space
    * horizon, and the eviction verdict — all exact integers. Scale:
    * one (space, segment) hash agg (map-side combinable) + a
    * space-sized bounds broadcast. */
  def workerPresence(named: DataFrame): DataFrame = {
    val horizon = named.groupBy(col("space"))
      .agg(max(col("ts_us")).as("as_of_us"))
    named.select(col("space"), col("segment"), col("ts_us"))
      .groupBy(col("space"), col("segment"))
      .agg(count(lit(1)).as("n_renewals"),
        max(col("ts_us")).as("last_seen_us"))
      .join(broadcast(horizon), Seq("space"))
      .withColumn("hb_raw_s",
        (col("segment").cast("long") % lit(9L)) * lit(60L) - lit(60L))
      // the reference clamp ladder verbatim: ≤ 0 → observer → the 30 s
      // default renew period; else clamp to [1, 300]
      .withColumn("renew_s", expr(
        "CASE WHEN hb_raw_s <= 0 THEN 30 " +
          "ELSE least(greatest(hb_raw_s, 1), 300) END"))
      .withColumn("ttl_s", greatest(col("renew_s") * lit(3L), lit(30L)))
      .withColumn("age_us", col("as_of_us") - col("last_seen_us"))
      .withColumn("is_stale",
        (col("age_us") > col("ttl_s") * lit(1000000L)).cast("int"))
      .select(col("space"), col("segment").as("worker"),
        col("n_renewals"), col("hb_raw_s"), col("renew_s"), col("ttl_s"),
        col("last_seen_us"), col("age_us"), col("is_stale"))
  }

  /** LEASE fencing/overlap audit — the split-brain detector over an
    * acquisition log, the analytics dual of the reference's in-memory
    * single-writer lease store (`internal/lease/lease.go:90` Acquire
    * with TTL: one holder per key per instant is the WHOLE contract):
    * two holders whose granted intervals overlap on one key mean both
    * believed they held it — the exact state the lease exists to
    * prevent, visible only in a log audit. Grants are synthesized as
    * pure integer functions of the entry key (the consumerCursors
    * posture): key = (space, segment), holder cycles h0/h1/h2 by the
    * entry's sequence, interval = [ts, ts + ttl) with ttl self-scaled
    * to the KEY's own mean renewal gap (((kmax−kmin)·(1 + seq % 4))
    * div (2·kn) ∈ [½, 2] mean gaps — a natural mix of clean handoffs
    * and overlaps at any corpus scale; multiply before divide); a real
    * deployment feeds its grant log.
    *
    * The detector is EXACT, not adjacent-pair: (1) per (key, holder),
    * overlapping own grants merge into EPISODES (renew/re-acquire
    * chains — the reference lets a holder re-acquire freely, so
    * same-holder overlap is legal), via the running-max island scan;
    * episodes of one holder are strictly disjoint BY CONSTRUCTION.
    * (2) per key in episode-start order, an episode whose start
    * precedes the running max end of PRIOR episodes overlaps one of
    * them — which must belong to a DIFFERENT holder (same-holder
    * episodes are disjoint), i.e. split-brain. Any cross-holder
    * overlap is caught: the earlier episode's end enters the running
    * max before the later episode is scanned. Output: one row per key
    * with grant/holder/episode populations and the split-brain episode
    * count — all exact integers. Scale: windows partition by key (and
    * key×holder), never the log; parallelism = #keys. */
  def leaseAudit(entries: DataFrame): DataFrame = {
    val kb = entries.groupBy(col("space"), col("segment"))
      .agg(min(col("ts_us")).as("kmin"), max(col("ts_us")).as("kmax"),
        count(lit(1)).as("kn"))
    val grants = entries
      .select(col("space"), col("segment"), col("ts_us"), col("sequence"))
      .join(kb, Seq("space", "segment"))
      .withColumn("holder",
        concat(lit("h"), (col("sequence") % lit(3L)).cast("string")))
      .withColumn("ttl_us",
        expr("((kmax - kmin) * (1 + sequence % 4)) div (2 * kn)"))
      .withColumn("end_us", col("ts_us") + col("ttl_us"))
    val hw = Window.partitionBy("space", "segment", "holder")
      .orderBy("ts_us", "sequence")
    val islands = grants
      .withColumn("pmax", max(col("end_us")).over(
        hw.rowsBetween(Window.unboundedPreceding, -1)))
      // [s, e) intervals: a grant starts a NEW episode when every prior
      // own grant ended at or before its start
      .withColumn("new_ep",
        when(col("pmax").isNull || col("pmax") <= col("ts_us"), 1L)
          .otherwise(0L))
      .withColumn("ep", sum(col("new_ep")).over(
        hw.rowsBetween(Window.unboundedPreceding, 0)))
    val episodes = islands
      .groupBy(col("space"), col("segment"), col("holder"), col("ep"))
      .agg(min(col("ts_us")).as("start_us"), max(col("end_us")).as("end_us"))
    val kw = Window.partitionBy("space", "segment")
      .orderBy(col("start_us"), col("holder"), col("ep"))
    val flagged = episodes
      .withColumn("prev_max_end", max(col("end_us")).over(
        kw.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("split_brain",
        when(col("prev_max_end").isNotNull &&
          col("prev_max_end") > col("start_us"), 1L).otherwise(0L))
    flagged.groupBy(col("space"), col("segment"))
      .agg(countDistinct(col("holder")).as("n_holders"),
        count(lit(1)).as("n_episodes"),
        sum(col("split_brain")).as("n_split_brain"))
      .join(kb.select(col("space"), col("segment"), col("kn").as("n_grants")),
        Seq("space", "segment"))
      .select(col("space"), col("segment").as("lease_key"),
        col("n_grants"), col("n_holders"), col("n_episodes"),
        col("n_split_brain"))
  }
}
