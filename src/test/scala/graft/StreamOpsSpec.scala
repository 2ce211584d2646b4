package graft

import org.apache.spark.sql.functions._
import graft.sources.EventLog
import graft.operators.StreamOps

class StreamOpsSpec extends SparkSpec {

  lazy val entries = EventLog.entries(spark, SF).cache()

  test("consumeSegment returns strictly increasing contiguous sequences") {
    val rows = StreamOps.consumeSegment(entries, "click", "1")
      .select("sequence").collect().map(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.toSeq == (1L to rows.length).toSeq)
  }

  test("consumeSegment honors bounds and limit") {
    val rows = StreamOps.consumeSegment(entries, "click", "1",
      minSeq = Some(2), maxSeq = Some(10), limit = Some(3))
      .select("sequence").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(2L, 3L, 4L))
  }

  test("consumeSpace is ordered by (ts_us, segment, sequence)") {
    val rows = StreamOps.consumeSpace(entries, "view", limit = Some(200))
      .select("ts_us", "segment", "sequence").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.toSeq == rows.toSeq.sorted)
  }

  test("offset cursor resumes strictly after the anchor, no overlap") {
    val full = StreamOps.consumeSpace(entries, "view")
      .select("ts_us", "segment", "sequence").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val anchor = full(4)
    val resumed = StreamOps.consumeSpaceFromOffset(entries, "view",
      anchorSegment = anchor._2, anchorSequence = anchor._3)
      .select("ts_us", "segment", "sequence").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(resumed == full.drop(5))
  }

  test("consumeMulti with an unresolvable anchor reads that space from the start") {
    val full = StreamOps.consumeMulti(entries,
      offsets = Map("click" -> ("1", 0L)))
    val expected = entries.filter(col("space") === "click").count()
    assert(full.count() == expected)
    // resolvable anchor still cuts the stream
    val partial = StreamOps.consumeMulti(entries,
      offsets = Map("click" -> ("1", 5L)))
    assert(partial.count() < expected && partial.count() > 0)
  }

  test("peek returns the max-sequence entry per segment") {
    val peeked = StreamOps.peek(entries, "error")
      .select("segment", "sequence").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = entries.filter(col("space") === "error")
      .groupBy("segment").agg(max("sequence").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(peeked == expected)
  }

  test("produceValidate reports every segment contiguous and dup-free") {
    val bad = StreamOps.produceValidate(entries)
      .filter(!col("contiguous") || !col("no_duplicates")).count()
    assert(bad == 0)
  }

  test("segmentStatus first/last timestamps bracket the segment") {
    val st = StreamOps.segmentStatus(EventLog.named(spark, SF))
      .filter(col("space") === "signup" && col("segment") === "3")
      .collect().head
    assert(st.getAs[Long]("first_ts_us") <= st.getAs[Long]("last_ts_us"))
    assert(st.getAs[Long]("first_sequence") == 1L)
  }

  test("trxRollup batches are complete and sized <= batch") {
    val bad = StreamOps.trxRollup(entries, 10)
      .filter(!col("complete") || col("n_entries") > 10).count()
    assert(bad == 0)
  }

  test("chunked watermark audit equals the one-window formulation at any chunk size") {
    val named = EventLog.named(spark, SF)
    val tol = 300000000L
    def audit(chunk: Long) =
      StreamOps.watermarkAudit(named, tol, chunkSize = chunk)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // chunkSize larger than any event_id degenerates to the single-window
    // semantics (one chunk per space); small chunks exercise the
    // cross-chunk prefix handoff
    val coarse = audit(Long.MaxValue)
    assert(audit(4096L) == coarse)
    assert(audit(7L) == coarse)
  }

  test("funnel counts strictly-after progressions only, monotone by step") {
    import spark.implicits._
    import graft.operators.Windows
    // u1 completes view→click→purchase in order; u2 clicks BEFORE its
    // first view (click must not count); u3 stops after click; u4 has a
    // pre-view click but a second click after the view (counts)
    val named = Seq(
      ("view", "u1", 10L), ("click", "u1", 20L), ("purchase", "u1", 30L),
      ("click", "u2", 5L), ("view", "u2", 10L), ("purchase", "u2", 20L),
      ("view", "u3", 10L), ("click", "u3", 15L),
      ("click", "u4", 1L), ("view", "u4", 10L), ("click", "u4", 12L),
    ).toDF("space", "segment", "ts_us")
    val got = Windows.funnel(named, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // step1: all four viewed; step2: u1, u3, u4 (u2's click precedes its
    // view; u2's purchase can't count without a qualifying click);
    // step3: u1 only
    assert(got == Map(1L -> (("view", 4L)), 2L -> (("click", 3L)),
      3L -> (("purchase", 1L))))
    // funnel counts can never grow with depth
    assert(got(1L)._2 >= got(2L)._2 && got(2L)._2 >= got(3L)._2)
    // the rates view on the same plant: 4 → 3 → 1 segments gives
    // step-over-step 1000/750/333 and overall 1000/750/250, all via
    // the integer half-up milli
    val rates = Windows.funnelRates(named, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rates == Map(
      1L -> ((4L, 1000L, 1000L)),
      2L -> ((3L, 750L, 750L)),
      3L -> ((1L, 333L, 250L))), rates.toString)
  }

  test("eventTransitions: per-segment adjacency, all-integer half-up shares") {
    import spark.implicits._
    import graft.operators.Windows
    // u1 walks a→b→a→c with a ts tie at 20 broken by event_id (b at id 2
    // precedes a at id 3); u2 walks a→c. Edges: from a → {b:1, c:2}
    // (tot 3), from b → {a:1} (tot 1).
    val named = Seq(
      ("a", "u1", 10L, 1L), ("b", "u1", 20L, 2L),
      ("a", "u1", 20L, 3L), ("c", "u1", 30L, 4L),
      ("a", "u2", 10L, 5L), ("c", "u2", 20L, 6L),
    ).toDF("space", "segment", "ts_us", "event_id")
    val got = Windows.eventTransitions(named).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // 1/3 → 333 (floor-half-up), 2/3 → 667 (the half-up direction),
    // 1/1 → 1000 — pure integer (2·n·1000 + tot) div (2·tot)
    assert(got == Map(
      ("a", "b") -> ((1L, 333L)),
      ("a", "c") -> ((2L, 667L)),
      ("b", "a") -> ((1L, 1000L))))
  }

  test("attribution: first/last touch with event_id tie-break; matrix " +
      "rolls up entry/exit pairs with integer milli mean length") {
    import spark.implicits._
    import graft.operators.Windows
    // u1 walks a→b/a(tie at 20, id order)→c; u2 is a single-touch c
    // (matrix diagonal); u3 has BOTH touches on a ts tie at 10 — the
    // unique event_id decides first = b (id 6), last = a (id 7)
    val named = Seq(
      ("a", "u1", 10L, 1L, 5.0), ("b", "u1", 20L, 2L, 1.5),
      ("a", "u1", 20L, 3L, 2.5), ("c", "u1", 30L, 4L, 0.25),
      ("c", "u2", 10L, 5L, 1.0),
      ("b", "u3", 10L, 6L, 2.0), ("a", "u3", 10L, 7L, 3.0),
    ).toDF("space", "segment", "ts_us", "event_id", "value")
    val got = Windows.attribution(named).collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    val u1 = got("u1")
    assert(u1.getAs[Long]("n_events") == 4L)
    assert(u1.getAs[Long]("n_spaces") == 3L)
    assert(u1.getAs[String]("first_space") == "a")
    assert(u1.getAs[Long]("first_ts_us") == 10L)
    assert(u1.getAs[Double]("first_value") == 5.0)
    assert(u1.getAs[String]("last_space") == "c")
    assert(u1.getAs[Double]("last_value") == 0.25)
    val u2 = got("u2")
    assert(u2.getAs[String]("first_space") == "c" &&
      u2.getAs[String]("last_space") == "c")
    val u3 = got("u3")
    assert(u3.getAs[String]("first_space") == "b", u3.toString)
    assert(u3.getAs[String]("last_space") == "a", u3.toString)
    val m = Windows.attributionMatrix(named).collect()
      .map(r => (r.getAs[String]("first_space"),
        r.getAs[String]("last_space")) ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_events"),
          r.getAs[Long]("mean_len_milli"))).toMap
    assert(m == Map(
      ("a", "c") -> ((1L, 4L, 4000L)),
      ("c", "c") -> ((1L, 1L, 1000L)),
      ("b", "a") -> ((1L, 2L, 2000L))))
  }

  test("transitionDrift: a rerouted edge flags in both directions, stable " +
      "edges and baseline-free spaces stay silent") {
    import spark.implicits._
    import graft.operators.Windows
    // old era (ts ≤ mid): u1 walks a,b,a,b → a→b×2, b→a×1; new era:
    // a,c,a,c → a→c×2, c→a×1, plus the boundary edge b→a arriving new
    val named = Seq(
      ("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L),
      ("a", 101L), ("c", 102L), ("a", 103L), ("c", 104L),
    ).zipWithIndex.map { case ((sp, ts), i) =>
      (sp, "u1", ts, (i + 1).toLong)
    }.toDF("space", "segment", "ts_us", "event_id")
    val got = Windows.transitionDrift(named).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // a→b collapsed (1000 → 0) and a→c appeared (0 → 1000); b→a is
    // stable (1/1 both eras); c→a has no old baseline (tot_old = 0) →
    // never flagged
    assert(got == Map(
      ("a", "b") -> ((2L, 0L, 2L, 2L, 1000L, 0L)),
      ("a", "c") -> ((0L, 2L, 2L, 2L, 0L, 1000L))), got.toString)
  }

  test("transitionDrift: the flag set is anti-monotone in tau") {
    import graft.operators.Windows
    val named = EventLog.named(spark, SF)
    def flagged(tau: Long) = Windows.transitionDrift(named, tau)
      .select("from_space", "to_space").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val f2 = flagged(2L); val f5 = flagged(5L); val f20 = flagged(20L)
    assert(f2.nonEmpty && f20.subsetOf(f5) && f5.subsetOf(f2))
    // the default threshold separates (neither everything nor nothing)
    assert(f5.size < f2.size)
  }

  test("attributionMatrix conserves segments and event mass from the " +
      "per-segment rows on the real log") {
    import graft.operators.Windows
    val named = graft.sources.EventLog.named(spark, SF)
    val attr = Windows.attribution(named).collect()
    val m = Windows.attributionMatrix(named).collect()
    assert(attr.nonEmpty && m.nonEmpty)
    assert(m.map(_.getAs[Long]("n_segments")).sum == attr.length.toLong)
    assert(m.map(_.getAs[Long]("n_events")).sum ==
      attr.map(_.getAs[Long]("n_events")).sum)
    // every segment's journey is bracketed: first ts <= last ts
    attr.foreach { r =>
      assert(r.getAs[Long]("first_ts_us") <= r.getAs[Long]("last_ts_us"))
      assert(r.getAs[Long]("n_spaces") >= 1L &&
        r.getAs[Long]("n_spaces") <= r.getAs[Long]("n_events"))
    }
  }

  test("valueDrift: a shifted value bin flags in both directions; " +
      "hostile values are fenced, not fatal") {
    import spark.implicits._
    import graft.operators.Windows
    // space a: old era all values in bin 1, new era all in bin 5 — both
    // bins must flag (share 1000 → 0 and 0 → 1000); space b: stable bin
    // 2 both eras — silent; one NaN and one Inf row must be fenced (the
    // ANSI bin cast would otherwise kill the job), not change counts
    val named = (
      (1L to 4L).map(i => ("a", s"u$i", i * 10L, i, 1.5)) ++
      (1L to 4L).map(i => ("a", s"u$i", 1000L + i * 10L, 100L + i, 5.5)) ++
      Seq(("b", "u1", 10L, 200L, 2.5), ("b", "u1", 1010L, 201L, 2.5),
        ("b", "u2", 20L, 202L, Double.NaN),
        ("b", "u2", 1020L, 203L, Double.PositiveInfinity))
    ).map { case (sp, sg, ts, id, v) => (sp, sg, ts, id.toLong, v) }
      .toDF("space", "segment", "ts_us", "event_id", "value")
    val got = Windows.valueDrift(named).collect()
      .map(r => (r.getAs[String]("space"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("share_old_milli"), r.getAs[Long]("share_new_milli")))
      .toMap
    assert(got == Map(
      ("a", 1L) -> ((1000L, 0L)),
      ("a", 5L) -> ((0L, 1000L))), got.toString)
  }

  test("conversionLatency: exact gap stats over the funnel's own " +
      "achievement times; zero-converter steps emit no row") {
    import spark.implicits._
    import graft.operators.Windows
    // the funnel-spec plant: step 2 converters are u1 (20−10=10),
    // u3 (15−10=5), u4 (12−10=2); step 3 converter is u1 (30−20=10).
    // u2's pre-view click must not contribute a (negative) gap.
    val named = Seq(
      ("view", "u1", 10L), ("click", "u1", 20L), ("purchase", "u1", 30L),
      ("click", "u2", 5L), ("view", "u2", 10L), ("purchase", "u2", 20L),
      ("view", "u3", 10L), ("click", "u3", 15L),
      ("click", "u4", 1L), ("view", "u4", 10L), ("click", "u4", 12L),
    ).toDF("space", "segment", "ts_us")
    val got = Windows.conversionLatency(named,
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step") ->
        ((r.getAs[Long]("n_converted"), r.getAs[Long]("sum_gap_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("mean_gap_us"))))
      .toMap
    // step 2: n=3, sum=17, max=10, mean=half-up(17/3)=6; step 3: 10s
    assert(got == Map(
      2L -> ((3L, 17L, 10L, 6L)),
      3L -> ((1L, 10L, 10L, 10L))), got.toString)
    // a funnel nobody completes emits rows only for reached steps
    val sparse = Seq(("view", "u1", 10L)).toDF("space", "segment", "ts_us")
    assert(Windows.conversionLatency(sparse,
      Seq("view", "click", "purchase")).collect().isEmpty)
  }

  test("diurnalDrift: a shifted daily peak flags in both directions; " +
      "a stable hour profile is silent") {
    import spark.implicits._
    import graft.operators.Windows
    val hourUs = 3600000000L
    val dayUs = 24L * hourUs
    // space a: old era all at hour 1, new era (10 days later) all at
    // hour 5 — both hours must flag (share 1000 → 0 and 0 → 1000);
    // space b: hour 2 in both eras — silent
    val named = (
      (1L to 4L).map(i => ("a", "s", 1L * hourUs + i, i)) ++
      (1L to 4L).map(i => ("a", "s", 10L * dayUs + 5L * hourUs + i, 100L + i)) ++
      Seq(("b", "s", 2L * hourUs + 1L, 200L),
        ("b", "s", 10L * dayUs + 2L * hourUs + 1L, 201L))
    ).toDF("space", "segment", "ts_us", "event_id")
      .withColumn("value", lit(1.0))
    val got = Windows.diurnalDrift(named).collect()
      .map(r => (r.getAs[String]("space"), r.getAs[Long]("hour")) ->
        (r.getAs[Long]("share_old_milli"), r.getAs[Long]("share_new_milli")))
      .toMap
    assert(got == Map(
      ("a", 1L) -> ((1000L, 0L)),
      ("a", 5L) -> ((0L, 1000L))), got.toString)
  }

  test("rebalancePlan: exactly-once assignment, round-robin counts, " +
      "heaviest segments spread first; audit consistent with the plan") {
    val named = EventLog.named(spark, SF)
    val plan = StreamOps.rebalancePlan(named, workers = 4).collect()
    val bySpace = plan.groupBy(_.getAs[String]("space"))
    bySpace.foreach { case (sp, rows) =>
      // every segment assigned exactly once
      assert(rows.map(_.getAs[String]("segment")).distinct.length ==
        rows.length, sp)
      // stripe arithmetic: worker = (rnk-1) % 4, ranks are 1..n
      val rnks = rows.map(_.getAs[Long]("rnk")).sorted
      assert(rnks.toSeq == (1L to rows.length.toLong), sp)
      rows.foreach(r => assert(r.getAs[Long]("worker") ==
        (r.getAs[Long]("rnk") - 1L) % 4L, sp))
      // round-robin: per-worker segment counts differ by at most one
      val cnts = rows.groupBy(_.getAs[Long]("worker")).values
        .map(_.length).toSeq
      assert(cnts.max - cnts.min <= 1, s"$sp $cnts")
      // the top-4 heaviest segments land on 4 distinct workers
      val top = rows.sortBy(r =>
        (-r.getAs[Long]("n_entries"), r.getAs[String]("segment"))).take(4)
      assert(top.map(_.getAs[Long]("worker")).distinct.length ==
        math.min(4, rows.length), sp)
    }
    // audit recomputed from the plan rows exactly
    val audit = StreamOps.rebalanceAudit(named, workers = 4).collect()
      .map(r => r.getAs[String]("space") -> r).toMap
    bySpace.foreach { case (sp, rows) =>
      val loads = rows.groupBy(_.getAs[Long]("worker"))
        .map { case (_, g) => g.map(_.getAs[Long]("n_entries")).sum }
      val a = audit(sp)
      assert(a.getAs[Long]("n_segments") == rows.length.toLong)
      assert(a.getAs[Long]("workers_used") == loads.size.toLong)
      assert(a.getAs[Long]("max_load") == loads.max)
      assert(a.getAs[Long]("min_load") == loads.min)
      val tot = loads.sum
      assert(a.getAs[Long]("imb_milli") ==
        (2L * loads.max * loads.size * 1000L + tot) / (2L * tot))
      // striping keeps the realized imbalance sane: the heaviest
      // worker carries less than two ideal shares on this log
      assert(a.getAs[Long]("imb_milli") < 2000L, s"$sp $a")
    }
  }

  test("rebalanceCapacityPlan: exactly-once, proportional slot counts, capacity ladder") {
    val named = EventLog.named(spark, SF)
    // workers = 4 → capacities 1,2,3,1 → 7 slots
    val plan = StreamOps.rebalanceCapacityPlan(named, workers = 4)
      .collect()
    val caps = Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L)
    plan.foreach(r => assert(
      r.getAs[Long]("capacity") == caps(r.getAs[Long]("worker")), r))
    plan.groupBy(_.getAs[String]("space")).foreach { case (sp, rows) =>
      // every segment assigned exactly once; ranks are 1..n
      assert(rows.map(_.getAs[String]("segment")).distinct.length ==
        rows.length, sp)
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ==
        (1L to rows.length.toLong), sp)
      // proportionality is EXACT under slot striping: slot s of the
      // 7-slot cycle receives a per-slot count within [floor(n/7),
      // ceil(n/7)], so worker w's count lies in cap_w·[floor, ceil]
      val n = rows.length.toLong
      val byWorker = rows.groupBy(_.getAs[Long]("worker"))
        .map { case (w, g) => w -> g.length.toLong }
      byWorker.foreach { case (w, c) =>
        assert(c >= caps(w) * (n / 7L) && c <= caps(w) * ((n + 6L) / 7L),
          s"$sp worker $w got $c of $n")
      }
      // the 7 heaviest segments fill one full slot cycle: the
      // capacity-3 worker receives exactly 3 of them
      if (n >= 7L) {
        val top = rows.filter(_.getAs[Long]("rnk") <= 7L)
        assert(top.count(_.getAs[Long]("worker") == 2L) == 3, sp)
      }
    }
  }

  test("interarrivalStats: within-segment gaps only, integer half-up mean") {
    import spark.implicits._
    import graft.operators.Windows
    // u1 gaps in x: 10, 5; u2 gap in x: 2 → n=3, sum=17, max=10,
    // mean = (34+3) div 6 = 6 (17/3 = 5.67 half-up); cross-segment
    // interleaving (u2 at ts 12 between u1's events) must not create
    // a gap
    val named = Seq(
      ("x", "u1", 10L, 1L), ("x", "u2", 12L, 2L), ("x", "u1", 20L, 3L),
      ("x", "u1", 25L, 4L), ("x", "u2", 14L, 5L),
    ).toDF("space", "segment", "ts_us", "event_id")
    val got = Windows.interarrivalStats(named).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map("x" -> ((3L, 17L, 10L, 6L))), got.toString)
  }

  test("staleSegments: quarter-range cutoff, integer milli share") {
    import spark.implicits._
    // x spans ts 0..100 → cutoff 75: u2 (last 10) is stale, u1 is not
    val named = Seq(
      ("x", "u1", 0L, 1L), ("x", "u1", 100L, 2L), ("x", "u2", 10L, 3L),
    ).toDF("space", "segment", "ts_us", "event_id")
    val got = StreamOps.staleSegments(named).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("x" -> ((2L, 1L, 500L))), got.toString)
  }

  test("sessionStats: integer mean duration and events-per-session") {
    import spark.implicits._
    import graft.operators.Windows
    // u1 in x: session [0,10] (2 events) then, past the 30µs gap, a
    // singleton at 100 → 2 sessions, 3 events, mean len 5, 1500 milli
    val entries = Seq(
      ("x", "u1", 0L, 1L, 1.0), ("x", "u1", 10L, 2L, 1.0),
      ("x", "u1", 100L, 3L, 1.0),
    ).toDF("space", "segment", "ts_us", "event_id", "value")
    val got = Windows.sessionStats(entries, gapUs = 30L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == Map("x" -> ((2L, 3L, 5L, 1500L))), got.toString)
  }

  test("segmentSkew: hot segment with deterministic tie, integer milli ratio") {
    import spark.implicits._
    // x: u1 owns 3 of 4 entries → skew 3·2·1000/4 = 1500;
    // y: exact 2/2 tie → hot breaks to the smaller id, skew 1000
    val named = Seq(
      ("x", "u1"), ("x", "u1"), ("x", "u1"), ("x", "u2"),
      ("y", "u2"), ("y", "u2"), ("y", "u1"), ("y", "u1"),
    ).zipWithIndex.map { case ((sp, sg), i) => (sp, sg, i.toLong, i.toLong) }
      .toDF("space", "segment", "ts_us", "event_id")
    val got = StreamOps.segmentSkew(named).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      "x" -> ((2L, 4L, "u1", 3L, 1500L)),
      "y" -> ((2L, 4L, "u1", 2L, 1000L))), got.toString)
  }

  test("journeyEntropy: a 50/50 hub reads ln2 on the micro grid, " +
      "deterministic hops read zero") {
    import spark.implicits._
    import graft.operators.Windows
    // one walk a,b,a,c,a,b,a,c → from a: {b:2, c:2} (the hub), from b:
    // {a:2}, from c: {a:1} (the final c has no outgoing edge)
    val seqSpaces = Seq("a", "b", "a", "c", "a", "b", "a", "c")
    val named = seqSpaces.zipWithIndex.map { case (sp, i) =>
      (sp, "u1", (i + 1).toLong, (i + 1).toLong)
    }.toDF("space", "segment", "ts_us", "event_id")
    val got = Windows.journeyEntropy(named).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // ln snapped BEFORE composing (r16): ln_micro(0.5) =
    // round(ln 0.5 · 1e6) = −693147; H = −(2·−693147 + 2·−693147) /
    // (4·10⁶) = 0.693147 — the snapped-ln form lands ON ln 2's own
    // 1e-6 grid point (the old composed-term snap read 0.693148)
    assert(got == Map(
      "a" -> ((2L, 4L, 0.693147)),
      "b" -> ((1L, 2L, 0.0)),
      "c" -> ((1L, 1L, 0.0))), got.toString)
  }

  test("stateDiff and topMovers: change-only rows, deterministic tie-break cut") {
    import spark.implicits._
    import graft.operators.EventSourcing
    // s1 changes by +5 after t1; s2 by +5 too (tie); s3 only before t1
    // (must be absent); s4 appears only after t1
    val e = Seq(
      ("p", "s1", 1L, 10L, 1.0), ("p", "s1", 2L, 30L, 5.0),
      ("p", "s2", 1L, 11L, 2.0), ("p", "s2", 2L, 31L, 5.0),
      ("p", "s3", 1L, 12L, 3.0),
      ("p", "s4", 1L, 32L, 4.0),
    ).toDF("space", "segment", "sequence", "ts_us", "value")
    val diff = EventSourcing.stateDiff(e, "p", 20L, 40L)
      .collect().map(r => r.getAs[String]("segment") ->
        (r.getAs[Long]("n_new_events"), r.getAs[Double]("balance_before"),
          r.getAs[Double]("balance_after"))).toMap
    assert(diff.keySet == Set("s1", "s2", "s4"))
    assert(diff("s1") == ((1L, 1.0, 6.0)) && diff("s4") == ((1L, 0.0, 4.0)))
    // equal abs_change 5.0 for s1/s2 → the k=1 cut must take s1 (tie →
    // segment asc), never depend on partitioning
    val top = EventSourcing.topMovers(e, "p", 20L, 40L, k = 1).collect()
    assert(top.length == 1 && top.head.getString(0) == "s1")
  }

  test("cohortRetention assigns first-day cohorts and counts distinct-day offsets") {
    import spark.implicits._
    import graft.operators.Windows
    val day = 100L // shrunken "day" keeps literals readable
    // u1 first active day 0, again day 2 (twice — must count once) and
    // day 3; u2 first active day 1 only; u3 days 1 and 2
    val named = Seq(
      ("a", "u1", 0L), ("a", "u1", 250L), ("b", "u1", 260L),
      ("a", "u1", 310L),
      ("a", "u2", 150L),
      ("a", "u3", 199L), ("b", "u3", 201L),
    ).toDF("space", "segment", "ts_us")
    val got = Windows.cohortRetention(named, dayUs = day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 2L) -> 1L, (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 2L,                                 // u2 + u3 day-1 cohort
      (1L, 1L) -> 1L))                                // u3 returns next day
  }

  test("spaceCorrelation: identical series → 1, opposed series → -1") {
    import spark.implicits._
    import graft.operators.Windows
    // bucket width 10: space a counts [1,2,3] per bucket, b identical,
    // c reversed [3,2,1]
    def rows(space: String, perBucket: Seq[Int]) =
      perBucket.zipWithIndex.flatMap { case (n, h) =>
        (0 until n).map(i => (space, s"u$i", h * 10L + i)) }
    val named = (rows("a", Seq(1, 2, 3)) ++ rows("b", Seq(1, 2, 3)) ++
      rows("c", Seq(3, 2, 1))).toDF("space", "segment", "ts_us")
    val got = Windows.spaceCorrelation(named, widthUs = 10L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map(("a", "b") -> 1.0, ("a", "c") -> -1.0,
      ("b", "c") -> -1.0))
  }

  test("anomaly flags exactly the planted spike at its exact z") {
    import spark.implicits._
    import graft.operators.Windows
    // counts [10,10,10,10,50]: mean 18, z(spike) = 160/80 = 2.0 exactly
    val named = (0 until 4).flatMap(h =>
        (0 until 10).map(i => ("a", s"u$i", h * 10L + i % 10))) ++
      (0 until 50).map(i => ("a", s"u$i", 40L + i % 10))
    val got = Windows.anomaly(named.toDF("space", "segment", "ts_us"),
      widthUs = 10L, tau = 2.0).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a" &&
      got.head.getLong(1) == 40L && got.head.getLong(2) == 50L &&
      got.head.getDouble(3) == 2.0)
  }

  test("approx quantiles track exact quantiles within 2%") {
    val named = EventLog.named(spark, SF)
    val exact = graft.operators.Windows.valueQuantiles(named).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.operators.Windows.valueQuantilesApprox(named)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (space, (p50, p90)) =>
      val (a50, a90) = approx(space)
      assert(math.abs(a50 - p50) <= 0.02 * math.max(1.0, math.abs(p50)),
        s"$space p50 approx=$a50 exact=$p50")
      assert(math.abs(a90 - p90) <= 0.02 * math.max(1.0, math.abs(p90)),
        s"$space p90 approx=$a90 exact=$p90")
    }
  }

  test("consumerLag: synthetic cursors land on exact quarters; counts are " +
      "strict-after; explicit cursor tables ride the same rollup") {
    import spark.implicits._
    // 101 entries at ts 0..100 µs → bounds (0, 100); groups 1..3 commit
    // at 25/50/75
    val named = (0L to 100L).map(ts => ("s", ts)).toDF("space", "ts_us")
    val out = StreamOps.consumerLag(named, nGroups = 3).collect()
      .map(r => r.getAs[Long]("grp") ->
        (r.getAs[Long]("cursor_ts_us"), r.getAs[Long]("n_behind"),
          r.getAs[Long]("time_lag_us"))).toMap
    assert(out == Map(
      1L -> ((25L, 75L, 75L)),
      2L -> ((50L, 50L, 50L)),
      3L -> ((75L, 25L, 25L))))
    // a fully-caught-up explicit cursor reports zero lag; a cursor at
    // the epoch sees everything after it
    val cursors = Seq((9L, "s", 100L, 100L), (10L, "s", -1L, 100L))
      .toDF("grp", "space", "cursor_ts_us", "tmax")
    val explicit = StreamOps.consumerLagFrom(named, cursors).collect()
      .map(r => r.getAs[Long]("grp") ->
        (r.getAs[Long]("n_behind"), r.getAs[Long]("time_lag_us"))).toMap
    assert(explicit == Map(9L -> ((0L, 0L)), 10L -> ((101L, 101L))))
  }

  test("compactPlan: exact reclaim under keep-latest-per-segment; " +
      "single-entry segments reclaim nothing") {
    import spark.implicits._
    // segment a: payloads of 5, 7, 9 bytes (sequence order — survivor
    // is the 9); segment b: one 4-byte entry (fully live)
    val entries = Seq(
      ("s", "a", 1L, "12345"),
      ("s", "a", 2L, "1234567"),
      ("s", "a", 3L, "123456789"),
      ("s", "b", 1L, "1234"),
    ).toDF("space", "segment", "sequence", "payload")
    val got = StreamOps.compactPlan(entries).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_entries") == 4L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Long]("bytes_total") == 25L)
    assert(r.getAs[Long]("bytes_live") == 13L)  // 9 + 4
    assert(r.getAs[Long]("bytes_reclaimed") == 12L)
    // half-up milli: 12/25 = 480.0 exactly
    assert(r.getAs[Long]("reclaim_milli") == 480L)
    // an all-live space (every segment single-entry) reclaims zero
    val live = Seq(("t", "x", 1L, "aa"), ("t", "y", 1L, "bb"))
      .toDF("space", "segment", "sequence", "payload")
    val lr = StreamOps.compactPlan(live).collect().head
    assert(lr.getAs[Long]("bytes_reclaimed") == 0L)
    assert(lr.getAs[Long]("reclaim_milli") == 0L)
  }

  test("quarantine: every canary maps to its reason, precedence holds, clean row passes") {
    val raw = EventLog.raw(spark, SF)
    val got = StreamOps.quarantine(StreamOps.quarantineCanaries(raw))
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[String]("reason"))).toMap
    assert(got == Map(
      9000000001L -> "null_ts", 9000000002L -> "null_segment",
      9000000003L -> "null_space", 9000000004L -> "empty_space",
      9000000005L -> "null_value", 9000000006L -> "bad_value",
      9000000007L -> "bad_value", 9000000008L -> "bad_value",
      9000000009L -> "null_props", 9000000010L -> "bad_props",
      // precedence: null ts AND bad value AND bad props → earliest
      9000000011L -> "null_ts"), got.toString)
    // a bare JSON 'null' payload passes in BOTH engines (Spark's
    // get_json_object returns the string 'null', not SQL NULL —
    // measured r17; the second negative control next to 12)
    assert(!got.contains(9000000013L))
    // the clean negative control never surfaces
    assert(!got.contains(9000000012L))
    // the real gate-scale log is clean — the registered row's non-canary
    // contribution is empty, exactly what sk_log_health counts
    assert(StreamOps.quarantine(raw).count() == 0L)
  }

  test("quarantine streaming dual is the same expression over a stream (exact)") {
    import java.nio.file.Files
    val raw = EventLog.raw(spark, SF)
    val mixed = StreamOps.quarantineCanaries(raw) // 13 rows, all paths
    val dir = Files.createTempDirectory("graft_quarantine_s").toString
    mixed.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(mixed.schema).parquet(dir)
    val q = StreamOps.quarantine(stream).writeStream
      .format("memory").queryName("quarantine_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("quarantine_stream")
      .collect().map(_.toSeq).toSet
    val want = StreamOps.quarantine(mixed).collect().map(_.toSeq).toSet
    assert(want.size == 11 && got == want)
  }
}
