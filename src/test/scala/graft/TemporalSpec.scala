package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.EventLog

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(String, String, Long, Long, Long, Double)]) =
    rows.toDF("space", "segment", "sequence", "ts_us", "event_id", "value")

  test("asof join picks the latest at-or-before reference, event_id breaks ts ties") {
    val entries = frame(Seq(
      ("click", "a", 1L, 10L, 1L, 1.0),
      ("click", "a", 2L, 10L, 2L, 2.0), // same ts, higher event_id wins
      ("click", "a", 3L, 30L, 3L, 3.0),
      ("purchase", "a", 1L, 10L, 4L, 0.0), // at-or-before: ties included
      ("purchase", "a", 2L, 20L, 5L, 0.0),
      ("purchase", "a", 3L, 40L, 6L, 0.0),
      ("purchase", "b", 1L, 99L, 7L, 0.0))) // no refs in segment b
    val got = Temporal.asofJoin(entries, "purchase", "click").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(("a", 1L)) == (Some(10L), Some(2.0)))
    assert(got(("a", 2L)) == (Some(10L), Some(2.0)))
    assert(got(("a", 3L)) == (Some(30L), Some(3.0)))
    assert(got(("b", 1L)) == (None, None))
  }

  test("banded range count equals the brute inequality join on real data") {
    val entries = EventLog.entries(spark, SF).cache()
    val w = 3600000000L
    val banded = Temporal.rangeJoinCount(entries, "purchase", "click", w)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    val q = entries.filter(col("space") === "purchase")
      .select(col("segment"), col("sequence"), col("ts_us"))
    val r = entries.filter(col("space") === "click")
      .select(col("segment").as("rs"), col("ts_us").as("rt"))
    val brute = q.join(r, col("segment") === col("rs") &&
        col("rt") > col("ts_us") - w && col("rt") <= col("ts_us"), "left")
      .groupBy("segment", "sequence")
      .agg(sum(when(col("rt").isNotNull, 1L).otherwise(0L)).as("n"))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(banded == brute)
    assert(banded.values.exists(_ > 0L))
  }

  test("asof join result covers every query row exactly once") {
    val entries = EventLog.entries(spark, SF)
    val n = entries.filter(col("space") === "purchase").count()
    val out = Temporal.asofJoin(entries, "purchase", "click")
    assert(out.count() == n)
    assert(out.select("segment", "sequence").distinct().count() == n)
  }

  test("ohlc: open/close by the (ts_us, event_id) total order incl. " +
      "ts ties; high/low raw; windows split correctly") {
    import graft.operators.Windows
    val entries = frame(Seq(
      // window [0, 100): open 5.0 (ts 10), close 1.0 (ts 10 TIE broken
      // by event_id 3 > 2), high 9.0, low 1.0
      ("s", "a", 1L, 10L, 1L, 5.0),
      ("s", "b", 1L, 50L, 4L, 9.0),
      ("s", "a", 2L, 10L, 2L, 7.0),
      ("s", "b", 2L, 10L, 3L, 1.0),
      // window [100, 200): single event — all four equal
      ("s", "a", 3L, 150L, 5L, 4.0)))
    val got = Windows.ohlc(entries, 100L).collect()
      .map(r => r.getAs[Long]("window_start_us") -> r).toMap
    val w0 = got(0L)
    assert(w0.getAs[Long]("n") == 4L)
    assert(w0.getAs[Double]("open") == 5.0)  // event_id 1 at ts 10
    assert(w0.getAs[Double]("close") == 9.0) // ts 50 is latest
    assert(w0.getAs[Double]("high") == 9.0)
    assert(w0.getAs[Double]("low") == 1.0)
    val w1 = got(100L)
    assert(w1.getAs[Double]("open") == 4.0)
    assert(w1.getAs[Double]("close") == 4.0)
    assert(w1.getAs[Double]("high") == 4.0)
    assert(w1.getAs[Double]("low") == 4.0)
  }

  test("snapshotPlan: exact div/mod accounting and the due boundary") {
    import graft.operators.EventSourcing
    // segment a: 20 events → 1 snap, suffix 4, not due (dueAfter 8);
    // segment b: 25 events → 1 snap, suffix 9, due;
    // segment c: 16 events → 2 snaps? no: 16 div 16 = 1, suffix 0
    val entries = frame((1L to 20L).map(i =>
      ("s", "a", i, i * 10L, i, 1.0)) ++
      (1L to 25L).map(i => ("s", "b", i, i * 10L, 100 + i, 1.0)) ++
      (1L to 16L).map(i => ("s", "c", i, i * 10L, 200 + i, 1.0)))
    val got = EventSourcing.snapshotPlan(entries, everyN = 16L,
      dueAfter = 8L).collect().map(r => r.getString(1) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("snaps_taken") == 1L)
    assert(a.getAs[Long]("since_snap") == 4L)
    assert(a.getAs[Long]("due") == 0L)
    assert(a.getAs[Long]("last_sequence") == 20L)
    val b = got("b")
    assert(b.getAs[Long]("snaps_taken") == 1L)
    assert(b.getAs[Long]("since_snap") == 9L)
    assert(b.getAs[Long]("due") == 1L)
    val c = got("c")
    assert(c.getAs[Long]("snaps_taken") == 1L)
    assert(c.getAs[Long]("since_snap") == 0L)
    assert(c.getAs[Long]("due") == 0L)
    // consistency with the read path: a snapshot at the policy boundary
    // plus the suffix replays to the same state as a full replay
    val entriesP = entries.withColumn("payload", lit("{}"))
    val snap = EventSourcing.snapshot(entriesP, "s",
      atSequence = 16L) // segment a/b/c boundary snapshot
    val viaSnap = EventSourcing.replayFromSnapshot(snap, entriesP, "s")
      .collect().map(r => r.getString(1) ->
        r.getAs[Long]("n_events")).toMap
    assert(viaSnap == Map("a" -> 20L, "b" -> 25L, "c" -> 16L))
  }
}
