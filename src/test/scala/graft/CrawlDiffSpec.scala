package graft

import org.apache.spark.sql.functions._
import graft.text.{CrawlDiff, TextOps}

class CrawlDiffSpec extends SparkSpec {

  import spark.implicits._

  test("diff: planted snapshots classify all four ways") {
    val old = Seq((1L, "en", "A"), (2L, "en", "B"), (4L, "fr", "D"))
      .toDF("doc_id", "lang", "digest")
    val cur = Seq((2L, "en", "B2"), (3L, "fr", "C"), (4L, "fr", "D"))
      .toDF("doc_id", "lang", "digest")
    val out = CrawlDiff.diff(old, cur).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("lang"))).toMap
    assert(out == Map(
      1L -> ("removed", "en"), 2L -> ("changed", "en"),
      3L -> ("added", "fr"), 4L -> ("unchanged", "fr")))
  }

  test("recrawlPriority: only added/changed enter; integer priority " +
      "ranks quality first, added above changed on ties") {
    val old = Seq((1L, "en", "A"), (2L, "en", "B"), (4L, "en", "D"))
      .toDF("doc_id", "lang", "digest")
    val cur = Seq((2L, "en", "B2"), (3L, "en", "C"), (4L, "en", "D"))
      .toDF("doc_id", "lang", "digest")
    // texts chosen so every doc lands in the same quality bands
    // (short word soup → the same q4), making the tiebreak visible
    val texts = Seq(
      (2L, "alpha beta gamma", "en", "s0"),
      (3L, "delta epsilon zeta", "en", "s0"),
      (4L, "eta theta iota", "en", "s0"),
    ).toDF("doc_id", "text", "lang", "source")
    val out = CrawlDiff.recrawlPriority(old, cur, texts).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("q4"),
          r.getAs[Long]("priority"))).toMap
    // 1 removed and 4 unchanged never enter the queue
    assert(out.keySet == Set(2L, 3L))
    val (st2, q2v, p2) = out(2L)
    val (st3, q3v, p3) = out(3L)
    assert(st2 == "changed" && st3 == "added")
    assert(q2v == q3v) // same bands by construction
    assert(p2 == q2v * 2 && p3 == q3v * 2 + 1) // added edges the tie
  }

  test("synthetic snapshots: statuses partition the id universe correctly") {
    val d = TextOps.docs(spark, SF)
    val old = CrawlDiff.syntheticOld(d)
    val cur = CrawlDiff.syntheticCurrent(d)
    val diff = CrawlDiff.diff(old, cur).cache()
    val oldIds = old.select("doc_id").as[Long].collect().toSet
    val curIds = cur.select("doc_id").as[Long].collect().toSet
    val byStatus = diff.collect()
      .groupBy(_.getAs[String]("status"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("doc_id")).toSet }
    assert(byStatus.getOrElse("added", Set.empty[Long]) == curIds -- oldIds)
    assert(byStatus.getOrElse("removed", Set.empty[Long]) == oldIds -- curIds)
    val both = oldIds intersect curIds
    assert((byStatus.getOrElse("changed", Set.empty[Long]) ++
      byStatus.getOrElse("unchanged", Set.empty[Long])) == both)
    // a changed doc is exactly a ':mut'-drawn doc present in both
    val mut = d.filter(substring(md5(concat_ws(":",
        col("doc_id").cast("string"), lit("mut"))), 1, 1) < "3")
      .select("doc_id").as[Long].collect().toSet
    assert(byStatus.getOrElse("changed", Set.empty[Long]) == (both intersect mut))
  }

  test("report equals a groupBy over the diff") {
    val d = TextOps.docs(spark, SF)
    val old = CrawlDiff.syntheticOld(d)
    val cur = CrawlDiff.syntheticCurrent(d)
    val rep = CrawlDiff.report(old, cur).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[String]("lang")) ->
        r.getAs[Long]("n_docs")).toMap
    val direct = CrawlDiff.diff(old, cur).groupBy("status", "lang").count()
      .collect()
      .map(r => (r.getAs[String]("status"), r.getAs[String]("lang")) ->
        r.getAs[Long]("count")).toMap
    assert(rep == direct)
    assert(rep.values.sum == CrawlDiff.diff(old, cur).count())
  }

  test("recrawlSchedule: every queued doc gets a day, days are monotone " +
      "in priority, and daily load stays within one grid cell of budget") {
    val docs = graft.text.TextOps.docs(spark, SF)
    val old = CrawlDiff.syntheticOld(docs)
    val cur = CrawlDiff.syntheticCurrent(docs)
    val budget = 4L
    val sched = CrawlDiff.recrawlSchedule(old, cur, docs, budget).collect()
    // conservation: the schedule covers the queue exactly
    assert(sched.length.toLong ==
      CrawlDiff.recrawlPriority(old, cur, docs).count())
    // monotone: a strictly higher-priority doc is never fetched later...
    // (higher priority → earlier or equal day)
    val byDay = sched.groupBy(_.getAs[Long]("day"))
    val minPriPerDay = byDay.view.mapValues(
      _.map(_.getAs[Long]("priority")).min).toMap
    val maxPriPerDay = byDay.view.mapValues(
      _.map(_.getAs[Long]("priority")).max).toMap
    byDay.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(d1, d2) =>
        assert(minPriPerDay(d1) >= maxPriPerDay(d2) ||
          minPriPerDay(d1) >= minPriPerDay(d2),
          s"day $d1 min ${minPriPerDay(d1)} < day $d2 max ${maxPriPerDay(d2)}")
      case _ => ()
    }
    // the day sequence is contiguous from 0
    val days = byDay.keys.toSeq.sorted
    assert(days.head == 0L)
    assert(days == (0L until days.length).toSeq, days.toString)
    // load: every non-final day carries at least the budget (group
    // granularity can only OVERSHOOT a day, never leave it short while
    // later days have work)
    days.dropRight(1).foreach { d =>
      assert(byDay(d).length >= budget, s"day $d load ${byDay(d).length}")
    }
  }
}
