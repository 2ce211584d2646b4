package graft

import org.apache.spark.sql.functions._
import graft.text.Shuffle

/** Deterministic epoch-shuffle receipts: dense per-shard positions,
  * exactly-once coverage, cross-run determinism, epoch independence,
  * and balance-rollup conservation. */
class ShuffleSpec extends SparkSpec {

  private lazy val docs = graft.text.TextOps.docs(spark, SF).cache()

  test("receipts: every doc exactly once, dense 1..n positions per shard") {
    val rows = Shuffle.epochShuffle(docs, epoch = 1).collect()
    assert(rows.length == docs.count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.groupBy(_.getAs[String]("shard_hex")).values.foreach { g =>
      val pos = g.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to g.length), s"non-dense positions: $pos")
    }
    // every shard key is two lowercase hex chars
    assert(rows.forall(_.getAs[String]("shard_hex").matches("[0-9a-f]{2}")))
  }

  test("receipts are deterministic across runs and INDEPENDENT across epochs") {
    def plan(epoch: Int): Map[Long, (String, Long)] =
      Shuffle.epochShuffle(docs, epoch).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("shard_hex"), r.getAs[Long]("pos")))).toMap
    val e1a = plan(1)
    val e1b = plan(1)
    assert(e1a == e1b) // reproducible: the resumability contract
    val e2 = plan(2)
    // a different epoch draws a genuinely different order: most docs
    // move shard or position (md5 keys are independent draws)
    val moved = e1a.count { case (id, sp) => e2(id) != sp }
    assert(moved > e1a.size / 2, s"only $moved/${e1a.size} moved")
  }

  test("shard width is adaptive: floor 2 through 256M docs, then widens") {
    // the gate/stress scales all sit under the floor — receipts (and
    // the DuckDB oracle's substr(k,1,2)) are byte-identical there
    assert(Shuffle.shardChars(0L) == 2)
    assert(Shuffle.shardChars(60000L) == 2)
    assert(Shuffle.shardChars(256L * Shuffle.TargetDocsPerShard) == 2)
    assert(Shuffle.shardChars(256L * Shuffle.TargetDocsPerShard + 1) == 3)
    // each extra char buys 16x capacity; monotone; capped at 8
    assert(Shuffle.shardChars(4096L * Shuffle.TargetDocsPerShard) == 3)
    assert(Shuffle.shardChars(4096L * Shuffle.TargetDocsPerShard + 1) == 4)
    assert(Shuffle.shardChars(Long.MaxValue) == 8)
  }

  test("a planted large corpus widens the shard key; positions stay dense") {
    // n passed explicitly (the at-scale override): 10^9 docs -> 3 chars
    val rows = Shuffle.epochShuffle(docs, epoch = 1, n = 1000000000L)
      .collect()
    assert(rows.forall(_.getAs[String]("shard_hex").matches("[0-9a-f]{3}")))
    assert(rows.length == docs.count())
    rows.groupBy(_.getAs[String]("shard_hex")).values.foreach { g =>
      val pos = g.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to g.length), s"non-dense positions: $pos")
    }
    // the wider key is a PREFIX-REFINEMENT of the 2-char plan: the md5
    // order key is unchanged, so within any 2-char prefix the relative
    // order of docs is identical to the narrow plan's
    val narrow = Shuffle.epochShuffle(docs, epoch = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("shard_hex"), r.getAs[Long]("pos")))).toMap
    rows.groupBy(_.getAs[String]("shard_hex").take(2)).foreach {
      case (p2, g) =>
        val wideOrder = g.sortBy(r =>
          (r.getAs[String]("shard_hex"), r.getAs[Long]("pos")))
          .map(_.getAs[Long]("doc_id")).toSeq
        // docs of this 2-char shard in the narrow plan, in narrow order
        val narrowOrder = narrow.toSeq
          .filter { case (_, (s, _)) => s == p2 }
          .sortBy { case (_, (_, pos)) => pos }.map(_._1)
        assert(wideOrder.sorted == narrowOrder.sorted,
          s"shard $p2 membership changed under widening")
    }
  }

  test("null doc_id is a NAMED error, never a silent md5('shuf:1:') key") {
    import spark.implicits._
    val bad = Seq((java.lang.Long.valueOf(1L), "alpha beta"),
        (null.asInstanceOf[java.lang.Long], "gamma"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Shuffle.epochShuffle(bad, epoch = 1)
        .queryExecution.toRdd.count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null doc_id")), s"got: ${msgs(e)}")
  }

  test("balance rollup conserves the receipt table and bounds the extremes") {
    val receipts = Shuffle.epochShuffle(docs, epoch = 1)
      .groupBy("shard_hex").agg(count(lit(1)).as("n"),
        sum("n_tokens").as("t")).collect()
    val b = Shuffle.shuffleBalance(docs, epoch = 1).collect().head
    assert(b.getAs[Long]("epoch") == 1L)
    assert(b.getAs[Long]("n_shards") == receipts.length.toLong)
    assert(b.getAs[Long]("docs_total") == docs.count())
    assert(b.getAs[Long]("max_docs") ==
      receipts.map(_.getAs[Long]("n")).max)
    assert(b.getAs[Long]("min_docs") ==
      receipts.map(_.getAs[Long]("n")).min)
    // imbalance milli is ≥ 1000 by construction (max ≥ ideal)
    assert(b.getAs[Long]("doc_imb_milli") >= 1000L)
    assert(b.getAs[Long]("token_imb_milli") >= 1000L)
  }
}
