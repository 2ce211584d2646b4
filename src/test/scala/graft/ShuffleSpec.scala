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
