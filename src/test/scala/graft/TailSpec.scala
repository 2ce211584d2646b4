package graft

import org.apache.spark.sql.functions._
import graft.sources.EventLog
import graft.operators.StreamOps

class TailSpec extends SparkSpec {

  test("consumeTail returns exactly the last k sequences per segment") {
    val entries = EventLog.entries(spark, SF, Some("click")).cache()
    val tail = StreamOps.consumeTail(entries, "click", k = 3)
      .collect()
      .groupBy(_.getAs[String]("segment"))
    val expected = entries.groupBy("segment")
      .agg(max("sequence").as("m"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    expected.foreach { case (seg, (maxSeq, n)) =>
      val got = tail(seg).map(_.getAs[Long]("sequence")).sorted.reverse
      val want = (maxSeq to math.max(maxSeq - 2, 1) by -1)
        .take(math.min(3, n.toInt))
      assert(got.toSeq == want.toSeq, s"segment $seg")
    }
  }

  test("consumeTail values match a window-based reference") {
    val entries = EventLog.entries(spark, SF, Some("error"))
    val viaAgg = StreamOps.consumeTail(entries, "error", k = 2)
      .select("segment", "sequence", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment").orderBy(col("sequence").desc)
    val viaWindow = entries
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("segment", "sequence", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("approx distinct stays within 5% of exact") {
    val named = EventLog.named(spark, SF)
    val rows = named.groupBy("space")
      .agg(approx_count_distinct(col("segment")).as("approx"),
        countDistinct(col("segment")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }
}
