package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of a plain join under skew") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 1L, i)).toDF("k", "payload")
    val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.sameElements(plain))
  }

  test("salted left join keeps unmatched rows once") {
    val left = Seq((1L, "a"), (99L, "b")).toDF("k", "v")
    val right = Seq((1L, "x")).toDF("k", "w")
    val rows = Skew.saltedJoin(left, right, "k", salt = 4, "left")
      .collect()
    assert(rows.length == 2)
    assert(rows.count(_.isNullAt(2)) == 1)
  }
}
