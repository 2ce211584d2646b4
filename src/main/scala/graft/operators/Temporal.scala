package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over the event log — operators Spark has no native
  * form of, built as scale-safe compositions (SURVEY §2-C):
  *
  *  - [[asofJoin]]: for every entry of a query space, the latest entry
  *    of a reference space in the same segment at-or-before its event
  *    time (attribution: "last click before each purchase"). NOT a
  *    per-row correlated lookup and NOT a range self-join: both sides
  *    union into ONE stream sorted per segment, and a running
  *    last-non-null carries the reference forward — one shuffle on
  *    segment, window work parallel across segments, cost linear in
  *    |q| + |r|.
  *  - [[rangeJoinCount]]: per query entry, the number of reference
  *    entries in the trailing interval (t − W, t]. A naive inequality
  *    join is a per-segment cartesian; instead references key by their
  *    time bucket of width W and each query probes exactly the two
  *    buckets its interval can overlap — a banded equi-join whose cost
  *    follows matching pairs, not |q| × |r|.
  */
object Temporal {

  /** As-of join: query rows (segment, sequence, ts_us) each pick up
    * `ref_ts_us`/`ref_value` from the reference space's latest entry with
    * ref.ts_us ≤ query.ts_us in the same segment. Ordering key
    * (ts_us, kind, event_id) makes the pick deterministic even when
    * reference timestamps tie: the larger event_id wins. */
  def asofJoin(entries: DataFrame, querySpace: String,
      refSpace: String): DataFrame = {
    val q = entries.filter(col("space") === querySpace)
      .select(col("segment"), col("ts_us"), col("event_id"),
        lit(1).as("kind"), lit(null).cast("double").as("ref_v"),
        col("sequence"))
    val r = entries.filter(col("space") === refSpace)
      .select(col("segment"), col("ts_us"), col("event_id"),
        lit(0).as("kind"), col("value").as("ref_v"),
        lit(null).cast("long").as("sequence"))
    // reference rows sort BEFORE a query row at the same ts (kind 0 < 1)
    // → at-or-before semantics
    val w = Window.partitionBy("segment")
      .orderBy("ts_us", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(q)
      .withColumn("ref_ts_us",
        last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true)
          .over(w))
      .withColumn("ref_value",
        last(when(col("kind") === 0, col("ref_v")), ignoreNulls = true)
          .over(w))
      .filter(col("kind") === 1)
      .select(col("segment"), col("sequence"), col("ts_us"),
        col("ref_ts_us"), col("ref_value"))
  }

  /** Banded trailing-range count: per query entry, how many reference
    * entries fall in (ts_us − windowUs, ts_us]. References bucket by
    * `ts div W`; a length-W trailing interval overlaps at most the
    * bucket of t and the one before, so each query probes exactly two
    * buckets (the band). */
  def rangeJoinCount(entries: DataFrame, querySpace: String,
      refSpace: String, windowUs: Long): DataFrame = {
    val q = entries.filter(col("space") === querySpace)
      .select(col("segment"), col("sequence"), col("ts_us"))
      .withColumn("bucket", explode(array(
        expr(s"ts_us div $windowUs"), expr(s"ts_us div $windowUs - 1"))))
    val r = entries.filter(col("space") === refSpace)
      .select(col("segment").as("r_segment"),
        col("ts_us").as("r_ts_us"),
        expr(s"ts_us div $windowUs").as("r_bucket"))
    q.join(r,
        col("segment") === col("r_segment") &&
          col("bucket") === col("r_bucket"), "left")
      .groupBy(col("segment"), col("sequence"), col("ts_us"))
      .agg(sum(when(col("r_ts_us") > col("ts_us") - windowUs &&
        col("r_ts_us") <= col("ts_us"), 1L).otherwise(0L)).as("n_recent"))
  }
}
