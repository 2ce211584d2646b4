package graft

import org.apache.spark.sql.functions._
import graft.similarity.LshBuckets

/** Occupancy-safety contract of the hyperplane-LSH construction: adaptive
  * plane counts, a hard per-bucket occupancy bound on skewed corpora, and
  * exact drop accounting — the properties that keep the LSH candidate
  * joins linear at 100 TB instead of n²/2^planes. */
class LshSpec extends SparkSpec {
  import spark.implicits._

  test("adaptive plane count tracks corpus size, clamped to sane bounds") {
    // occupancy target 128: planes grow with log2(n), so expected bucket
    // occupancy is scale-invariant
    assert(LshBuckets.adaptivePlanes(100L, 128L) == 4) // clamp at min
    assert(LshBuckets.adaptivePlanes(128L * 16L, 128L) == 4)
    assert(LshBuckets.adaptivePlanes(128L * 17L, 128L) == 5)
    assert(LshBuckets.adaptivePlanes(1000000000L, 128L) == 23)
    assert(LshBuckets.adaptivePlanes(1L << 62, 128L) == 24) // clamp at max
  }

  /** 600 near-identical vectors (one dense cluster that lands in ONE
    * bucket per table) plus 40 spread vectors. */
  private def skewed = {
    val dense = (1L to 600L).map(i =>
      (i, Array(1.0, 0.5, 0.25, 0.125)))
    val spread = (601L to 640L).map { i =>
      val a = ((i * 37) % 101).toDouble / 50.0 - 1.0
      val b = ((i * 59) % 103).toDouble / 51.0 - 1.0
      val c = ((i * 83) % 107).toDouble / 53.0 - 1.0
      (i, Array(a, b, c, a * b - c))
    }
    (dense ++ spread).toDF("vec_id", "v")
  }

  test("occupancy cap bounds every final bucket on a pathologically skewed corpus") {
    val m = LshBuckets.members(skewed, planes = 4, tables = 2,
      maxOccupancy = 50L, subPlanes = 2)
    val maxOcc = m.groupBy("tbl", "bucket", "sub").count()
      .agg(max("count")).head.getLong(0)
    assert(maxOcc <= 50L, s"bucket over cap: $maxOcc")
  }

  test("audit accounts for every membership and reports the drops") {
    val rows = LshBuckets.audit(skewed, planes = 4, tables = 2,
      maxOccupancy = 50L, subPlanes = 2).collect()
    assert(rows.length == 2) // one row per hash table
    rows.foreach { r =>
      assert(r.getAs[Long]("n_memberships") == 640L)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == 640L)
      // identical vectors cannot be sub-split apart → the dense cluster
      // must be dropped, not exploded into an all-pairs join
      assert(r.getAs[Long]("n_dropped") >= 600L)
      assert(r.getAs[Long]("max_occupancy") <= 50L)
    }
  }

  test("an un-skewed corpus keeps every membership (no gratuitous drops)") {
    val e = graft.similarity.Knn.emb(spark, SF)
    val n = e.count()
    val rows = LshBuckets.audit(e,
      planes = LshBuckets.adaptivePlanes(n), tables = 4,
      maxOccupancy = 4096L).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_memberships") == n)
      assert(r.getAs[Long]("n_dropped") == 0L)
      assert(r.getAs[Long]("max_occupancy") <= 4096L)
    }
  }

  test("near-dup pairs in dropped dense buckets are still the exact-dedup path's job") {
    // the operator-level contract after a drop: embeddingPairsLsh output
    // stays a sound subset (no false positives) — verified in DedupSpec;
    // here: the search path still answers for spread vectors
    val rows = graft.similarity.Knn.lsh(
      skewed.withColumn("nrm",
        sqrt(graft.functions.DotProduct(col("v"), col("v")))),
      col("vec_id") === 601L, k = 3,
      planes = 4, tables = 2, maxOccupancy = 50L).collect()
    assert(rows.forall(r => r.getAs[Long]("query_id") == 601L))
  }
}
