package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.{Prf, TextOps}

/** Pseudo-relevance-feedback expansion: planted mining behavior, the
  * bounded global-top-k cut's equivalence to the window formulation,
  * and the end-to-end expanded ranking. */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))

  test("expansion mines the co-occurring term, excludes seed terms and df-1 singletons") {
    // 'vector' docs all carry 'quantized' (df 3); 'zzzrare' appears in
    // ONE top doc only (df 1 → floor-excluded despite max idf); filler
    // docs keep the collection stats honest
    val d = corpus(
      (1L, "vector quantized index zzzrare"),
      (2L, "vector quantized search"),
      (3L, "vector quantized store"),
      (4L, "filler words only here"),
      (5L, "more filler body text"),
      (6L, "other content entirely"))
    val terms = Prf.prfTerms(d, q0 = Seq("vector"), k0 = 3, m = 3)
      .collect().map(_.getAs[String]("term")).toSet
    assert(terms.contains("quantized"), terms.toString)
    assert(!terms.contains("vector"), "seed term leaked into expansion")
    assert(!terms.contains("zzzrare"), "df-1 singleton hijacked expansion")
  }

  test("global top-k cut (MinKByKey) equals the window formulation on a tie-heavy table") {
    // ties on the 1e-4 grid score must break on doc_id, identically
    val scored = Seq(
      (10L, 0.5), (11L, 0.5), (12L, 0.5), (13L, 0.75),
      (14L, 0.25), (15L, 0.75)).toDF("doc_id", "score")
    val got = Prf.topDocs(scored, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = scored.withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk")))
      .toSet
    assert(got == want, s"$got vs $want")
    // the cut itself plans the bounded aggregate, never a sort/window
    val plan = Prf.topDocs(scored, 4).queryExecution.executedPlan.toString
    assert(plan.contains("min_k_by_key"), plan)
    assert(!plan.contains("Window") && !plan.contains("Sort "), plan)
  }

  test("searchPrf equals BM25 over seed union mined terms with the window cut") {
    val d = TextOps.docs(spark, SF)
    val got = Prf.searchPrf(d).collect().map(_.toSeq).toSet
    val qterms = spark.createDataset(Prf.SeedQuery).toDF("term")
      .unionByName(Prf.prfTerms(d).select("term"))
    val want = TextOps.bm25SearchTerms(d, qterms)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= 20)
      .select("doc_id", "n_terms_matched", "score", "rnk")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty && got == want,
      s"prf ${got.size} vs window ${want.size}")
    // expansion genuinely widened the query: some served doc matches
    // more terms than the seed query has
    assert(got.exists(_(1).asInstanceOf[Long] > 4L) ||
      Prf.prfTerms(d).count() == 0L)
  }
}
