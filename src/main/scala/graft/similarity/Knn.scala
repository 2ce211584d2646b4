package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2-F).
  *
  * [[brute]] is the exact baseline: broadcast the (small) query set
  * against the corpus, rank per query — a TakeOrdered per query, no
  * all-pairs shuffle. [[lsh]] (random hyperplanes) and [[ivf]] (inverted
  * file over seeded centroids) are the 100 TB paths: both turn search
  * into a bucket-equijoin so cost scales with bucket size, not corpus². */
object Knn {

  def emb(spark: SparkSession, dir: String): DataFrame =
    embOf(spark.read.parquet(s"$dir/embeddings.parquet"))

  /** Normalize a RAW embedding table or stream (vec_id, label,
    * embedding) to the (v, nrm) shape every operator here consumes —
    * one definition with [[emb]], reused by the stream-static probes so
    * their per-batch normalization cannot drift from batch. */
  def embOf(raw: DataFrame): DataFrame =
    raw.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(DotProduct(col("v"), col("v"))))

  /** Cosine via the native kernel; norms are precomputed per vector. */
  private def cosine: Column =
    round(DotProduct(col("q.v"), col("c.v")) /
      (col("q.nrm") * col("c.nrm")), 4)

  /** Degenerate-vector fence for the FLOAT cosine paths — the
    * bruteQuantized zero-code posture, generalized by the
    * hostile-corpus sweep (r16): a zero vector has no cosine direction
    * (0/0 — under Spark 4 ANSI the zero divisor outright KILLS the job,
    * and where it doesn't, both engines sort the NaN above every real
    * score, so one degenerate corpus row would head EVERY query's
    * top-k); a NaN- or Inf-poisoned vector turns every score it touches
    * NaN. `nrm > 0 AND nrm < Infinity` excludes all three, identically
    * in Spark and DuckDB (both order NaN greatest, so it fails both
    * compares) — the oracle-checked float path carries the same
    * predicate in SQL. */
  private[graft] def finiteNorm(nrm: Column): Column =
    nrm > lit(0.0) && nrm < lit(Double.PositiveInfinity)

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "score", "rnk")
  }

  /** Pre-flight EMBEDDING HEALTH audit — the corpus_health companion
    * for the vector table, accounting exactly what the [[finiteNorm]]
    * fence and the qnrm > 0 quantized fence silently exclude: null /
    * empty / all-zero / NaN-or-Inf-poisoned vectors, plus the id and
    * dimensionality invariants every pairwise operator assumes
    * (duplicate vec_ids double-count votes; mixed dims crash the dot
    * kernels). One exact-integer corpus agg under the hash gate; the
    * squared norm is the [[graft.functions.DotProduct]] kernel over
    * the raw doubles, mirrored by list_dot_product in the oracle, and
    * NaN/Inf classification uses isnan/= infinity — identical in both
    * engines. */
  def embHealth(e: DataFrame): DataFrame = {
    val d2 = DotProduct(col("v"), col("v"))
    e.agg(
      count(lit(1)).as("n_vecs"),
      countDistinct(col("vec_id")).as("n_distinct_ids"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null_vec"),
      sum(when(col("v").isNotNull && size(col("v")) === 0, 1L)
        .otherwise(0L)).as("n_empty_vec"),
      sum(when(col("v").isNotNull && size(col("v")) > 0 &&
          d2 === lit(0.0), 1L).otherwise(0L)).as("n_zero_norm"),
      sum(when(col("v").isNotNull &&
          (isnan(d2) || d2 === lit(Double.PositiveInfinity)), 1L)
        .otherwise(0L)).as("n_nonfinite"),
      min(when(col("v").isNotNull, size(col("v")))).cast("long")
        .as("dims_min"),
      max(when(col("v").isNotNull, size(col("v")))).cast("long")
        .as("dims_max"))
  }

  /** Exact top-k cosine neighbors for each query vector. */
  def brute(e: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val fe = e.filter(finiteNorm(col("nrm")))
    val q = fe.filter(queryPred).select(col("vec_id").as("query_id"),
      col("v"), col("nrm"))
    val scored = q.as("q").join(fe.as("c"),
        col("query_id") =!= col("c.vec_id"))
      .withColumn("score", cosine)
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))
    ranked(scored, k)
  }

  /** Int8 scalar quantization of the corpus: per-vector symmetric scale
    * (q_i = floor(v_i · 127 / max|v_j| + 0.5), zero vectors → all-zero
    * codes). Half-up via floor(x + 0.5), NOT round(): floor of identical
    * doubles is identical in every engine, while round() diverges
    * between Spark (decimal-string HALF_UP) and DuckDB (binary) exactly
    * at .5 boundaries — this is what makes the codes, and with them the
    * whole integer scoring chain, oracle-reproducible. One linear encode
    * pass; the quantized corpus is 8× smaller resident than
    * array<double> — at 100 TB of embeddings this is the difference
    * between an executor-cached index and one that spills. */
  def quantize(e: DataFrame): DataFrame =
    e.withColumn("qv", graft.functions.QuantizeInt8(col("v")))
      .withColumn("qnrm", sqrt(graft.functions.ByteDot(col("qv"), col("qv"))
        .cast("double")))

  /** Quantized cosine at 4 displayed decimals with NO float round():
    * dot · 10⁴ / (|q|·|c|) + 0.5 → floor → one exact division. Every
    * input is an identical double in any engine (integer dot, sqrt of
    * integers), +,×,÷,floor are IEEE-identical, so score AND rank order
    * reproduce bit-exactly — the property that puts the int8 kernel
    * under the hash gate. */
  private def quantizedScore: Column =
    floor(graft.functions.ByteDot(col("q.qv"), col("c.qv")).cast("double")
        * lit(10000.0) / (col("q.qnrm") * col("c.qnrm")) + lit(0.5))
      .cast("double") / lit(10000.0)

  /** Exact top-k search IN THE QUANTIZED SPACE: integer [[ByteDot]]
    * accumulation (bit-deterministic — no FP summation-order hazard),
    * cosine of the int8 codes. Approximate w.r.t. the float cosine only
    * through the quantization itself; KnnSpec bounds recall@k against
    * [[brute]], and since r12 the whole chain (codes, integer dot,
    * [[quantizedScore]], rank) is oracle-EXACT: DuckDB list arithmetic
    * reproduces every row (dots of ≤127² ints are exact in doubles, and
    * no float round() appears anywhere). Same broadcast-queries shape
    * as brute — at scale the win is the 8× smaller corpus side staying
    * cache-resident. */
  def bruteQuantized(e: DataFrame, queryPred: Column, k: Int): DataFrame = {
    // zero vectors quantize to all-zero codes with qnrm = 0; their
    // cosine is undefined (0/0 → NaN, which sorts ABOVE every real
    // score in a descending order) — exclude them from both sides, the
    // dual of quantize's explicit zero-vector handling
    val qe = quantize(e).select(col("vec_id"), col("qv"), col("qnrm"))
      .filter(col("qnrm") > lit(0.0))
    val q = qe.filter(queryPred).select(col("vec_id").as("query_id"),
      col("qv"), col("qnrm"))
    val scored = q.as("q").join(qe.as("c"),
        col("query_id") =!= col("c.vec_id"))
      .withColumn("score", quantizedScore)
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))
    ranked(scored, k)
  }

  /** Cross-split SEMANTIC contamination check — the embedding dual of
    * the text `contamination_*` rows: flag (train, test) example pairs
    * whose quantized cosine reaches `tau`, catching the paraphrased /
    * re-rendered near-duplicates that digest- and substring-based
    * decontamination can never see (the eval-hygiene gap SemDeDup-style
    * pipelines close). Split membership is the split_assign rule
    * verbatim (md5 nibble of the id — a pure row function both engines
    * compute identically), scoring is the knn_quantized integer chain
    * (floor-half-up codes, exact integer ByteDot, one floor-half-up
    * double expression), zero-norm codes excluded on both sides — so
    * the whole operator sits under the hash gate. The pair join is the
    * sanctioned brute baseline: test side broadcast (the minority
    * split), train side streamed — the dedup_embedding posture. The
    * 100 TB path is IMPLEMENTED as [[contaminationSemanticIvf]] (r13):
    * the same scoring chain over IVF-probe candidates from the
    * persisted quantized index — this brute form survives as its
    * oracle baseline, exactly like knn_brute under knn_ivf. */
  def contaminationSemantic(e: DataFrame, trainSixteenths: Int = 13,
      tau: Double = 0.45): DataFrame = {
    require(trainSixteenths >= 1 && trainSixteenths <= 15,
      s"trainSixteenths must be in [1, 15], got $trainSixteenths")
    require(tau > 0.0, s"bad tau=$tau")
    val boundary = trainSixteenths.toHexString
    // feeds both split slices — encode once, never per side
    val q = quantize(e).filter(col("qnrm") > lit(0.0))
      .withColumn("split",
        when(substring(md5(col("vec_id").cast("string")), 1, 1) < boundary,
          "train").otherwise("test"))
      .select(col("vec_id"), col("split"), col("qv"), col("qnrm"))
      .localCheckpoint(true)
    val train = q.filter(col("split") === "train")
      .select(col("vec_id").as("train_vec"), col("qv").as("tqv"),
        col("qnrm").as("tnrm"))
    val test = q.filter(col("split") === "test")
      .select(col("vec_id").as("test_vec"), col("qv").as("sqv"),
        col("qnrm").as("snrm"))
    train.crossJoin(broadcast(test))
      .withColumn("score",
        floor(graft.functions.ByteDot(col("tqv"), col("sqv")).cast("double")
            * lit(10000.0) / (col("tnrm") * col("snrm")) + lit(0.5))
          .cast("double") / lit(10000.0))
      .filter(col("score") >= tau)
      .select("test_vec", "train_vec", "score")
  }

  /** Cross-split semantic contamination over the PERSISTED quantized IVF
    * index — the 100 TB path that [[contaminationSemantic]]'s docstring
    * promises: instead of broadcasting the whole test split into a cross
    * join (which stops planning long before 100 TB — the test split is
    * 3/16 of the corpus by construction), the TRAIN split is written as
    * the [[writeIvfIndexQuantized]] bucketed code index and the test
    * split PROBES it: each test vector ranks the tiny float centroid
    * table for its `nprobe` nearest lists, meets the bucketed lists in a
    * `c_id` equijoin (index side pre-partitioned — zero index-side
    * Exchange, the KnnSpec-asserted layout), and is scored with the
    * IDENTICAL integer chain (floor-half-up codes, exact integer
    * [[graft.functions.ByteDot]], one floor-half-up double expression).
    * Every emitted pair is therefore a subset of the brute operator's
    * pairs with BIT-IDENTICAL scores (KnnSpec asserts both); recall is
    * probe-dependent (a τ-near-duplicate assigned to a list the probe
    * skips is missed — nprobe tunes that trade), which is why this
    * registers rows-only while the brute baseline keeps the oracle.
    * Split discipline holds BY CONSTRUCTION: only train rows enter the
    * index, only test rows probe. Per-probe cost is nprobe·|list| —
    * corpus-linear build, candidate-linear search, no cross product
    * anywhere (PlanSpec-fenced). */
  def contaminationSemanticIvf(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, trainSixteenths: Int = 13,
      tau: Double = 0.45, nlist: Int = 10, buckets: Int = 8,
      nprobe: Int = 2): DataFrame = {
    require(tau > 0.0, s"bad tau=$tau")
    contaminationProbeScored(spark, e, tableName, path, trainSixteenths,
      nlist, buckets, nprobe)
      .filter(col("score") >= tau)
      .select(col("test_vec"), col("vec_id").as("train_vec"), col("score"))
  }

  /** Shared by [[contaminationSemanticIvf]] and its audit: build the
    * quantized train-split index, probe with the test split, score every
    * probe candidate — UNFILTERED (test_vec, vec_id, score) rows. */
  private def contaminationProbeScored(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, trainSixteenths: Int,
      nlist: Int, buckets: Int, nprobe: Int): DataFrame = {
    require(trainSixteenths >= 1 && trainSixteenths <= 15,
      s"trainSixteenths must be in [1, 15], got $trainSixteenths")
    val boundary = trainSixteenths.toHexString
    // the split_assign md5-nibble rule, verbatim from the brute operator
    val isTrain =
      substring(md5(col("vec_id").cast("string")), 1, 1) < boundary
    probeScoredBy(spark, e, tableName, path, isTrain, nlist, buckets,
      nprobe).withColumnRenamed("probe_vec", "test_vec")
  }

  /** The generic persisted-quantized-IVF probe: rows selected by
    * `isIndexed` are written as the bucketed code index, the complement
    * probes its `nprobe` nearest lists (float centroid ranking on the
    * tiny broadcast centroid table), and every candidate is scored with
    * the knn_quantized integer chain — UNFILTERED (probe_vec, vec_id,
    * score) rows, where vec_id is the indexed side. One definition under
    * [[contaminationSemanticIvf]] (isIndexed = the split rule) and
    * [[labelPropagationIvf]] (isIndexed = the labeled-slice rule), so
    * the plan fences (bucketed scan, zero index-side Exchange, one
    * probe-side c_id Exchange, no cartesian) are proven once. */
  private def probeScoredBy(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, isIndexed: Column,
      nlist: Int, buckets: Int, nprobe: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val centroids = writeIvfIndexQuantized(e.filter(isIndexed), tableName,
      path, nlist, buckets)
    val probeW = Window.partitionBy("probe_vec").orderBy(col("d"), col("c_id"))
    val probes = quantize(e.filter(!isIndexed))
      .filter(col("qnrm") > lit(0.0))
      .select(col("vec_id").as("probe_vec"), col("v"), col("nrm"),
        col("qv").as("sqv"), col("qnrm").as("snrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("probe_vec"), col("sqv"), col("snrm"), col("c_id"))
    probes
      .join(graft.sources.Staged.liveTable(spark, tableName).filter(col("qnrm") > lit(0.0)),
        Seq("c_id"))
      .withColumn("score",
        floor(graft.functions.ByteDot(col("qv"), col("sqv")).cast("double")
            * lit(10000.0) / (col("qnrm") * col("snrm")) + lit(0.5))
          .cast("double") / lit(10000.0))
  }

  /** Probe-coverage accounting for [[contaminationSemanticIvf]] (the
    * lsh_bucket_audit discipline — every candidate-pruning operator
    * carries an audit row): one row — train rows indexed, test rows
    * probing, candidate pairs actually scored through the probe
    * equijoin, and pairs at or above `tau`. The pruning factor
    * n_candidates / (n_train · n_test) is what replaces the brute cross
    * product; at fixed nprobe/nlist it stays ≈ nprobe/nlist of the
    * brute pair count INDEPENDENT of corpus size, which is the number a
    * pipeline watches when tuning probe width against missed-
    * contamination risk. */
  def contaminationSemanticIvfAudit(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, trainSixteenths: Int = 13,
      tau: Double = 0.45, nlist: Int = 10, buckets: Int = 8,
      nprobe: Int = 2): DataFrame = {
    require(tau > 0.0, s"bad tau=$tau")
    val scored = contaminationProbeScored(spark, e, tableName, path,
      trainSixteenths, nlist, buckets, nprobe)
    val boundary = trainSixteenths.toHexString
    val isTrain =
      substring(md5(col("vec_id").cast("string")), 1, 1) < boundary
    val q = quantize(e).filter(col("qnrm") > lit(0.0))
    val sizes = q.agg(
      sum(when(isTrain, 1L).otherwise(0L)).as("n_train"),
      sum(when(isTrain, 0L).otherwise(1L)).as("n_test"))
    val stats = scored.agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("score") >= tau, 1L).otherwise(0L)).as("n_flagged"))
    sizes.crossJoin(broadcast(stats))
      .select(col("n_train"), col("n_test"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
  }

  /** Semi-supervised LABEL PROPAGATION over the quantized embedding
    * space — the cheap labeling pass a training pipeline runs when only
    * a slice of the corpus carries curated labels (domain tags, quality
    * grades, license classes): every UNLABELED vector adopts the
    * majority label among its τ-near LABELED neighbors. The labeled
    * slice is a pure md5-nibble row function of vec_id (salted ':lbl'
    * so it draws independently of the split_assign rule), scoring is
    * the knn_quantized integer chain, votes are exact integer counts,
    * and the winner is decided on (count desc, label asc) — a total
    * order over integers, so the prediction cannot drift between
    * engines or partitionings and the whole operator sits under the
    * hash gate. Vectors with no τ-neighbor get no row (integer
    * membership — the "abstain" a real pipeline routes to manual
    * labeling). Pair join = the sanctioned brute baseline (unlabeled
    * minority broadcast); the 100 TB swap is [[labelPropagationIvf]].
    * Label domain must stay within Int (the -label tie-break negation);
    * votes never overflow (≤ corpus cardinality). */
  def labelPropagation(e: DataFrame, labeledSixteenths: Int = 12,
      tau: Double = 0.3): DataFrame =
    voteRollup(labelPropPairs(e, labeledSixteenths, tau))

  /** The UNROLLED (unlabeled, labeled) vote pairs ≥ τ — shared by the
    * brute and IVF formulations so the rollup is one definition. */
  private[graft] def labelPropPairs(e: DataFrame, labeledSixteenths: Int,
      tau: Double): DataFrame = {
    require(labeledSixteenths >= 1 && labeledSixteenths <= 15,
      s"labeledSixteenths must be in [1, 15], got $labeledSixteenths")
    require(tau > 0.0, s"bad tau=$tau")
    val q = quantize(e).filter(col("qnrm") > lit(0.0))
      .withColumn("labeled", isLabeled(labeledSixteenths))
      .select(col("vec_id"), col("label"), col("labeled"), col("qv"),
        col("qnrm"))
      .localCheckpoint(true)
    val lab = q.filter(col("labeled"))
      .select(col("vec_id").as("lab_vec"), col("label").as("lab_label"),
        col("qv").as("lqv"), col("qnrm").as("lnrm"))
    val unl = q.filter(!col("labeled"))
      .select(col("vec_id"), col("label").as("true_label"),
        col("qv").as("uqv"), col("qnrm").as("unrm"))
    lab.crossJoin(broadcast(unl))
      .withColumn("score",
        floor(graft.functions.ByteDot(col("lqv"), col("uqv")).cast("double")
            * lit(10000.0) / (col("lnrm") * col("unrm")) + lit(0.5))
          .cast("double") / lit(10000.0))
      .filter(col("score") >= tau)
      .select(col("vec_id"), col("true_label"), col("lab_vec"),
        col("lab_label"), col("score"))
  }

  /** The labeled-slice membership rule (salted md5 nibble on vec_id). */
  private def isLabeled(labeledSixteenths: Int): Column =
    substring(md5(concat_ws(":", col("vec_id").cast("string"), lit("lbl"))),
      1, 1) < labeledSixteenths.toHexString

  /** Majority vote per unlabeled vector: one hash agg to (vec, label)
    * counts, one to the argmax — max_by over struct(cnt, -label) ≡
    * (count desc, label asc), the es_top_movers total-order discipline;
    * never a corpus window. */
  private def voteRollup(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("vec_id"), col("true_label"), col("lab_label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("vec_id"), col("true_label"))
      .agg(
        sum(col("cnt")).as("n_neighbors"),
        max_by(struct(col("cnt"), col("lab_label")),
          struct(col("cnt"), -col("lab_label"))).as("pick"))
      .select(col("vec_id"), col("true_label"),
        col("pick.lab_label").as("pred_label"),
        col("pick.cnt").as("n_votes"),
        col("n_neighbors"))

  /** The frozen labeled-slice code table
    * [[graft.streaming.Streaming.labelPropStream]] serves from:
    * (vec_id, label, qv, qnrm) of labeled vectors with positive norms —
    * the bounded serving artifact (curated labeled sets are small by
    * construction; the writeBpeModel persisted-model posture). */
  def labeledCodes(e: DataFrame, labeledSixteenths: Int = 12): DataFrame =
    quantize(e).filter(col("qnrm") > lit(0.0))
      .filter(isLabeled(labeledSixteenths))
      .select(col("vec_id"), col("label"), col("qv"), col("qnrm"))

  /** The probe-only half of [[labelPropagationIvf]] — propagate labels
    * for a QUERY batch against an ALREADY-BUILT quantized index of the
    * labeled slice (the [[tripletProbe]] posture): queries outside the
    * labeled slice rank the float centroid table for their `nprobe`
    * nearest lists, meet the bucketed code lists in a c_id equijoin,
    * score with the identical integer e4 chain, pick up voter labels
    * through one thin key equijoin, and feed the SAME [[voteRollup]].
    * Separated from the build so the live propagator
    * ([[graft.streaming.Streaming.runLabelPropProbe]]) can replay it
    * per micro-batch against the frozen artifacts — a vector's vote
    * tally is a pure function of its own row against the index, so
    * per-batch semantics are exact and NO driver-resident labeled-code
    * closure exists on the serving path (the corpus-scale labeled side
    * the closure variant's scale-honesty note routes here). */
  def labelPropProbe(spark: SparkSession, tableName: String,
      centroids: DataFrame, labels: DataFrame, queries: DataFrame,
      labeledSixteenths: Int = 12, tau: Double = 0.3,
      nprobe: Int = 2): DataFrame = {
    require(labeledSixteenths >= 1 && labeledSixteenths <= 15,
      s"labeledSixteenths must be in [1, 15], got $labeledSixteenths")
    require(tau > 0.0, s"bad tau=$tau")
    val probeW = Window.partitionBy("probe_vec").orderBy(col("d"), col("c_id"))
    val probes = quantize(queries.filter(!isLabeled(labeledSixteenths)))
      .filter(col("qnrm") > lit(0.0))
      .select(col("vec_id").as("probe_vec"),
        col("label").as("true_label"), col("v"), col("nrm"),
        col("qv").as("sqv"), col("qnrm").as("snrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("probe_vec"), col("true_label"), col("sqv"),
        col("snrm"), col("c_id"))
    val pairs = probes
      .join(graft.sources.Staged.liveTable(spark, tableName)
        .filter(col("qnrm") > lit(0.0)), Seq("c_id"))
      .withColumn("score",
        floor(graft.functions.ByteDot(col("qv"), col("sqv")).cast("double")
            * lit(10000.0) / (col("qnrm") * col("snrm")) + lit(0.5))
          .cast("double") / lit(10000.0))
      .filter(col("score") >= tau)
      .select(col("probe_vec").as("vec_id"), col("true_label"),
        col("vec_id").as("lab_vec"), col("score"))
      .join(labels.select(col("vec_id").as("lab_vec"),
        col("label").as("lab_label")), Seq("lab_vec"))
      .select(col("vec_id"), col("true_label"), col("lab_vec"),
        col("lab_label"), col("score"))
    voteRollup(pairs)
  }

  /** Propagation-quality confusion rollup over the docs the operator
    * actually labels — the sign-off view (the domain_classifier_eval
    * discipline): (true, predicted, count). The diagonal mass is the
    * accuracy a pipeline tracks before trusting propagated labels. */
  def labelPropagationEval(e: DataFrame, labeledSixteenths: Int = 12,
      tau: Double = 0.3): DataFrame =
    labelPropagation(e, labeledSixteenths, tau)
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))

  /** Label propagation over the PERSISTED quantized IVF index — the
    * 100 TB path (the contaminationSemanticIvf posture, one shared
    * probe definition): the LABELED slice is written as the bucketed
    * code index, unlabeled vectors probe their nprobe nearest lists,
    * candidates are scored with the identical integer chain and fed to
    * the SAME vote rollup. Emitted votes are a subset of the brute
    * pairs with bit-identical scores (KnnSpec), so predictions can
    * differ from brute only where the probe pruned a voter — the
    * recall trade nprobe tunes; rows-only for that reason. Labels ride
    * two candidate-sized key equijoins (the index stores codes only). */
  def labelPropagationIvf(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, labeledSixteenths: Int = 12,
      tau: Double = 0.3, nlist: Int = 10, buckets: Int = 8,
      nprobe: Int = 2): DataFrame = {
    require(labeledSixteenths >= 1 && labeledSixteenths <= 15,
      s"labeledSixteenths must be in [1, 15], got $labeledSixteenths")
    require(tau > 0.0, s"bad tau=$tau")
    voteRollup(labelPropPairsIvf(spark, e, tableName, path,
      labeledSixteenths, tau, nlist, buckets, nprobe))
  }

  /** The IVF-probe vote pairs (same columns as [[labelPropPairs]]). */
  private[graft] def labelPropPairsIvf(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, labeledSixteenths: Int,
      tau: Double, nlist: Int, buckets: Int, nprobe: Int): DataFrame =
    probeScoredBy(spark, e, tableName, path, isLabeled(labeledSixteenths),
      nlist, buckets, nprobe)
      .filter(col("score") >= tau)
      .withColumnRenamed("vec_id", "lab_vec")
      .join(e.select(col("vec_id").as("lab_vec"),
        col("label").as("lab_label")), Seq("lab_vec"))
      .withColumnRenamed("probe_vec", "vec_id")
      .join(e.select(col("vec_id"), col("label").as("true_label")),
        Seq("vec_id"))
      .select(col("vec_id"), col("true_label"), col("lab_vec"),
        col("lab_label"), col("score"))

  /** Hard-TRIPLET MINING over the quantized embedding space (r17) —
    * the contrastive-training curation pass that turns a labeled
    * corpus into (anchor, hardest positive, hardest negative) rows:
    * for each anchor in a deterministic `vec_id % anchorMod` slice,
    * the SAME-label pool vector with the LOWEST cosine (the pair the
    * model most needs to pull together) and the DIFFERENT-label pool
    * vector with the HIGHEST cosine (the impostor it most needs to
    * push apart), plus the margin between them and an `is_hard` flag
    * (margin below `marginE4` = the triplet sits in the active-loss
    * region — the rows a curriculum actually trains on). The pool is
    * the NON-anchor complement (the query-batch-vs-corpus framing the
    * IVF sibling needs; self-exclusion falls out for free).
    *
    * Oracle-EXACT end to end: scoring is the knn_quantized integer
    * chain kept as the raw e4 integer (floor-half-up of the exact
    * ByteDot — never a float round), argmin/argmax are struct-min
    * aggregates on (score_e4, cand_id) / (−score_e4, cand_id) — total
    * integer orders with deterministic lexicographic ties, never a
    * window (the DuckDB oracle runs the row_number formulation:
    * two-formulation cross-check) — and membership is integer (an
    * anchor missing either a same-label or a different-label pool
    * vector emits no row: the "abstain" a pipeline routes around).
    * The margin is a difference of exact integers, so `is_hard` can
    * never sit one ulp from the threshold.
    *
    * Scale: this brute anchors×pool join is the sanctioned baseline
    * (the knn_brute posture — anchors are a bounded sample); the
    * 100 TB path is [[tripletMineIvf]], which mines the identical
    * rollup from persisted-IVF probe candidates. */
  def tripletMine(e: DataFrame, anchorMod: Long = 25L,
      marginE4: Long = 500L): DataFrame = {
    require(anchorMod >= 2L, s"anchorMod must be >= 2, got $anchorMod")
    val qe = quantize(e).filter(col("qnrm") > lit(0.0))
      .select(col("vec_id"), col("label"), col("qv"), col("qnrm"))
    val isAnchor = col("vec_id") % lit(anchorMod) === lit(0L)
    val a = qe.filter(isAnchor)
      .select(col("vec_id").as("anchor_id"),
        col("label").as("anchor_label"),
        col("qv").as("aqv"), col("qnrm").as("anrm"))
    val pool = qe.filter(!isAnchor)
    val scored = a.join(pool.as("c"), col("anchor_id") =!= col("c.vec_id"))
      .select(col("anchor_id"), col("anchor_label"),
        col("c.vec_id").as("cand_id"),
        (col("c.label") === col("anchor_label")).as("same"),
        floor(graft.functions.ByteDot(col("aqv"), col("qv")).cast("double")
            * lit(10000.0) / (col("anrm") * col("qnrm")) + lit(0.5))
          .cast("long").as("score_e4"))
    tripletRollup(scored, marginE4)
  }

  /** Triplet mining over the PERSISTED quantized IVF index — the
    * 100 TB path (the labelPropagationIvf posture, the one shared
    * [[probeScoredBy]] definition): the non-anchor pool is written as
    * the bucketed code index, anchors probe their `nprobe` nearest
    * lists, candidates are scored with the identical integer chain and
    * fed to the SAME rollup. With nprobe = nlist the probe is
    * exhaustive and the output is row-identical to [[tripletMine]]
    * (KnnSpec asserts it); with a pruned probe the mined positive can
    * only be ≥ and the negative ≤ the brute choice in score — the
    * recall trade nprobe tunes. Rows-only (probe recall depends on the
    * seeded k-means assignment). Labels ride two thin key equijoins
    * (the index stores codes only). */
  def tripletMineIvf(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, anchorMod: Long = 25L,
      marginE4: Long = 500L, nlist: Int = 10, buckets: Int = 8,
      nprobe: Int = 2): DataFrame = {
    require(anchorMod >= 2L, s"anchorMod must be >= 2, got $anchorMod")
    val isAnchor = col("vec_id") % lit(anchorMod) === lit(0L)
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val centroids = writeIvfIndexQuantized(e.filter(!isAnchor), tableName,
      path, nlist, buckets)
    tripletProbe(spark, tableName, centroids,
      e.select(col("vec_id"), col("label")), e.filter(isAnchor),
      marginE4, nprobe)
  }

  /** The probe-only half of [[tripletMineIvf]] — mine triplets for a
    * QUERY batch against an ALREADY-BUILT quantized index (the
    * searchIvfIndexQuantized posture): anchors rank the float centroid
    * table for their nprobe nearest lists, meet the bucketed code
    * lists in a c_id equijoin, score with the integer e4 chain, pick
    * up candidate labels through one thin key equijoin, and feed the
    * SAME [[tripletRollup]]. Separated from the build so the live
    * miner ([[graft.streaming.Streaming]]'s triplet probe) can replay
    * it per micro-batch against the frozen artifacts — each anchor's
    * triplet is a pure function of its own row against the index, so
    * per-batch semantics are exact. */
  def tripletProbe(spark: SparkSession, tableName: String,
      centroids: DataFrame, labels: DataFrame, queries: DataFrame,
      marginE4: Long = 500L, nprobe: Int = 2): DataFrame = {
    val probeW = Window.partitionBy("anchor_id")
      .orderBy(col("d"), col("c_id"))
    val probes = quantize(queries).filter(col("qnrm") > lit(0.0))
      .select(col("vec_id").as("anchor_id"),
        col("label").as("anchor_label"), col("v"), col("nrm"),
        col("qv").as("sqv"), col("qnrm").as("snrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("anchor_id"), col("anchor_label"), col("sqv"),
        col("snrm"), col("c_id"))
    val scored = probes
      .join(graft.sources.Staged.liveTable(spark, tableName).filter(col("qnrm") > lit(0.0)),
        Seq("c_id"))
      .select(col("anchor_id"), col("anchor_label"),
        col("vec_id").as("cand_id"),
        floor(graft.functions.ByteDot(col("qv"), col("sqv")).cast("double")
            * lit(10000.0) / (col("qnrm") * col("snrm")) + lit(0.5))
          .cast("long").as("score_e4"))
      .join(labels.select(col("vec_id").as("cand_id"),
        col("label").as("cand_label")), Seq("cand_id"))
      .select(col("anchor_id"), col("anchor_label"), col("cand_id"),
        (col("cand_label") === col("anchor_label")).as("same"),
        col("score_e4"))
    tripletRollup(scored, marginE4)
  }

  /** Shared (anchor, cand, same, score_e4) → triplet rollup for
    * [[tripletMine]] and [[tripletMineIvf]] — ONE definition so the
    * argmin/argmax and membership semantics cannot drift between the
    * brute baseline and the IVF path. */
  private def tripletRollup(scored: DataFrame,
      marginE4: Long): DataFrame =
    scored.groupBy(col("anchor_id"), col("anchor_label"))
      .agg(
        sum(when(col("same"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("same"), 0L).otherwise(1L)).as("n_neg"),
        // hardest positive: min (score, id) over same-label candidates
        min(when(col("same"),
          struct(col("score_e4"), col("cand_id")))).as("pos_s"),
        // hardest negative: min (−score, id) = max score, tie → min id
        min(when(!col("same"),
          struct((-col("score_e4")).as("nscore_e4"), col("cand_id"))))
          .as("neg_s"))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("anchor_id"), col("anchor_label"),
        col("n_pos"), col("n_neg"),
        col("pos_s.cand_id").as("pos_id"),
        col("pos_s.score_e4").as("pos_e4"),
        col("neg_s.cand_id").as("neg_id"),
        (-col("neg_s.nscore_e4")).as("neg_e4"))
      .withColumn("margin_e4", col("pos_e4") - col("neg_e4"))
      .withColumn("is_hard",
        when(col("margin_e4") < lit(marginE4), 1L).otherwise(0L))

  /** Per-label TRIPLET HEALTH rollup over [[tripletMine]] — the
    * sign-off view a contrastive-curation run reads (the
    * lsh_bucket_audit discipline): anchors mined, hard triplets and
    * their share (integer half-up milli — n_anchors ≥ 1 by
    * construction), and the exact margin sum / min / max per label. A
    * label whose margins collapse (negative sum, hard share near
    * 1000) is one whose classes the embedding space cannot separate —
    * the signal that gates training on propagated labels. All columns
    * are exact integers over the already-integer triplet rows; NO mean
    * column by design: margin sums can be negative, and integer `div`
    * truncates toward zero in Spark but floors in DuckDB — the
    * negative-division trap this repo avoids by emitting the sum and
    * count instead. */
  def tripletStats(e: DataFrame, anchorMod: Long = 25L,
      marginE4: Long = 500L): DataFrame =
    tripletMine(e, anchorMod, marginE4)
      .groupBy(col("anchor_label"))
      .agg(
        count(lit(1)).as("n_anchors"),
        sum(col("is_hard")).as("n_hard"),
        sum(col("margin_e4")).as("margin_sum_e4"),
        min(col("margin_e4")).as("margin_min_e4"),
        max(col("margin_e4")).as("margin_max_e4"))
      .withColumn("hard_milli",
        expr("(2 * n_hard * 1000 + n_anchors) div (2 * n_anchors)"))

  /** Per-label embedding DRIFT monitor in the quantized space — the
    * embedding dual of `quality_drift`: for each label (source /
    * crawl-batch id), the cosine between the label's int8-centroid-sum
    * vector and the corpus's, flagging batches whose embedding
    * distribution points away from the corpus. Integer-exact end to
    * end, which is what makes it oracle-checkable: codes come from
    * [[quantize]] (floor-half-up, engine-identical), the per-(label,
    * dim) and per-dim sums are exact integer aggregates (zero vectors
    * contribute 0 — no special-casing), the corpus sums roll up from
    * the label sums (ONE pass over the exploded codes, never a second
    * corpus scan), degenerate all-zero centroids are fenced by the
    * INTEGER predicates s2 > 0 / c2 > 0 (0/0 = NaN orders differently
    * across engines), and the displayed cosine is ONE floor-half-up
    * double expression over exact integers. Shuffles: the exploded
    * (label, dim) agg — 64·|labels| groups — plus a broadcast-sized
    * dim join; nothing pairwise. Long-overflow bound: the largest
    * aggregate is per-label c2 = Σ_pos c_pos² with |c_pos| ≤ 127·n, so
    * c2 ≤ 64·(127·n)² — under 2⁶³ only for n ≲ 3·10⁶ vectors per
    * monitored corpus. Past that Spark's long sum WRAPS silently while
    * the DuckDB oracle sums in HUGEINT then casts (a gate mismatch at
    * best, a silent wrong answer in rows-only use) — the monitor is a
    * per-crawl-batch pass by design; scope the input, not the math, at
    * 100 TB — and since r14 the bound is ENFORCED, not documented: the
    * plan carries [[momentGuard]] on the exact vector count, so an
    * over-bound batch raises a named error instead of wrapping. */
  def embDriftQuantized(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame = {
    val codes = quantize(e)
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "code")))
    val byLabel = codes.groupBy(col("label"), col("pos"))
      .agg(sum(col("code").cast("long")).as("s"),
        count(lit(1)).as("n_vecs"))
      // dims·|labels| rows feeding TWO consumers (the corpus rollup and
      // the scoring join) — materialize once or the corpus is scanned
      // and re-quantized twice (PlanSpec pins zero parquet scans in the
      // final plan)
      .localCheckpoint(true)
    // n_tot (exact corpus count — counts cannot wrap) rides along so the
    // c2 bound can be CHECKED where c2 is consumed: c2 ≤ 64·(127·n_tot)²
    // and every other moment is smaller, so one guard on n_tot covers
    // dot, s2 and c2 alike
    val corpus = byLabel.groupBy(col("pos"))
      .agg(sum(col("s")).as("c"), sum(col("n_vecs")).as("n_tot"))
    byLabel.join(broadcast(corpus), "pos")
      .groupBy(col("label"))
      .agg(max(col("n_vecs")).as("n_vecs"), // identical across dims
        max(col("n_tot")).as("n_tot"),      // identical across dims
        sum(col("s") * col("c")).as("dot"),
        sum(col("s") * col("s")).as("s2"),
        sum(col("c") * col("c")).as("c2"))
      .filter(col("s2") > lit(0L) && col("c2") > lit(0L))
      .select(col("label").cast("long").as("label"),
        (col("n_vecs") + momentGuard(col("n_tot"), maxVecs)).as("n_vecs"),
        (floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("s2").cast("double")) * sqrt(col("c2").cast("double")))
          + lit(0.5)).cast("double") / lit(10000.0)).as("centroid_cos"))
  }

  /** Exact integer GRAM MATRIX over the quantized code space (r18) —
    * the raw material of embedding-geometry health checks: one row per
    * dimension pair (di ≤ dj) with g = Σ_vecs qv[di]·qv[dj], an exact
    * BIGINT (|code| ≤ 127 ⇒ |term| ≤ 16129, so the sum wraps only past
    * n ≈ 5.7·10¹⁴ vectors — enforced in-plan by the same momentGuard
    * posture as the drift family, folded into the kept n_vecs column).
    * The diagonal is the per-dim second moment ([[embDimStats]] shows
    * means/dead dims; this adds the CROSS structure), and the
    * off-diagonal mass is what [[embAnisotropy]] eigen-analyzes.
    *
    * Scale: each vector expands to its dim·(dim+1)/2 = 2080 upper-
    * triangle terms (a FIXED multiplier — linear in corpus size), and
    * the agg map-side combines onto 2080 keys per partition, so one
    * row per (pair × partition) crosses the wire. Degenerate vectors
    * (null/empty/zero/NaN/Inf) quantize to zero codes or empty arrays
    * and are filtered by the size guard — no evidence, no term. */
  def embGram(e: DataFrame, maxVecs: Long = MaxGramVecs): DataFrame =
    quantize(e)
      .filter(size(col("qv")) > 0)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(qv) - 1), i ->
             transform(sequence(i, size(qv) - 1), j ->
               struct(i AS di, j AS dj,
                 CAST(qv[i] AS BIGINT) * CAST(qv[j] AS BIGINT) AS t))))"""))
        .as("p"))
      .select(col("p.di").cast("long").as("di"),
        col("p.dj").cast("long").as("dj"), col("p.t").as("t"))
      .groupBy(col("di"), col("dj"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("t")).as("g"))
      .select(col("di"), col("dj"),
        (col("n_vecs") + momentGuard(col("n_vecs"), maxVecs)).as("n_vecs"),
        col("g"))

  /** Gram-sum overflow ceiling: Σ |code_i·code_j| ≤ 127²·n < 2⁶³ ⇒
    * n < 5.7·10¹⁴ vectors — effectively unreachable, enforced anyway
    * (the momentGuard doctrine: no implicit bound). */
  private[graft] val MaxGramVecs = 500000000000000L

  /** Embedding ANISOTROPY audit (r18) — the collapse detector of
    * published embedding-health work (anisotropic embedding spaces
    * concentrate in a narrow cone; retrieval and clustering quality
    * degrade long before any per-dim stat moves): the dominant
    * eigenvalue share of the quantized Gram matrix, computed
    * DETERMINISTICALLY from [[embGram]]'s exact integer table —
    * power iteration with a fixed NON-SYMMETRIC start (v(i) = 1 + i;
    * an all-ones start is orthogonal to the dominant eigenvector of
    * any anti-correlated rank-1 Gram such as [[1,−1],[−1,1]], which
    * would report a fully collapsed space as share 0) plus a
    * rotating-basis restart whenever an iterate lands exactly in the
    * null space, and a fixed 100 rounds over a dim×dim matrix that is
    * BOUNDED (dim ≤ 4096 enforced
    * below; 64 here), so the driver-side step is O(dim²) arithmetic on
    * exact inputs, reproducible across runs and partitionings.
    * `top_eig_share` ≈ 1/dim is isotropic health; → 1 is collapse.
    * Rows-only (eigendecomposition is not ANSI-expressible; the spec
    * plants a rank-1 corpus → share ≈ 1 and an isotropic one → share
    * ≈ 1/dim, and cross-checks the trace against the Gram diagonal
    * exactly).
    *
    * Past dim = 4096 the driver matrix would be the bottleneck, so the
    * dim fence SWITCHES to [[embAnisotropyDistributed]] instead of
    * raising (r14 verdict #6: the fence is a preference, not a
    * ceiling) — same start vector, same round count, each round one
    * broadcast-join + hash agg over the dim²-bounded edge table. */
  def embAnisotropy(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // the count-then-collect bound (the boundedCollect posture): the
    // Gram table is dim·(dim+1)/2 rows by construction — a mis-shaped
    // input switches to the engine path instead of OOMing the driver
    val gram = embGram(e).localCheckpoint(true) // 2 consumers below
    val nRows = gram.count()
    if (nRows > 4096L * 4097L / 2L)
      return anisotropyDistributed(gram)
    val rows = gram.collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(3)))
    if (rows.isEmpty) {
      Seq.empty[(Long, Long, Double, Double)]
        .toDF("dim", "n_vecs", "top_eig_share", "trace")
    } else {
      val dim = rows.map(_._2).max + 1
      val m = Array.ofDim[Double](dim, dim)
      rows.foreach { case (i, j, g) => m(i)(j) = g.toDouble
        m(j)(i) = g.toDouble }
      val trace = (0 until dim).map(i => m(i)(i)).sum
      var v = Array.tabulate(dim)(i => 1.0 + i)
      var lambda = 0.0
      var restart = 0
      for (_ <- 1 to 100) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => m(i)(j) * v(j)).sum)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 0.0) {
          v = w.map(_ / nrm)
          lambda = (0 until dim).map(i =>
            (0 until dim).map(j => v(i) * m(i)(j) * v(j)).sum).sum
        } else {
          // v landed exactly in the null space: restart from the next
          // basis vector (deterministic; cycles through all of them,
          // so any non-zero matrix is eventually escaped)
          v = Array.tabulate(dim)(i => if (i == restart % dim) 1.0 else 0.0)
          restart += 1
        }
      }
      val nVecs = gram.filter(col("di") === 0L && col("dj") === 0L)
        .collect().headOption.map(_.getLong(2)).getOrElse(0L)
      Seq((dim.toLong, nVecs,
        if (trace > 0.0) lambda / trace else 0.0, trace))
        .toDF("dim", "n_vecs", "top_eig_share", "trace")
    }
  }

  /** Engine-side dominant-eigenshare — the distributed face of
    * [[embAnisotropy]] past the dim ≤ 4096 fence (r14 verdict #6): the
    * SAME power iteration (v(i) = 1 + i start, 100 rounds, rotating-
    * basis null-space restart) where each round's matrix-vector
    * product is ONE broadcast-join + hash agg over the symmetric Gram
    * EDGE TABLE (≤ dim² rows, corpus-independent) and the only
    * driver traffic per round is the scalar norm (the bpeTrain O(1)
    * control-decision discipline). The dim-sized iterate is eagerly
    * checkpointed every round (the kmeans localCheckpoint discipline —
    * without it, PLANNING the 100-round lineage is the bottleneck).
    * Engine hash-agg summation order differs from the driver loop's
    * ascending-j order, so shares agree to FP tolerance, not bit-exact
    * — the operator is rows-only either way; KnnSpec proves
    * engine ≡ driver eigenshare on the planted rank-1 / isotropic /
    * anti-correlated corpora. */
  def embAnisotropyDistributed(e: DataFrame): DataFrame =
    anisotropyDistributed(embGram(e).localCheckpoint(true))

  private def anisotropyDistributed(gram: DataFrame): DataFrame = {
    val spark = gram.sparkSession
    import spark.implicits._
    val scalars = gram.agg(
      max(col("dj")).as("mx"),
      sum(when(col("di") === col("dj"), col("g"))
        .otherwise(lit(0L))).as("trace"),
      max(when(col("di") === 0L && col("dj") === 0L, col("n_vecs")))
        .as("n_vecs")).collect().head
    if (scalars.isNullAt(0)) {
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("dim", "n_vecs", "top_eig_share", "trace")
    }
    val dim = scalars.getLong(0) + 1L
    val trace = scalars.getLong(1).toDouble
    val nVecs = if (scalars.isNullAt(2)) 0L else scalars.getLong(2)
    // symmetric edge list (both triangles; the diagonal once)
    val edges = gram.select(col("di").as("i"), col("dj").as("j"),
        col("g").cast("double").as("g"))
      .union(gram.filter(col("di") =!= col("dj"))
        .select(col("dj").as("i"), col("di").as("j"),
          col("g").cast("double").as("g")))
      .localCheckpoint(true) // consumed twice per round, 100 rounds
    var v = spark.range(dim)
      .select(col("id").as("j"), (col("id") + 1L).cast("double").as("x"))
      .localCheckpoint(true)
    var restart = 0L
    for (_ <- 1 to 100) {
      // w = M·v: one broadcast equijoin on j + one hash agg to dim rows
      val w = edges.join(broadcast(v), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("g") * col("x")).as("wx"))
      val nrm2 = w.agg(sum(col("wx") * col("wx"))).collect()
        .head.getDouble(0)
      if (nrm2 > 0.0) {
        val nrm = math.sqrt(nrm2)
        v = w.select(col("i").as("j"), (col("wx") / lit(nrm)).as("x"))
          .localCheckpoint(true)
      } else {
        v = spark.range(dim)
          .select(col("id").as("j"),
            when(col("id") === lit(restart % dim), lit(1.0))
              .otherwise(lit(0.0)).as("x"))
          .localCheckpoint(true)
        restart += 1L
      }
    }
    // λ = vᵀ·M·v over the final normalized iterate
    val lambda = edges
      .join(broadcast(v), Seq("j"))
      .join(broadcast(v.select(col("j").as("i"), col("x").as("xi"))),
        Seq("i"))
      .agg(sum(col("g") * col("x") * col("xi"))).collect()
      .head.getDouble(0)
    Seq((dim, nVecs, if (trace > 0.0) lambda / trace else 0.0, trace))
      .toDF("dim", "n_vecs", "top_eig_share", "trace")
  }

  /** The documented long-overflow ceiling of the integer moment family
    * (emb_drift and its four siblings): with dims = 64 and |code| ≤ 127,
    * the largest aggregate is Σ_pos s² ≤ 64·(127·n)², which stays under
    * 2⁶³ only for n ≲ 3·10⁶ vectors per monitored scope. */
  private[graft] val MaxMomentVecs = 3000000L

  /** The ENFORCED face of [[MaxMomentVecs]] (r13 verdict: a bound that
    * lives in a comment wraps silently; one that lives in the plan fails
    * loudly): evaluates to an integer 0 while `n` is within bound and
    * RAISES past it. Callers fold it into a kept output column
    * (`x + momentGuard(...)`) so column pruning can never drop the
    * check; adding integer 0 leaves the column's value — and with it
    * every oracle — untouched. `n` must be an exact COUNT (counts cannot
    * wrap), never a sum that might already have overflowed. */
  private def momentGuard(n: Column, maxVecs: Long): Column =
    coalesce(
      assert_true(n <= lit(maxVecs),
        concat(lit("embedding-moment overflow fence: "), n.cast("string"),
          lit(s" vectors in one monitored scope exceed $maxVecs — the " +
            "exact BIGINT moment sums (up to 64·(127·n)²) would wrap " +
            "silently; scope the input batch (the emb_drift contract) " +
            "instead of widening the math"))).cast("long"),
      lit(0L))

  /** Per-vector centroid AFFINITY in the quantized space — the
    * prototype-affinity signal of published data-pruning work (rank
    * examples by alignment with their class/domain prototype; prune or
    * re-queue the tail): for every vector, the cosine between its int8
    * codes and its label's centroid CODE SUM. Integer-exact end to end
    * (the emb_drift_quantized contract): codes from [[quantize]],
    * per-(label, dim) centroid sums and per-vector dots are exact
    * BIGINT aggregates, degenerate masses are fenced by INTEGER
    * predicates (q2 > 0 per vector, s2 > 0 per label), and the
    * displayed score is ONE floor-half-up double expression — so the
    * whole per-vector diagnostic sits under the hash gate, and the raw
    * integer `dot` rides along as the membership key downstream flags
    * threshold on. Shuffles: one (label, dim)-group agg, one broadcast
    * centroid join re-agged per vector (n·dims partials — the
    * emb_drift shape), nothing pairwise. Same per-label long-overflow
    * bound as emb_drift — ENFORCED per label by [[momentGuard]] on the
    * exact count riding the centroid sums. */
  def embCentroidAffinity(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame = {
    val codes = explodedCodes(e)
      // feeds the centroid agg AND the scoring join — one materialization
      .localCheckpoint(true)
    val cent = centroidSumsCounted(codes)
      .localCheckpoint(true) // 2 consumers: the norm rollup + the dot join
    val snrm = cent.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("s2"), max(col("nl")).as("nl"))
      .filter(col("s2") > lit(0L))
    codes.join(broadcast(cent.select("label", "pos", "s")),
        Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"), col("q2"))
      .agg(sum(col("code").cast("long") * col("s")).as("dot"))
      .join(broadcast(snrm), "label")
      .select(col("vec_id"), col("label"),
        (col("dot") + momentGuard(col("nl"), maxVecs)).as("dot"),
        (floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("q2").cast("double")) * sqrt(col("s2").cast("double")))
          + lit(0.5)).cast("double") / lit(10000.0)).as("score"))
  }

  /** Nearest-centroid CONFUSION matrix — the centroid-classifier
    * evaluation of a labeling ([[embClusterQuality]] says WHETHER labels
    * collapse; this says WHICH labels absorb each other's mass): every
    * vector is assigned to its nearest centroid over ALL labels (own
    * included) by the quantized integer cosine, and the (true, assigned)
    * counts are the confusion matrix — the off-diagonal rows are the
    * label-merge/relabel queue. Same integer contract as the affinity
    * chain: exact BIGINT all-pairs dots, score as the floor-half-up e4
    * INTEGER, argmax = max_by over (score_e4, −cand) with the tie
    * toward the smaller label id (the voteRollup total-order
    * discipline; the oracle formulates it as a window).
    *
    * Scale: the all-centroid scoring is n·dims·|labels| partials — the
    * brute eval pass, priced for eval batches (scope the input); the
    * centroid side is broadcast (labels×dims, corpus-independent).
    * Same per-label long-overflow bound as emb_drift — ENFORCED per
    * candidate label by [[momentGuard]] folded into the integer rank
    * key. */
  def centroidConfusion(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame = {
    val codes = explodedCodes(e)
      .localCheckpoint(true) // feeds the centroid agg AND all-pairs dots
    val cent = centroidSumsCounted(codes)
      .localCheckpoint(true) // 2 consumers: norm rollup + scoring join
    val snrm = cent.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("s2"), max(col("nl")).as("nl"))
      .filter(col("s2") > lit(0L))
    val dots = codes
      .join(broadcast(cent.select(col("label").as("cand"), col("pos"),
        col("s"))), "pos")
      .groupBy(col("vec_id"), col("label"), col("q2"), col("cand"))
      .agg(sum(col("code").cast("long") * col("s")).as("dot"))
    dots
      .join(broadcast(snrm.select(col("label").as("cand"), col("s2"),
        col("nl"))), "cand")
      .withColumn("score_e4",
        floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("q2").cast("double")) * sqrt(col("s2").cast("double")))
          + lit(0.5)).cast("long") + momentGuard(col("nl"), maxVecs))
      .groupBy(col("vec_id"), col("label"))
      .agg(max_by(col("cand"),
        struct(col("score_e4"), (-col("cand")).as("neg"))).as("assigned"))
      .groupBy(col("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
      .select(col("label").cast("long").as("label"),
        col("assigned").cast("long").as("assigned"), col("n"))
  }

  /** Per-DIMENSION code moments — the dead/collapsed-feature detector
    * of an embedding pipeline (a dimension whose codes never vary
    * carries zero information: an upstream projection bug, a clipped
    * activation, or a stale encoder — any of which silently wastes
    * index bytes and flattens cosines): for every position, the exact
    * BIGINT count/sum/sum-of-squares over the int8 codes of all
    * positive-norm vectors (the [[explodedCodes]] slice — one
    * definition with the centroid machinery), plus the `dead` flag as
    * the INTEGER zero-variance predicate n·Σc² − (Σc)² == 0 (never a
    * float compare; catches constants at any level, not just zeros).
    * One (dim)-group hash agg — dims rows out; same per-dim
    * long-overflow bound as emb_drift (conservative here — the n·Σc²
    * predicate is the first to wrap, at n ≈ 2·10⁷), ENFORCED by
    * [[momentGuard]] on the exact per-dim count. */
  def embDimStats(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame =
    explodedCodes(e)
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("code").cast("long")).as("s"),
        sum(col("code").cast("long") * col("code").cast("long")).as("s2"))
      .withColumn("dead",
        (col("n") * col("s2") - col("s") * col("s") === lit(0L))
          .cast("long"))
      .select(col("pos").cast("long").as("pos"),
        (col("n") + momentGuard(col("n"), maxVecs)).as("n"), col("s"),
        col("s2"), col("dead"))

  /** Exploded positive-norm codes — one definition feeding the affinity
    * operator and the frozen [[centroidSums]] artifact. */
  private def explodedCodes(e: DataFrame): DataFrame =
    quantize(e)
      .withColumn("q2",
        graft.functions.ByteDot(col("qv"), col("qv")).cast("long"))
      .filter(col("q2") > lit(0L))
      .select(col("vec_id"), col("label"), col("q2"),
        posexplode(col("qv")).as(Seq("pos", "code")))

  private def centroidSumsFrom(codes: DataFrame): DataFrame =
    centroidSumsCounted(codes).select("label", "pos", "s")

  /** [[centroidSumsFrom]] plus the exact per-label vector count `nl` —
    * the value [[momentGuard]] checks (a count cannot wrap, a sum that
    * already overflowed can). `nl` is identical across a label's dims:
    * every positive-norm vector contributes one row per position. */
  private def centroidSumsCounted(codes: DataFrame): DataFrame =
    codes.groupBy(col("label"), col("pos"))
      .agg(sum(col("code").cast("long")).as("s"),
        count(lit(1)).as("nl"))

  /** The frozen per-label centroid code sums
    * ([[graft.streaming.Streaming.embOutlierStream]]'s serving
    * artifact): labels × dims exact BIGINT rows — bounded by the label
    * set at ANY corpus size, the anomalyStream broadcast-baseline
    * posture. */
  def centroidSums(e: DataFrame): DataFrame =
    centroidSumsFrom(explodedCodes(e))

  /** Stream-static outlier probe against the PERSISTED centroid table
    * — the batch scorer [[graft.streaming.Streaming.runEmbOutlierProbe]]
    * replays per micro-batch (the tripletProbe posture): the probe
    * batch's positive-norm codes meet the frozen (label, pos, s) sums
    * in a broadcast equijoin, per-vector dots re-agg exactly, and the
    * dot < 0 INTEGER predicate flags the away-pointing tail — the same
    * (vec_id, label, dot, score) rows as [[embOutliers]] restricted to
    * the frozen centroids, with NO driver-resident artifact on the
    * serving path. Unknown labels and zero/degenerate norms drop via
    * the same integer fences as the closure variant (inner joins +
    * the q2/s2 > 0 filters). The frozen s2 rollup runs under ANSI, so
    * an artifact built from an over-bound batch raises instead of
    * wrapping (the momentGuard posture; the closure variant's
    * addExact dual). */
  def embOutlierProbe(spark: SparkSession, tableName: String,
      e: DataFrame): DataFrame = {
    val cent = graft.sources.Staged.liveTable(spark, tableName)
      .select(col("label"), col("pos"), col("s"))
    // no checkpoint: the artifact is a labels×dims parquet scan (tiny),
    // and an eager checkpoint PER MICRO-BATCH would accumulate blocks
    // over a long-running stream (the release() lesson, inverted)
    val snrm = cent.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("s2"),
        (max(col("pos")) + lit(1)).cast("long").as("cent_dims"))
      .filter(col("s2") > lit(0L))
    // LEFT join + matched-position accounting replicates the closure
    // variant's dims check exactly: a vector with positions the
    // centroid lacks (n_matched < n_dims) or missing positions the
    // centroid has (n_matched < cent_dims) drops silently, as does an
    // unknown label (inner snrm join)
    explodedCodes(e)
      .join(broadcast(cent), Seq("label", "pos"), "left")
      .groupBy(col("vec_id"), col("label"), col("q2"))
      .agg(sum(col("code").cast("long") * coalesce(col("s"), lit(0L)))
          .as("dot"),
        count(col("s")).as("n_matched"), count(lit(1)).as("n_dims"))
      .join(broadcast(snrm), "label")
      .filter(col("n_matched") === col("n_dims") &&
        col("n_matched") === col("cent_dims"))
      .filter(col("dot") < lit(0L))
      .select(col("vec_id"), col("label"), col("dot"),
        (floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("q2").cast("double")) * sqrt(col("s2").cast("double")))
          + lit(0.5)).cast("double") / lit(10000.0)).as("score"))
  }

  /** The flagged tail of [[embCentroidAffinity]]: vectors pointing AWAY
    * from their own label's centroid (dot < 0 — an INTEGER membership
    * predicate, no float compare anywhere) — the likely-mislabeled /
    * out-of-distribution queue a labeling pipeline re-routes to review
    * before the label feeds sampling or filtering decisions. */
  def embOutliers(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame =
    embCentroidAffinity(e, maxVecs).filter(col("dot") < lit(0L))

  /** Per-label CLUSTER-QUALITY audit — the silhouette-shaped rollup of
    * [[embCentroidAffinity]]: for every label, its COHESION (mean
    * per-vector affinity to the own-label centroid) next to its
    * SEPARATION (cosine to the nearest OTHER centroid, with that
    * label's id) — the one-row-per-label dashboard that says whether a
    * labeling/clustering is worth feeding to sampling or filtering
    * decisions (cohesion ≈ separation means two labels collapsed; a
    * cohesion drop flags label noise). Rides the quantized integer
    * contract end to end: per-vector scores are kept as the INTEGER e4
    * floor-half-up value so the label mean is an exact BIGINT sum ÷ n
    * (never a float sum — summation order can't drift engines);
    * centroid-pair cosines come from exact Σ s_a·s_b over the
    * labels×dims sums; nearest = max_by over (cos_e4, −label) — an
    * integer argmax with a deterministic tie toward the smaller label
    * id, formulated as a window in the oracle (two-formulation
    * strengthening, the LabelPropSql precedent).
    *
    * Scale: per-vector work is the affinity chain (one (label,dim) agg
    * + a broadcast centroid join); everything pairwise happens on the
    * labels×dims table — |labels|²·dims products, corpus-independent.
    * Same per-label long-overflow bound as emb_drift (n ≲ 3·10⁶
    * vectors per label per audited batch; scope the input, not the
    * math, at 100 TB) — ENFORCED per label by [[momentGuard]] on the
    * exact count riding the centroid sums. */
  def embClusterQuality(e: DataFrame,
      maxVecs: Long = MaxMomentVecs): DataFrame = {
    val codes = explodedCodes(e)
      .localCheckpoint(true) // 2 consumers: centroid agg + scoring join
    val cent = centroidSumsCounted(codes)
      .localCheckpoint(true) // 3 consumers: norms, vector dots, pair dots
    val snrm = cent.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("s2"), max(col("nl")).as("nl"))
      .filter(col("s2") > lit(0L))
    val scoreE4 = codes
      .join(broadcast(cent.select("label", "pos", "s")), Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"), col("q2"))
      .agg(sum(col("code").cast("long") * col("s")).as("dot"))
      .join(broadcast(snrm), "label")
      .select(col("label"),
        (floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("q2").cast("double")) * sqrt(col("s2").cast("double")))
          + lit(0.5)).cast("long") +
          momentGuard(col("nl"), maxVecs)).as("score_e4"))
    val coh = scoreE4.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("score_e4")).as("sum_e4"))
    val sep = cent.as("a").join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") =!= col("b.label"))
      .groupBy(col("a.label").as("label"), col("b.label").as("other_label"))
      .agg(sum(col("a.s") * col("b.s")).as("dot"))
      .join(snrm, "label")
      .join(broadcast(snrm.select(col("label").as("other_label"),
        col("s2").as("o2"))), "other_label")
      .withColumn("cos_e4",
        floor(col("dot").cast("double") * lit(10000.0) /
          (sqrt(col("s2").cast("double")) * sqrt(col("o2").cast("double")))
          + lit(0.5)).cast("long"))
      .groupBy(col("label"))
      .agg(max_by(col("other_label"),
          struct(col("cos_e4"), (-col("other_label")).as("neg")))
          .as("nearest_label"),
        max(col("cos_e4")).as("sep_e4"))
    coh.join(sep, "label")
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        (floor(col("sum_e4").cast("double") / col("n_vecs").cast("double")
          + lit(0.5)).cast("double") / lit(10000.0)).as("cohesion"),
        col("nearest_label").cast("long").as("nearest_label"),
        (col("sep_e4").cast("double") / lit(10000.0)).as("separation"))
  }

  /** Occupancy-safe random-hyperplane LSH search ([[LshBuckets]]):
    * adaptive plane count (planes = 0 → log₂(n/targetOccupancy), so
    * bucket occupancy — and with it per-query candidate cost AND the
    * shuffle's parallelism — stays constant as the corpus grows),
    * `tables` OR-combined hash tables to recover the recall the extra
    * planes cost, and a bucket-occupancy cap so a dense region can't
    * blow up one task. Queries meet the corpus in a (tbl, bucket, sub)
    * equijoin; candidates are deduped across tables before the one exact
    * cosine per pair. The per-plane work is the native HyperplaneBucket
    * kernel — weights derived executor-side from splitmix64(plane, dim),
    * one codegen'd pass per vector with no per-plane array allocation. */
  def lsh(e: DataFrame, queryPred: Column, k: Int,
      planes: Int = 0, tables: Int = 4, targetOccupancy: Long = 128L,
      maxOccupancy: Long = 4096L, n: Long = -1L): DataFrame = {
    val fe = e.filter(finiteNorm(col("nrm")))
    // `n` = known corpus cardinality (metadata / LshBuckets.corpusSize):
    // skips the sizing count scan; -1 → unknown, count here (0 is a real
    // empty-corpus cardinality and is honored, not re-counted)
    val p = if (planes > 0) planes
      else LshBuckets.adaptivePlanes(
        if (n >= 0L) n else fe.count(), targetOccupancy)
    val m = LshBuckets.members(fe, p, tables, maxOccupancy)
    val qm = m.join(fe.filter(queryPred).select(col("vec_id")), "vec_id")
      .withColumnRenamed("vec_id", "query_id")
    val cand = qm.as("q").join(m.as("c"),
        col("q.tbl") === col("c.tbl") &&
          col("q.bucket") === col("c.bucket") &&
          col("q.sub") === col("c.sub") &&
          col("query_id") =!= col("c.vec_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand
      .join(fe.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm")), "query_id")
      .join(fe.select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("nrm").as("nnrm")), "neighbor_id")
      .withColumn("score",
        round(DotProduct(col("qv"), col("nv")) /
          (col("qnrm") * col("nnrm")), 4))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    ranked(scored, k)
  }

  /** Squared L2 distance to a centroid via the dot-product identity
    * ‖v−c‖² = ‖v‖² + ‖c‖² − 2·v·c — the per-pair work is ONE codegen'd
    * DotProduct kernel call instead of a zip_with lambda that allocates
    * an intermediate array per (vector, centroid) pair. Requires `nrm`
    * (vector norm, precomputed once in [[emb]]) and `cnrm2` (centroid
    * squared norm, computed once per round on the tiny centroid table). */
  private def sqDist: Column =
    col("nrm") * col("nrm") + col("cnrm2") -
      lit(2.0) * DotProduct(col("v"), col("cv"))

  private def withCnrm2(centroids: DataFrame): DataFrame =
    centroids.withColumn("cnrm2", DotProduct(col("cv"), col("cv")))

  /** Nearest-centroid assignment as a map-side-combinable `min_by`
    * aggregation on (distance, c_id) — NOT a `row_number` window, which
    * would shuffle+sort #vectors × nlist rows on vec_id. The agg combines
    * partially per partition, so only one (vec_id, best) row per vector
    * crosses the wire. Carried columns are functionally dependent on
    * vec_id, folded into the same min_by. */
  private def assignNearest(scored: DataFrame, carry: Seq[String]): DataFrame = {
    val key = struct(col("d"), col("c_id"))
    scored.groupBy(col("vec_id"))
      .agg(min_by(col("c_id"), key).as("c_id"),
        carry.map(c => min_by(col(c), key).as(c)): _*)
  }

  /** Deterministic mini k-means (Lloyd) entirely in DataFrame ops: seeds
    * are the k vectors with smallest xxhash64(vec_id) (no driver-side
    * randomness), then `iters` assign/recompute rounds. Centroid ids are
    * the seed hashes themselves — distinct and orderable, assigned with
    * no unpartitioned window. Each round is one broadcast cross-score +
    * one min_by assignment + one posexplode mean — at scale this is the
    * offline training pass an IVF index runs once. */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    // eager localCheckpoint per round (the dedupClusters pattern): the
    // centroid table is k tiny rows but its LINEAGE doubles through every
    // assign/recompute round and is then re-planned by each downstream
    // consumer (vector assignment, query probes) — checkpointing keeps
    // cold planning/codegen time flat instead of growing with iters
    // (h, vec_id) tie-break for the same reason as the sampled training
    // draw: seed selection must stay deterministic even across a 64-bit
    // collision at the limit boundary (r17 ADVICE)
    var centroids = e
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select(col("h").as("c_id"), col("v").as("cv"))
    (1 to iters).foreach { _ =>
      val scored = e.crossJoin(broadcast(withCnrm2(centroids)))
        .withColumn("d", sqDist)
      centroids = assignNearest(scored, Seq("v"))
        .select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c_id", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("c_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("ps"))
        .select(col("c_id"), expr("transform(ps, p -> p.cx)").as("cv"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Corpus clustering: assign every vector to its nearest trained
    * centroid and roll up per-cluster stats — the curation pass that
    * groups a corpus by embedding region (topic discovery, domain
    * balancing). Same broadcast-score + min_by plan as the IVF build, so
    * it scales identically. */
  def clusterStats(e: DataFrame, k: Int = 8): DataFrame = {
    // same base materialization as [[ivf]]: k-means rounds + the final
    // assignment re-scan the source otherwise
    val base = e.localCheckpoint(true)
    val centroids = kmeansCentroids(base, k)
    assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("nrm"))
      .groupBy(col("c_id"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(col("nrm")), 4).as("avg_norm"))
  }

  /** Nearest-centroid assignment of the whole corpus for the semantic
    * paths: k = ~n/targetClusterSize seeded-k-means clusters. Returns the
    * eagerly-materialized (vec_id, v, nrm, c_id) table — it feeds both
    * pair sides, the occupancy agg, and the final join. */
  /** Above this corpus size, [[assignSemanticClusters]] trains its
    * centroids on a bounded deterministic SAMPLE instead of the full
    * corpus (r16 verdict #5 — the standard large-scale k-means shape):
    * full-corpus Lloyd prices every round at n·k kernel ops, the
    * dominant term of the 50×-stress semantic-family wall, while
    * cluster-BLOCKING quality only needs enough sample mass per
    * centroid — [[SampleMembersPerCentroid]] members each — because
    * the occupancy cap + hyperplane sub-split + audit row already own
    * balance pathology. Below the switch the exact full-corpus rounds
    * run unchanged, so every locally-benchable scale (sf0.1 bench,
    * 1×/20× stress) keeps its committed behavior bit-for-bit — the
    * atScaleVerify posture, honoring the r11 dead-end lesson (never
    * let an at-scale shape leak into the measured small-scale path
    * without a fresh-session A/B). */
  private[graft] val SampleTrainSwitch = 65536L
  private[graft] val SampleMembersPerCentroid = 16L

  private[similarity] def assignSemanticClusters(e: DataFrame,
      targetClusterSize: Long, n: Long,
      trainSwitch: Long = SampleTrainSwitch): DataFrame = {
    val base = e.localCheckpoint(true)
    val nn = if (n >= 0L) n else base.count()
    // clamp BEFORE the Long→Int narrowing: at the 100 TB design point
    // nn/targetClusterSize can exceed Int.MaxValue and a raw .toInt
    // would wrap negative (limit(k) with k < 0 throws)
    val k = math.min(Int.MaxValue.toLong,
      math.max(2L, nn / math.max(targetClusterSize, 1L))).toInt
    // sample-trained centroids past the switch: a deterministic
    // xxhash64-ordered bottom-s draw (the kmeansCentroids seeding
    // discipline — salted so the training sample is independent of the
    // seeding order), s = max(switch, membersPerCentroid · k) clamped
    // to the corpus; the Lloyd rounds then cost s·k instead of n·k
    // while the one full-corpus assignment pass below stays exact
    val trainSet =
      if (nn <= trainSwitch) base
      else {
        val s = math.min(nn, math.min(Int.MaxValue.toLong,
          math.max(trainSwitch, SampleMembersPerCentroid * k))).toInt
        // (sh, vec_id) tie-break: a 64-bit hash collision straddling the
        // limit boundary is expected at billion-vector scale (birthday
        // bound) and an untied orderBy would make the "deterministic"
        // sample run-dependent there (r17 ADVICE)
        base.withColumn("sh", xxhash64(col("vec_id"), lit("ktrain")))
          .orderBy(col("sh"), col("vec_id")).limit(s).drop("sh")
          .localCheckpoint(true)
      }
    val centroids = kmeansCentroids(trainSet, k)
    assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("v", "nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"))
      .localCheckpoint(true)
  }

  /** Occupancy-capped (vec_id, v, nrm, c_id, sub) pair-group members
    * (the LshBuckets posture applied to k-means clusters): clusters at or
    * under `maxOccupancy` keep sub = 0; over-cap clusters — k-means gives
    * NO balance guarantee, and a dense semantic region (exactly what
    * semantic dedup exists for) can concentrate into one giant cluster —
    * are re-split by `subPlanes` fresh hyperplanes into sub ∈
    * [1, 2^subPlanes]; sub-groups still over the cap are dropped (a
    * pathological near-identical mass, exact embedding dedup's job).
    * Every downstream pair join keys on (c_id, sub), so the worst-case
    * per-task pair count is maxOccupancy²/2 BY CONSTRUCTION, not in
    * expectation. Drops are audited ([[semanticClusterAudit]]). */
  private[similarity] def cappedClusterMembers(assigned: DataFrame,
      maxOccupancy: Long, subPlanes: Int): DataFrame = {
    import graft.functions.HyperplaneBucket
    val small = assigned.groupBy(col("c_id"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= maxOccupancy)
      .select("c_id")
    val keep = assigned.join(small, Seq("c_id"), "left_semi")
      .withColumn("sub", lit(0L))
    val refined = assigned.join(small, Seq("c_id"), "left_anti")
      .withColumn("sub", HyperplaneBucket(col("v"), subPlanes, 0) + lit(1L))
    val keep2 = refined.join(
      refined.groupBy(col("c_id"), col("sub"))
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") <= maxOccupancy)
        .select("c_id", "sub"),
      Seq("c_id", "sub"), "left_semi")
    keep.select("vec_id", "v", "nrm", "c_id", "sub")
      .union(keep2.select("vec_id", "v", "nrm", "c_id", "sub"))
  }

  /** Semantic dedup — the cluster-scoped pruning recipe (SemDeDup,
    * Abbas et al. 2023): k-means partitions the corpus into
    * ~n/targetClusterSize clusters, candidate near-dup pairs are scored
    * WITHIN clusters only, and each cosine-≥τ connected component keeps
    * its lowest vec_id. Complements the hyperplane-LSH path: clusters
    * capture semantic neighborhoods (same topic phrased differently)
    * that random hyperplanes split across buckets.
    *
    * Scale: Σ|cluster|² ≈ n · targetClusterSize is only an EXPECTATION —
    * k-means gives no balance bound — so the pair join runs over
    * [[cappedClusterMembers]]: occupancy cap + one hyperplane sub-split
    * level makes maxOccupancy²/2 the HARD per-task ceiling, with drops
    * accounted by [[semanticClusterAudit]]. The within-cluster join is a
    * (c_id, sub) equijoin, never a cartesian (PlanSpec-fenced), and the
    * component step reuses the CC-by-join pattern of Dedup.dedupClusters.
    * Past [[SampleTrainSwitch]] vectors, centroid TRAINING runs over a
    * bounded deterministic sample (full-corpus assignment stays exact) —
    * the r16-verdict #5 large-scale shape; see the switch's doc.
    *
    * Output: one row per vector — (vec_id, c_id, keeper); keeper ==
    * vec_id marks the survivor of its semantic group (vectors with no
    * ≥τ neighbor — including members of dropped over-cap sub-groups —
    * keep themselves). */
  def semanticDedup(e: DataFrame, tau: Double,
      targetClusterSize: Long = 64L, n: Long = -1L,
      maxOccupancy: Long = 1024L, subPlanes: Int = 6,
      trainSwitch: Long = SampleTrainSwitch): DataFrame = {
    val assigned = assignSemanticClusters(e, targetClusterSize, n,
      trainSwitch)
    val members = cappedClusterMembers(assigned, maxOccupancy, subPlanes)
    val pairs = members.as("a").join(members.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        round(DotProduct(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cos_sim") >= tau)
      .select(col("a.vec_id").as("doc1"), col("b.vec_id").as("doc2"))
    val comps = graft.dedup.Dedup.dedupClusters(pairs)
      .withColumnRenamed("doc_id", "vec_id")
      .withColumnRenamed("cluster", "keeper")
    assigned.select(col("vec_id"), col("c_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"),
        coalesce(col("keeper"), col("vec_id")).as("keeper"))
  }

  /** Drop accounting for [[semanticDedup]]'s cluster cap (the
    * lsh_bucket_audit discipline): one row — corpus size, memberships
    * kept for pair generation, memberships dropped (over-cap sub-groups),
    * final pair-group count, and the realized max pair-group occupancy
    * (KnnSpec asserts it stays ≤ maxOccupancy on a skewed corpus). */
  def semanticClusterAudit(e: DataFrame, targetClusterSize: Long = 64L,
      n: Long = -1L, maxOccupancy: Long = 1024L,
      subPlanes: Int = 6, trainSwitch: Long = SampleTrainSwitch): DataFrame = {
    val assigned = assignSemanticClusters(e, targetClusterSize, n,
      trainSwitch)
    val groups = cappedClusterMembers(assigned, maxOccupancy, subPlanes)
      .groupBy(col("c_id"), col("sub"))
      .agg(count(lit(1)).as("occ"))
    val kept = groups.agg(
      sum(col("occ")).as("n_kept"),
      count(lit(1)).as("n_groups"),
      max(col("occ")).as("max_occupancy"))
    assigned.agg(count(lit(1)).as("n_vectors")).crossJoin(broadcast(kept))
      .select(col("n_vectors"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_vectors") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("n_groups"), lit(0L)).as("n_groups"),
        coalesce(col("max_occupancy"), lit(0L)).as("max_occupancy"))
  }

  /** Persist an IVF index: every vector assigned to its nearest
    * centroid's inverted list, written as an external table BUCKETED BY
    * the list id — the offline build §5 promises. Search against the
    * persisted table needs no re-training, no re-assignment, and no
    * Exchange on the index side: the bucketed layout already hash-
    * partitions by `c_id`, and an equality/IN probe filter on `c_id`
    * prunes entire buckets at planning time. Returns the centroid table
    * (tiny — persist alongside, or recompute probes from it). With
    * `persistCentroids`, the centroid table ALSO commits to
    * `${tableName}_centroids` (the writeIvfPqIndex coarse/codebook
    * posture) so a separate serving process — the live hybrid probe —
    * reads both artifacts from tables alone, no in-memory handle;
    * centroids commit BEFORE the main table, whose promote stays the
    * commit point probes key on. */
  def writeIvfIndex(e: DataFrame, tableName: String, path: String,
      nlist: Int = 10, buckets: Int = 8,
      persistCentroids: Boolean = false): DataFrame = {
    // degenerate vectors never enter the index: they are unsearchable
    // under cosine (the finiteNorm rationale)
    val base = e.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val centroids = kmeansCentroids(base, nlist)
    if (persistCentroids)
      graft.sources.Staged.commit(e.sparkSession,
          s"${tableName}_centroids", s"${path}_centroids") { (tbl, p) =>
        centroids.write
          .option("path", p)
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .saveAsTable(tbl)
      }
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("v", "nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"))
    // staged rebuild (Staged.commit): the live index serves while the
    // new generation builds; promote is a catalog rename
    graft.sources.Staged.commit(e.sparkSession, tableName, path) {
      (tbl, p) =>
        assigned
          .repartition(col("c_id"))
          .write
          .option("path", p)
          .bucketBy(buckets, "c_id")
          .sortBy("c_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .saveAsTable(tbl)
    }
    centroids
  }

  /** Persist an IVF index whose inverted lists store int8-QUANTIZED
    * codes — the IVF-PQ-shaped layout a 100 TB embedding corpus
    * actually serves from: centroid assignment runs in FLOAT space
    * (build accuracy is an offline, once-per-corpus cost), but the
    * stored rows carry only (qv, qnrm) — the resident index is 8×
    * smaller than float vectors, which is the difference between
    * inverted lists that stay executor-cached and ones that spill.
    * Bucketed by `c_id` exactly like [[writeIvfIndex]], so the probe
    * equijoin reads pre-partitioned buckets with zero index-side
    * Exchange (KnnSpec-asserted). Returns the float centroid table
    * (probes rank centroids in float space — it is tiny). */
  def writeIvfIndexQuantized(e: DataFrame, tableName: String, path: String,
      nlist: Int = 10, buckets: Int = 8): DataFrame = {
    val base = quantize(e).localCheckpoint(true)
    val centroids = kmeansCentroids(base, nlist)
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("qv", "qnrm"))
      .select(col("vec_id"), col("qv"), col("qnrm"), col("c_id"))
    // staged rebuild (Staged.commit): the live index serves while the
    // new generation builds; promote is a catalog rename
    graft.sources.Staged.commit(e.sparkSession, tableName, path) {
      (tbl, p) =>
        assigned
          .repartition(col("c_id"))
          .write
          .option("path", p)
          .bucketBy(buckets, "c_id")
          .sortBy("c_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .saveAsTable(tbl)
    }
    centroids
  }

  /** Search a quantized persisted IVF index ([[writeIvfIndexQuantized]]):
    * queries rank the float centroid table for their `nprobe` nearest
    * lists (float space — the query set is small), then meet the
    * bucketed code lists in a `c_id` equijoin and score with the
    * integer [[graft.functions.ByteDot]] kernel — bit-deterministic
    * accumulation, no FP summation-order hazard, 8× less data read per
    * probed list. Zero-norm codes are excluded on both sides (their
    * cosine is 0/0 = NaN, which would sort above every real score). */
  def searchIvfIndexQuantized(spark: SparkSession, tableName: String,
      centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame =
    ranked(ivfScoredQuantized(
      ivfProbesQuantized(centroids, queries, nprobe),
      graft.sources.Staged.liveTable(spark, tableName)), k)

  /** The quantized probe lists (query_id, qv, qnrm, c_id): centroid
    * ranking in FLOAT space (the build's own discipline), codes carried
    * for scoring — shared by [[searchIvfIndexQuantized]] and its delta
    * face. */
  private def ivfProbesQuantized(centroids: DataFrame, queries: DataFrame,
      nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("c_id"))
    quantize(queries).filter(col("qnrm") > lit(0.0))
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"),
        col("qv"), col("qnrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("c_id"))
  }

  /** Score quantized probe lists against one code-list frame (zero-norm
    * codes fenced on the index side), UNRANKED. */
  private def ivfScoredQuantized(probes: DataFrame,
      index: DataFrame): DataFrame =
    probes.as("q")
      .join(index.filter(col("qnrm") > lit(0.0)).as("c"),
        col("q.c_id") === col("c.c_id") &&
          col("query_id") =!= col("c.vec_id"))
      .withColumn("score", quantizedScore)
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))

  /** [[searchIvfIndexQuantized]] over base ∪ live delta — the
    * [[searchIvfIndexDelta]] shape for the quantized family (probes
    * once, each side its own equijoin, union of SCORED rows into the
    * one bounded rank). */
  def searchIvfIndexQuantizedDelta(spark: SparkSession, tableName: String,
      centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame = {
    val index = requireCentroidAlignment(spark, tableName, centroids)
    val probes = ivfProbesQuantized(centroids, queries, nprobe)
      .localCheckpoint(true)
    val scored = ivfScoredQuantized(probes, index)
    ivfDelta(spark, tableName, Seq("qv", "qnrm")) match {
      case Some(dp) =>
        ranked(scored.unionByName(ivfScoredQuantized(probes, dp)), k)
      case None => ranked(scored, k)
    }
  }

  /** Cross-table generation fence for the two-artifact IVF layout
    * ([[writeIvfIndex]] with persistCentroids): centroids and index
    * promote as two INDEPENDENT staged renames, so a probe landing
    * between the promotes — or after a crash that Staged.recover heals
    * per-table — can rank NEW centroids against an OLD index. The
    * c_id space is xxhash64 of the seed vec_ids, so mismatched
    * generations equijoin to NOTHING and the semantic member comes
    * back silently EMPTY (the exact silent-degradation class this
    * repo fences everywhere; an empty probe result is
    * indistinguishable from "no neighbors" without this check). The
    * fence: every inverted-list id in the index must exist in the
    * centroid table — one left-anti existence count over the bucketed
    * index scan, memoized per (index table, centroid-set digest) per
    * JVM (the LshBuckets.corpusSize posture): a generation change
    * flips the digest and re-pays one scan; steady-state probes pay a
    * centroid-table collect (nlist rows) and nothing else. Any
    * mid-swap state necessarily differs in c_id set from every
    * verified state, so the memo cannot mask a mismatch. */
  private val centroidAlignmentMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def requireCentroidAlignment(spark: SparkSession,
      tableName: String, centroids: DataFrame): DataFrame = {
    // resolve the live index ONCE and return the resolved frame: the
    // caller probes the SAME resolution the fence verified, closing the
    // r17-ADVICE TOCTOU where a promote landing between the check and a
    // by-name re-resolution served a NEW index against already-collected
    // OLD centroids unverified for that micro-batch
    val index = graft.sources.Staged.liveTable(spark, tableName)
    val cids = centroids.select(col("c_id")).collect().map(_.getLong(0))
    require(cids.length <= 1000000,
      s"centroid table $tableName: ${cids.length} rows — not a " +
        "broadcastable centroid artifact")
    // collision-FREE memo digest (r17 ADVICE): a 32-bit Arrays.hashCode
    // collision between two same-count centroid generations would skip
    // the fence — the exact silent-empty-member state it exists to
    // catch. md5 over the ':'-joined sorted ids is the repo's standard
    // outright-injective key (the derived-key doctrine). The key also
    // carries the INDEX generation (its storage location — Staged flips
    // it every promote): an index-side promote with an unchanged
    // centroid table must re-pay the scan, not ride the old memo.
    val key = tableName + "@" +
      graft.sources.Staged.generation(spark, tableName) + ":" +
      cids.length + ":" +
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        cids.sorted.mkString(":"))
    if (!centroidAlignmentMemo.contains(key)) {
      val orphans = index
        .select(col("c_id")).distinct()
        .join(centroids.select(col("c_id")), Seq("c_id"), "left_anti")
        .count()
      require(orphans == 0L,
        s"IVF generation mismatch: $orphans inverted-list ids in " +
          s"$tableName have no row in its centroid table — the two " +
          "staged artifacts are from different builds (probe landed " +
          "mid-swap or a crashed rebuild healed one table only); " +
          "retry after the index promote completes, or rebuild")
      centroidAlignmentMemo.add(key)
    }
    index
  }

  /** Search a persisted IVF index ([[writeIvfIndex]]): queries rank the
    * centroid table for their `nprobe` nearest lists, then meet the
    * bucketed index in a `c_id` equijoin — the index side arrives
    * pre-partitioned (zero Exchange, PlanSpec-asserted), so at 100 TB
    * the scan touches only the probed lists' buckets. */
  def searchIvfIndex(spark: SparkSession, tableName: String,
      centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame =
    searchIvfIndexOn(graft.sources.Staged.liveTable(spark, tableName),
      centroids, queries, k, nprobe)

  /** [[searchIvfIndex]] over an ALREADY-RESOLVED index frame — the face
    * the alignment-fenced probes use so the fence and the probe read
    * the SAME generation (the frame [[requireCentroidAlignment]]
    * returned), never a by-name re-resolution a concurrent promote
    * could swap underneath (r17 ADVICE TOCTOU). */
  def searchIvfIndexOn(index: DataFrame,
      centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame =
    ranked(ivfScored(ivfProbes(centroids, queries, nprobe), index), k)

  /** The per-query probe lists (query_id, v, nrm, c_id): rank the
    * broadcast centroid table, keep the `nprobe` nearest — the ONE
    * probe derivation shared by [[searchIvfIndexOn]] and the delta
    * face (which scores the same probes against two frames). */
  private def ivfProbes(centroids: DataFrame, queries: DataFrame,
      nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("c_id"))
    queries.filter(finiteNorm(col("nrm")))
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("v"), col("nrm"), col("c_id"))
  }

  /** Score probe lists against one inverted-list frame — the c_id
    * equijoin + float cosine, UNRANKED (the delta face unions two
    * scored frames into the one bounded rank). */
  private def ivfScored(probes: DataFrame, index: DataFrame): DataFrame =
    probes.as("q").join(index.as("c"),
        col("q.c_id") === col("c.c_id") &&
          col("query_id") =!= col("c.vec_id"))
      .withColumn("score", cosine)
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))

  // ───── ANN delta-append (r18 verdict #1: the serving indexes were the
  // last full-rebuild wall — a daily crawl against a weekly re-cluster
  // must not pay the weekly cost. The appendDocVectorIndexDelta frozen-
  // model posture applied to the IVF layouts: the delta is assigned to
  // the FROZEN centroids; re-clustering is the full-rebuild cadence.) ──

  /** The live IVF delta rows for `tableName` (same stored schema as the
    * family's base rows, `carry` = the family's payload columns), or
    * None when absent or STALE — the in-table `base_gen` marker no
    * longer matches the main table's generation because a rebuild or
    * [[mergeIvfIndex]] promoted since (the docVectorDelta posture: one
    * table, one atomic commit, no cross-table crash window at all). */
  private[similarity] def ivfDelta(spark: SparkSession, tableName: String,
      carry: Seq[String]): Option[DataFrame] = {
    val dt = s"${tableName}_delta"
    graft.sources.Staged.recover(spark, dt)
    if (!spark.catalog.tableExists(dt)) None
    else {
      val d = spark.table(dt)
      // a delta table from another family/layout (missing the marker
      // or this family's payload columns) is not serviceable — the
      // next append overwrites it (the rawTextDelta legacy posture)
      if (!d.columns.contains("base_gen") ||
          !carry.forall(d.columns.contains)) return None
      val bg = d.select(col("base_gen")).limit(1).collect()
      if (bg.nonEmpty && bg.head.getString(0) ==
          graft.sources.Staged.generation(spark, tableName))
        Some(d.select(col("vec_id") +: carry.map(col) :+ col("c_id"): _*))
      else None
    }
  }

  /** The shared delta-append tail for both IVF families: disjointness
    * fences (vec_ids must be NEW — the appendTextIndexDelta contract),
    * old-delta union (a repeat append extends the generation,
    * delta-sized rewrites only), and ONE Staged commit of the bucketed
    * delta rows with the in-table `base_gen` marker. `assigned` rows
    * are ALREADY assigned to the frozen centroids by the caller. */
  private def appendIvfDeltaRows(spark: SparkSession, index: DataFrame,
      assigned: DataFrame, tableName: String, path: String,
      carry: Seq[String], buckets: Int): Unit = {
    val newIds = assigned.select(col("vec_id")).distinct()
    val clashBase = index.join(broadcast(newIds), Seq("vec_id"),
      "left_semi").count()
    require(clashBase == 0L,
      s"appendIvfIndexDelta($tableName): $clashBase already-indexed " +
        "vec_ids in the delta batch — a delta holds only NEW vectors " +
        "(re-embeds go through rebuild or the merge cadence)")
    val old = ivfDelta(spark, tableName, carry)
    old.foreach { op =>
      val clashDelta = op.join(broadcast(newIds), Seq("vec_id"),
        "left_semi").count()
      require(clashDelta == 0L,
        s"appendIvfIndexDelta($tableName): $clashDelta vec_ids already " +
          "in the live delta — batches must be disjoint")
    }
    val baseGen = graft.sources.Staged.generation(spark, tableName)
    // materialize before the commit drops the old delta the plan reads
    val rows = old.map(_.unionByName(assigned)).getOrElse(assigned)
      .localCheckpoint(true)
      .withColumn("base_gen", lit(baseGen))
    graft.sources.Staged.commit(spark, s"${tableName}_delta",
        s"${path}_delta") { (tbl, p) =>
      rows
        .repartition(col("c_id"))
        .write
        .option("path", p)
        .bucketBy(buckets, "c_id")
        .sortBy("c_id")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(tbl)
    }
  }

  /** Generation accounting for an IVF delta (r24 — the
    * textIndexDeltaAudit / docVectorDeltaAudit sibling for the ANN
    * family, so every delta family carries its merge-scheduling ops
    * row): stored-vector masses and the integer half-up milli share of
    * the serving index the live delta holds. A stale/absent delta
    * reports zero delta mass — the post-merge/post-rebuild steady
    * state (a silently-ignored stale delta SHOWS here). Reads two
    * count aggregates; `carry` names the family's payload columns
    * (float `v`/`nrm`, int8 `qv`/`qnrm`, PQ `codes`). The counts are
    * pure functions of the corpus + the split + the finiteNorm fence,
    * so the row sits under the hash gate. */
  def ivfDeltaAudit(spark: SparkSession, tableName: String,
      carry: Seq[String] = Seq("v", "nrm")): DataFrame = {
    val nBase = graft.sources.Staged.liveTable(spark, tableName)
      .agg(count(lit(1)).as("n_vecs_base"))
    val nDelta = ivfDelta(spark, tableName, carry)
      .map(_.agg(count(lit(1)).as("n_vecs_delta")))
      .getOrElse(spark.range(1).select(lit(0L).as("n_vecs_delta")))
    nBase.crossJoin(broadcast(nDelta))
      .select(col("n_vecs_base"), col("n_vecs_delta"),
        expr("""CASE WHEN n_vecs_base + n_vecs_delta > 0 THEN
                  (2 * n_vecs_delta * 1000 + (n_vecs_base + n_vecs_delta))
                    div (2 * (n_vecs_base + n_vecs_delta))
                ELSE 0 END""").as("delta_share_milli"))
  }

  /** Append a crawl delta to a persisted FLOAT IVF index
    * ([[writeIvfIndex]]): arriving vectors are assigned to the FROZEN
    * centroid model (never re-trained here — a re-cluster is the
    * full-rebuild cadence, exactly the frozen-vocab contract of the
    * doc-vector family) and land bucketed by `c_id` in
    * `<table>_delta`, marked with the base generation in-table so the
    * whole batch promotes in ONE atomic Staged commit.
    *
    * Contract (DeltaIndexSpec pins it): probe over base ∪ delta ≡ a
    * full [[writeIvfIndex]]-shaped rebuild that ASSIGNS with the same
    * frozen centroids — exactly, not approximately: assignment is a
    * pure per-vector function of (v, centroids), so base rows keep
    * their lists and delta rows get the lists the rebuild would give
    * them. The alignment fence ([[requireCentroidAlignment]]) rejects
    * a centroid frame from another generation BEFORE any assignment —
    * mismatched c_ids would land delta lists that every probe
    * equijoins to nothing (the silent-empty class). */
  def appendIvfIndexDelta(eNew: DataFrame, tableName: String,
      path: String, centroids: DataFrame, buckets: Int = 8): Unit = {
    val spark = eNew.sparkSession
    graft.sources.Staged.recover(spark, tableName)
    require(spark.catalog.tableExists(tableName),
      s"appendIvfIndexDelta: no base index $tableName — build it with " +
        "writeIvfIndex first")
    val index = requireCentroidAlignment(spark, tableName, centroids)
    val base = eNew.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("v", "nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"))
    appendIvfDeltaRows(spark, index, assigned, tableName, path,
      Seq("v", "nrm"), buckets)
  }

  /** [[appendIvfIndexDelta]] for the QUANTIZED family
    * ([[writeIvfIndexQuantized]]): same frozen-centroid assignment (in
    * float space — the build's own discipline), stored rows carry the
    * int8 codes. Degenerate vectors quantize to zero codes and are
    * excluded by the probes' qnrm > 0 fence, mirroring the build. */
  def appendIvfIndexQuantizedDelta(eNew: DataFrame, tableName: String,
      path: String, centroids: DataFrame, buckets: Int = 8): Unit = {
    val spark = eNew.sparkSession
    graft.sources.Staged.recover(spark, tableName)
    require(spark.catalog.tableExists(tableName),
      s"appendIvfIndexQuantizedDelta: no base index $tableName — build " +
        "it with writeIvfIndexQuantized first")
    val index = requireCentroidAlignment(spark, tableName, centroids)
    val base = quantize(eNew).localCheckpoint(true)
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("qv", "qnrm"))
      .select(col("vec_id"), col("qv"), col("qnrm"), col("c_id"))
    appendIvfDeltaRows(spark, index, assigned, tableName, path,
      Seq("qv", "qnrm"), buckets)
  }

  /** Search a float IVF index over base ∪ live delta — the daily-crawl
    * serving shape. The probe lists are computed ONCE (checkpointed —
    * two scoring consumers) and each side is scored as its OWN c_id
    * equijoin before the one bounded rank: unioning the two index
    * frames first would erase the base scan's bucketed
    * outputPartitioning and re-shuffle the whole index, while the
    * union of SCORED rows is probe-sized. With no serviceable delta
    * this is exactly [[searchIvfIndex]]. Resolves the live index once
    * through the alignment fence and probes THAT frame (the
    * searchIvfIndexOn TOCTOU posture). */
  def searchIvfIndexDelta(spark: SparkSession, tableName: String,
      centroids: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame = {
    val index = requireCentroidAlignment(spark, tableName, centroids)
    val probes = ivfProbes(centroids, queries, nprobe).localCheckpoint(true)
    val scored = ivfScored(probes, index)
    ivfDelta(spark, tableName, Seq("v", "nrm")) match {
      case Some(dp) => ranked(scored.unionByName(ivfScored(probes, dp)), k)
      case None => ranked(scored, k)
    }
  }

  /** Compact the live delta into the base index — one bucketed
    * index-ROW union write, ZERO assignment recompute (assignment cost
    * is paid once per vector, at its append — the mergeTextIndex
    * claim), ONE Staged commit. Fully idempotent: the promote flips
    * the base generation, which STALES the delta for every probe
    * instantly; the delta drop is cleanup, not correctness, and a
    * crash-rerun finds no serviceable delta and just sweeps. Works
    * unchanged for both families (`carry` = the family's payload
    * columns). The frozen centroid model is NOT retrained here —
    * re-clustering is the full-rebuild cadence, by design. */
  def mergeIvfIndex(spark: SparkSession, tableName: String, path: String,
      carry: Seq[String] = Seq("v", "nrm"), buckets: Int = 8): Unit = {
    ivfDelta(spark, tableName, carry) match {
      case None =>
        spark.sql(s"DROP TABLE IF EXISTS `${tableName}_delta`")
      case Some(dp) =>
        val cols = (Seq("vec_id") ++ carry ++ Seq("c_id")).map(col)
        val merged = graft.sources.Staged.liveTable(spark, tableName)
          .select(cols: _*)
          .unionByName(dp)
        graft.sources.Staged.commit(spark, tableName, path) { (tbl, p) =>
          merged
            .repartition(col("c_id"))
            .write
            .option("path", p)
            .bucketBy(buckets, "c_id")
            .sortBy("c_id")
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .saveAsTable(tbl)
        }
        spark.sql(s"DROP TABLE IF EXISTS `${tableName}_delta`")
    }
  }

  /** IVF LIST-BALANCE audit over a PERSISTED index table (the
    * rebalanceAudit discipline applied to inverted lists): list
    * population, total vectors, heaviest/lightest lists, and
    * max-over-ideal as the all-integer half-up milli (1000 = perfectly
    * balanced lists). Probe latency is gated by the heaviest probed
    * list — an imbalance creep after corpus drift is the "rebuild the
    * index" signal, invisible in search results until tail latency
    * pages. One hash agg over the bucketed index scan (zero Exchange:
    * the table is bucketed by c_id, the agg key) to ≤ nlist rows.
    * rows-only: the list assignment is seeded k-means. */
  def ivfBalanceAudit(spark: SparkSession, tableName: String): DataFrame =
    graft.sources.Staged.liveTable(spark, tableName)
      .groupBy(col("c_id")).agg(count(lit(1)).as("list_size"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_lists"),
        sum(col("list_size")).as("n_vectors"),
        max(col("list_size")).as("max_list"),
        min(col("list_size")).as("min_list"))
      .withColumn("imb_milli",
        expr("(2 * max_list * n_lists * 1000 + n_vectors) div " +
          "(2 * n_vectors)"))

  /** IVF: k-means centroids ([[kmeansCentroids]]; at scale trained once
    * offline), every vector joins its nearest centroid's inverted list;
    * queries probe the `nprobe` nearest lists. */
  /** ANN quality audit — recall@k of the IVF search against the brute
    * baseline on the same probe set, as ONE auditable row (the
    * lsh_bucket_audit discipline applied to search QUALITY instead of
    * candidate volume): n_probes, k, hits (probe∩brute pairs), and
    * recall as a floor-half-up milli fraction. This is the number a
    * pipeline watches when tuning nprobe/nlist or deciding the index
    * needs a rebuild after drift — recall degradation is silent in the
    * search results themselves. Per-probe denominators use the BRUTE
    * list's own size (≤ k: a probe can have fewer than k candidates),
    * so a small corpus can still audit exactly.
    *
    * Scale: both sides restrict to the probe set (tiny); the join is
    * (query_id, neighbor_id) on two ≤ n_probes·k row sets. rows-only:
    * k-means assignment isn't ANSI-expressible. */
  def ivfRecallAudit(e: DataFrame, queryPred: Column, k: Int,
      nprobe: Int = 2, nlist: Int = 10): DataFrame =
    recallAccounting(
      brute(e, queryPred, k),
      ivf(e, queryPred, k, nprobe, nlist), k)

  /** [[ivfRecallAudit]] for the PRODUCTION path: the persisted
    * quantized IVF probe ([[writeIvfIndexQuantized]] /
    * [[searchIvfIndexQuantized]]) against the quantized brute baseline
    * on the same probes. Both sides rank with the SAME integer scoring
    * chain, so the recall number isolates exactly what the list
    * PRUNING costs — no quantization-error confound (that error is
    * bounded separately by the knn_quantized recall spec against float
    * brute). The index build is the once-per-release job; the audit is
    * the per-release sign-off row next to it. */
  def ivfQuantizedRecallAudit(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, queryPred: Column, k: Int,
      nprobe: Int = 2, nlist: Int = 10): DataFrame = {
    val centroids = writeIvfIndexQuantized(e, tableName, path,
      nlist = nlist, buckets = 8)
    recallAccounting(
      bruteQuantized(e, queryPred, k),
      searchIvfIndexQuantized(spark, tableName, centroids,
        e.filter(queryPred), k, nprobe), k)
  }

  private def recallAccounting(brutePairs: DataFrame,
      probePairs: DataFrame, k: Int): DataFrame = {
    val b = brutePairs.select(col("query_id"), col("neighbor_id"))
    val a = probePairs
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    b.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy()
      .agg(
        countDistinct(col("query_id")).as("n_probes"),
        count(lit(1)).as("n_brute_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("k", lit(k.toLong))
      .withColumn("recall_milli",
        floor(col("n_hits").cast("double") * lit(1000.0) /
          col("n_brute_pairs").cast("double") + lit(0.5)).cast("long"))
  }

  def ivf(e: DataFrame, queryPred: Column, k: Int,
      nprobe: Int = 2, nlist: Int = 10): DataFrame = {
    // materialize the (id, v, nrm) base once: the k-means rounds, the
    // corpus assignment, and the query probes otherwise each re-scan the
    // source and re-derive norms — five scans collapse to one; the
    // finiteNorm fence keeps degenerate vectors out of the float path
    val base = e.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val centroids = kmeansCentroids(base, nlist)
    // assign every vector to its nearest centroid: broadcast centroids,
    // min_by agg (partial combine) — no vec_id shuffle+sort
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(centroids))).withColumn("d", sqDist),
      Seq("v", "nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"))
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("c_id"))
    val probes = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(withCnrm2(centroids)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("v"), col("nrm"), col("c_id"))
    val scored = probes.as("q").join(assigned.as("c"),
        col("q.c_id") === col("c.c_id") &&
          col("query_id") =!= col("c.vec_id"))
      .withColumn("score", cosine)
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))
    ranked(scored, k)
  }
  // ── Product quantization (IVF-PQ — the NINTH persisted-index family) ──
  //
  // The memory-scale end of the ANN ladder (SURVEY §2-F): brute → LSH →
  // IVF → IVF+int8 → IVF-PQ. int8 scalar quantization compresses 8× but
  // still stores one code PER DIMENSION; product quantization stores one
  // code per SUBSPACE (m codes for dim dims — dim/m× further), with
  // scoring against a per-query lookup table (Jégou et al., PAMI 2011:
  // "Product quantization for nearest neighbor search"). At the 100 TB
  // design point this is the difference between an embedding index that
  // fits executor memory and one that cannot: 64-dim float vectors are
  // 256 B/row, int8 codes 64 B, PQ codes (m=8) ~32 B including ids.

  /** Default PQ geometry: 8 subspaces, 16 centroids each — dim must be
    * divisible by [[PqSubspaces]] (in-plan fence in [[pqSubvectors]]). */
  val PqSubspaces = 8
  val PqCodesPerSub = 16

  /** Slice every unit-normalized vector into `m` equal subvectors:
    * (vec_id, sub_id ∈ [0,m), sv, sv2 = |sv|²). Normalizing FIRST makes
    * the additive ADC inner-product estimate approximate the COSINE
    * directly (Σ_j dot(q_j, c_j) over unit vectors), so PQ scores rank
    * on the same scale as every other ANN path here. The divisibility
    * fence raises in-plan (momentGuard posture — a truncating slice
    * would silently drop trailing dimensions, a wrong-answer
    * generator). Slice-then-normalize, NOT normalize-then-slice: a
    * whole-vector `u = transform(v, x -> x/nrm)` sibling alias gets
    * inlined by CollapseProject into each of the m slice calls — the
    * r12 hidden-O(m·dim) recompute class (r15 advice). Slicing `v`
    * first and dividing inside each slice touches every element exactly
    * once regardless of what the optimizer inlines, with the identical
    * IEEE division per element (each element belongs to exactly one
    * slice), so scores are bit-unchanged. `nrm` is a real column of the
    * caller's materialized base, never a recomputed alias chain. */
  private def pqSubvectors(e: DataFrame, m: Int): DataFrame =
    e.filter(finiteNorm(col("nrm")))
      .withColumn("dimguard",
        coalesce(assert_true(size(col("v")) % lit(m) === lit(0),
          concat(lit("pq: dimensionality "), size(col("v")).cast("string"),
            lit(s" not divisible by m=$m subspaces — a truncating slice " +
              "would silently drop trailing dimensions"))).cast("int"),
          lit(0)))
      .select(col("vec_id"),
        posexplode(expr(
          s"transform(sequence(0, ${m - 1}), s -> " +
            s"transform(slice(v, (s + dimguard) * (size(v) div $m) + 1, " +
            s"size(v) div $m), x -> x / nrm))")).as(Seq("sub_id", "sv")))
      .withColumn("sv2", DotProduct(col("sv"), col("sv")))

  private def pqSubDist: Column =
    col("sv2") + col("cn2") - lit(2.0) * DotProduct(col("sv"), col("cv"))

  /** Train the m per-subspace codebooks as ONE grouped Lloyd loop: all
    * m·ksub centroids update in the same distributed jobs, keyed by
    * (sub_id, c_id) — m separate k-means runs would serialize m driver
    * loops for no reason. Seeds are the subvectors of the `ksub`
    * corpus vectors with smallest xxhash64(vec_id) (the kmeansCentroids
    * discipline: deterministic, no driver randomness, and the SAME seed
    * rows for every subspace so each subspace starts with exactly ksub
    * centroids). Empty clusters KEEP their previous centroid
    * (left-join + coalesce) instead of vanishing — every subspace holds
    * exactly min(ksub, n) rows at all times, the uniform-layout
    * invariant the flattened ADC LUT addressing depends on.
    * Returns (sub_id, c_id, code_idx, cv, cn2) with code_idx a DENSE
    * 0-based index per subspace (row_number over ≤ m·ksub rows).
    *
    * Determinism scope (r15 advice): the centroid update is a
    * distributed avg(double), which is order-dependent across
    * PARTITIONINGS — so codebooks (and thus codes, where an assignment
    * is near-tied) are pinned deterministic for a fixed session/
    * partitioning (what PqSpec rebuilds under), NOT bit-identical
    * across arbitrary environments. That is the honest contract for a
    * rows-only approximate family; cross-environment reproducibility
    * of SERVED results comes from persisting the trained artifact
    * ([[writeIvfPqIndex]]) and probing it, never from retraining. */
  def pqCodebook(base: DataFrame, m: Int = PqSubspaces,
      ksub: Int = PqCodesPerSub, iters: Int = 2): DataFrame =
    pqCodebookFrom(pqSubvectors(base, m).localCheckpoint(true),
      base, m, ksub, iters)

  /** [[pqCodebook]] over an already-materialized subvector frame — the
    * shared face (r21, guide §1.2 step 1): [[writeIvfPqIndex]]
    * checkpoints ONE subvector derivation and feeds it to both the
    * codebook trainer and the encoder, instead of the encoder
    * re-deriving the per-vector normalized slices the trainer already
    * checkpointed. `subvecs` must be exactly
    * `pqSubvectors(base, m)` (or a materialization of it). */
  private def pqCodebookFrom(subvecs: DataFrame, base: DataFrame,
      m: Int, ksub: Int, iters: Int = 2): DataFrame = {
    val seedIds = base.filter(finiteNorm(col("nrm")))
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(ksub).select(col("vec_id"), col("h"))
    var centroids = subvecs.join(seedIds, Seq("vec_id"))
      .select(col("sub_id"), col("h").as("c_id"), col("sv").as("cv"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val scored = subvecs.join(
          broadcast(centroids.withColumn("cn2",
            DotProduct(col("cv"), col("cv")))), Seq("sub_id"))
        .withColumn("d", pqSubDist)
      val assigned = scored.groupBy(col("vec_id"), col("sub_id"))
        .agg(min_by(col("c_id"), struct(col("d"), col("c_id"))).as("c_id"),
          min_by(col("sv"), struct(col("d"), col("c_id"))).as("sv"))
      val means = assigned
        .select(col("sub_id"), col("c_id"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub_id"), col("c_id"), col("pos"))
        .agg(avg(col("x")).as("cx"))
        .groupBy(col("sub_id"), col("c_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("ps"))
        .select(col("sub_id"), col("c_id"),
          expr("transform(ps, p -> p.cx)").as("mv"))
      centroids = centroids.join(means, Seq("sub_id", "c_id"), "left")
        .select(col("sub_id"), col("c_id"),
          coalesce(col("mv"), col("cv")).as("cv"))
        .localCheckpoint(true)
    }
    val idxW = Window.partitionBy("sub_id").orderBy("c_id")
    centroids
      .withColumn("code_idx", (row_number().over(idxW) - lit(1)))
      .withColumn("cn2", DotProduct(col("cv"), col("cv")))
  }

  /** Encode every vector as its m-code array (dense code_idx per
    * subspace, subspace order): one broadcast codebook join + one
    * min_by assignment per (vec_id, sub_id) + one collect per vector.
    * Codes are DETERMINISTIC given the codebook: distance ties break on
    * c_id (the assignNearest posture), so rebuilds within one session/
    * partitioning produce identical code arrays (spec-pinned; see
    * [[pqCodebook]] for why the trainer itself is same-partitioning
    * deterministic only). */
  def pqEncode(base: DataFrame, codebook: DataFrame,
      m: Int = PqSubspaces): DataFrame =
    pqEncodeFrom(pqSubvectors(base, m), codebook)

  /** [[pqEncode]] over an already-derived subvector frame — see
    * [[pqCodebookFrom]]. */
  private def pqEncodeFrom(subvecs: DataFrame,
      codebook: DataFrame): DataFrame =
    subvecs
      .join(broadcast(codebook), Seq("sub_id"))
      .withColumn("d", pqSubDist)
      .groupBy(col("vec_id"), col("sub_id"))
      // given ONE codebook, encoding is fully deterministic (ties on
      // c_id); see pqCodebook's determinism-scope note for the trainer
      .agg(min_by(col("code_idx"), struct(col("d"), col("c_id"))).as("code_idx"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub_id"), col("code_idx"))))
        .as("sc"))
      .select(col("vec_id"),
        expr("transform(sc, p -> p.code_idx)").as("codes"))

  /** Build + persist the IVF-PQ index: coarse IVF assignment in float
    * space (the writeIvfIndex discipline — build accuracy is a
    * once-per-corpus offline cost), PQ codes per vector in the lists.
    * The bucketed layout (bucketBy c_id) keeps the probe equijoin free
    * of index-side Exchange exactly like the other persisted-index
    * families; [[graft.sources.Staged]] gives the tmp→aside→promote
    * rebuild with crash self-healing.
    *
    * ALL THREE artifacts persist (r15 advice): the code lists at
    * `tableName`, the coarse centroids at `tableName_coarse`, the
    * codebook at `tableName_codebook` — the streaming probe
    * ([[graft.streaming.Streaming.runKnnPqProbe]]) resolves the two
    * side tables BY NAME via Staged.liveTable, so they must be
    * crash-safe catalog artifacts, not just returned frames. Side
    * tables commit first, the main code table last (the Staged
    * multi-table discipline: the main-table promote is the commit
    * point probes key on). Returns (coarse, codebook) read back from
    * the promoted tables — tiny, broadcast at probe time. */
  def writeIvfPqIndex(e: DataFrame, tableName: String, path: String,
      nlist: Int = 10, m: Int = PqSubspaces, ksub: Int = PqCodesPerSub,
      buckets: Int = 8): (DataFrame, DataFrame) = {
    val spark = e.sparkSession
    val base = e.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val coarse = kmeansCentroids(base, nlist)
    // ONE subvector derivation feeds the codebook trainer AND the
    // encoder (r21 — pqEncode previously re-derived the normalized
    // slices the trainer had already checkpointed: one full per-vector
    // posexplode/normalize pass per build saved, values identical)
    val subvecs = pqSubvectors(base, m).localCheckpoint(true)
    val codebook = pqCodebookFrom(subvecs, base, m, ksub)
      .localCheckpoint(true)
    graft.sources.Staged.commit(spark, s"${tableName}_coarse",
        s"${path}_coarse") { (tbl, p) =>
      coarse.write.option("path", p)
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(tbl)
    }
    graft.sources.Staged.commit(spark, s"${tableName}_codebook",
        s"${path}_codebook") { (tbl, p) =>
      codebook.write.option("path", p)
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(tbl)
    }
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(coarse))).withColumn("d", sqDist),
      Seq.empty)
      .select(col("vec_id"), col("c_id"))
    val rows = assigned.join(pqEncodeFrom(subvecs, codebook), Seq("vec_id"))
    graft.sources.Staged.commit(spark, tableName, path) {
      (tbl, p) =>
        rows
          .repartition(col("c_id"))
          .write
          .option("path", p)
          .bucketBy(buckets, "c_id")
          .sortBy("c_id")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .saveAsTable(tbl)
    }
    (graft.sources.Staged.liveTable(spark, s"${tableName}_coarse"),
      graft.sources.Staged.liveTable(spark, s"${tableName}_codebook"))
  }

  /** Per-query flattened ADC lookup table: (query_id, lut) with
    * lut[sub_id·ksub_eff + code_idx] = dot(query subvector, centroid) —
    * the layout [[graft.functions.PqAdcScore]] reads. ksub_eff is the
    * realized per-subspace codebook size (= min(ksub, corpus size);
    * UNIFORM across subspaces by the pqCodebook empty-cluster-keep
    * invariant), inferred by the kernel from lut length / m. Built by
    * crossing the query subvectors with the broadcast codebook —
    * |Q|·m·ksub rows, tiny for any probe set. */
  def pqLut(queries: DataFrame, codebook: DataFrame,
      m: Int = PqSubspaces): DataFrame = {
    // ksub_eff per subspace for the flat key; uniform by construction —
    // computed in-plan (max code_idx + 1) so no driver round-trip
    val ksubEff = codebook.groupBy(col("sub_id"))
      .agg((max(col("code_idx")) + lit(1)).as("ksub_eff"))
    pqSubvectors(queries, m)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(codebook), Seq("sub_id"))
      .join(broadcast(ksubEff), Seq("sub_id"))
      .withColumn("k2",
        col("sub_id").cast("long") * col("ksub_eff").cast("long") +
          col("code_idx").cast("long"))
      .withColumn("dotv", DotProduct(col("sv"), col("cv")))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("k2"), col("dotv")))).as("kv"))
      .select(col("query_id"),
        expr("transform(kv, p -> p.dotv)").as("lut"))
  }

  /** Search the persisted IVF-PQ index: queries rank the float coarse
    * centroids for `nprobe` lists (broadcast — tiny), build their ADC
    * LUTs against the broadcast codebook, then meet the bucketed code
    * lists in a c_id equijoin and score each candidate with ONE
    * [[graft.functions.PqAdcScore]] table-lookup pass — O(m) per pair
    * instead of O(dim), over an index dim/m× smaller than int8 codes.
    * Scores are deterministic (fixed subspace loop order) and displayed
    * at floor-half-up 4 decimals like every other score here; ranks
    * break ties on neighbor_id. */
  def searchIvfPq(spark: SparkSession, tableName: String,
      coarse: DataFrame, codebook: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 2, m: Int = PqSubspaces): DataFrame =
    ranked(pqScored(pqProbes(coarse, codebook, queries, nprobe, m),
      graft.sources.Staged.liveTable(spark, tableName)), k)

  /** The PQ probe lists (query_id, c_id, lut): coarse ranking in float
    * space + the per-query flattened ADC LUT — shared by [[searchIvfPq]]
    * and its delta face. */
  private def pqProbes(coarse: DataFrame, codebook: DataFrame,
      queries: DataFrame, nprobe: Int, m: Int): DataFrame = {
    val q = queries.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val probeW = Window.partitionBy("query_id").orderBy(col("d"), col("c_id"))
    q.select(col("vec_id").as("query_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(withCnrm2(coarse)))
      .withColumn("d", sqDist)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("c_id"))
      .join(pqLut(q, codebook, m), Seq("query_id"))
  }

  /** Score PQ probe lists against one code-list frame with the O(m)
    * ADC kernel, UNRANKED. */
  private def pqScored(probes: DataFrame, index: DataFrame): DataFrame =
    probes.as("q")
      .join(index.as("c"),
        col("q.c_id") === col("c.c_id") &&
          col("query_id") =!= col("c.vec_id"))
      .withColumn("score",
        floor(graft.functions.PqAdcScore(col("c.codes"), col("q.lut"))
          * lit(10000.0) + lit(0.5)).cast("double") / lit(10000.0))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        col("score"))

  /** Append a crawl delta to the persisted IVF-PQ index — the ANN
    * delta completed at the memory-scale end of the ladder (r24; the
    * [[appendIvfIndexDelta]] posture with TWO frozen model artifacts):
    * delta vectors are assigned to the FROZEN coarse centroids and
    * ENCODED with the FROZEN codebook (both resolved BY NAME from the
    * live side tables — the runKnnPqProbe serving posture; retraining
    * either is the full-rebuild cadence), landing bucketed by `c_id`
    * with the in-table `base_gen` marker in ONE atomic Staged commit.
    * The coarse-alignment fence runs before any assignment; the
    * codebook has no join-observable mismatch signal (code_idx is
    * dense per subspace by construction), so its freshness rides the
    * Staged multi-table discipline — side tables promote before the
    * main table at build, and this append resolves all three at one
    * entry (the documented single-rename exposure, as everywhere).
    * Encoding is a pure per-vector function of (v, codebook), so the
    * delta rows are EXACTLY what a rebuild-with-frozen-model would
    * store — DeltaIndexSpec pins probe transparency across the merge,
    * a planted delta duplicate of a base vector surfacing at ~1.0, and
    * the staleness/disjointness fences. */
  def appendIvfPqIndexDelta(eNew: DataFrame, tableName: String,
      path: String, m: Int = PqSubspaces, buckets: Int = 8): Unit = {
    val spark = eNew.sparkSession
    graft.sources.Staged.recover(spark, tableName)
    require(spark.catalog.tableExists(tableName),
      s"appendIvfPqIndexDelta: no base index $tableName — build it " +
        "with writeIvfPqIndex first")
    val coarse = graft.sources.Staged.liveTable(spark,
      s"${tableName}_coarse")
    val codebook = graft.sources.Staged.liveTable(spark,
      s"${tableName}_codebook")
    val index = requireCentroidAlignment(spark, tableName, coarse)
    val base = eNew.filter(finiteNorm(col("nrm"))).localCheckpoint(true)
    val assigned = assignNearest(
      base.crossJoin(broadcast(withCnrm2(coarse))).withColumn("d", sqDist),
      Seq.empty)
      .select(col("vec_id"), col("c_id"))
    val rows = assigned.join(pqEncode(base, codebook, m), Seq("vec_id"))
      .select(col("vec_id"), col("codes"), col("c_id"))
    appendIvfDeltaRows(spark, index, rows, tableName, path,
      Seq("codes"), buckets)
  }

  /** [[searchIvfPq]] over base ∪ live delta — the [[searchIvfIndexDelta]]
    * shape for the PQ family: probe lists + LUTs computed once, each
    * side scored as its own c_id equijoin, scored rows unioned into the
    * one bounded rank. Frozen artifacts resolved by name. */
  def searchIvfPqDelta(spark: SparkSession, tableName: String,
      queries: DataFrame, k: Int, nprobe: Int = 2,
      m: Int = PqSubspaces): DataFrame = {
    val coarse = graft.sources.Staged.liveTable(spark,
      s"${tableName}_coarse")
    val codebook = graft.sources.Staged.liveTable(spark,
      s"${tableName}_codebook")
    val index = requireCentroidAlignment(spark, tableName, coarse)
    val probes = pqProbes(coarse, codebook, queries, nprobe, m)
      .localCheckpoint(true)
    val scored = pqScored(probes, index)
    ivfDelta(spark, tableName, Seq("codes")) match {
      case Some(dp) => ranked(scored.unionByName(pqScored(probes, dp)), k)
      case None => ranked(scored, k)
    }
  }

  /** [[ivfRecallAudit]] for the PQ path: persisted IVF-PQ probe vs the
    * float brute baseline on the same probes. Unlike the int8 audit the
    * number CONFOUNDS list pruning with quantization error by design —
    * PQ is lossy, and this row is the tuning signal for (m, ksub,
    * nprobe) together: the number a pipeline watches before trading
    * index memory for recall. */
  def pqRecallAudit(spark: SparkSession, e: DataFrame,
      tableName: String, path: String, queryPred: Column, k: Int,
      nprobe: Int = 2, nlist: Int = 10, m: Int = PqSubspaces,
      ksub: Int = PqCodesPerSub): DataFrame = {
    val (coarse, codebook) = writeIvfPqIndex(e, tableName, path,
      nlist = nlist, m = m, ksub = ksub)
    recallAccounting(
      brute(e, queryPred, k),
      searchIvfPq(spark, tableName, coarse, codebook,
        e.filter(queryPred), k, nprobe, m), k)
  }

  /** PQ CODE-SPACE balance audit over the persisted index (the
    * ivf_balance_audit discipline one level down): per subspace, codes
    * in use, dead codes (trained but never assigned — wasted LUT
    * entries and a retrain signal), occupancy extremes, and
    * max-over-ideal as the all-integer half-up milli. A collapsed
    * subspace (one hot code) contributes ~zero bits to the estimate —
    * recall decays silently while search "works"; this row is where
    * that shows first. One posexplode (m rows per vector) + one hash
    * agg to ≤ m·ksub rows, then a per-subspace rollup. */
  def pqCodeBalance(spark: SparkSession, tableName: String,
      codebook: DataFrame): DataFrame = {
    val occ = graft.sources.Staged.liveTable(spark, tableName)
      .select(posexplode(col("codes")).as(Seq("sub_id", "code_idx")))
      .groupBy(col("sub_id"), col("code_idx"))
      .agg(count(lit(1)).as("occ"))
    val trained = codebook.groupBy(col("sub_id"))
      .agg(count(lit(1)).as("n_codes_trained"))
    occ.groupBy(col("sub_id"))
      .agg(
        count(lit(1)).as("n_codes_used"),
        sum(col("occ")).as("n_vectors"),
        max(col("occ")).as("max_occ"),
        min(col("occ")).as("min_occ"))
      .join(broadcast(trained), Seq("sub_id"))
      .withColumn("n_codes_dead", col("n_codes_trained") - col("n_codes_used"))
      .withColumn("imb_milli",
        expr("(2 * max_occ * n_codes_used * 1000 + n_vectors) div " +
          "(2 * n_vectors)"))
      .select(col("sub_id"), col("n_codes_trained"), col("n_codes_used"),
        col("n_codes_dead"), col("n_vectors"), col("max_occ"),
        col("min_occ"), col("imb_milli"))
  }
}
