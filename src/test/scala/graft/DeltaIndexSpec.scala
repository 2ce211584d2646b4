package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Delta-merge index maintenance (r17 verdict #1): a crawl delta
  * appends its own generation instead of paying a full-corpus rebuild.
  *
  * Pins, per family (postings / doc-vector):
  *  - probe over base ∪ delta ≡ probe over a FULL rebuild (the
  *    transparent-hop contract the shared oracle rides) — for postings
  *    exactly (all stats additive, idf derived at probe time); for
  *    vectors under the frozen-vocab contract (vocab from base);
  *  - repeat appends extend the delta and stay exact;
  *  - mergeTextIndex / mergeDocVectorIndex compact index ROWS (zero
  *    tokenize passes), drop the delta, keep the probe row-identical,
  *    and re-running the merge is a no-op (idempotent);
  *  - the doc-disjointness fences fire by name on a re-crawled doc;
  *  - a full rebuild STALES a live delta (generation marker) — probes
  *    ignore it and the next append replaces it.
  */
class DeltaIndexSpec extends SparkSpec {

  private val Terms = Seq("vector", "stream", "window", "hash")

  private lazy val docs =
    graft.text.TextOps.docs(spark, SF).localCheckpoint(true)

  // the registry rows' split: ~3/4 base, ~1/4 delta, md5-deterministic
  private def isDelta =
    substring(md5(concat_ws(":", col("doc_id").cast("string"),
      lit("dsd"))), 1, 1) >= "c"
  private lazy val base = docs.filter(!isDelta).localCheckpoint(true)
  private lazy val delta = docs.filter(isDelta).localCheckpoint(true)

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_delta_$tag").toString + "/idx"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def dropAll(tbl: String): Unit =
    Seq(tbl, s"${tbl}_stats", s"${tbl}_vocab", s"${tbl}_delta",
      s"${tbl}_delta_stats", s"${tbl}__stage", s"${tbl}_delta__stage")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

  test("postings delta: probe over base ∪ delta ≡ full rebuild ≡ ad-hoc bm25; merge keeps it; merge is idempotent") {
    val tbl = "dlt_text_a"
    val path = freshDir("ta")
    dropAll(tbl)
    assert(base.count() > 0 && delta.count() > 0, "degenerate split")
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(delta, tbl, path)
    val want = rows(TextOps.bm25Search(docs, Terms))
    assert(want.nonEmpty)
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == want,
      "base ∪ delta probe differs from the ad-hoc full-corpus bm25")
    // the full-rebuild reference: one index over everything
    val fullTbl = "dlt_text_full"
    dropAll(fullTbl)
    TextOps.writeTextIndex(docs, fullTbl, freshDir("tf"))
    assert(rows(TextOps.searchIndex(spark, fullTbl, Terms)) == want)
    // merge: index-row compaction — probe unchanged through BOTH faces,
    // delta gone
    TextOps.mergeTextIndex(spark, tbl, path)
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    assert(!spark.catalog.tableExists(s"${tbl}_delta_stats"))
    assert(rows(TextOps.searchIndex(spark, tbl, Terms)) == want)
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == want)
    // idempotent: a second merge is a no-op
    TextOps.mergeTextIndex(spark, tbl, path)
    assert(rows(TextOps.searchIndex(spark, tbl, Terms)) == want)
  }

  test("postings delta: repeat appends extend the delta generation and stay exact") {
    val tbl = "dlt_text_b"
    val path = freshDir("tb")
    dropAll(tbl)
    // split the delta itself in two batches
    val d1 = delta.filter(col("doc_id") % 2 === 0).localCheckpoint(true)
    val d2 = delta.filter(col("doc_id") % 2 =!= 0).localCheckpoint(true)
    assert(d1.count() > 0 && d2.count() > 0, "degenerate delta split")
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(d1, tbl, path)
    TextOps.appendTextIndexDelta(d2, tbl, path)
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) ==
      rows(TextOps.bm25Search(docs, Terms)))
  }

  test("postings delta: disjointness fences fire by name on re-crawled docs") {
    val tbl = "dlt_text_c"
    val path = freshDir("tc")
    dropAll(tbl)
    TextOps.writeTextIndex(base, tbl, path)
    // a batch containing a base doc
    val e1 = intercept[IllegalArgumentException] {
      TextOps.appendTextIndexDelta(base.limit(1), tbl, path)
    }
    assert(e1.getMessage.contains("already-indexed"), e1.getMessage)
    // a batch containing a live-delta doc
    TextOps.appendTextIndexDelta(delta, tbl, path)
    val e2 = intercept[IllegalArgumentException] {
      TextOps.appendTextIndexDelta(delta.limit(1), tbl, path)
    }
    assert(e2.getMessage.contains("already in the live delta"),
      e2.getMessage)
  }

  test("postings delta: a full rebuild stales the delta; the next append replaces it") {
    val tbl = "dlt_text_d"
    val path = freshDir("td")
    dropAll(tbl)
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(delta, tbl, path)
    // a full rebuild over the WHOLE corpus flips the base generation:
    // the delta's base_gen no longer matches — serving it would
    // double-count the delta docs the rebuild absorbed
    TextOps.writeTextIndex(docs, tbl, path)
    val want = rows(TextOps.bm25Search(docs, Terms))
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == want,
      "stale delta leaked into the probe after a full rebuild")
    // the stale delta does not block a fresh append cycle: rebuild on
    // base, then append replaces the stale generation outright
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(delta, tbl, path)
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == want)
  }

  test("live delta ingest: micro-batched arrivals converge the search to the ad-hoc full-corpus bm25; the audit tracks the masses") {
    val tbl = "dlt_text_live"
    val path = freshDir("tl")
    dropAll(tbl)
    TextOps.writeTextIndex(base, tbl, path)
    // replay the delta split as multiple micro-batches (file source,
    // one file per trigger — the orderedReplayDir posture)
    val dir = Files.createTempDirectory("graft_dlt_ingest").toString
    delta.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = graft.streaming.Streaming.runTextIndexDeltaIngest(spark,
      stream, tbl, path)
    q.processAllAvailable(); q.stop()
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) ==
      rows(TextOps.bm25Search(docs, Terms)),
      "converged live-ingested search differs from ad-hoc full corpus")
    // the audit sees exactly the ingested masses
    val a = TextOps.textIndexDeltaAudit(spark, tbl).collect().head
    assert(a.getAs[Long]("n_docs_base") == base.count() &&
      a.getAs[Long]("n_docs_delta") == delta.count(), a.toString)
    // post-merge steady state: delta masses report zero
    TextOps.mergeTextIndex(spark, tbl, path)
    val a2 = TextOps.textIndexDeltaAudit(spark, tbl).collect().head
    assert(a2.getAs[Long]("n_docs_delta") == 0L &&
      a2.getAs[Long]("delta_share_milli") == 0L &&
      a2.getAs[Long]("n_docs_base") == base.count() + delta.count(),
      a2.toString)
  }

  test("half-merged crash window (stats absorbed, postings not): probes never double-count, merge completes, append heals") {
    import graft.sources.Staged
    val tbl = "dlt_text_cw"
    val path = freshDir("tcw")
    dropAll(tbl)
    val d1 = delta.filter(col("doc_id") % 2 === 0).localCheckpoint(true)
    val d2 = delta.filter(col("doc_id") % 2 =!= 0).localCheckpoint(true)
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(d1, tbl, path)
    // simulate mergeTextIndex crashing BETWEEN its two commits:
    // replicate the first half verbatim — merged stats stamped with
    // the live delta's generation — and stop there
    def simulateHalfMerge(): Unit = {
      val merged = Staged.liveTable(spark, s"${tbl}_stats")
        .select(col("n_docs"), col("sum_dl"), col("n_docs_tok"))
        .unionByName(spark.table(s"${tbl}_delta")
          .select(col("n_docs"), col("sum_dl"), col("n_docs_tok"))
          .limit(1))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("sum_dl")).as("sum_dl"),
          sum(col("n_docs_tok")).as("n_docs_tok"))
        .withColumn("merged_delta",
          lit(Staged.generation(spark, s"${tbl}_delta")))
        .localCheckpoint(true)
      Staged.commit(spark, s"${tbl}_stats", s"${path}_stats") { (t, p) =>
        merged.write.option("path", p)
          .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(t)
      }
    }
    simulateHalfMerge()
    // window probe: the delta is ABSORBED — postings must come from
    // the base only (no row duplication is possible in any window);
    // scores use the delta-inclusive N, so compare DOC SETS
    val windowDocs = TextOps.searchIndexDelta(spark, tbl, Terms)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val baseDocs = TextOps.bm25Search(base, Terms)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(windowDocs == baseDocs,
      "half-merged window served delta postings (double-count risk)")
    // a merge RERUN completes the half-merge: postings land exactly
    // once, stats are not re-added
    TextOps.mergeTextIndex(spark, tbl, path)
    val wantHalf = rows(TextOps.bm25Search(
      base.unionByName(d1), Terms))
    assert(rows(TextOps.searchIndex(spark, tbl, Terms)) == wantHalf,
      "merge rerun lost or double-merged the absorbed delta")
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    // same window again, healed by the NEXT APPEND instead: the
    // absorbed d2 postings survive and the new batch lands cleanly
    TextOps.appendTextIndexDelta(d2, tbl, path)
    simulateHalfMerge()
    TextOps.appendTextIndexDelta(
      base.limit(0), tbl, path) // empty batch still heals first
    val wantAll = rows(TextOps.bm25Search(docs, Terms))
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == wantAll,
      "append-path heal lost the absorbed delta postings")
  }

  test("append crash windows (r18 ADVICE): the delta promotes atomically — stage leftovers are overwritten by a retry, a crashed promote heals on first read, and a retry after the heal raises the already-landed fence") {
    import graft.sources.Staged
    val tbl = "dlt_text_aw"
    val path = freshDir("taw")
    dropAll(tbl)
    val d1 = delta.filter(col("doc_id") % 2 === 0).localCheckpoint(true)
    val d2 = delta.filter(col("doc_id") % 2 =!= 0).localCheckpoint(true)
    TextOps.writeTextIndex(base, tbl, path)
    TextOps.appendTextIndexDelta(d1, tbl, path)
    // window A — crash DURING the stage write of append(d2): the live
    // delta (d1) is untouched and an orphaned stage table sits next to
    // it; simulate with a garbage stage entry
    spark.range(1)
      .selectExpr("'junk' AS term", "CAST(-1 AS BIGINT) AS doc_id",
        "CAST(0 AS BIGINT) AS dl", "CAST(0 AS BIGINT) AS tf",
        "CAST(0 AS BIGINT) AS n_docs", "CAST(0 AS BIGINT) AS sum_dl",
        "CAST(0 AS BIGINT) AS n_docs_tok", "'bogus' AS base_gen")
      .write.option("path", s"${path}_delta__junk")
      .saveAsTable(s"${tbl}_delta__stage")
    // probes still serve base ∪ d1 (the live delta is authoritative)
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) ==
      rows(TextOps.bm25Search(base.unionByName(d1), Terms)),
      "orphaned stage leaked into the probe")
    // the RETRY lands d2 exactly once (fences check the OLD live delta)
    TextOps.appendTextIndexDelta(d2, tbl, path)
    val wantAll = rows(TextOps.bm25Search(docs, Terms))
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == wantAll,
      "retry after a stage-write crash lost or doubled the batch")
    // window B — crash BETWEEN drop-live and rename (the promote
    // window): simulate by demoting the live delta back to its stage
    // name; the recover-on-read at the next probe entry completes the
    // promote and the batch is fully landed
    spark.sql(s"ALTER TABLE `${tbl}_delta` RENAME TO `${tbl}_delta__stage`")
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) == wantAll,
      "crashed promote did not self-heal on first read")
    assert(spark.catalog.tableExists(s"${tbl}_delta"))
    // a retry of the ALREADY-LANDED batch raises the disjointness fence
    // by name — the at-least-once retrier's already-landed signal
    val e = intercept[IllegalArgumentException] {
      TextOps.appendTextIndexDelta(d2.limit(1), tbl, path)
    }
    assert(e.getMessage.contains("already in the live delta"),
      e.getMessage)
  }

  test("token-less delta batch: the sentinel row carries the stats constants (no postings exist to carry them)") {
    val tbl = "dlt_text_tl"
    val path = freshDir("ttl")
    dropAll(tbl)
    TextOps.writeTextIndex(base, tbl, path)
    // a batch of docs with no tokens at all: stats must still count
    // them (n_docs) while zero posting rows land
    val tokenless = delta.limit(3)
      .withColumn("text", lit("   "))
      .localCheckpoint(true)
    TextOps.appendTextIndexDelta(tokenless, tbl, path)
    val a = TextOps.textIndexDeltaAudit(spark, tbl).collect().head
    assert(a.getAs[Long]("n_docs_delta") == 3L &&
      a.getAs[Long]("sum_dl_delta") == 0L, a.toString)
    // the probe is exact: token-less docs widen n_docs, nothing else
    assert(rows(TextOps.searchIndexDelta(spark, tbl, Terms)) ==
      rows(TextOps.bm25Search(base.unionByName(tokenless), Terms)),
      "token-less delta batch perturbed the probe")
  }

  test("doc-vector delta: probe over base ∪ delta ≡ frozen-vocab vectorization of the full corpus; merge compacts and is idempotent") {
    val tbl = "dlt_vec_a"
    val path = freshDir("va")
    dropAll(tbl)
    TextOps.writeDocVectorIndex(base, tbl, path)
    TextOps.appendDocVectorIndexDelta(delta, tbl, path)
    val pred = substring(md5(concat_ws(":", col("doc_id").cast("string"),
      lit("dlt"))), 1, 1) < "4"
    val got = rows(TextOps.docSimilarPersistedDelta(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5))
    // the frozen-vocab reference: every corpus doc re-vectorized
    // against the SAME frozen vocabulary (pins both the contract and
    // the stored-vector ≡ re-vectorized-doc bit-identity)
    val reference = rows(TextOps.docSimilarPersistedOn(spark,
      TextOps.vectorizeAgainstVocab(spark, docs, s"${tbl}_vocab"),
      docs, s"${tbl}_vocab", pred, tau = 0.5))
    assert(got.nonEmpty, "degenerate: no pairs at tau=0.5")
    assert(got == reference,
      "base ∪ delta probe differs from frozen-vocab full vectorization")
    // a delta doc must actually be reachable as a neighbor (the delta
    // rows are being SERVED, not just carried)
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.exists(r => deltaIds.contains(r(2).asInstanceOf[Long])),
      "no served neighbor came from the delta")
    TextOps.mergeDocVectorIndex(spark, tbl, path)
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    assert(rows(TextOps.docSimilarPersistedDelta(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5)) == got)
    TextOps.mergeDocVectorIndex(spark, tbl, path) // idempotent no-op
    assert(rows(TextOps.docSimilarPersisted(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5)) == got)
  }

  test("chunk delta faces: base ∪ delta chunk search ≡ ad-hoc; serve-delta ≡ serve with no delta; the vector audit reports masses + OOV and zeros when stale") {
    import graft.text.Chunks
    val tbl = "dlt_chunk_a"
    val path = freshDir("ca")
    Seq(tbl, s"${tbl}_stats", s"${tbl}_delta", s"${tbl}_vocab",
      s"${tbl}_post", s"${tbl}_post_stats", s"${tbl}_post_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    val cdBase = Chunks.chunkDocs(base).localCheckpoint(true)
    val cdDelta = Chunks.chunkDocs(delta).localCheckpoint(true)
    // (a) chunk postings delta: probe ≡ ad-hoc chunk search over the
    // union corpus (the text_search_delta transparency at chunk
    // granularity)
    TextOps.writeTextIndex(cdBase.select(col("doc_id"), col("text")),
      tbl, path)
    TextOps.appendTextIndexDelta(
      cdDelta.select(col("doc_id"), col("text")), tbl, path)
    assert(rows(Chunks.chunkSearchDelta(spark, tbl, Terms)) ==
      rows(Chunks.chunkSearch(docs, Terms)),
      "chunk base ∪ delta probe differs from ad-hoc chunk search")
    // (b) the serve pair with NO delta appended ≡ the plain serve face
    val vt = "dlt_chunk_v"
    val vpath = freshDir("cv")
    Seq(vt, s"${vt}_vocab", s"${vt}_delta", s"${vt}_post",
      s"${vt}_post_stats", s"${vt}_post_delta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    val cdAll = Chunks.chunkDocs(docs).localCheckpoint(true)
    TextOps.writeDocVectorIndex(cdAll, vt, vpath)
    TextOps.writeTextIndex(cdAll.select(col("doc_id"), col("text")),
      s"${vt}_post", s"${vpath}_post")
    assert(rows(Chunks.chunkHybridServeDelta(spark, s"${vt}_post", vt,
        s"${vt}_vocab")) ==
      rows(Chunks.chunkHybridServe(spark, s"${vt}_post", vt,
        s"${vt}_vocab")),
      "serve-delta face with no delta differs from the serve face")
  }

  test("doc-vector delta audit: masses and planted OOV measured; stale delta reports zero delta mass") {
    val tbl = "dlt_vec_aud"
    val path = freshDir("vau")
    dropAll(tbl)
    TextOps.writeDocVectorIndex(base, tbl, path)
    // plant a delta doc whose text is entirely OUT-OF-VOCAB: its whole
    // token mass must land in toks_oov and it must not vectorize
    val planted = delta.limit(1)
      .withColumn("text", lit("zzqx1 zzqx2 zzqx3"))
      .localCheckpoint(true)
    val deltaP = delta.join(planted.select("doc_id"), Seq("doc_id"),
        "left_anti")
      .unionByName(planted).localCheckpoint(true)
    TextOps.appendDocVectorIndexDelta(deltaP, tbl, path)
    val a = TextOps.docVectorDeltaAudit(spark, tbl, deltaP)
      .collect().head
    // vector masses match the stored tables exactly
    assert(a.getAs[Long]("n_vecs_base") == spark.table(tbl).count(),
      a.toString)
    assert(a.getAs[Long]("n_vecs_delta") ==
      spark.table(s"${tbl}_delta").count(), a.toString)
    assert(a.getAs[Long]("n_docs_delta") == deltaP.count(), a.toString)
    // the planted doc: counted in the batch, not vectorized, its 3
    // tokens in the OOV mass
    assert(a.getAs[Long]("n_docs_vectorized") <
      a.getAs[Long]("n_docs_delta"), a.toString)
    assert(a.getAs[Long]("toks_oov") >= 3L &&
      a.getAs[Long]("oov_milli") > 0L, a.toString)
    assert(a.getAs[Long]("delta_share_milli") > 0L, a.toString)
    // a full rebuild stales the delta: the audit must SHOW it (the
    // r18-verdict "silently serves base-only" nit, now measured)
    TextOps.writeDocVectorIndex(docs, tbl, path)
    val a2 = TextOps.docVectorDeltaAudit(spark, tbl, deltaP)
      .collect().head
    assert(a2.getAs[Long]("n_vecs_delta") == 0L &&
      a2.getAs[Long]("delta_share_milli") == 0L, a2.toString)
  }

  // ───── ANN delta (r18 verdict #1): frozen-centroid IVF append ─────

  private lazy val emb =
    graft.similarity.Knn.emb(spark, SF).localCheckpoint(true)
  private def isDeltaVec =
    substring(md5(concat_ws(":", col("vec_id").cast("string"),
      lit("ivfd"))), 1, 1) >= "c"
  private lazy val embBase = emb.filter(!isDeltaVec).localCheckpoint(true)
  private lazy val embDelta = emb.filter(isDeltaVec).localCheckpoint(true)

  test("IVF delta (float): base ∪ delta at nprobe = nlist ≡ brute over the full corpus; delta vectors serve; merge is row-transparent and idempotent") {
    import graft.similarity.Knn
    val tbl = "dlt_ivf_a"
    val path = freshDir("ia")
    dropAll(tbl)
    assert(embBase.count() > 0 && embDelta.count() > 0,
      "degenerate vector split")
    val centroids = Knn.writeIvfIndex(embBase, tbl, path, nlist = 8)
    Knn.appendIvfIndexDelta(embDelta, tbl, path, centroids)
    val q = col("vec_id") < 5
    // nprobe = nlist scores EVERY (query, candidate) pair regardless of
    // list assignment — the delta probe must equal float brute exactly
    // (the rebuild-with-frozen-model contract's strongest observable)
    val got = rows(Knn.searchIvfIndexDelta(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 8))
    val want = rows(Knn.brute(emb, q, k = 10))
    assert(want.nonEmpty && got == want,
      "base ∪ delta probe at nprobe = nlist differs from brute")
    // delta rows are SERVED, not just carried
    val deltaIds = embDelta.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.exists(r => deltaIds.contains(r(1).asInstanceOf[Long])),
      "no served neighbor came from the delta")
    // the PRUNED probe is transparent across the merge: pre-merge
    // delta search ≡ post-merge base search (delta assignment equals
    // what the merged index stores — zero assignment recompute)
    val pre = rows(Knn.searchIvfIndexDelta(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2))
    Knn.mergeIvfIndex(spark, tbl, path)
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    assert(rows(Knn.searchIvfIndex(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2)) == pre,
      "merge changed the pruned probe result")
    assert(rows(Knn.searchIvfIndexDelta(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2)) == pre,
      "delta face with no delta differs from the base face")
    Knn.mergeIvfIndex(spark, tbl, path) // idempotent no-op
    assert(rows(Knn.searchIvfIndex(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2)) == pre)
  }

  test("IVF delta probe plan: both sides are c_id equijoins — no cartesian, no nested loop (the searchIvfIndexOn shape twice)") {
    import graft.similarity.Knn
    val tbl = "dlt_ivf_p"
    val path = freshDir("ip")
    dropAll(tbl)
    val centroids = Knn.writeIvfIndex(embBase, tbl, path, nlist = 8)
    Knn.appendIvfIndexDelta(embDelta, tbl, path, centroids)
    val plan = Knn.searchIvfIndexDelta(spark, tbl, centroids,
        emb.filter(col("vec_id") < 5), k = 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("IVF delta: disjointness and centroid-alignment fences fire by name; a full rebuild stales the delta") {
    import graft.similarity.Knn
    val tbl = "dlt_ivf_b"
    val path = freshDir("ib")
    dropAll(tbl)
    val centroids = Knn.writeIvfIndex(embBase, tbl, path, nlist = 8)
    val e1 = intercept[IllegalArgumentException] {
      Knn.appendIvfIndexDelta(embBase.limit(1), tbl, path, centroids)
    }
    assert(e1.getMessage.contains("already-indexed"), e1.getMessage)
    Knn.appendIvfIndexDelta(embDelta, tbl, path, centroids)
    val e2 = intercept[IllegalArgumentException] {
      Knn.appendIvfIndexDelta(embDelta.limit(1), tbl, path, centroids)
    }
    assert(e2.getMessage.contains("already in the live delta"),
      e2.getMessage)
    // a centroid frame from ANOTHER generation (shifted ids — the
    // index's lists don't exist in it) must be rejected BEFORE any
    // assignment happens
    val bogus = centroids.withColumn("c_id", col("c_id") + lit(1L))
    val e3 = intercept[IllegalArgumentException] {
      Knn.appendIvfIndexDelta(embDelta, tbl, path, bogus)
    }
    assert(e3.getMessage.contains("generation mismatch"), e3.getMessage)
    // the audit sees the live masses before the rebuild
    val a = Knn.ivfDeltaAudit(spark, tbl).collect().head
    assert(a.getAs[Long]("n_vecs_delta") == embDelta.count() &&
      a.getAs[Long]("delta_share_milli") > 0L, a.toString)
    // a full rebuild (fresh model over everything) stales the delta:
    // the probe must not double-serve the absorbed delta vectors
    val c2 = Knn.writeIvfIndex(emb, tbl, path, nlist = 8)
    val q = col("vec_id") < 5
    assert(rows(Knn.searchIvfIndexDelta(spark, tbl, c2,
        emb.filter(q), k = 10, nprobe = 2)) ==
      rows(Knn.searchIvfIndex(spark, tbl, c2,
        emb.filter(q), k = 10, nprobe = 2)),
      "stale delta leaked into the probe after a full rebuild")
    // ...and the audit SHOWS the staleness as zero delta mass
    val a2 = Knn.ivfDeltaAudit(spark, tbl).collect().head
    assert(a2.getAs[Long]("n_vecs_delta") == 0L &&
      a2.getAs[Long]("delta_share_milli") == 0L, a2.toString)
  }

  test("IVF delta (quantized): repeat appends extend the generation; base ∪ delta at nprobe = nlist ≡ quantized brute; merge carries the code rows") {
    import graft.similarity.Knn
    val tbl = "dlt_ivf_q"
    val path = freshDir("iq")
    dropAll(tbl)
    val d1 = embDelta.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val d2 = embDelta.filter(col("vec_id") % 2 =!= 0).localCheckpoint(true)
    assert(d1.count() > 0 && d2.count() > 0, "degenerate delta split")
    val centroids = Knn.writeIvfIndexQuantized(embBase, tbl, path, nlist = 8)
    Knn.appendIvfIndexQuantizedDelta(d1, tbl, path, centroids)
    Knn.appendIvfIndexQuantizedDelta(d2, tbl, path, centroids)
    val q = col("vec_id") < 5
    val got = rows(Knn.searchIvfIndexQuantizedDelta(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 8))
    val want = rows(Knn.bruteQuantized(emb, q, k = 10))
    assert(want.nonEmpty && got == want,
      "quantized base ∪ delta at nprobe = nlist differs from " +
        "quantized brute")
    val pre = rows(Knn.searchIvfIndexQuantizedDelta(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2))
    Knn.mergeIvfIndex(spark, tbl, path, carry = Seq("qv", "qnrm"))
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    assert(rows(Knn.searchIvfIndexQuantized(spark, tbl, centroids,
      emb.filter(q), k = 10, nprobe = 2)) == pre,
      "quantized merge changed the pruned probe result")
  }

  test("live doc-vector delta ingest: micro-batched arrivals converge the probe to the frozen-vocab full vectorization") {
    val tbl = "dlt_vec_live"
    val path = freshDir("vl")
    dropAll(tbl)
    TextOps.writeDocVectorIndex(base, tbl, path)
    val dir = Files.createTempDirectory("graft_dvec_ingest").toString
    delta.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = graft.streaming.Streaming.runDocVectorDeltaIngest(spark,
      stream, tbl, path)
    q.processAllAvailable(); q.stop()
    val pred = substring(md5(concat_ws(":", col("doc_id").cast("string"),
      lit("dlt"))), 1, 1) < "4"
    val got = rows(TextOps.docSimilarPersistedDelta(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5))
    val reference = rows(TextOps.docSimilarPersistedOn(spark,
      TextOps.vectorizeAgainstVocab(spark, docs, s"${tbl}_vocab"),
      docs, s"${tbl}_vocab", pred, tau = 0.5))
    assert(got.nonEmpty && got == reference,
      "live-ingested vector delta differs from frozen-vocab full " +
        "vectorization")
    // the audit sees the converged masses
    val a = TextOps.docVectorDeltaAudit(spark, tbl, delta).collect().head
    assert(a.getAs[Long]("n_vecs_delta") > 0L &&
      a.getAs[Long]("delta_share_milli") > 0L, a.toString)
  }

  test("live IVF delta ingest: micro-batched vector arrivals converge the probe to brute at nprobe = nlist") {
    import graft.similarity.Knn
    val tbl = "dlt_ivf_live"
    val path = freshDir("il")
    dropAll(tbl)
    spark.sql(s"DROP TABLE IF EXISTS `${tbl}_centroids`")
    Knn.writeIvfIndex(embBase, tbl, path, nlist = 8,
      persistCentroids = true)
    // replay the RAW delta rows (vec_id, label, embedding) — the
    // ingest dual normalizes through the one embOf definition
    val rawDelta = spark.read
      .parquet(s"$SF/embeddings.parquet")
      .filter(substring(md5(concat_ws(":", col("vec_id").cast("string"),
        lit("ivfd"))), 1, 1) >= "c")
      .localCheckpoint(true)
    val dir = Files.createTempDirectory("graft_ivf_ingest").toString
    rawDelta.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(rawDelta.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = graft.streaming.Streaming.runIvfIndexDeltaIngest(spark,
      stream, tbl, path, s"${tbl}_centroids")
    q.processAllAvailable(); q.stop()
    val centroids = graft.sources.Staged.liveTable(spark,
      s"${tbl}_centroids")
    val qp = col("vec_id") < 5
    assert(rows(Knn.searchIvfIndexDelta(spark, tbl, centroids,
        emb.filter(qp), k = 10, nprobe = 8)) ==
      rows(Knn.brute(emb, qp, k = 10)),
      "live-ingested IVF delta differs from brute at nprobe = nlist")
  }

  test("IVF-PQ delta: frozen coarse+codebook append serves a planted delta duplicate; merge is row-transparent; a rebuild stales the delta; fences fire") {
    import graft.similarity.Knn
    val tbl = "dlt_pq_a"
    val path = freshDir("pa")
    Seq(tbl, s"${tbl}_coarse", s"${tbl}_codebook", s"${tbl}_delta",
      s"${tbl}__stage", s"${tbl}_delta__stage")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    // plant a delta vector that duplicates a base vector byte-for-byte:
    // encoding is a pure function of (v, codebook), so the twin gets
    // the base row's exact codes and must serve among its neighbors
    val baseRow = embBase.orderBy(col("vec_id")).limit(1)
      .localCheckpoint(true)
    val baseId = baseRow.select("vec_id").head.getLong(0)
    val twin = baseRow.withColumn("vec_id", lit(999999L))
    val deltaP = embDelta.unionByName(twin).localCheckpoint(true)
    Knn.writeIvfPqIndex(embBase, tbl, path, nlist = 8)
    Knn.appendIvfPqIndexDelta(deltaP, tbl, path)
    val served = Knn.searchIvfPqDelta(spark, tbl,
        emb.filter(col("vec_id") === baseId), k = 5, nprobe = 8)
      .collect()
    assert(served.exists(_.getAs[Long]("neighbor_id") == 999999L),
      s"planted delta twin not served: ${served.mkString(";")}")
    // disjointness fences by name
    val e1 = intercept[IllegalArgumentException] {
      Knn.appendIvfPqIndexDelta(embBase.limit(1), tbl, path)
    }
    assert(e1.getMessage.contains("already-indexed"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Knn.appendIvfPqIndexDelta(twin, tbl, path)
    }
    assert(e2.getMessage.contains("already in the live delta"),
      e2.getMessage)
    // pruned-probe transparency across the merge (zero re-encode)
    val q = col("vec_id") < 5
    val pre = rows(Knn.searchIvfPqDelta(spark, tbl, emb.filter(q),
      k = 10, nprobe = 2))
    assert(pre.nonEmpty)
    Knn.mergeIvfIndex(spark, tbl, path, carry = Seq("codes"))
    assert(!spark.catalog.tableExists(s"${tbl}_delta"))
    val coarse = graft.sources.Staged.liveTable(spark, s"${tbl}_coarse")
    val codebook = graft.sources.Staged.liveTable(spark,
      s"${tbl}_codebook")
    assert(rows(Knn.searchIvfPq(spark, tbl, coarse, codebook,
      emb.filter(q), k = 10, nprobe = 2)) == pre,
      "PQ merge changed the pruned probe result")
    assert(rows(Knn.searchIvfPqDelta(spark, tbl, emb.filter(q),
      k = 10, nprobe = 2)) == pre,
      "PQ delta face with no delta differs from the base face")
    // a full rebuild (fresh coarse + codebook) stales a live delta
    val twin2 = baseRow.withColumn("vec_id", lit(999998L))
    Knn.appendIvfPqIndexDelta(twin2, tbl, path)
    Knn.writeIvfPqIndex(emb, tbl, path, nlist = 8)
    val c2 = graft.sources.Staged.liveTable(spark, s"${tbl}_coarse")
    val b2 = graft.sources.Staged.liveTable(spark, s"${tbl}_codebook")
    assert(rows(Knn.searchIvfPqDelta(spark, tbl, emb.filter(q),
        k = 10, nprobe = 2)) ==
      rows(Knn.searchIvfPq(spark, tbl, c2, b2, emb.filter(q),
        k = 10, nprobe = 2)),
      "stale PQ delta leaked into the probe after a full rebuild")
  }

  test("doc-vector delta: disjointness fence fires; a full rebuild stales the delta") {
    val tbl = "dlt_vec_b"
    val path = freshDir("vb")
    dropAll(tbl)
    TextOps.writeDocVectorIndex(base, tbl, path)
    val e = intercept[IllegalArgumentException] {
      TextOps.appendDocVectorIndexDelta(base.limit(5), tbl, path)
    }
    assert(e.getMessage.contains("already-indexed"), e.getMessage)
    TextOps.appendDocVectorIndexDelta(delta, tbl, path)
    val pred = substring(md5(concat_ws(":", col("doc_id").cast("string"),
      lit("dlt"))), 1, 1) < "4"
    // full rebuild over everything → delta stale → probe must not
    // double-serve the delta docs the rebuild absorbed
    TextOps.writeDocVectorIndex(docs, tbl, path)
    val want = rows(TextOps.docSimilarPersisted(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5))
    assert(rows(TextOps.docSimilarPersistedDelta(spark, docs, tbl,
      s"${tbl}_vocab", pred, tau = 0.5)) == want,
      "stale delta leaked into the probe after a full rebuild")
  }
}
