package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Staged

/** The staged-rebuild contract of the persisted-index writers
  * ([[graft.sources.Staged]], r13 verdict #3): a rebuild over a live
  * index alternates generation directories and sweeps the displaced one;
  * the one non-atomic window (drop-live → promote) self-recovers on the
  * next touch; probe semantics and the bucketed layout survive the
  * promote rename. One crash-recovery row per persisted-index family. */
class StagedSpec extends SparkSpec {

  private lazy val docs =
    graft.text.TextOps.docs(spark, SF).limit(40).localCheckpoint(true)
  private lazy val emb =
    graft.similarity.Knn.emb(spark, SF).localCheckpoint(true)

  private def location(tbl: String): String =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      .location.toString

  /** Order-free content digest of a table: count + XOR of row hashes
    * (xor, not sum — an ANSI long sum of 2⁶³-range hashes overflows). */
  private def checksum(tbl: String): (Long, Long) = {
    val df = spark.table(tbl)
    val cols = df.columns.map(c => s"`$c`").mkString(", ")
    val r = df.agg(count(lit(1)),
      expr(s"bit_xor(xxhash64($cols))")).collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_staged_$tag").toString + "/idx"

  test("staged commit alternates generations, sweeps the old one, leaves no stage table") {
    val tbl = "staged_alt_t"
    val path = freshDir("alt")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.text.Chunks.writeChunkIndex(docs, tbl, path)
    val loc1 = location(tbl)
    assert(loc1.endsWith("__a"), loc1)
    val want = checksum(tbl)
    graft.text.Chunks.writeChunkIndex(docs, tbl, path)
    val loc2 = location(tbl)
    assert(loc2.endsWith("__b"), loc2)
    // the displaced generation was swept from disk
    assert(!new java.io.File(loc1.stripPrefix("file:")).exists(), loc1)
    // no stage leftovers in the catalog; identical content
    assert(!spark.catalog.tableExists(s"${tbl}__stage"))
    assert(checksum(tbl) == want)
  }

  // one row per persisted-index family: build → simulate the crash
  // window (live dropped, COMPLETE stage present — exactly the state
  // between drop-live and promote) → recover → identical content
  private val families: Seq[(String, (String, String) => Unit)] = Seq(
    ("anchor", (t, p) => graft.dedup.Dedup.writeAnchorIndex(docs, t, p)),
    ("chunk", (t, p) => graft.text.Chunks.writeChunkIndex(docs, t, p)),
    ("text", (t, p) => graft.text.TextOps.writeTextIndex(docs, t, p)),
    ("bpe", (t, p) =>
      graft.text.TextOps.writeBpeModel(docs, t, p, numMerges = 5)),
    ("docvec", (t, p) =>
      graft.text.TextOps.writeDocVectorIndex(docs, t, p)),
    ("ivfq", (t, p) => {
      graft.similarity.Knn.writeIvfIndexQuantized(emb, t, p,
        nlist = 4, buckets = 2); ()
    }),
    ("boilerplate", (t, p) =>
      graft.text.Boilerplate.writeBoilerplateIndex(docs, t, p)))

  test("crash between drop-live and promote self-recovers, per persisted-index family") {
    families.foreach { case (name, build) =>
      val tbl = s"staged_cr_$name"
      val path = freshDir(name)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      build(tbl, path)
      val want = checksum(tbl)
      // simulate the crash: the stage build was complete and live was
      // dropped, but the promote rename never ran
      spark.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__stage")
      assert(!spark.catalog.tableExists(tbl))
      assert(Staged.recover(spark, tbl), s"$name: recover did not promote")
      assert(checksum(tbl) == want, s"$name: content changed by recovery")
      assert(!Staged.recover(spark, tbl), s"$name: recover not idempotent")
    }
  }

  test("liveTable self-heals a crashed promote at the FIRST probe read " +
      "(r14 advice: probes never called recover themselves)") {
    val tbl = "staged_lt_t"
    val path = freshDir("livetable")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}__stage")
    graft.text.Chunks.writeChunkIndex(docs, tbl, path)
    val want = checksum(tbl)
    // crash window: live dropped, complete stage present
    spark.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__stage")
    assert(!spark.catalog.tableExists(tbl))
    // a probe read through liveTable heals and serves in one call
    val served = Staged.liveTable(spark, tbl)
    assert(served.count() > 0)
    assert(spark.catalog.tableExists(tbl), "liveTable did not heal")
    assert(checksum(tbl) == want)
    // healthy table: liveTable is a plain read
    assert(Staged.liveTable(spark, tbl).count() == served.count())
  }

  test("an abandoned stage next to a live index is inert and overwritten by the next rebuild") {
    val tbl = "staged_orphan_t"
    val path = freshDir("orphan")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}__stage")
    graft.text.Chunks.writeChunkIndex(docs, tbl, path)
    val want = checksum(tbl)
    // plant an abandoned stage (a crash during a later build's stage
    // write leaves exactly this): any external table under the name
    docs.limit(3).write.option("path", s"${path}__orphan")
      .mode("overwrite").saveAsTable(s"${tbl}__stage")
    // the live index is authoritative: recover must NOT promote over it
    assert(!Staged.recover(spark, tbl))
    assert(checksum(tbl) == want)
    // the next rebuild replaces the orphan and promotes cleanly
    graft.text.Chunks.writeChunkIndex(docs, tbl, path)
    assert(!spark.catalog.tableExists(s"${tbl}__stage"))
    assert(checksum(tbl) == want)
  }

  test("probe semantics and the bucketed layout survive the promote rename") {
    val tbl = "staged_probe_t"
    val path = freshDir("probe")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.dedup.Dedup.writeAnchorIndex(docs, tbl, path)
    val shard = docs.limit(10)
    def probe() =
      graft.dedup.Dedup.incrementalSubstringPairs(spark, tbl, shard)
    val want = probe().collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "probe found no pairs on the index's own docs")
    // crash + recover, then the probe must read the SAME bucketed index
    spark.sql(s"ALTER TABLE $tbl RENAME TO ${tbl}__stage")
    assert(Staged.recover(spark, tbl))
    val after = probe()
    assert(after.collect().map(_.toSeq).toSet == want)
    // the rename kept the bucketed layout: the index side scans
    // pre-partitioned buckets (the dedup_incremental plan fence)
    val p = after.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), p)
  }
}
