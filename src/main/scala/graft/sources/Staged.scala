package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Stage-and-promote discipline for the persisted serving artifacts —
  * [[EventLogWriter.compact]]'s tmp→aside→promote contract ported to the
  * `write*Index` family (r13 verdict #3): a rebuild must never leave the
  * SERVING table half-overwritten.
  *
  * The old writers ran `mode(Overwrite).saveAsTable(live)`: a crash
  * mid-write leaves the catalog entry pointing at a partially rewritten
  * directory — probes fail (or worse, read a torn index) until a manual
  * rebuild. Staged rebuilds instead:
  *
  *  1. build the new index COMPLETELY as `<table>__stage` at an
  *     alternating generation path (`<path>__a` / `<path>__b`, never the
  *     live directory — the live index serves uninterrupted while the
  *     build runs);
  *  2. promote with catalog metadata ops only: drop the live entry,
  *     rename the stage entry into its name (external tables keep their
  *     location through a rename — no data moves);
  *  3. sweep the previous generation's directory.
  *
  * Crash windows, each recoverable: during the stage build → live
  * untouched, the orphaned stage is overwritten by the next build;
  * between drop-live and rename → no live table but a COMPLETE stage
  * exists, and [[recover]] (run automatically at the top of every
  * [[commit]]) finishes the promote; after rename, before the sweep → an
  * orphan directory that the next build's generation alternation deletes
  * before writing. The remaining exposure is one catalog rename — the
  * compact argument verbatim: the best a non-transactional catalog
  * offers, with a table format's commit protocol as the production
  * hardening.
  *
  * Multi-table artifacts (postings + stats, vocab + merges, vectors +
  * vocab) stage each table through its own [[commit]], side tables
  * first, the MAIN table last — the main-table promote is the commit
  * point probes key on, so a crash between promotes leaves a fully
  * consistent old index or a fully built new one modulo that single
  * window. */
object Staged {

  private def stageName(table: String): String = s"${table}__stage"

  private def liveLocation(spark: SparkSession,
      table: String): Option[String] =
    if (!spark.catalog.tableExists(table)) None
    else Some(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location.toString)

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
  }

  /** Finish an interrupted promote: a `<table>__stage` entry with NO
    * live `<table>` means a crash hit between drop-live and rename —
    * the stage build was complete (it is only built before the drop),
    * so renaming it live restores service. A stage NEXT TO a live table
    * is an abandoned build (crash during or just after the stage
    * write): the live index is intact and authoritative, and the next
    * build overwrites the leftovers — left in place here. Returns true
    * when a promote was performed. */
  def recover(spark: SparkSession, table: String): Boolean = {
    val stage = stageName(table)
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(stage)) {
      spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
      true
    } else false
  }

  /** Probe-side read of a persisted serving artifact: runs [[recover]]
    * first so a promote that crashed between drop-live and rename
    * self-heals on the FIRST read rather than staying down until the
    * next rebuild happens to run (r14 advice — probe paths never
    * called recover themselves). A healthy table pays one catalog
    * existence check; a non-staged table is untouched (no stage entry
    * → recover is a no-op). Every `spark.table` read of a `write*`
    * artifact in the probe family goes through here. */
  def liveTable(spark: SparkSession, table: String): org.apache.spark.sql.DataFrame = {
    recover(spark, table)
    spark.table(table)
  }

  /** Generation identity of a staged artifact: the live table's storage
    * location PLUS its catalog create time. The location alone is NOT
    * unique — the `__a`/`__b` alternation cycles back after two
    * promotes, so a marker captured at generation A would spuriously
    * re-match the A-slot of a LATER rebuild (measured: DeltaIndexSpec's
    * rebuild-stales-the-delta row caught exactly this resurrection).
    * createTime is stamped when the stage table is created (a rename
    * preserves it), and sequential commits of one table can never share
    * a millisecond (each does a directory delete + a full write), so
    * (location, createTime) is unique per promote. Memo/validity keys
    * that must not survive a promote use this — a table name alone is
    * generation-blind. */
  def generation(spark: SparkSession, table: String): String =
    if (!spark.catalog.tableExists(table)) "<absent>"
    else {
      val meta = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table))
      s"${meta.location}@${meta.createTime}"
    }

  /** Run `write` (the caller's unchanged saveAsTable build) against the
    * STAGE identifiers, then promote the result to `table`. `write`
    * receives (stageTable, stagePath) and must write an EXTERNAL table
    * at exactly those ids. */
  def commit(spark: SparkSession, table: String, path: String)(
      write: (String, String) => Unit): Unit = {
    recover(spark, table)
    val stage = stageName(table)
    val oldLoc = liveLocation(spark, table)
    // alternate generations so the stage build never touches the live
    // directory; a pre-staged (unsuffixed) live location migrates to
    // generation __a and is swept like any old generation
    val stagePath =
      if (oldLoc.exists(_.endsWith("__a"))) s"${path}__b" else s"${path}__a"
    spark.sql(s"DROP TABLE IF EXISTS `$stage`")
    deleteDir(spark, stagePath)
    write(stage, stagePath)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    // sweep the displaced generation (never the one just promoted —
    // disjoint by the alternation, belt-and-braces checked anyway)
    oldLoc.map(_.stripPrefix("file:")).filterNot(_ == stagePath)
      .foreach(deleteDir(spark, _))
  }
}
