package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for CPU-dense stages over byte-tiny
  * inputs (optimization guide §2.5 input skew / §2.6 idle capacity).
  *
  * At the bench/test scale factors a whole table fits one scan split,
  * and AQE coalesces its byte-tiny shuffles to one partition — correct
  * by the bytes, but BYTES ARE THE WRONG PROXY for per-row work here:
  * the tokenize/explode, md5-anchor, candidate-pair-generation and
  * sparse-dot kernel stages do 10²–10⁴ of CPU work per input byte, so
  * the hot stage of a 32-core session runs on ONE core (measured r20:
  * doc_similar_prefix spent 4.66 s in a single-task pair-generation
  * stage and 2.35 s in a single-task tokenize stage while 31 cores sat
  * idle; boilerplate_audit 3.15 s single-task).
  *
  * [[slots]] decides ONCE per operator, from the SOURCE FILE BYTES of
  * the corpus relation: under defaultParallelism × 8 MiB it returns
  * defaultParallelism, otherwise 0 — so at any real scale, or when the
  * size is unknown (checkpointed/in-memory lineage), every spread call
  * is a no-op and the plan is unchanged: a corpus big enough to fill
  * the cluster's scan splits never pays an extra exchange. The spread
  * itself is an explicit repartition with a pinned partition count —
  * exactly what AQE's byte-based coalescing respects (user-specified
  * counts are not coalesced), and [[spreadBy]] pins the JOIN/AGG key so
  * the downstream join inherits the partitioning instead of adding an
  * exchange of its own.
  *
  * Scope rule: only exact-integer/digest pipelines may spread (token
  * counts, md5 grids, integer tf·idf weights, kernel dots) — their
  * results are order-free by the oracle doctrine. Float-summation
  * paths (money round(sum(double)), k-means/PQ training means) must
  * NEVER ride this: repartitioning changes their summation order, and
  * the rounded-boundary / trained-code drift that follows is exactly
  * the hazard class CLAUDE.md documents. */
object Par {
  private val BytesPerSlot = 8L << 20

  /** Spread width cap. MEASURED (r20): fanning a tiny stage out to all
    * 32 cores multiplies its TOTAL cpu ~7× — each thread runs only a
    * few hundred rows of the codegen'd stage, below the JIT compile
    * threshold, so every task stays in interpreted bytecode (a
    * single-task stage crosses the threshold early and runs the rest
    * compiled). A small fan-out keeps per-task row counts JIT-worthy
    * while still unsticking the one-core serialization. */
  private val MaxSlots = 8

  private val fileBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total bytes of the relation's source files; -1 when unknown
    * (checkpointed or in-memory lineage — treated as "big", so spreads
    * no-op). Memoized per file list per JVM (the LshBuckets.corpusSize
    * posture; a pure filesystem stat, no Spark job). */
  private def inputBytes(df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.isEmpty) -1L
    else {
      val token = s"${files.length}:${files.sorted.toSeq.hashCode}"
      fileBytes.computeIfAbsent(token, _ => Long.box {
        val conf = df.sparkSession.sessionState.newHadoopConf()
        files.map { f =>
          val p = new Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      }).longValue()
    }
  }

  /** The spread width for an operator whose corpus relation is `src`:
    * defaultParallelism when the source is provably tiny (total file
    * bytes < parallelism × 8 MiB), else 0 (= every spread no-ops). */
  def slots(src: DataFrame): Int = {
    val p = src.sparkSession.sparkContext.defaultParallelism
    val bytes = inputBytes(src)
    if (p > 1 && bytes >= 0L && bytes < p.toLong * BytesPerSlot)
      math.min(p, MaxSlots)
    else 0
  }

  /** Round-robin spread before a CPU-dense map/agg stage. */
  def spread(df: DataFrame, slots: Int): DataFrame =
    if (slots > 1) df.repartition(slots) else df

  /** Hash spread on the downstream join/agg key: the join reuses the
    * partitioning (no planner exchange on top), so the pair-generation
    * stage itself runs `slots`-wide. */
  def spreadBy(df: DataFrame, slots: Int, cols: Column*): DataFrame =
    if (slots > 1) df.repartition(slots, cols: _*) else df
}
