package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query cold times, a `warm`
  * map re-timing the historically slowest queries after codegen/cache
  * warmup (cold numbers attribute one-time codegen to whichever query
  * compiles an expression first), a `phases` map splitting the
  * persisted-index rows into their build (index write) and probe
  * (search) components, and a `failed` list so a broken operator can
  * never masquerade as a fast one. */
object Bench {
  // every query at or above this cold time is re-timed warm: cold
  // per-query numbers attribute one-time codegen/JIT to whichever query
  // compiles an expression first and swing 2–6× run-to-run on identical
  // code — only the warm map supports round-over-round per-query claims
  private val WarmThresholdSec = 0.5

  // rows whose registry lambda performs an eager index WRITE before
  // returning the probe plan — their cold number conflates a build job
  // with a search, so the `phases` map reports both components
  private val PhaseSplit =
    Set("dedup_incremental", "knn_ivf_persisted", "knn_ivf_quantized",
      "text_search_indexed", "token_count_bpe_persisted",
      "contamination_semantic_ivf", "contamination_semantic_ivf_audit",
      "contamination_report_ivf", "domain_classifier_persisted",
      "knn_recall_audit_quantized", "knn_label_prop_ivf",
      "doc_similar_persisted", "chunk_similar_persisted",
      "chunk_hybrid_rrf",
      // _build here = base index write + the delta append (two
      // generation commits); _probe = the base ∪ delta search
      "text_search_delta", "doc_similar_delta", "knn_ivf_delta",
      "chunk_search_delta", "chunk_hybrid_serve_delta",
      "doc_vector_delta_audit", "knn_pq_delta", "ivf_delta_audit",
      "triplet_mine_ivf", "knn_pq", "pq_recall_audit", "pq_code_balance",
      "hybrid_search_ivf", "hybrid_search_pq", "chunk_hybrid_serve",
      "standing_query_route", "search_prf_persisted",
      "prf_terms_persisted", "search_prf_delta", "prf_terms_delta",
      "vocab_coverage_persisted", "oov_tag", "ivf_balance_audit",
      "lm_score_persisted", "boilerplate_tag_persisted")

  // box-load self-diagnosis (r17 verdict #3): the driver's 586 s r17
  // headline was a loaded-box artifact that cost a full adjudication
  // cycle (the judge re-ran the entire bench to prove it). These two
  // fields make a reading self-diagnosing: loadavg BEFORE the bench
  // contributes its own load, and the number of OTHER JVMs sharing the
  // box (the driver's selfcheck/sbt JVMs are the usual co-tenants).
  // Doctrine: a reading with load1_start well above ~4 or with other
  // JVMs present is non-evidentiary for per-query claims.
  private def loadAvg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      .trim.split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  private def otherJvms(): Long =
    try {
      val self = ProcessHandle.current().pid()
      ProcessHandle.allProcesses()
        .filter(p => p.pid() != self &&
          p.info().command()
            .map[java.lang.Boolean](_.contains("java")).orElse(false))
        .count()
    } catch { case _: Throwable => -1L }

  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen startup so it isn't billed to the first query
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark
  }

  // release the eager localCheckpoint blocks a query pinned, OUTSIDE its
  // timed window: each registry call rebuilds its DataFrames from
  // scratch, so the blocks are never reused across queries — but left in
  // place they accumulate over all the cold runs and later queries then
  // execute under end-of-run heap pressure (r8: warm > cold on untouched
  // code, 5–8× round-over-round swings on identical queries)
  private def release(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    // broadcast torrent blocks are only reclaimed when the ContextCleaner
    // sees their references garbage-collected — without this nudge they
    // accumulate over ~90 queries and the LATE-alphabet warm re-times run
    // under heap pressure (r11 trial: pipeline_full warm 17.6 s vs 8.5 s
    // clean, same code)
    System.gc()
  }

  /** (makeSec, execSec, ok): `make` times the registry lambda — for the
    * [[PhaseSplit]] rows that is the eager index-write job (plus any
    * eager checkpoint prep), for everything else it is plan construction
    * — and `exec` times the count. Cold/warm report make+exec, so the
    * headline is comparable across rounds. */
  private def time(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (Double, Double, Boolean) = {
    val t0 = System.nanoTime()
    try {
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, true)
    } catch {
      case _: Throwable => ((System.nanoTime() - t0) / 1e9, 0.0, false)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // sample BEFORE the session spins up its own 32 threads: load here
    // is the box's pre-existing occupancy, the field that adjudicates a
    // loaded-box reading without a judge re-run
    val loadStart = loadAvg()
    val jvmsStart = otherJvms()
    val spark = buildSession(cpus)
    // optional name filter (comma-separated, exact names) for LOCAL A/B
    // iteration only — unset (the driver's invocation) runs everything,
    // so the driver contract is unchanged
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly, not silently yield a 0-query run
    // that could be mistaken for (or overwrite) a full judge-facing run
    filter.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_FILTER names not in the registry: " +
          unknown.toSeq.sorted.mkString(","))
    }
    val selected = filter match {
      case Some(f) => SparkEntry.queries.filter { case (n, _) => f(n) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (mk, ex, ok) = time(spark, sfDir, fn)
      release(spark)
      (name, mk, ex, ok)
    }
    def fmt(v: Double): String = f"$v%.3f" // 3 decimals keep the line short
    val qs = results.map { case (k, mk, ex, ok) =>
      s"\"" + k + "\":" + (if (ok) fmt(mk + ex) else "-1")
    }.mkString("{", ",", "}")
    val phases = results
      .filter { case (n, _, _, ok) => ok && PhaseSplit(n) }
      .flatMap { case (n, mk, ex, _) =>
        Seq(s"\"${n}_build\":" + fmt(mk), s"\"${n}_probe\":" + fmt(ex))
      }.mkString("{", ",", "}")
    // the warm pass runs in a FRESH SparkSession: release() cannot reach
    // accumulated broadcast torrent blocks or late-run driver-heap
    // pressure, which made r8–r10 warm re-times of UNTOUCHED queries read
    // 3× their own cold time — a fresh context (codegen/JIT stay warm:
    // both are JVM-level) is the only clean instrument
    spark.stop()
    val spark2 = buildSession(cpus)
    val warmResults = results
      .filter { case (_, mk, ex, ok) => ok && mk + ex >= WarmThresholdSec }
      .map { case (n, _, _, _) =>
        val (mk, ex, ok) = time(spark2, sfDir, SparkEntry.queries(n))
        release(spark2)
        (n, mk + ex, ok)
      }
    val warm = warmResults.map { case (n, sec, ok) =>
      s"\"" + n + "\":" + (if (ok) fmt(sec) else "-1")
    }.mkString("{", ",", "}")
    // a query that succeeds cold but dies on the warm re-run is still a
    // flaky operator — it must surface in the headline failed list
    val failed =
      (results.filter(!_._4).map(_._1) ++ warmResults.filter(!_._3).map(_._1))
        .distinct
    val total = results.filter(_._4).map(r => r._2 + r._3).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // headline fields LAST: the driver stores a byte-bounded TAIL of the
    // output, so a long queries map must never push metric/value/total off
    // the end — anything truncated is the front of the line
    val line = s"""{"queries":$qs,"warm":$warm,"phases":$phases,"failed":$failedJson,"sf":"$sfDir","metric":"total","unit":"sec","value":${fmt(total)}}"""
    // SUMMARY-FIRST line (r13 verdict): a bounded capture of this output
    // — head or tail — must always contain the signal. The full line's
    // headline fields already survive a TAIL capture; this compact,
    // self-contained summary (totals, failures, warm medians) survives a
    // HEAD capture and gives a reader the round verdict without parsing
    // the 171-entry maps. It is a complete JSON object on its own line.
    val warmSecs = warmResults.filter(_._3).map(_._2).sorted
    val warmMedian =
      if (warmSecs.isEmpty) 0.0
      else warmSecs((warmSecs.size - 1) / 2)
    val loadEnd = loadAvg()
    val env = s""""load_start":[${loadStart.map(fmt).mkString(",")}],"load_end":[${loadEnd.map(fmt).mkString(",")}],"other_jvms_start":$jvmsStart,"other_jvms_end":${otherJvms()}"""
    // a FILTERED run self-declares (ADVICE r20): without the marker a
    // partial local A/B run is distinguishable from a full judge-facing
    // run only by n_queries; absent when unset, so the driver's
    // invocation emits a byte-identical summary
    val filterField = filter
      .map(f => s""""filter":"${f.toSeq.sorted.mkString(",")}",""")
      .getOrElse("")
    val summary = s"""{"summary":true,$filterField"metric":"total","unit":"sec","value":${fmt(total)},"sf":"$sfDir","n_queries":${results.size},"n_ok":${results.count(_._4)},"failed":$failedJson,"warm_n":${warmSecs.size},"warm_median_sec":${fmt(warmMedian)},$env}"""
    // also write both lines to a file: sbt prints its own [success]
    // trailer after stdout, so a driver capturing the tail of the process
    // output can't reliably parse the stdout lines
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (summary + "\n" + line + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () } // stdout lines still stand
    spark2.sparkContext.setLogLevel("ERROR") // nothing may print after the metric lines
    // summary FIRST **and LAST** (r14 verdict #1: the driver keeps the
    // TAIL of a bounded capture, so summary-first alone still lost the
    // headline when the full-maps line scrolled the window; printing it
    // on both sides makes any head- OR tail-bounded capture parseable)
    // — and the FULL per-query line on both sides too (r20 verdict #9:
    // BENCH_r19's tail capture cut the one full line mid-map and the
    // driver's PERF round-over-round table came out empty; emitting it
    // adjacent to each summary makes per_query reconstructible from
    // either end of a bounded capture)
    println(summary)
    println(line)
    println(line)
    println(summary)
    spark2.stop()
  }
}
