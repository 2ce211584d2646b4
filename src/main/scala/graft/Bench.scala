package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query cold times, a `warm`
  * map re-timing the historically slowest queries after codegen/cache
  * warmup (cold numbers attribute one-time codegen to whichever query
  * compiles an expression first), and a `failed` list so a broken
  * operator can never masquerade as a fast one. */
object Bench {
  // every query at or above this cold time is re-timed warm: cold
  // per-query numbers attribute one-time codegen/JIT to whichever query
  // compiles an expression first and swing 2–6× run-to-run on identical
  // code — only the warm map supports round-over-round per-query claims
  private val WarmThresholdSec = 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen startup so it isn't billed to the first query
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // release the eager localCheckpoint blocks a query pinned, OUTSIDE its
    // timed window: each registry call rebuilds its DataFrames from
    // scratch, so the blocks are never reused across queries — but left in
    // place they accumulate over all the cold runs and the warm re-times
    // then execute under end-of-run heap pressure (r8: warm > cold on
    // untouched code, 5–8× round-over-round swings on identical queries)
    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok) = time(name, fn)
      release()
      (name, sec, ok)
    }
    def fmt(v: Double): String = f"$v%.3f" // 3 decimals keep the line short
    val qs = results.map { case (k, v, ok) =>
      s"\"" + k + "\":" + (if (ok) fmt(v) else "-1")
    }.mkString("{", ",", "}")
    val warmResults = results
      .filter { case (_, sec, ok) => ok && sec >= WarmThresholdSec }
      .map { case (n, _, _) =>
        val (sec, ok) = time(n, SparkEntry.queries(n))
        release()
        (n, sec, ok)
      }
    val warm = warmResults.map { case (n, sec, ok) =>
      s"\"" + n + "\":" + (if (ok) fmt(sec) else "-1")
    }.mkString("{", ",", "}")
    // a query that succeeds cold but dies on the warm re-run is still a
    // flaky operator — it must surface in the headline failed list
    val failed =
      (results.filter(!_._3).map(_._1) ++ warmResults.filter(!_._3).map(_._1))
        .distinct
    val total = results.filter(_._3).map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // headline fields LAST: the driver stores a byte-bounded TAIL of the
    // output, so a long queries map must never push metric/value/total off
    // the end — anything truncated is the front of the line
    val line = s"""{"queries":$qs,"warm":$warm,"failed":$failedJson,"sf":"$sfDir","metric":"total","unit":"sec","value":${fmt(total)}}"""
    // also write the line to a file: sbt prints its own [success] trailer
    // after stdout, so a driver capturing the tail of the process output
    // can't reliably parse the stdout line
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () } // stdout line still stands
    spark.sparkContext.setLogLevel("ERROR") // nothing may print after the metric line
    println(line)
    spark.stop()
  }
}
