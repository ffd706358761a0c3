package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // uncounted warmup: absorb session init, parquet footer reads and
    // first-stage codegen/JIT so the first measured query isn't charged
    // for one-time JVM costs (standard benching practice; each query
    // still pays its own plan+codegen inside its measurement)
    try SparkEntry.queries.get("q01_pricing_summary")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // a failed query must NOT fold its elapsed time into the total (a
    // broken query would silently "improve" the line) — record it in
    // an explicit errors list instead. Name-sorted so every run (and
    // every round) executes in the same order: Map iteration order
    // shifts as queries are added, which moves JIT/GC neighborhoods
    // and makes per-query times incomparable across rounds.
    //
    // Each query runs `reps` times (default 3) and reports the MEDIAN:
    // single-run times on queries in the 0.2–4 s band have shown ±15%
    // whipsaw across rounds, which a median kills while an average
    // would let one GC pause poison. The spread (max−min across reps,
    // summed) is reported alongside so a noisy run is visible as data
    // rather than a ghost regression. Repetitions run back-to-back per
    // query (not as whole-suite passes) so each query's reps share the
    // same JIT/GC neighborhood.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
        // between reps (outside the timed window): drop the rep's
        // leaked storage. clearCache() FIRST — it both unpersists and
        // DEREGISTERS DataFrame cache entries, where a raw RDD
        // unpersist would leave a stale CacheManager entry that turns
        // the next rep's identical .cache() into a no-op serving a
        // dropped buffer (every consumer then recomputes, uncached).
        // Then drop leftover RDD-level storage (localCheckpointed
        // operator results — unreferenced once counted, but reclaimed
        // only after a JVM GC notifies the context cleaner); without
        // this, reps 2-3 of persist-heavy queries run under
        // accumulating storage/GC pressure and medians read 30-50%
        // above a clean single run (measured at sf0.1).
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        t
      }
      (name, times.sorted, times.length == reps)
    }
    val good = results.filter(_._3)
    val errors = results.filterNot(_._3).map(_._1)
    def median(ts: Seq[Double]): Double = ts(ts.length / 2)
    val qs = good.map { case (k, ts, _) => s"\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map { case (_, ts, _) => median(ts) }.sum
    val spread = good.map { case (_, ts, _) => ts.last - ts.head }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"spread":$spread,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // also land the line in a file: the stdout copy gets wrapped in sbt
    // noise, which breaks machine parsing of the bench result
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    if (errors.nonEmpty) System.err.println(s"[bench] FAILED queries: ${errors.mkString(", ")}")
    spark.stop()
  }
}
