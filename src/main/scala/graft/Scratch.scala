package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan/timing harness: `runMain graft.Scratch <queryName> [sfDir]`
  * prints the formatted physical plan and per-run wall time for one
  * declared query. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        !sys.env.contains("SPARK_GRAFT_NOAQE"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "stages") { minhashStages(spark, sfDir); spark.stop(); return }
    if (name == "width") {
      // width <qname> [sfDir]: run one query under a narrow and a wide
      // session-level partitioning conf and diff the collected rows —
      // the dev-loop twin of WidthDeterminismSpec
      val qname = args(1)
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
      val bad = widthDiff(spark, qname, dir, verbose = true)
      println(if (bad) s"[scratch] $qname: WIDTH-DEPENDENT" else s"[scratch] $qname: stable")
      spark.stop(); return
    }
    if (name == "widthall") {
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      val flagged = SparkEntry.queries.keys.toSeq.sorted.filter { qname =>
        val bad = try widthDiff(spark, qname, dir, verbose = false)
        catch { case e: Throwable =>
          println(s"[scratch] $qname: ERROR ${e.getMessage.take(120)}"); false }
        println(s"[scratch] $qname: " + (if (bad) "WIDTH-DEPENDENT" else "ok"))
        bad
      }
      println(s"[scratch] flagged: ${flagged.mkString(", ")}")
      spark.stop(); return
    }
    if (name == "riskscan") {
      // riskscan [sfDir]: build every declared query's plan and print
      // the width-risk reasons the detector sees — the dev-loop twin
      // of WidthDeterminismSpec's self-enrollment gate
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      var n = 0
      SparkEntry.queries.keys.toSeq.sorted.foreach { qname =>
        val reasons = try queryRiskReasons(spark, qname, dir)
        catch { case e: Throwable =>
          println(s"[scratch] $qname: ERROR ${e.getMessage.take(120)}"); Nil }
        if (reasons.nonEmpty) { n += 1
          println(s"[scratch] $qname: ${reasons.mkString("; ")}") }
      }
      println(s"[scratch] riskscan: $n flagged of ${SparkEntry.queries.size}")
      spark.stop(); return
    }
    if (name == "appendstages") { appendStages(spark, sfDir); spark.stop(); return }
    if (name == "containstages") { containStages(spark, sfDir); spark.stop(); return }
    if (name == "q61stages") { pipelineStages(spark, sfDir); spark.stop(); return }
    if (name == "q61jobs") { pipelineJobs(spark, sfDir); spark.stop(); return }
    if (name == "pipeline") {
      val t0 = System.nanoTime()
      val counts = graft.etl.Pipeline.run(spark,
        "/root/reference/data/walmart_data.csv", "/tmp/graft_wh",
        graft.etl.RunContext("2026-08-12"))
      counts.toSeq.sorted.foreach { case (t, n) => println(s"[scratch] $t: $n") }
      println(s"[scratch] pipeline done in ${(System.nanoTime() - t0) / 1e9} s")
      spark.stop(); return
    }
    if (name == "dump") {
      // dump ONE query + its oracle SQL for a single-query
      // scripts/oracle_check.py pass: Scratch dump <qname> [sfDir]
      val qname = args(1)
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
      val out = s"/tmp/verify_one/$qname"
      SparkEntry.queries(qname)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(out)
      val sql = SparkEntry.oracleSql(qname)
        .flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                   case '\r' => "\\r"; case '\t' => "\\t"
                   case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/verify_one/oracle_sql.json"),
        s"""{"$qname": "$sql"}""")
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(s"[scratch] run $i: $n rows in ${(System.nanoTime() - t0) / 1e9} s")
    }
    spark.stop()
  }

  /** Runs `qname` under two sessions that differ only in partitioning
    * width (shuffle partitions + scan split width) and compares the
    * collected, canonically-sorted rows. Returns true when the outputs
    * DIFFER — i.e. the query's result depends on partial-aggregation
    * order, the q95 failure class. */
  /** Plan-walk width-risk detector: reasons this frame's OPTIMIZED
    * plan suggests the output could depend on partition width —
    * Spark's partial-aggregation order varies with scan/shuffle
    * width, so floating-point reductions and width-sensitive sketches
    * are the enrollment signal for [[WidthDeterminismSpec]]'s gate.
    *
    * Flags: (a) `avg`/`sum` over Double/Float anywhere in the plan
    * (the q95 class — float addition is non-associative, so ANY
    * reassociation can flip the last digit whether or not a `round`
    * sits above it); (b) `percentile_approx` (the sketch's merge
    * order is width-dependent by design); (c) `flatMapGroupsWithState`
    * / `mapGroupsWithState` (a custom stateful reducer — its per-key
    * fold can depend on batching/arrival grouping).
    *
    * The r9 blind spots are now mechanized, not hand-floored:
    *  - checkpoint-truncated plans: every
    *    [[graft.operators.Checkpoints]] materialization registers its
    *    pre-materialization plan (and aux plans like PrefixSum's
    *    splitter sketch) keyed by what the downstream plan scans; the
    *    walker recurses through [[graft.operators.Checkpoints.registeredPlans]];
    *  - streaming queries: every memory-sink stream records its
    *    analyzed plan in [[graft.streaming.StreamPlans]]; callers
    *    bracket a query build with `mark()`/`since()` and walk the
    *    recorded plans with [[planRiskReasons]] (see the enrollment
    *    gate in WidthDeterminismSpec and the `riskscan` mode here).
    */
  def widthRiskReasons(df: org.apache.spark.sql.DataFrame): Seq[String] =
    planRiskReasons(df.queryExecution.optimizedPlan)

  /** Full risk scan of one DECLARED query: builds its frame (which
    * RUNS any streams inside it — streaming queries are eager) and
    * combines the batch-plan reasons with the reasons of every stream
    * plan the build recorded. This is the one detector entry point
    * with NO structural blind spot — the enrollment gate's call. */
  def queryRiskReasons(spark: SparkSession, qname: String,
      dir: String): Seq[String] = {
    val mark = graft.streaming.StreamPlans.mark()
    val df = SparkEntry.queries(qname)(spark, dir)
    val batch = widthRiskReasons(df)
    val streams = graft.streaming.StreamPlans.since(mark).flatMap {
      case (sink, p) => planRiskReasons(p).map(r => s"stream[$sink]: $r")
    }
    (batch ++ streams).distinct
  }

  /** [[widthRiskReasons]] over a bare plan (a streaming query's
    * analyzed plan, or a checkpoint-registered plan), recursing
    * through checkpoint truncations. */
  def planRiskReasons(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    val seen = new java.util.IdentityHashMap[AnyRef, AnyRef]()
    def go(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        depth: Int): Seq[String] = {
      if (depth > 8 || seen.containsKey(p)) Nil
      else {
        seen.put(p, p)
        ownReasons(p) ++
          graft.operators.Checkpoints.registeredPlans(p)
            .flatMap(pre => go(pre, depth + 1))
            .distinct.map(r => s"via checkpoint: $r")
      }
    }
    go(plan, 0).distinct
  }

  /** The non-recursive reasons of ONE plan. */
  private def ownReasons(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      AggregateExpression, ApproximatePercentile, Average, Sum}
    import org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    def flatten(e: Expression): Seq[Expression] =
      e +: e.children.flatMap(flatten)
    val exprs = plan.collect { case p => p.expressions.flatMap(flatten) }.flatten
    def isFp(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == DoubleType || dt == FloatType
    val aggFns = exprs.collect {
      case ae: AggregateExpression => ae.aggregateFunction }
    val fpAvg = aggFns.exists {
      case a: Average => isFp(a.child.dataType); case _ => false }
    val fpSum = aggFns.exists {
      case s: Sum => isFp(s.child.dataType); case _ => false }
    val sketch = aggFns.exists {
      case _: ApproximatePercentile => true; case _ => false }
    val stateful = plan.collectFirst {
      case _: FlatMapGroupsWithState => () }.nonEmpty
    Seq(
      if (fpAvg) Some("avg over Double/Float (q95 class)") else None,
      if (fpSum) Some("sum over Double/Float") else None,
      if (sketch) Some("percentile_approx (width-sensitive sketch)") else None,
      if (stateful) Some("flatMapGroupsWithState (custom stateful reducer)")
      else None,
    ).flatten
  }

  def widthDiff(spark: SparkSession, qname: String, sfDir: String,
      verbose: Boolean): Boolean = {
    val fn = SparkEntry.queries(qname)
    def runAt(shuffle: Int, minSplits: Int): Seq[String] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", shuffle)
      s.conf.set("spark.sql.files.minPartitionNum", minSplits)
      s.conf.set("spark.sql.leafNodeDefaultParallelism", minSplits)
      fn(s, sfDir).collect()
        .map(_.toSeq.map(v => if (v == null) "\u2400" else v.toString).mkString("|"))
        .toSeq.sorted
    }
    val narrow = runAt(3, 1)
    val wide = runAt(32, 32)
    val differ = narrow != wide
    if (differ && verbose) {
      narrow.zipAll(wide, "<missing>", "<missing>").filter(p => p._1 != p._2)
        .take(10).foreach { case (a, b) =>
          println(s"[scratch]   narrow: $a\n[scratch]   wide:   $b")
        }
    }
    differ
  }

  /** Job-level timeline of one warm q61 run: every Spark job's span
    * plus the driver-side gaps between jobs (plan/codegen/drain time —
    * the fixed cost the job timings don't show). */
  private def pipelineJobs(spark: SparkSession, sfDir: String): Unit = {
    import scala.collection.mutable.ArrayBuffer
    val jobs = ArrayBuffer.empty[(Int, Long, Long, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts =
        scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = e.stageInfos.lastOption.map(_.name)
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(e.jobId, (e.time, desc))
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, desc) =>
          jobs.synchronized { jobs += ((e.jobId, t0, e.time, desc)) }
        }
    }
    // warm run first so the timeline isn't first-compile noise
    SparkEntry.queries("q61_corpus_pipeline")(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    SparkEntry.queries("q61_corpus_pipeline")(spark, sfDir).count()
    val tEnd = System.currentTimeMillis()
    // drain the async listener bus BEFORE detaching, or the terminal
    // job's end event is lost and its span misreports as driver time
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    var cursor = t0
    jobs.sortBy(_._2).foreach { case (id, s, e, desc) =>
      val gap = s - cursor
      if (gap > 30) println(f"[scratch]   (driver gap ${gap / 1e3}%.2f s)")
      println(f"[scratch] job $id%3d ${(e - s) / 1e3}%6.2f s  " +
        f"@${(s - t0) / 1e3}%6.2f  ${desc.take(90)}")
      cursor = math.max(cursor, e)
    }
    if (tEnd > cursor) println(f"[scratch]   (tail gap ${(tEnd - cursor) / 1e3}%.2f s)")
    println(f"[scratch] total ${(tEnd - t0) / 1e3}%.2f s, ${jobs.size} jobs")
  }

  /** Times q61's internal phases with explicit actions to localize
    * the pipeline's fixed cost (each phase is forced with a count so
    * the numbers attribute to phases, unlike the fused real run). */
  private def pipelineStages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import graft.operators.{CorpusPipeline, Dedup, Packing, Sampling}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[scratch] $label: ${(System.nanoTime() - t0) / 1e9} s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup")(docs.count())
    // one full pass first so phase timings below are codegen-warm
    time("full q61 cold")(SparkEntry.queries("q61_corpus_pipeline")(spark, sfDir).count())
    val shingles = Dedup.shingleCache(docs, "doc_id", "text")
    val quality = docs.where(qualityScore(col("text")) >= 0.2).persist()
    time("quality")(quality.count())
    val exact = Dedup.exactByKey(quality, fingerprint(col("text")), "doc_id").persist()
    time("exact_dedup")(exact.count())
    val pairs = Dedup.simhashNearDupPairs(exact, "doc_id", "text",
      bits = 48, maxHamming = 3).persist()
    time("simhash pairs")(pairs.count())
    val cc = time("connectedComponents")(Dedup.connectedComponents(pairs))
    val nearDup = Dedup.dedupByClusters(exact, cc, "doc_id").persist()
    time("dedupByClusters")(nearDup.count())
    val cont = Dedup.contaminationFromSuperset(
      docs.filter(col("doc_id") < 10), nearDup, "doc_id", "text", shingles)
    val contaminated = cont.where(col("contamination_pct") > 0.0).select("doc_id")
    val clean = nearDup.join(contaminated, Seq("doc_id"), "left_anti").persist()
    time("decontaminate")(clean.count())
    val mixed = Sampling.mixtureSample(clean, col("source"), col("doc_id"),
      Map("src0" -> 0.5), 1.0).persist()
    time("mixture")(mixed.count())
    val (trainDocs, holdout) = Sampling.hashSplit(mixed,
      concat(col("doc_id"), lit("|holdout")), 0.1)
    val packed = Packing.packSequences(trainDocs.withColumn("n_tokens",
      tokenCount(col("text")).cast("long")), "doc_id", "n_tokens", 1024)
    time("pack+materialize train")(graft.operators.Checkpoints.materialize(packed).count())
    time("materialize holdout")(graft.operators.Checkpoints.materialize(holdout).count())
    shingles.release()
    Seq(quality, exact, pairs, nearDup, clean, mixed)
      .foreach(_.unpersist(blocking = false))
    time("full q61 run 1")(SparkEntry.queries("q61_corpus_pipeline")(spark, sfDir).count())
    time("full q61 run 2")(SparkEntry.queries("q61_corpus_pipeline")(spark, sfDir).count())
  }

  /** Times q75's pieces: index build, then the append call. */
  private def appendStages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[scratch] $label: ${(System.nanoTime() - t0) / 1e9} s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup")(docs.count())
    // parameters must mirror q75's (32 hashes / 16 bands) or the
    // profile localizes a plan the query does not run
    val idx = time("index build")(Dedup.minhashIndex(
      docs.filter(col("doc_id") < 400), "doc_id", "text", 3, 32, 16))
    val res = time("append")(Dedup.minhashLshAppend(
      idx, docs.filter(col("doc_id") >= 400), "text", 0.5))
    time("res.count")(res.count())
    idx.release()
    time("q28 for comparison")(
      SparkEntry.queries("q28_minhash_lsh")(spark, sfDir).count())
  }

  /** Re-derives minhashLsh's internal stages to localize cost. */
  /** Stage timings for the q148 containment pipeline (dev-only):
    * where do the ~5s go — shingling, the df join, the candidate
    * self-join, or the array-intersect verify? */
  private def containStages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[scratch] $label: ${(System.nanoTime() - t0) / 1e9} s"); r
    }
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val subsets = base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 15)).as("text"))
    val docs = base.unionByName(subsets)
    val shingled = docs
      .select(col("doc_id"),
        array_distinct(transform(wordShingles(col("text"), 3),
          s => md5Long(s))).as("sh"))
      .where(size(col("sh")) > 0).persist()
    time("warmup")(shingled.count())
    time("shingled.count (cached)")(shingled.count())
    val inv = shingled.select(col("doc_id"), explode(col("sh")).as("s"))
    time("inv.count")(inv.count())
    val dfCount = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val withDf = inv.join(dfCount, "s").persist()
    time("withDf materialize")(withDf.count())
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefixLen = col("sz") - ceil((lit(0.8) - lit(1e-4)) * col("sz")) + lit(1L)
    val indexed = withDf.withColumn("rn", row_number().over(w))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .where(col("rn") <= prefixLen)
      .where(col("df") <= 100 || col("rn") === 1)
      .select(col("doc_id"), col("s"))
    time("indexed(prefix).count")(println("[scratch] n_prefix=" + indexed.count()))
    val cand = indexed.as("a")
      .join(withDf.select(col("doc_id"), col("s")).as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_id_1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_2"))
      .distinct().persist()
    time("candidates distinct")(println("[scratch] n_cand=" + cand.count()))
    val s1 = shingled.select(col("doc_id").as("doc_id_1"), col("sh").as("sh1"))
    val s2 = shingled.select(col("doc_id").as("doc_id_2"), col("sh").as("sh2"))
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val verified = cand.join(s1, "doc_id_1").join(s2, "doc_id_2")
      .where(round(inter / size(col("sh1")), 4) >= 0.8 ||
        round(inter / size(col("sh2")), 4) >= 0.8)
    time("verify join")(verified.count())
    Seq(shingled, withDf, cand).foreach(_.unpersist(blocking = false))
    time("full q148")(SparkEntry.queries("q148_containment_pairs")(spark, sfDir).count())
    time("full q148 again")(SparkEntry.queries("q148_containment_pairs")(spark, sfDir).count())
  }

  private def minhashStages(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import graft.operators.Dedup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[scratch] $label: ${(System.nanoTime() - t0) / 1e9} s"); r
    }
    val docs = Tables.documents(spark, sfDir).repartition(col("doc_id"))
    val shingled = docs
      .select(col("doc_id"),
        transform(wordShingles(col("text"), 3), s => md5Long(s)).as("sh"))
      .where(size(col("sh")) > 0)
    time("warmup")(shingled.count())
    time("shingled.count")(shingled.count())
    val hashes = shingled.select(col("doc_id"), explode(col("sh")).as("h"))
    time("hashes.count")(hashes.count())
    val minAggs = Dedup.minhashConstants(64).zipWithIndex.map {
      case ((a0, a1), i) =>
        val M30 = (1L << 30) - 1; val M60 = (1L << 60) - 1
        val h0 = col("h").bitwiseAND(lit(M30)); val h1 = shiftright(col("h"), 30)
        val cross = (lit(a0) * h1 + lit(a1) * h0).bitwiseAND(lit(M30))
        min((lit(a0) * h0 + shiftleft(cross, 30)).bitwiseAND(lit(M60))).as(s"m$i")
    }
    val sigs = hashes.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    time("sigs agg 1st")(sigs.count())
    time("sigs agg 2nd")(sigs.count())
    val bucketCols = (0 until 16).map { b =>
      concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}")): _*)
    }
    val buckets = sigs.select(col("doc_id"), posexplode(array(bucketCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("buckets.count")(buckets.count())
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2")).distinct()
    time("candidates.count")(candidates.count())
    time("full q28")(SparkEntry.queries("q28_minhash_lsh")(spark, sfDir).count())
  }
}
