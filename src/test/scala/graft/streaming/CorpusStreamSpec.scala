package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming corpus-ingest operators: each test proves the streaming
  * result equals the same transform run in plain batch (the
  * [[CorpusStream]] contract), plus the stateful budget fold's
  * cross-batch accumulation.
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Testdata documents staged with a synthetic ingest timestamp
    * (1 minute apart by doc_id) so event-time operators have a
    * realistic corpus to chew on. */
  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory("graft_docs_").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id") * 60000L))
      .select("doc_id", "ts", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def runStream(dir: String, sink: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode): Unit = {
    val q = transform(CorpusStream.readStream(spark, dir))
      .writeStream.format("memory").queryName(sink)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streaming content dedup keeps one document per fingerprint") {
    // replayed crawl: every 5th document re-delivered under a new id
    val dupDir = Files.createTempDirectory("graft_docs_dup_").toString
    val base = spark.read.parquet(docsDir)
    val replays = base.where(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("doc_id")))
    base.unionByName(replays).write.mode("overwrite").parquet(dupDir)

    runStream(dupDir, "dedup_sink", CorpusStream.dedupByContent, OutputMode.Append())
    val streamed = spark.table("dedup_sink")
    val expectedFps = spark.read.parquet(dupDir)
      .select(graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count()
    assert(streamed.count() === expectedFps)
    assert(streamed.select("fp").distinct().count() === expectedFps)
  }

  test("windowed source quality monitor: streaming == batch") {
    runStream(docsDir, "quality_sink", CorpusStream.sourceQualityWindows,
      OutputMode.Complete())
    val streamed = spark.table("quality_sink")
    val batch = CorpusStream.sourceQualityWindows(spark.read.parquet(docsDir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("mgCandidates: cross-batch state keeps true heavy hitter, capacity bounds counters") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val watched = Files.createTempDirectory("graft_mg_")
    def stage(name: String, modMinutes: Int, toks: Seq[String]): Unit = {
      val tmp = Files.createTempDirectory("graft_mg_stage_")
      toks.map(t => (0L, t)).toDS().coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = Paths.get(watched.toString, name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + modMinutes * 60000L))
    }
    // "hot" is heavy ACROSS batches but never dominant within one —
    // only carried state can keep it; singletons churn through the
    // capacity-2 sketch
    stage("b1.parquet", 1, Seq("hot", "hot", "x1", "x2", "hot"))
    stage("b2.parquet", 2, Seq("hot", "y1", "hot", "y2", "hot"))
    val q = CorpusStream.mgCandidates(
        spark.readStream
          .schema("_1 LONG, _2 STRING")
          .option("maxFilesPerTrigger", "1").parquet(watched.toString)
          .as[(Long, String)],
        capacity = 2)
      .writeStream.format("memory").queryName("mg_sink")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val updates = spark.table("mg_sink")
      .as[CorpusStream.MgUpdate].collect().sortBy(_.seen)
    // one bucket, one update per batch; state accumulated across both
    assert(updates.map(_.seen).toSeq === Seq(5L, 10L))
    val last = updates.last
    assert(last.tokens.contains("hot")) // freq 6 > 10/2: guaranteed
    assert(last.tokens.length <= 2) // capacity bound held
  }

  test("running token budget accumulates across micro-batches and flags the crossing") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)

    val watched = Files.createTempDirectory("graft_budget_")
    def stage(name: String, modMinutes: Int, docs: Seq[CorpusStream.Doc]): Unit = {
      val tmp = Files.createTempDirectory("graft_budget_stage_")
      docs.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = Paths.get(watched.toString, name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + modMinutes * 60000L))
    }
    // batch 1: web takes 6 tokens (under the 8-token budget, all
    // accepted), books takes 4
    stage("b1.parquet", 1, Seq(
      CorpusStream.Doc(1L, ts(0), "a b c", "web"),
      CorpusStream.Doc(2L, ts(1), "d e f", "web"),
      CorpusStream.Doc(3L, ts(2), "g h i j", "books")))
    // batch 2: web crosses the budget on doc 5 (6+2=8 accepted, +3
    // rejected); books stays under
    stage("b2.parquet", 2, Seq(
      CorpusStream.Doc(5L, ts(3), "k l", "web"),
      CorpusStream.Doc(6L, ts(4), "m n o", "web"),
      CorpusStream.Doc(7L, ts(5), "p q", "books")))

    val q = CorpusStream.runningTokenBudget(
        spark.readStream.schema(CorpusStream.schema)
          .option("maxFilesPerTrigger", "1").parquet(watched.toString)
          .select("doc_id", "ts", "text", "source").as[CorpusStream.Doc],
        budget = 8L)
      .writeStream.format("memory").queryName("budget_sink")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // update mode appends one row per (source, batch); the LAST row
    // per source carries the final running totals
    val finals = spark.table("budget_sink")
      .orderBy(col("source"), col("n_docs"))
      .as[CorpusStream.BudgetUpdate].collect()
      .groupBy(_.source).map { case (s, rows) => s -> rows.last }
    val web = finals("web")
    assert(web.n_docs === 4L && web.total_tokens === 11L)
    assert(web.accepted_docs === 3L && web.over_budget)
    val books = finals("books")
    assert(books.n_docs === 2L && books.total_tokens === 6L)
    assert(books.accepted_docs === 2L && !books.over_budget)
    // and the intermediate (batch-1) update must show web still under
    val webFirst = spark.table("budget_sink")
      .as[CorpusStream.BudgetUpdate].collect()
      .filter(_.source == "web").minBy(_.n_docs)
    assert(webFirst.n_docs === 2L && !webFirst.over_budget)
  }
}
