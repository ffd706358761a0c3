package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch equivalence (SURVEY §2.9): the same declarative
  * transform must produce identical results run as a Structured
  * Streaming query (Trigger.AvailableNow over a file source) and as a
  * plain batch query over the same files. Sessionization is asserted
  * against a hand-computed session list on crafted events.
  */
class EventStreamSpec extends SparkSpec {

  import spark.implicits._

  /** The testdata events table carries nanos timestamps; stage a
    * µs-typed copy that both the stream source and batch read share. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft_events_").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling window counts: streaming == batch") {
    EventStream.runAvailableNow(spark, eventsDir, "tumbling_sink",
      EventStream.tumblingCounts)
    val streamed = spark.table("tumbling_sink")
    val batch = EventStream.tumblingCounts(spark.read.parquet(eventsDir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sliding window activity: streaming == batch, 4x overlap") {
    EventStream.runAvailableNow(spark, eventsDir, "sliding_sink",
      EventStream.slidingUserActivity)
    val streamed = spark.table("sliding_sink")
    val batch = EventStream.slidingUserActivity(spark.read.parquet(eventsDir))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // every event lands in exactly 4 overlapping 1h/15min windows
    val nEvents = spark.read.parquet(eventsDir).count()
    val totalWindowed = streamed.agg(sum("n_events")).first().getLong(0)
    assert(totalWindowed === nEvents * 4)
  }

  test("streaming dedup drops replayed event ids; enrichment joins a static dim") {
    // duplicate every 5th event id, as an at-least-once source would
    val base = spark.read.parquet(eventsDir)
    val dupDir = Files.createTempDirectory("graft_dup_").toString
    base.unionByName(base.where(col("event_id") % 5 === 0))
      .write.mode("overwrite").parquet(dupDir)

    val userDim = spark.range(0, 100)
      .select(col("id").as("user_id"),
        concat(lit("tier_"), (col("id") % 3).cast("string")).as("tier"))
    // plain count: the upstream dedup guarantees distinct event ids
    // (streaming forbids distinct aggregation anyway)
    EventStream.runAvailableNow(spark, dupDir, "dedup_sink",
      df => EventStream.enrich(EventStream.dedupEvents(df), userDim, "user_id")
        .groupBy("tier").agg(count(lit(1)).as("n")),
      mode = OutputMode.Complete())
    val streamed = spark.table("dedup_sink")
    val expected = EventStream.enrich(base, userDim, "user_id")
      .groupBy("tier").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
    // dedup must restore the original distinct-event count
    assert(streamed.agg(sum("n")).first().getLong(0) === base.count())
  }

  test("stream-stream attribution join == batch interval join") {
    val base = spark.read.parquet(eventsDir)
    val viewsDir = Files.createTempDirectory("graft_views_").toString
    val clicksDir = Files.createTempDirectory("graft_clicks_").toString
    base.where(col("event_type") === "view").write.mode("overwrite").parquet(viewsDir)
    base.where(col("event_type") === "click").write.mode("overwrite").parquet(clicksDir)

    val q = EventStream.attributionJoin(
        EventStream.readStream(spark, viewsDir),
        EventStream.readStream(spark, clicksDir), windowMinutes = 30)
      .writeStream.format("memory").queryName("attr_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("attr_sink")

    val batch = EventStream.attributionJoin(
      spark.read.parquet(viewsDir), spark.read.parquet(clicksDir),
      windowMinutes = 30)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("left-outer stream-stream join: unmatched clicks emit once the watermark closes them") {
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)
    val viewsDir = Files.createTempDirectory("graft_lov_").toString
    val clicksDir = Files.createTempDirectory("graft_loc_").toString
    // user 1: view then click inside the window → matched
    // user 2: click with no view at all → must STILL emit (null view)
    // user 3: view 90min before the click (outside 30min window) → unmatched
    // user 999: far-future flush on BOTH streams pushes the global
    // watermark so every unmatched verdict is final before shutdown
    Seq(
      EventStream.Event(10, ts(0), 1L, "view", 0.0),
      EventStream.Event(11, ts(5), 3L, "view", 0.0),
      EventStream.Event(12, ts(20000), 999L, "view", 0.0)
    ).toDS().write.mode("overwrite").parquet(viewsDir)
    Seq(
      EventStream.Event(20, ts(10), 1L, "click", 1.5),
      EventStream.Event(21, ts(15), 2L, "click", 2.5),
      EventStream.Event(22, ts(95), 3L, "click", 3.5),
      EventStream.Event(23, ts(20000), 999L, "click", 0.0)
    ).toDS().write.mode("overwrite").parquet(clicksDir)

    val q = EventStream.attributionJoinLeftOuter(
        EventStream.readStream(spark, viewsDir),
        EventStream.readStream(spark, clicksDir), windowMinutes = 30)
      .writeStream.format("memory").queryName("lo_attr_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("lo_attr_sink").where(col("user_id") =!= 999L)
    // matches the batch left join row-for-row
    val batch = EventStream.attributionJoinLeftOuter(
        spark.read.parquet(viewsDir), spark.read.parquet(clicksDir),
        windowMinutes = 30)
      .where(col("user_id") =!= 999L)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // and the unmatched verdicts are present and correct
    val byUser = streamed.orderBy("user_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byUser(1L).contains(10L)) // matched to the in-window view
    assert(byUser(2L).isEmpty)       // no view ever
    assert(byUser(3L).isEmpty)       // view outside the window
  }

  test("sessionize survives a later batch of sub-watermark events (timeout clamp)") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)

    // Stage each micro-batch as ONE parquet file with an increasing
    // mod-time so maxFilesPerTrigger=1 replays them in order.
    val watched = Files.createTempDirectory("graft_sess_wm_")
    def stage(name: String, modMinutes: Int, events: Seq[EventStream.Event]): Unit = {
      val tmp = Files.createTempDirectory("graft_sess_stage_")
      events.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = Paths.get(watched.toString, name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + modMinutes * 60000L))
    }

    // batch 1: user 1's session + a far-future flush event that pushes
    // the watermark to ts(5990) once the batch completes
    stage("b1.parquet", 1, Seq(
      EventStream.Event(1, ts(0), 1L, "click", 1.0),
      EventStream.Event(2, ts(10), 1L, "view", 2.0),
      EventStream.Event(3, ts(6000), 99L, "flush", 0.0)))
    // batch 2: user 2's events are FAR older than watermark − gap; the
    // unclamped timeout (ts(130)) would precede the watermark and kill
    // the query with IllegalArgumentException
    stage("b2.parquet", 2, Seq(
      EventStream.Event(4, ts(100), 2L, "click", 5.0),
      EventStream.Event(5, ts(105), 2L, "view", 6.0)))
    // batch 3: advance the watermark far enough to flush user 2's
    // clamped session (and close user 99's first one)
    stage("b3.parquet", 3, Seq(
      EventStream.Event(6, ts(20000), 99L, "flush", 0.0)))

    val q = EventStream.sessionize(
      spark.readStream.schema(EventStream.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched.toString)
        .as[EventStream.Event], gapMinutes = 30)
      .writeStream.format("memory").queryName("session_wm_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // would throw here without the clamp

    val sessions = spark.table("session_wm_sink")
      .orderBy("user_id", "session_start")
      .as[EventStream.Session].collect()
    // user 1: flushed once the watermark passed its gap horizon
    val s1 = sessions.filter(_.user_id == 1L)
    assert(s1.length === 1)
    assert(s1.head.session_start === ts(0) && s1.head.session_end === ts(10)
      && s1.head.n_events === 2 && s1.head.total_value === 3.0)
    // user 2: the late-arriving session is still counted and correct
    val s2 = sessions.filter(_.user_id == 2L)
    assert(s2.length === 1)
    assert(s2.head.session_start === ts(100) && s2.head.session_end === ts(105)
      && s2.head.n_events === 2 && s2.head.total_value === 11.0)
    // user 99: first flush-session closed by the second flush event
    val s99 = sessions.filter(_.user_id == 99L)
    assert(s99.length === 1 && s99.head.session_start === ts(6000))
  }

  test("sessionization emits gap-closed sessions with correct bounds") {
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000)
    // user 1: two sessions (gap 45min > 30min), then a far-future event
    // that closes the second; user 2: one session closed the same way
    val events = Seq(
      EventStream.Event(1, ts(0), 1L, "click", 1.0),
      EventStream.Event(2, ts(10), 1L, "view", 2.0),
      EventStream.Event(3, ts(55), 1L, "click", 4.0),   // 45min gap → new session
      EventStream.Event(4, ts(60), 1L, "buy", 8.0),
      EventStream.Event(5, ts(6000), 1L, "flush", 0.0), // closes session 2
      EventStream.Event(6, ts(5), 2L, "view", 3.0),
      EventStream.Event(7, ts(6000), 2L, "flush", 0.0))
    val dir = Files.createTempDirectory("graft_sess_").toString
    events.toDS().write.mode("overwrite").parquet(dir)

    val q = EventStream.sessionize(
      spark.readStream.schema(EventStream.schema).parquet(dir)
        .as[EventStream.Event], gapMinutes = 30)
      .writeStream.format("memory").queryName("session_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sessions = spark.table("session_sink")
      .orderBy("user_id", "session_start")
      .as[EventStream.Session].collect()
    assert(sessions.length === 3)
    val Array(s1a, s1b, s2) = sessions
    assert(s1a.user_id === 1 && s1a.n_events === 2 && s1a.total_value === 3.0)
    assert(s1a.session_start === ts(0) && s1a.session_end === ts(10))
    assert(s1b.n_events === 2 && s1b.total_value === 12.0)
    assert(s1b.session_start === ts(55) && s1b.session_end === ts(60))
    assert(s2.user_id === 2 && s2.n_events === 1 && s2.total_value === 3.0)
  }

  test("streaming ewmaDaily: state continues across micro-batches, equals batch") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    def dts(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-05-$day%02d 10:00:${i % 60}%02d")
    val watched = Files.createTempDirectory("graft_ewma_wm_")
    def stage(name: String, mod: Int, events: Seq[EventStream.Event]): Unit = {
      val tmp = Files.createTempDirectory("graft_ewma_stage_")
      events.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = Paths.get(watched.toString, name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1700000000000L + mod * 60000L))
    }
    var id = 0L
    def evs(day: Int, n: Int) = (0 until n).map { i =>
      id += 1; EventStream.Event(id, dts(day, i), 1L, "a", 0.0)
    }
    // batch 1: days 1 and 3 (day 2 densifies inside the batch);
    // batch 2: day 5 only — day 4 is the CROSS-BATCH gap the carried
    // state must densify
    val b1 = evs(1, 3) ++ evs(3, 2)
    val b2 = evs(5, 4)
    stage("b1.parquet", 1, b1)
    stage("b2.parquet", 2, b2)
    val q = EventStream.ewmaDaily(
        spark.readStream.schema(EventStream.schema)
          .option("maxFilesPerTrigger", "1").parquet(watched.toString)
          .as[EventStream.Event], alphaNum = 3, alphaDen = 10)
      .writeStream.format("memory").queryName("ewma_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("ewma_sink")
      .select(col("event_type"), col("day").cast("string"),
        col("n_events"), col("ewma"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = graft.ops.Analytics.ewmaDaily(
        (b1 ++ b2).toDS().toDF().withColumnRenamed("event_type", "et"),
        "et", "ts", alphaNum = 3, alphaDen = 10)
      .select(col("et"), col("day").cast("string"), col("n_events"),
        col("ewma"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed === batch, s"streamed $streamed vs batch $batch")
    assert(streamed.size === 5) // days 1-5, gaps densified
  }
}
