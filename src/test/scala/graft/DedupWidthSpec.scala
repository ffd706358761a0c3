package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression

/** The minhash/ngram candidate stages must OWN their shuffle width —
  * sized off the post-shrink frame, never inherited from
  * `spark.sql.shuffle.partitions` — and opt-in bucket capping must
  * report what it drops. */
class DedupWidthSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "totally different words in this one here now"),
    (4L, "another unrelated document with its own words")).toDF("doc_id", "text")

  /** Explicit-width repartitions in the plan (spread()'s width-less
    * `repartition(col)` reports no optNumPartitions and is excluded),
    * including ones living inside CACHED subplans — ngram's prefix
    * repartition sits below a persist(), so the logical collect alone
    * would not see it. */
  private def ownedWidths(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}
    def phys(p: SparkPlan): Seq[Int] = p.collect {
      case s: ShuffleExchangeExec if s.shuffleOrigin == REPARTITION_BY_NUM =>
        Seq(s.outputPartitioning.numPartitions)
      case a: AdaptiveSparkPlanExec => phys(a.inputPlan)
    }.flatten
    val logical = df.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression if r.optNumPartitions.isDefined =>
        Seq(r.optNumPartitions.get)
      case m: InMemoryRelation => phys(m.cachedPlan)
    }
    logical.flatten
  }

  test("minhashLsh candidate exchanges run at owned width, not session width") {
    val (res, inter) = Dedup.minhashLshPlan(docs, "doc_id", "text",
      3, 64, 16, 0.5, Long.MaxValue, None, _ => ())
    // 4 docs × 16 bands ≪ 2M rows/partition → every owned exchange is 1
    val widths = ownedWidths(res)
    assert(widths.nonEmpty && widths.forall(_ === 1), s"widths: $widths")
    // and the owned-width plan is value-identical to the public path
    val viaPlan = res.collect().toSet
    inter.foreach(_.unpersist(blocking = false))
    val pub = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
    assert(viaPlan === pub.collect().toSet)
  }

  test("ngramJaccardPairs prefix/self-join exchanges run at owned width") {
    val (res, inter) = Dedup.ngramJaccardPairsPlan(docs, "doc_id", "text",
      3, 0.5, 100, None)
    val widths = ownedWidths(res)
    assert(widths.nonEmpty && widths.forall(_ === 1), s"widths: $widths")
    val viaPlan = res.collect().toSet
    inter.foreach(_.unpersist(blocking = false))
    val pub = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
    assert(viaPlan === pub.collect().toSet)
  }

  test("containmentPairs candidate exchange runs at owned width") {
    val (res, inter) = Dedup.containmentPairsPlan(docs, "doc_id", "text",
      3, 0.5, 100, None)
    val widths = ownedWidths(res)
    assert(widths.nonEmpty && widths.forall(_ === 1), s"widths: $widths")
    val viaPlan = res.collect().toSet
    inter.foreach(_.unpersist(blocking = false))
    val pub = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
    assert(viaPlan === pub.collect().toSet)
  }

  test("bucketCap engagement reports exactly what it dropped") {
    val same = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val mass = Seq((1L, same), (2L, same), (3L, same), (4L, same),
      (5L, "completely different text with other words entirely here"))
      .toDF("doc_id", "text")
    var reported: Option[Dedup.TruncationStats] = None
    val out = Dedup.minhashLsh(mass, "doc_id", "text",
      shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5,
      bucketCap = 3, onTruncation = s => reported = Some(s))
    // 4 identical docs land in the same bucket in all 4 bands: every
    // one of those buckets (n=4) exceeds cap=3 and its rows drop
    assert(reported === Some(Dedup.TruncationStats(4L, 16L)))
    // their ONLY shared buckets were over-cap, so the pairs are lost —
    // the recall trade the scaladoc states
    assert(out.count() === 0)
  }

  test("uncapped runs never invoke the truncation callback") {
    var called = false
    Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
      numHashes = 8, bands = 4, threshold = 0.5,
      onTruncation = _ => called = true).count()
    assert(!called)
  }

  test("capped run with no over-cap bucket reports zero drops") {
    var reported: Option[Dedup.TruncationStats] = None
    Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
      numHashes = 8, bands = 4, threshold = 0.5, bucketCap = 100,
      onTruncation = s => reported = Some(s)).count()
    assert(reported === Some(Dedup.TruncationStats(0L, 0L)))
  }
}
