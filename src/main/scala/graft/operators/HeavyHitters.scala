package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact top-k frequent tokens at corpus scale via a bounded-memory
  * candidate pass — the two-pass heavy-hitters scheme (Misra & Gries,
  * "Finding repeated elements", Sci. Comput. Program. 1982; the
  * streaming summary in Cormode & Hadjieleftheriou, VLDB 2008).
  *
  * A single `groupBy(token).count()` is already map-side combined, but
  * its shuffle carries one row per DISTINCT token per map partition —
  * at 100 TB a web-scale vocabulary (hundreds of millions of types,
  * most singletons) makes that exchange vocabulary-sized. The MG pass
  * caps per-partition state at `capacity` counters and ships at most
  * `capacity` candidate tokens per partition, so the heavy exchange is
  * O(partitions·capacity) regardless of vocabulary; only the tiny
  * candidate-restricted rescore shuffles exact counts.
  *
  * Exactness, not approximation: pigeonhole guarantees every token
  * with global frequency > n/capacity survives MG in at least one
  * partition (if it died everywhere, summing the per-partition bounds
  * gives frequency ≤ n/capacity). The exact rescore then ranks the
  * candidate superset, and the result is provably the true top-k iff
  * the k-th rescored count exceeds n/capacity — which the operator
  * CHECKS, falling back to the plain full aggregation when the bound
  * fails (a long-tail corpus where even the k-th hitter is below
  * n/capacity; correctness never depends on the sketch).
  */
object HeavyHitters {

  /** Exact top-k tokens of `textCol` as (rank, token, n), ranked by
    * count desc then token asc (total order ⇒ deterministic under
    * ties at the cut). `capacity` is the per-partition counter bound;
    * raising it widens the guarantee (`k`-th count > n/capacity) and
    * the candidate exchange linearly. */
  def topKTokens(docs: DataFrame, textCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity > k, s"need 0 < k < capacity, got k=$k cap=$capacity")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs.select(explode(tokens(col(textCol))).as("token"))

    // the completeness bound needs the total token count n; the MG
    // pass walks every token anyway, so it tallies n as a side effect
    // (one accumulator add per partition) instead of a dedicated
    // third corpus scan. Task retries/speculation can only OVERcount
    // the accumulator, which only makes the bound HARDER to prove —
    // an overcount never admits a wrong top-k, it at worst forces the
    // exact fallback.
    val tokenTally = spark.sparkContext.longAccumulator("graft.hh.tokens")

    // MG sketch per partition: capacity counters, decrement-on-full.
    // The decrement sweep is O(capacity) but fires at most n_p/capacity
    // times (each sweep retires ≥ capacity count mass), so the pass
    // stays O(n_p) per partition with O(capacity) heap.
    val candidates = toks.as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, Long](capacity * 2)
      var seen = 0L
      while (it.hasNext) {
        val t = it.next()
        seen += 1L
        val cur = m.get(t)
        if (cur != 0L) m.put(t, cur + 1L)
        else if (m.size < capacity) m.put(t, 1L)
        else {
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      tokenTally.add(seen)
      import scala.jdk.CollectionConverters._
      m.keySet().iterator().asScala
    }.toDF("token").distinct()

    def ranked(counts: DataFrame): DataFrame = counts
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))).cast("long").as("rank"),
        col("token"), col("n"))

    val candCounts = toks.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("n"))
    // this collect executes the MG pass (filling tokenTally) and the
    // rescore in one job
    val top = ranked(candCounts).collect()

    // completeness bound: strictly above n/capacity ⇒ no non-candidate
    // token can reach the k-th slot. Fewer than k candidates (incl.
    // the empty corpus) skips the bound entirely and falls back.
    val proven = top.length == k &&
      top.last.getLong(2) * capacity.toLong > tokenTally.value
    if (proven) {
      spark.createDataFrame(spark.sparkContext.parallelize(top.toSeq, 1),
        top.head.schema)
    } else {
      // bound failed (k-th hitter at/below n/capacity): the sketch may
      // have missed a qualifying token — rescore the full vocabulary
      ranked(toks.groupBy("token").agg(count(lit(1)).as("n")))
    }
  }
}
