package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: every (left, right) pair whose half-open
  * time windows intersect — `lStart < rEnd AND rStart < lEnd`. The
  * temporal analog of a spatial join (meeting-room conflicts,
  * concurrent-session attribution, overlapping on-call shifts);
  * end-exclusive so back-to-back intervals do NOT match, the same tie
  * contract as [[graft.ops.Analytics.concurrencyDaily]].
  *
  * Spark's native spelling is a theta join — a broadcast-nested-loop
  * (or worse, a cartesian) over |L|·|R| candidate pairs, which is dead
  * at any scale. This is the blocked spelling: each interval explodes
  * to the fixed-width buckets it covers (fanout = ceil(span/width),
  * bounded per row), pairs meet on a bucket EQUI join, and the true
  * overlap predicate filters inside the join. A pair sharing k buckets
  * would surface k times; instead of a corpus-scale DISTINCT, each
  * pair is emitted only from the one bucket containing
  * `greatest(lStart, rStart)` — the first bucket where both are live —
  * so the output is exactly the theta-join result with zero dedup
  * shuffle (the standard spatial-join reporting trick). The proof
  * obligation is only that bucketing is monotone and covers
  * `[bucket(s), bucket(e−1µs)]` contiguously: the later-starting
  * member of a pair reports in its own first bucket, which the
  * earlier one covers because `greatest(starts) < its end`.
  *
  * Cost model: one shuffle of |L|+|R| rows × their bucket fanout; join
  * work is per-bucket-local, so `widthUs` is the skew dial — width ≈
  * typical interval span keeps fanout O(1) while a bucket holds only
  * intervals genuinely near it in time. All bucket arithmetic stays in
  * exact longs (pmod-floor then `div` — never a double detour), so
  * pre-1970 negative micros bucket correctly too. Degenerate
  * (`start >= end`) and null-bounded intervals cover nothing and are
  * dropped, matching the empty half-open set.
  *
  * Returns all left columns plus all right columns; the two schemas
  * must be disjoint (alias before calling — required, not silently
  * renamed).
  */
object IntervalJoin {

  /** `lStart`/`lEnd`/`rStart`/`rEnd` are timestamp columns over `left`
    * / `right`; `widthUs` is the bucket width in microseconds. */
  def overlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      widthUs: Long): DataFrame = {
    require(widthUs > 0, s"bucket width must be positive, got $widthUs")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"left/right columns collide: ${collisions.mkString(", ")} — alias them first")
    // the internal working columns below would silently OVERWRITE (and
    // then re-select) a same-named input column — reject those too
    val reserved = Set("__b", "__ls", "__le", "__rs", "__re")
    val shadowed = (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(shadowed.isEmpty,
      s"input columns shadow reserved internal names: ${shadowed.mkString(", ")} — rename them first")

    // exact long floor-division as a SQL fragment: pmod floors the
    // numerator to a multiple of the width, so `div`'s
    // truncate-toward-zero never gets a chance to differ from floor
    def bucketOf(x: String): String =
      s"((($x) - pmod(($x), ${widthUs}L)) div ${widthUs}L)"
    def buckets(df: DataFrame, s: Column, e: Column, sTag: String,
        eTag: String): DataFrame =
      df.withColumn(sTag, unix_micros(s)).withColumn(eTag, unix_micros(e))
        .where(col(sTag).isNotNull && col(eTag).isNotNull &&
          col(sTag) < col(eTag))
        // end-exclusive: the last covered bucket holds e − 1µs
        .withColumn("__b", expr(
          s"explode(sequence(${bucketOf(sTag)}, ${bucketOf(s"$eTag - 1")}))"))

    val l = buckets(left, lStart, lEnd, "__ls", "__le")
    val r = buckets(right, rStart, rEnd, "__rs", "__re")
    l.join(r, Seq("__b"))
      .where(col("__ls") < col("__re") && col("__rs") < col("__le") &&
        col("__b") === expr(bucketOf("greatest(__ls, __rs)")))
      .select(left.columns.map(col) ++ right.columns.map(col): _*)
  }
}
