package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling at corpus scale.
  *
  * [[exactQuantiles]] is the oracle-checkable reference (continuous-
  * interpolation percentiles, one grouped aggregate). At 100 TB exact
  * percentiles hold per-group sorted buffers, so [[sketchProfile]] is
  * the scale path: HyperLogLog++ distinct counts and mergeable
  * t-digest-style percentile sketches — constant memory per group,
  * one pass, no sort — with error bounds the spec pins against the
  * exact answers. This is the profile a data pipeline runs on every
  * ingest batch (row counts, key cardinality, value distribution)
  * where exact computation would cost more than the load itself.
  */
object Stats {

  /** Exact continuous-interpolation percentiles of `valueCol` per
    * group — matches SQL `quantile_cont` semantics. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      ps: Seq[Double]): DataFrame = {
    // decimal-exact labels: (0.29*100).toInt would truncate to p28,
    // and 0.99 vs 0.999 would collide at p99 — label from the decimal
    // form (p99, p99_9) and reject duplicates outright
    def label(p: Double): String =
      "p" + BigDecimal(p.toString).*(100).bigDecimal.stripTrailingZeros
        .toPlainString.replace(".", "_").replace("-", "m")
    val labels = ps.map(label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels: ${labels.mkString(", ")}")
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        percentile(valueCol, typedLit(ps)).as("qs"))
      .select((groupCols :+ col("n")) ++
        ps.zipWithIndex.map { case (p, i) =>
          round(element_at(col("qs"), i + 1), 4).as(label(p))
        }: _*)
  }

  /** Fixed-width histogram: `nBins` equal bins over [lo, hi), values
    * at/above `hi` clamp into the last bin, below `lo` into the first
    * — one grouped aggregate over a codegen'd bin expression, the
    * distribution view a profile run pairs with [[exactQuantiles]].
    * Returns (bin, bin_lo, n) with empty bins absent. */
  def histogram(df: DataFrame, valueCol: Column, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins>0 and hi>lo, got $nBins, [$lo,$hi)")
    val width = (hi - lo) / nBins
    val bin = greatest(lit(0), least(lit(nBins - 1),
      floor((valueCol - lo) / width))).cast("long")
    // NaN is dropped with NULL: Spark's floor(NaN) lands it in bin 0
    // while SQL engines clamp it into the LAST bin — neither is a
    // defensible count, so a non-finite value is simply not a sample
    df.where(valueCol.isNotNull && !isnan(valueCol.cast("double")))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(lit(lo) + col("bin") * width, 6))
      .select("bin", "bin_lo", "n")
  }

  /** Sketch-based profile: approximate distinct keys (HLL++, `rsd`
    * relative error) and approximate percentiles (`acc` accuracy =
    * 1/precision; error ≤ 1/acc of rank) per group. */
  def sketchProfile(df: DataFrame, groupCols: Seq[Column], keyCol: Column,
      valueCol: Column, ps: Seq[Double], rsd: Double = 0.02,
      acc: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(keyCol, rsd).as("approx_distinct"),
        approx_percentile(valueCol, typedLit(ps), lit(acc)).as("approx_qs"))
}
