package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage (JASA 1969) — the
  * principled ER scorer on top of this library's blocking machinery
  * (`Dedup.editDistancePairs` blocks fuzzily; this weighs EVIDENCE):
  * each compared field contributes log(m/u) when it agrees and
  * log((1−m)/(1−u)) when it disagrees, where m = P(agree | match) and
  * u = P(agree | non-match); the summed weight is the match score and
  * a threshold is the decision.
  *
  * Determinism: the field weights are computed ON THE DRIVER and
  * enter the plan as integer NANO-unit literals — no transcendental
  * in either engine's plan at all (stronger than the 9dp-ln rule:
  * there is nothing to round at runtime). Scores are exact long sums
  * of ≤ |fields| literals. A null on either side contributes ZERO
  * (absence of evidence, the standard treatment), so nulls never
  * fabricate agreement or disagreement.
  *
  * Scale shape: one equi join on the caller's BLOCKING key (linkage
  * without blocking is the all-pairs trap — the caller picks the key
  * exactly as `editDistancePairs` documents), then a codegen'd map
  * pass. At 100 TB the block-key join is the only shuffle; skewed
  * blocks are the `Stats.skewProfile` → `Relational.saltedJoin`
  * problem, not a new one.
  */
object Linkage {

  /** A compared field: `name` labels the output agreement flag;
    * `m`/`u` are the conditional agreement probabilities (m > u for
    * any informative field). */
  final case class Field(name: String, leftCol: String, rightCol: String,
      m: Double, u: Double) {
    require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0 && m > u,
      s"need 0 < u < m < 1 for field $name, got m=$m u=$u")
    /** Agreement weight ln(m/u), driver-computed nano-unit literal. */
    def agreeNano: Long = Linkage.nano(math.log(m / u))
    /** Disagreement weight ln((1−m)/(1−u)), nano-unit literal. */
    def disagreeNano: Long = Linkage.nano(math.log((1.0 - m) / (1.0 - u)))
  }

  private[ops] def nano(x: Double): Long =
    BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Block-join `left` × `right` on the given blocking keys, score
    * every candidate pair, decide at `thresholdNano`. Returns
    * (left_id, right_id, agree_<field>... , score_n, is_match). */
  def linkBlocked(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockLeft: Column, blockRight: Column,
      fields: Seq[Field], thresholdNano: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one compared field")
    val l = left.select(
      (col(leftId).as("left_id") +: blockLeft.as("__bk") +:
        fields.map(f => col(f.leftCol).as(s"__l_${f.name}"))): _*)
    val r = right.select(
      (col(rightId).as("right_id") +: blockRight.as("__bk") +:
        fields.map(f => col(f.rightCol).as(s"__r_${f.name}"))): _*)
    val pairs = l.join(r, Seq("__bk"))
    val agreeCols = fields.map { f =>
      val lc = col(s"__l_${f.name}"); val rc = col(s"__r_${f.name}")
      when(lc.isNull || rc.isNull, lit(null)).otherwise(lc === rc)
        .as(s"agree_${f.name}")
    }
    val score = fields.map { f =>
      val a = col(s"agree_${f.name}")
      when(a.isNull, lit(0L))
        .when(a, lit(f.agreeNano)).otherwise(lit(f.disagreeNano))
    }.reduce(_ + _)
    pairs.select(col("left_id") +: col("right_id") +: agreeCols: _*)
      .withColumn("score_n", score)
      .withColumn("is_match", col("score_n") >= thresholdNano)
  }
}
