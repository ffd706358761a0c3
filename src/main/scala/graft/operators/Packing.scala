package graft.operators

import graft.functions.TextFunctions.md5Long
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-budget sequence packing: group documents into packs whose
  * token totals stay within `budget` — the step between corpus
  * filtering and training that turns ragged documents into dense,
  * fixed-budget training sequences (minimizing pad waste).
  *
  * Packing is inherently a stateful fold (each doc's pack depends on
  * the running total), so this is the sanctioned `mapPartitions` case:
  * genuine per-partition imperative logic Spark's declarative surface
  * cannot express. The layout keeps it distributed and deterministic:
  *
  *  - docs are range-repartitioned on (md5-of-id, id) — a distributed
  *    sort, every partition a contiguous hash range, so the greedy
  *    fill order is data-determined, not shuffle-fetch-determined;
  *  - each partition packs greedily next-fit (append while it fits,
  *    else open a new pack; oversized docs become singleton packs);
  *  - pack ids are (partitionId << 40) | localSeq — globally unique
  *    with no driver-side coordination, same shape as the surrogate-
  *    key offset trick.
  *
  * Packs never span partitions, so the only cross-partition waste is
  * ≤ one underfilled pack per partition — negligible against
  * partition-sized corpora (and the price of having no sequential
  * bottleneck; an exact global first-fit is inherently serial).
  * Output: input columns + (pack_id, pack_fill — the running token
  * fill after the row). Reproducibility caveat, stated honestly:
  * `repartitionByRange` draws its boundary sample with a per-run
  * seed, so on inputs larger than the sampler fully covers, pack
  * MEMBERSHIP can shift between runs even though every pack still
  * respects the budget — pin boundaries externally (pre-bucketed
  * input) where bit-identical packs across runs are required.
  */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val ordered = docs
      .repartitionByRange(md5Long(col(idCol).cast("string")), col(idCol))
      .sortWithinPartitions(md5Long(col(idCol).cast("string")), col(idCol))
    val tokIdx = ordered.schema.fieldIndex(tokenCol)
    val packed = ordered.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var packSeq = -1L
      var fill = 0L
      rows.map { row =>
        val t = row.get(tokIdx) match {
          case n: java.lang.Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"token count must be numeric, got $other")
        }
        if (packSeq < 0L || fill + t > budget) { packSeq += 1; fill = t }
        else fill += t
        Row.fromSeq(row.toSeq :+ ((pid.toLong << 40) | packSeq) :+ fill)
      }
    }
    docs.sparkSession.createDataFrame(packed,
      StructType(ordered.schema.fields
        :+ StructField("pack_id", LongType, nullable = false)
        :+ StructField("pack_fill", LongType, nullable = false)))
  }
}
