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
  * cannot express. The layout keeps it distributed AND bit-stable:
  *
  *  - every doc is assigned a PINNED bucket, `md5Long(id) mod
  *    nBuckets` — a fixed literal partition of md5 space, not a
  *    sampled `repartitionByRange` boundary, so bucket membership is a
  *    pure function of the id on every run, any cluster size, and any
  *    input partitioning (and a SQL oracle can replay it);
  *  - buckets shuffle to partitions by bucket id and sort by
  *    (bucket, md5, id) — packs never span buckets, and the greedy
  *    fold resets at each bucket boundary, so a partition holding
  *    several buckets packs each independently;
  *  - each bucket packs greedily next-fit in (md5, id) order (append
  *    while it fits, else open a new pack; oversized docs become
  *    singleton packs);
  *  - pack ids are (bucket << 40) | seqInBucket — globally unique with
  *    no driver-side coordination, and stable because both halves are.
  *
  * Packs never span buckets, so the only cross-bucket waste is ≤ one
  * underfilled pack per bucket — negligible against bucket-sized
  * corpora (and the price of having no sequential bottleneck; an exact
  * global first-fit is inherently serial). Size `nBuckets` ≈ the
  * target parallelism; it must stay FIXED across runs that must agree
  * bit-for-bit. Output: input columns + (pack_id, pack_fill — the
  * running token fill after the row).
  */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, nBuckets: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets must be in [1, 2^20], got $nBuckets")
    // internal working columns must not silently shadow (and then
    // swallow) caller columns, and the appended output columns must
    // not duplicate existing names (an AMBIGUOUS_REFERENCE trap when
    // re-packing already-packed data)
    Seq("__pack_h", "__pack_bucket", "pack_id", "pack_fill").foreach(c =>
      require(!docs.columns.contains(c), s"input already has a column $c"))
    val ordered = docs
      .withColumn("__pack_h", md5Long(col(idCol).cast("string")))
      .withColumn("__pack_bucket", pmod(col("__pack_h"), lit(nBuckets.toLong)))
      .repartition(col("__pack_bucket"))
      .sortWithinPartitions(col("__pack_bucket"), col("__pack_h"), col(idCol))
    val tokIdx = ordered.schema.fieldIndex(tokenCol)
    val bIdx = ordered.schema.fieldIndex("__pack_bucket")
    val packed = ordered.rdd.mapPartitions { rows =>
      var bucket = -1L
      var packSeq = -1L
      var fill = 0L
      rows.map { row =>
        val b = row.getLong(bIdx)
        if (b != bucket) { bucket = b; packSeq = -1L; fill = 0L }
        val t = row.get(tokIdx) match {
          case n: java.lang.Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"token count must be numeric, got $other")
        }
        if (packSeq < 0L || fill + t > budget) { packSeq += 1; fill = t }
        else fill += t
        Row.fromSeq(row.toSeq :+ ((bucket << 40) | packSeq) :+ fill)
      }
    }
    docs.sparkSession.createDataFrame(packed,
        StructType(ordered.schema.fields
          :+ StructField("pack_id", LongType, nullable = false)
          :+ StructField("pack_fill", LongType, nullable = false)))
      .drop("__pack_h", "__pack_bucket")
  }

  /** Sliding-window document chunking — packing's complement: where
    * [[packSequences]] merges SHORT documents up to a budget, this
    * splits LONG documents into `maxTokens`-token windows that stride
    * by `maxTokens - overlap` (consecutive chunks share `overlap`
    * tokens, preserving context across the cut — the standard
    * pretraining treatment of over-long documents, cf. the reference's
    * chunked-insert batching of over-long rows at
    * etl_staging_loader.py:1261, re-expressed over token windows).
    *
    * Whitespace tokens ([[graft.functions.TextFunctions.tokens]] —
    * the library-wide convention, so chunk token counts agree with
    * [[packSequences]] budgets downstream). A document of `n` tokens
    * yields `1 + ceil((n - maxTokens) / step)` chunks (one when
    * `n <= maxTokens`, including empty docs — chunking is total, no
    * rows vanish; NULL text is treated as empty, not dropped); the
    * last chunk may be shorter, never empty, and every token appears
    * in at least one chunk.
    *
    * Execution: one map pass — `sequence` + `explode` + `slice`, all
    * codegen'd builtins, ZERO shuffles at any corpus size. Fan-out is
    * bounded by n/step per document, so partition row counts grow by
    * that factor; chunk counts are a pure function of each row, so
    * the output is deterministic under any partitioning. Appends
    * (chunk_id, chunk_text, n_tokens); callers typically re-derive
    * ids as (id, chunk_id) downstream. */
  def chunkDocuments(docs: DataFrame, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    Seq("chunk_id", "chunk_text", "n_tokens", "__toks", "__n").foreach(c =>
      require(!docs.columns.contains(c), s"input already has a column $c"))
    val step = (maxTokens - overlap).toLong
    // coalesce keeps chunking TOTAL: tokens(NULL) is NULL, whose
    // explode would silently delete the row
    val toks = graft.functions.TextFunctions.tokens(
      coalesce(col(textCol), lit("")))
    val nChunks = when(col("__n") <= maxTokens, lit(1L))
      .otherwise(ceil((col("__n") - lit(maxTokens)).cast("double") / step)
        .cast("long") + 1L)
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1L)))
      .withColumn("n_tokens",
        least(col("chunk_id") * step + maxTokens, col("__n"))
          - col("chunk_id") * step)
      .withColumn("chunk_text", concat_ws(" ",
        slice(col("__toks"), (col("chunk_id") * step + 1L).cast("int"),
          col("n_tokens").cast("int"))))
      .drop("__toks", "__n")
  }

  /** Deterministic shard assignment + within-shard order — the final
    * write layout of a training corpus: `numShards` output shards,
    * each internally shuffled (training-order randomization), with
    * both the shard AND the position a pure function of the row's key:
    * `shard = md5Long(key) mod numShards`, `shard_pos` = 1-based rank
    * of (salted md5, key) within the shard. The salt decorrelates the
    * position draw from the shard draw (they come from the same md5
    * otherwise: within a shard, raw md5Long is congruent mod
    * numShards, which is fine for RANK but leaves position correlated
    * with any other consumer of the same hash).
    *
    * A seeded global `orderBy(rand)` gives none of this: the
    * assignment would depend on partitioning, be unverifiable
    * externally, and change when the corpus grows. Here a grown corpus
    * only INSERTS rows into shard orders — existing relative order is
    * stable (the basis for reshard-free incremental appends).
    *
    * Both guarantees hold GIVEN UNIQUE NON-NULL KEYS (the same
    * contract [[graft.operators.Sampling.stratifiedSample]] pins):
    * duplicate keys draw identical (salt, key) sort pairs, leaving
    * their relative ranks to partitioning luck, and a null key hashes
    * to a null shard. Pass the corpus's document id, not a derived
    * attribute.
    *
    * Execution: the rank is row_number over a shard-partitioned
    * window — exactly the one shuffle (by shard) the physical write
    * needs anyway, so ordering is free at write time. Shard sizes
    * concentrate near n/numShards (md5 uniformity); no shard can
    * skew, because the key space is pre-hashed. */
  def shardAssign(docs: DataFrame, key: org.apache.spark.sql.Column,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    Seq("shard", "shard_pos").foreach(c =>
      require(!docs.columns.contains(c), s"input already has a column $c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(md5Long(concat(key.cast("string"), lit("|pos"))), key)
    docs
      .withColumn("shard", pmod(md5Long(key.cast("string")), lit(numShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }
}
