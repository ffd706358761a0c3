package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, ordered from
  * exact to approximate. All are shuffle-on-key designs: nothing is
  * collected to the driver, so each scales to arbitrary corpus sizes
  * by adding partitions.
  */
object Dedup {

  /** Exact dedup: group on a content key (hash of the payload), keep
    * the row with the minimum id. One shuffle on the 128-bit content
    * hash — at 100 TB this is the cheapest possible exact pass, and
    * the hash-key shuffle is uniform (no skew) by construction.
    */
  def exactByKey(df: DataFrame, contentKey: Column, idCol: String): DataFrame = {
    val survivors = df
      .groupBy(contentKey.as("__ck"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__ck")
    df.join(survivors, Seq(idCol), "left_semi")
  }

  /** MinHash signature column: array of `numHashes` minima over the
    * document's shingle set. Hash family: md5Long(seed || "|" || shingle)
    * — seeded by index, 60-bit, and (unlike xxhash64 or murmur)
    * reproducible in any engine with md5, so the DuckDB oracle can
    * verify the full LSH pipeline value-for-value. Returns null
    * signature for shingle-less docs. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles,
        s => md5Long(concat(i.cast("string"), lit("|"), s)))))

  /** MinHash + LSH near-duplicate candidate pairs, verified with exact
    * Jaccard. Standard banding: `numHashes` minhashes split into
    * `bands` bands; documents sharing any band bucket become a
    * candidate pair; candidates are then verified against the exact
    * shingle sets and filtered at `threshold`.
    *
    * Scale analysis: shingling+signatures are one map pass; the only
    * shuffles are (band, bandHash) bucket grouping and the candidate
    * self-join — both keyed on uniform hashes. The O(n²) blowup is
    * confined to within-bucket pairs, which banding keeps tiny.
    *
    * @return (doc_id_1, doc_id_2, jaccard) with id1 < id2, jaccard ≥ threshold
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    val shingled = docs
      .select(col(idCol), wordShingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)

    val sigs = shingled
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // explode into (band index, the band's signature slice as a string
    // bucket key — engine-portable, unlike murmur hash())
    val buckets = sigs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)).cast("array<string>")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_id_1"), col(s"b.$idCol").as("doc_id_2"))
      .distinct()

    verifyJaccard(candidates, shingled, idCol, threshold)
  }

  /** Exact Jaccard over candidate pairs: join the shingle arrays back
    * and compare via array_intersect. Candidate count is small by the
    * time this runs, so per-pair set intersection is cheap. */
  private def verifyJaccard(pairs: DataFrame, shingled: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    val s1 = shingled.select(col(idCol).as("doc_id_1"), col("sh").as("sh1"))
    val s2 = shingled.select(col(idCol).as("doc_id_2"), col("sh").as("sh2"))
    pairs.join(s1, "doc_id_1").join(s2, "doc_id_2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("doc_id_1", "doc_id_2", "jaccard")
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle
    * index: candidate pairs share at least one shingle whose document
    * frequency is ≤ `dfCap`, then exact Jaccard verifies. The df cap
    * is the scale guard — "stopword shingles" appearing in thousands
    * of docs generate quadratic candidate blowup and carry no dedup
    * signal, so they are excluded from candidate generation (but NOT
    * from the Jaccard itself). Shuffles: shingle explode (keyed on
    * shingle, capped fan-out) + candidate distinct + verify join.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5, dfCap: Long = 100): DataFrame = {
    val shingled = docs
      .select(col(idCol), wordShingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
    val inv = shingled.select(col(idCol), explode(col("sh")).as("s"))
    val rare = inv.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
    val postings = inv.join(rare.select("s"), Seq("s"), "left_semi")
    val candidates = postings.as("a")
      .join(postings.as("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_id_1"), col(s"b.$idCol").as("doc_id_2"))
      .distinct()
    verifyJaccard(candidates, shingled, idCol, threshold)
  }

  /** SimHash signature: `bits`-bit fingerprint where bit j is the
    * majority vote of token-hash bit j across all tokens (with
    * multiplicity). Implemented as `bits` conditional aggregates in a
    * single groupBy pass — no row blowup, stays in codegen.
    * Token hash is [[md5Long]] so a SQL oracle can reproduce it.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 48): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .withColumn("hv", md5Long(col("w")))
    val bitSums = (0 until bits).map { j =>
      sum(when(shiftright(col("hv"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** Exact-simhash duplicate pairs (hamming distance 0). For hamming
    * ≤ k, band the signature into k+1 chunks and bucket-join on each —
    * same LSH shape as minhash, omitted until a consumer needs it. */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 48): DataFrame = {
    val sigs = simhash(docs, idCol, textCol, bits)
    sigs.as("a").join(sigs.as("b"),
        col("a.simhash") === col("b.simhash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_id_1"), col(s"b.$idCol").as("doc_id_2"),
        col("a.simhash").as("simhash"))
  }
}
