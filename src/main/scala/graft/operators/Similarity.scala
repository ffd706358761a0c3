package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact, O(Q·N) — the right
  * answer when Q is small and broadcastable). Scale path: IVF-style
  * coarse quantization — assign every vector to its nearest centroid
  * once, then probe only the nProbe cells closest to each query,
  * cutting the scan to nProbe/nCells of the corpus per query.
  */
object Similarity {

  /** Exact top-k by cosine. `queries` is expected to be small (it is
    * broadcast); the corpus side streams partition-parallel, so the
    * only shuffle is the per-query top-k window over Q·N candidate
    * rows — use k-limiting windows, not a global sort. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe")))
    val c = corpus.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("ne"))
    val scored = c.join(q, col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF-style ANN: `centroids` define coarse cells; every corpus
    * vector is assigned to its argmax-cosine centroid (one broadcast
    * pass), each query probes its `nProbe` nearest cells, and exact
    * top-k runs inside the probed cells only.
    *
    * Deterministic by construction (ties: centroid id asc), so the
    * whole operator is reproducible in a SQL oracle. Recall depends on
    * nProbe/nCells; at scale the cell assignment is written once
    * (partitionBy(cell)) and amortized across queries.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("vec_id").as("cid"), toDouble(col("embedding")).as("ce")))

    def assign(df: DataFrame, idOut: String, vecOut: String, cellOut: String,
        topN: Int): DataFrame = {
      val scored = df
        .select(col("vec_id").as(idOut), toDouble(col("embedding")).as(vecOut))
        .join(cent)
        .withColumn("__cs", cosine(col(vecOut), col("ce")))
      val w = Window.partitionBy(col(idOut)).orderBy(col("__cs").desc, col("cid").asc)
      scored.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= topN)
        .select(col(idOut), col(vecOut), col("cid").as(cellOut))
    }

    val assigned = assign(corpus, "nid", "ne", "cell", 1)
    val probes   = assign(queries, "qid", "qe", "probe_cell", nProbe)

    val scored = probes.join(assigned, col("probe_cell") === col("cell") && col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, id1 < id2.
    * Brute-force all-pairs here; the LSH/IVF bucketing above is the
    * scale path (bucket first, pair within buckets). */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_id_1"), toDouble(col("embedding")).as("e1"))
    val b = corpus.select(col("vec_id").as("vec_id_2"), toDouble(col("embedding")).as("e2"))
    a.join(b, col("vec_id_1") < col("vec_id_2"))
      .withColumn("cosine", round(cosine(col("e1"), col("e2")), 6))
      .where(col("cosine") >= threshold)
      .select("vec_id_1", "vec_id_2", "cosine")
  }
}
