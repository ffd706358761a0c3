package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact, O(Q·N) — the right
  * answer when Q is small and broadcastable). Scale path: IVF-style
  * coarse quantization, split into a *build* step (assign every corpus
  * vector to its nearest centroid cell once — persist/partition by
  * cell) and a *probe* step (each query scans only its nProbe nearest
  * cells). Near-dup pair mining reuses the same cells as LSH-style
  * buckets, so no operator here ever forms the corpus×corpus product.
  *
  * SCALE CONTRACT — the cell count C is the caller's knob (measured
  * in SCALE_CURVE.md, round 10): assignment ([[assignCells]], the one
  * corpus×centroid pass) is Θ(N·C); within-cell pair mining
  * ([[semDedup]]) is Θ(N²·topN²/C). C ∝ √N balances them (Θ(N^1.5)
  * total — measured 1.4–1.9× cost for 10× rows at sf1-equivalent).
  * C ∝ N (e.g. a fixed [[sampleCentroids]] stride) keeps per-cell
  * pair work linear but makes assignment Θ(N²/stride) — the measured
  * superlinear slope of the q93/q97 fixtures, which pin stride=50
  * only because their DuckDB oracles mirror it. Beyond C ∝ √N,
  * brute-force assignment itself needs a coarse quantizer
  * (hierarchical assignment) — out of the current frozen surface.
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

  /** Exact top-k by euclidean distance (ascending) — the L2 twin of
    * [[bruteForceTopK]], same broadcast-Q / streaming-corpus shape. */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe")))
    val c = corpus.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("ne"))
    val scored = c.join(q, col("qid") =!= col("nid"))
      .withColumn("dist", l2(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("dist"), 6).as("distance"))
  }

  /** Deterministic centroid sample: every `step`-th vector by id.
    * The trivial-but-reproducible builder (an oracle can mirror it);
    * [[kMeans]] below is the quality path when reproducibility in SQL
    * is not required. */
  def sampleCentroids(corpus: DataFrame, step: Long): DataFrame =
    corpus.filter(pmod(col("vec_id"), lit(step)) === 0)

  /** BUILD step: assign each vector its `topN` nearest centroid cells
    * (argmax cosine, ties → centroid id asc). One broadcast pass over
    * the input; at scale write the result `partitionBy("cell")` once
    * and amortize across all probes — this method is the only place
    * corpus×centroid scoring happens.
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame,
      idOut: String, vecOut: String, cellOut: String, topN: Int): DataFrame = {
    val cent = broadcast(centroids.select(col("vec_id").as("__cid"), toDouble(col("embedding")).as("__ce")))
    val scored = vectors
      .select(col("vec_id").as(idOut), toDouble(col("embedding")).as(vecOut))
      .join(cent)
      .withColumn("__cs", cosine(col(vecOut), col("__ce")))
    val w = Window.partitionBy(col(idOut)).orderBy(col("__cs").desc, col("__cid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= topN)
      .select(col(idOut), col(vecOut), col("__cid").as(cellOut))
  }

  /** PROBE step: queries probe their `nProbe` nearest cells and run
    * exact top-k inside those cells only — the scan shrinks to
    * ~nProbe/nCells of the corpus per query. `assignedCorpus` is the
    * [[assignCells]] output (nid, ne, cell), computed once.
    */
  def ivfTopK(assignedCorpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame =
    ivfTopKWithProbes(assignedCorpus,
      assignCells(queries, centroids, "qid", "qe", "probe_cell", nProbe), k)

  private def ivfTopKWithProbes(assignedCorpus: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val scored = probes.join(assignedCorpus,
        col("probe_cell") === col("cell") && col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** PROBE from a persisted store: `store` is an [[assignCells]]
    * output written `partitionBy("cell")` (e.g. via
    * `Warehouse.writePartitioned`) and read back. The probed cell ids
    * (≤ |queries|·nProbe values — queries are small by the probe
    * contract) are collected and inlined as a literal IN-list, which
    * is the point: the predicate reaches the scan as PartitionFilters,
    * so only the probed cell directories are listed and read — the
    * amortization the build/probe split exists for. A plain
    * probe_cell = cell join would rely on runtime dynamic partition
    * pruning instead of planning-time pruning. */
  def ivfTopKFromStore(store: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    // materialize the (tiny, by the probe contract) assignment ONCE as
    // a local relation: the IN-list and the probe join both read the
    // collected rows, no centroid scoring runs twice, and nothing is
    // left pinned in executor storage after the call
    val assigned = assignCells(queries, centroids, "qid", "qe", "probe_cell", nProbe)
    val rows = assigned.collect()
    val probes = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), assigned.schema)
    val probedCells = rows.map(_.getAs[Any]("probe_cell")).distinct.toSeq
    ivfTopKWithProbes(store.where(col("cell").isin(probedCells: _*)), probes, k)
  }

  /** INCREMENTAL index maintenance — the ANN twin of
    * [[graft.operators.Dedup.minhashLshAppend]]: assign ONLY the new
    * batch to the existing centroids (one broadcast pass over the
    * batch; the indexed corpus is never rescanned) and append the
    * assignment to the cell-partitioned store. Cell assignment is a
    * pure function of (vector, centroids), so append-then-probe is
    * value-identical to a full rebuild over the grown corpus (q97
    * holds that equivalence to the oracle), and appends only ADD
    * files to cell directories — planning-time probe pruning over
    * the store is unaffected. A failed append can leave partial
    * files; the index is derived data, so recovery is re-derivation
    * (or route through the warehouse overwrite-swap when a serving
    * store needs exactly-once). Periodically re-fit centroids when
    * drift degrades [[recallAtK]] — the append contract is "same
    * centroids", like minhash append's "same hash family". */
  def ivfStoreAppend(newBatch: DataFrame, centroids: DataFrame,
      storeDir: String): Unit =
    assignCells(newBatch, centroids, "nid", "ne", "cell", 1)
      .write.mode("append").partitionBy("cell").parquet(storeDir)

  /** Convenience: build + probe in one call (when the assignment is
    * not reused). Prefer persisting [[assignCells]] when probing more
    * than once. */
  def ivfTopKEndToEnd(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame =
    ivfTopK(assignCells(corpus, centroids, "nid", "ne", "cell", 1), queries, centroids, k, nProbe)

  /** Embedding near-duplicate pairs, cell-bucketed: every vector is
    * multi-probe-assigned to its `nProbe` nearest cells, pairs form
    * only *within* a shared cell (id1 < id2), then exact cosine is
    * scored and thresholded. Multi-probe recovers most borderline
    * pairs a single-cell split would cut; the corpus×corpus product is
    * never formed — the join is equi on the cell key, so the blowup is
    * bounded by the largest cell (≈ N/nCells·nProbe rows).
    */
  def nearDupPairs(corpus: DataFrame, centroids: DataFrame,
      threshold: Double, nProbe: Int = 2): DataFrame = {
    // persisted: BOTH self-join sides consume the assignment — unshared
    // it would score corpus × centroids twice. The (pairs-sized) result
    // is materialized and the assignment released before returning.
    val assigned = assignCells(corpus, centroids, "vid", "ve", "cell", nProbe)
      .persist()
    val a = assigned.select(col("vid").as("vec_id_1"), col("ve").as("e1"), col("cell"))
    val b = assigned.select(col("vid").as("vec_id_2"), col("ve").as("e2"), col("cell"))
    Checkpoints.materialize(
      a.join(b, Seq("cell"))
        .where(col("vec_id_1") < col("vec_id_2"))
        .select("vec_id_1", "vec_id_2", "e1", "e2").distinct() // multi-probe → same pair in ≥1 cells
        .withColumn("cosine", round(cosine(col("e1"), col("e2")), 6))
        .where(col("cosine") >= threshold)
        .select("vec_id_1", "vec_id_2", "cosine"),
      assigned)
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup over
    * the embedding space — documents whose embeddings are near-
    * identical in cosine are redundant for training even when their
    * token-level shingles differ (paraphrases, boilerplate variants,
    * translations of the same page), so whole near-dup GROUPS are
    * collapsed to one representative. Pairs come from the cell-
    * bucketed [[nearDupPairs]] (the paper's "dedup within k-means
    * clusters" — the corpus×corpus product is never formed), the
    * groups from [[Dedup.connectedComponents]] over the pair graph
    * (pairs alone over-delete on chains: a~b, b~c must keep exactly
    * one of {a,b,c}, not zero), and the survivor per group is the
    * min-id representative ([[Dedup.dedupByClusters]] — one semi-join
    * of the corpus against the pairs-sized membership list).
    * Returns the surviving corpus rows unchanged. `idCol`/`embCol`
    * name the corpus's id and embedding columns; the pair-mining
    * stage (which expects the canonical vec_id/embedding names) runs
    * over a projection, so a corpus keyed `doc_id` dedups on
    * `doc_id` — never on some unrelated column that happens to be
    * named vec_id. */
  def semDedup(corpus: DataFrame, centroids: DataFrame, threshold: Double,
      nProbe: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val pairs = nearDupPairs(
      corpus.select(col(idCol).as("vec_id"), col(embCol).as("embedding")),
      centroids, threshold, nProbe)
    val clusters = Dedup.connectedComponents(pairs, "vec_id_1", "vec_id_2")
    Dedup.dedupByClusters(corpus, clusters, idCol)
  }

  /** Deterministic SRP hyperplane matrix: `planes(i)(d)` maps an
    * md5 draw of `"salt|i|d"` into (-1, 1] — a pure function of
    * (salt, i, d), so a SQL oracle derives the IDENTICAL matrix from
    * the same md5 formula and every signature bit replays exactly.
    * (True Gaussian planes estimate angles marginally better; md5-
    * uniform components keep the engine-portability contract every
    * hash in this library honors, and SRP's guarantee only needs the
    * planes to be symmetric around zero.) */
  def srpPlanes(bits: Int, dim: Int, salt: String = "srp"): Array[Array[Double]] = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
    val scale = (1L << 60).toDouble
    Array.tabulate(bits, dim) { (i, d) =>
      val h = java.lang.Long.parseLong(
        graft.functions.Md5ModExpr.md5Hex(s"$salt|$i|$d").take(15), 16)
      ((h + 1).toDouble / scale) * 2 - 1
    }
  }

  /** Signed-random-projection signatures (Charikar STOC'02 — the
    * cosine-space simhash): `bits`-bit signature per vector via the
    * native codegen [[graft.functions.SrpSignExpr]]; hamming distance
    * between signatures estimates the angle (`P[bit flips] = θ/π`).
    * One map pass, no shuffle. Returns (idCol, srp). */
  def srpSignatures(vectors: DataFrame, idCol: String, embCol: String,
      planes: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    vectors.select(col(idCol), ColumnBridge.column(graft.functions.SrpSignExpr(
      ColumnBridge.expression(toDouble(col(embCol))), planes)).as("srp"))
  }

  /** SRP near-duplicate pairs: pigeonhole banding over the signature
    * (split into `maxHamming + 1` chunks — a pair within the hamming
    * budget must agree on ≥ 1 chunk, FULL recall at the signature
    * level, same guarantee as the text simhash banding) → exact
    * hamming verify (`bit_count(xor)`) → exact cosine verify. The
    * corpus×corpus product is never formed; candidates are an equi
    * join on (band, chunk). Embeddings ride along with the signature
    * frame so verification needs no extra join; that frame is
    * persisted across the self-join sides and released on return.
    *
    * vs [[nearDupPairs]] (IVF cells): SRP needs NO centroid build and
    * its bucket count adapts to the data (2^chunkBits per band), the
    * better fit when the corpus has no usable cluster structure;
    * IVF cells cut candidate volume harder when it does. */
  def srpNearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
      bits: Int = 16, maxHamming: Int = 3, minCosine: Double = 0.25,
      salt: String = "srp"): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0, s"bands ($bands) must divide bits ($bits)")
    val chunkBits = bits / bands
    val mask = (1L << chunkBits) - 1
    val dim = 1024 // planes cover any realistic dim; dot runs over the common prefix
    val planes = srpPlanes(bits, dim, salt)
    import org.apache.spark.sql.graft.ColumnBridge
    val sigs = corpus.select(col(idCol).as("vid"),
        toDouble(col(embCol)).as("ve"))
      .withColumn("srp", ColumnBridge.column(graft.functions.SrpSignExpr(
        ColumnBridge.expression(col("ve")), planes)))
      .persist()
    val chunks = sigs.select(col("vid"), col("ve"), col("srp"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("srp"), b * chunkBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val candidates = chunks.as("a")
      .join(chunks.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_id_1"), col("a.srp").as("__s1"),
        col("a.ve").as("__e1"),
        col("b.vid").as("vec_id_2"), col("b.srp").as("__s2"),
        col("b.ve").as("__e2"))
      .distinct() // a pair can agree on several bands
    Checkpoints.materialize(
      candidates
        .withColumn("hamming",
          bit_count(col("__s1").bitwiseXOR(col("__s2"))).cast("long"))
        .where(col("hamming") <= maxHamming)
        .withColumn("cosine", round(cosine(col("__e1"), col("__e2")), 6))
        .where(col("cosine") >= minCosine)
        .select("vec_id_1", "vec_id_2", "hamming", "cosine"),
      sigs)
  }

  /** Product quantization (Jégou, Douze, Schmid: "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): vectors compress to
    * `m` small codes — one per subspace — and queries score the whole
    * corpus through per-subspace distance TABLES instead of raw
    * vectors. At 100 TB this is the memory story IVF alone lacks: the
    * scored representation is m bytes-ish per vector, not 4·dim, and
    * the scoring pass is a broadcast-join + grouped sum over the
    * encoded rows — no raw-vector shuffle ever.
    *
    * Codebooks here are the deterministic sampled kind (so a SQL
    * oracle replays build→encode→score value-for-value, as with q30's
    * IVF); [[kMeans]] per subspace is the quality upgrade when SQL
    * reproducibility is not required.
    */
  def pqCodebooks(corpus: DataFrame, m: Int, dim: Int, step: Long): DataFrame = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val sub = dim / m
    sampleCentroids(corpus, step)
      .select(col("vec_id").as("cid"), toDouble(col("embedding")).as("ce"))
      .select(col("cid"), posexplode(array((0 until m).map(j =>
        slice(col("ce"), j * sub + 1, sub)): _*)))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "ce")
  }

  /** ENCODE: nearest codebook entry per (vector, subspace) — returns
    * the exploded (nid, subspace, code) form the scorer consumes
    * directly. One broadcast pass over the corpus; ties break to the
    * lower centroid id (deterministic). */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    corpus.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("ne"))
      .select(col("nid"), posexplode(array((0 until m).map(j =>
        slice(col("ne"), j * sub + 1, sub)): _*)))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "nv")
      .join(broadcast(codebooks), Seq("subspace"))
      .groupBy(col("nid"), col("subspace"))
      .agg(min(struct(l2(col("nv"), col("ce")).as("d"), col("cid"))).as("best"))
      .select(col("nid"), col("subspace"), col("best.cid").as("code"))
  }

  /** SCORE (asymmetric distance): each query builds a per-subspace
    * distance table against the codebooks (tiny, broadcast), the
    * encoded corpus joins it on (subspace, code), and per-subspace
    * partial distances fold in a FIXED left-to-right order (floating
    * addition is order-sensitive; a free-order sum could diverge from
    * an external replay in the last ulp). */
  def pqTopK(encoded: DataFrame, codebooks: DataFrame, queries: DataFrame,
      m: Int, dim: Int, k: Int): DataFrame = {
    val sub = dim / m
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe"))
      .select(col("qid"), posexplode(array((0 until m).map(j =>
        slice(col("qe"), j * sub + 1, sub)): _*)))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "qv")
    val table = broadcast(q.join(codebooks, Seq("subspace"))
      .select(col("qid"), col("subspace"), col("cid").as("code"),
        pow(l2(col("qv"), col("ce")), 2).as("dsq")))
    val parts = (0 until m).map(j =>
      sum(when(col("subspace") === j, col("dsq")).otherwise(lit(0.0))).as(s"__d$j"))
    val total = (0 until m).map(j => col(s"__d$j")).reduce(_ + _)
    encoded.join(table, Seq("subspace", "code"))
      .where(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(parts.head, parts.tail: _*)
      .withColumn("__tot", total)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__tot").asc, col("nid").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"),
        round(sqrt(col("__tot")), 6).as("approx_dist"))
  }

  /** IVF-PQ — the two-level ANN layout (coarse inverted cells bound
    * the SCAN, PQ codes on the residual v − centroid bound the
    * MEMORY; the FAISS IVFPQ architecture): probe nProbe cells, score
    * only their members, and score them through per-cell residual
    * distance tables. Residuals are computed with one `zip_with` pass
    * at BUILD time (interpreted higher-order fn — acceptable for the
    * one-off corpus pass, never on the query path). Returns (encoded
    * rows (nid, cell, subspace, code), shared residual codebooks).
    */
  def ivfPqBuild(corpus: DataFrame, centroids: DataFrame, m: Int, dim: Int,
      pqStep: Long): (DataFrame, DataFrame) = {
    val cent = broadcast(centroids.select(col("vec_id").as("cell"),
      toDouble(col("embedding")).as("__ce")))
    // persisted: three consumers (codebook sampling, encoding, the
    // cell tag-back join) would each recompute the assignment + the
    // residual pass. Both returned frames are materialized
    // ([[Checkpoints.materialize]] — codes are m bytes-ish per vector,
    // far smaller than the raw corpus) and the residuals released
    // (even on failure) before returning.
    val residuals = assignCells(corpus, centroids, "nid", "ne", "cell", 1)
      .join(cent, Seq("cell"))
      .select(col("nid").as("vec_id"), col("cell"),
        zip_with(col("ne"), col("__ce"), (a, b) => a - b).as("embedding"))
      .persist()
    try {
      val codebooks = Checkpoints.materialize(pqCodebooks(residuals, m, dim, pqStep))
      val encoded = Checkpoints.materialize(pqEncode(residuals, codebooks, m, dim)
        .join(residuals.select(col("vec_id").as("nid"), col("cell")), Seq("nid")))
      (encoded, codebooks)
    } finally residuals.unpersist(blocking = false)
  }

  /** IVF-PQ probe: nProbe coarse cells per query, a residual distance
    * table per (query, probed cell), and the encoded members of the
    * probed cells scored through it — corpus-side work is one
    * broadcast join over m rows per member of the probed cells only.
    * Distance parts fold in fixed order (see [[pqTopK]]). */
  def ivfPqTopK(encoded: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      queries: DataFrame, m: Int, dim: Int, k: Int, nProbe: Int): DataFrame = {
    val sub = dim / m
    val probes = assignCells(queries, centroids, "qid", "qe", "probe_cell", nProbe)
    val cent = broadcast(centroids.select(col("vec_id").as("probe_cell"),
      toDouble(col("embedding")).as("__ce")))
    val qres = probes.join(cent, Seq("probe_cell"))
      .select(col("qid"), col("probe_cell").as("cell"),
        zip_with(col("qe"), col("__ce"), (a, b) => a - b).as("qr"))
    val qslices = qres.select(col("qid"), col("cell"),
        posexplode(array((0 until m).map(j =>
          slice(col("qr"), j * sub + 1, sub)): _*)))
      .withColumnRenamed("pos", "subspace")
      .withColumnRenamed("col", "qv")
    val table = broadcast(qslices.join(codebooks, Seq("subspace"))
      .select(col("qid"), col("cell"), col("subspace"), col("cid").as("code"),
        pow(l2(col("qv"), col("ce")), 2).as("dsq")))
    val parts = (0 until m).map(j =>
      sum(when(col("subspace") === j, col("dsq")).otherwise(lit(0.0))).as(s"__d$j"))
    val total = (0 until m).map(j => col(s"__d$j")).reduce(_ + _)
    encoded.join(table, Seq("cell", "subspace", "code"))
      .where(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(parts.head, parts.tail: _*)
      .withColumn("__tot", total)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__tot").asc, col("nid").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"),
        round(sqrt(col("__tot")), 6).as("approx_dist"))
  }

  /** Recall@k of an approximate top-k result against exact ground
    * truth — the quality dial for tuning nProbe/m/codebook size that
    * value-exactness checks cannot provide. Both inputs are
    * (qid, rank, nid, ...) frames as produced by the top-k operators
    * here (exact from [[bruteForceTopK]]/[[bruteForceTopKL2]]). Per
    * query: hits = |approx top-k ∩ exact top-k|, recall = hits / k.
    * One equi-join on (qid, nid) + one per-query aggregate; the exact
    * side at real scale is computed once for a small audit query set,
    * never the full corpus. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = approx.where(col("rank") <= k).select(col("qid"), col("nid"))
    val e = exact.where(col("rank") <= k)
      .select(col("qid"), col("nid"), lit(1).as("__hit"))
    a.join(e, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_returned"),
        coalesce(sum("__hit"), lit(0)).cast("long").as("n_hits"))
      .withColumn("recall", round(col("n_hits") / lit(k.toDouble), 4))
  }

  /** Lloyd's k-means over the embedding column, fully distributed
    * (no driver-side collect and no driver-side count): seed = the k
    * first vectors in md5-of-id order (deterministic, uniform-ish, a
    * distributed top-k — no full sort, no size-of-corpus job) or a
    * caller-supplied `seed` frame ([[kMeansParallelSeed]] is the
    * quality init), then `iters` rounds of assign → element-wise mean
    * per cell. Mean is
    * computed by posexploding dimensions and re-assembling with a
    * position-sorted collect — shuffle keyed on (cell, dim), uniform.
    *
    * Each iteration's centroids are checkpointed
    * ([[Checkpoints.stableTracked]] — localCheckpoint, or reliable
    * checkpoint() when the session has a checkpoint dir): k tiny rows
    * materialize eagerly and the lineage truncates, so iteration i+1
    * costs exactly one corpus pass instead of recomputing iterations
    * 1..i off an ever-growing plan.
    *
    * Returns (vec_id = cell id, embedding = centroid) for direct use
    * as the `centroids` input of the probe operators.
    */
  def kMeans(corpus: DataFrame, k: Int, iters: Int,
      seed: Option[DataFrame] = None): DataFrame = {
    // (frame, reliable-checkpoint path): superseded iterations drop
    // their checkpoint files instead of accumulating for the session
    var centroids = Checkpoints.stableTracked(
      seed.getOrElse(
        corpus.select(col("vec_id"), col("embedding"))
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)))
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, centroids._1, "vid", "ve", "cell", 1)
      val prev = centroids
      centroids = Checkpoints.stableTracked(assigned
        .select(col("cell"), posexplode(col("ve")))
        .groupBy("cell", "pos")
        .agg(avg("col").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("vec_id"),
          transform(col("pm"), x => x.getField("m")).as("embedding")))
      prev._1.unpersist()
      Checkpoints.drop(prev._1, prev._2)
    }
    // the RESULT is a plain materialized frame; the final round's
    // reliable checkpoint (if any) is dropped so a session of repeated
    // kMeans calls leaves nothing behind
    val out = Checkpoints.materialize(centroids._1)
    Checkpoints.drop(centroids._1, centroids._2)
    out
  }

  /** k-means‖-style oversampled seed (Bahmani et al., "Scalable
    * K-Means++", VLDB'12), fully deterministic: every random draw is
    * an md5 of (vec_id, round), so the same corpus always yields the
    * same seed on any cluster layout.
    *
    *  1. Start from the md5-first vector; for `rounds` rounds, sample
    *     each vector independently with probability
    *     min(1, oversample·k·d²/Σd²) where d = 1 − cos to the nearest
    *     candidate so far — far-from-coverage regions are picked with
    *     high probability, the k-means++ insight without its k
    *     sequential passes. Candidates ≈ rounds·oversample·k ≪ corpus.
    *  2. Weight each candidate by how many corpus vectors it is
    *     nearest to, then run a short WEIGHTED Lloyd reduction over
    *     the (tiny) candidate set down to k.
    *
    * Each round costs one broadcast scoring pass over the corpus plus
    * one scalar Σd² aggregate — `rounds`+1 corpus passes total, the
    * price of a seed that spans every cluster instead of whatever the
    * md5 order happened to hit ([[kMeans]] then needs fewer Lloyd
    * iterations over the full corpus, which is where 100 TB passes
    * actually hurt). Returns (vec_id, embedding) × k for
    * [[kMeans]]'s `seed`. */
  def kMeansParallelSeed(corpus: DataFrame, k: Int, rounds: Int = 3,
      oversample: Int = 2): DataFrame = {
    import graft.functions.TextFunctions.md5Long
    val c = corpus.select(col("vec_id"), toDouble(col("embedding")).as("embedding"))
    val two60 = math.pow(2.0, 60)
    var cand = Checkpoints.stableTracked(
      c.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(1))
    for (r <- 0 until rounds) {
      val bc = broadcast(cand._1
        .select(col("vec_id").as("__cid"), col("embedding").as("__ce")))
      // d² to the current candidate set, one broadcast pass
      val d2 = c.join(bc)
        .groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"),
          max(cosine(col("embedding"), col("__ce"))).as("__best"))
        // nanvl per ROW, not a corpus-wide guard: a single zero-norm
        // embedding (NaN cosine) would otherwise poison the Σd² and
        // silently disable d²-weighted sampling for every good vector;
        // zeroing just the degenerate row excludes it from sampling
        // (it is never a useful centroid) and leaves the rest weighted
        .withColumn("__d2", nanvl(pow(lit(1.0) - col("__best"), 2), lit(0.0)))
        .persist()
      // sum over zero rows is SQL null (empty corpus → NPE on getDouble)
      // — treat it like exact coverage; the top-up supplies any remainder
      val sumRow = d2.agg(sum(col("__d2"))).head()
      val sumD2 = if (sumRow.isNullAt(0)) 0.0 else sumRow.getDouble(0)
      val picked =
        if (sumD2.isNaN || sumD2 <= 0.0) d2.limit(0) // covered exactly (or degenerate)
        else d2.where(
          (md5Long(concat(col("vec_id").cast("string"), lit(s"|seed|$r")))
            / lit(two60)) * lit(sumD2) < lit(oversample.toDouble * k) * col("__d2"))
      val prev = cand
      cand = Checkpoints.stableTracked(prev._1.unionByName(
        picked.select(col("vec_id"), col("embedding"))))
      d2.unpersist(blocking = false)
      Checkpoints.drop(prev._1, prev._2)
    }
    // weight candidates by their basin size, then reduce to k with a
    // short weighted Lloyd over the candidate set only (tiny frames)
    val weights = assignCells(c, cand._1, "vid", "ve", "cell", 1)
      .groupBy(col("cell").as("vec_id")).agg(count(lit(1)).as("__w"))
    val weighted = cand._1.join(weights, Seq("vec_id"), "inner").persist()
    var centers = Checkpoints.stableTracked(
      weighted.select(col("vec_id"), col("embedding"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k))
    for (_ <- 0 until 3) {
      val assigned = assignCells(weighted, centers._1, "vid", "ve", "cell", 1)
        .join(weighted.select(col("vec_id").as("vid"), col("__w")), Seq("vid"))
      val prev = centers
      centers = Checkpoints.stableTracked(assigned
        .select(col("cell"), col("__w"), posexplode(col("ve")))
        .groupBy("cell", "pos")
        .agg((sum(col("col") * col("__w")) / sum(col("__w"))).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("vec_id"),
          transform(col("pm"), x => x.getField("m")).as("embedding")))
      Checkpoints.drop(prev._1, prev._2)
    }
    weighted.unpersist(blocking = false)
    // the weighted reduction can lose cells (a center that wins no
    // candidate in a round drops out of the groupBy), and the sampled
    // pool itself can start under k — top up deterministically from
    // the corpus in md5 order, so the result has exactly k seeds
    // whenever the corpus holds at least k vectors (a smaller corpus
    // necessarily yields every vector it has)
    val have = centers._1.count()
    val full =
      if (have >= k) centers._1
      else centers._1.unionByName(
        c.join(centers._1.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
          .limit((k - have).toInt))
    val out = Checkpoints.materialize(full)
    Checkpoints.drop(centers._1, centers._2)
    Checkpoints.drop(cand._1, cand._2)
    out
  }

  /** Top principal component by QUANTIZED power iteration — PCA's
    * first direction at corpus scale (the dominant axis of variation:
    * embedding-drift diagnosis, whitening's first step, the 1-D
    * projection that best preserves variance). Classic distributed
    * power iteration — per round one map pass (yᵢ = xᵢ·v), one
    * dim-keyed aggregate (s = Σᵢ yᵢ·xᵢ = Cv·n up to scale), one
    * normalize — with every quantity INTEGER-QUANTIZED so the
    * iteration is bit-replayable in any engine:
    *
    *  - embeddings quantize to micro-units once (x6 = round(x·1e6)),
    *    and center against the micro-rounded mean (exact long
    *    subtraction);
    *  - v is carried in micro-units (v6); the per-row projection
    *    y = Σⱼ x6ⱼ·v6ⱼ is an exact long (≤ d·x6·v6 ≈ 2e14 at d=64),
    *    floor-divided to y3 (milli-units of the real y) — the
    *    declared quantization of the method;
    *  - s accumulates as decimal(38,0) (exact, ORDER-INDEPENDENT —
    *    no FP accumulation anywhere), the norm is one
    *    deterministically-rounded decimal→double cast + sqrt, and
    *    v6' re-quantizes at 6dp.
    *
    * Quantization error per round is ~1e-3 relative on y — far below
    * power iteration's own convergence tolerance at 2-3 rounds; what
    * it buys is an iteration an external engine replays value-for-
    * value (the oracle runs the identical integer recurrence at the
    * (row, dim) grain). The sign convention is v₀ = uniform positive;
    * no per-round sign flip is applied (fixed rounds, deterministic).
    *
    * Scale shape: per round one codegen'd map + one d-sized aggregate
    * + one d-row normalize fold; nothing driver-side except d and the
    * uniform-start literal. Returns (dim, loading 6dp), `iters`
    * rounds from the uniform start. */
  def pcaPowerComponent(emb: DataFrame, vecCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val x6 = emb
      .where(col(vecCol).isNotNull)
      .select(expr(s"transform($vecCol, e -> cast(round(e * 1e6, 0) as bigint))")
        .as("__x6"))
    // fail LOUDLY on the degenerate inputs the math silently mangles:
    // a ragged corpus makes zip_with null-pad, a null element makes a
    // projection null, an empty corpus has no dimensionality at all
    val shape = x6.agg(
      min(size(col("__x6"))).as("__dMin"), max(size(col("__x6"))).as("__dMax"),
      sum(when(expr("exists(__x6, e -> e is null)"), 1L).otherwise(0L))
        .as("__nulls")).head()
    require(!shape.isNullAt(0), "pcaPowerComponent needs a non-empty corpus")
    val d = shape.getInt(0)
    require(d >= 1 && d == shape.getInt(1),
      s"vectors must share one non-zero length, got [$d, ${shape.getInt(1)}]")
    require(shape.getLong(2) == 0L,
      s"${shape.getLong(2)} vectors contain null elements")
    // micro-rounded per-dim mean, rebuilt as a d-length array (no
    // driver collect — the array rides a 1-row broadcast)
    val dimSums = x6
      .select(posexplode(col("__x6")).as(Seq("__j", "__e")))
      .groupBy("__j")
      .agg(sum(col("__e").cast("decimal(38,0)")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("__j"),
        round(col("__s").cast("double") / col("__n"), 0)
          .cast("long").as("__m6"))
    val meanArr = dimSums.groupBy()
      .agg(expr("transform(sort_array(collect_list(struct(__j, __m6)))," +
        " p -> p.__m6)").as("__mArr"))
    val xc = x6.crossJoin(broadcast(meanArr))
      .select(expr("zip_with(__x6, __mArr, (a, b) -> a - b)").as("__xc"))
      .persist()
    try {
      val v0 = math.round(1e6 / math.sqrt(d.toDouble))
      var v = xc.sparkSession.range(1).select(
        expr(s"array_repeat(${v0}L, $d)").as("__v6"))
      for (_ <- 1 to iters) {
        val y = xc.crossJoin(broadcast(v))
          .select(col("__xc"), expr(
            """aggregate(zip_with(__xc, __v6, (a, b) -> a * b),
               cast(0 as bigint), (acc, p) -> acc + p)""").as("__y12"))
          .select(col("__xc"),
            expr("(__y12 - pmod(__y12, 1000000000)) div 1000000000")
              .as("__y3"))
        val s = y.select(col("__y3"), posexplode(col("__xc")).as(Seq("__j", "__e")))
          .groupBy("__j")
          .agg(sum((col("__y3") * col("__e")).cast("decimal(38,0)")).as("__s"))
        val norm = s.agg(
          sqrt(sum((col("__s") * col("__s")).cast("decimal(38,0)"))
            .cast("double")).as("__norm"))
        v = s.crossJoin(broadcast(norm))
          .select(col("__j"),
            round(col("__s").cast("double") / col("__norm") * 1e6, 0)
              .cast("long").as("__v6j"))
          .groupBy()
          .agg(expr("transform(sort_array(collect_list(struct(__j, __v6j)))," +
            " p -> p.__v6j)").as("__v6"))
      }
      val out = v.select(posexplode(col("__v6")).as(Seq("dim", "__v")))
        .select(col("dim").cast("long").as("dim"),
          (col("__v").cast("double") / 1e6).as("loading"))
      Checkpoints.materialize(out, xc)
    } finally xc.unpersist(blocking = false)
  }

  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel, TOIS
    * 2010) between two per-query rankings — [[recallAtK]]'s
    * top-weighted complement for ANN/retrieval evaluation: recall@k
    * treats every rank the same, RBO discounts agreement
    * geometrically (weight (1−p)·p^(d−1)/d at depth d), which is what
    * distinguishes an index that misses rank 1 from one that misses
    * rank k. Both inputs are (qid, rank, nid) frames; queries with
    * zero overlap report 0.
    *
    * Execution: one equi-join on (qid, nid) inside depth k, overlap
    * counts per depth via an `explode(sequence(m..k))` of at most k
    * rows per match (k is small by contract), one aggregate — all
    * shuffles keyed on qid. */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int, p: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val m = a.where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").as("__ra"))
      .join(b.where(col("rank") <= k)
        .select(col("qid"), col("nid"), col("rank").as("__rb")), Seq("qid", "nid"))
      .select(col("qid"), greatest(col("__ra"), col("__rb")).as("__m"))
    // a (qid, nid) pair is inside BOTH depth-d prefixes for every
    // d >= max(ra, rb): overlap(d) accumulates via the sequence explode
    val scored = m
      .select(col("qid"), explode(sequence(col("__m"), lit(k))).as("__d"))
      .groupBy(col("qid"), col("__d")).agg(count(lit(1)).as("__overlap"))
      .withColumn("__w",
        lit(1.0 - p) * pow(lit(p), col("__d") - 1) / col("__d"))
      .groupBy("qid")
      .agg(round(sum(col("__overlap") * col("__w")), 6).as("rbo"))
    a.where(col("rank") <= k).select(col("qid")).distinct()
      .join(scored, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("rbo"), lit(0.0)).as("rbo"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    * 2009) — the standard zero-tuning combiner for heterogeneous
    * retrieval signals (BM25 + dense cosine is THE hybrid-search
    * shape): each ranking contributes `1/(k0 + rank)` per item,
    * contributions sum, and the fused order needs no score
    * normalization at all — which is the point; BM25 and cosine live
    * on incomparable scales.
    *
    * Inputs are (id, rank) frames. Contributions are held as exact
    * nano-units (rounded 9dp then long — the [[Tfidf.bm25TopK]]
    * rule) so the cross-list sum is order-independent and
    * engine-replayable. One union + one id-keyed aggregate; rankings
    * are top-k-sized by construction, so every stage is tiny
    * relative to any corpus. Returns (id, rrf_nanos, n_lists)
    * ordered by fused score desc, id asc. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      rankCol: String = "rank", k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    rankings
      .map(_.select(col(idCol),
        round(lit(1.0) / (lit(k0) + col(rankCol)) * lit(1000000000L))
          .cast("long").as("__nanos")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("__nanos").as("rrf_nanos"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_nanos").desc, col(idCol))
  }

  /** Matryoshka-style prefix-dimension ANN (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022 — the
    * retrieval recipe): score the corpus on only the FIRST
    * `prefixDims` dimensions (MRL-trained embeddings front-load
    * information, so the prefix is a cheap faithful proxy), keep a
    * per-query `shortlist`, then re-rank just the shortlist with the
    * full vector. The scan cost drops by dims/prefixDims while the
    * final order stays full-precision.
    *
    * Execution: the coarse pass is [[bruteForceTopK]]'s shape over
    * `slice`d vectors (broadcast queries, streaming corpus,
    * group-limited window); the exact pass touches only
    * queries×shortlist rows. Returns (qid, rank, nid, cosine) like
    * the other top-k operators, cosine rounded 6dp. */
  def prefixDimTopK(corpus: DataFrame, queries: DataFrame,
      prefixDims: Int, shortlist: Int, k: Int): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    require(shortlist >= k && k >= 1,
      s"need shortlist >= k >= 1, got shortlist=$shortlist k=$k")
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      toDouble(col("embedding")).as("qe")))
    val c = corpus.select(col("vec_id").as("nid"),
      toDouble(col("embedding")).as("ne"))
    val coarse = c.join(q, col("qid") =!= col("nid"))
      .withColumn("__pcos",
        cosine(slice(col("qe"), 1, prefixDims), slice(col("ne"), 1, prefixDims)))
      .withColumn("__prank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("__pcos").desc, col("nid").asc)))
      .where(col("__prank") <= shortlist)
    coarse
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cosine"))
  }

  /** k-center greedy coreset selection (Sener & Savarese, "Active
    * Learning for Convolutional Neural Networks: A Core-Set
    * Approach", ICLR 2018) — farthest-point traversal, the standard
    * diverse-subset selector for training-data pruning: start from
    * the min-id seed, then `k`−1 times select the vector farthest
    * (L2) from everything selected so far. The selected set is a
    * 2-approximation of the optimal k-center cover, and the sequence
    * of selection distances is the (monotone non-increasing)
    * coverage-radius diagnostic.
    *
    * Execution is the incremental traversal every real implementation
    * uses: one persisted (vec_id, v, mind) frame holds each vector's
    * distance to its nearest SELECTED center; a round is (a) a 1-row
    * TakeOrdered argmax collect (a driver scalar, the kMeans-round
    * pattern — ties pinned to min vec_id so selection is
    * deterministic and oracle-replayable) and (b) one broadcast-
    * literal map pass folding the new center in with `least`. The
    * corpus is never shuffled; k rounds cost k codegen'd passes, and
    * per-round [[Checkpoints.stableTracked]] state keeps round i+1
    * at one pass instead of an i-deep `least` lineage.
    *
    * Returns (rank, vec_id, sel_dist): selection order and each
    * pick's distance-to-selected at selection time, rounded 6dp
    * (null for the seed). Selected ids are excluded from later
    * argmaxes (exact-duplicate embeddings would otherwise re-select
    * a center at distance 0), and selection stops early with fewer
    * than k rows when the corpus is exhausted. */
  def kCenterGreedy(corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    val e = corpus.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val seedRow = e.orderBy(col("vec_id")).limit(1).collect()
    require(seedRow.nonEmpty, "kCenterGreedy needs a non-empty corpus")
    def vecLit(a: Seq[Double]): Column = array(a.map(lit): _*)
    val seedId = seedRow.head.getLong(0)
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])](
      (1, seedId, None))
    val selIds = scala.collection.mutable.ArrayBuffer[Long](seedId)
    // the maintained distance is round6'd at every fold so the argmax
    // compares engine-portable doubles (the mmrRerank rule): a raw
    // last-ULP gap between this l2 and the oracle's list_distance
    // would otherwise flip a near-tied pick and diverge every
    // subsequent round
    var state = Checkpoints.stableTracked(e.withColumn("mind",
      round(l2(col("v"), vecLit(seedRow.head.getSeq[Double](1))), 6)))
    var exhausted = false
    for (r <- 2 to k if !exhausted) {
      // selected ids are excluded explicitly: with exact-duplicate
      // embeddings (the pre-dedup norm) every remaining distance can
      // be 0 and the bare argmax would re-pick a selected center
      // instead of an unselected duplicate
      val top = state._1.where(!col("vec_id").isin(selIds.toSeq: _*))
        .orderBy(col("mind").desc, col("vec_id").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true // k > corpus size: all selected
      else {
        val (id, v, d) = (top.head.getLong(0), top.head.getSeq[Double](1),
          top.head.getDouble(2))
        picks += ((r, id, Some(d)))
        selIds += id
        val prev = state
        state = Checkpoints.stableTracked(prev._1.withColumn("mind",
          least(col("mind"), round(l2(col("v"), vecLit(v)), 6))))
        prev._1.unpersist(blocking = false)
        Checkpoints.drop(prev._1, prev._2)
      }
    }
    state._1.unpersist(blocking = false)
    Checkpoints.drop(state._1, state._2)
    import spark.implicits._
    picks.toSeq.toDF("rank", "vec_id", "sel_dist")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998) — diversity-aware top-k: after the seed (highest
    * relevance), each round selects the candidate maximizing
    * `lambda·rel − (1−lambda)·max_{s∈selected} cos(cand, s)` —
    * relevant results that are NOT near-duplicates of what is
    * already shown (for retrieval UIs and diverse few-shot example
    * selection alike). Ties pin to min vec_id.
    *
    * Execution splits by scale the way [[ivfTopKFromStore]]'s probe
    * assignment does: candidate GENERATION is the distributed part
    * ([[bruteForceTopK]] / the IVF probes — corpus-scale), while the
    * selection loop runs on the by-contract-tiny candidate set
    * (`nCandidates` rows, default 20): the candidate×candidate
    * similarity matrix is computed IN Spark with the native codegen
    * [[graft.functions.VectorFunctions.cosine]] and rounded 6dp —
    * the same arithmetic the oracle replays, so every score the
    * driver-side greedy loop compares is an engine-portable double —
    * then collected (nCandidates² small rows) for the k greedy
    * picks. Returns (rank, vec_id, rel, mmr_score) in selection
    * order; the seed's score is its relevance. */
  def mmrRerank(corpus: DataFrame, query: DataFrame, nCandidates: Int, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && nCandidates >= k,
      s"need nCandidates >= k >= 1, got nCandidates=$nCandidates k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = corpus.sparkSession
    // one query vector by contract: bruteForceTopK returns nCandidates
    // rows PER qid, and dropping qid across multiple queries would
    // blend two rankings (last-collected relevance wins) into one
    // nondeterministic result
    require(query.select(col("vec_id")).distinct().count() == 1,
      "mmrRerank re-ranks one query at a time — pass a 1-query frame")
    val cand = bruteForceTopK(corpus, query, nCandidates)
      .select(col("nid").as("vec_id"), col("cosine").as("rel"))
      .join(corpus.select(col("vec_id"), toDouble(col("embedding")).as("v")), "vec_id")
      .persist()
    val simRows = cand.select(col("vec_id").as("a"), col("v").as("va"))
      .join(cand.select(col("vec_id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rels = cand.select(col("vec_id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cand.unpersist(blocking = false)
    def sim(x: Long, y: Long): Double =
      if (x == y) 1.0 else simRows(if (x < y) (x, y) else (y, x))
    val remaining = scala.collection.mutable.SortedSet[Long](rels.keySet.toSeq: _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    // the corpus can yield fewer than nCandidates rows (self excluded,
    // small corpora) — stop at pool exhaustion instead of reducing an
    // empty set
    for (r <- 1 to k if remaining.nonEmpty) {
      val best = remaining.map { id =>
        val score =
          if (selected.isEmpty) rels(id)
          else lambda * rels(id) -
            (1.0 - lambda) * selected.map(s => sim(id, s._2)).max
        (id, score)
      }.reduceLeft((p, q) =>
        if (q._2 > p._2 || (q._2 == p._2 && q._1 < p._1)) q else p)
      selected += ((r, best._1, rels(best._1), best._2))
      remaining -= best._1
    }
    import spark.implicits._
    selected.toSeq.toDF("rank", "vec_id", "rel", "mmr_score")
      .select(col("rank"), col("vec_id"), col("rel"),
        round(col("mmr_score"), 6).as("mmr_score"))
  }
}
