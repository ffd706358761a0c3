package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ObservationBridge

/** Round-6 composition fixes: self-pair ids keep their label in
  * connectedComponents, the contamination stage can reuse one
  * corpus-wide shingle materialization (superset cache), StageCounter
  * waits generously and deregisters, and the primitive union-find map
  * matches a reference map exactly. */
class PipelineReuseSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels ids that appear only in self-pairs") {
    val pairs = Seq((1L, 2L), (5L, 5L), (2L, 3L), (9L, 9L))
      .toDF("doc_id_1", "doc_id_2")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 9L))
    // a node in BOTH a self-pair and a real pair is labeled once, by
    // the real component
    val mixed = Seq((1L, 1L), (1L, 2L)).toDF("doc_id_1", "doc_id_2")
    val got2 = Dedup.connectedComponents(mixed).as[(Long, Long)]
      .collect().toMap
    assert(got2 === Map(1L -> 1L, 2L -> 1L))
    // all-self-pair input degenerates to pure singletons
    val selfOnly = Seq((7L, 7L)).toDF("doc_id_1", "doc_id_2")
    assert(Dedup.connectedComponents(selfOnly).as[(Long, Long)]
      .collect().toMap === Map(7L -> 7L))
    // same contracts on the DISTRIBUTED loop path (driverMaxEdges = -1
    // keeps even the empty-edge degenerate case off the driver gate)
    assert(Dedup.connectedComponents(pairs, driverMaxEdges = -1)
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 9L))
    assert(Dedup.connectedComponents(selfOnly, driverMaxEdges = -1)
      .as[(Long, Long)].collect().toMap === Map(7L -> 7L))
  }

  test("contaminationFromSuperset equals direct contamination; refuses a narrower cache") {
    val train = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 100% hit
      (2L, "entirely novel words that never appear in train corpus"),
      (3L, "too short"), // < 3 tokens of shingle: drops out both paths
      (4L, "the quick brown cat sleeps all day long here"))
      .toDF("doc_id", "text")
    // the pipeline shape: contamination runs over a FILTERED corpus
    val test = corpus.where(col("doc_id") =!= 4L)
    val cache = Dedup.shingleCache(corpus, "doc_id", "text", 3)
    val direct = Dedup.contamination(train, test, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val viaCache = Dedup
      .contaminationFromSuperset(train, test, "doc_id", "text", cache)
      .orderBy("doc_id").collect().toSeq
    assert(viaCache === direct)
    assert(cache.isCached) // caller-owned, never released by the call
    cache.release()
    // a cache built over a NARROWER corpus than test must refuse
    val narrow = Dedup.shingleCache(corpus.where(col("doc_id") === 1L),
      "doc_id", "text", 3)
    intercept[IllegalArgumentException] {
      Dedup.contaminationFromSuperset(train, test, "doc_id", "text", narrow)
    }
    narrow.release()
    // ...and a cache with the SAME ids but different text (the
    // re-ingested-corpus substitution the id check cannot see) is
    // caught by the content sentinel
    val retext = Dedup.shingleCache(
      corpus.withColumn("text", concat(col("text"), lit(" mutated"))),
      "doc_id", "text", 3)
    intercept[IllegalArgumentException] {
      Dedup.contaminationFromSuperset(train, test, "doc_id", "text", retext)
    }
    retext.release()
  }

  test("contaminationFromSuperset plans ONE shingle pass (train side only); the direct path plans two") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    // the superset path's value: the test side reads the shared cache
    // instead of re-shingling — visible in the optimized plan as one
    // ShinglesExpr (train vocabulary) plus an InMemoryRelation scan,
    // where the direct path carries a ShinglesExpr per side
    def shinglePasses(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.map(p => p.expressions.map(
        _.collect { case s: graft.functions.ShinglesExpr => s }.size).sum).sum
    val train = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely novel words that never appear in train corpus"))
      .toDF("doc_id", "text")
    val direct = Dedup.contamination(train, corpus, "doc_id", "text", 3)
    assert(shinglePasses(direct) === 2)
    val cache = Dedup.shingleCache(corpus, "doc_id", "text", 3)
    val via = Dedup.contaminationFromSuperset(train, corpus, "doc_id", "text", cache)
    assert(shinglePasses(via) === 1)
    assert(via.queryExecution.optimizedPlan
      .collect { case m: InMemoryRelation => m }.nonEmpty)
    cache.release()
  }

  test("prepare with sharedShingles matches prepare without, cache survives") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
    val ev = docs.filter(col("doc_id") < 5)
    val cfg = CorpusPipeline.Config(minQuality = 0.0, defaultRate = 1.0,
      holdoutFrac = 0.2, packBudget = 512)
    val cache = Dedup.shingleCache(docs, "doc_id", "text", 3)
    val withCache = CorpusPipeline.prepare(docs, evalDocs = Some(ev),
      cfg = cfg, sharedShingles = Some(cache))
    assert(cache.isCached)
    cache.release()
    // a cache of the wrong shingle width, or built over a different
    // corpus, is refused up front — not silently composed
    val wrongWidth = Dedup.shingleCache(docs, "doc_id", "text", 4)
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(docs, evalDocs = Some(ev), cfg = cfg,
        sharedShingles = Some(wrongWidth))
    }
    wrongWidth.release()
    val otherCorpus = Dedup.shingleCache(docs.limit(50), "doc_id", "text", 3)
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(docs, evalDocs = Some(ev), cfg = cfg,
        sharedShingles = Some(otherCorpus))
    }
    otherCorpus.release()
    val without = CorpusPipeline.prepare(docs, evalDocs = Some(ev), cfg = cfg)
    assert(withCache.report === without.report)
    assert(withCache.train.exceptAll(without.train).isEmpty &&
      without.train.exceptAll(withCache.train).isEmpty)
    assert(withCache.holdout.exceptAll(without.holdout).isEmpty &&
      without.holdout.exceptAll(withCache.holdout).isEmpty)
  }

  test("StageCounter: fired metrics are observed, never-fired falls back, release deregisters") {
    val before = ObservationBridge.registeredCount(spark)
    val counter = new CorpusPipeline.StageCounter(awaitMillis = 200)
    val fired = counter.stage("fired", spark.range(10).toDF())
    fired.count() // materializes the cache -> the metric fires
    val never = counter.stage("never", spark.range(7).toDF())
    // no action on `never`: its observation cannot fire; counts must
    // pay the bound once then fall back to a correct count()
    val counts = counter.counts.toMap
    assert(counts === Map("fired" -> 10L, "never" -> 7L))
    counter.release()
    // the never-fired observation must not linger in the session's
    // ObservationManager (the r5 listener-accumulation leak)
    assert(ObservationBridge.registeredCount(spark) === before)
  }

  test("incremental exactByKey across appended batches: stable survivors, anti-join shortcut equal") {
    import graft.functions.TextFunctions.fingerprint
    // batch 1: ids 1-6, content B duplicated internally
    val batch1 = Seq((1L, "content A here"), (2L, "content B here"),
      (3L, "content B here"), (4L, "content C here"), (5L, "content D here"),
      (6L, "content A here")).toDF("doc_id", "text")
    // batch 2: higher ids (the surrogate-key contract), duplicating
    // batch-1 content (B, D) and itself (E)
    val batch2 = Seq((11L, "content E here"), (12L, "content B here"),
      (13L, "content E here"), (14L, "content F here"), (15L, "content D here"))
      .toDF("doc_id", "text")

    val s1 = Dedup.exactByKey(batch1, fingerprint(col("text")), "doc_id")
    val s1Ids = s1.select("doc_id").as[Long].collect().toSet
    assert(s1Ids === Set(1L, 2L, 4L, 5L))

    // full recompute over both batches: batch-1 survivors unchanged
    // (min-id can only be claimed by an OLDER row), cross-batch dups
    // (12, 15) gone, new content (11, 14) kept
    val full = Dedup.exactByKey(batch1.unionByName(batch2),
      fingerprint(col("text")), "doc_id")
    val fullIds = full.select("doc_id").as[Long].collect().toSet
    assert(fullIds === Set(1L, 2L, 4L, 5L, 11L, 14L))
    assert(s1Ids.subsetOf(fullIds))

    // the incremental formulation a batch-id warehouse runs — dedup
    // the NEW batch internally, anti-join its content keys against the
    // loaded corpus — must equal the full recompute exactly
    val newSurvivors = Dedup.exactByKey(batch2, fingerprint(col("text")), "doc_id")
      .withColumn("__ck", fingerprint(col("text")))
      .join(s1.select(fingerprint(col("text")).as("__ck")), Seq("__ck"), "left_anti")
      .drop("__ck")
    val incremental = s1.unionByName(newSurvivors)
    assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty)
  }

  test("kMeans with the k-means|| seed separates planted clusters in ONE Lloyd iteration") {
    // same planted fixture as the kMeans spec, but a harder budget:
    // the oversampled seed must land coverage in both clusters so a
    // single full-corpus Lloyd pass suffices (the 100 TB win — fewer
    // corpus passes, same quality floor)
    val vecs = ((0 until 20).map(i => (i.toLong, Array(1.0 + i * 0.001, 0.0))) ++
      (20 until 40).map(i => (i.toLong, Array(0.0, 1.0 + i * 0.001))))
      .toDF("vec_id", "embedding")
    val seed = Similarity.kMeansParallelSeed(vecs, k = 2)
    assert(seed.count() === 2)
    val centroids = Similarity.kMeans(vecs, k = 2, iters = 1, seed = Some(seed))
    val assigned = Similarity.assignCells(vecs, centroids, "vid", "ve", "cell", 1)
    val cellsPerCluster = assigned
      .withColumn("cluster", when(col("vid") < 20, 0).otherwise(1))
      .groupBy("cluster").agg(countDistinct("cell").as("n_cells"))
      .select("n_cells").as[Long].collect()
    assert(cellsPerCluster.toSeq === Seq(1L, 1L))
    // determinism: the seed is a pure function of the corpus
    val seed2 = Similarity.kMeansParallelSeed(vecs, k = 2)
    assert(seed.exceptAll(seed2).isEmpty && seed2.exceptAll(seed).isEmpty)
  }

  test("kMeansParallelSeed survives degenerate corpora: empty, and zero-norm embeddings") {
    // empty corpus: the Σd² aggregate is SQL null — must not NPE, and
    // the seed is necessarily empty (no vectors to return)
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(Similarity.kMeansParallelSeed(empty, k = 3).count() === 0)
    // zero-norm embeddings make NaN cosines; a NaN Σd² used to turn
    // the sampling predicate permanently false — the seed must still
    // come back with min(k, n) vectors via the deterministic top-up
    val degenerate = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.0, 0.0)),
      (3L, Array(1.0, 0.0)), (4L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    assert(Similarity.kMeansParallelSeed(degenerate, k = 3).count() === 3)
    // one zero-norm row among many good vectors must NOT poison the
    // corpus-wide Σd² (NaN is zeroed per row): the seed still spans
    // both planted clusters, so one Lloyd pass separates them
    val mixed = ((0 until 20).map(i => (i.toLong, Array(1.0 + i * 0.001, 0.0))) ++
      (20 until 40).map(i => (i.toLong, Array(0.0, 1.0 + i * 0.001))) :+
      (99L, Array(0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val seed = Similarity.kMeansParallelSeed(mixed, k = 2)
    assert(seed.count() === 2)
    val good = mixed.where(col("vec_id") < 40)
    val centroids = Similarity.kMeans(good, k = 2, iters = 1, seed = Some(seed))
    val cells = Similarity.assignCells(good, centroids, "vid", "ve", "cell", 1)
      .withColumn("cluster", when(col("vid") < 20, 0).otherwise(1))
      .groupBy("cluster").agg(countDistinct("cell").as("n"))
      .select("n").as[Long].collect()
    assert(cells.toSeq === Seq(1L, 1L))
  }

  test("incremental minhashLsh + connectedComponents across appended batches: old pairs persist, old survivors stable") {
    // Bucket membership is a pure function of a doc's own content, so
    // appending a batch can only ADD pairs (never remove old ones),
    // and under monotone ids a cluster holding any batch-1 doc keeps
    // a batch-1 min-id representative. The one documented exception:
    // a NEW doc bridging two distinct old clusters merges them and
    // retires one old survivor — this fixture has no bridge, pinning
    // the stable-survivor contract a batch-id warehouse relies on.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "north south east west upward downward leftward rightward inward outward"
    val c = "one singular document with entirely unshared vocabulary tokens here"
    val d = "red orange yellow green blue indigo violet crimson amber teal"
    val batch1 = Seq((1L, a), (2L, a), (3L, b), (4L, b), (5L, c))
      .toDF("doc_id", "text")
    val batch2 = Seq((11L, a), (12L, d), (13L, d)).toDF("doc_id", "text")
    def nearDupPath(docs: org.apache.spark.sql.DataFrame) = {
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.6)
      val clusters = Dedup.connectedComponents(pairs)
      (pairs.select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet,
        clusters.as[(Long, Long)].collect().toMap,
        Dedup.dedupByClusters(docs, clusters, "doc_id")
          .select("doc_id").as[Long].collect().toSet)
    }
    val (pairs1, clusters1, survivors1) = nearDupPath(batch1)
    assert(pairs1 === Set((1L, 2L), (3L, 4L)))
    assert(survivors1 === Set(1L, 3L, 5L))
    val (pairsFull, clustersFull, survivorsFull) =
      nearDupPath(batch1.unionByName(batch2))
    // old pairs persist verbatim; new pairs only involve appended docs
    assert(pairs1.subsetOf(pairsFull))
    assert((pairsFull -- pairs1).forall { case (x, y) => x > 5L || y > 5L })
    // batch-1 docs keep their batch-1 cluster labels (11 joins 1's
    // cluster; 12/13 form a new one) — clusters were added, not moved
    assert(clusters1.forall { case (id, lbl) => clustersFull(id) == lbl })
    assert(clustersFull(11L) === 1L && clustersFull(12L) === 12L)
    // and the batch-1 survivor set is untouched by the append
    assert(survivorsFull === Set(1L, 3L, 5L, 12L))
    assert((survivorsFull & Set(1L, 2L, 3L, 4L, 5L)) === survivors1)
  }

  test("minhashLshAppend == full recompute minus old-only pairs; old index never re-mined") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "north south east west upward downward leftward rightward inward outward"
    val d = "red orange yellow green blue indigo violet crimson amber teal"
    val batch1 = Seq((1L, a), (2L, a), (3L, b), (4L, b)).toDF("doc_id", "text")
    // 11 joins 1's near-dup group (new×old), 12/13 pair with each
    // other only (new×new), 14 pairs with nothing
    val batch2 = Seq((11L, a), (12L, d), (13L, d),
      (14L, "entirely unshared vocabulary in this appended document here"))
      .toDF("doc_id", "text")
    def mine(docs: org.apache.spark.sql.DataFrame) =
      Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
          numHashes = 16, bands = 8, threshold = 0.6)
        .as[(Long, Long, Double)].collect().toSet
    val old = mine(batch1)
    val full = mine(batch1.unionByName(batch2))
    val idx = Dedup.minhashIndex(batch1, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 8)
    val inc = Dedup.minhashLshAppend(idx, batch2, "text", threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    idx.release()
    // every incremental pair touches the new batch, with verified
    // jaccard identical to the full recompute's
    assert(inc.forall { case (i, j, _) => i > 10L || j > 10L })
    assert(inc === full.filter { case (i, j, _) => i > 10L || j > 10L })
    // and the decomposition a batch-append warehouse runs is exact
    assert(old ++ inc === full)
    // the mismatched-parameter guard: an index built at different
    // LSH parameters must refuse... by construction the params ride
    // the index, so the append can't diverge — assert they're baked
    assert(idx.numHashes === 16 && idx.bands === 8 && idx.shingleSize === 3)

    // cross-session story: the index frames written to storage and
    // read back through the public factory append identically
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val idx2 = Dedup.minhashIndex(batch1, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 8)
    idx2.buckets.write.mode("overwrite").parquet(s"$dir/buckets")
    idx2.shingles.write.mode("overwrite").parquet(s"$dir/shingles")
    idx2.release()
    val readBack = Dedup.minhashIndexFromFrames(
      spark.read.parquet(s"$dir/buckets"), spark.read.parquet(s"$dir/shingles"),
      "doc_id", shingleSize = 3, numHashes = 16, bands = 8)
    val incRb = Dedup.minhashLshAppend(readBack, batch2, "text", threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(incRb === inc)
    // and the factory refuses frames missing the contract columns
    intercept[IllegalArgumentException] {
      Dedup.minhashIndexFromFrames(
        spark.read.parquet(s"$dir/buckets").drop("bucket"),
        spark.read.parquet(s"$dir/shingles"), "doc_id", 3, 16, 8)
    }
  }

  test("LongLongMap matches a reference map under random ops (incl. negative keys)") {
    val rnd = new scala.util.Random(42)
    val m = new LongLongMap(16) // tiny: forces several grows
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    (1 to 20000).foreach { _ =>
      val k = rnd.nextInt(3000).toLong - 1500L
      val v = rnd.nextLong()
      m.put(k, v); ref(k) = v
    }
    assert(m.size === ref.size)
    ref.foreach { case (k, v) => assert(m.getOrDefault(k, v - 1) === v) }
    assert(m.getOrDefault(999999L, -7L) === -7L)
    assert(m.keysIterator.toSeq.sorted === ref.keys.toSeq.sorted)
  }
}
