package graft

import graft.etl.Ids
import graft.functions.{Md5ModExpr, TextFunctions, VectorFunctions}
import graft.operators.Dedup
import graft.ops.{Relational, Scd}
import org.apache.spark.sql.functions._

/** Unit specs for the reusable operator families (SURVEY §2): each
  * pins a semantic the DuckDB oracle can't see in isolation. */
class OperatorSpec extends SparkSpec {

  import spark.implicits._

  test("md5Mod matches the full 128-bit reference semantics") {
    // int(hashlib.md5(b"hello").hexdigest(), 16) % 97 — computed with
    // BigInteger here; a 64-bit truncation would disagree
    val expected = new java.math.BigInteger(1,
      java.security.MessageDigest.getInstance("MD5").digest("hello".getBytes))
      .mod(java.math.BigInteger.valueOf(97)).longValue()
    val got = Seq("hello").toDF("s")
      .select(Ids.md5Mod(col("s"), 97).as("m")).first().getLong(0)
    assert(got === expected)
  }

  test("businessKey format: PREFIX_ + 14 hex chars") {
    val got = Seq("Jessica Myrick").toDF("n")
      .select(Ids.businessKey("CUST", col("n"))).first().getString(0)
    assert(got === "CUST_" + Md5ModExpr.md5Hex("Jessica Myrick").take(14))
    assert(got.length === 19)
  }

  test("cosine expression matches a hand-computed value bit-for-bit") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).first().getDouble(0)
    val dot = 1.0 * 4 + 2.0 * 5 + 3.0 * 6
    val expected = dot / (math.sqrt(1 + 4 + 9.0) * math.sqrt(16 + 25 + 36.0))
    assert(got === expected)
  }

  test("exact dedup keeps the min-id survivor per content key") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByKey(docs, TextFunctions.fingerprint(col("text")), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("simhash: identical docs share signatures, disjoint docs differ") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zig zag zone zero")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text", bits = 48)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(sigs(0)._2 === sigs(1)._2)
    assert(sigs(0)._2 !== sigs(2)._2)
  }

  test("minhashLsh finds planted near-duplicates and only those") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base + " extra"),  // near-dup pair
      (3L, "completely different words with nothing shared at all here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("minhashLsh bucketCap bounds a mass-duplicated corpus") {
    // 1000 byte-identical docs: every band bucket holds all 1000, so
    // uncapped candidate generation would be ~500k pairs x 16 bands.
    // With the cap the degenerate buckets drop (their signal belongs
    // to exactByKey) while an organic near-dup pair still surfaces.
    val boiler = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((1L to 1000L).map(i => (i, boiler)) ++ Seq(
      (2001L, "some organic text that is nearly unique in this corpus body"),
      (2002L, "some organic text that is nearly unique in this corpus body too")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5,
      bucketCap = 32)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((2001L, 2002L)))
    // and the mass-dup group is exactly what the exact pre-pass collapses
    val survivors = Dedup.exactByKey(docs,
      TextFunctions.fingerprint(col("text")), "doc_id").count()
    assert(survivors === 3L)
  }

  test("ngramJaccard indexes every doc: exact dups of boilerplate still pair") {
    // 30 identical docs + dfCap 10: every shingle has df=30 > cap, so
    // without the rarest-shingle fallback none of them would ever be
    // candidates despite being byte-identical (jaccard 1.0).
    val boiler = "standard header text repeated across every page of the site"
    val docs = (1L to 30L).map(i => (i, boiler)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5, dfCap = 10)
    assert(pairs.count() === (30L * 29L) / 2) // all true pairs found
    assert(pairs.agg(min(col("jaccard"))).first().getDouble(0) === 1.0)
  }

  test("connectedComponents chains pairs into clusters; survivor selection keeps one per cluster") {
    // chain 1-2, 2-3, 3-4 must form ONE cluster (per-pair dedup would
    // over-delete), plus a separate pair and a bridge-merged cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (11L, 21L))
      .toDF("doc_id_1", "doc_id_2")
    val cc = Dedup.connectedComponents(pairs)
    val byCluster = cc.groupBy("cluster_id").agg(collect_set("id").as("ids"))
      .as[(Long, Seq[Long])].collect().map { case (c, ids) => c -> ids.sorted }.toMap
    assert(byCluster === Map(1L -> Seq(1L, 2L, 3L, 4L), 10L -> Seq(10L, 11L, 20L, 21L)))

    // survivors: min id per cluster; docs in no pair pass through
    val docs = (1L to 25L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val kept = Dedup.dedupByClusters(docs, cc, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val expected = (1L to 25L).filterNot(Seq(2L, 3L, 4L, 11L, 20L, 21L).contains)
    assert(kept.toSeq === expected)
  }

  test("clusterAwareSplit: cluster members co-locate, singletons match hashSplit, no leakage") {
    import graft.operators.{Dedup, Sampling}
    // chain 1-2-3 plus pair 10-11; 4..9 unclustered
    val docs = (1L to 11L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_id_1", "doc_id_2")
    val split = Dedup.clusterAwareSplit(docs, "doc_id", pairs, holdoutFrac = 0.5)
    val rows = split.select("doc_id", "split_key", "side")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // every cluster member carries the min-id label and ONE side
    assert(Seq(1L, 2L, 3L).map(rows(_)._1).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).distinct.size === 1)
    assert(Seq(10L, 11L).map(rows(_)._1).distinct === Seq(10L))
    assert(Seq(10L, 11L).map(rows(_)._2).distinct.size === 1)
    // no cluster straddles the split (the leakage property, directly)
    assert(split.groupBy("split_key").agg(countDistinct("side").as("k"))
      .where(col("k") > 1).isEmpty)
    // unclustered docs degrade to the per-document hash split exactly
    val single = (4L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val (tr, ho) = Sampling.hashSplit(single, col("doc_id").cast("string"), 0.5)
    val expTrain = tr.select("doc_id").as[Long].collect().toSet
    val expHold = ho.select("doc_id").as[Long].collect().toSet
    (4L to 9L).foreach { i =>
      assert(rows(i)._1 === i)
      assert(rows(i)._2 === (if (expHold(i)) "holdout" else "train"))
      assert(expTrain(i) !== expHold(i))
    }
  }

  test("connectedComponents equals union-find on random graphs; chains converge (pointer jump)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // only nodes that appear in an edge are labeled (CC's contract)
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      touched.map(x => x -> find(x)).toMap
    }

    val graphGen = for {
      n <- Gen.choose(4, 24)
      m <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1, n); b <- Gen.choose(1, n) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n, edges.distinct)

    val cases = (1 to 5).flatMap(i => graphGen(Gen.Parameters.default, Seed(i.toLong)))
      // worst case for plain propagation: one long chain — needs
      // pointer jumping to converge inside the round budget
      .prepended((30, (1L until 30L).map(i => (i, i + 1))))
    cases.foreach { case (n, edges) =>
      // default gate → driver fast path; driverMaxEdges = 0 forces the
      // distributed loop — BOTH must equal the reference union-find,
      // pinning the two execution paths to identical labels
      val got = Dedup.connectedComponents(
          edges.toDF("doc_id_1", "doc_id_2"))
        .as[(Long, Long)].collect().toMap
      assert(got === unionFind(n, edges), s"graph n=$n edges=$edges")
      val gotLoop = Dedup.connectedComponents(
          edges.toDF("doc_id_1", "doc_id_2"), driverMaxEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(gotLoop === unionFind(n, edges), s"loop path: n=$n edges=$edges")
    }
  }

  test("connectedComponents stitches components across contraction partitions") {
    // a 400-node chain with rowsPerPartition forced low: contraction
    // runs on several hash-sharded partitions, so no partition sees
    // the whole component and emits only FRAGMENT stars — the global
    // loop must merge them across partition boundaries (the path the
    // tiny single-partition fixtures never exercise)
    val edges = (1L until 400L).map(i => (i, i + 1)).toDF("doc_id_1", "doc_id_2")
    // driverMaxEdges = 0: the point of this test is the DISTRIBUTED
    // path — without it the 400-edge graph would take the driver gate
    val cc = Dedup.connectedComponents(edges, rowsPerPartition = 100,
      driverMaxEdges = 0)
    assert(cc.count() === 400L)
    assert(cc.where(col("cluster_id") =!= 1L).isEmpty)
  }

  test("asofJoin: latest prior match per key, boundary-equal matches, no-prior is null") {
    import graft.ops.AsOf
    val trades = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 35L), (4L, "B", 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 10L, 1.0), ("A", 15L, 2.0), ("A", 30L, 3.0), ("B", 50L, 9.0))
      .toDF("sym", "qt", "px")
    val out = AsOf.asofJoin(trades, quotes, Seq("sym"), col("t"), col("qt"),
        Seq("qt", "px"))
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, Some(1.0)),  // boundary-equal: quote at t=10 matches trade at t=10
      (2L, Some(2.0)),  // latest prior (15), not first (10), not future (30)
      (3L, Some(3.0)),
      (4L, None)))      // B's only quote is in the future → no match
  }

  test("stats sketches stay inside their error bounds vs exact answers") {
    import graft.operators.Stats
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val sketch = Stats.sketchProfile(li, Seq(col("l_returnflag")),
        col("l_orderkey"), col("l_extendedprice"), Seq(0.5, 0.9), rsd = 0.02)
      .as[(String, Long, Long, Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("d"),
        percentile(col("l_extendedprice"), typedLit(Seq(0.5, 0.9))).as("qs"))
      .as[(String, Long, Seq[Double])].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (flag, d, qs) =>
      val (_, _, approxD, approxQs) = sketch(flag)
      // HLL++ at rsd=0.02: allow 4 sigma
      assert(math.abs(approxD - d).toDouble / d < 0.08, s"$flag distinct $approxD vs $d")
      // approx_percentile returns a REAL element near the requested
      // rank; with acc=10000 it lands within a tight value band here
      qs.zip(approxQs).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.05, s"$flag quantile $a vs $e") }
    }
  }

  test("mixtureSample rates per stratum; contamination detects planted overlap") {
    import graft.operators.Sampling
    val df = (1L to 9000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val mixed = Sampling.mixtureSample(df, col("src"), col("id"),
      Map("s0" -> 1.0, "s1" -> 0.3)) // s2 defaults to 0
    val bySrc = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("s0") === 3000L)               // rate 1.0 keeps everything
    assert(bySrc("s1") > 600 && bySrc("s1") < 1200) // ~0.3 of 3000
    assert(!bySrc.contains("s2"))               // default rate 0 drops all
    // membership is the hashSample of each stratum (same draws)
    val s1Only = Sampling.hashSample(df.where(col("src") === "s1"), col("id"), 0.3)
    assert(mixed.where(col("src") === "s1").exceptAll(s1Only).isEmpty)

    // contamination: test doc 1 copies train text (100%), doc 2 is novel (0%)
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val test = Seq((1L, "alpha beta gamma delta"),
      (2L, "one two three four five")).toDF("doc_id", "text")
    val cont = Dedup.contamination(train, test, "doc_id", "text", shingleSize = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(cont(0) === ((1L, 2L, 2L, 100.0)))
    assert(cont(1) === ((2L, 3L, 0L, 0.0)))
    // the largeTrain audit orientation (test-vocabulary prune before
    // any train-wide aggregation) must produce identical values
    val pruned = Dedup.contamination(train, test, "doc_id", "text",
        shingleSize = 3, largeTrain = true)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(pruned.toSeq === cont.toSeq)
  }

  test("temperatureMixture: alpha=1 is natural rates, alpha<1 flattens, clip keeps whole stratum") {
    import graft.operators.Sampling
    // skewed strata: 'a' 500 rows, 'b' 4500 rows
    val df = (1L to 5000L).map(i => (i, if (i <= 500) "a" else "b"))
      .toDF("id", "src")
    // alpha = 1: every stratum keeps exactly frac (natural mixing)
    val (nat, natRates) = Sampling.temperatureMixture(
      df, col("src"), col("id"), alpha = 1.0, frac = 0.3)
    assert(natRates === Map("a" -> 0.3, "b" -> 0.3))
    assert(nat.exceptAll(Sampling.mixtureSample(df, col("src"), col("id"),
      natRates)).isEmpty)
    // alpha = 0.5: hand-computed rates — w_a=sqrt(500), w_b=sqrt(4500),
    // rate_s = min(1, frac*total*w_s/(sumW*n_s))
    val (flat, rates) = Sampling.temperatureMixture(
      df, col("src"), col("id"), alpha = 0.5, frac = 0.3)
    val (wa, wb) = (math.sqrt(500.0), math.sqrt(4500.0))
    val sumW = wa + wb
    assert(rates("a") === math.min(1.0, 0.3 * 5000.0 * wa / (sumW * 500.0)))
    assert(rates("b") === math.min(1.0, 0.3 * 5000.0 * wb / (sumW * 4500.0)))
    // flattening: the small stratum's rate rises above natural, the
    // big one's falls below
    assert(rates("a") > 0.3 && rates("b") < 0.3)
    assert(flat.count() > 0)
    // clip: with frac near 1, the small stratum's flattened share
    // exceeds its size — rate pins at 1.0 and the stratum is whole
    val (whole, clipRates) = Sampling.temperatureMixture(
      df, col("src"), col("id"), alpha = 0.5, frac = 0.9)
    assert(clipRates("a") === 1.0)
    assert(whole.where(col("src") === "a").count() === 500L)
  }

  test("repeatByRate: integer rates copy exactly, fractional rates match the mixtureSample draw") {
    import graft.operators.Sampling
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "up" else "down"))
      .toDF("id", "src")
    val out = Sampling.repeatByRate(df, col("src"), col("id"),
      Map("up" -> 3.0, "down" -> 0.5), defaultRate = 0.0)
    // rate 3.0: every row exactly three copies, epochs 1..3
    val up = out.where(col("src") === "up")
    assert(up.count() === 3000L)
    assert(up.groupBy("id").agg(collect_set("epoch").as("e"))
      .where(size(col("e")) =!= 3).isEmpty)
    // rate 0.5 (below 1): identical membership to mixtureSample at 0.5,
    // single copy each
    val down = out.where(col("src") === "down")
    val expected = Sampling.mixtureSample(df.where(col("src") === "down"),
      col("src"), col("id"), Map("down" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(down.select("id").as[Long].collect().toSet === expected)
    assert(down.groupBy("id").count().where(col("count") =!= 1).isEmpty)
    // rate 2.5: multiplicity is 2 or 3, mean tracks 2.5
    val mid = Sampling.repeatByRate(df.where(col("src") === "up"), col("src"),
      col("id"), Map("up" -> 2.5))
    val perDoc = mid.groupBy("id").count().select("count").as[Long].collect()
    assert(perDoc.forall(c => c == 2L || c == 3L))
    val mean = perDoc.sum.toDouble / perDoc.length
    assert(mean > 2.3 && mean < 2.7)
    // defaultRate 0: strata outside the map vanish
    assert(Sampling.repeatByRate(df, col("src"), col("id"),
      Map("up" -> 1.0), defaultRate = 0.0)
      .where(col("src") === "down").isEmpty)
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, single-char words carry none") {
    import graft.operators.Tokenizer
    // 'abab' freq 2 → per occurrence pairs ab,ba,ab; 'cd' freq 1; 'x' dropped
    val docs = Seq((1L, "abab cd"), (2L, "abab x")).toDF("doc_id", "text")
    val got = Tokenizer.bpePairCounts(docs, "text")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("a", "b") -> 4L, ("b", "a") -> 2L, ("c", "d") -> 1L))
  }

  test("unigramLm/lmScore: hand-computed probabilities, tf weighting, OOV floor") {
    import graft.operators.LangModel
    // corpus: 10 tokens total — a:5, b:3, c:2
    val train = Seq((1L, "a a a b b"), (2L, "a a b c c")).toDF("doc_id", "text")
    val lm = LangModel.unigramLm(train, "text")
    val probs = lm.select("token", "log_p").as[(String, Double)].collect().toMap
    assert(probs("a") === math.log(5.0 / 10.0))
    assert(probs("b") === math.log(3.0 / 10.0))
    assert(probs("c") === math.log(2.0 / 10.0))
    // score doc 1 by hand: (3·ln.5 + 2·ln.3)/5
    val scores = LangModel.lmScore(train, "doc_id", "text", lm)
      .select("doc_id", "n_tokens", "avg_logp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(scores(1L)._1 === 5L)
    // scores are exact tf-weighted means of NANO-quantized log-probs
    // (width-independence contract), so hand math agrees to the 1e-9 grain
    assert(math.abs(scores(1L)._2 - (3 * math.log(0.5) + 2 * math.log(0.3)) / 5) < 1e-9)
    // OOV: unseen token takes the floor, not a null/crash
    val oov = LangModel.lmScore(Seq((9L, "a zzz")).toDF("doc_id", "text"),
        "doc_id", "text", lm, oovLogProb = math.log(1e-10))
      .select("avg_logp").as[Double].head()
    assert(math.abs(oov - (math.log(0.5) + math.log(1e-10)) / 2) < 1e-9)
    // quality ordering: all-rare-token doc scores below all-common-token doc
    val cmp = LangModel.lmScore(
        Seq((10L, "a a a a"), (11L, "c c c c")).toDF("doc_id", "text"),
        "doc_id", "text", lm)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(cmp(10L) > cmp(11L))
  }

  test("tfidf: corpus-wide terms rank below distinctive ones; values match by hand") {
    import graft.operators.Tfidf
    // "common" is in all 3 docs (df=3); each doc has one distinctive term
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").as[(Long, Int, String, Double)].collect()
    // doc 1: alpha (tf=2, df=1) ranks above common (tf=1, df=3)
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq("alpha", "common"))
    // hand-computed smoothed tf-idf: 2 * (ln(4/2) + 1), 1 * (ln(4/4) + 1)
    val alpha = out.find(r => r._1 == 1L && r._3 == "alpha").get._4
    assert(math.abs(alpha - 2 * (math.log(2.0) + 1)) < 1e-6)
    val common = out.find(r => r._1 == 1L && r._3 == "common").get._4
    assert(math.abs(common - 1.0) < 1e-6)
  }

  test("sampling: hash split is disjoint+exhaustive+stable; stratified limit is map-side") {
    import graft.operators.Sampling
    val df = (1L to 10000L).map(i => (i, s"grp_${i % 7}", i * 0.5)).toDF("id", "grp", "v")

    // split: every row on exactly one side, membership key-determined
    val (train, hold) = Sampling.hashSplit(df, col("id"), 0.2)
    val (nTrain, nHold) = (train.count(), hold.count())
    assert(nTrain + nHold === 10000L)
    assert(train.join(hold, "id").isEmpty)
    // rate lands near the target (md5 is uniform)
    assert(nHold > 1500 && nHold < 2500, s"holdout $nHold")
    // stability: re-running selects the identical member set
    val (train2, _) = Sampling.hashSplit(df, col("id"), 0.2)
    assert(train.exceptAll(train2).isEmpty)
    // growing the corpus never flips an existing row's side
    val (bigTrain, _) = Sampling.hashSplit(
      df.unionByName((10001L to 12000L).map(i => (i, "new", 0.0)).toDF("id", "grp", "v")),
      col("id"), 0.2)
    assert(train.join(bigTrain, Seq("id"), "left_anti").isEmpty)

    // stratified: exact n per stratum, deterministic, map-side-limited
    val strat = Sampling.stratifiedSample(df, col("grp"), col("id"), n = 3)
    val perGroup = strat.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(perGroup.size === 7 && perGroup.values.forall(_ === 3L))
    val plan = strat.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("packing: exactly-once, budget-capped, oversized singletons, deterministic") {
    import graft.operators.Packing
    // sizes from 1..400 plus three oversized docs (budget 512)
    val docs = ((1L to 300L).map(i => (i, (i % 400) + 1)) ++
      Seq((900L, 5000L), (901L, 513L), (902L, 9999L))).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 512)

    // every doc lands in exactly one pack
    assert(packed.count() === 303L)
    assert(packed.select("doc_id").distinct().count() === 303L)

    val packs = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"),
        max("n_tokens").as("biggest"))
    // within budget unless the pack is a single oversized doc
    assert(packs.where(col("tok") > 512 && col("n") > 1).isEmpty)
    // oversized docs are alone in their packs
    val over = packed.where(col("n_tokens") > 512).select("pack_id")
    assert(packs.join(over, "pack_id").where(col("n") =!= 1).isEmpty)
    // greedy fill actually packs (not one doc per pack)
    assert(packs.where(col("n") > 1).count() > 0)
    // deterministic re-run
    val again = Packing.packSequences(docs, "doc_id", "n_tokens", budget = 512)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
    // ...and independent of the INPUT partitioning: pinned md5-mod
    // buckets (not sampled range boundaries) decide membership, so a
    // differently-sharded same corpus packs identically bit-for-bit
    val resharded = Packing.packSequences(docs.repartition(7), "doc_id",
      "n_tokens", budget = 512)
    assert(packed.exceptAll(resharded).isEmpty && resharded.exceptAll(packed).isEmpty)
  }

  test("chunking: window bounds, overlap, totality, reconstruction, degenerate docs") {
    import graft.operators.Packing
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(100)), // 100 tokens → windows [1,10],[9,18],...,
      (2L, words(10)),  // exactly one window
      (3L, words(3)),   // shorter than the window
      (4L, ""),         // empty text still yields one chunk
      (5L, words(11)),  // one token past the window → 2 chunks
      (6L, null.asInstanceOf[String]) // NULL text: total, not dropped
    ).toDF("doc_id", "text")
    val chunked = Packing.chunkDocuments(docs, "text",
      maxTokens = 10, overlap = 2).persist()

    // chunk counts: 1 + ceil((n - max) / step) for long docs, 1
    // otherwise — including the empty and NULL degenerate docs
    val counts = chunked.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 13L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 1L))

    // every chunk except a doc's last has exactly maxTokens tokens,
    // and token counts agree with the rendered text
    val bad = chunked
      .withColumn("m", max(col("chunk_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .where(col("chunk_id") < col("m") && col("n_tokens") =!= 10)
    assert(bad.isEmpty)
    assert(chunked.where(
      size(graft.functions.TextFunctions.tokens(col("chunk_text")))
        =!= col("n_tokens")).isEmpty)

    // overlap: consecutive chunks of doc 1 share exactly 2 tokens —
    // dropping the first `overlap` tokens of every non-first chunk
    // and concatenating reconstructs the original token stream
    val rebuilt = chunked.where(col("doc_id") === 1L)
      .select("chunk_id", "chunk_text")
      .orderBy("chunk_id").as[(Long, String)].collect()
      .map { case (cid, txt) =>
        val ts = txt.split(" ").toSeq
        if (cid == 0L) ts else ts.drop(2)
      }.reduce(_ ++ _)
    assert(rebuilt === (1 to 100).map(i => s"w$i"))

    // empty doc: one empty chunk, token convention size(split("")) = 1
    val empty = chunked.where(col("doc_id") === 4L)
      .select("chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(empty === Seq((0L, 1L, "")))

    // zero-overlap chunking partitions the tokens exactly
    val noOverlap = Packing.chunkDocuments(docs.where(col("doc_id") === 1L),
        "text", maxTokens = 10)
      .agg(sum("n_tokens")).as[Long].head()
    assert(noOverlap === 100L)

    // guards: bad window config, column collisions
    intercept[IllegalArgumentException](
      Packing.chunkDocuments(docs, "text", 10, 10))
    intercept[IllegalArgumentException](
      Packing.chunkDocuments(chunked, "chunk_text", 10, 2))
    chunked.unpersist(blocking = false)
  }

  test("chunkDocuments plans zero exchanges over a real scan (pure map pass)") {
    import graft.operators.Packing
    // parquet-backed input so the assertion covers the scan-based
    // plan, not a trivial LocalTableScan
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Packing.chunkDocuments(docs, "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("repeatByRate plans zero exchanges over a real scan (pure map pass)") {
    import graft.operators.Sampling
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Sampling.repeatByRate(docs,
        when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")),
        col("doc_id"), Map("a" -> 2.5, "b" -> 0.4))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("corpus pipeline composes: gates monotone, dups+contamination removed, packs capped") {
    import graft.operators.CorpusPipeline
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dups = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 50000)
    val res = CorpusPipeline.prepare(docs.unionByName(dups),
      evalDocs = Some(docs.filter(col("doc_id") < 5)),
      cfg = CorpusPipeline.Config(minQuality = 0.0, defaultRate = 1.0,
        holdoutFrac = 0.2, packBudget = 512))

    val counts = res.report.toMap
    // every gate only removes rows
    val order = Seq("input", "quality_filter", "exact_dedup",
      "near_dup_cluster_dedup", "decontaminate", "mixture_sample")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(counts(b) <= counts(a), s"$b > $a in $counts") }
    // split partitions the mixture exactly
    assert(counts("train") + counts("holdout") === counts("mixture_sample"))

    val kept = res.train.select("doc_id").as[Long].collect().toSet ++
      res.holdout.select("doc_id").as[Long].collect().toSet
    // planted exact dups lost to their lower-id originals
    assert(!kept.exists(_ >= 50000L))
    // eval-overlapping docs are decontaminated away
    assert(!kept.exists(_ < 5L))
    // packs respect the budget unless a single doc exceeds it
    val packs = res.train.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
    assert(packs.where(col("tok") > 512 && col("n") > 1).isEmpty)
  }

  test("snapshotDiff classifies I/U/D with null-safe compares; unchanged rows drop") {
    val oldDf = Seq((1, Some("a"), 1.0), (2, Some("b"), 2.0), (3, None, 3.0),
      (4, Some("d"), 4.0)).toDF("k", "v", "x")
    val newDf = Seq((1, Some("a"), 1.0),          // unchanged → absent
      (2, Option.empty[String], 2.0),             // value→NULL is a change
      (3, Some("c"), 3.0),                        // NULL→value is a change
      (5, Some("e"), 5.0))                        // inserted; 4 deleted
      .toDF("k", "v", "x")
    val ops = Relational.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v", "x"))
      .as[(Int, String)].collect().toMap
    assert(ops === Map(2 -> "U", 3 -> "U", 4 -> "D", 5 -> "I"))

    // a genuinely-NULL key classifies by PRESENCE, not key-null tests:
    // a NULL-key row present only in old is a deletion, not an insert
    val o2 = Seq((Option("a"), 1.0), (Option.empty[String], 2.0)).toDF("k", "x")
    val n2 = Seq((Option("a"), 1.0)).toDF("k", "x")
    val ops2 = Relational.snapshotDiff(o2, n2, Seq("k"), Seq("x"))
      .as[(Option[String], String)].collect().toMap
    assert(ops2 === Map(Option.empty[String] -> "D"))
  }

  test("zScoreOutliers: no forced broadcast — high-cardinality groups stay correct") {
    import graft.operators.Quality
    // one row per group (worst cardinality): stats side is as wide as
    // the input — a forced broadcast would pin it to the driver
    val df = (1L to 2000L).map(i => (i, i.toDouble)).toDF("k", "v")
    val out = Quality.zScoreOutliers(df, Seq("k"), "v")
    // no ResolvedHint/UnresolvedHint survives in the plan — the join
    // strategy is left to size estimates + AQE
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, UnresolvedHint}
    assert(!out.queryExecution.analyzed.exists(p =>
      p.isInstanceOf[ResolvedHint] || p.isInstanceOf[UnresolvedHint]))
    // every row returns, 1-row groups flagged false
    assert(out.count() === 2000L)
    assert(out.where(col("is_outlier")).isEmpty)
  }

  test("zScoreOutliers keeps NULL-group rows and flags 1-row groups false") {
    import graft.operators.Quality
    val df = Seq((Option("g1"), 1.0), (Option("g1"), 1.1), (Option("g1"), 0.9),
      (Option("g1"), 50.0),                      // the outlier
      (Option("lone"), 7.0),                     // 1-row group: stddev NULL
      (Option.empty[String], 3.0))               // NULL group key
      .toDF("g", "v")
    val out = Quality.zScoreOutliers(df, Seq("g"), "v", sigma = 1.1)
    assert(out.count() === 6)                    // nothing dropped
    val flagged = out.where(col("is_outlier")).select("v").as[Double].collect()
    assert(flagged.toSeq === Seq(50.0))
    // flag is never NULL (where(!is_outlier) must keep the rest)
    assert(out.where(!col("is_outlier")).count() === 5)
  }

  test("mergeType1: matched rows replaced, unmatched kept, new inserted") {
    val tgt = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val src = Seq((1, "new"), (3, "ins")).toDF("k", "v")
    val out = Relational.mergeType1(tgt, src, Seq("k"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, "new"), (2, "keep"), (3, "ins")))
  }

  test("Scd.applyChanges: change -> expire + version, same -> untouched") {
    val dim = Scd.initial(Seq((1, "a"), (2, "b")).toDF("k", "attr"))
    val updates = Seq((1, "a2"), (2, "b"), (3, "c")).toDF("k", "attr")
    val out = Scd.applyChanges(dim, updates, Seq("k"), Seq("attr"), "2026-08-12")
    assert(out.count() === 4) // k1 v1 expired + k1 v2 + k2 v1 + k3 v1
    val k1 = out.where(col("k") === 1).orderBy("version")
      .select("attr", "is_current", "version").as[(String, Boolean, Long)].collect()
    assert(k1.toSeq === Seq(("a", false, 1L), ("a2", true, 2L)))
    val k2 = out.where(col("k") === 2).first()
    assert(k2.getAs[Boolean]("is_current") && k2.getAs[Long]("version") === 1L)
    assert(out.where(col("k") === 3 && col("version") === 1 && col("is_current"))
      .count() === 1)
  }

  test("mode per group pins the declared tie-break: count desc, value asc") {
    val df = Seq((1, "b"), (1, "b"), (1, "a"), (1, "c"), (1, "c")).toDF("g", "v")
    val m = Relational.modePerGroup(df, Seq("g"), "v", "mode")
      .select("mode").first().getString(0)
    assert(m === "b") // b and c tie at 2; value asc picks b
  }

  test("simhashNearDupPairs: full recall at hamming<=k via pigeonhole bands") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical → hamming 0
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .simhashNearDupPairs(docs, "doc_id", "text", bits = 48, maxHamming = 3)
      .select("doc_id_1", "doc_id_2", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("PQ encode is total and deterministic; planted clusters retrieved exactly") {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val cb = Similarity.pqCodebooks(emb, m = 8, dim = 64, step = 3)
    val enc = Similarity.pqEncode(emb, cb, m = 8, dim = 64)
    // every vector gets exactly one code per subspace
    assert(enc.count() === n * 8)
    assert(enc.groupBy("nid").count().where(col("count") =!= 8).isEmpty)
    // deterministic re-encode
    val enc2 = Similarity.pqEncode(emb, cb, m = 8, dim = 64)
    assert(enc.exceptAll(enc2).isEmpty)

    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(enc, cb, queries, m = 8, dim = 64, k = 5)
    assert(pq.groupBy("qid").count().where(col("count") =!= 5).isEmpty)
    // NOTE deliberately no recall floor against this corpus: the
    // testdata embeddings are ~uniform random, where 64-d pairwise
    // distances concentrate and NO quantized ranking beats chance —
    // recall is asserted on planted structure below instead.

    // planted-cluster recovery: 20 well-separated bases, each with two
    // tight noisy copies; a further noisy query must retrieve exactly
    // its own cluster — quantization error is tiny vs the separation
    val rnd = new scala.util.Random(42)
    def base(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 10 - 5).toFloat)
    def near(v: Array[Float]): Array[Float] = v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    val bases = (0 until 20).map(i => i.toLong -> base()).toMap
    val corpus = (bases.toSeq ++
      bases.toSeq.map { case (i, v) => (100 + i) -> near(v) } ++
      bases.toSeq.map { case (i, v) => (200 + i) -> near(v) })
      .toDF("vec_id", "embedding")
    val pcb = Similarity.pqCodebooks(corpus, m = 8, dim = 64, step = 3)
    val penc = Similarity.pqEncode(corpus, pcb, m = 8, dim = 64)
    val pqueries = Seq(900L -> near(bases(3L)), 901L -> near(bases(7L)),
      902L -> near(bases(15L))).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(penc, pcb, pqueries, m = 8, dim = 64, k = 3)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(top(900L) === Set(3L, 103L, 203L))
    assert(top(901L) === Set(7L, 107L, 207L))
    assert(top(902L) === Set(15L, 115L, 215L))

    // recallAtK: exact-vs-exact is the 1.0 sanity bound; PQ on the
    // planted clusters must meet a full-recall floor at k=3 (its top-3
    // sets equal the exact sets above) — the metric a user tunes m /
    // nProbe against
    val exact = Similarity.bruteForceTopKL2(corpus, pqueries, k = 3)
    val self = Similarity.recallAtK(exact, exact, k = 3)
      .select("recall").as[Double].collect()
    assert(self.forall(_ === 1.0))
    val ptop = Similarity.pqTopK(penc, pcb, pqueries, m = 8, dim = 64, k = 3)
    val rec = Similarity.recallAtK(ptop, exact, k = 3)
      .select("recall").as[Double].collect()
    assert(rec.length === 3 && rec.forall(_ === 1.0),
      s"planted-cluster PQ recall fell below 1.0: ${rec.toSeq}")
  }

  test("kMeans centroids separate two planted clusters") {
    import graft.operators.Similarity
    val vecs = ((0 until 20).map(i => (i.toLong, Array(1.0 + i * 0.001, 0.0))) ++
      (20 until 40).map(i => (i.toLong, Array(0.0, 1.0 + i * 0.001))))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.kMeans(vecs, k = 2, iters = 3)
    assert(centroids.count() === 2)
    val assigned = Similarity.assignCells(vecs, centroids, "vid", "ve", "cell", 1)
    // each planted cluster maps to exactly one cell
    val cellsPerCluster = assigned
      .withColumn("cluster", when(col("vid") < 20, 0).otherwise(1))
      .groupBy("cluster").agg(countDistinct("cell").as("n_cells"))
      .select("n_cells").as[Long].collect()
    assert(cellsPerCluster.toSeq === Seq(1L, 1L))
  }

  test("staging store: F13 branch order — southwest is West Coast, never South") {
    val ods = Seq(("S1", "X Store", "c", "s", "z", "Southwest"),
      ("S2", "Y Store", "c", "s", "z", "South"))
      .toDF("store_id", "store_name", "city", "state", "zip_code", "region")
      .withColumn("location", lit(null).cast("string"))
    val out = graft.etl.StagingLayer.store(ods, graft.etl.RunContext("2026-08-12"))
      .select("region", "market").as[(String, String)].collect().toMap
    assert(out("Southwest") === "West Coast") // claimed before South can see it
    assert(out("South") === "South")
  }

  test("staging inventory: F18 ladder order — Low Stock tested before Below Minimum") {
    // stock=8 < reorder=9 AND < min=20: must be Low Stock, not Below Minimum
    val date = graft.etl.StagingLayer.date(
      Seq((20260801, java.sql.Date.valueOf("2026-08-01"), "Saturday", 1, 8,
        "August", 3, 2026, false)).toDF("date_id", "full_date", "day_of_week",
        "day_of_month", "month", "month_name", "quarter", "year", "is_holiday"),
      graft.etl.RunContext("2026-08-12"))
    val prod = Seq((1, "P1")).toDF("product_key", "product_id")
    val store = Seq((1, "S1")).toDF("store_key", "store_id")
    val inv = Seq(
      ("I1", "P1", "S1", java.sql.Date.valueOf("2026-08-01"), 8, 20, 45, 9),
      ("I2", "P1", "S1", java.sql.Date.valueOf("2026-08-01"), 8, 20, 45, 5))
      .toDF("inventory_id", "product_id", "store_id", "inventory_date",
        "stock_level", "min_stock_level", "max_stock_level", "reorder_point")
      .withColumn("last_restock_date", col("inventory_date"))
    val out = graft.etl.StagingLayer.inventory(inv, date, prod, store,
      graft.etl.RunContext("2026-08-12"))
      .select("inventory_id", "stock_status").as[(String, String)].collect().toMap
    assert(out("I1") === "Low Stock")      // 8 < reorder 9 wins first
    assert(out("I2") === "Below Minimum")  // 8 >= reorder 5, then 8 < min 20
  }

  test("saltedJoin matches the plain join on skewed data, inner and left") {
    // 90% of rows share one hot key
    val large = (1 to 200).map(i => (if (i <= 180) 1 else i, s"v$i")).toDF("k", "v")
    val small = Seq((1, "one"), (190, "one-ninety"), (999, "unmatched")).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = large.join(small, Seq("k"), jt)
      val salted = Relational.saltedJoin(large, small, Seq("k"), salts = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
  }

  test("partitioned warehouse writes prune at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val wh = new graft.etl.Warehouse(spark, dir)
    val facts = (1 to 1000).map(i => (i.toLong, 20260801 + i % 10, i * 1.5))
      .toDF("id", "date_key", "amount")
    wh.writePartitioned("fact_sales", facts, Seq("date_key"))
    val filtered = wh.read("fact_sales").where(col("date_key") === 20260803)
    assert(filtered.count() === 100)
    // the date predicate must be a partition filter on the scan, not a data filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("date_key"), plan.take(500))
  }

  test("IVF store: probing a cell-partitioned store prunes to the probed cells") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val wh = new graft.etl.Warehouse(spark, dir)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.sampleCentroids(emb, 50)
    val assigned = Similarity.assignCells(emb, centroids, "nid", "ne", "cell", 1)
    wh.writePartitioned("ivf_cells", assigned, Seq("cell"))
    val queries = emb.filter(col("vec_id") < 10)

    val fromStore = Similarity.ivfTopKFromStore(wh.read("ivf_cells"),
      queries, centroids, k = 5, nProbe = 3)
    // same answer as probing the in-memory assignment
    val direct = Similarity.ivfTopK(assigned, queries, centroids, k = 5, nProbe = 3)
    assert(fromStore.count() === direct.count())
    assert(fromStore.exceptAll(direct).isEmpty && direct.exceptAll(fromStore).isEmpty)
    // the probed-cell IN-list must reach the store scan as a partition
    // filter — planning-time directory pruning, not a post-scan filter
    val plan = fromStore.queryExecution.executedPlan.toString
    // several scans appear in the plan (queries/centroids have empty
    // PartitionFilters); the STORE scan must carry the cell IN-list
    val pf = plan.split("PartitionFilters: \\[").toSeq
      .map(_.takeWhile(_ != ']')).filter(_.nonEmpty)
    assert(pf.exists(f => f.contains("cell") && f.contains("IN (")),
      s"no cell partition filter in: $pf")
  }

  test("warehouse swap is crash-safe: a stranded __old still serves reads") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_swap_").toString
    val wh = new graft.etl.Warehouse(spark, dir)
    wh.write("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // simulate a crash between the two swap renames: replacement parked
    // at __tmp, live dir already moved aside to __old
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((3, "c")).toDF("id", "v").write.parquet(dir + "/t.__tmp")
    assert(fs.rename(new Path(dir, "t"), new Path(dir, "t.__old")))
    // reads recover and keep serving the last committed state
    assert(wh.exists("t"))
    assert(wh.read("t").count() === 2)
    assert(wh.tables() === Seq("t"))
    // the next write sweeps the stranded tmp/old and commits cleanly
    wh.write("t", Seq((9, "z")).toDF("id", "v"))
    assert(wh.read("t").as[(Int, String)].collect().toSeq === Seq((9, "z")))
    assert(!fs.exists(new Path(dir, "t.__old")) && !fs.exists(new Path(dir, "t.__tmp")))
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // at 100 TB a selective dim filter should reach the fact scan as a
    // runtime bloom filter (probe rows drop BEFORE the shuffle); the
    // default size thresholds are tuned for real tables, so pin them
    // down to make the tiny fixture eligible and assert the plan shape
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val facts = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      val dim = graft.Tables.part(spark, "/root/testdata/sf0.01")
        .where(col("p_size") === 1) // selective build side
      val joined = facts.join(dim, col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), plan.take(800))
      // and the filtered result matches the unfiltered-join truth
      val expected = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
        .join(graft.Tables.part(spark, "/root/testdata/sf0.01"),
          col("l_partkey") === col("p_partkey"))
        .where(col("p_size") === 1)
      assert(joined.count() === expected.count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloomNewRows equals the exact anti-join at any fpp, incl. forced false positives") {
    val indexed = (1 to 300).map(i => (i.toLong, s"content-${i % 120}")).toDF("id", "text")
    val batch = (301 to 500)
      .map(i => (i.toLong, if (i % 3 == 0) s"content-${i % 120}" else s"fresh-$i"))
      .toDF("id", "text")
    val expected = batch.join(indexed.select("text").distinct(), Seq("text"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    // capacity 8 at fpp 0.5: nearly every probe reads bloom-positive, so
    // the exact verify join carries the whole result — which must not change
    val tiny = Dedup.bloomNewRows(indexed, batch, col("text"),
      expectedItems = 8L, fpp = 0.5)
    assert(tiny.select("id").as[Long].collect().sorted.toSeq === expected)
    // and a rightly-sized sketch (counted capacity, default fpp) agrees
    val sized = Dedup.bloomNewRows(indexed, batch, col("text"))
    assert(sized.select("id").as[Long].collect().sorted.toSeq === expected)
  }

  test("duplicateShingleFraction counts cross-doc shingles, hand-checked") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles: "a b c", "b c d"
      (2L, "a b c x"),     // shingles: "a b c", "b c x"
      (3L, "z z z z z"),   // distinct shingles: just "z z z"
      (4L, "a b")          // too short: no shingles, drops from output
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateShingleFraction(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // "a b c" is the only shingle shared across docs (df = 2)
    assert(got === Seq((1L, 2L, 1L, 50.0), (2L, 2L, 1L, 50.0), (3L, 1L, 0L, 0.0)))
    // the shared-ShingleCache path is value-identical
    val cache = Dedup.shingleCache(docs, "doc_id", "text")
    try {
      val viaCache = Dedup.duplicateShingleFraction(docs, "doc_id", "text",
        shared = Some(cache)).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(viaCache === got)
    } finally cache.release()
  }

  test("bloomNewRows keeps null-key batch rows and ignores null indexed keys") {
    val indexed = Seq((1L, "a"), (2L, null)).toDF("id", "text")
    val batch = Seq((10L, "a"), (11L, null), (12L, "b")).toDF("id", "text")
    val got = Dedup.bloomNewRows(indexed, batch, col("text"))
    assert(got.select("id").as[Long].collect().sorted.toSeq === Seq(11L, 12L))
  }

  test("removeDuplicatedSpans: first occurrence wins, clones empty, edges shrink") {
    val docs = Seq(
      (1L, "a b c d e f"),      // earliest owner of every shared shingle
      (2L, "x y a b c d e z"),  // shares "a b c d e" with d1
      (3L, "a b c d e f"),      // wholesale clone of d1
      (4L, "p q")               // too short for shingles — untouched
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", shingleSize = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a b c d e f", 6L, 6L),
      // only token 'c' sits under exclusively-duplicated shingles; the
      // edge tokens of the shared phrase ride unique straddling shingles
      (2L, "x y a b d e z", 8L, 7L),
      (3L, "", 6L, 0L),
      (4L, "p q", 2L, 2L)))
  }

  test("stripHtml extracts visible text: blocks drop, tags space-split, entities decode") {
    val cases = Seq(
      ("<p>Hello<br/>World</p>", "Hello World"),
      ("<SCRIPT>var a = '<div>'; if (a < 'b') {}</SCRIPT>after", "after"),
      ("<style>p{}</style>x<!-- note -->y", "x y"),
      // &amp;lt; decodes to the LITERAL &lt; (amp decodes last)
      ("a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f", "a &lt; b <c> \"d\" 'e' f"),
      ("  plain   text  ", "plain text"))
    val got = cases.map(_._1).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("urlHost extracts the lowercased host; no-URL values give empty string") {
    val got = Seq(
      "HTTPS://User:Pw@WWW.Example.COM:443/Path?x=1#f",
      "http://plain.org/a",
      "https://host.only",
      "not a url",
      "ftp://Files.Example.net/x"
    ).toDF("u").select(TextFunctions.urlHost(col("u"))).as[String].collect().toSeq
    assert(got === Seq("www.example.com", "plain.org", "host.only", "", "files.example.net"))
  }

  test("normalizeText collapses composed/decomposed + case + whitespace variants") {
    // U+00E9 (composed) vs e + U+0301 (decomposed), mixed case, messy whitespace
    val df = Seq(
      ("Café  \t du   Monde", "Café DU\nmonde"),
      ("plain ascii", " plain\tascii ")
    ).toDF("a", "b")
    val got = df.select(
      TextFunctions.normalizeText(col("a")),
      TextFunctions.normalizeText(col("b"))).as[(String, String)].collect()
    got.foreach { case (a, b) => assert(a === b, s"'$a' != '$b'") }
    assert(got(0)._1 === "café du monde")
    // interpreted path (Expression.eval via literal constant folding)
    val folded = spark.range(1)
      .select(TextFunctions.nfc(lit("Café")).as("n")).as[String].head()
    assert(folded === "Café")
    // fast path returns already-normalized input unchanged
    assert(graft.functions.NfcNormalizeExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")).toString === "abc")
  }

  test("domainProfile aggregates per host with exact dup ratio") {
    val docs = Seq(
      (1L, "one two three", "https://A.com/1"),
      (2L, "one two three", "https://a.COM/2"),   // same host, duplicate text
      (3L, "four five", "https://a.com/3"),
      (4L, "six", "http://B.org/x")
    ).toDF("doc_id", "text", "url")
    val got = graft.operators.Quality.domainProfile(docs, col("url"), col("text"))
      .orderBy("domain").as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("a.com", 3L, 8L, 2L, 33.3333), ("b.org", 1L, 1L, 1L, 0.0)))
  }

  test("bucketed tables join without any shuffle exchange") {
    import graft.ops.Bucketing
    val facts = (1 to 1000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "fv")
    val other = (1 to 500).map(i => (i.toLong % 97, i * 2.0)).toDF("k", "ov")
    Bucketing.saveBucketed(facts, "bkt_facts", "k", 4)
    Bucketing.saveBucketed(other, "bkt_other", "k", 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = Bucketing.bucketedJoin(spark, "bkt_facts", "bkt_other", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      // correctness: counts match the plain dataframe join
      assert(joined.count() === facts.join(other, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("surrogate keys are dense, sort-ordered, and never single-partition") {
    import graft.ops.SurrogateKeys
    val df = (1 to 10000).map(i => (s"id_${10000 - i}", i * 2.0)).toDF("nat_id", "v")
      .repartition(8)
    val keyed = SurrogateKeys.dense("sk", Seq(col("nat_id").asc))(df)
    // dense 1..N
    val agg = keyed.agg(count(lit(1)), countDistinct(col("sk")),
      min(col("sk")), max(col("sk"))).first()
    assert(agg.getLong(0) === 10000L && agg.getLong(1) === 10000L)
    assert(agg.getLong(2) === 1L && agg.getLong(3) === 10000L)
    // key order == natural order
    val misordered = keyed.select(col("nat_id"), col("sk"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("nat_id").asc)))
      .where(col("sk") =!= col("rk")).count()
    assert(misordered === 0L)
    // scale shape: no window operator, and the distributed sort feeding
    // the ids is range-partitioned — never a single-partition funnel
    // (AQE may still coalesce this tiny fixture down to one partition
    // by size, which is exactly the adaptive behavior we want at 100x)
    val plan = keyed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SinglePartition"), plan.take(500))
    val sortedPlan = df.repartitionByRange(col("nat_id").asc)
      .sortWithinPartitions(col("nat_id").asc)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(sortedPlan.contains("rangepartitioning")
      && !sortedPlan.contains("singlepartition"), sortedPlan.take(500))
    // re-run deterministic
    val again = SurrogateKeys.dense("sk", Seq(col("nat_id").asc))(df)
    assert(keyed.exceptAll(again).count() === 0L)
  }

  test("langId picks the max-scoring language, und when no signal") {
    val df = Seq("the cat and the dog of the house", "xyzzy plugh")
      .toDF("text")
    val out = df.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(out.toSeq === Seq("en", "und"))
  }

  test("iqrOutliers: hand-computed fences flag only beyond-fence values") {
    import graft.operators.Quality
    // values 1..8 + 100: q1=3, q3=7, iqr=4, k=1.5 → fences [-3, 13]
    val df = ((1 to 8).map(i => ("g", i.toDouble)) :+ (("g", 100.0)))
      .toDF("k", "v")
    val out = Quality.iqrOutliers(df, Seq("k"), "v")
    assert(out.count() === 9L)
    assert(out.where(col("is_outlier")).select("v").as[Double].collect().toSeq
      === Seq(100.0))
    // NULL value rows come back flagged false
    val withNull = df.unionByName(Seq(("g", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v"))
    assert(Quality.iqrOutliers(withNull, Seq("k"), "v")
      .where(col("v").isNull && col("is_outlier")).isEmpty)
  }

  test("canonicalizeUrl: case, ports, fragments, and utm params normalize") {
    val cases = Seq(
      // mixed case + default https port + threaded utm + fragment
      "HTTPS://Example.COM:443/Path/?utm_source=x&id=7#frag" ->
        "https://example.com/Path/?id=7",
      // http default port; utm in the middle of real params
      "http://A.Org:80/p?id=1&utm_campaign=c&z=2" -> "http://a.org/p?id=1&z=2",
      // non-default port is KEPT; no utm → untouched query
      "https://h.net:8443/x?a=1" -> "https://h.net:8443/x?a=1",
      // all-utm query collapses entirely (no dangling '?')
      "https://h.net/x?utm_a=1&utm_b=2" -> "https://h.net/x",
      // path case preserved
      "http://H.net/CaseSensitive" -> "http://h.net/CaseSensitive",
      // '&' is a legal PATH char — utm removal must not eat path
      // segments after it (it runs on the query substring only)
      "https://h.com/a&utm_x=1/b?q=2" -> "https://h.com/a&utm_x=1/b?q=2")
    val out = cases.map(_._1).toDF("url")
      .select(TextFunctions.canonicalizeUrl(col("url"))).as[String].collect()
    assert(out.toSeq === cases.map(_._2))
  }

  test("repetition signals match hand-computed fractions; sub-2-word docs get NULL bigrams") {
    import graft.operators.Quality
    val df = Seq((1L, "a a a b"), (2L, "x")).toDF("doc_id", "text")
    val out = Quality.repetitionSignals(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    // doc 1: words a,a,a,b → top 3/4, dup 1-2/4; bigrams "a a","a a","a b"
    assert(out(0).getLong(1) === 4L)
    assert(out(0).getDouble(2) === 0.75 && out(0).getDouble(3) === 0.5)
    assert(out(0).getLong(4) === 3L)
    assert(out(0).getDouble(5) === 0.666667 && out(0).getDouble(6) === 0.333333)
    // doc 2: one word, no bigrams → NULL bigram columns (no signal)
    assert(out(1).getLong(1) === 1L && out(1).getDouble(2) === 1.0)
    assert(out(1).isNullAt(4) && out(1).isNullAt(5) && out(1).isNullAt(6))
    // NULL text: the doc is PRESENT with all-NULL signals, so a gate
    // must decide its fate explicitly instead of it silently bypassing
    val withNull = df.unionByName(
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nul = Quality.repetitionSignals(withNull, "doc_id", "text")
      .where(col("doc_id") === 3L).collect()
    assert(nul.length === 1 && nul(0).isNullAt(1) && nul(0).isNullAt(4))
  }

  test("pii redaction: planted shapes typed correctly, clean prose untouched") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org today"),
      (2L, "ssn 123-45-6789 phone (555) 123-4567 and +1 555-123-4567"),
      (3L, "no pii here, just words and numbers like 12345 or 3.14"),
      // a phone-shaped SUFFIX of a longer digit run is NOT PII — the
      // captured guard keeps the pattern from partially redacting it
      (4L, "serial 0555-123-4567 stays"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFunctions.redactPii(col("text")).as("r"),
        TextFunctions.piiCount(col("text")).as("n"))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out(0) === ((1L, "reach me at <EMAIL> today", 1L)))
    assert(out(1) === ((2L, "ssn <SSN> phone <PHONE> and <PHONE>", 3L)))
    assert(out(2) === ((3L, "no pii here, just words and numbers like 12345 or 3.14", 0L)))
    assert(out(3) === ((4L, "serial 0555-123-4567 stays", 0L)))
  }

  test("winnowing: hand-checked fingerprints; md5 never runs inside a lambda") {
    // hand replay of SIGMOD'03 winnowing: k-shingles, md5Long each,
    // sliding window-of-w minima, distinct
    val words = "w0 w1 w2 w3 w4 w5 w6 w7".split(" ").toSeq
    val (k, w) = (3, 4)
    def md5Long(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val hs = words.sliding(k).map(sh => md5Long(sh.mkString(" "))).toSeq
    val expected = hs.sliding(w).map(_.min).toSeq.distinct.sorted
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.winnowingFingerprints(df, "doc_id", "text", k, w)
    assert(out.select("fp").as[Long].collect().toSeq.sorted === expected)
    // the whole shingle path must be codegen: no higher-order-function
    // lambda anywhere (the digest is a plain projection, and shingle
    // construction itself is the native ShinglesExpr, not a transform)
    import org.apache.spark.sql.catalyst.expressions.LambdaFunction
    val lambdas = out.queryExecution.analyzed.flatMap(_.expressions)
      .flatMap(_.collect { case l: LambdaFunction => l })
    assert(lambdas.isEmpty)
  }

  test("duplicatedSpans: island merge, two-island docs, within-doc repeats excluded") {
    // d1/d2 share the substring "r s t u" (two 3-shingles: rst, stu);
    // d5 contains rst and stu at NON-adjacent positions (two islands);
    // d4 repeats one shingle WITHIN itself only (must not mark — the
    // frequency is distinct-doc, not raw); d3 shares nothing
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "z z r s t u z"),
      (3L, "m n o"),
      (4L, "k k k k k"),
      (5L, "r s t X X s t u")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", shingleSize = 3, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // d1: rst@2 stu@3 adjacent → one span [2, 3+2] of 2 grams; d2 same
    // positions; d5: rst@0, stu@5 → two 1-gram spans [0,2] and [5,7]
    assert(out === Seq(
      (1L, 2L, 5L, 2L),
      (2L, 2L, 5L, 2L),
      (5L, 0L, 2L, 1L),
      (5L, 5L, 7L, 1L)))
  }

  test("shared shingle cache serves several operators and stays caller-owned") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base), (3L, base + " extra trailing words here"),
      (4L, "completely different text with nothing shared at all ok"))
      .toDF("doc_id", "text")
    val cache = graft.operators.Dedup.shingleCache(docs, "doc_id", "text", 3)
    assert(cache.isCached)
    val lshShared = Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
      numHashes = 64, bands = 16, threshold = 0.5, shared = Some(cache))
    val jacShared = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5, shared = Some(cache))
    // value-identical to the unshared runs
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", shingleSize = 3,
      numHashes = 64, bands = 16, threshold = 0.5)
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
    assert(lshShared.exceptAll(lsh).isEmpty && lsh.exceptAll(lshShared).isEmpty)
    assert(jacShared.exceptAll(jac).isEmpty && jac.exceptAll(jacShared).isEmpty)
    // finish() must NOT release caller-owned state mid-session...
    assert(cache.isCached)
    // ...a cache built over a DIFFERENT corpus is refused, not served
    val other = Seq((9L, "a totally different corpus of words here"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashLsh(other, "doc_id", "text", shared = Some(cache))
    }
    // ...and release() must actually free it
    cache.release()
    assert(!cache.isCached)
    // a released cache is refused, not silently recomputed
    intercept[IllegalArgumentException] {
      Dedup.minhashLsh(docs, "doc_id", "text", shared = Some(cache))
    }
  }

  test("reliable checkpoint engages when a checkpoint dir is configured") {
    // session-scoped setup on a FRESH session (see PrefixSumSpec's
    // reliable-checkpoint test): sc.setCheckpointDir is context-global
    // and raced with concurrently-running suites' conf restoration
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val s = spark.newSession()
    s.conf.set("spark.graft.checkpoint.dir", dir)
    import s.implicits._
    def files(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles).toSeq.flatten.flatMap(c => c +: files(c))
    try {
      // the mechanism: stableTracked writes a parquet checkpoint at a
      // known path; drop deletes it
      val (chk, path) = graft.operators.Checkpoints.stableTracked(
        Seq((1L, 2L)).toDF("a", "b"))
      assert(path.isDefined && files(new java.io.File(dir)).exists(_.isFile))
      assert(chk.count() === 1L)
      graft.operators.Checkpoints.drop(chk, path)
      // only OUR graft-* dirs land under the session-scoped root
      def dirs = Option(new java.io.File(dir).listFiles).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("graft-"))
      assert(dirs.isEmpty)
      // the loops: CC iterates on reliable checkpoints, drops every
      // superseded round, and materializes its RESULT locally — a
      // session of repeated runs leaves NOTHING on the checkpoint FS
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_id_1", "doc_id_2")
      val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      assert(dirs.isEmpty, s"leaked checkpoint dirs: ${dirs.map(_.getName)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  // --- heavy hitters (q84) -------------------------------------------------

  private def md5Long60(s: String): Long =
    java.lang.Long.parseLong(Md5ModExpr.md5Hex(s).take(15), 16)

  test("heavyHitters proven path: MG candidates + rescore equal the exact top-k") {
    import graft.operators.HeavyHitters
    // head-heavy corpus: the bound k-th·capacity > n holds, so the
    // operator must take the proven (collected) path
    val texts = Seq.fill(20)("hot hot hot warm warm cool") ++
      Seq("u1 u2 u3 u4 u5", "u6 u7 u8 u9")
    val docs = texts.toDF("text").repartition(4)
    val out = HeavyHitters.topKTokens(docs, "text", k = 3, capacity = 50)
    assert(out.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "expected the proven/collected path for a head-heavy corpus")
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "hot", 60L), (2L, "warm", 40L), (3L, "cool", 20L)))
  }

  test("heavyHitters fallback: long-tail corpus fails the bound, full rescore still exact") {
    import graft.operators.HeavyHitters
    // 200 singletons + one mild hitter: 3rd count = 1, 1·capacity < n
    val texts = (1 to 200).map(i => s"tok$i") :+ "hot hot hot hot hot"
    val docs = texts.toDF("text").repartition(4)
    val out = HeavyHitters.topKTokens(docs, "text", k = 3, capacity = 8)
    assert(!out.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "expected the full-aggregation fallback when the bound fails")
    val got = out.collect().map(r => (r.getString(1), r.getLong(2)))
    // exact top-3 under (n desc, token asc): hot(5), then the two
    // lexicographically-smallest singletons
    assert(got.toSeq === Seq(("hot", 5L), ("tok1", 1L), ("tok10", 1L)))
  }

  test("heavyHitters equals the exact top-k on random corpora, both capacity regimes") {
    import graft.operators.HeavyHitters
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val corpusGen = for {
      nDocs <- Gen.choose(1, 15)
      docs <- Gen.listOfN(nDocs, Gen.listOf(Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.oneOf("warm", "cool"),
        2 -> Gen.choose(1, 40).map(i => s"t$i"))).map(_.mkString(" ")))
    } yield docs
    val cases = (1 to 5).flatMap(i =>
      corpusGen(Gen.Parameters.default, Seed(i.toLong)))
    for (texts <- cases; capacity <- Seq(4, 256)) {
      val k = 3
      // reference mirrors tokens(): Spark split keeps empty strings,
      // so an empty doc contributes one "" token
      val counts = texts.flatMap(_.split(" ", -1))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val expected = counts.sortBy { case (t, n) => (-n, t) }.take(k)
      val got = HeavyHitters.topKTokens(texts.toDF("text"), "text", k, capacity)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      // capacity 4 usually fails the bound (fallback), 256 proves —
      // EITHER path must equal the exact answer
      assert(got === expected, s"capacity=$capacity texts=$texts")
    }
  }

  test("encodeBpe equals a reference greedy fold on random words and merge chains") {
    import graft.operators.Tokenizer
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def refPass(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    val wordsGen = Gen.listOfN(25,
      Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString)))
    for (seed <- 1 to 4) {
      val words = wordsGen(Gen.Parameters.default, Seed(seed.toLong)).get.distinct
      // a realistic chain: second merge may consume the first's output
      val merges = Seq("a" -> "b", "ab" -> "c", "c" -> "c")
      val got = Tokenizer.encodeBpe(words.toDF("w"), "w", merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      words.foreach { w =>
        val expected = merges.foldLeft(w.map(_.toString).toList) {
          case (syms, (a, b)) => refPass(syms, a, b)
        }
        assert(got(w) === expected, s"word '$w'")
      }
    }
  }

  test("klDrift total is a true KL (non-negative) on random corpora") {
    import graft.operators.Stats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(12, for {
      txt <- Gen.listOf(Gen.oneOf("x", "y", "z", "w", "v")).map(_.mkString(" "))
      p <- Gen.oneOf(true, false)
    } yield (txt, p))
    for (seed <- 1 to 4) {
      val docs = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val out = Stats.klDrift(docs.toDF("text", "p"), "text", col("p"), topN = 5)
        .collect()
      // both smoothed distributions normalize over the JOINT
      // vocabulary, so the total is a genuine KL divergence —
      // non-negative up to the per-term rounding
      out.headOption.foreach(r =>
        assert(r.getDouble(4) >= -1e-6, s"total_kl=${r.getDouble(4)}"))
    }
  }

  // --- SRP hyperplane LSH (q89) --------------------------------------------

  test("SRP signatures match a plain-Scala reference bit-for-bit, both eval paths") {
    import graft.operators.Similarity
    val planes = Similarity.srpPlanes(bits = 16, dim = 8)
    val vecs = Seq(
      (1L, Array(0.5, -0.25, 1.0, 0.0, -1.0, 0.75, 0.1, -0.9)),
      (2L, Array(-0.5, 0.25, -1.0, 0.0, 1.0, -0.75, -0.1, 0.9)), // negated -> complement
      (3L, Array.fill(8)(0.0)))                                  // zero vector -> all bits 0
    def refSig(v: Array[Double]): Long =
      planes.zipWithIndex.foldLeft(0L) { case (sig, (p, i)) =>
        var dot = 0.0
        for (d <- v.indices) dot += v(d) * p(d)
        if (dot > 0.0) sig | (1L << i) else sig
      }
    // codegen path (through the frame)
    val got = Similarity.srpSignatures(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", planes)
      .orderBy("vec_id").as[(Long, Long)].collect()
    vecs.zip(got).foreach { case ((id, v), (gid, sig)) =>
      assert(gid === id && sig === refSig(v), s"vec $id") }
    // negation flips every bit whose dot is nonzero; with no exact-zero
    // dots the signatures are complements within the 16-bit mask
    assert((got(0)._2 ^ got(1)._2) === 0xFFFFL)
    assert(got(2)._2 === 0L)
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.functions.SrpSignExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vecs.head._2, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), planes)
    assert(expr.nullSafeEval(ArrayData.toArrayData(vecs.head._2)) ===
      refSig(vecs.head._2))
  }

  test("SRP banding has full signature-level recall (every hamming<=max pair found)") {
    import graft.operators.Similarity
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(30, Gen.listOfN(8,
      Gen.choose(-1.0, 1.0)).map(_.toArray))
    val vecs = gen(Gen.Parameters.default, Seed(7L)).get.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val planes = Similarity.srpPlanes(bits = 16, dim = 8)
    // a Seq, not a Map: a for-comprehension over a Map would yield a
    // Map and silently collapse pairs sharing a first id
    val sigs = Similarity.srpSignatures(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", planes)
      .as[(Long, Long)].collect().toSeq
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    // minCosine = -1 disables the cosine verify: the assertion is the
    // BANDING's pigeonhole recall, exactly the candidate set
    val got = Similarity.srpNearDupPairs(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", bits = 16, maxHamming = 3, minCosine = -1.0)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("heavyHitters and klDrift are total on an empty corpus") {
    import graft.operators.{HeavyHitters, Stats}
    val empty = Seq.empty[(String, Boolean)].toDF("text", "p")
    assert(HeavyHitters.topKTokens(empty, "text", k = 3, capacity = 8)
      .collect().isEmpty)
    assert(Stats.klDrift(empty, "text", col("p")).collect().isEmpty)
  }

  // --- bigram LM (q83) -----------------------------------------------------

  test("bigram LM prices seen, unseen-bigram, and unseen-context exactly as trained") {
    import graft.operators.LangModel
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val (model, ctx, v) = LangModel.bigramLm(train, "text", k = 0.5)
    assert(v === 2L) // vocabulary {a, b}
    // c2: "a b"->2, "b a"->1; ctx: a->2, b->1
    val score = LangModel.bigramScore(
      Seq((10L, "a b c"), (11L, "c d")).toDF("doc_id", "text"),
      "doc_id", "text", model, ctx, v, k = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 10: seen "a b" = ln(2.5/3); unseen "b c" in seen ctx b = ln(0.5/2)
    val d10 = (math.log(2.5 / 3.0) + math.log(0.5 / 2.0)) / 2.0
    // doc 11: unseen ctx c -> uniform ln(k/(0+kV)) = ln(1/V)
    val d11 = math.log(0.5 / 1.0)
    assert(score(0)._1 === 10L && score(0)._2 === 2L)
    // nano-quantized log-probs: hand math agrees to the 1e-9 grain
    assert(math.abs(score(0)._3 - d10) < 1e-9)
    assert(score(1)._1 === 11L && score(1)._2 === 1L)
    assert(math.abs(score(1)._3 - d11) < 1e-9)
  }

  // --- shard assignment (q86) ----------------------------------------------

  test("shardAssign: md5 shard function, dense 1-based ranks, append keeps relative order") {
    import graft.operators.Packing
    val a = Packing.shardAssign((1L to 100L).toDF("doc_id"), col("doc_id"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length === 100)
    // shard is the pinned md5 function of the key
    a.foreach { case (id, shard, _) =>
      assert(shard === java.lang.Math.floorMod(md5Long60(id.toString), 4L)) }
    // ranks are dense 1..n_s per shard
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq) }
    // growing the corpus only INSERTS into shard orders: relative
    // order of surviving pairs never flips
    val b = Packing.shardAssign((1L to 120L).toDF("doc_id"), col("doc_id"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val posB = b.map(r => (r._1, r._2) -> r._3).toMap
    for ((s, rows) <- a.groupBy(_._2);
         List(x, y) <- rows.sortBy(_._3).map(_._1).toList.sliding(2))
      assert(posB((x, s)) < posB((y, s)),
        s"append flipped order of $x, $y in shard $s")
  }

  // --- weighted sampling (q87) ---------------------------------------------

  test("weightedSample replays the Efraimidis-Spirakis draw; zero/null weights excluded") {
    import graft.operators.Sampling
    val rows = Seq((1L, Option(10.0)), (2L, Option(100.0)), (3L, Option(1.0)),
      (4L, Option(50.0)), (5L, Option(0.0)), (6L, Option.empty[Double]),
      (7L, Option(Double.NaN)))
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, col("doc_id"), col("w"), n = 3)
      .select("sample_rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // replicate the score in plain Scala: ln((md5_60(id)+1)/2^60)/w.
    // Scala's NaN > 0 is false, so the NaN-weight row drops here like
    // the operator's isnan filter drops it there (without the filter,
    // Spark's NaN-sorts-largest would put id 7 at rank 1)
    val expected = rows.collect { case (id, Some(w)) if w > 0 =>
      (id, math.log((md5Long60(id.toString) + 1).toDouble / (1L << 60).toDouble) / w)
    }.sortBy { case (id, es) => (-es, id) }.take(3).zipWithIndex
      .map { case ((id, _), i) => (i + 1L, id) }
    assert(got.toSeq === expected)
    intercept[IllegalArgumentException](Sampling.weightedSample(
      df.withColumn("sample_rank", lit(1L)), col("doc_id"), col("w"), 3))
  }

  // --- BPE training + encoding (q88) ---------------------------------------

  test("learnBpe: argmax rounds, merge application, early exhaustion") {
    import graft.operators.Tokenizer
    val docs = Seq("aa ab aa").toDF("text")
    // wordFreq: aa->2, ab->1. Round 1 pairs: (a,a)=2, (a,b)=1 -> merge
    // (a,a); round 2: only (a,b) -> merge (a,b); round 3: no pairs
    // left -> training exhausts at 2 merges though 5 were asked
    val (merges, vocab) = Tokenizer.learnBpe(docs, "text", nMerges = 5)
    assert(merges === Seq(("a", "a", 2L), ("a", "b", 1L)))
    val syms = vocab.orderBy("w").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(syms === Map("aa" -> List("aa"), "ab" -> List("ab")))
  }

  test("encodeBpe: greedy-leftmost, merged symbol not immediately re-merged") {
    import graft.operators.Tokenizer
    val words = Seq("aaa", "aab", "ba", "a").toDF("w")
    val enc = Tokenizer.encodeBpe(words, "w", Seq("a" -> "a", "a" -> "b"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // "aaa" under (a,a): leftmost pair merges, the product "aa" does
    // not chain-merge with the 3rd 'a' -> [aa, a]
    assert(enc("aaa") === List("aa", "a"))
    // "aab": (a,a) first -> [aa, b]; then (a,b) finds no bare 'a'
    assert(enc("aab") === List("aa", "b"))
    assert(enc("ba") === List("b", "a"))
    assert(enc("a") === List("a"))
  }

  test("weightedSample plans TakeOrdered over a real scan (no global sort exchange)") {
    import graft.operators.Sampling
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Sampling.weightedSample(docs, col("doc_id"),
        col("n_chars").cast("double"), n = 10)
      .queryExecution.executedPlan.toString
    // per-partition top-n + driver merge, never a corpus range-shuffle
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("rangepartitioning"), plan.take(800))
  }

  test("shardAssign plans exactly the one write shuffle (by shard) over a real scan") {
    import graft.operators.Packing
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val out = Packing.shardAssign(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), col("doc_id"), 8)
    // materialize through the frame's OWN QueryExecution so the
    // adaptive plan finalizes (inputPlan predates EnsureRequirements
    // and would not show the ENSURE_REQUIREMENTS exchange); query
    // stages are LEAF nodes, so descend into each stage's plan
    // explicitly (Result stage wraps the tail, Shuffle stages wrap
    // each exchange)
    out.collect()
    // collect itself descends through non-leaf nodes (an exchange's
    // child subtree is visited anyway); only the leaf-like wrappers
    // need explicit recursion
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
      case s: ShuffleExchangeExec => Seq(s)
      case q: QueryStageExec => exchanges(q.plan)
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    }.flatten
    val ex = exchanges(out.queryExecution.executedPlan)
    assert(ex.length === 1, out.queryExecution.executedPlan.toString.take(800))
    assert(ex.head.outputPartitioning.toString.contains("shard"),
      ex.head.outputPartitioning.toString)
  }

  // --- KL drift (q85) ------------------------------------------------------

  test("klDrift: hand-computed smoothed terms, absent-side tokens finite") {
    import graft.operators.Stats
    val docs = Seq(("a a b", true), ("a c", false)).toDF("text", "p")
    val out = Stats.klDrift(docs, "text", col("p"), k = 0.5, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // counts: a (2,1), b (1,0), c (0,1); N_P=3, N_Q=2, V=3
    def term(cp: Long, cq: Long): Double = {
      val p = (cp + 0.5) / (3 + 0.5 * 3); val q = (cq + 0.5) / (2 + 0.5 * 3)
      BigDecimal(p * math.log(p / q)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byTok = out.map(r => r._1 -> r._4).toMap
    assert(out.length === 3 && out.forall(r => !r._4.isNaN && !r._4.isInfinite))
    for ((t, cp, cq) <- Seq(("a", 2L, 1L), ("b", 1L, 0L), ("c", 0L, 1L)))
      assert(math.abs(byTok(t) - term(cp, cq)) < 2e-9, s"token $t")
    val totalKl = out.head._5
    assert(math.abs(totalKl -
      BigDecimal(Seq(("a", 2L, 1L), ("b", 1L, 0L), ("c", 0L, 1L))
        .map { case (_, cp, cq) => term(cp, cq) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
  }

  // --- line-level dedup (q92) ----------------------------------------------

  test("dedupLines: earliest (doc,pos) survives, order-preserving reassembly, all-dup doc empties") {
    val docs = Seq(
      (1L, "alpha\nboiler line\nbeta"),
      (2L, "boiler line\ngamma"),   // boiler already seen at (1,1)
      (3L, "boiler line"),          // only duplicated content -> empty, NOT dropped
      (4L, "delta\ndelta"),         // within-doc repeat: second occurrence drops
      (5L, null))                   // null text -> empty text, 0 lines, NOT dropped
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === ((1L, "alpha\nboiler line\nbeta", 3L, 3L)))
    assert(out(1) === ((2L, "gamma", 2L, 1L)))
    assert(out(2) === ((3L, "", 1L, 0L)))
    assert(out(3) === ((4L, "delta", 2L, 1L)))
    assert(out(4) === ((5L, "", 0L, 0L)))
  }

  // --- SemDeDup (q93) ------------------------------------------------------

  test("semDedup: chains collapse to one representative, distinct groups survive") {
    import graft.operators.Similarity
    def rot(deg: Double) = Array(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    // 1~2 (cos 5deg = .9962) and 2~3 (cos 5deg), but 1~3 (cos 10deg
    // = .9848) is BELOW the 0.995 threshold: only the component
    // closure keeps exactly one of the chain {1,2,3}
    val vecs = Seq((1L, rot(0)), (2L, rot(5)), (3L, rot(10)), (10L, Array(0.0, 1.0)))
    val centroids = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs.toDF("vec_id", "embedding"), centroids,
        threshold = 0.995, nProbe = 1)
      .select("vec_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 10L))
    // non-canonical column names dedup on the NAMED columns (extra
    // payload columns ride through untouched)
    val renamed = Similarity.semDedup(
      vecs.toDF("doc_id", "emb").withColumn("payload", col("doc_id") * 10),
      centroids, threshold = 0.995, nProbe = 1, idCol = "doc_id", embCol = "emb")
    assert(renamed.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 10L))
    assert(renamed.columns.toSeq === Seq("doc_id", "emb", "payload"))
  }

  // --- DSIR importance weights (q94) ---------------------------------------

  test("dsirWeights: hand-replayed hashed-feature log-ratios, both sides scored") {
    import graft.operators.Quality
    val docs = Seq((1L, Option("a a"), true), (2L, Option("a b"), false),
      (3L, Option.empty[String], false)).toDF("doc_id", "text", "t")
    // features (unigrams + bigrams): doc1 {a, a, "a a"}, doc2 {a, b, "a b"}
    def bk(g: String) = java.lang.Math.floorMod(md5Long60(g), 8L)
    def cnt(fs: Seq[String]) = fs.groupBy(bk).map { case (b, g) => b -> g.size.toLong }
    val (tc, rc) = (cnt(Seq("a", "a", "a a")), cnt(Seq("a", "b", "a b")))
    def lr(b: Long) =
      math.log((tc.getOrElse(b, 0L) + 0.5) / (3.0 + 0.5 * 8)) -
        math.log((rc.getOrElse(b, 0L) + 0.5) / (3.0 + 0.5 * 8))
    val expected = Map(
      1L -> Seq("a", "a", "a a").map(g => lr(bk(g))).sum,
      2L -> Seq("a", "b", "a b").map(g => lr(bk(g))).sum)
    val out = Quality.dsirWeights(docs, "doc_id", "text", col("t"),
        buckets = 8, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // the null-text doc comes back (n_feats 0, weight 0.0) and its
    // marker row polluted NEITHER distribution
    assert(out.map(o => (o._1, o._2, o._3)).toSeq ===
      Seq((1L, true, 3L), (2L, false, 3L), (3L, false, 0L)))
    out.take(2).foreach(o =>
      assert(math.abs(o._4 - expected(o._1)) < 1e-12, s"doc ${o._1}"))
    assert(out(2)._4 === 0.0)
    // the target's own features are LIKELIER under target: positive weight
    assert(out(0)._4 > 0 && out(1)._4 < out(0)._4)
  }

  // --- JSONL source (q96) --------------------------------------------------

  test("JsonlSource: torn lines quarantine, missing fields are nulls not quarantine") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      ("""{"doc_id":1,"text":"hello","n_chars":5}""" + "\n" +
        """{"doc_id":2,"text":"world"}""" + "\n" +          // missing field -> null
        """{"doc_id":3,"text":"truncated""" + "\n" +        // torn write -> quarantine
        """not json at all""" + "\n" +
        "\n" +                                              // blank line -> quarantine
        "   \n" +                                           // whitespace -> quarantine
        """{"doc_id":4,"text":"ok","n_chars":2}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    val (clean, quarantine) = graft.sources.JsonlSource.read(spark, dir, schema)
    val got = clean.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq((1L, "hello", 5L), (2L, "world", -1L), (4L, "ok", 2L)))
    // every non-clean input line is accounted for, raw text included —
    // blank/whitespace lines must NOT leak into clean as all-null rows
    val bad = quarantine.select("_corrupt_record").as[String].collect().sorted
    assert(bad.length === 4 && bad.exists(_.contains("truncated"))
      && bad.contains("not json at all") && bad.contains("") && bad.contains("   "))
    intercept[IllegalArgumentException](graft.sources.JsonlSource.read(
      spark, dir, StructType(Seq(StructField("_corrupt_record", StringType)))))
  }

  // --- incremental IVF append (q97) ----------------------------------------

  test("ivfStoreAppend: append == full rebuild, probe pruning intact on the grown store") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfapp_").toString + "/store"
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.sampleCentroids(emb, 50)
    Similarity.ivfStoreAppend(emb.filter(col("vec_id") % 2 === 0), centroids, dir)
    Similarity.ivfStoreAppend(emb.filter(col("vec_id") % 2 === 1), centroids, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val fromStore = Similarity.ivfTopKFromStore(spark.read.parquet(dir),
      queries, centroids, k = 5, nProbe = 3)
    val rebuilt = Similarity.ivfTopK(
      Similarity.assignCells(emb, centroids, "nid", "ne", "cell", 1),
      queries, centroids, k = 5, nProbe = 3)
    assert(fromStore.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(fromStore).isEmpty)
    // the IN-list still reaches the appended store as a partition filter
    val pf = fromStore.queryExecution.executedPlan.toString
      .split("PartitionFilters: \\[").toSeq.map(_.takeWhile(_ != ']')).filter(_.nonEmpty)
    assert(pf.exists(f => f.contains("cell") && f.contains("IN (")),
      s"no cell partition filter in: $pf")
  }

  // --- perplexity bands (q95) ----------------------------------------------

  test("perplexityBuckets: equal-mass tercile cuts, head = highest scores") {
    import graft.operators.LangModel
    val scored = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "s")
    val out = LangModel.perplexityBuckets(scored, "s", 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // quantile_cont cuts over 1..9: p33.3 = 3.666667, p66.7 = 6.333333
    assert((1 to 3).forall(i => out(i.toLong) === 3), s"tail band: $out")
    assert((4 to 6).forall(i => out(i.toLong) === 2), s"middle band: $out")
    assert((7 to 9).forall(i => out(i.toLong) === 1), s"head band: $out")
    intercept[IllegalArgumentException](
      LangModel.perplexityBuckets(scored, "s", 1))
  }

  test("bm25TopK: hand-computed scores, rare term dominates, k truncates") {
    import graft.operators.Tfidf
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler"),
      (4L, "rare rare common filler filler filler")).toDF("doc_id", "text")
    val out = Tfidf.bm25TopK(docs, "doc_id", "text", Seq("rare", "common"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // hand replay: N=4, avgdl=6, dl=6 for all -> len norm term = 1
    def contrib(tf: Long, df: Long): Long = {
      val idf = math.log(1.0 + (4 - df + 0.5) / (df + 0.5))
      math.round(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 1.0)) * 1e6)
    }
    val d4 = contrib(2, 2) + contrib(1, 3)
    val d1 = contrib(1, 2) + contrib(2, 3)
    val d2 = contrib(1, 3)
    assert(out.length === 3)
    assert(out(0) === ((4L, d4, 2L)), s"got ${out.toSeq}")
    assert(out(1) === ((1L, d1, 2L)))
    assert(out(2) === ((2L, d2, 1L)))
    assert(d4 > d1, "two hits of the rare term must outrank one")
  }

  test("electSurvivors: argmax quality per cluster, ties fall to min id, loners excluded") {
    val docs = Seq(
      (1L, 0.50), (2L, 0.90), (3L, 0.90), // cluster 1: 2 wins on q-tie min-id
      (10L, 0.30), (11L, 0.20),           // cluster 10: 10 wins on q
      (99L, 0.99)                          // in no pair: not in election
    ).toDF("doc_id", "q_in")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val out = Dedup.electSurvivors(docs, "doc_id", clusters, col("q_in"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("is_survivor"))).toMap
    assert(out.size === 5, "election covers members only")
    assert(out(2L) && !out(1L) && !out(3L))
    assert(out(10L) && !out(11L))
  }

  test("blockedHosts: exact and dot-suffix matches only — no substring leaks") {
    import graft.operators.Quality
    val hosts = Seq("a.example.org", "example.org", "notexample.org",
      "example.org.evil.com", "cdn.x.com", "x.com").toDF("host")
    val block = Seq("example.org", "cdn.x.com").toDF("domain")
    val got = Quality.blockedHosts(hosts, "host", block, "domain")
      .as[String].collect().sorted
    // notexample.org must NOT match (suffix walk is label-aligned, not
    // substring), example.org.evil.com must NOT match (suffixes only),
    // x.com must NOT match the cdn.x.com entry (no reverse inclusion)
    assert(got.toSeq === Seq("a.example.org", "cdn.x.com", "example.org"))
  }

  test("gopherRules: each rule flips independently of the others") {
    import graft.operators.Quality
    val docs = Seq(
      (1L, "the quick brown fox and the dog ran off to town"), // all pass
      (2L, "the fox and"),                                     // too few words
      (3L, "a a a a a the of it to is"),                       // mean word len < 3
      (4L, "the!!! of??? and###(((:::))) sentence widely forty")// punct ratio
    ).toDF("doc_id", "text")
    val out = Quality.gopherRules(docs, "doc_id", "text",
        minWords = 5, maxWords = 50, minMeanWordLen = 3.0,
        maxMeanWordLen = 10.0, maxPunctRatio = 0.2, minStopwords = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("r_word_count"), r.getAs[Boolean]("r_word_len"),
          r.getAs[Boolean]("r_punct"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) === ((true, true, true, true)))
    assert(out(2L) === ((false, true, true, false)))
    assert(out(3L)._1 && !out(3L)._2 && !out(3L)._4)
    assert(out(4L)._1 && !out(4L)._3 && !out(4L)._4)
  }

  test("kCenterGreedy: farthest-point order on a planted line, radii non-increasing") {
    import graft.operators.Similarity
    val pts = Seq((1L, Array(0f, 0f)), (2L, Array(10f, 0f)),
      (3L, Array(5f, 0f)), (4L, Array(0.5f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(pts, k = 4).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._3).toSeq === Seq(-1.0, 10.0, 5.0, 0.5))
  }

  test("kCenterGreedy: exact-duplicate embeddings select the unselected dup, k > corpus stops early") {
    import graft.operators.Similarity
    val dups = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)), (3L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(dups, k = 5).orderBy("rank")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    // round 3 must pick the duplicate id 2 at distance 0, never
    // re-pick a selected center; rounds 4-5 have no candidates left
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(out.map(_._2).toSeq === Seq(-1.0, 5.0, 0.0))
  }

  test("mmrRerank: pool smaller than k stops at exhaustion; multi-query frame rejected") {
    import graft.operators.Similarity
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0),
      nCandidates = 10, k = 5, lambda = 0.5)
    assert(out.count() === 2, "only 2 candidates exist (self excluded)")
    intercept[IllegalArgumentException](
      Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 2),
        nCandidates = 10, k = 2, lambda = 0.5))
  }

  test("bm25TopK rejects duplicate query terms") {
    import graft.operators.Tfidf
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Tfidf.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), k = 1))
  }

  test("eventTransitions: per-user ordering with id tiebreak, row-normalized probabilities") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    val ev = Seq(
      (1L, "a", t0, 10L), (1L, "b", t0, 11L), // simultaneous: id orders a->b
      (1L, "c", t1, 12L),
      (2L, "a", t0, 20L), (2L, "c", t1, 21L)  // users never interleave
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Analytics.eventTransitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out === Set(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "c", 1L, 1.0)))
  }

  test("conversionDelay: strictly-after filter, exact micro delays, quantile cuts") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "view", t("2024-01-01 00:00:00")), (1L, "purchase", t("2024-01-01 00:00:01")),
      (2L, "view", t("2024-01-01 00:00:00")), (2L, "purchase", t("2024-01-01 00:00:03")),
      (3L, "purchase", t("2024-01-01 00:00:00")), (3L, "view", t("2024-01-01 00:00:05")),
      (4L, "view", t("2024-01-01 00:00:00"))).toDF("user_id", "event_type", "ts")
    val out = Analytics.conversionDelay(ev, "user_id", "event_type", "ts",
      "view", "purchase").head()
    // users 3 (purchase first) and 4 (never purchased) excluded;
    // delays 1s and 3s in micros -> p50 = 2e6
    assert(out.getLong(0) === 2L)
    assert(out.getDouble(2) === 2000000.0)
  }

  test("blockedHosts plans a broadcast left-semi join against the blocklist") {
    import graft.operators.Quality
    val hosts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat(col("source"), lit(".example.com")).as("host"))
    val block = Seq("example.com").toDF("domain")
    val plan = Quality.blockedHosts(hosts, "host", block, "domain")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(800))
  }

  test("prefixDimTopK plans group-limited windows over a real scan — no corpus range shuffle") {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Similarity.prefixDimTopK(emb, emb.filter(col("vec_id") < 3),
        prefixDims = 8, shortlist = 20, k = 5)
      .queryExecution.executedPlan.toString
    // rank <= k prune pushes into the window (WindowGroupLimit), and
    // ranking must never plan a global range-partitioned sort
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
    assert(!plan.contains("rangepartitioning"), plan.take(800))
  }

  test("funnel: step order enforced — converting before the prior step does not count") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)), // full
      (2L, "click", t(1)), (2L, "view", t(2)),  // clicked BEFORE viewing
      (3L, "view", t(1)), (3L, "purchase", t(2)) // skipped click
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 3L, 100.0), (2, 1L, 33.3333), (3, 1L, 33.3333)))
  }

  test("rollingDaily: calendar gap excluded from RANGE frame, wow null without baseline") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    def day(d: Int, n: Int) = (1 to n).map(i =>
      Timestamp.valueOf(f"2024-01-$d%02d 00:$i%02d:00"))
    // days 1 (2 events), 2 (4), then a gap, day 10 (6): day 10's 7-day
    // frame covers ordinals 4..10 — days 1-2 fall outside
    val ev = (day(1, 2) ++ day(2, 4) ++ day(10, 6)).map(Tuple1(_)).toDF("ts")
    val out = Analytics.rollingDaily(ev, "ts").orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out(0) === (("2024-01-01", 2L, 2.0, null)))
    assert(out(1) === (("2024-01-02", 4L, 3.0, null)))
    assert(out(2) === (("2024-01-10", 6L, 6.0, null)), s"got ${out.toSeq}")
  }

  test("basketAffinity: hand-computed support/confidence/lift, duplicate lines collapse") {
    import graft.ops.Analytics
    // 4 orders; {A,B} co-occur twice, {A,C} once (below minPairs);
    // order 1 lists A twice — distinct must collapse it
    val li = Seq((1L, 100L), (1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L), (3L, 300L), (4L, 400L)).toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketAffinity(li, "l_orderkey", "l_partkey", minPairs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length === 1)
    val (i1, i2, n, sup, conf, lift) = out.head
    assert((i1, i2, n) === ((100L, 200L, 2L)))
    assert(sup === 0.5)     // 2 of 4 orders
    assert(conf === 0.666667) // A appears in 3 orders, rounded 6dp
    assert(lift === BigDecimal(2.0 * 4 / (3 * 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // 1.333333
  }

  test("rfmSegments: quintile cuts band 1..5, boundary value takes the lower band") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    // 5 customers, one order each on the same date -> frequency and
    // recency are constant (everyone lands in band 1); monetary
    // 10..50 spreads exactly one customer per quintile band
    val ts = Timestamp.valueOf("1998-01-01 00:00:00")
    val orders = (1 to 5).map(i => (i.toLong, ts, i * 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.rfmSegments(orders, "o_custkey", "o_orderdate",
        "o_totalprice", asOf = "1998-12-31")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.forall(t => t._1 === 1 && t._2 === 1))
    assert(out.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    assert(out.forall(_._4 === 1L))
  }

  test("cohortRetention: a customer counts once per month, offsets from first order") {
    import graft.ops.Analytics
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, t("1998-01-05")), (1L, t("1998-01-20")), // same month: one cell
      (1L, t("1998-03-02")),                         // offset 2
      (2L, t("1998-02-10"))).toDF("o_custkey", "o_orderdate")
    val out = Analytics.cohortRetention(orders, "o_custkey", "o_orderdate")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out === Set((199801L, 0, 1L), (199801L, 2, 1L), (199802L, 0, 1L)))
  }

  test("rrfFuse: cross-list agreement wins, single-list items fused correctly") {
    import graft.operators.Similarity
    def nanos(rank: Int) = math.round(1.0 / (60 + rank) * 1e9)
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 11 is rank-2 + rank-1 across lists: must beat both solo rank-1s
    assert(out.head._1 === 11L)
    assert(out.head._2 === nanos(2) + nanos(1))
    assert(out.head._3 === 2L)
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(10L) === nanos(1) && byId(13L) === nanos(2))
  }

  test("prefixDimTopK: full-dim re-rank corrects the coarse order inside the shortlist") {
    import graft.operators.Similarity
    // prefix (first 2 dims) ranks B over C, but the full vector ranks
    // C over B — with both inside the shortlist the exact pass must
    // flip them; D is prefix-orthogonal and must not enter top-2
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),    // query
      (1L, Array(1f, 0f, 1f, 0f)),    // B: perfect prefix, poor tail
      (2L, Array(0.9f, 0f, 0f, 0.9f)), // C: good prefix, perfect tail
      (3L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.prefixDimTopK(emb, emb.filter(col("vec_id") === 0),
        prefixDims = 2, shortlist = 3, k = 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(out === Seq(2L, 1L), s"got $out")
  }

  test("kneserNey: continuation beats raw frequency, fallback ladder hand-checked") {
    import graft.operators.LangModel
    // 'sf' is FREQUENT but only ever follows 'san' (the Francisco
    // shape); 'b' is rarer but follows many contexts. KN must price
    // P(sf | novel-context) BELOW P(b | novel-context) even though
    // c(sf) > c(b) — the continuation-count insight add-k lacks.
    val docs = Seq(
      (1L, "san sf x san sf y san sf z san sf"),
      (2L, "p b q b r b")).toDF("doc_id", "text")
    val (bg, ctx, cont, t) = LangModel.kneserNeyLm(docs, "text")
    def score(text: String): Double =
      LangModel.kneserNeyScore(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", bg, ctx, cont, t)
        .head().getDouble(2)
    // both bigrams unseen, both contexts unseen -> bare continuation:
    // nb(sf)=1 (only 'san sf'), nb(b)=3 ('p b','q b','r b')
    assert(score("zz sf") < score("zz b"),
      "frequent-but-single-context word must score below diverse-context word")
    // unseen w2 entirely -> probability floor
    val floor = score("zz qq")
    assert(math.abs(floor - math.log(1e-10)) < 1e-9)
    // seen bigram scores above any fallback
    assert(score("san sf") > score("zz b"))
  }

  test("editDistancePairs: block predicate plans as an equi join, never nested-loop") {
    // the blocking keys are the whole scale contract — if the equi
    // condition ever degrades (e.g. a refactor moves the levenshtein
    // bound into the join condition alone), the self-join falls back
    // to a nested-loop/cartesian plan that is quadratic in the corpus
    val docs = Seq((1L, "abcd efgh"), (2L, "abcd efgx")).toDF("doc_id", "text")
    val plan = Dedup.editDistancePairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocking must stay an equi join:\n$plan")
  }

  test("ewmaDaily: hand-computed recurrence, per-key independence, daily count grain") {
    import graft.ops.Analytics
    // key a: counts 4, 2, 1 on three days -> 4.0, 3.4, 2.68 at α=0.3;
    // key b: single day, seeds at its own count (no bleed from a)
    val rows = Seq(
      ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 11:00:00"),
      ("a", "2024-01-01 12:00:00"), ("a", "2024-01-01 13:00:00"),
      ("a", "2024-01-02 10:00:00"), ("a", "2024-01-02 11:00:00"),
      ("a", "2024-01-03 10:00:00"),
      ("b", "2024-01-02 10:00:00"),
      // key c: silent 01-02 must enter the recurrence as n=0 and
      // decay the baseline (2.0 -> 1.4 -> 1.28), not be skipped
      ("c", "2024-01-01 10:00:00"), ("c", "2024-01-01 11:00:00"),
      ("c", "2024-01-03 10:00:00"))
    val events = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Analytics.ewmaDaily(events, "event_type", "ts",
        alphaNum = 3, alphaDen = 10)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("a", "2024-01-01")) === ((4L, 4.0)))
    assert(out(("a", "2024-01-02")) === ((2L, 3.4)))
    assert(out(("a", "2024-01-03")) === ((1L, 2.68)))
    assert(out(("b", "2024-01-02")) === ((1L, 1.0)))
    assert(out(("c", "2024-01-01")) === ((2L, 2.0)))
    assert(out(("c", "2024-01-02")) === ((0L, 1.4)))
    assert(out(("c", "2024-01-03")) === ((1L, 1.28)))
    assert(out.size === 7)
  }

  test("editDistancePairs: normalization, blocking gates, threshold boundary") {
    val docs = Seq(
      (1L, "abcd efgh"),         // base
      (2L, "abcd efgx"),         // dist 1 from base
      (3L, "abcd!! efgh"),       // normalizes IDENTICAL to base
      (4L, "zbcd efgh"),         // different 4-char block -> never paired
      (5L, "abcd efgh 123456"),  // same block, different length band
      (6L, "abcd xxxx")          // same block+band, dist 4 > maxDist
    ).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 2, prefixLen = 16, blockChars = 4, lenBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
  }

  test("triangleStats: K4 + pendant, direction/dup/self-loop collapsed") {
    import graft.operators.Graph
    // K4 on 1..4, pendant 5-1; plus noise the canonicalization must
    // absorb: a reversed duplicate, an exact duplicate, a self-loop,
    // and a node (9) whose ONLY edge is a self-loop — it must keep
    // its identity as an explicit zero row, not vanish
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((2L, 1L), (3L, 4L), (5L, 1L), (3L, 3L), (9L, 9L)))
      .toDF("src", "dst")
    val out = Graph.triangleStats(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((4L, 3L, 0.5)))     // 2*3/(4*3)
    assert(out(2L) === ((3L, 3L, 1.0)))
    assert(out(3L) === ((3L, 3L, 1.0)))
    assert(out(4L) === ((3L, 3L, 1.0)))
    assert(out(5L) === ((1L, 0L, 0.0)))
    assert(out(9L) === ((0L, 0L, 0.0)))
    assert(out.size === 6)
  }

  test("triangleStats: degree-ordered counting matches naive enumeration on random graphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(0xe7)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(70)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val und = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val allNodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
      val nbrs = allNodes.map { v =>
        v -> und.collect { case (a, b) if a == v => b; case (a, b) if b == v => a }
      }.toMap
      val expected = nbrs.map { case (v, ns) =>
        val tri = ns.toSeq.combinations(2)
          .count { case Seq(x, y) => und((math.min(x, y), math.max(x, y))) }
        val d = ns.size
        val lcc = if (d > 1) BigDecimal(2.0 * tri / (d.toDouble * (d - 1)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
        v -> ((d.toLong, tri.toLong, lcc))
      }
      val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expected)
    }
  }

  test("pageRank: hand-computed iteration with dangling redistribution, mass conserved") {
    import graft.operators.Graph
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1 -> 2 -> 3, node 3 dangling
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 3
    val base = (1.0 - 0.85) / n
    val r0 = r9(1.0 / n)
    val dm = r0 // node 3's mass
    assert(out(1L) === r6(r9(base + 0.85 * (0.0 + dm / n))))
    assert(out(2L) === r6(r9(base + 0.85 * (r0 / 1 + dm / n))))
    assert(out(3L) === out(2L), "equal in-mass must give equal rank")
    assert(math.abs(out.values.sum - 1.0) < 1e-6, "rank mass conserved")
  }

  test("hits: pure authority gets 1.0, its two equal pointers split hub mass") {
    import graft.operators.Graph
    // 1 -> 3 <- 2: node 3 is the only authority, 1 and 2 are equal hubs
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(3L) === ((1.0, 0.0)))
    assert(out(1L) === ((0.0, 0.707107)))
    assert(out(2L) === ((0.0, 0.707107)))
  }

  test("personalized pageRank: rank concentrates on the teleport seed, off-graph seeds rejected") {
    import graft.operators.Graph
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1 -> 2, 2 -> 1; teleport entirely to node 1
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = Graph.pageRank(edges, "src", "dst", iters = 1,
        teleport = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // t = (1, 0); r0 = t; no dangling; r'(1) = 0.15*1 + 0.85*r0(2)/1 = 0.15
    // r'(2) = 0.15*0 + 0.85*r0(1)/1 = 0.85
    assert(out(1L) === r6(r9((1.0 - 0.85) * 1.0 + 0.85 * 0.0)))
    assert(out(2L) === r6(r9((1.0 - 0.85) * 0.0 + 0.85 * 1.0)))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges, "src", "dst", iters = 1,
        teleport = Some(Seq(99L).toDF("id"))))
  }

  test("rboAtK: identical rankings score 1, disjoint score 0, top-weighted ordering") {
    import graft.operators.Similarity
    def ranking(qid: Long, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (n, i) => (qid, i + 1, n) }
    // q1: identical; q2: disjoint; q3: agrees only at rank 1;
    // q4: agrees only at rank 3
    val A = (ranking(1, Seq(10, 11, 12)) ++ ranking(2, Seq(10, 11, 12)) ++
      ranking(3, Seq(10, 11, 12)) ++ ranking(4, Seq(10, 11, 12)))
      .toDF("qid", "rank", "nid")
    val B = (ranking(1, Seq(10, 11, 12)) ++ ranking(2, Seq(20, 21, 22)) ++
      ranking(3, Seq(10, 21, 22)) ++ ranking(4, Seq(20, 21, 12)))
      .toDF("qid", "rank", "nid")
    val out = Similarity.rboAtK(A, B, k = 3, p = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) === 0.0)
    // identical lists hit truncated-RBO's maximum (1-p)·sum p^(d-1):
    // the tail weight past k is deliberately unassigned at depth k
    val w = 1.0 - 0.9
    val maxRbo = BigDecimal(w * math.pow(0.9, 0) + w * math.pow(0.9, 1)
      + w * math.pow(0.9, 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === maxRbo, s"got $out")
    // rank-1 agreement must outweigh rank-3 agreement
    assert(out(3L) > out(4L), s"got $out")
  }

  test("vocabCoverage: top-V cut pinned, instance vs type OOV separated") {
    import graft.operators.Tokenizer
    val docs = Seq(("g1", "aa aa bb cc"), ("g2", "aa bb x cc cc"))
      .toDF("source", "text")
    // freqs: aa=3, bb=2, cc=3, x dropped (length 1); V=2 elects {aa, cc}
    // (freq desc, word asc: aa(3), cc(3), bb(2))
    val out = Tokenizer.vocabCoverage(docs, "text", "source", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("g1") === ((4L, 1L, 1L, 25.0)))   // bb OOV once
    assert(out("g2") === ((4L, 1L, 1L, 25.0)))   // bb OOV once, x excluded
  }

  test("embeddingDrift: hand-computed centroid cosine, zero drift for the global mean") {
    import graft.operators.Stats
    val emb = Seq((0, Array(1f, 0f)), (0, Array(1f, 0f)),
      (1, Array(0f, 1f)), (1, Array(0f, 1f))).toDF("label", "embedding")
    val out = Stats.embeddingDrift(emb, "label")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // global centroid [0.5, 0.5]; 1 - cos([1,0],[.5,.5]) = 1 - 1/sqrt(2)
    assert(out(0) === ((2L, 0.292893)))
    assert(out(1) === ((2L, 0.292893)))
  }

  test("mmrRerank: near-duplicate of the seed demoted below a diverse candidate") {
    import graft.operators.Similarity
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    // query at 0°; A(5°) is the relevance seed, B(10°) nearly duplicates
    // A, C(-30°) is less relevant but diverse — at lambda=0.5 MMR must
    // pick C second
    val emb = Seq((0L, v(0)), (10L, v(5)), (11L, v(10)), (12L, v(-30)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0),
        nCandidates = 3, k = 3, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out === Seq(10L, 12L, 11L), s"got $out")
  }

  test("journeyNgrams: trigram paths counted, incomplete tails dropped") {
    import graft.ops.Analytics
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-10 10:$m%02d:00")
    // user 1: a,b,c,b,c -> trigrams (a>b>c), (b>c>b), (c>b>c)
    // user 2: a,b -> too short for any trigram
    val ev = Seq((1L, 1L, "a", ts(1)), (2L, 1L, "b", ts(2)),
      (3L, 1L, "c", ts(3)), (4L, 1L, "b", ts(4)), (5L, 1L, "c", ts(5)),
      (6L, 2L, "a", ts(1)), (7L, 2L, "b", ts(2)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.journeyNgrams(ev, "user_id", "event_type", "ts",
        "event_id", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("a > b > c", 1L), ("b > c > b", 1L),
      ("c > b > c", 1L)))
  }

  test("booleanTopK: AND gate exact, ranked by distinct should coverage") {
    import graft.operators.Tfidf
    val docs = Seq(
      (1L, "x y both here z w"),     // no must terms
      (2L, "m1 m2 s1 s2"),           // both musts, 2 shoulds
      (3L, "m1 m2 s1 s1 s1"),        // both musts, 1 DISTINCT should
      (4L, "m1 s1 s2 s3"),           // missing m2 -> out
      (5L, "m2 m1"))                 // both musts, 0 shoulds
      .toDF("doc_id", "text")
    val out = Tfidf.booleanTopK(docs, "doc_id", "text",
        must = Seq("m1", "m2"), should = Seq("s1", "s2", "s3"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 2L), (3L, 1L), (5L, 0L)))
  }

  test("graphProfile: star is perfectly disassortative, regular ring undefined, reciprocity exact") {
    import graft.operators.Graph
    // directed square with ONE mutual edge: reciprocity 2/5; all
    // degrees equal -> assortativity UNDEFINED (null), never 0/0=NaN
    val square = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("s", "t")
    val r1 = Graph.profile(square, "s", "t").head()
    assert(r1.getLong(0) === 4L && r1.getLong(1) === 4L)
    assert(r1.getDouble(2) === 0.4 && r1.getLong(3) === 2L &&
      r1.getDouble(4) === 2.0)
    assert(r1.isNullAt(5))
    // star: hub degree 3 against three leaves -> r = -1 by hand
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "t")
    val r2 = Graph.profile(star, "s", "t").head()
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(5) === -1.0)
  }

  test("skewProfile: hot key share and ratio exact, null key profiled") {
    import graft.operators.Stats
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c") ++
      Seq(null.asInstanceOf[String])).toDF("k")
    val out = Stats.skewProfile(df, col("k"), topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val byKey = out.map(t => t._1 -> t).toMap
    assert(byKey("a") === (("a", 6L, 0.6, 2.4, 2.4)))
    assert(byKey("b") === (("b", 2L, 0.2, 0.8, 2.4)))
    assert(byKey("(null)")._2 === 1L)
    assert(out.length === 4)
  }

  test("pairRecall: canonicalizes pair order, counts hits as sets, null on empty denominators") {
    import graft.operators.Dedup
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("x", "y")
    val found = Seq((2L, 1L), (2L, 1L), (3L, 4L), (7L, 8L)).toDF("p", "q")
    val r = Dedup.pairRecall(found, truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 2L)))
    assert(r.getDouble(3) === 0.666667 && r.getDouble(4) === 0.666667)
    val empty = Seq.empty[(Long, Long)].toDF("p", "q")
    val r2 = Dedup.pairRecall(empty, truth).head()
    assert(r2.getLong(0) === 3L && r2.getDouble(3) === 0.0 && r2.isNullAt(4))
  }

  test("containmentPairs: planted prefix scores ~1 one-way where Jaccard is blind") {
    import graft.operators.Dedup
    // doc 2 is a strict 5-token prefix of doc 1's 40 tokens: its
    // shingles are a subset -> c(2 in 1) = 1.0 while Jaccard is small
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 5).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, "totally different text here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 2L, round4(3.0 / 38), 1.0)))
    // symmetric Jaccard on the same pair is tiny: 3/38 - the blind spot
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleSize = 3,
      threshold = 0.5, dfCap = 100).count() === 0L)
  }

  test("containmentPairs prefix filter loses NOTHING vs brute force") {
    import graft.operators.Dedup
    // 80 docs with planted prefixes/suffixes/mid-quotes at varied
    // lengths (3..40 tokens) so prefix-length arithmetic is exercised
    // across sizes, including tiny sets where ⌈(t−ε)·sz⌉ boundaries
    // bite; vocabulary overlaps so candidates aren't all trivial
    val base = (1 to 40).map { i =>
      val n = 3 + (i * 7) % 38
      (i.toLong, (0 until n).map(k => s"w${(i * 3 + k) % 60}").mkString(" "))
    }
    val planted = (1 to 40).flatMap { i =>
      if (i % 3 != 0) Nil else {
        val words = base(i - 1)._2.split(" ")
        val take = math.max(3, words.length / 2 + (i % 4))
        Seq((100L + i, words.take(take).mkString(" ")))
      }
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, dfCap = 1000)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    // brute force: every pair, exact shingle sets, same 4dp verify
    def shingles(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(3).filter(_.length == 3).toSet.toSet
    val sets = (base ++ planted).map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (i, a) <- sets; (j, b) <- sets if i < j
      inter = (a intersect b).size.toDouble
      if round4(inter / a.size) >= 0.8 || round4(inter / b.size) >= 0.8
    } yield (i, j)).toSet
    assert(want.nonEmpty, "fixture must plant real containments")
    assert(got === want)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("containmentPairs property: random corpora x thresholds x shingle sizes match brute force") {
    import graft.operators.Dedup
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random corpora over a small shared vocab (so candidates aren't
    // all trivial), with planted slices (prefix/mid/suffix quotes),
    // byte-identical duplicates, and docs shorter than the shingle
    // size (empty sets — excluded from the score, like the operator)
    val caseGen = for {
      k <- Gen.oneOf(2, 3, 4)
      t <- Gen.oneOf(0.5, 0.7, 0.8, 0.9, 1.0)
      nDocs <- Gen.choose(6, 16)
      texts <- Gen.listOfN(nDocs, Gen.choose(0, 18).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf((0 until 14).map(i => s"w$i")))
          .map(_.mkString(" "))))
      nSlices <- Gen.choose(1, 4)
      slices <- Gen.listOfN(nSlices, for {
        src <- Gen.choose(0, nDocs - 1)
        from <- Gen.choose(0, 6)
        len <- Gen.choose(1, 12)
      } yield (src, from, len))
      dupOf <- Gen.choose(0, nDocs - 1)
    } yield {
      val sliced = slices.zipWithIndex.map { case ((src, from, len), i) =>
        (1000L + i,
          texts(src).split(" ").filter(_.nonEmpty).slice(from, from + len)
            .mkString(" "))
      }
      val base = texts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      (k, t, base ++ sliced :+ (2000L -> texts(dupOf)))
    }
    val cases = (1 to 8).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(i.toLong)))
    var plantedTotal = 0
    cases.foreach { case (k, t, corpus) =>
      val docs = corpus.toDF("doc_id", "text")
      val got = Dedup.containmentPairs(docs, "doc_id", "text",
          shingleSize = k, threshold = t, dfCap = 1000)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
      // brute force: every pair, exact token-shingle sets, the same
      // 4dp verify the operator applies
      def shingles(s: String): Set[Seq[String]] =
        s.split(" ").filter(_.nonEmpty).toSeq.sliding(k)
          .filter(_.length == k).toSet
      val sets = corpus.map { case (id, s) => id -> shingles(s) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (i, a) <- sets; (j, b) <- sets if i < j
        inter = (a intersect b).size.toDouble
        if round4(inter / a.size) >= t || round4(inter / b.size) >= t
      } yield (i, j)).toSet
      plantedTotal += want.size
      assert(got === want,
        s"shingleSize=$k threshold=$t corpus=${corpus.take(4)}... " +
          s"missing=${(want -- got).take(5)} spurious=${(got -- want).take(5)}")
    }
    assert(plantedTotal > 0, "generator must produce real containments")
  }

  test("kaplanMeier: hand-computed curve, censoring shrinks risk sets without stepping S") {
    import graft.ops.Analytics
    // events at t=2 (x2) and t=5; censored at t=3 and t=7:
    // S(2) = 1-2/5 = 0.6; the t=3 censor leaves S untouched but
    // shrinks the t=5 risk set to 2 -> S(5) = 0.6 * (1-1/2) = 0.3
    val df = Seq((2L, true), (2L, true), (3L, false), (5L, true),
      (7L, false)).toDF("t", "e")
    val out = Analytics.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq((2L, 5L, 2L, 0L, 0.6), (5L, 2L, 1L, 0L, 0.3)))
  }

  test("ngramJaccardPairs property: random corpora x thresholds x shingle sizes match brute force") {
    import graft.operators.Dedup
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      k <- Gen.oneOf(2, 3)
      t <- Gen.oneOf(0.3, 0.5, 0.7, 0.9)
      nDocs <- Gen.choose(6, 14)
      texts <- Gen.listOfN(nDocs, Gen.choose(0, 16).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf((0 until 10).map(i => s"w$i")))
          .map(_.mkString(" "))))
      dupOf <- Gen.choose(0, nDocs - 1)
      sliceOf <- Gen.choose(0, nDocs - 1)
    } yield {
      val base = texts.zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      val near = texts(sliceOf).split(" ").filter(_.nonEmpty)
      (k, t, base ++ Seq(
        (1000L, texts(dupOf)),                    // exact dup: j = 1
        (1001L, (near :+ "w99").mkString(" ")))) // near dup
    }
    val cases = (1 to 8).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(600L + i)))
    var plantedTotal = 0
    cases.foreach { case (k, t, corpus) =>
      val docs = corpus.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleSize = k, threshold = t, dfCap = 1000)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
      def shingles(s: String): Set[Seq[String]] =
        s.split(" ").filter(_.nonEmpty).toSeq.sliding(k)
          .filter(_.length == k).toSet
      val sets = corpus.map { case (id, s) => id -> shingles(s) }
        .filter(_._2.nonEmpty)
      val want = (for {
        (i, a) <- sets; (j, b) <- sets if i < j
        inter = (a intersect b).size.toDouble
        if round4(inter / (a.size + b.size - inter)) >= t
      } yield (i, j)).toSet
      plantedTotal += want.size
      assert(got === want,
        s"shingleSize=$k threshold=$t missing=${(want -- got).take(5)} " +
          s"spurious=${(got -- want).take(5)}")
    }
    assert(plantedTotal > 0, "generator must produce real near-dups")
  }

  test("kaplanMeier property: random censored corpora match the reference fold") {
    import graft.ops.Analytics
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        t <- Gen.choose(0L, 15L) // heavy ties + zero durations
        e <- Gen.oneOf(true, false)
      } yield (t, e))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { rows =>
      // reference: ascending sequential product over the time grain —
      // the operator's own determinism contract, multiplied in the
      // identical order so doubles agree bit-for-bit before rounding
      val grain = rows.groupBy(_._1).map { case (t, g) =>
        (t, g.count(_._2).toLong, g.size.toLong) }.toSeq.sortBy(_._1)
      val total = rows.size.toLong
      var s = 1.0
      var atRisk = total
      val want = grain.flatMap { case (t, d, l) =>
        s *= 1.0 - d.toDouble / atRisk
        val row = if (d > 0) Some((t, atRisk, d, l - d, round6(s))) else None
        atRisk -= l
        row
      }
      val got = Analytics.kaplanMeier(rows.toDF("t", "e"), col("t"), col("e"))
        .orderBy("t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSeq
      assert(got === want, s"rows=${rows.take(8)}... n=${rows.size}")
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("auc property: random scored corpora match brute-force pair counting") {
    import graft.operators.Ranking
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(2, 80)
      rows <- Gen.listOfN(n, for {
        y <- Gen.oneOf(true, false)
        s <- Gen.choose(0, 20) // heavy score ties
      } yield (y, s.toDouble / 7.0))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(200L + i)))
    cases.foreach { rows =>
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filterNot(_._1).map(_._2)
      val r = Ranking.auc(rows.toDF("y", "s"), col("s"), col("y")).head()
      assert((r.getLong(0), r.getLong(1)) === ((pos.size.toLong, neg.size.toLong)))
      if (pos.nonEmpty && neg.nonEmpty) {
        // brute force: P(score_pos > score_neg) + P(tie)/2 over every
        // (pos, neg) pair, exact integer numerator
        val conc = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        val want = round6(conc.toDouble / (2.0 * pos.size * neg.size))
        assert(r.getDouble(2) === want, s"n=${rows.size}")
      } else assert(r.isNullAt(2), "one-class AUC must be null")
    }
  }

  test("ksTest property: random two-sample corpora match the brute-force sup") {
    import graft.operators.Stats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(2, 80)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(true, false)
        v <- Gen.choose(-12, 12)
      } yield (a, v.toDouble / 3.0))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(300L + i)))
    cases.foreach { rows =>
      val a = rows.filter(_._1).map(_._2)
      val b = rows.filterNot(_._1).map(_._2)
      val r = Stats.ksTest(rows.toDF("a", "v"), col("a"), col("v")).head()
      assert((r.getLong(0), r.getLong(1)) === ((a.size.toLong, b.size.toLong)))
      if (a.nonEmpty && b.nonEmpty) {
        // brute force over the distinct-value grain: exact integer sup
        // |cumA·nB − cumB·nA|, one division, same 6dp rounding
        val values = (a ++ b).distinct.sorted
        val dnum = values.map(v =>
          math.abs(a.count(_ <= v).toLong * b.size -
            b.count(_ <= v).toLong * a.size)).max
        val dStat = dnum.toDouble / (a.size.toDouble * b.size.toDouble)
        val crit = 1.358 * math.sqrt(
          (a.size + b.size).toDouble / (a.size.toDouble * b.size.toDouble))
        assert(r.getDouble(2) === round6(dStat), s"n=${rows.size}")
        assert(r.getDouble(3) === round6(crit))
        assert(r.getBoolean(4) === (dStat > crit))
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
          "one-sample KS must be null")
      }
    }
  }

  test("mannWhitneyU property: random two-group corpora match the rank-sum reference") {
    import graft.operators.Stats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(2, 70)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(true, false)
        v <- Gen.choose(0, 15) // tie-heavy
      } yield (a, v.toDouble / 4.0))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(400L + i)))
    cases.foreach { rows =>
      val nA = rows.count(_._1).toDouble
      val nB = rows.size - nA
      // reference: tie-averaged ranks over the distinct-value grain
      // (half-integers — exact in doubles), the operator's own formulas
      val grain = rows.groupBy(_._2).map { case (v, g) =>
        (v, g.size.toLong, g.count(_._1).toLong) }.toSeq.sortBy(_._1)
      var before = 0L
      var (ra, ties) = (0.0, 0.0)
      grain.foreach { case (_, c, ca) =>
        val avgRank = (before + 1) + (c - 1) / 2.0
        ra += ca * avgRank
        ties += (c.toDouble * c * c - c)
        before += c
      }
      val n = nA + nB
      val u = ra - nA * (nA + 1) / 2.0
      val r = Stats.mannWhitneyU(rows.toDF("a", "v"), col("a"), col("v")).head()
      assert((r.getLong(0), r.getLong(1)) === ((nA.toLong, nB.toLong)))
      assert(r.getDouble(2) === round4(u), s"u on n=${rows.size}")
      val sigma2 = nA * nB / 12.0 * ((n + 1) - ties / (n * (n - 1)))
      if (nA > 0 && nB > 0 && sigma2 > 0.0)
        assert(r.getDouble(3) === round4((u - nA * nB / 2.0) /
          math.sqrt(sigma2)), s"z on n=${rows.size}")
      else assert(r.isNullAt(3), "degenerate z must be null")
    }
  }

  test("spearman property: random metric pairs match the tie-averaged-rank reference") {
    import graft.operators.Stats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(2, 70)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 12)
        y <- Gen.choose(0, 12)
      } yield (x.toDouble / 3.0, x.toDouble / 6.0 + y.toDouble / 5.0))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(500L + i)))
    cases.foreach { rows =>
      // reference: DOUBLED tie-averaged ranks (exact longs), BigInt
      // sums, then the operator's one pinned double expression
      def doubledRanks(vs: Seq[Double]): Map[Double, Long] = {
        val grain = vs.groupBy(identity).map { case (v, g) =>
          (v, g.size.toLong) }.toSeq.sortBy(_._1)
        var before = 0L
        grain.map { case (v, c) =>
          val r2 = 2 * (before + 1) + c - 1
          before += c
          v -> r2
        }.toMap
      }
      val rx = doubledRanks(rows.map(_._1))
      val ry = doubledRanks(rows.map(_._2))
      val pairs = rows.map { case (x, y) => (BigInt(rx(x)), BigInt(ry(y))) }
      val nBI = BigInt(rows.size)
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val nD = rows.size.toDouble
      val cov = nD * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = nD * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = nD * syy.toDouble - sy.toDouble * sy.toDouble
      val r = Stats.spearman(rows.toDF("x", "y"), col("x"), col("y")).head()
      assert(r.getLong(0) === rows.size.toLong)
      if (vx > 0.0 && vy > 0.0)
        assert(r.getDouble(1) === round6(cov / math.sqrt(vx * vy)),
          s"rho on n=${rows.size}")
      else assert(r.isNullAt(1), "constant-column rho must be null")
    }
  }

  test("logRank property: random two-group corpora match the reference fold") {
    import graft.ops.Analytics
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      n <- Gen.choose(4, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(true, false)
        t <- Gen.choose(0L, 12L)
        e <- Gen.oneOf(true, false)
      } yield (a, t, e))
    } yield rows
    val cases = (1 to 6).flatMap(i =>
      caseGen(Gen.Parameters.default, Seed(100L + i)))
    cases.foreach { rows =>
      // reference: ascending fold over event times with d>0 and n>1,
      // hypergeometric E/V terms accumulated in time order (the
      // operator's declared sequential-fold contract)
      val nA = rows.count(_._1).toLong
      val nB = rows.size - nA
      val grain = rows.groupBy(_._2).map { case (t, g) =>
        (t, g.count(p => p._1 && p._3).toLong, g.count(_._3).toLong,
          g.count(_._1).toLong, g.size.toLong) }.toSeq.sortBy(_._1)
      var (riskA, risk) = (nA, rows.size.toLong)
      var (oA, e, v) = (0L, 0.0, 0.0)
      grain.foreach { case (_, d1, d, l1, l) =>
        if (d > 0 && risk > 1) {
          oA += d1
          e += riskA.toDouble * d / risk
          v += d * (riskA.toDouble / risk) * (1.0 - riskA.toDouble / risk) *
            ((risk - d).toDouble / (risk - 1))
        }
        riskA -= l1; risk -= l
      }
      val r = Analytics.logRank(rows.toDF("a", "t", "e"),
        col("a"), col("t"), col("e")).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((nA, nB, oA)),
        s"counts mismatch on rows=${rows.take(6)}...")
      assert(r.getDouble(3) === round6(e), "e_a")
      assert(r.getDouble(4) === round6(v), "var_a")
      val chi2 = if (v > 0.0) Some(round4((oA - e) * (oA - e) / v)) else None
      assert(Option(if (r.isNullAt(5)) null else r.getDouble(5))
        .map(_.asInstanceOf[Double]) === chi2, "chi2")
    }
  }

  test("survival family: bounded-grain contract fails loud past maxGrain") {
    import graft.ops.Analytics
    // 20 distinct second-granularity-ish durations: over a maxGrain
    // of 10 the sequential fold's contract is violated and every
    // operator in the family must throw BEFORE collapsing to one task
    val wide = (1 to 20).map(i => (i.toLong, i % 2 == 0, i % 3 == 0))
      .toDF("t", "e", "a")
    val e1 = intercept[IllegalArgumentException] {
      Analytics.kaplanMeier(wide, col("t"), col("e"), maxGrain = 10L)
    }
    assert(e1.getMessage.contains("maxGrain=10"))
    val e2 = intercept[IllegalArgumentException] {
      Analytics.logRank(wide, col("a"), col("t"), col("e"), maxGrain = 10L)
    }
    assert(e2.getMessage.contains("maxGrain=10"))
    // grouped variant: the contract is PER GROUP — group "big" has 20
    // distinct durations, "small" has 2; maxGrain=10 throws on big...
    val grouped = wide.withColumn("g", lit("big"))
      .unionByName(Seq((100L, true), (101L, true))
        .toDF("t", "e").withColumn("a", lit(false))
        .withColumn("g", lit("small")).select("t", "e", "a", "g"))
    val e3 = intercept[IllegalArgumentException] {
      Analytics.kaplanMeierBy(grouped, col("g"), col("t"), col("e"),
        maxGrain = 10L)
    }
    assert(e3.getMessage.contains("kaplanMeierBy"))
    // ...while a maxGrain at the largest group's grain passes (the
    // bound is the max single group, not the summed grain of 22)
    assert(Analytics.kaplanMeierBy(grouped, col("g"), col("t"), col("e"),
      maxGrain = 20L).count() > 0)
    // bounded grains under the default ceiling are untouched
    assert(Analytics.kaplanMeier(wide, col("t"), col("e")).count() > 0)
    // a nonsensical ceiling is rejected up front
    intercept[IllegalArgumentException] {
      Analytics.kaplanMeier(wide, col("t"), col("e"), maxGrain = 0L)
    }
  }

  test("mannWhitneyU: hand-computed with and without ties, exact rank arithmetic") {
    import graft.operators.Stats
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // no ties: A = {1,2}, B = {3,4} -> U = 0, z = -2/sqrt(5/3)
    val df = Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0))
      .toDF("a", "v")
    val r = Stats.mannWhitneyU(df, col("a"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2))
      === ((2L, 2L, 0.0)))
    assert(r.getDouble(3) === r4(-2.0 / math.sqrt(5.0 / 3.0)))
    // ties: A = {1,1}, B = {1,2}: avg rank of the 1s is 2.0,
    // tie-corrected sigma^2 = 1 exactly -> z = -1
    val t = Seq((true, 1.0), (true, 1.0), (false, 1.0), (false, 2.0))
      .toDF("a", "v")
    val rt = Stats.mannWhitneyU(t, col("a"), col("v")).head()
    assert(rt.getDouble(2) === 1.0 && rt.getDouble(3) === -1.0)
    // all values tied: sigma^2 = 0 -> z null
    val allTied = Seq((true, 5.0), (false, 5.0)).toDF("a", "v")
    assert(Stats.mannWhitneyU(allTied, col("a"), col("v")).head().isNullAt(3))
  }

  test("psi: identical sides score exactly 0, a planted shift scores positive") {
    import graft.operators.Stats
    val same = ((1 to 50).map(i => (true, i.toDouble)) ++
      (1 to 50).map(i => (false, i.toDouble))).toDF("p", "v")
    val r0 = Stats.psi(same, col("p"), col("v"), 0.0, 50.0, 5).head()
    assert(r0.getAs[Double]("psi") === 0.0)
    // q-side mass moved into the top bins
    val shifted = ((1 to 50).map(i => (true, i.toDouble)) ++
      (1 to 50).map(i => (false, 25.0 + i / 2.0))).toDF("p", "v")
    val r1 = Stats.psi(shifted, col("p"), col("v"), 0.0, 50.0, 5).head()
    assert(r1.getAs[Double]("psi") > 0.1)
  }

  test("twoProportionZ: hand-computed z, degenerate variance yields null") {
    import graft.operators.Stats
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = ((1 to 10).map(i => (true, i <= 5)) ++
      (1 to 10).map(i => (false, i <= 2))).toDF("arm", "s")
    val r = Stats.twoProportionZ(df, col("arm"), col("s")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      === ((10L, 5L, 10L, 2L)))
    val pool = 7.0 / 20
    val se2 = pool * (1.0 - pool) * (1.0 / 10 + 1.0 / 10)
    assert(r.getDouble(6) === r4((0.5 - 0.2) / math.sqrt(se2)))
    // everyone converts: zero pooled variance, z undefined -> null
    val all = Seq((true, true), (false, true)).toDF("arm", "s")
    assert(Stats.twoProportionZ(all, col("arm"), col("s")).head().isNullAt(6))
  }

  test("benford: structural digit, sub-1 excluded, shares exact") {
    import graft.operators.Stats
    val df = Seq(1.0, 12.0, 15.0, 0.3, 25.0).toDF("v")
    val out = Stats.benford(df, col("v")).orderBy("digit").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq((1, 3L, 0.75), (2, 1L, 0.25)))
    // 0.3 was excluded (no leading digit), and chi2 is shared per row
    assert(out.map(_.getDouble(5)).distinct.length === 1)
  }

  test("categoricalAssociation: perfect dependence gives V = 1, MI = ln 2") {
    import graft.operators.Stats
    val df = (Seq.fill(5)(("x", 1)) ++ Seq.fill(5)(("y", 2))).toDF("a", "b")
    val r = Stats.categoricalAssociation(df, col("a"), col("b")).head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("chi2") === 10.0)
    assert(r.getAs[Double]("cramers_v") === 1.0)
    assert(r.getAs[Double]("mi") === 0.693147) // ln 2, 6dp
    // a constant column makes V undefined (0/0) -> null, never NaN
    val const = Seq(("x", 1), ("x", 2)).toDF("a", "b")
    val rc = Stats.categoricalAssociation(const, col("a"), col("b")).head()
    assert(rc.isNullAt(rc.fieldIndex("cramers_v")))
  }

  test("revenueConcentration: equal revenues gini 0; concentration hand-checked") {
    import graft.ops.Analytics
    val eq = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("c", "amt")
    val g0 = Analytics.revenueConcentration(eq, "c", "amt", nBands = 2)
      .head().getAs[Double]("gini")
    assert(g0 === 0.0)
    val skew = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 5.0)).toDF("c", "amt")
    val out = Analytics.revenueConcentration(skew, "c", "amt", nBands = 2)
      .orderBy("band").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    // G = 2*(1+2+3+20)/(4*8) - 5/4 = 0.375
    assert(out.toSeq === Seq((1, 2L, 2.0, 0.25, 0.375),
      (2, 2L, 6.0, 1.0, 0.375)))
  }

  test("skyline2d: dominance exact vs NOT-EXISTS, duplicates collapse, bucket-independent") {
    import graft.ops.Analytics
    val pts = Seq((1.0, 5), (1.0, 5), (2.0, 7), (2.0, 6), (3.0, 7),
      (0.5, 3), (4.0, 8), (4.0, 1), (2.5, 7))
      .toDF("x", "y")
    def naive = {
      val d = pts.groupBy("x", "y").count().collect()
        .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
      d.filter { case (x, y, _) => !d.exists { case (qx, qy, _) =>
        qx <= x && qy >= y && (qx < x || qy > y) } }.sortBy(p => (p._1, p._2))
    }
    for (buckets <- Seq(1, 2, 64)) {
      val got = Analytics.skyline2d(pts, col("x"), col("y"), buckets)
        .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
      assert(got.toSeq === naive.toSeq, s"buckets=$buckets")
    }
    // the duplicated frontier point carries its collapse count
    assert(naive.contains((1.0, 5, 2L)))
    // (3.0, 7) is dominated by (2.0, 7); (2.5, 7) likewise
    assert(!naive.exists(p => p._1 == 3.0 || p._1 == 2.5))
  }

  test("theilSenDaily: one outlier day cannot drag the median slope") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 08:00:00.${i}%06d")
    // counts 1,2,3,100,5 over 5 consecutive days: 8 of 10 pairwise
    // slopes are 1, so the median holds 1.0 against the spike (an OLS
    // fit would report ~12)
    val counts = Seq(1, 2, 3, 100, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("k", ts(di + 1, i)))
    }
    val r = Analytics.theilSenDaily(rows.toDF("k", "ts"), "k", "ts").head()
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Double]("slope") === 1.0)
    // residuals n - 1*ord are (1-ord0) four times and (97-ord0) once
    val ord0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay.toDouble
    assert(r.getAs[Double]("intercept") === 1.0 - ord0)
    // a single-day key has no pairs: it must come back with a null
    // trend, not vanish from the output
    val one = Analytics.theilSenDaily(
      Seq(("solo", ts(9, 0))).toDF("k", "ts"), "k", "ts").head()
    assert(one.getAs[Long]("n_days") === 1L && one.isNullAt(2) &&
      one.isNullAt(3))
  }

  test("cusumDaily: persistent level shift alarms where per-day z never would") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-04-$day%02d 08:00:00.${i}%06d")
    // 8 days at 10 then 4 days at 25: mu = 15, k = 3.75, h = 18.75;
    // hi climbs 6.25/day through the shift and alarms on day 12 only
    // (day 11 reaches exactly h, and the alarm is strict >)
    val counts = Seq.fill(8)(10) ++ Seq.fill(4)(25)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("k", ts(di + 1, i)))
    }
    val out = Analytics.cusumDaily(rows.toDF("k", "ts"), "k", "ts",
        kDen = 4, hMult = 5)
      .orderBy("day").collect()
    val hi = out.map(_.getDouble(3))
    val alarms = out.map(_.getBoolean(5))
    assert(hi.take(8).forall(_ === 0.0))
    assert(hi.drop(8).toSeq === Seq(6.25, 12.5, 18.75, 25.0))
    assert(alarms.toSeq === Seq.fill(11)(false) :+ true)
    // the low side accumulated during the below-mean baseline but
    // never reached h
    val lo = out.map(_.getDouble(4))
    assert(lo(7) === 10.0 && lo.forall(_ < 18.75))
  }

  test("phraseSearch: overlapping matches counted, boundaries exact, 1-based pos") {
    import graft.operators.Tfidf
    val docs = Seq(
      (1L, "a table table table b"), // two OVERLAPPING "table table"
      (2L, "table x table"),         // tokens present, phrase absent
      (3L, "table table"),           // exact-doc match at pos 1
      (4L, "no match here"))
      .toDF("doc_id", "text")
    val out = Tfidf.phraseSearch(docs, "doc_id", "text",
        Seq("table", "table"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 2L, 2L), (3L, 1L, 1L)))
    // a 3-token phrase crosses both joins
    val tri = Tfidf.phraseSearch(docs, "doc_id", "text",
        Seq("table", "table", "table"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri === Array((1L, 1L, 2L)))
  }

  test("rankEval: hand-computed nDCG/MRR/AP, unjudged query yields nulls") {
    import graft.operators.Ranking
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val run = Seq((1L, "A", 1), (1L, "B", 2), (1L, "C", 3),
      (2L, "X", 1)).toDF("query", "doc", "rank")
    // D is relevant but never retrieved: it lowers nDCG via the ideal
    // and AP via n_rel, exactly what a run must be punished for
    val qrels = Seq((1L, "B", 2L), (1L, "C", 1L), (1L, "D", 3L))
      .toDF("query", "doc", "grade")
    val out = Ranking.rankEval(run, qrels, k = 3)
      .orderBy("query").collect()
    val w = Ranking.dcgDiscounts(3).map(_._2) // 1, 1/log2(3), 0.5
    val q1 = out(0)
    assert(q1.getLong(1) === 3L)
    assert(q1.getDouble(2) === 0.5) // first hit at rank 2
    assert(q1.getDouble(3) === r6((1.0 / 2 + 2.0 / 3) / 3)) // AP
    assert(q1.getDouble(4) ===
      r6((2 * w(1) + 1 * w(2)) / (3 * w(0) + 2 * w(1) + 1 * w(2))))
    val q2 = out(1)
    assert(q2.getLong(1) === 0L && q2.isNullAt(2) && q2.isNullAt(3) &&
      q2.isNullAt(4))
    // a 0-based run fails loudly instead of silently dropping its top
    // document at the discount join
    val zeroBased = Seq((1L, "A", 0), (1L, "B", 1)).toDF("query", "doc", "rank")
    val err = intercept[Exception] {
      Ranking.rankEval(zeroBased, qrels, k = 3).collect()
    }
    assert(err.getMessage.contains("1-based") ||
      Option(err.getCause).exists(_.getMessage.contains("1-based")))
  }

  test("linkPrediction: square graph hand-checked, adjacency excluded, hub cap") {
    import graft.operators.Graph
    // square 1-2-3-4-1 (one edge duplicated + reversed to prove
    // collapse): the two diagonals are the only distance-2 pairs
    val square = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 2L))
      .toDF("s", "t")
    val out = Graph.linkPrediction(square, "s", "t", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(out === Set((1L, 3L, 2L, 1.0, 1.0), (2L, 4L, 2L, 1.0, 1.0)))
    // closing one diagonal removes it from candidates and re-weights
    // the other: centers 1 and 3 now have degree 3 -> ra = 2/3
    val withDiag = square.unionByName(Seq((1L, 3L)).toDF("s", "t"))
    val out2 = Graph.linkPrediction(withDiag, "s", "t", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(out2 === Set((2L, 4L, 2L, 0.666667, 1.0)))
    // the hub cap drops high-degree centers (and reports nothing here:
    // both shared neighbors exceed the cap)
    assert(Graph.linkPrediction(withDiag, "s", "t", topN = 10,
      maxCenterDegree = 2).count() === 0L)
  }

  test("holtDaily: hand-computed recurrence, negative trend rounds by floor-div") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00.${i}%06d")
    // counts 10, 10, 4, 4: a downturn drives the trend state negative,
    // the exact case truncating div would round wrong
    val counts = Seq(10, 10, 4, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("k", ts(di + 1, i)))
    }
    val out = Analytics.holtDaily(rows.toDF("k", "ts"), "k", "ts",
        alphaNum = 3, alphaDen = 10, betaNum = 2, betaDen = 10)
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // hand-run: l = 10, 10, 8.2, 6.688; b = 0, 0, -0.36, -0.5904
    assert(out === Array(
      (10.0, 0.0, 10.0), (10.0, 0.0, 10.0),
      (8.2, -0.36, 7.84), (6.688, -0.5904, 6.0976)))
  }

  test("winsorizedStats: cuts clip the planted outlier, clip counts exact") {
    import graft.operators.Stats
    // group A: 1..19 plus a 10000 outlier; p05 cut 1.95, p95 cut
    // (19 values 1..19 + outlier): quantile_cont over 20 values
    val df = ((1 to 19).map(i => ("A", i.toDouble)) :+ ("A", 10000.0))
      .toDF("g", "v")
    val r = Stats.winsorizedStats(df, col("g"), col("v"), 0.05, 0.95).head()
    val lo = r.getAs[Double]("lo_cut"); val hi = r.getAs[Double]("hi_cut")
    // quantile_cont: p05 over sorted[1..19,10000] = 1 + 0.95*(2-1)
    // 6dp-rounded quantile_cont cuts: p05 = 1 + 0.95*(2-1), p95 =
    // 19 + 0.05*(10000-19) = 518.05 — compared against the rounded
    // literal, not a re-derived float expression
    assert(lo === 1.95)
    assert(hi === 518.05)
    assert(r.getAs[Long]("n_clipped_lo") === 1L)
    assert(r.getAs[Long]("n_clipped_hi") === 1L)
    // winsorized mean is outlier-resistant: far below the raw mean
    assert(r.getAs[Double]("mean_wins") < 60.0)
    assert(r.getAs[Double]("mean_raw") > 500.0)
    // a NULL row is not a sample: identical stats with one mixed in
    // (unguarded, least/greatest would clip it to hi_cut and count it)
    val withNull = df.unionByName(
      Seq(("A", null.asInstanceOf[java.lang.Double])).toDF("g", "v"))
    val r2 = Stats.winsorizedStats(withNull, col("g"), col("v"), 0.05, 0.95)
      .head()
    assert(r2.getAs[Long]("n") === 20L && r2.getAs[Double]("mean_wins")
      === r.getAs[Double]("mean_wins"))
  }

  test("dailyAnomalies: spike flags against trailing baseline, silent day scores as zero") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:${i % 60}%02d.${i}%06d")
    // key k: days 1-7 have 4,5,6,4,5,6,4 events; day 8 is SILENT
    // (zero, densified); day 9 has 30 events (the spike)
    val counts = Seq(4, 5, 6, 4, 5, 6, 4, 0, 30)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("k", ts(di + 1, i)))
    }
    val out = Analytics.dailyAnomalies(rows.toDF("k", "ts"), "k", "ts",
        window = 7, zThresh = 2.0)
      .orderBy("day").collect()
    assert(out.length === 9)
    val byDay = out.map(r => r.getDate(1).toString -> r).toMap
    // day 8 exists with n=0 (densified) and is flagged: an outage IS
    // an anomaly vs a ~4.9 baseline
    val d8 = byDay("2024-01-08")
    assert(d8.getLong(2) === 0L && d8.getBoolean(5), s"day8: $d8")
    // day 9's spike flags high
    val d9 = byDay("2024-01-09")
    assert(d9.getLong(2) === 30L && d9.getBoolean(5) &&
      d9.getDouble(4) > 2.0, s"day9: $d9")
    // days 1-3: under minPeriods, z null, never flagged
    assert(byDay("2024-01-01").isNullAt(4) && !byDay("2024-01-01").getBoolean(5))
    assert(byDay("2024-01-03").isNullAt(4))
  }

  test("attribution: models conserve total revenue; first/last/linear hand-checked") {
    import graft.ops.Analytics
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-10 10:$m%02d:00")
    // user 1: view@1, click@2, view@3, purchase@4 (v=100)
    //   first=view, last=view, linear: view 2/3, click 1/3
    // user 2: purchase@5 (v=50) with no touches -> (none)
    // user 3: touch AFTER its purchase only -> (none)
    val ev = Seq(
      (1L, 1L, "view", ts(1), null.asInstanceOf[java.lang.Double]),
      (2L, 1L, "click", ts(2), null.asInstanceOf[java.lang.Double]),
      (3L, 1L, "view", ts(3), null.asInstanceOf[java.lang.Double]),
      (4L, 1L, "purchase", ts(4), java.lang.Double.valueOf(100.0)),
      (5L, 2L, "purchase", ts(5), java.lang.Double.valueOf(50.0)),
      (6L, 3L, "purchase", ts(6), java.lang.Double.valueOf(25.0)),
      (7L, 3L, "view", ts(7), null.asInstanceOf[java.lang.Double]))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Analytics.attribution(ev, "user_id", "event_type", "ts",
        "event_id", "value", "purchase", Seq("view", "click"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("view") === ((2L, 100.0, 100.0, 66.67)))
    assert(out("click") === ((1L, 0.0, 0.0, 33.33)))
    assert(out("(none)") === ((2L, 75.0, 75.0, 75.0)))
    // conservation: every model's column sums to total conversion value
    Seq(2, 3, 4).foreach { i =>
      val tot = out.values.map(v => i match {
        case 2 => v._2; case 3 => v._3; case _ => v._4
      }).sum
      assert(math.abs(tot - 175.0) < 0.011, s"model col $i sums to $tot")
    }
  }

  test("sessionize: gap splits, tie-break on id, exact durations") {
    import graft.ops.Analytics
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-10 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "view", ts(10, 0)), (2L, 1L, "click", ts(10, 20)),
      (3L, 1L, "view", ts(11, 30)), // 70-min gap -> new session
      (4L, 2L, "view", ts(9, 0)))   // other user independent
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.sessionize(ev, "user_id", "event_type", "ts",
        "event_id", gapMinutes = 30)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    assert(out === Array(
      (1L, 1L, 2L, 2L, 20L * 60L * 1000000L),
      (1L, 2L, 1L, 1L, 0L),
      (2L, 1L, 1L, 1L, 0L)))
  }

  test("spearman: monotone ±1, hand-computed ties, constant column null") {
    import graft.operators.Stats
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Stats.spearman(up, col("x"), col("y")).head().getDouble(1) === 1.0)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Stats.spearman(down, col("x"), col("y")).head().getDouble(1)
      === -1.0)
    // ties on x: doubled ranks rx2 = (3,3,6), ry2 = (2,4,6);
    // cov = 18, vx = 18, vy = 24 -> rho = 18/sqrt(432) = 0.866025
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    assert(Stats.spearman(tied, col("x"), col("y")).head().getDouble(1)
      === 0.866025)
    // constant x: zero rank variance -> null, n still reported
    val const = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val rc = Stats.spearman(const, col("x"), col("y")).head()
    assert(rc.getLong(0) === 2L && rc.isNullAt(1))
  }

  test("ksTest: identical D=0, disjoint D=1, interleaved hand-computed") {
    import graft.operators.Stats
    val same = Seq((true, 1.0), (true, 2.0), (false, 1.0), (false, 2.0))
      .toDF("a", "v")
    val r0 = Stats.ksTest(same, col("a"), col("v")).head()
    assert(r0.getAs[Double]("d") === 0.0 && !r0.getAs[Boolean]("reject_05"))
    val disj = Seq((true, 1.0), (true, 2.0), (false, 3.0), (false, 4.0))
      .toDF("a", "v")
    val r1 = Stats.ksTest(disj, col("a"), col("v")).head()
    // D = 1 but n = 2+2 keeps crit at 1.358 — tiny samples never reject
    assert(r1.getAs[Double]("d") === 1.0 && !r1.getAs[Boolean]("reject_05"))
    // A={1,3}, B={2,4}: sup at v=1 or 3, |cumA·nB − cumB·nA| = 2 -> D = 0.5
    val mix = Seq((true, 1.0), (true, 3.0), (false, 2.0), (false, 4.0))
      .toDF("a", "v")
    assert(Stats.ksTest(mix, col("a"), col("v")).head()
      .getAs[Double]("d") === 0.5)
  }

  test("olsDaily: exact line recovered, constant r2 null, single day null") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00.${i}%06d")
    // day counts 3, 5, 7 = 2x + 3: a perfect fit
    val line = Seq(3, 5, 7).zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("a", ts(di + 1, i)))
    }
    val r = Analytics.olsDaily(line.toDF("k", "ts"), "k", "ts").head()
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      === ((3L, 2.0, 3.0, 1.0)))
    // constant series: slope 0, zero y-variance -> r2 null
    val flat = Seq(4, 4).zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("a", ts(di + 1, i)))
    }
    val rf = Analytics.olsDaily(flat.toDF("k", "ts"), "k", "ts").head()
    assert(rf.getDouble(2) === 0.0 && rf.getDouble(3) === 4.0 && rf.isNullAt(4))
    // single day: zero x-variance -> everything null, key still present
    val one = (0 until 2).map(i => ("a", ts(1, i)))
    val r1 = Analytics.olsDaily(one.toDF("k", "ts"), "k", "ts").head()
    assert(r1.getLong(1) === 1L && r1.isNullAt(2) && r1.isNullAt(4))
  }

  test("seasonalDowDecompose: constant series all-zero, bump lands on its dow, centered") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00.${i}%06d")
    // constant 21-day series: zero detrended everywhere
    val flat = (1 to 21).flatMap(d => (0 until 5).map(i => ("a", ts(d, i))))
    val rf = Analytics.seasonalDowDecompose(flat.toDF("k", "ts"), "k", "ts")
      .collect()
    assert(rf.length === 7 && rf.forall(_.getAs[Double]("seasonal") === 0.0))
    // 2024-01-01 is a Monday (dow 1); bump every Monday by +7
    val bumped = (1 to 21).flatMap { d =>
      val c = if ((d - 1) % 7 == 0) 12 else 5
      (0 until c).map(i => ("a", ts(d, i)))
    }
    val out = Analytics.seasonalDowDecompose(bumped.toDF("k", "ts"), "k", "ts")
      .orderBy("dow").collect()
    val seasonal = out.map(r => (r.getLong(1), r.getAs[Double]("seasonal")))
    // centering: the seven indices sum to ~0, Monday carries the max
    assert(math.abs(seasonal.map(_._2).sum) < 1e-5)
    assert(seasonal.maxBy(_._2)._1 === 1L)
  }

  test("katz: path graph hand-computed, attenuation per hop") {
    import graft.operators.Graph
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    // beta = 0.5: x(a)=1, x(b)=1.5, x(c)=1+0.5*1.5=1.75 at convergence
    val out = Graph.katz(e, "s", "d", iters = 3, beta = 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out === Array((1L, 1.0), (2L, 1.5), (3L, 1.75)))
  }

  test("bfsDistances: chain depths exact, bound respected, cycle terminates early") {
    import graft.operators.Graph
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val out = Graph.bfsDistances(chain, "s", "d", seeds, maxHops = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // nodes past the bound are ABSENT, not sentinel-valued
    assert(out === Array((1L, 0L), (2L, 1L), (3L, 2L)))
    // 2-cycle: frontier empties after hop 1, loop exits before maxHops
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val oc = Graph.bfsDistances(cyc, "s", "d", seeds, maxHops = 5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(oc === Array((1L, 0L), (2L, 1L)))
    // an isolated seed is still reported at distance 0
    val iso = Graph.bfsDistances(chain, "s", "d", Seq(99L).toDF("id"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(iso === Array((99L, 0L)))
  }

  test("zOrderKey: interleave exact, prefix buckets bound both dims, clamp at edges") {
    import graft.ops.Layout
    // (qx=0b11, qy=0b01) -> bits x at 0,2; y at 1: 1 + 2 + 4 = 0b0111...
    // x=3: bit0->k0, bit1->k2 (1+4=5); y=1: bit0->k1 (2) => key 7
    val r = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zOrderKey(col("x"), col("y"), 4).as("k")).head()
    assert(r.getLong(0) === 7L)
    // quantize clamps outliers into edge cells
    val q = Seq((-5.0, 999.0)).toDF("a", "b")
      .select(Layout.quantize(col("a"), 0.0, 16.0, 4).as("qa"),
        Layout.quantize(col("b"), 0.0, 16.0, 4).as("qb")).head()
    assert((q.getLong(0), q.getLong(1)) === ((0L, 15L)))
    // locality: within a top-(2k)-bit prefix bucket, each dim spans
    // < 2^(bits-k) cells — the file-stats pruning guarantee
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
      .withColumn("bucket",
        shiftright(Layout.zOrderKey(col("x"), col("y"), 5), 4))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
    val worst = grid.agg(max("sx"), max("sy")).head()
    assert(worst.getLong(0) < 8L && worst.getLong(1) < 8L)
  }

  test("readability: flesch hand-computed, mojibake counts damage") {
    import graft.functions.TextFunctions._
    // "go now. stop!" -> words 3, sentences 2, vowel groups: o,o,o = 3
    val r = Seq("go now. stop!").toDF("t")
      .select(tokenCount(col("t")).as("w"), sentenceCount(col("t")).as("s"),
        syllableCount(col("t")).as("sy"),
        round(fleschReadingEase(col("t")), 4).as("f")).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((3, 2, 3)))
    assert(r.getDouble(3) ===
      BigDecimal(206.835 - 1.015 * 1.5 - 84.6).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    val m = Seq("ok � bad  text").toDF("t")
      .select(mojibakeCount(col("t"))).head().getInt(0)
    assert(m === 2)
    assert(Seq("clean ascii").toDF("t")
      .select(mojibakeCount(col("t"))).head().getInt(0) === 0)
  }

  test("fellegi-sunter: evidence sums exact, nulls contribute zero, threshold decides") {
    import graft.ops.Linkage
    val fields = Seq(Linkage.Field("nm", "ln", "rn", 0.9, 0.1),
      Linkage.Field("ph", "lp", "rp", 0.8, 0.2))
    val wNmA = fields(0).agreeNano; val wNmD = fields(0).disagreeNano
    val wPhA = fields(1).agreeNano
    val left = Seq((1L, "k", "ann", "555"), (2L, "k", "bob", "666"),
      (3L, "k", null.asInstanceOf[String], "777")).toDF("id", "bk", "ln", "lp")
    val right = Seq((10L, "k", "ann", "555"), (11L, "k", "ann", "777"))
      .toDF("rid", "bk", "rn", "rp")
    val out = Linkage.linkBlocked(left, right, "id", "rid",
        col("bk"), col("bk"), fields, thresholdNano = wNmA)
      .orderBy("left_id", "right_id").collect()
    // (1,10): both agree; (1,11): name agrees, phone disagrees;
    // (3, 11): null name -> zero evidence + phone agrees
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(byPair((1L, 10L)) === ((wNmA + wPhA, true)))
    assert(byPair((1L, 11L))._1 === wNmA + fields(1).disagreeNano)
    assert(byPair((3L, 11L)) === ((0L + wPhA, false)))
    assert(byPair((2L, 10L))._1 === wNmD + fields(1).disagreeNano)
    // weights are exact literals: ln(0.9/0.1) in nano-units
    assert(wNmA === math.round(math.log(9.0) * 1e9))
  }

  test("textRank: bridging hub outranks leaves, symmetric pair ties") {
    import graft.operators.Tfidf
    // "x" adjacent to three distinct words: the connector wins
    val docs = Seq("x a", "x b", "x c").toDF("text")
    val out = Tfidf.textRank(docs, "text", iters = 3)
      .orderBy(col("rank").desc, col("id")).collect()
    assert(out.head.getString(0) === "x")
    assert(out.tail.map(_.getDouble(1)).distinct.length === 1) // a=b=c
    // symmetric two-word graph: equal ranks; self-adjacency dropped
    val pair = Seq("p q p q", "r r r").toDF("text")
    val op = Tfidf.textRank(pair, "text", iters = 2).collect()
    assert(op.map(_.getString(0)).sorted === Array("p", "q")) // r isolated
    assert(op.map(_.getDouble(1)).distinct.length === 1)
  }

  test("jsDrift: identical sides exactly 0, bounded by ln 2, symmetric") {
    import graft.operators.Stats
    val same = Seq((true, "a b c"), (false, "a b c")).toDF("p", "t")
    val r0 = Stats.jsDrift(same, "t", col("p")).collect()
    assert(r0.forall(_.getAs[Double]("total_js") === 0.0))
    val diff = Seq((true, "x x x x"), (false, "y y y y")).toDF("p", "t")
    val tot = Stats.jsDrift(diff, "t", col("p")).head().getAs[Double]("total_js")
    assert(tot > 0.0 && tot <= math.log(2.0) + 1e-9)
    // symmetric: flipping the side labels leaves the total unchanged
    val flipped = Stats.jsDrift(diff, "t", !col("p")).head()
      .getAs[Double]("total_js")
    assert(flipped === tot)
  }

  test("collocations: bound pair hand-computed PMI, count floor drops singletons") {
    import graft.operators.Tfidf
    val docs = Seq("x y", "x y", "x y", "p q r s").toDF("text")
    val out = Tfidf.collocations(docs, "text", minCount = 2L, topN = 10)
      .collect()
    assert(out.length === 1) // singleton bigrams floored away
    val r = out.head
    // N=10 tokens, N_bi=6, c_xy=3, c_x=c_y=3:
    // PMI = ln((3/6)/((3/10)·(3/10)))
    val expected = BigDecimal(
      math.log((3.0 / 6) / ((3.0 / 10) * (3.0 / 10))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getString(0) === "x y" && r.getAs[Double]("pmi") === expected)
  }

  test("auc: perfect 1, tied 0.5, hand-computed 0.75, one-class null") {
    import graft.operators.Ranking
    val perfect = Seq((0.9, true), (0.8, true), (0.7, false)).toDF("s", "y")
    assert(Ranking.auc(perfect, col("s"), col("y")).head()
      .getAs[Double]("auc") === 1.0)
    val tied = Seq((0.5, true), (0.5, false)).toDF("s", "y")
    assert(Ranking.auc(tied, col("s"), col("y")).head()
      .getAs[Double]("auc") === 0.5)
    // pos {0.9, 0.4}, neg {0.6, 0.2}: 3 of 4 pairs won
    val mixed = Seq((0.9, true), (0.4, true), (0.6, false), (0.2, false))
      .toDF("s", "y")
    assert(Ranking.auc(mixed, col("s"), col("y")).head()
      .getAs[Double]("auc") === 0.75)
    val onecls = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    assert(Ranking.auc(onecls, col("s"), col("y")).head().isNullAt(2))
  }

  test("calibration: micro-exact bin means, edge score clamps into last bin") {
    import graft.operators.Stats
    val df = Seq((0.25, true), (0.25, false), (0.75, true), (1.0, true))
      .toDF("s", "y")
    val out = Stats.calibration(df, col("s"), col("y"), nBins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out === Array((0L, 2L, 1L, 0.25, 0.5), (1L, 2L, 2L, 0.875, 1.0)))
  }

  test("gainsTable: top decile captures planted positives, cum_capture ends at 1") {
    import graft.operators.Ranking
    // 20 scores 0.05..1.00; positives are the top 5 scores
    val df = (1 to 20).map(i => (i / 20.0, i > 15)).toDF("s", "y")
    val out = Ranking.gainsTable(df, col("s"), col("y"))
      .orderBy("decile").collect()
    assert(out.length === 10)
    val d1 = out.head
    assert(d1.getLong(0) === 1L && d1.getAs[Double]("rate") === 1.0)
    assert(out.last.getAs[Double]("cum_capture") === 1.0)
    // lift in decile 1 = 1.0 / (5/20) = 4
    assert(d1.getAs[Double]("lift") === 4.0)
    // capture is monotone non-decreasing down the table
    val caps = out.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
  }

  test("bootstrapCiMean: constant series degenerate CI, spread series brackets mean") {
    import graft.operators.Stats
    // all values equal: every replicate mean is the constant
    val const = (1 to 50).map(i => (i.toLong, 500L)).toDF("id", "v")
    val rc = Stats.bootstrapCiMean(const, col("id"), col("v"), reps = 20)
      .head()
    assert(rc.getAs[Double]("mean") === 5.0) // 500 cents / unitScale 100
    assert(rc.getAs[Double]("lo95") === 5.0 && rc.getAs[Double]("hi95") === 5.0)
    // spread series: CI brackets the point estimate, reps all survive
    val spread = (1 to 200).map(i => (i.toLong, i.toLong * 100)).toDF("id", "v")
    val rs = Stats.bootstrapCiMean(spread, col("id"), col("v"), reps = 50)
      .head()
    assert(rs.getLong(0) === 200L && rs.getLong(1) === 50L)
    assert(rs.getAs[Double]("lo95") <= rs.getAs[Double]("mean") &&
      rs.getAs[Double]("mean") <= rs.getAs[Double]("hi95"))
    assert(rs.getAs[Double]("lo95") < rs.getAs[Double]("hi95"))
    // thresholds are the Poisson(1) CDF on the 2^40 grid
    val t = Stats.poissonThresholds40
    assert(t.length === 7 && t === t.sorted &&
      t.head === (BigDecimal(math.exp(-1.0)) * BigDecimal(1L << 40))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
  }

  test("expect: nulls fail, uniqueness counts dups, one row per check") {
    import graft.operators.Quality.{expect, Expectation}
    val df = Seq((1L, java.lang.Double.valueOf(2.0)),
      (2L, java.lang.Double.valueOf(-1.0)),
      (2L, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v")
    val out = expect(df,
      Seq(Expectation("v_positive", col("v") > 0)),
      uniqueKeys = Seq(("k_unique", Seq(col("k")))))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // v_positive: -1 fails, NULL fails (three-valued logic pinned)
    assert(out === Array(("k_unique", 3L, 1L), ("v_positive", 3L, 2L)))
    // malformed check names are rejected, not spliced into SQL
    intercept[IllegalArgumentException] {
      expect(df, Seq(Expectation("bad name!", col("v") > 0)))
    }
  }

  test("pcaPowerComponent: planted axis recovered, unit norm, centering kills a constant offset") {
    import graft.operators.Similarity
    // variance lives on dim 1 (±3 around a +10 offset); dims 0 and 2
    // carry only the constant offset — centering must erase them
    val vecs = (1 to 40).map { i =>
      val sign = if (i % 2 == 0) 3.0f else -3.0f
      Tuple1(Array(5.0f, 10.0f + sign, 7.0f))
    }
    val df = vecs.toDF("embedding")
    val out = Similarity.pcaPowerComponent(df, "embedding", iters = 3)
      .orderBy("dim").collect().map(_.getDouble(1))
    assert(out.length === 3)
    assert(math.abs(out(1)) > 0.999) // the planted axis
    assert(math.abs(out(0)) < 0.01 && math.abs(out(2)) < 0.01)
    val norm = math.sqrt(out.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3) // micro-quantized unit vector
  }

  test("madOutliers: outlier flagged where it blinds stddev, MAD 0 yields null z") {
    import graft.operators.Quality
    // 19 values 1..19 plus 10000: median 10-ish, MAD small -> flagged
    val df = ((1 to 19).map(i => ("A", i.toDouble)) :+ ("A", 10000.0))
      .toDF("g", "v")
    val out = Quality.madOutliers(df, Seq("g"), "v").collect()
    assert(out.count(_.getAs[Boolean]("is_outlier")) === 1)
    assert(out.find(_.getAs[Double]("v") == 10000.0)
      .get.getAs[Boolean]("is_outlier"))
    // constant group: MAD = 0 -> robust z null, nothing flagged
    val const = Seq(("B", 5.0), ("B", 5.0), ("B", 5.0)).toDF("g", "v")
    val oc = Quality.madOutliers(const, Seq("g"), "v").collect()
    assert(oc.forall(r => r.isNullAt(r.fieldIndex("robust_z")) &&
      !r.getAs[Boolean]("is_outlier")))
  }

  test("cohortLtv: hand-computed curve, cumulative divides by cohort size") {
    import graft.ops.Analytics
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-05"), 10.0), (1L, d("2024-03-09"), 20.0),
      (2L, d("2024-01-20"), 30.0)).toDF("cust", "od", "rev")
    val out = Analytics.cohortLtv(orders, "cust", "od", col("rev"))
      .orderBy("age_months").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out === Array(
      ("2024-01-01", 0L, 2L, 2L, 40.0, 20.0),
      ("2024-01-01", 2L, 2L, 1L, 20.0, 30.0)))
  }

  test("holtWintersDaily: reduces to Holt while seasonal state is cold, gamma books the gap") {
    import graft.ops.Analytics
    def ts(day: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00.${i}%06d")
    val counts = Seq(10, 10, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, di) =>
      (0 until c).map(i => ("k", ts(di + 1, i)))
    }
    val out = Analytics.holtWintersDaily(rows.toDF("k", "ts"), "k", "ts")
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // hand-run: day 3's level/trend match q133's Holt (s still 0),
    // and gamma = 0.2 books s = 0.2*(4 - 8.2) = -0.84
    assert(out === Array(
      (10.0, 0.0, 0.0), (10.0, 0.0, 0.0), (8.2, -0.36, -0.84)))
  }

  test("isotonicCalibration: adjacent violators pool weighted, monotone output") {
    import graft.operators.Stats
    // four bins, rates [0.2, 0.5, 0.4, 0.8]: bins 2 and 3 violate and
    // pool to (1+2)/(2+5) = 3/7; ends stay put
    def rows(score: Double, n: Int, pos: Int) =
      (0 until n).map(i => (score, i < pos))
    val df = (rows(0.125, 5, 1) ++ rows(0.375, 2, 1) ++
      rows(0.625, 5, 2) ++ rows(0.875, 5, 4)).toDF("s", "y")
    val out = Stats.isotonicCalibration(df, col("s"), col("y"), nBins = 4)
      .orderBy("bin").collect().map(_.getAs[Double]("iso_rate"))
    val pooled = BigDecimal(3.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(0.2, pooled, pooled, 0.8))
    assert(out.zip(out.tail).forall { case (a, b) => a <= b })
  }

  test("interpolateDaily: interior gaps lerp exactly, edges stay null, observed pass through") {
    import graft.ops.Analytics
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-05-$day%02d 12:00:00")
    // observed on days 1 and 4 (means 10.0 and 16.0): days 2,3
    // interpolate to 12, 14; a second key with one day has no gaps
    val ev = Seq(("a", ts(1), 10.0), ("a", ts(4), 16.0), ("b", ts(2), 5.0))
      .toDF("k", "ts", "v")
    val out = Analytics.interpolateDaily(ev, "k", "ts", col("v"))
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out === Array(
      ("a", true, Some(10.0)), ("a", false, Some(12.0)),
      ("a", false, Some(14.0)), ("a", true, Some(16.0)),
      ("b", true, Some(5.0))))
    // half-micro tie: day 1 mean = 10000 micro, day 3 mean =
    // round(10000/3) = 3333 micro -> midpoint 6666.5 is a TRUE binary
    // half and must round half-away to 6667 micro = 0.006667
    val tie = Seq(("c", ts(1), 0.01), ("c", ts(3), 0.01),
      ("c", ts(3), 0.0), ("c", ts(3), 0.0)).toDF("k", "ts", "v")
    val mid = Analytics.interpolateDaily(tie, "k", "ts", col("v"))
      .orderBy("day").collect()(1)
    assert(!mid.getBoolean(2) && mid.getDouble(3) === 0.006667)
  }

  test("stationaryDistribution: symmetric chain uniform, absorbing leak redistributes") {
    import graft.ops.Analytics
    val cycle = Seq(("A", "B", 1L, 1.0), ("B", "A", 1L, 1.0))
      .toDF("from_type", "to_type", "n", "p")
    val u = Analytics.stationaryDistribution(cycle, iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(u("A") === 0.5 && u("B") === 0.5)
    // A->B only; B leaks and redistributes uniformly:
    // pi = (.5,.5) -> (.25,.75) -> (.375,.625) -> (.3125,.6875)
    val absorb = Seq(("A", "B", 1L, 1.0)).toDF("from_type", "to_type", "n", "p")
    val a = Analytics.stationaryDistribution(absorb, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a("A") === 0.3125 && a("B") === 0.6875)
  }

  test("concurrencyDaily: overlap peaks, midnight spans carry, end-exclusive ties") {
    import graft.ops.Analytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq(
      // two overlapping on day 1 (peak 2), one back-to-back (no overlap)
      (ts("2024-06-01 09:00:00"), ts("2024-06-01 11:00:00")),
      (ts("2024-06-01 10:00:00"), ts("2024-06-01 12:00:00")),
      (ts("2024-06-01 12:00:00"), ts("2024-06-01 13:00:00")),
      // spans midnight into day 2: carry-in makes day 2 active
      (ts("2024-06-01 23:00:00"), ts("2024-06-02 01:00:00")))
      .toDF("s", "e")
    val out = Analytics.concurrencyDaily(iv, col("s"), col("e"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // day 1: 4 active, peak 2 (the 12:00 end processes before the
    // 12:00 start — end-exclusive, so that handoff never reads 2...
    // but the 09-11/10-12 overlap does)
    assert(out === Array(("2024-06-01", 4L, 2L), ("2024-06-02", 1L, 1L)))
    // an interval ending exactly at midnight never touches the next day
    val mid = Seq((ts("2024-06-01 22:00:00"), ts("2024-06-02 00:00:00")))
      .toDF("s", "e")
    val om = Analytics.concurrencyDaily(mid, col("s"), col("e"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(om === Array(("2024-06-01", 1L, 1L)))
  }

  test("rocchioExpand: expansion retrieves the vocabulary-mismatched doc") {
    import graft.operators.Tfidf
    val docs = Seq((1L, "dup cat"), (2L, "dup cat"), (3L, "cat zebra"),
      (4L, "noise words only")).toDF("doc_id", "text")
    val plain = Tfidf.bm25TopK(docs, "doc_id", "text", Seq("dup"), k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(3L)) // says "cat", never "dup"
    val prf = Tfidf.rocchioExpand(docs, "doc_id", "text", Seq("dup"),
        kFeedback = 2, nExpand = 1, k = 4)
      .collect().map(_.getLong(0)).toSet
    // feedback docs 1,2 elect "cat"; the mismatch doc comes back
    assert(prf.contains(3L) && !prf.contains(4L))
  }

  test("kCore: K4 survives k=3, pendant chain peels in cascade, empty core empty") {
    import graft.operators.Graph
    // K4 on 1..4 plus a chain 4-5-6: the chain peels over TWO rounds
    // (6 first, then 5), the clique keeps degree 3
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val e = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("s", "d")
    val core3 = Graph.kCore(e, "s", "d", k = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(core3 === Array((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k=4: nothing qualifies -> empty, not an error
    assert(Graph.kCore(e, "s", "d", k = 4).count() === 0L)
    // duplicate + reversed + self-loop edges canonicalize away
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("s", "d")
    val c2 = Graph.kCore(messy, "s", "d", k = 2)
      .collect().map(_.getLong(1))
    assert(c2.toSeq === Seq(2L, 2L, 2L)) // the triangle, degree 2 each
  }

  test("guards fail loud: kCore maxRounds, bootstrap duplicate ids, overlapJoin reserved names") {
    import graft.operators.{Graph, Stats}
    import graft.ops.IntervalJoin
    // the K4 + pendant-chain fixture needs 2 peel rounds + 1
    // confirming round — a cap of 1 must throw, not return a
    // half-peeled core
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val e = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("s", "d")
    intercept[IllegalStateException] {
      Graph.kCore(e, "s", "d", k = 3, maxRounds = 1).count()
    }
    // duplicate ids correlate the Poisson resample — the in-plan
    // raise_error must fire on materialization, naming the contract
    val dup = ((1 to 50).map(i => (i.toLong, 100L)) :+ ((7L, 100L)))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      Stats.bootstrapCiMean(dup, col("id"), col("v"), reps = 5).head()
    }
    assert(ex.getMessage.contains("row-unique"))
    // an input column named like an internal working column would be
    // silently overwritten — rejected up front instead
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val l = Seq((1L, ts(0), ts(10), 0L)).toDF("a_id", "a_s", "a_e", "__ls")
    val r = Seq((2L, ts(5), ts(15))).toDF("b_id", "b_s", "b_e")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(l, col("a_s"), col("a_e"),
        r, col("b_s"), col("b_e"), widthUs = 1000L)
    }
  }

  test("diffInDiff: hand-computed contrast, empty cell nulls the estimate") {
    import graft.operators.Stats
    val df = Seq(
      (true, false, 1000L), (true, true, 2500L),
      (false, false, 1000L), (false, true, 2000L)).toDF("t", "p", "v")
    val r = Stats.diffInDiff(df, col("t"), col("p"), col("v")).head()
    // (25 - 10) - (20 - 10) = 5
    assert(r.getAs[Double]("did") === 5.0)
    val missing = Seq((true, true, 100L), (false, false, 100L),
      (false, true, 100L)).toDF("t", "p", "v")
    assert(Stats.diffInDiff(missing, col("t"), col("p"), col("v"))
      .head().isNullAt(8))
  }

  test("cuped: perfectly explained metric equalizes adjusted means, rho2 = 1") {
    import graft.operators.Stats
    // y = 2x exactly; arms differ only through x -> adjustment removes it
    val df = Seq((0, 100L, 200L), (0, 200L, 400L),
      (1, 300L, 600L), (1, 400L, 800L)).toDF("arm", "x", "y")
    val out = Stats.cuped(df, col("arm"), col("y"), col("x"))
      .orderBy("arm").collect()
    assert(out.map(_.getAs[Double]("theta")).distinct.toSeq === Seq(2.0))
    assert(out.map(_.getAs[Double]("rho2")).distinct.toSeq === Seq(1.0))
    assert(out.map(_.getAs[Double]("mean_raw")).toSeq === Seq(3.0, 7.0))
    assert(out.map(_.getAs[Double]("mean_adj")).toSeq === Seq(5.0, 5.0))
  }

  test("stratifiedEffect: confounded strata reweighted, off-support carries no weight") {
    import graft.operators.Stats
    val df = Seq(
      ("A", true, 1000L), ("A", false, 800L),
      ("B", true, 400L), ("B", true, 400L), ("B", true, 400L),
      ("B", false, 100L),
      ("C", false, 999L)) // off-support: no treated rows
      .toDF("s", "t", "v")
    val out = Stats.stratifiedEffect(df, col("t"), col("v"), col("s"))
      .orderBy("stratum").collect()
    assert(out.length === 3)
    // ATT = (1*2 + 3*3) / 4 = 2.75, repeated on every row
    assert(out.map(_.getAs[Double]("att")).distinct.toSeq === Seq(2.75))
    val c = out.find(_.getString(0) == "C").get
    assert(c.isNullAt(c.fieldIndex("diff")) &&
      c.isNullAt(c.fieldIndex("mean_t")))
  }

  test("kaplanMeierBy: each group's curve equals its standalone KM run") {
    import graft.ops.Analytics
    val df = Seq(("A", 2L, true), ("A", 3L, false), ("A", 5L, true),
      ("B", 1L, true), ("B", 1L, true), ("B", 4L, false))
      .toDF("g", "t", "e")
    val grouped = Analytics.kaplanMeierBy(df, col("g"), col("t"), col("e"))
    for (g <- Seq("A", "B")) {
      val solo = Analytics.kaplanMeier(df.where(col("g") === g),
          col("t"), col("e"))
        .orderBy("t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      val part = grouped.where(col("grp") === g)
        .orderBy("t").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
      assert(part === solo, s"group $g")
    }
  }

  test("logRank: hand-computed two-group chi2, solo-risk times contribute nothing") {
    import graft.ops.Analytics
    // A: events at t=1,2; B: censored at 1, event at 3 (n=1 there -> dropped)
    // t=1: n=4,n1=2,d=1 -> E=0.5,V=0.25; t=2: n=2,n1=1,d=1 -> E=0.5,V=0.25
    val df = Seq((true, 1L, true), (true, 2L, true),
      (false, 1L, false), (false, 3L, true)).toDF("a", "t", "e")
    val r = Analytics.logRank(df, col("a"), col("t"), col("e")).head()
    assert(r.getLong(r.fieldIndex("n_a")) === 2L)
    assert(r.getLong(r.fieldIndex("n_b")) === 2L)
    assert(r.getLong(r.fieldIndex("o_a")) === 2L)
    assert(r.getDouble(r.fieldIndex("e_a")) === 1.0)
    assert(r.getDouble(r.fieldIndex("var_a")) === 0.5)
    assert(r.getDouble(r.fieldIndex("chi2")) === 2.0)
    assert(r.getDouble(r.fieldIndex("z")) === 1.4142)
  }

  test("overlapJoin matches naive theta join; end-exclusive; degenerate/null dropped") {
    import graft.ops.IntervalJoin
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms fixtures
    // hand-planted: [0,10) [5,15) back-to-back [15,20); cross-bucket
    // [8, 25) spans 3 buckets of width 10ms; degenerate [30,30); null end
    val raw = Seq(
      (1L, 0L, 10000L), (2L, 5000L, 15000L), (3L, 15000L, 20000L),
      (4L, 8000L, 25000L), (5L, 30000L, 30000L))
      .map { case (i, a, b) => (i, ts(a * 1000), ts(b * 1000)) }
    val withNull = raw :+ ((6L, ts(0L), null.asInstanceOf[java.sql.Timestamp]))
    val a = withNull.toDF("a_id", "a_s", "a_e")
    val b = withNull.toDF("b_id", "b_s", "b_e")
      .withColumnRenamed("b_id", "b_id")
    val got = IntervalJoin.overlapJoin(a, col("a_s"), col("a_e"),
        b, col("b_s"), col("b_e"), widthUs = 10000000L) // 10 ms buckets
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // naive truth over the non-degenerate intervals
    val iv = raw.filter { case (_, s, e) => s.before(e) }
    val want = (for {
      (i, s1, e1) <- iv; (j, s2, e2) <- iv
      if i < j && s1.getTime < e2.getTime && s2.getTime < e1.getTime
    } yield (i, j)).toSet
    assert(got === want)
    assert(want === Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    // a pair sharing several buckets surfaces exactly once (no DISTINCT
    // in the plan): 2 and 4 share buckets 0 and 1
    val dupCheck = IntervalJoin.overlapJoin(a, col("a_s"), col("a_e"),
        b, col("b_s"), col("b_e"), widthUs = 10000000L)
      .where(col("a_id") === 2 && col("b_id") === 4)
    assert(dupCheck.count() === 1L)
    // disjoint-schema contract is loud
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a, col("a_s"), col("a_e"),
        a, col("a_s"), col("a_e"), widthUs = 1000L)
    }
  }

  test("naive bayes: separable corpus classified, unseen tokens tie-break to min label") {
    import graft.operators.TextClassifier
    val train = Seq((1L, "the cat", "en"), (2L, "the dog", "en"),
      (3L, "le chat", "fr"), (4L, "le chien", "fr"))
      .toDF("doc_id", "text", "lang")
    val model = TextClassifier.trainNb(train, "text", "lang")
    // V spans BOTH labels' vocabularies (6 tokens), priors equal
    assert(model.classes.count() === 2L)
    val preds = TextClassifier.scoreNb(train, "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(preds === Array("en", "en", "fr", "fr"))
    // all-unseen doc: equal priors, equal totals -> equal scores,
    // tie breaks to the smaller label
    val novel = Seq((9L, "zz zz")).toDF("doc_id", "text")
    val p = TextClassifier.scoreNb(novel, "doc_id", "text", model).head()
    assert(p.getString(1) === "en")
  }
}
