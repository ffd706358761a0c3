package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the standard
  * relevance weighting (smoothed idf: ln((N+1)/(df+1)) + 1, the
  * scikit-learn convention) computed entirely with aggregates:
  *
  *  - tf: one groupBy (doc, term) over the exploded tokens;
  *  - df: one groupBy (term) over the tf frame (already one row per
  *    (doc, term), so df is a plain count — no distinct needed);
  *  - N: a 1-row aggregate cross-joined (broadcast) onto every row;
  *  - top-k per doc via a rank window — WindowGroupLimit keeps the
  *    per-partition top-k, so the shuffle moves O(docs·k) rows.
  *
  * All shuffles key on terms or doc ids (uniform). Ties rank by term
  * ascending so results are deterministic and oracle-replayable.
  */
object Tfidf {

  /** Top-`k` terms per document by TF-IDF. Returns
    * (idCol, rank, term, tfidf rounded to 6dp). The tf frame feeds
    * three consumers (the score join, df, N), so it is persisted for
    * the call and dropped once the result is materialized — without
    * it the corpus tokenizes three times (the static plan shows three
    * independent scan+aggregate chains). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val raw = col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1)
    val out = tf.join(dfc, "term")
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(raw.desc, col("term").asc)))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), round(raw, 6).as("tfidf"))
      .localCheckpoint()
    tf.unpersist(blocking = false)
    out
  }

  /** BM25 keyword retrieval (Robertson/Sparck Jones; the Okapi
    * formulation): top-`k` documents for a bag-of-terms query, scored
    * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with
    * `idf = ln(1 + (N-df+0.5)/(df+0.5))`.
    *
    * Scale shape: two corpus map passes and nothing else corpus-sized.
    * Pass 1 (the expensive one) tokenizes and immediately filters to
    * the query's posting lists — the only corpus-keyed shuffle moves
    * matching (doc, term) rows, never the full token stream. Pass 2
    * is the 1-row (N, avgdl) stats aggregate, computed WITHOUT
    * materializing token arrays: under the corpus's single-space
    * contract the token count is separator-count + 1, a pure length
    * arithmetic identical to `size(split(..))` even on empty-token
    * edge shapes. (A production engine keeps N/avgdl as index
    * metadata and drops pass 2.) `df` and the stats are broadcast;
    * the final ranking is an orderBy+limit → TakeOrdered
    * (per-partition top-k, no global sort).
    *
    * Scores are summed as exact micro-units (each term contribution
    * rounded to 6dp then held as a long) so the cross-term sum is
    * order-independent and engine-replayable — double summation order
    * is not. Query terms must be distinct: repeated terms would
    * silently collapse in the posting-list filter rather than carry
    * Okapi query-side weight, so they are rejected. Returns (idCol,
    * bm25_micros, n_terms) ordered by score desc, id asc. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms carry no extra weight here — pass distinct terms: $queryTerms")
    require(k >= 1, s"k must be >= 1, got $k")
    val dlArith = length(col(textCol)) -
      length(regexp_replace(col(textCol), " ", "")) + 1
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg(dlArith).as("avgdl"))
    // tf feeds both df and the score join; persisted so the corpus
    // tokenize+filter runs once (the frame itself is posting-list
    // sized — docs containing a query term × matched terms)
    val tf = docs
      .select(col(idCol), dlArith.as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / col("avgdl"))))
    val out = tf.join(broadcast(dfc), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__micros", round(contrib * lit(1000000)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum("__micros").as("bm25_micros"), count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_micros").desc, col(idCol))
      .limit(k)
      .localCheckpoint()
    tf.unpersist(blocking = false)
    out
  }

  /** Boolean posting-list retrieval: documents containing EVERY
    * `must` term, ranked by how many distinct `should` terms they
    * also contain — the AND/OR query layer under [[bm25TopK]]'s
    * scoring (a filter bar's "all of these, prefer more of those").
    *
    * One corpus tokenize pass filtered to the query's terms (the
    * bm25TopK posting-list shape — matching (doc, term) pairs are all
    * that shuffles), one doc-keyed distinct-count aggregate, a HAVING
    * on the exact must-count, TakeOrdered for the top-k
    * (should-hits desc, id asc — total order). All counts exact;
    * no FP anywhere. Returns (idCol, n_should). */
  def booleanTopK(docs: DataFrame, idCol: String, textCol: String,
      must: Seq[String], should: Seq[String], k: Int): DataFrame = {
    require(must.nonEmpty || should.nonEmpty,
      "booleanTopK needs at least one must or should term")
    require((must ++ should).distinct.size == must.size + should.size,
      s"terms must be distinct across must and should: $must / $should")
    require(k >= 1, s"k must be >= 1, got $k")
    val all = must ++ should
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .where(col("__t").isin(all: _*))
      .groupBy(col(idCol))
      .agg(size(array_intersect(collect_set(col("__t")),
          typedLit(must))).as("__nm"),
        size(array_intersect(collect_set(col("__t")),
          typedLit(should))).as("n_should"))
      .where(col("__nm") === must.size)
      .select(col(idCol), col("n_should").cast("long").as("n_should"))
      .orderBy(col("n_should").desc, col(idCol))
      .limit(k)
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990)
    * — adjacent word pairs that co-occur far above chance ("new york"
    * vs "of the"): the multi-word-expression detector a tokenizer/
    * phrase-mining pass runs before vocabulary decisions.
    *
    *   PMI(a,b) = ln( (c_ab/N_bi) / ((c_a/N)·(c_b/N)) )
    *
    * over lowercased adjacent pairs (duplicates counted — these are
    * frequencies, unlike [[textRank]]'s edge multiset). `minCount`
    * floors the pair count: PMI's known pathology is that a singleton
    * pair of two rare words scores highest, so an unfloored top-k is
    * all noise.
    *
    * Determinism: counts exact; PMI is one pinned expression over
    * exact longs, rounded 9dp BEFORE the ordering (the klDrift rule —
    * the sort key itself is engine-portable). Scale: one bigram
    * aggregate, one unigram aggregate (vocabulary-sized, broadcast
    * into the pair frame twice), two driver scalars read once.
    * Returns top-`topN` by (pmi desc, bigram) as
    * (bigram, c_ab, c_a, c_b, pmi). */
  def collocations(docs: DataFrame, textCol: String, minCount: Long,
      topN: Int): DataFrame = {
    require(minCount >= 1 && topN > 0,
      s"need minCount>=1, topN>0; got $minCount, $topN")
    import graft.functions.TextFunctions.posWordShingles
    val lowered = lower(col(textCol))
    val bi = docs.select(explode(posWordShingles(lowered, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab")).persist()
    val uni = docs.select(explode(tokens(lowered)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).persist()
    try {
      val nBi = bi.agg(coalesce(sum("c_ab"), lit(0L))).head().getLong(0)
      val nUni = uni.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
      if (nBi == 0L) bi.limit(0)
        .select(col("bigram"), col("c_ab"), col("c_ab").as("c_a"),
          col("c_ab").as("c_b"), lit(0.0).as("pmi"))
      else {
        val w1 = split(col("bigram"), " ").getItem(0)
        val w2 = split(col("bigram"), " ").getItem(1)
        val scored = bi.where(col("c_ab") >= minCount)
          .join(broadcast(uni.select(col("w").as("__w1"), col("c").as("c_a"))),
            w1 === col("__w1"))
          .join(broadcast(uni.select(col("w").as("__w2"), col("c").as("c_b"))),
            w2 === col("__w2"))
          .withColumn("pmi", round(log(
            (col("c_ab") / lit(nBi.toDouble)) /
              ((col("c_a") / lit(nUni.toDouble)) *
                (col("c_b") / lit(nUni.toDouble)))), 9))
          .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
            col("pmi"))
        Checkpoints.materialize(
          scored.orderBy(col("pmi").desc, col("bigram")).limit(topN))
      }
    } finally { bi.unpersist(blocking = false); uni.unpersist(blocking = false) }
  }

  /** Rocchio pseudo-relevance feedback (Rocchio 1971; the classic PRF
    * loop): run the query, treat the top `kFeedback` hits as
    * pseudo-relevant, elect the `nExpand` highest tf·idf terms from
    * them that the query didn't already contain, and re-run with the
    * expanded term set — the vocabulary-mismatch fix ("car" finds
    * docs that say "automobile") that needs no embeddings.
    *
    * Determinism: both retrieval passes are [[bm25TopK]] (micro-unit
    * exact); the expansion election scores each candidate term as
    * Σ_feedback tf · idf_micro with idf_micro = round((ln((N+1)/
    * (df+1)) + 1)·1e6) — exact long sums, ties term-asc, a total
    * order. The elected terms are collected (nExpand rows — the
    * IVF-probe by-contract-tiny scalar) to parametrize the second
    * pass.
    *
    * Scale shape: two bm25TopK passes plus one corpus df pass
    * restricted to the feedback docs' vocabulary (semi-joined before
    * the distinct — the only new corpus-scale work) and one
    * feedback-doc-sized tf aggregate. Returns the final ranking
    * (idCol, bm25_micros, n_terms). */
  def rocchioExpand(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], kFeedback: Int, nExpand: Int, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(nExpand >= 1, s"nExpand must be >= 1, got $nExpand")
    val fb = bm25TopK(docs, idCol, textCol, queryTerms, kFeedback, k1, b)
      .select(col(idCol))
    val fbTf = docs.join(broadcast(fb), Seq(idCol), "left_semi")
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(!col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
      .persist()
    try {
      val cand = fbTf.select("term").distinct()
      val stats = docs.agg(count(lit(1)).as("__n"))
      val dfc = docs
        .select(col(idCol), explode(tokens(col(textCol))).as("term"))
        .join(broadcast(cand), Seq("term"), "left_semi")
        .distinct()
        .groupBy("term").agg(count(lit(1)).as("__df"))
      val idfMicro = round(
        (log((col("__n") + 1).cast("double") / (col("__df") + 1)) + 1) * 1e6,
        0).cast("long")
      val elected = fbTf
        .join(dfc, Seq("term"))
        .crossJoin(broadcast(stats))
        .groupBy("term")
        .agg(sum(col("__tf") * idfMicro).as("__score"))
        .orderBy(col("__score").desc, col("term"))
        .limit(nExpand)
        .collect().map(_.getString(0)).toSeq
      bm25TopK(docs, idCol, textCol, queryTerms ++ elected, k, k1, b)
    } finally fbTf.unpersist(blocking = false)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word-adjacency graph — a corpus-level keyword
    * ranking that, unlike [[topTerms]]' frequency weighting, rewards
    * words that CONNECT (a term bridging many contexts outranks one
    * repeated in a single template). Composition, not new machinery:
    * adjacent lowercased token pairs (via the codegen'd
    * [[graft.functions.ShinglesExpr]] at n=2, duplicates KEPT — a
    * pair seen 50× contributes 50 parallel edges, which under
    * [[Graph.pageRank]]'s row-counted out-degree IS edge-weighted
    * PageRank), mirrored both ways (the undirected reading), self
    * loops dropped. Determinism and scale shape are pageRank's own.
    * Returns its (id, rank) — id is the word. */
  def textRank(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    import graft.functions.TextFunctions.posWordShingles
    val bg = docs
      .select(explode(posWordShingles(lower(col(textCol)), 2)).as("__bg"))
      .select(split(col("__bg"), " ").getItem(0).as("src"),
        split(col("__bg"), " ").getItem(1).as("dst"))
      .where(col("src") =!= col("dst"))
    val edges = bg.unionByName(
      bg.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, "src", "dst", iters)
  }

  /** Exact phrase search over a positional token index — the
    * token-boundary query [[bm25TopK]]'s bag-of-terms scoring cannot
    * express ("new york" must not match "york, new"). Occurrences are
    * counted at TOKEN granularity, overlapping matches included
    * ("w w w" holds two "w w" occurrences) — the positional-join
    * semantics, which no substring-count replay can reproduce.
    *
    * Execution: ONE corpus tokenize pass position-explodes and
    * immediately filters to the phrase's tokens (the posting frame —
    * phrase-token rows only, never the full token stream; the filter
    * sits directly over the generator). The phrase then assembles by
    * m−1 equi joins on (doc, position−offset) — each join can only
    * shrink the frame, all shuffles key on the uniform (doc, pos)
    * pair. A production engine would anchor on the rarest token
    * first; with equi joins AQE's runtime stats reorder the small
    * sides anyway, so the static order stays the readable one.
    *
    * Returns (idCol, n_occurrences, first_pos) for matching docs
    * only — positions 1-BASED (the SQL/DuckDB list convention, so
    * oracle replays need no off-by-one). Exact integers throughout;
    * no FP anywhere. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phrase tokens must be non-empty and space-free, got $phrase")
    val idx = docs
      .select(col(idCol), posexplode(tokens(col(textCol)))
        .as(Seq("__pos", "__tok")))
      .where(col("__tok").isin(phrase.distinct: _*))
      .select(col(idCol), (col("__pos") + 1).cast("long").as("__pos"),
        col("__tok"))
      .persist()
    var cur = idx.where(col("__tok") === phrase.head)
      .select(col(idCol), col("__pos"))
    phrase.zipWithIndex.drop(1).foreach { case (t, i) =>
      cur = cur.join(
        idx.where(col("__tok") === t)
          .select(col(idCol), (col("__pos") - i).as("__pos")),
        Seq(idCol, "__pos"))
    }
    graft.operators.Checkpoints.materialize(
      cur.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("__pos")).as("first_pos")),
      idx)
  }
}
