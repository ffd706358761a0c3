package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation. The reference has no graph
  * surface; this is the training-data extension that ranks crawl
  * sources the way production crawl pipelines do (host-level link
  * authority as a quality prior — the Common Crawl host-rank shape).
  */
object Graph {

  /** Damped PageRank (Page et al. 1999) over a directed edge list
    * (`src`, `dst`), `iters` synchronous power iterations from the
    * uniform start 1/N:
    *
    *   r'(v) = (1−d)/N + d·( Σ_{u→v} r(u)/outdeg(u) + dangling/N )
    *
    * where `dangling` is the rank mass sitting on nodes with no
    * out-edges, redistributed uniformly (the standard stochastic-
    * matrix completion — without it rank mass leaks and the vector
    * stops summing to 1).
    *
    * Determinism: ranks are rounded to 9dp at every iteration (the
    * [[Similarity.kCenterGreedy]] rule — both engines then carry
    * identical doubles into the next round, so an oracle can unroll
    * the iterations value-for-value); ranks are ~1/N, so 9dp keeps
    * ≥6 significant figures at any realistic node count.
    *
    * Scale shape: the textbook join-PageRank — per iteration, one
    * join of edges against ranks keyed on `src` (edges pre-keyed by
    * src reuse the exchange), one map-side-combined aggregate keyed
    * on `dst`, one left join back onto the node set. The dangling
    * mass is a 1-row aggregate CROSS-joined (broadcast) — no driver
    * collect anywhere in the loop; the only driver scalars are N and
    * (when personalized) the seed count, counted once at setup.
    * Per-round state goes through [[Checkpoints.stableTracked]], so
    * iteration i+1 costs one pass, not an i-deep lineage. Returns
    * (id, rank) with rank rounded 6dp for output.
    *
    * `teleport`: when given (a 1-column frame of trusted node ids),
    * runs PERSONALIZED PageRank — TrustRank (Gyöngyi et al., VLDB
    * 2004), the crawl-curation trust prior: the teleport vector
    * concentrates on the seed set (1/|seeds| there, 0 elsewhere) and
    * the dangling mass follows it, so rank flows outward from
    * trusted hosts instead of from everywhere:
    *
    *   r'(v) = (1−d)·t(v) + d·( Σ_{u→v} r(u)/outdeg(u) + dangling·t(v) )
    *
    * The uniform default is exactly t(v) = 1/N. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      teleport: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    // ids keep their native type (host STRINGS are the documented
    // host-rank use — a forced long cast would null them into a
    // garbage single-node graph); null endpoints carry no usable
    // edge and are dropped
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    // every persisted frame releases even on a thrown require/failed
    // job (the Checkpoints.materialize discipline; unpersist on an
    // already-released frame is a no-op)
    var pinned: List[DataFrame] = List(e, nodes)
    try {
      val n = nodes.count() // the one setup scalar
      require(n > 0, "pageRank needs at least one non-null edge")
      // (id, t) teleport distribution joined once onto the node set;
      // seeds outside the graph's node set are ignored by the join, so
      // |seeds| is counted AFTER the restriction or mass would leak
      val withT = teleport match {
        case None => nodes.withColumn("__t", lit(1.0) / n)
        case Some(seeds) =>
          val s = seeds.select(col(seeds.columns.head).as("id"))
            .distinct().join(nodes, Seq("id"), "left_semi").persist()
          pinned ::= s
          val ns = s.count()
          require(ns > 0, "teleport seeds must intersect the graph's nodes")
          val t = nodes.join(s.withColumn("__t", lit(1.0) / ns), Seq("id"), "left")
            .select(col("id"), coalesce(col("__t"), lit(0.0)).as("__t"))
          s.unpersist(blocking = false)
          t
      }
      val tNodes = withT.persist()
      pinned ::= tNodes
      val outdeg = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("outdeg")).persist()
      pinned ::= outdeg
      var ranks = Checkpoints.stableTracked(
        tNodes.select(col("id"), round(col("__t"), 9).as("r")))
      for (_ <- 1 to iters) {
        val withDeg = ranks._1.join(outdeg, Seq("id"), "left")
        val dangling = withDeg.where(col("outdeg").isNull)
          .agg(coalesce(sum("r"), lit(0.0)).as("__dm"))
        val contribs = e.join(
            withDeg.where(col("outdeg").isNotNull)
              .select(col("id").as("src"), (col("r") / col("outdeg")).as("__share")),
            Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum("__share").as("__c"))
        val prev = ranks
        ranks = Checkpoints.stableTracked(
          tNodes.join(contribs, Seq("id"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("id"), round(
              (lit(1.0) - lit(damping)) * col("__t") +
                lit(damping) * (coalesce(col("__c"), lit(0.0)) + col("__dm") * col("__t")),
              9).as("r")))
        prev._1.unpersist(blocking = false)
        Checkpoints.drop(prev._1, prev._2)
      }
      val out = ranks._1.select(col("id"), round(col("r"), 6).as("rank"))
        .localCheckpoint()
      Checkpoints.drop(ranks._1, ranks._2)
      out
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** Canonical SIMPLE undirected edge list (a < b) from a possibly
    * directed multi-edge list: self-loops dropped, duplicates and
    * reversals collapsed. Ids keep their native type (least/greatest
    * orders numerics AND the host-graph strings). */
  private def undirectedSimple(cleaned: DataFrame): DataFrame =
    cleaned.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Per-node triangle count + local clustering coefficient over the
    * SIMPLE UNDIRECTED graph induced by a (possibly directed, possibly
    * multi-) edge list: direction, duplicate edges, and self-loops are
    * collapsed first, so "triangle" means what it means in the crawl-
    * graph literature (mutual-neighborhood density; the hub-vs-
    * authority distinction belongs to [[hits]]).
    *
    *   lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),  0 when deg ≤ 1
    *
    * Scale shape — compact-forward wedge counting (Latapy 2008 /
    * Schank-Wagner): each canonical edge is ORIENTED from the lower
    * (degree, id) endpoint to the higher, and wedges are enumerated
    * only at a node's FORWARD neighborhood. Every triangle then has
    * exactly one pivot (its minimum node in the degree total order)
    * and exactly one directed closing edge between the two heads, so
    * the wedge→edge join counts each triangle once with no ordering
    * predicate. The payoff at 100 TB: a power-law hub of degree d
    * contributes O(√m) forward wedges instead of O(d²) — the join
    * volume is O(m^1.5) worst-case on ANY graph, not quadratic in the
    * hottest key. Joins shuffle on node ids (the wedge self-join reuses
    * the pivot-keyed exchange of the persisted oriented edge frame);
    * per-corner counts are one map-side-combined aggregate of the
    * exploded triangle corners; no driver state anywhere.
    *
    * Determinism: tri and deg are exact integers; lcc rounds to 9dp
    * (the [[pageRank]] rule). Every node the edge list MENTIONS (any
    * non-null endpoint) gets a row — a node whose only edges are
    * self-loops keeps its identity as (id, 0, 0, 0.0) rather than
    * vanishing, so callers joining the stats back onto a host list
    * see an explicit zero, not a missing row. Returns
    * (id, degree, triangles, lcc). */

  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // null endpoints carry no usable edge; everything else keeps its
    // native type — least/greatest works for numeric AND string ids
    // (the host-graph use), so no forced cast
    val cleaned = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    var pinned: List[DataFrame] = List(cleaned)
    try {
      val nodes = cleaned.select(col("src").as("id"))
        .unionByName(cleaned.select(col("dst").as("id"))).distinct()
      // canonical simple graph: triangles live here
      val und = undirectedSimple(cleaned).persist()
      pinned ::= und
      val deg = und.select(col("a").as("id"))
        .unionByName(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree")).persist()
      pinned ::= deg
      // orient low-(degree, id) → high; und already has a < b, so a
      // wins degree ties and the order is total
      val aLow = col("__da") < col("__db") || (col("__da") === col("__db"))
      val dir = und
        .join(deg.select(col("id").as("a"), col("degree").as("__da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("degree").as("__db")), Seq("b"))
        .select(when(aLow, col("a")).otherwise(col("b")).as("u"),
          when(aLow, col("b")).otherwise(col("a")).as("v"))
        .persist()
      pinned ::= dir
      // forward wedges at pivot u, closed by the directed edge (v, w);
      // v ≠ w enumerates BOTH head orders but only one matches the
      // closing edge's orientation — each triangle lands exactly once
      val wedges = dir.join(dir.select(col("u"), col("v").as("w")), Seq("u"))
        .where(col("v") =!= col("w"))
      val tri = wedges.join(
        dir.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      val perNode = tri
        .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("triangles"))
      val d = coalesce(col("degree"), lit(0L))
      nodes.join(deg, Seq("id"), "left").join(perNode, Seq("id"), "left")
        .select(col("id"), d.as("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"),
          round(when(d > 1,
              lit(2.0) * coalesce(col("triangles"), lit(0L)) / (d * (d - 1)))
            .otherwise(lit(0.0)), 9).as("lcc"))
        .localCheckpoint()
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** Link-prediction scores for non-adjacent node pairs at distance 2
    * in the simple undirected graph: common-neighbor count, Jaccard
    * neighborhood overlap, and the resource-allocation index
    * RA(u,w) = Σ_{z ∈ Γ(u)∩Γ(w)} 1/deg(z) (Zhou, Lü & Zhang, EPJ B
    * 2009) — RA over Adamic-Adar deliberately: 1/deg is a pure
    * rational whose per-term doubles both engines compute identically
    * (IEEE division), where AA's 1/ln(deg) would hang oracle equality
    * on two libms' last-ulp log agreement. Returns the `topN` pairs by
    * (ra desc, cn desc, node_1, node_2) — a total order, so the cut
    * is deterministic.
    *
    * Scale shape: candidate pairs enumerate per shared neighbor z —
    * Σ deg(z)² wedges, quadratic in the hottest hub (no triangle-style
    * orientation trick exists here: BOTH wedge endpoints must
    * surface). That is the operator's honest cost, and
    * `maxCenterDegree` is the scale knob: dropping super-hub centers
    * (a city every crawler links) bounds the blowup at a documented,
    * reported approximation — each skipped center contributes at most
    * 1/maxCenterDegree per pair, the score mass RA exists to discount.
    * Default keeps EXACT semantics (the oracle path). Joins key on
    * node ids (AQE handles residual skew); the per-pair reduction is
    * one map-side-combined aggregate; adjacency removal is one
    * anti join on the canonical (a, b) key; degree joins are
    * node-cardinality frames.
    *
    * Determinism: cn and degrees are exact integers; jaccard =
    * cn/(deg u + deg w − cn) is one exact-input division; ra sums
    * identical per-term doubles and rounds 6dp (the [[pageRank]]
    * output rule). Returns (node_1, node_2, common_neighbors,
    * resource_alloc, jaccard). */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      topN: Int, maxCenterDegree: Int = Int.MaxValue): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2 (a wedge center has two ends), " +
        s"got $maxCenterDegree")
    val cleaned = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val und = undirectedSimple(cleaned).persist()
    var pinned: List[DataFrame] = List(und)
    try {
      // both directions: Γ(u) as rows (u, z); degree = |Γ(u)| exactly
      // (the simple graph has no duplicate neighbors to inflate it)
      val nb = und.select(col("a").as("u"), col("b").as("z"))
        .unionByName(und.select(col("b").as("u"), col("a").as("z")))
        .persist()
      pinned ::= nb
      val deg = nb.groupBy(col("u").as("id")).agg(count(lit(1)).as("d"))
        .persist()
      pinned ::= deg
      val centers = nb.join(deg.select(col("id").as("z"), col("d").as("__dz")),
          Seq("z"))
        .where(col("__dz") <= maxCenterDegree)
      val cand = centers.select(col("z"), col("u").as("n1"), col("__dz"))
        .join(nb.select(col("z"), col("u").as("n2")), Seq("z"))
        .where(col("n1") < col("n2"))
        .groupBy(col("n1"), col("n2"))
        .agg(count(lit(1)).as("common_neighbors"),
          round(sum(lit(1.0) / col("__dz")), 6).as("resource_alloc"))
      val nonAdj = cand.join(und,
        cand("n1") === und("a") && cand("n2") === und("b"), "left_anti")
      nonAdj
        .join(deg.select(col("id").as("n1"), col("d").as("__d1")), Seq("n1"))
        .join(deg.select(col("id").as("n2"), col("d").as("__d2")), Seq("n2"))
        .select(col("n1").as("node_1"), col("n2").as("node_2"),
          col("common_neighbors"), col("resource_alloc"),
          round(col("common_neighbors") /
            (col("__d1") + col("__d2") - col("common_neighbors"))
              .cast("double"), 6).as("jaccard"))
        .orderBy(col("resource_alloc").desc, col("common_neighbors").desc,
          col("node_1"), col("node_2"))
        .limit(topN)
        .localCheckpoint()
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** One-row structural profile of a link graph — the shape numbers a
    * crawl-curation run reads before choosing parameters for
    * [[pageRank]]/[[triangleStats]]/[[linkPrediction]]:
    *
    *  - n_nodes / n_edges: the canonicalized simple-graph size
    *    ([[undirectedSimple]]);
    *  - reciprocity: fraction of directed non-loop edges whose
    *    reverse also exists (mutual linking — near 0 for true
    *    hierarchies, near 1 for social-ish graphs);
    *  - max/avg degree: the skew headline (avg = 2m/n);
    *  - degree assortativity r (Newman, PRL 2002, eq. 4): the Pearson
    *    correlation of endpoint degrees over undirected edges —
    *    negative means hubs link to leaves (the typical web shape),
    *    positive means hubs cluster.
    *
    * Every sum in r is a sum of INTEGER products (degrees are ints),
    * so the statistic is exact up to the final pinned double
    * divisions — stronger than the pageRank rounding story: no
    * accumulation-order FP at all. r is null for a degree-regular
    * graph (zero variance — the correlation is undefined, not 0).
    *
    * Scale shape: the [[triangleStats]] front (canonicalize + degree
    * aggregate), one self-join for reciprocity keyed on the edge
    * pair, two degree joins, one 1-row reduction. Returns (n_nodes,
    * n_edges, reciprocity, max_degree, avg_degree, assortativity). */
  def profile(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cleaned = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct().persist()
    var pinned: List[DataFrame] = List(cleaned)
    try {
      val und = undirectedSimple(cleaned).persist()
      pinned ::= und
      val deg = und.select(col("a").as("id"))
        .unionByName(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d")).persist()
      pinned ::= deg
      val recip = cleaned.as("e")
        .join(cleaned.select(col("src").as("dst"), col("dst").as("src")).as("r"),
          Seq("src", "dst"), "left_semi")
        .agg(count(lit(1)).as("__nrecip"))
      val dirTotal = cleaned.agg(count(lit(1)).as("__ndir"))
      val ends = und
        .join(deg.select(col("id").as("a"), col("d").as("__j")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("d").as("__k")), Seq("b"))
      val sums = ends.agg(count(lit(1)).as("__m"),
        sum(col("__j") * col("__k")).as("__sjk"),
        sum(col("__j") + col("__k")).as("__sjpk"),
        sum(col("__j") * col("__j") + col("__k") * col("__k")).as("__sj2k2"))
      val nodes = deg.agg(count(lit(1)).as("__n"), max("d").as("max_degree"))
      // Newman eq. 4 with the half-sums folded in: with S1 = Σ(j+k),
      // S2 = Σ(j²+k²), Sjk = Σjk over M edges,
      //   r = (Sjk/M − (S1/2M)²) / (S2/2M − (S1/2M)²)
      val mD = col("__m").cast("double")
      val mean = col("__sjpk") / (lit(2.0) * mD)
      val num = col("__sjk") / mD - mean * mean
      val den = col("__sj2k2") / (lit(2.0) * mD) - mean * mean
      sums.crossJoin(broadcast(nodes))
        .crossJoin(broadcast(recip)).crossJoin(broadcast(dirTotal))
        .select(col("__n").as("n_nodes"), col("__m").as("n_edges"),
          when(col("__ndir") > 0,
            round(col("__nrecip") / col("__ndir").cast("double"), 6))
            .as("reciprocity"),
          col("max_degree"),
          when(col("__n") > 0,
            round(lit(2.0) * mD / col("__n"), 4)).as("avg_degree"),
          when(den > 0.0, round(num / den, 6)).as("assortativity"))
        .localCheckpoint()
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** HITS hubs-and-authorities (Kleinberg, JACM 1999) — [[pageRank]]'s
    * companion for link graphs where pointing WELL matters separately
    * from being pointed AT (directory/hub pages vs content pages):
    * per synchronous iteration, authority(v) = Σ_{u→v} hub(u) then
    * hub(u) = Σ_{u→v} authority(v), each L2-normalized.
    *
    * Determinism: both score vectors round to 9dp after each
    * normalization (the [[pageRank]] rule) so an oracle unrolls
    * iterations value-for-value; the L2 norm is a 1-row aggregate
    * cross-joined broadcast, no driver collect in the loop.
    *
    * Scale shape mirrors [[pageRank]]: src- and dst-keyed join +
    * map-side-combined aggregate per half-step over the persisted
    * edge list; per-round [[Checkpoints.stableTracked]] state.
    * Returns (id, authority, hub), both rounded 6dp. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // native id types and null-edge drop, as in [[pageRank]]
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    var pinned: List[DataFrame] = List(e, nodes)
    var scratch: List[DataFrame] = Nil
    try {
      // the input is persisted BEFORE the norm aggregate: the score
      // frame feeds its own norm, the normalized rows, and the next
      // half-step — unpersisted, the corpus-scale edge join + aggregate
      // subtree would re-evaluate per consumer
      def l2normalized(df0: DataFrame, c: String): DataFrame = {
        val df = df0.persist()
        scratch ::= df
        val norm = df.agg(sqrt(sum(col(c) * col(c))).as("__n"))
        df.crossJoin(broadcast(norm))
          .select(col("id"), round(col(c) / col("__n"), 9).as(c))
      }
      var state = Checkpoints.stableTracked(
        nodes.select(col("id"), lit(1.0).as("auth"), lit(1.0).as("hub")))
      for (_ <- 1 to iters) {
        val auth = l2normalized(
          nodes.join(
              e.join(state._1.select(col("id").as("src"), col("hub")), Seq("src"))
                .groupBy(col("dst").as("id")).agg(sum("hub").as("auth")),
              Seq("id"), "left")
            .select(col("id"), coalesce(col("auth"), lit(0.0)).as("auth")),
          "auth").persist()
        scratch ::= auth
        val hub = l2normalized(
          nodes.join(
              e.join(auth.select(col("id").as("dst"), col("auth")), Seq("dst"))
                .groupBy(col("src").as("id")).agg(sum("auth").as("hub")),
              Seq("id"), "left")
            .select(col("id"), coalesce(col("hub"), lit(0.0)).as("hub")),
          "hub")
        val prev = state
        state = Checkpoints.stableTracked(auth.join(hub, Seq("id")))
        prev._1.unpersist(blocking = false)
        Checkpoints.drop(prev._1, prev._2)
        // this round's scratch caches served their purpose once the
        // round's state materialized
        scratch.foreach(_.unpersist(blocking = false))
        scratch = Nil
      }
      val out = state._1.select(col("id"), round(col("auth"), 6).as("authority"),
        round(col("hub"), 6).as("hub")).localCheckpoint()
      Checkpoints.drop(state._1, state._2)
      out
    } finally (pinned ++ scratch).foreach(_.unpersist(blocking = false))
  }

  /** Katz centrality (Katz 1953) over a directed edge list — the
    * walk-counting authority score [[pageRank]]'s random surfer
    * doesn't compute: every incoming walk contributes, attenuated by
    * β per hop, so a node fed by long chains of well-fed nodes scores
    * above one with the same in-degree from nowhere:
    *
    *   x'(v) = 1 + β·Σ_{u→v} x(u)
    *
    * from x₀ = 1, `iters` synchronous iterations (the truncated
    * Neumann series Σₖ βᵏ·(Aᵀ)ᵏ·1; β must stay below 1/λ_max for the
    * full series — at a fixed iteration count any β ∈ (0,1) is
    * well-defined, the standard practical reading).
    *
    * Determinism: the [[pageRank]] rule — state rounds 9dp per
    * iteration so an oracle unrolls value-for-value; β enters as a
    * double CAST (engines fold bare decimal literals differently).
    * Unlike pageRank there is no normalization and no dangling term —
    * the recurrence is a pure in-neighbor sum, making this the
    * cheapest of the centrality loops (no 1-row broadcast per round).
    *
    * Scale shape: per iteration one src-keyed join + one map-side-
    * combined dst-keyed aggregate; per-round state through
    * [[Checkpoints.stableTracked]]. Returns (id, centrality 6dp). */
  def katz(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, beta: Double = 0.1): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(beta > 0.0 && beta < 1.0, s"beta must be in (0,1), got $beta")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    val pinned = List(e, nodes)
    try {
      var x = Checkpoints.stableTracked(
        nodes.withColumn("x", lit(1.0)))
      for (_ <- 1 to iters) {
        val contribs = e.join(
            x._1.select(col("id").as("src"), col("x").as("__xs")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum("__xs").as("__c"))
        val prev = x
        x = Checkpoints.stableTracked(
          nodes.join(contribs, Seq("id"), "left")
            .select(col("id"), round(
              lit(1.0) + lit(beta) * coalesce(col("__c"), lit(0.0)),
              9).as("x")))
        prev._1.unpersist(blocking = false)
        Checkpoints.drop(prev._1, prev._2)
      }
      val out = x._1.select(col("id"), round(col("x"), 6).as("centrality"))
        .localCheckpoint()
      Checkpoints.drop(x._1, x._2)
      out
    } finally pinned.foreach(_.unpersist(blocking = false))
  }

  /** k-core decomposition (the k-core: the maximal subgraph where
    * every node keeps degree ≥ k INSIDE the subgraph) — the
    * link-farm/spam-cluster detector and the "dense core vs sparse
    * periphery" split of a crawl graph (Seidman 1983). Iterative
    * peeling: drop nodes of degree < k, recompute degrees in what
    * remains, repeat to the fixpoint. The fixpoint is UNIQUE and
    * order-independent (peeling is confluent), so any schedule — this
    * synchronous one, a sequential one, an unrolled SQL one — lands
    * on the same node set: that is what makes an external replay
    * possible without mirroring the iteration count.
    *
    * Determinism: degrees are exact integers; no FP exists anywhere.
    * Scale shape: per round two semi joins (edge endpoints against
    * the surviving set) + one map-side-combined degree aggregate;
    * survivors through [[Checkpoints.stableTracked]]; one
    * convergence scalar per round (the BFS frontier rule). Rounds are
    * data-bounded (each round removes ≥ 1 node or stops). The input
    * is canonicalized to a simple undirected graph (dedup, self-loops
    * dropped) first. Returns surviving (id, core_degree). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = Int.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val und = canon.select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
      .persist()
    try {
      var alive = Checkpoints.stableTracked(
        und.select(col("u").as("id")).distinct())
      var aliveCount = alive._1.count()
      var done = aliveCount == 0
      var rounds = 0
      while (!done) {
        rounds += 1
        // fail LOUD past the cap: a caller pinning maxRounds to an
        // externally-unrolled schedule (q182's 16-round oracle) must
        // see "needs more rounds" as an error here, not as a
        // confusing downstream hash mismatch
        if (rounds > maxRounds) throw new IllegalStateException(
          s"kCore did not converge within maxRounds=$maxRounds")
        val deg = und
          .join(alive._1.select(col("id").as("u")), Seq("u"), "left_semi")
          .join(alive._1.select(col("id").as("v")), Seq("v"), "left_semi")
          .groupBy(col("u").as("id")).agg(count(lit(1)).as("core_degree"))
        val next = Checkpoints.stableTracked(
          deg.where(col("core_degree") >= k))
        val nextCount = next._1.count()
        if (nextCount == aliveCount || nextCount == 0) {
          Checkpoints.drop(alive._1, alive._2)
          alive = next
          aliveCount = nextCount
          done = true
        } else {
          Checkpoints.drop(alive._1, alive._2)
          alive = next
          aliveCount = nextCount
        }
      }
      // the converged frame carries (id, core_degree) except the
      // empty-graph / all-peeled case, where it is the id-only seed
      val out = (if (alive._1.columns.contains("core_degree")) alive._1
        else alive._1.withColumn("core_degree", lit(0L)))
        .localCheckpoint()
      Checkpoints.drop(alive._1, alive._2)
      out
    } finally und.unpersist(blocking = false)
  }

  /** Multi-source BFS hop distance — "how many links out from the
    * trusted core is this page": minimum hop count from any seed,
    * bounded by `maxHops` (the crawl-frontier depth audit, and the
    * companion radius diagnostic to [[pageRank]]'s continuous score).
    * Seeds are reported at distance 0 whether or not they touch the
    * edge list; nodes unreached within the bound are ABSENT (a
    * depth-k frontier cannot distinguish "far" from "disconnected",
    * so it must not invent a sentinel distance).
    *
    * Determinism: distances are exact integers — no FP anywhere.
    *
    * Scale shape: textbook frontier iteration — per hop, one join of
    * the CURRENT FRONTIER (not the visited set) against the edge
    * list, one distinct, one anti join against visited; frontier
    * state through [[Checkpoints.stableTracked]]. The per-hop
    * early-exit scalar is a frontier count — the same one-scalar-
    * per-round shape as the connected-components convergence check.
    * At 100 TB the frontier join is the dominant cost and is keyed on
    * src — pre-bucketing edges by src makes every hop co-located.
    * Returns (id, dist). */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).persist()
    try {
      var visited = Checkpoints.stableTracked(
        seeds.select(col(seeds.columns.head).as("id")).distinct()
          .withColumn("dist", lit(0L)))
      var frontier = visited._1
      var hop = 0
      var frontierSize = frontier.count()
      while (hop < maxHops && frontierSize > 0) {
        hop += 1
        val next = frontier.join(e, col("id") === col("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited._1, Seq("id"), "left_anti")
          .withColumn("dist", lit(hop.toLong))
        val prev = visited
        visited = Checkpoints.stableTracked(visited._1.unionByName(next))
        // count the NEW frontier from the materialized union (one
        // scan of checkpointed state, no recompute of the anti join)
        frontier = visited._1.where(col("dist") === hop.toLong)
        frontierSize = frontier.count()
        prev._1.unpersist(blocking = false)
        Checkpoints.drop(prev._1, prev._2)
      }
      val out = visited._1.localCheckpoint()
      Checkpoints.drop(visited._1, visited._2)
      out
    } finally e.unpersist(blocking = false)
  }
}
