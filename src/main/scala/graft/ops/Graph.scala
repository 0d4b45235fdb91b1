package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.core.CacheHandle

/** Distributed graph analytics beyond connected components
  * (`Dedup.nearDupClusters`): PageRank — the canonical quality/centrality
  * weight for web-scale corpora (domain authority as a training-data
  * quality signal).
  */
object Graph {

  /** Power-iteration PageRank with damping and dangling-mass
    * redistribution:
    * rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N).
    *
    * Scale shape: the textbook distributed formulation — per iteration,
    * ONE join of the rank vector to the edge list on the source (both
    * hash-partitioned on node; skinny (node, rank) tuples move, never
    * payloads) and one groupBy(dst) sum with map-side partials. Node set
    * and out-degrees are computed once and checkpointed; each iteration's
    * ranks are `localCheckpoint`ed to truncate the growing lineage (the
    * same iterate-checkpoint pattern as label propagation and k-means).
    * Dangling mass is a 1-row aggregate broadcast back into the plan —
    * never a driver-side collect of ranks. N (one long) is the only
    * driver scalar, like the k-means centroid count.
    *
    * Checkpoint lifetimes mirror `Dedup.nearDupClusters`: each
    * iteration's rank checkpoint is freed as soon as its successor
    * materializes, the edge/node/degree checkpoints are freed before
    * returning (the final ranks frame is lineage-truncated, so it does
    * not depend on them), and the final rank blocks are registered on
    * the caller's `cache` handle — long-lived sessions that call this
    * repeatedly release via `cache.release()` instead of waiting on
    * driver GC.
    *
    * Deterministic up to float summation order; callers comparing across
    * engines should round (the oracle rounds to 6dp, with ranks ~1/N the
    * 1e-15 relative float noise sits far below that). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(damping > 0 && damping < 1, "pageRank: damping must be in (0,1)")
    require(iters >= 1, "pageRank: iters must be >= 1")
    val internal = new CacheHandle
    val (e, freeE) = CacheHandle.checkpointSmall(
      edges.select(col(srcCol).as("node"), col(dstCol).as("dst")))
    internal.trackRelease(freeE)
    val (nodes, freeNodes) = CacheHandle.checkpointSmall(
      e.select(col("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    internal.trackRelease(freeNodes)
    val n = nodes.count()
    val (outDeg, freeDeg) = CacheHandle.checkpointSmall(
      e.groupBy(col("node")).agg(count(lit(1)).as("deg")))
    internal.trackRelease(freeDeg)
    var (ranks, freeRanks) = CacheHandle.checkpointSmall(
      nodes.withColumn("rank", lit(1.0 / n)))
    (1 to iters).foreach { _ =>
      val contribs = ranks.join(outDeg, "node").join(e, "node")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val dangling = ranks.join(outDeg, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val (next, freeNext) = CacheHandle.checkpointSmall(
        nodes.join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("in_mass"), lit(0.0)) + col("dm") / n))
              .as("rank")))
      // `next` is self-contained — the superseded round frees safely
      freeRanks(false)
      ranks = next
      freeRanks = freeNext
    }
    internal.release()
    cache.trackRelease(freeRanks)
    ranks
  }

  /** PERSONALIZED PageRank: teleport lands on the `seeds` node set
    * (uniformly) instead of all nodes — rank'(v) = (1−d)·p(v) +
    * d·(Σ_{u→v} rank(u)/outdeg(u) + dangling·p(v)), p(v) = 1/|S| on
    * seeds, 0 elsewhere. THE similarity-to-a-set signal: "pages like
    * my trusted domains" (TrustRank-style quality propagation),
    * "items near this user's history". Seeds arrive as a DataFrame —
    * a 10⁸-node seed set never rides the driver.
    *
    * Same iterate-checkpoint skeleton as [[pageRank]] (one rank⋈edge
    * join + one dst rollup per iteration, dangling as a broadcast
    * 1-row aggregate, superseded checkpoints freed in-loop); the
    * teleport column is decorated onto the checkpointed node frame
    * once. |S| is the only extra driver scalar. Seeds not present in
    * the graph still receive teleport mass (they are added to the
    * node set) — dropping them would silently re-normalize p. */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      damping: Double = 0.85, iters: Int = 10,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(damping > 0 && damping < 1,
      "personalizedPageRank: damping must be in (0,1)")
    require(iters >= 1, "personalizedPageRank: iters must be >= 1")
    val internal = new CacheHandle
    val (e, freeE) = CacheHandle.checkpointSmall(
      edges.select(col(srcCol).as("node"), col(dstCol).as("dst")))
    internal.trackRelease(freeE)
    val (seedSet, freeSeeds) = CacheHandle.checkpointSmall(
      seeds.select(col(seedCol).as("node")).distinct())
    internal.trackRelease(freeSeeds)
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "personalizedPageRank: empty seed set")
    val (nodes, freeNodes) = CacheHandle.checkpointSmall(
      e.select(col("node"))
        .union(e.select(col("dst").as("node")))
        .union(seedSet.select(col("node")))
        .distinct()
        .join(seedSet.select(col("node"), lit(1.0 / nSeeds).as("__p")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__p"), lit(0.0)).as("tele")))
    internal.trackRelease(freeNodes)
    val (outDeg, freeDeg) = CacheHandle.checkpointSmall(
      e.groupBy(col("node")).agg(count(lit(1)).as("deg")))
    internal.trackRelease(freeDeg)
    var (ranks, freeRanks) = CacheHandle.checkpointSmall(
      nodes.select(col("node"), col("tele").as("rank")))
    (1 to iters).foreach { _ =>
      val contribs = ranks.join(outDeg, "node").join(e, "node")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val dangling = ranks.join(outDeg, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val (next, freeNext) = CacheHandle.checkpointSmall(
        nodes.join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("node"),
            (lit(1 - damping) * col("tele") + lit(damping) *
              (coalesce(col("in_mass"), lit(0.0)) +
                col("dm") * col("tele"))).as("rank")))
      freeRanks(false)
      ranks = next
      freeRanks = freeNext
    }
    internal.release()
    cache.trackRelease(freeRanks)
    ranks
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected graph given as an edge list (duplicate / reversed / self
    * edges tolerated — normalized first). Returns
    * (node, deg, triangles, cc) for every node, cc = 2T/(deg·(deg−1))
    * rounded 6dp (0.0 below degree 2). Triangle density is the
    * community-structure signal PageRank can't see (spam farms are
    * high-rank but triangle-poor; organic neighborhoods are clustered).
    *
    * Enumeration is the Schank–Wagner "forward" algorithm: orient every
    * edge from its lower (degree, id) endpoint to the higher — in any
    * triangle only the minimum-rank vertex then has TWO outgoing edges,
    * so counting wedges (s→d1, s→d2) closed by the undirected edge
    * {d1, d2} sees each triangle exactly once, no post-dedup.
    *
    * Scale shape: degree ORIENTATION is the part that survives skew —
    * oriented out-degrees are O(√m) on any graph (arboricity bound), so
    * the wedge self-join fans out Σ d_out² ≤ O(m^1.5) instead of the
    * Σ deg² a naive wedge join pays on power-law graphs (a single
    * 10⁶-degree hub would otherwise emit 10¹² wedges). Joins: normalize
    * (one distinct shuffle) → skinny degree rollup → wedge self-join on
    * the source key → closing hash join on the canonical (lo, hi) pair
    * (shuffle-hash pinned: the edge side is ≪ the wedge side; sort-merge
    * would sort the wedges for nothing) → 3 credit rows per triangle →
    * one count shuffle. Every wire row is a pair/triple of longs. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val ranked = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("d")))
          .otherwise(struct(col("v").as("s"), col("u").as("d"))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
    val tri = ranked.as("e1")
      .join(ranked.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.d") < col("e2.d"))
      .select(col("e1.s").as("a"), col("e1.d").as("b"), col("e2.d").as("c"))
      .join(und.hint("shuffle_hash"),
        col("u") === col("b") && col("v") === col("c"))
      .select(col("a"), col("b"), col("c"))
    val credits = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(credits, Seq("n"), "left")
      .select(col("n").as("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("cc",
        when(col("deg") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("deg") * (col("deg") - lit(1L))), 6))
          .otherwise(lit(0.0)))
  }

  /** Connected components with POINTER JUMPING — the accelerated
    * sibling of `Dedup.propagateMinLabels`. Returns (node, component)
    * for every node appearing in `edges`, component = minimum node id
    * reachable from it.
    *
    * Each round does two monotone label updates:
    *   1. PROPAGATE: l(v) ← min(l(v), min over neighbors u of l(u)) —
    *      the label-prop step, one skinny join + partial-agg shuffle.
    *   2. JUMP: l(v) ← min(l(v), l'(l'(v))) where l' is THIS round's
    *      propagated map — composing the updated map with itself
    *      (pointer doubling: a chain of parent links halves per
    *      round).
    *
    * Round bound, honestly: on graphs whose label chains align with
    * the topology (a long path with ids increasing along it — the
    * adversarial case for plain label prop, which walks it one hop per
    * round) the jump doubles reach and the loop converges in O(log d)
    * rounds (pinned by the 64-chain unit: ≤ 10 rounds). On graphs with
    * SCRAMBLED ids the jump's gain is data-dependent — the known min
    * can sit adjacent to you and teach nothing — so the worst case
    * stays O(d) rounds (measured: a 1000-node scrambled-id chain does
    * NOT converge in 64 rounds; use [[connectedComponentsStar]] for
    * such graphs — worst-case O(log² n) by edge-rewriting star
    * contraction). Rounds are cheap (every frame is (long, long)
    * pairs), so the pragmatic contract is: iterate until CONVERGED,
    * and THROW if `maxIters` is hit first — silently returning
    * partially-propagated labels would mislabel components, and no
    * caller can detect it downstream.
    *
    * Scale shape: per round one adjacency⋈labels hash join +
    * map-side-combined min, one self-join of the propagated map, one
    * checkpoint; superseded rounds free inside the loop (the
    * nearDupClusters lifetime pattern) and the final checkpoint's
    * release registers on `cache`. Convergence = no label changed,
    * checked as a limit-1 count on the already-checkpointed frame.
    * (`CacheHandle.checkpointSmall` also caps the Catalyst size
    * ESTIMATE each round — see `StatsReset`: without it, self-join
    * loops square the BigInt estimate per round and the driver's
    * join-size estimation goes exponential past ~17 rounds.) */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 60,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val internal = new CacheHandle
    val (adj, freeAdj) = CacheHandle.checkpointSmall(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .where(col("u").isNotNull && col("v").isNotNull &&
          col("u") =!= col("v"))
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .distinct())
    internal.trackRelease(freeAdj)
    // l0(v) = min(v, min neighbor) — one round of propagation for free
    var (labels, freeLabels) = CacheHandle.checkpointSmall(
      adj.groupBy(col("a").as("node"))
        .agg(least(col("a"), min(col("b"))).as("label")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNbr = adj
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node")).agg(min(col("label")).as("nl"))
      val (prop, freeProp) = CacheHandle.checkpointSmall(
        labels.join(viaNbr, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nl"), col("label")))
              .as("label"),
            col("label").as("__prev")))
      // jump: l'(l'(v)) over THIS round's propagated map — the label IS
      // a node id, so the map self-joins (pointer doubling)
      val (next, freeNext) = CacheHandle.checkpointSmall(
        prop.join(
            prop.select(col("node").as("label"), col("label").as("ll")),
            Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("ll"), col("label")))
              .as("label"),
            col("__prev")))
      val changed = next.filter(col("label") =!= col("__prev"))
        .limit(1).count()
      freeProp(false)
      freeLabels(false)
      labels = next.drop("__prev")
      freeLabels = freeNext
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      freeLabels(false)
      internal.release()
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters rounds — " +
          "partial labels would silently mislabel components; raise " +
          "maxIters (rounds are skinny-frame cheap)")
    }
    internal.release()
    cache.trackRelease(freeLabels)
    labels.select(col("node"), col("label").as("component"))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (the
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SOCC 2014 — the algorithm
    * behind GraphFrames' CC): worst-case O(log² n) rounds REGARDLESS of
    * how ids are laid out on the topology — the guarantee
    * [[connectedComponents]]'s prop+jump loop cannot give (measured
    * here: a 1000-node chain with SCRAMBLED ids needs > 64 prop+jump
    * rounds — the known min can sit adjacent and teach nothing — vs a
    * handful of star rounds). Same output contract: (node, component)
    * with component = the component's minimum id, nodes drawn from
    * non-self-loop edge endpoints.
    *
    * Each round rewrites the edge set twice, keeping every edge
    * oriented big → small:
    *  - LARGE-STAR: per node u, m = min(N(u) ∪ {u}); every neighbor
    *    v > u re-links to m. Strictly-larger neighbors shortcut past u
    *    in one step.
    *  - SMALL-STAR: per node u over its smaller neighbors, m = min;
    *    u and every smaller neighbor ≠ m link to m. Chains of small
    *    parents collapse.
    * Fixpoint = the edge set is a forest of stars (every node points
    * directly at its component min); detected by an order-independent
    * (count, hash-sum, hash-xor) fingerprint going unchanged — one
    * 1-row aggregate per round, never an edge-set compare. Hitting
    * `maxIters` without the fixpoint THROWS (the
    * [[connectedComponents]] contract: partial links mislabel).
    *
    * Scale shape: every round is groupBy-min + join-back + distinct
    * over SKINNY (big, small) pairs — three hash Exchanges per star
    * op, all on node keys, partial-aggregated; no frame ever exceeds
    * the (deduped) edge count, and the paper proves the edge set only
    * shrinks toward stars. Rounds checkpoint via
    * [[CacheHandle.checkpointSmall]] (lineage truncation + the stats
    * cap — see StatsReset) and superseded rounds free inside the loop.
    * Prefer THIS variant when component diameters can be large and ids
    * are uncorrelated with topology (web graphs, scrambled hashes);
    * prop+jump wins small-diameter or id-sorted graphs by a constant
    * (fewer shuffles per round). */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
      dstCol: String, maxIters: Int = 30,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    val internal = new CacheHandle
    val base = edges.select(col(srcCol).as("u0"), col(dstCol).as("v0"))
      .where(col("u0").isNotNull && col("v0").isNotNull &&
        col("u0") =!= col("v0"))
    val (nodes, freeNodes) = CacheHandle.checkpointSmall(
      base.select(explode(array(col("u0"), col("v0"))).as("node"))
        .distinct())
    internal.trackRelease(freeNodes)
    var (e, freeE) = CacheHandle.checkpointSmall(
      base.select(greatest(col("u0"), col("v0")).as("u"),
        least(col("u0"), col("v0")).as("v")).distinct())
    def largeStar(in: DataFrame): DataFrame = {
      val sym = in.unionAll(
        in.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def smallStar(in: DataFrame): DataFrame = {
      val mins = in.groupBy(col("u")).agg(min(col("v")).as("m"))
      in.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }
    def fingerprint(df: DataFrame): (Long, Long, Long) = {
      // mod-sum (the tableFingerprint convention) keeps the hash sum
      // inside BIGINT under ANSI overflow checking
      val r = df.agg(count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000003L))),
          lit(0L)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var fp = fingerprint(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val (next, freeNext) = CacheHandle.checkpointSmall(
        smallStar(largeStar(e)))
      val nfp = fingerprint(next)
      freeE(false)
      e = next
      freeE = freeNext
      converged = nfp == fp
      fp = nfp
      i += 1
    }
    if (!converged) {
      freeE(false)
      internal.release()
      throw new IllegalStateException(
        s"connectedComponentsStar: no star fixpoint after $maxIters " +
          "rounds — partial links would mislabel components; raise " +
          "maxIters (the bound is O(log^2 n) rounds)")
    }
    val (labels, freeLabels) = CacheHandle.checkpointSmall(
      nodes.join(
          e.select(col("u").as("node"), col("v").as("component")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("component"), col("node")).as("component")))
    freeE(false)
    internal.release()
    cache.trackRelease(freeLabels)
    labels
  }

  /** Auto-selecting connected components — the caller no longer has to
    * know whether their ids correlate with topology: run
    * [[connectedComponents]] (prop+jump — fewest shuffles per round,
    * O(log d) on small-diameter or id-sorted graphs) under a bounded
    * `probeIters` budget, and on non-convergence fall back to
    * [[connectedComponentsStar]] (O(log² n) rounds REGARDLESS of id
    * layout). This is a probe, not a predictor, so it cannot pick
    * wrong: the only cost of a bad graph is `probeIters` skinny-frame
    * rounds before the guaranteed path takes over (measured on the r13
    * scrambled-chain GO case, 1k nodes local[8]: probe 4.8 s vs star
    * 6.2 s — a failed probe roughly doubles the adversary's wall
    * clock, while id-friendly graphs converge inside the probe and
    * never pay the star's 3-Exchange rounds; callers who KNOW their
    * ids are scrambled should call the star variant directly).
    * probeIters = 12 covers diameters to ~2¹² on cooperative ids —
    * every non-adversarial case the test corpus has. */
  def connectedComponentsAuto(edges: DataFrame, srcCol: String,
      dstCol: String, probeIters: Int = 12, maxIters: Int = 30,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame =
    try connectedComponents(edges, srcCol, dstCol, probeIters, cache)
    catch {
      case e: IllegalStateException
          if e.getMessage.contains("not converged") =>
        connectedComponentsStar(edges, srcCol, dstCol, maxIters, cache)
    }

  /** Multi-source BFS hop distances: (node, dist) for every node within
    * `maxHops` undirected hops of any source, dist = exact minimum hop
    * count (sources themselves at 0). The reachability radius primitive
    * behind crawl-frontier scoping, link-spam blast-radius audits, and
    * "how far is this doc from a trusted seed set" quality signals.
    *
    * Scale shape: TRUE frontier expansion, not Bellman-Ford rounds over
    * all nodes — round k joins only the nodes first reached at k−1
    * against the adjacency list (skinny long pairs), anti-joins the
    * already-settled set, and checkpoints both. In BFS every frontier
    * label is final the round it appears (all edges weight 1), so no
    * relaxation ever revisits a settled node: total work is
    * O(edges touched) across ALL rounds, the sequential-BFS bound.
    * Early-exits when the frontier empties; superseded checkpoints free
    * inside the loop; the final settled frame's release goes on
    * `cache`. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, maxHops: Int,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(maxHops >= 0, "bfsDistances: maxHops must be >= 0")
    require(sources.columns.contains("node"),
      "bfsDistances: sources needs a 'node' column")
    val internal = new CacheHandle
    val (adj, freeAdj) = CacheHandle.checkpointSmall(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .where(col("u").isNotNull && col("v").isNotNull &&
          col("u") =!= col("v"))
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .distinct())
    internal.trackRelease(freeAdj)
    var (settled, freeSettled) = CacheHandle.checkpointSmall(
      sources.select(col("node")).distinct()
        .select(col("node"), lit(0L).as("dist")))
    var (frontier, freeFrontier) = (settled, freeSettled)
    var hop = 0L
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val (nextFrontier, freeNF) = CacheHandle.checkpointSmall(
        frontier.select(col("node").as("a"))
          .join(adj, "a")
          .select(col("b").as("node")).distinct()
          .join(settled, Seq("node"), "left_anti")
          .select(col("node"), lit(hop).as("dist")))
      val (nextSettled, freeNS) = CacheHandle.checkpointSmall(
        settled.union(nextFrontier))
      // frontier round k is contained in settled round k — free both
      if (!(freeFrontier eq freeSettled)) freeFrontier(false)
      freeSettled(false)
      frontier = nextFrontier
      freeFrontier = freeNF
      settled = nextSettled
      freeSettled = freeNS
    }
    if (!(freeFrontier eq freeSettled)) freeFrontier(false)
    internal.release()
    cache.trackRelease(freeSettled)
    settled
  }

  /** k-CORE subgraph: iterative peeling to the maximal subgraph in
    * which every node keeps degree ≥ k — the standard graph-level
    * quality/density filter (link-farm and spam-tail pruning keeps the
    * 2-core's cycles and discards the dangling trees; community mining
    * starts from dense cores). Returns (node, degree) for every
    * surviving node, degree measured WITHIN the core.
    *
    * Semantics: edges symmetrize and dedupe first (degree = distinct
    * neighbors, self-loops dropped — the [[connectedComponents]]
    * convention); each round removes ALL nodes currently under degree
    * k simultaneously (the textbook parallel peel), so the result is
    * the unique maximal k-core, independent of removal order. An empty
    * result (no node survives) is a valid outcome.
    *
    * Scale shape: per round ONE map-side-combined degree count plus two
    * anti-joins of the skinny (a, b) edge frame against the removed-
    * node set (AQE broadcasts it when small — the common case past the
    * first rounds); each round's shrunken edge set is checkpointed and
    * its predecessor freed ([[pageRank]]'s iterate-checkpoint
    * lifetime). Rounds = peel depth: ≤ the longest chain that must
    * unravel (a path peels from both ends), bounded O(n) in theory,
    * tens in practice on organic graphs. Hitting `maxIters` without a
    * fixpoint THROWS — a partial peel would overstate the core. The
    * per-round emptiness probe is a bounded driver action (the
    * [[connectedComponents]] convergence-probe convention). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100,
      cache: CacheHandle = CacheHandle.unmanaged): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val internal = new CacheHandle
    var (adj, freeAdj) = CacheHandle.checkpointSmall(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .where(col("u").isNotNull && col("v").isNotNull &&
          col("u") =!= col("v"))
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .distinct())
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // materialized once per round: the probe and both anti-joins read it
      val (bad, freeBad) = CacheHandle.checkpointSmall(
        adj.groupBy(col("a")).agg(count(lit(1)).as("c"))
          .where(col("c") < k)
          .select(col("a").as("bad")))
      if (bad.limit(1).count() == 0L) {
        freeBad(false)
        converged = true
      } else {
        val (next, freeNext) = CacheHandle.checkpointSmall(
          adj.join(bad.select(col("bad").as("__ba")),
              col("a") === col("__ba"), "left_anti")
            .join(bad.select(col("bad").as("__bb")),
              col("b") === col("__bb"), "left_anti"))
        freeBad(false)
        freeAdj(false)
        adj = next
        freeAdj = freeNext
        i += 1
      }
    }
    if (!converged) {
      freeAdj(false)
      internal.release()
      throw new IllegalStateException(
        s"kCore: peel not converged after $maxIters rounds — a partial " +
          "peel would overstate the core; raise maxIters (each round " +
          "is one skinny-frame count + two anti-joins)")
    }
    internal.release()
    cache.trackRelease(freeAdj)
    adj.groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** One-row structural summary of an undirected graph: node/edge
    * counts, degree min/max/mean (6dp), and DEGREE ASSORTATIVITY — the
    * Pearson correlation of endpoint degrees over the symmetrized edge
    * list (Newman 2002: positive = hubs link hubs, negative =
    * hub-and-spoke; scraped web graphs and spam farms sit far
    * negative). Derived from moments (covar_pop/var_pop — the
    * [[Stats.linearRegression]] convention: ANSI-safe, merge-stable);
    * a regular graph (zero degree variance) yields null assortativity.
    *
    * Scale shape: normalize (one distinct shuffle) → skinny degree
    * rollup → two hash joins decorating each directed edge with its
    * endpoint degrees → ONE moment aggregate. Everything on the wire
    * is pairs of longs; no windows, no collect. */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val nodes = deg.agg(count(lit(1)).as("nodes"),
      min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"),
      round(avg(col("deg")), 6).as("avg_deg"))
    // both directions: assortativity is over ordered endpoint pairs
    val dirEdges = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
    val dd = dirEdges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .agg(count(lit(1)).as("__m"),
        covar_pop(col("da").cast(DoubleType), col("db").cast(DoubleType))
          .as("__cov"),
        var_pop(col("da").cast(DoubleType)).as("__va"),
        var_pop(col("db").cast(DoubleType)).as("__vb"))
    nodes.crossJoin(broadcast(dd))
      .select(col("nodes"),
        (col("__m") / lit(2L)).cast(LongType).as("edges"),
        col("min_deg"), col("max_deg"), col("avg_deg"),
        round(col("__cov") /
          nullif(sqrt(col("__va") * col("__vb")), lit(0.0)), 6)
          .as("assortativity"))
  }

  /** Adamic–Adar link prediction: for node pairs NOT already linked,
    * score = Σ over common neighbors w of 1/ln(deg w) — the standard
    * "who should be linked" baseline (rare shared neighbors count for
    * more than hubs everyone shares). Returns the `topK` candidate
    * pairs (u, v, common, aa_nano, aa) by score (ties broken (u, v)),
    * with `common` = common-neighbor count. Per-wedge contributions
    * round to integer NANOS before summing (the repo's exact-BIGINT
    * reduction convention), `aa` = nanos/1e9 rounded 6dp.
    *
    * `maxDegree` CAPS the wedge fan-out: a neighbor w generates
    * deg(w)² candidate pairs, so one 10⁶-degree hub would emit 10¹²
    * wedges; hubs above the cap are excluded as wedge CENTERS (their
    * 1/ln(deg) contribution is the smallest in the sum — the
    * documented, bounded bias every production AA implementation
    * takes; degrees themselves stay exact). deg=1 centers generate no
    * wedge; ln is safe from the =1 singularity because a wedge center
    * has ≥ 2 neighbors by construction.
    *
    * Scale shape: normalize → degree rollup → hub filter → wedge
    * self-join on the center key (fan-out ≤ maxDegree per center) →
    * one (pair) hash aggregate → LEFT ANTI against the edge set →
    * TakeOrderedAndProject top-k. All wire rows are long pairs/triples. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 10000, topK: Int = 100): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val adj = und.select(col("u").as("w"), col("v").as("n"))
      .union(und.select(col("v").as("w"), col("u").as("n")))
    val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
    val centers = adj.join(
      deg.where(col("deg") <= maxDegree && col("deg") >= 2), "w")
    val wedges = centers.as("e1")
      .join(centers.as("e2"),
        col("e1.w") === col("e2.w") && col("e1.n") < col("e2.n"))
      .select(col("e1.n").as("u"), col("e2.n").as("v"),
        col("e1.deg").as("dw"))
    val scored = wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"),
        sum(round(lit(1e9) / log(col("dw").cast(DoubleType)))
          .cast(LongType)).as("aa_nano"))
      .join(und, Seq("u", "v"), "left_anti")
    scored
      .select(col("u"), col("v"), col("common"), col("aa_nano"),
        round(col("aa_nano") / lit(1e9), 6).as("aa"))
      .orderBy(col("aa_nano").desc, col("u"), col("v")).limit(topK)
  }
}
