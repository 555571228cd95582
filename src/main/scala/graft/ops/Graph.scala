package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph ranking in integer fixed point.
  *
  * [[integerPageRank]] is the damped power iteration
  * (Page et al. 1999) with ALL rank arithmetic in 1e-12 fixed point
  * (damping 85/100, truncating division at every step): LONG sums are
  * partition-order-independent where float PageRank never
  * hash-matches, so an oracle replays the iterations bit-exactly as
  * unrolled CTEs. Two graph instances in the query surface share this
  * one kernel: the word co-occurrence graph (TextRank keywords, n76)
  * and the domain co-citation graph from crawl outlinks (n89) — the
  * point of the factoring is that "rank a graph" is one operator, not
  * a per-use-case rewrite.
  */
object Graph {

  /** Ranks in units of 1e-12; total mass ~SCALE. */
  val Scale = 1000000000000L

  /** Damped PageRank over a weighted directed edge relation
    * `(src, dst, wt)` — to rank an undirected graph, pass both edge
    * directions (as the callers here do). Returns `(node, rank)`.
    *
    * The node universe is src ∪ dst, and DANGLING nodes (no outbound
    * edges) redistribute their rank mass uniformly each round — the
    * standard correction (Page et al. 1999 §2.6): without it a
    * directed graph leaks mass through every sink and the ranks drift
    * toward zero. The dangling sum is one extra node-bounded agg per
    * round, its per-node share an integer `div n` folded into the
    * same damped update. On symmetrized graphs (every node out-degree
    * >= 1, the n76/n89 callers) the dangling relation is EMPTY and
    * the term contributes exactly 0 — those results are bit-identical
    * with or without it. Nodes with no INBOUND edges are equally
    * fine: the per-round left join keeps them at their teleport rank
    * instead of silently dropping them.
    *
    * 100 TB shape: the edge relation (with out-degrees joined) is
    * persisted ONCE and is the sole ancestor of the node list and
    * node count, so whatever pipeline built the edges runs exactly
    * once into the cache; each of the `iters` rounds is one
    * edges-bounded join-agg shuffle plus the nodes-bounded dangling
    * agg. `rank * wt` must stay under 2^63: per-edge weights up to
    * ~9e6 at full scale — lower Scale beyond (documented, the n76
    * convention).
    *
    * Evaluation semantics: on symmetrized / dangling-free graphs the
    * result is FULLY LAZY (caller-owned cache lifecycle for `ed`, the
    * repo convention). Directed graphs pay ONE probe at call time — a
    * single-shuffle node universe tagged `has_out` (src ∪ dst in one
    * groupBy, replacing the old distinct + anti-join + union triple) —
    * and, when dangling nodes exist, the kernel is EAGER AT CALL TIME:
    * the `has_out` flag rides inside each round's persisted rank
    * vector, so the round's dangling mass is a filter + scalar agg on
    * the cached vector (no join), snapshotted into the next round's
    * plan as a literal; round r's probe materializes round r's cache,
    * at which point round r-1's is released (at most TWO rank vectors
    * cached, at any iters). The final vector is materialized through
    * one checkpointed action ([[Iterate.checkpointed]]), after which
    * every remaining internal cache (last vector, universe, edges) is
    * released and the returned relation has O(1) lineage. The per-round scalar
    * action is a MEASURED choice, not an oversight: the lazy
    * alternative (dsum as a 1-row crossJoin, the [[pageRankConverged]]
    * shape) A/B'd 20-30% SLOWER here — without per-round plan
    * truncation the doubled `cur` reference nests broadcast subtrees
    * and doubles plan size per round (PLANS.md "n136 dangling A/B").
    * Snapshotting is sound because inputs are immutable lake reads; a
    * mutating source needs the checkpointing converged variant.
    */
  def integerPageRank(edges: DataFrame, iters: Int,
                      symmetrized: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 8,
      "iters outside [1,8]: deeper power iterations need checkpointing " +
        "(see pageRankConverged) before the lineage is safe")
    val deg = edges.groupBy("src").agg(sum(col("wt")).as("wdeg"))
    val ed = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // `symmetrized = true` is the caller's declaration that every edge
    // was emitted in both directions (out-degree >= 1 by construction,
    // so node universe = src set and dangling mass = 0): the TextRank /
    // co-citation callers pass it and skip the universe probe — their
    // plans and costs are exactly the pre-dangling kernel's. Directed
    // callers pay one single-shuffle probe: src ∪ dst grouped by node
    // with a max(has_out) flag gives the universe AND the dangling set
    // in one cached relation.
    val univ =
      if (symmetrized) None
      else Some(ed.select(col("src").as("node"), lit(1).as("has_out"))
        .unionAll(ed.select(col("dst").as("node"), lit(0).as("has_out")))
        .groupBy("node").agg(max(col("has_out")).as("has_out"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // rolling two-vector cache of the dangling path, hoisted so the
    // failure handler below can release it: any job failure inside the
    // probes or the checkpoint must not leak persisted state (the r9
    // ADVICE item — the success path releases these deliberately late,
    // so a blanket finally would break the lazy dangling-free return).
    // A LIST, not an Option: the current round's vector is pushed
    // BEFORE its probe runs, so a probe failure still finds it here
    var prevCache: List[DataFrame] = Nil
    try {
    val hasDangling = univ.exists(_.filter(col("has_out") === 0)
      .limit(1).count() > 0)
    if (!hasDangling) {
      // dangling-free (symmetrized or probed): dst ⊆ src, so the node
      // universe is the src set and the plan stays fully lazy — the
      // probe relation (if any) was probe-only, release it.
      //
      // Per-round LAZY checkpoints (r14): the un-truncated chain's
      // round r referenced `nodes` twice and `ranks_{r-1}` once, so
      // the analyzed plan carried ~3·iters copies of the whole
      // edge-pipeline subtree (92-134 KB for the n76/n89 callers —
      // guide §7.2, plan size is a first-class cost). This is NOT the
      // restructure the r9 A/B rejected: that A/B measured the lazy
      // 1-row crossJoin(dsum) (plan-doubling) and eager per-round
      // checkpoints (extra job per round) on the DANGLING path; a
      // lazy checkpoint adds no job — the chain materializes inside
      // the caller's one action (the kCore/LPA treatment) — and the
      // result stays fully lazy as documented. `nodes` is checkpointed
      // once so the per-round self-references read round-sized blocks
      // instead of re-deriving the distinct per segment (checkpoint
      // boundaries end ReusedExchange sharing).
      univ.foreach(_.unpersist())
      val nodes = Iterate.lazyCheckpointed(
        ed.select(col("src").as("node")).distinct())
      val n = nodes.agg(count(lit(1)).as("n"))
      var ranks = nodes.crossJoin(n)
        .select(col("node"), expr(s"$Scale div n").as("rank"))
      for (_ <- 1 to iters) {
        val contrib = ed.join(ranks, ed("src") === ranks("node"))
          .select(col("dst"), expr("(rank * wt) div wdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("csum"))
        ranks = Iterate.lazyCheckpointed(
          nodes.join(contrib, nodes("node") === contrib("dst"), "left")
            .crossJoin(n)
            .select(nodes("node"),
              (expr(s"(15 * $Scale div 100) div n") +
                expr("(85 * coalesce(csum, 0)) div 100")).as("rank")))
      }
      ranks
    } else {
      val nodes = univ.get
      val n = nodes.agg(count(lit(1)).as("n"))
      // the has_out flag rides inside the rank vector, so each round's
      // dangling mass is a filter + scalar agg over the round's OWN
      // cache — never a join against a separate dangling relation
      var ranks = nodes.crossJoin(n)
        .select(col("node"), col("has_out"), expr(s"$Scale div n").as("rank"))
      // rolling release: round r's scalar probe fully materializes
      // round r's cache, after which round r-1's vector is dead — at
      // most two rank vectors are ever cached, not iters of them
      for (_ <- 1 to iters) {
        val cur = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prevCache = cur :: prevCache
        val dsumLit: Long = cur.filter(col("has_out") === 0)
          .agg(coalesce(sum(col("rank")), lit(0L))).head().getLong(0)
        prevCache.tail.foreach(_.unpersist())
        prevCache = List(cur)
        val contrib = ed.join(cur, ed("src") === cur("node"))
          .select(col("dst"), expr("(rank * wt) div wdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("csum"))
        // dangling nodes spread their whole rank uniformly (dsum div n
        // joins every node's inbound sum before damping); LEFT join
        // from the node list: a node with no inbound edges keeps its
        // teleport rank instead of vanishing from the result
        ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .crossJoin(n)
          .select(nodes("node"), nodes("has_out"),
            (expr(s"(15 * $Scale div 100) div n") +
              expr(s"(85 * (coalesce(csum, 0) + $dsumLit div n)) div 100")).as("rank"))
      }
      // one checkpointed action materializes the final vector (the
      // last round's cache was filled by its scalar probe), then the
      // remaining internal caches are released — the caller gets an
      // O(1)-lineage relation and no leaked persisted state (the r8
      // ADVICE item)
      val out = Iterate.checkpointed(ranks.select(col("node"), col("rank")))
      prevCache.foreach(_.unpersist())
      univ.foreach(_.unpersist())
      ed.unpersist()
      out
    }
    } catch { case t: Throwable =>
      // no leaked persisted state on ANY exit path: a mid-loop job
      // failure releases everything the success path would have
      prevCache.foreach(_.unpersist())
      univ.foreach(_.unpersist())
      ed.unpersist()
      throw t
    }
  }

  /** Fixed-round k-core peeling over an undirected graph given as a
    * directed pair relation: each round removes every node whose
    * CURRENT degree is below k, which can cascade (a removal drops a
    * neighbor below the bar next round). Peeling is confluent — the
    * removal order cannot change the fixpoint — so once a round
    * removes nothing the survivors ARE the k-core (Seidman 1983; the
    * spec asserts convergence on its graphs). Returns
    * (node, degree) of the survivors after `rounds` rounds with
    * degrees measured in the peeled subgraph.
    *
    * Rounds are join-filtered degree aggs over an edges-bounded
    * relation; `rounds <= 6` is the same lineage bound as the n76
    * power iteration — deeper peeling wants per-round checkpoints
    * (see Dedup.dupClusters) on a real cluster.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 6,
      "rounds outside [1,6]: deeper peeling needs checkpointing")
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    var cur = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    for (_ <- 1 to rounds) {
      // each round references `cur` three times (degree agg + both join
      // prunes), so an un-truncated plan grows 3^rounds references to
      // the edge build — ReusedExchange collapses the EXECUTION, but
      // analysis/codegen/task binaries still carry the exponential tree
      // (r13 profile: 10 MiB task binaries, wall 3.7x the task time,
      // all driver). A LAZY per-round checkpoint truncates the lineage
      // to a round-sized plan while adding no job — the chain
      // materializes inside the caller's one action, and the per-round
      // persisted blocks make each round's recompute O(1) (guide §7.2:
      // plan size is a first-class cost).
      val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      cur = graft.ops.Iterate.lazyCheckpointed(
        cur.join(keep, "src")
          .join(keep.withColumnRenamed("src", "dst"), "dst")
          .select(col("src"), col("dst")))
    }
    cur.groupBy("src").agg(count(lit(1)).as("degree"))
      .select(col("src").as("node"), col("degree"))
  }

  /** [[kCore]] run to the TRUE fixpoint — peel until a round removes
    * nothing — with an eager checkpoint per round ([[Iterate]]), so
    * the lineage stays O(1) at any peel depth: the production shape
    * for a real cluster, where the cascade depth is data-dependent
    * and a fixed `rounds` bound either wastes rounds or stops early.
    * Convergence witness: the peeled edge count, which strictly
    * decreases until the fixpoint (peeling only removes). Returns the
    * same (node, degree) relation as a converged [[kCore]] — the spec
    * proves equality beyond kCore's round bound.
    */
  def kCoreConverged(edges: DataFrame, k: Int, maxIter: Int = 1000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val init = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    val (core, _) = Iterate.toFixpoint(init, maxIter) { cur =>
      val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      cur.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select(col("src"), col("dst"))
    }(_.count())
    core.groupBy("src").agg(count(lit(1)).as("degree"))
      .select(col("src").as("node"), col("degree"))
  }

  /** [[integerPageRank]] run to convergence: iterate the same damped
    * integer update (dangling-mass term included) until the largest
    * per-node rank change is <= `tol` (in 1e-12 rank units) or
    * `maxIter` rounds pass, checkpointing each rank vector
    * ([[Iterate.checkpointed]]) so the lineage never grows — the
    * production variant of the fixed-`iters` kernel, whose [1,8]
    * bound exists only because unchecked lineage is driver-fatal.
    * The convergence test is one nodes-bounded self-join + agg per
    * round. Returns (node, rank).
    */
  def pageRankConverged(edges: DataFrame, tol: Long = 1000L,
                        maxIter: Int = 100): DataFrame = {
    require(tol >= 0L, "tol must be >= 0")
    require(maxIter >= 1, "maxIter must be >= 1")
    val deg = edges.groupBy("src").agg(sum(col("wt")).as("wdeg"))
    val ed = Iterate.checkpointed(edges.join(deg, "src"))
    val nodes = Iterate.checkpointed(
      ed.select(col("src").as("node"))
        .unionAll(ed.select(col("dst").as("node"))).distinct())
    val dangling = Iterate.checkpointed(
      nodes.join(ed.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti"))
    val n = nodes.agg(count(lit(1)).as("n"))
    var ranks = Iterate.checkpointed(nodes.crossJoin(n)
      .select(col("node"), expr(s"$Scale div n").as("rank")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("(rank * wt) div wdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("csum"))
      val dsum = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
      val next = Iterate.checkpointed(
        nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .crossJoin(n).crossJoin(dsum)
          .select(nodes("node"),
            (expr(s"(15 * $Scale div 100) div n") +
              expr("(85 * (coalesce(csum, 0) + dsum div n)) div 100")).as("rank")))
      val maxDelta = next.withColumnRenamed("rank", "r2")
        .join(ranks, "node")
        .agg(coalesce(max(abs(col("r2") - col("rank"))), lit(0L)))
        .head().getLong(0)
      ranks = next
      converged = maxDelta <= tol
      iter += 1
    }
    ranks
  }

  /** Seed-biased PageRank — TrustRank (Gyöngyi, Garcia-Molina &
    * Pedersen 2004) / topic-sensitive PageRank (Haveliwala 2002): the
    * teleport mass lands ONLY on a trusted `seeds` set instead of
    * uniformly, so authority flows outward from vetted nodes and decays
    * with link distance — the standard device for propagating domain
    * trust over a crawl graph (or topic affinity over a term graph)
    * when curating training data. Same 1e-12 integer fixed point and
    * damping 85/100 as [[integerPageRank]], so an oracle replays every
    * round bit-exactly: with d the uniform-on-seeds teleport vector,
    * r0 = d and each round computes
    * `rank' = is_seed * ((15*Scale div 100) div ns)
    *          + (85 * (csum + is_seed * (dsum div ns))) div 100`
    * — dangling mass follows the TELEPORT distribution (the TrustRank
    * convention), i.e. it re-enters at the seeds, not uniformly.
    *
    * `seeds` is a single-column `node` relation and is intersected
    * with the graph's node universe; `ns` is the count of seeds
    * actually present (must be >= 1 — validated by the one scalar
    * probe this operator always pays, which also snapshots `ns`;
    * sound for immutable lake reads, the [[integerPageRank]] snapshot
    * argument, and a seed list is tiny and vetted by definition).
    *
    * `symmetrized = true` is the same caller declaration as
    * [[integerPageRank]]'s (every edge emitted both ways, so dst ⊆ src
    * and no dangling nodes): the plan stays fully lazy with the
    * caller-owned `ed` cache. Directed callers get the src ∪ dst
    * universe probe; when dangling nodes exist each round pays the
    * same cached-vector dsum probe as [[integerPageRank]] (rolling
    * two-vector cache), and either way the directed path returns a
    * checkpointed O(1)-lineage relation with every internal cache
    * released. 100 TB shape: identical to [[integerPageRank]] — one
    * persisted edges-with-degrees relation, one edges-bounded
    * join-agg shuffle per round; the spec pins both branches and the
    * branch-equality law on a dangling-free graph.
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                symmetrized: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 8,
      "iters outside [1,8]: deeper power iterations need checkpointing " +
        "(see pageRankConverged) before the lineage is safe")
    val deg = edges.groupBy("src").agg(sum(col("wt")).as("wdeg"))
    val ed = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedIds = seeds.select(col("node")).distinct()
      .withColumn("is_seed", lit(1L))
    // hoisted so the failure handler can release them: the ns probe,
    // the require(ns >= 1), and every per-round scalar can throw with
    // ed/univ/prevCache persisted (the r9 ADVICE leak); prevCache is a
    // list so the current round's vector is tracked BEFORE its probe
    var univP: Option[DataFrame] = None
    var prevCache: List[DataFrame] = Nil
    try {
    if (symmetrized) {
      val nodes = ed.select(col("src").as("node")).distinct()
        .join(seedIds, Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      val nsLit: Long = nodes.agg(coalesce(sum(col("is_seed")), lit(0L)))
        .head().getLong(0)
      require(nsLit >= 1L, "no seed node present in the graph")
      var ranks = nodes
        .select(col("node"), col("is_seed"),
          expr(s"is_seed * ($Scale div $nsLit)").as("rank"))
      for (_ <- 1 to iters) {
        val contrib = ed.join(ranks, ed("src") === ranks("node"))
          .select(col("dst"), expr("(rank * wt) div wdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("csum"))
        ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
          .select(nodes("node"), nodes("is_seed"),
            (expr(s"is_seed * ((15 * $Scale div 100) div $nsLit)") +
              expr("(85 * coalesce(csum, 0)) div 100")).as("rank"))
      }
      ranks.select(col("node"), col("rank"))
    } else {
      val univ = ed.select(col("src").as("node"), lit(1).as("has_out"))
        .unionAll(ed.select(col("dst").as("node"), lit(0).as("has_out")))
        .groupBy("node").agg(max(col("has_out")).as("has_out"))
        .join(seedIds, Seq("node"), "left")
        .select(col("node"), col("has_out"),
          coalesce(col("is_seed"), lit(0L)).as("is_seed"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      univP = Some(univ)
      val probe = univ.agg(
        coalesce(sum(col("is_seed")), lit(0L)).as("ns"),
        coalesce(max(when(col("has_out") === 0, 1).otherwise(0)), lit(0)).as("dang"))
        .head()
      val nsLit: Long = probe.getLong(0)
      val hasDangling = probe.getInt(1) == 1
      require(nsLit >= 1L, "no seed node present in the graph")
      var ranks = univ
        .select(col("node"), col("has_out"), col("is_seed"),
          expr(s"is_seed * ($Scale div $nsLit)").as("rank"))
      for (_ <- 1 to iters) {
        val dsumLit: Long = if (!hasDangling) 0L else {
          val cur = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          prevCache = cur :: prevCache
          val d = cur.filter(col("has_out") === 0)
            .agg(coalesce(sum(col("rank")), lit(0L))).head().getLong(0)
          prevCache.tail.foreach(_.unpersist())
          prevCache = List(cur)
          d
        }
        val cur = prevCache.headOption.getOrElse(ranks)
        val contrib = ed.join(cur, ed("src") === cur("node"))
          .select(col("dst"), expr("(rank * wt) div wdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("csum"))
        ranks = univ.join(contrib, univ("node") === contrib("dst"), "left")
          .select(univ("node"), univ("has_out"), univ("is_seed"),
            (expr(s"is_seed * ((15 * $Scale div 100) div $nsLit)") +
              expr(s"(85 * (coalesce(csum, 0) + is_seed * ($dsumLit div $nsLit))) div 100"))
              .as("rank"))
      }
      val out = Iterate.checkpointed(ranks.select(col("node"), col("rank")))
      prevCache.foreach(_.unpersist())
      univ.unpersist()
      ed.unpersist()
      out
    }
    } catch { case t: Throwable =>
      prevCache.foreach(_.unpersist())
      univP.foreach(_.unpersist())
      ed.unpersist()
      throw t
    }
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over a weighted
    * directed edge relation `(src, dst, wt)` — the OTHER classic link
    * analysis: where PageRank models a random surfer, HITS splits
    * every node into a HUB score (how well it points at authorities)
    * and an AUTHORITY score (how well hubs point at it). The natural
    * fit in a data pipeline is the crawl outlink graph: pages that
    * link to many high-quality documents (hub = link directory /
    * index page) versus documents many good indexes point at
    * (authority = canonical source) — complementary quality signals
    * PageRank's single score conflates. Returns `(node, hub, auth)`.
    *
    * Integer fixed point, oracle-replayable: per Kleinberg's I/O
    * operations each round computes `araw(v) = Σ_{u→v} hub(u)·wt`
    * then normalizes `auth = araw·Scale div Σ araw`, then
    * `hraw(u) = Σ_{u→v} auth(v)·wt` from the NEW auth vector and
    * normalizes the same way. Normalization is L1 (sum), not
    * Kleinberg's L2: the ranking is invariant to the norm chosen and
    * L1 keeps every step in truncating integer arithmetic (each
    * vector re-sums to ~Scale, minus one unit of floor loss per
    * scored node). The `raw·Scale` product would overflow a long
    * (raw can approach Scale·totalWeight), so that one multiply runs
    * in DECIMAL(38,0) and the integral division lands back in a
    * long — the oracle does the same in HUGEINT and casts. `auth·wt`
    * and the raw sums must stay under 2^63: per-edge weights up to
    * ~9e6 at full scale — lower Scale beyond (the [[integerPageRank]]
    * convention).
    *
    * Evaluation semantics: EAGER AT CALL TIME — each round pays two
    * scalar normalization probes (asum, hsum), each doubling as the
    * cache fill of its RAW join-agg relation (the raw relation, not
    * the derived vector, is what persists: it is the round's dominant
    * edges-bounded cost and has two consumers — its probe and the next
    * half-round's join — while the vector is a cheap nodes-bounded
    * derivation; caching the vector instead re-ran every join-agg
    * twice, and the A/B normalized against the co-measured n142 put
    * the vector-cached shape ~30% slower — PLANS.md "n143 raw-cache
    * A/B"). Rolling release keeps at
    * most one round's raw pair cached. This is the [[integerPageRank]]
    * dangling-path shape, chosen on its MEASURED A/B: the lazy 1-row
    * crossJoin alternative doubles the analyzed plan every half-round
    * (PLANS.md "n136 dangling A/B") and HITS has TWO such scalars per
    * round. The result is checkpointed ([[Iterate.checkpointed]]) and
    * every internal cache released — O(1) lineage, no leaked persisted
    * state. 100 TB shape: edges persisted once; each half-round is one
    * edges-bounded join-agg shuffle plus a nodes-bounded scalar agg.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      "iters outside [1,8]: deeper power iterations need per-round " +
        "checkpointing before the lineage is safe")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ed = edges.persist(lvl)
    val nodes = ed.select(col("src").as("node"))
      .unionAll(ed.select(col("dst").as("node")))
      .distinct().persist(lvl)
    // raw-pair rolling cache hoisted above the try so the failure
    // handler can release it: the mass-vanished requires and every
    // normalization probe can throw mid-loop with ed/nodes/the raw
    // pair persisted (the r9 ADVICE leak)
    var prevRound: List[DataFrame] = Nil
    try {
    val n: Long = nodes.count()
    require(n >= 1, "edges relation is empty")
    var hubs = nodes.select(col("node"), lit(Scale / n).as("hub"))
    var auths: DataFrame = hubs.select(col("node"), lit(0L).as("auth"))
    // the RAW join-agg relations are what gets cached, not the derived
    // vectors: each half-round's edges-bounded join-agg is the dominant
    // cost and has TWO consumers (its normalization probe and the next
    // half-round's join) — caching the vector instead would recompute
    // the join-agg once per consumer (measured ~2x the round price).
    // The scalar probe doubles as the cache fill (the n136 shape);
    // rolling release keeps at most the two live raw relations.
    // liveness: round r's araw probe is the LAST evaluation that reads
    // round r-1's lineage (hubs_{r-1} = f(hraw_{r-1}), and araw_{r-1}
    // only feeds the auths that round r reassigns), so both prior raw
    // caches release right after it; round r's own pair must survive
    // the loop when r == iters (the final checkpoint re-evaluates
    // auths = f(araw) and hubs = f(hraw))
    for (_ <- 1 to iters) {
      val araw = ed.join(hubs, ed("src") === hubs("node"))
        .select(col("dst"), expr("hub * wt").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("araw"))
        .persist(lvl)
      prevRound = araw :: prevRound
      val asum: Long = araw.agg(coalesce(sum(col("araw")), lit(0L)))
        .head().getLong(0)
      require(asum > 0, "hub mass vanished: graph has no followable edge")
      // rolling release: the current round's araw is fully probed, so
      // the previous round's raw pair (everything in the list but the
      // head) is dead
      prevRound.tail.foreach(_.unpersist())
      prevRound = List(prevRound.head)
      auths = nodes.join(araw, nodes("node") === araw("dst"), "left")
        .select(nodes("node"),
          expr(s"(CAST(coalesce(araw, 0) AS DECIMAL(38,0)) * $Scale) div $asum")
            .as("auth"))
      val hraw = ed.join(auths, ed("dst") === auths("node"))
        .select(col("src"), expr("auth * wt").as("c"))
        .groupBy("src").agg(sum(col("c")).as("hraw"))
        .persist(lvl)
      prevRound = hraw :: prevRound
      val hsum: Long = hraw.agg(coalesce(sum(col("hraw")), lit(0L)))
        .head().getLong(0)
      require(hsum > 0, "authority mass vanished: graph has no followable edge")
      hubs = nodes.join(hraw, nodes("node") === hraw("src"), "left")
        .select(nodes("node"),
          expr(s"(CAST(coalesce(hraw, 0) AS DECIMAL(38,0)) * $Scale) div $hsum")
            .as("hub"))
    }
    val out = Iterate.checkpointed(
      hubs.join(auths.withColumnsRenamed(Map("node" -> "anode")),
          hubs("node") === col("anode"))
        .select(col("node"), col("hub"), col("auth")))
    prevRound.foreach(_.unpersist())
    nodes.unpersist()
    ed.unpersist()
    out
    } catch { case t: Throwable =>
      // no leaked persisted state on ANY exit path: prevRound tracks
      // every currently-persisted raw relation (the current round's
      // entries are pushed BEFORE their probes run), so a mid-loop
      // failure releases exactly what is live
      prevRound.foreach(_.unpersist())
      nodes.unpersist()
      ed.unpersist()
      throw t
    }
  }

  /** Synchronous label-propagation community detection (Raghavan et
    * al. 2007) over an undirected graph given as a directed pair
    * relation (self-loops / duplicate / reverse pairs normalized
    * away). Every node starts labeled with itself; each round every
    * node adopts the most frequent label among its neighbors' CURRENT
    * labels PLUS its own (the self-vote variant — without it sync LPA
    * two-cycles on bipartite/star structure; with it, ties break to
    * the SMALLEST label and propagation is stable), deterministically
    * replayable where vanilla random-tie LPA is not. Fixed `rounds`
    * is still the contract (the n107 kCore fixed-round convention).
    * Returns (node, label).
    *
    * Each round is one edges-bounded join-agg plus a per-node argmax
    * under WindowGroupLimit — never a neighborhood collection; the
    * symmetrized edge relation is the round's only corpus-scale input,
    * built once by the caller's lineage. `rounds <= 6` is the same
    * lineage bound as [[kCore]].
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      "rounds outside [1,6]: deeper propagation needs checkpointing")
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cnt").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      // each round references `labels` twice (neighbor join + self-vote
      // union), so an un-truncated plan carries ~2^rounds references to
      // the symmetrized edge build — the kCore disease in miniature,
      // bounded only by rounds <= 6. A LAZY per-round checkpoint
      // truncates the lineage to a round-sized plan while adding no
      // job: the chain materializes inside the caller's one action
      // (guide §7.2 — plan size is a first-class cost).
      val votes = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src"), col("label"))
        .unionAll(labels.select(col("node").as("src"), col("label")))
      labels = graft.ops.Iterate.lazyCheckpointed(votes
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("label")))
    }
    labels
  }

  /** Per-node triangle counts over an undirected graph given as a
    * directed pair relation `(src, dst)` (self-loops and duplicate /
    * reverse pairs are normalized away). Returns `(node, n_triangles)`
    * for every node in at least one triangle.
    *
    * Uses the degree-orientation trick (Schank & Wagner 2005; the
    * MapReduce form is Suri & Vassilvitskii 2011): orient every edge
    * toward its higher-(degree, id) endpoint, build wedges only at
    * each edge's LOW end, and close them against the oriented edge
    * set. Every triangle is found exactly once, and the wedge
    * relation — the only super-linear intermediate — is bounded by
    * sum(min-degree over edges) = O(m^1.5) instead of the
    * sum-of-degrees-squared a naive neighbor self-join pays (one
    * celebrity node would make that quadratic). Three shuffles total:
    * degree agg, wedge self-join, closing join; nothing is ever
    * keyed by a high-degree node's full neighborhood.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val low = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // o: (a, b, bd) with a ≺ b in (degree, id) order; bd = deg(b) rides
    // along so the wedge self-join needs no extra degree lookup
    val o = withDeg.select(
      when(low, col("u")).otherwise(col("v")).as("a"),
      when(low, col("v")).otherwise(col("u")).as("b"),
      when(low, col("dv")).otherwise(col("du")).as("bd"))
    val e2 = o.select(col("a"), col("b").as("c"), col("bd").as("cd"))
    val wedges = o.join(e2, "a")
      .filter(struct(col("bd"), col("b")) < struct(col("cd"), col("c")))
      .select(col("a"), col("b"), col("c"))
    val tris = wedges.join(o.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
