package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph sampling over the edge relation — the operator family behind
  * DeepWalk/node2vec-style embedding training data. The reference carried
  * a (commented-out) `randomWalk` vestige
  * (`core/src/main/scala/com/graphula/Graphula.scala:509-658`); this is
  * the working Spark-first version.
  *
  * Scale shape: the ranked adjacency (per-source neighbor ranks + degree)
  * is built ONCE (one window pass) and each walk step is one equi-join of
  * the walker frontier against it — `steps` joins total, no driver-side
  * row movement, walker count = |starts| × walksPerStart regardless of
  * graph size.
  */
object GraphOps {

  /** Round count of the most recent connectedComponents convergence —
    * scale-evidence telemetry (tools.ScaleProbe records it at two SFs to
    * confirm the O(log d) round count stays flat under 10× data).
    */
  private[graft] val lastCcRounds = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fixed-iteration PageRank over a ranked adjacency (use an UNDIRECTED
    * adjacency and every node has out-degree ≥ 1, so no dangling-mass
    * term is needed). Per iteration: one join (ranks → edges) and one
    * aggregate (contributions → targets); contributions accumulate in
    * integer PICO units (`floor(r/deg · 1e12 + 0.5)` as long — the
    * engine-neutral half-up discipline, since BigDecimal HALF_UP and a
    * float-multiply `round()` diverge on decimal half-boundaries), so
    * the sum is order-independent and the whole recursion replays
    * bit-identically in a SQL oracle — the engine-portable determinism
    * discipline used across this codebase (centroids, surprisal, walks).
    *
    * Scale shape: ranks are a (node, double) relation re-pinned per
    * iteration; edges are scanned once per iteration with the rank join
    * shuffling on the source key. Iterations are explicit (fixed-point
    * analytics), not convergence-driven — the common production setup.
    */
  def pageRank(rankedAdj: DataFrame, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val pins = new graft.Pins
    val adj =
      if (graft.Pins.isMaterialized(rankedAdj)) rankedAdj else pins.pin(rankedAdj)
    val nodes = pins.pin(adj.select(col("s").as("node")).distinct())
    val n = nodes.count()
    val base = (1.0 - damping) / n
    var rank = pins.pin(nodes.withColumn("r", lit(1.0 / n)))
    for (_ <- 1 to iterations) {
      // one join + one aggregate per round, nothing else: on an
      // UNDIRECTED degree>=1 adjacency every node also RECEIVES at least
      // one contribution, so the aggregate's key set is already the full
      // node set and no per-round nodes re-join is needed
      val contrib = adj.join(rank, adj("s") === rank("node"))
        .select(col("o"),
          floor((col("r") / col("deg")) * 1e12 + 0.5).cast("long").as("c"))
      rank = pins.pin(contrib.groupBy(col("o")).agg(sum(col("c")).as("csum"))
        .select(col("o").as("node"),
          (lit(base) + lit(damping) *
            (col("csum").cast("double") / 1e12)).as("r")))
    }
    pins.seal(rank.select(col("node"),
      (floor(col("r") * 1e9 + 0.5) / 1e9).as("rank")))
  }

  /** Fixed-iteration MIN-LABEL propagation: after `iterations` rounds
    * every node's label is the smallest node id within graph distance
    * `iterations` — the bounded-round connected-components/blocking
    * primitive (duplicate blocks, community seeds). Pure order
    * comparisons — no floats — so a SQL oracle replays it exactly on any
    * term type. One join + one min-aggregate per round over the pinned
    * adjacency; labels re-pin per round and seal at the end.
    */
  def minLabelPropagation(rankedAdj: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val pins = new graft.Pins
    val adj =
      if (graft.Pins.isMaterialized(rankedAdj)) rankedAdj else pins.pin(rankedAdj)
    var labels = pins.pin(
      adj.select(col("s").as("node")).distinct()
        .withColumn("lab", col("node")))
    for (_ <- 1 to iterations) {
      val fromNeighbors = adj.join(labels, adj("s") === labels("node"))
        .select(adj("o").as("node"), col("lab"))
      labels = pins.pin(
        fromNeighbors.unionAll(labels)
          .groupBy("node").agg(min(col("lab")).as("lab")))
    }
    pins.seal(labels)
  }

  /** Deterministic seeded uniform random walks: `walksPerStart` walks of
    * up to `steps` steps from every start node. The step choice is a
    * CONTENT HASH — `md5(seed|start|walk|step|node)` taken modulo the
    * node's out-degree against the per-neighbor rank — so results are
    * reproducible across engines (DuckDB replays the identical recursion
    * with its own md5; no engine-private PRNG). Walks truncate at
    * dead-end nodes (no outgoing edges).
    *
    * Output: one row per visited position — (start, w, step, node),
    * step 0 = the start node itself.
    */
  /** Ranked adjacency of an edge relation: per-source neighbor ranks and
    * out-degrees — the walk engine's index, built with one window pass.
    * An ingest-time artifact at pipeline scale (every walk batch over the
    * same graph reuses it; see `GraftStore.rankedAdjacency`).
    */
  def rankedAdjacency(edges: DataFrame): DataFrame =
    edges.select(col("s"), col("o")).distinct()
      .withColumn("rk", row_number().over(Window.partitionBy("s").orderBy("o")))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("s")))

  /** Dense ORDER-PRESERVING node ranks: (node, rk) with rk ascending in
    * node order, so `min(rk)` picks the same representative as
    * `min(node)` — the label-prop/connected-components iteration can run
    * on fixed-width longs and decode once at the top, like the SPARQL
    * encoded path. Assignment is the scalable sort + per-partition-index
    * shape (range-partitioned global sort, then zipWithIndex's single
    * count pass for partition offsets) — no single-partition window.
    */
  def orderRanks(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val c = nodes.columns.head
    val sorted = nodes.select(col(c).as("node")).distinct().orderBy("node")
    // generic over the node type (string terms OR encoded long ids —
    // the doc'd iteration currency), so read Any, not getString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      sorted.schema.fields.head.copy(name = "node"),
      org.apache.spark.sql.types.StructField(
        "rk", org.apache.spark.sql.types.LongType, nullable = false)))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i)
    }
    spark.createDataFrame(rdd, schema)
  }

  def randomWalks(edges: DataFrame, starts: DataFrame, steps: Int,
                  walksPerStart: Int = 1, seed: String = "42"): DataFrame =
    randomWalksRanked(rankedAdjacency(edges), starts, steps, walksPerStart, seed)

  /** Walks over a prebuilt (and ideally pinned) ranked adjacency. */
  def randomWalksRanked(rankedAdj: DataFrame, starts: DataFrame, steps: Int,
                        walksPerStart: Int = 1, seed: String = "42"): DataFrame = {
    require(steps >= 0 && walksPerStart >= 1, "need steps >= 0, walks >= 1")
    val pins = new graft.Pins
    // a cached/checkpointed adjacency is used as-is; a lazy one is pinned
    // for the loop and freed at seal
    val ranked =
      if (graft.Pins.isMaterialized(rankedAdj)) rankedAdj else pins.pin(rankedAdj)
    // each step's frontier is pinned: tiny (|starts| × walksPerStart rows),
    // and without it union branch k would recompute every prior join —
    // `steps` scans of the adjacency instead of O(steps²)
    var walkers = pins.pin(
      starts.select(col(starts.columns.head).as("start")).distinct()
        .select(col("start"),
          explode(sequence(lit(0L), lit(walksPerStart - 1L))).as("w"))
        .select(col("start"), col("w"), lit(0L).as("step"),
          col("start").as("node")))
    var out = walkers
    for (k <- 1 to steps) {
      val choice: Column =
        conv(substring(md5(concat_ws("|",
          lit(seed), col("start"), col("w").cast("string"),
          lit(k.toString), col("node"))), 1, 8), 16, 10).cast("long")
      walkers = pins.pin(walkers.join(ranked, col("node") === col("s"))
        .where(col("rk") === pmod(choice, col("deg")) + 1)
        .select(col("start"), col("w"), lit(k.toLong).as("step"),
          col("o").as("node")))
      out = out.unionAll(walkers)
    }
    pins.seal(out)
  }

  /** Exact per-node triangle counts via the degree-ordered wedge join
    * ("compact-forward"): every undirected edge is directed from its
    * lower-(degree, id) endpoint to the higher one, wedges form only at
    * each edge's LOW endpoint, and a wedge closes by one equi-join
    * against the canonical edge set. Wedge fan-out per node is bounded
    * by O(√|E|) regardless of degree skew — the hub that breaks the
    * naive neighbor self-join (a 10⁶-degree node would contribute 10¹²
    * wedges) contributes none here, because hubs sort HIGH in the
    * ordering and high endpoints never originate wedges. Three shuffles
    * total (degree agg, wedge join, closing join); no iteration.
    *
    * Input: any (s, o) edge relation — direction, duplicates, and
    * self-loops are ignored. Output: (node, tri) for every node with at
    * least one edge, tri = number of distinct triangles through it.
    * Pure order comparisons and integer counts, so a SQL oracle replays
    * it exactly on either strings or encoded longs.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val pins = new graft.Pins
    // canonical undirected edge set (a < b), the relation every later
    // stage joins against — pinned once
    val cano = pins.pin(
      edges.select(least(col("s"), col("o")).as("a"),
          greatest(col("s"), col("o")).as("b"))
        .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
        .distinct())
    val deg = cano.select(col("a").as("node"))
      .unionAll(cano.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = cano
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), Seq("b"))
    val aIsLow = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    val directed = pins.pin(withDeg.select(
      when(aIsLow, col("a")).otherwise(col("b")).as("lo"),
      when(aIsLow, col("b")).otherwise(col("a")).as("hi")))
    // wedges at the low endpoint; v1 < v2 picks each unordered pair once
    val wedges = directed.select(col("lo"), col("hi").as("v1"))
      .join(directed.select(col("lo"), col("hi").as("v2")), Seq("lo"))
      .where(col("v1") < col("v2"))
    // a wedge (lo; v1 < v2) closes iff {v1, v2} is a canonical edge
    val tri = wedges.join(cano,
      wedges("v1") === cano("a") && wedges("v2") === cano("b"))
      .select(col("lo"), col("v1"), col("v2"))
    val perNode = tri
      .select(explode(array(col("lo"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    pins.seal(deg.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri"), lit(0L)).as("tri")))
  }

  /** Connected components to CONVERGENCE: every node gets the smallest
    * node id in its component. `minLabelPropagation` bounds the radius
    * (labels travel `iterations` hops); this runs until a fixpoint, so it
    * is correct on ANY diameter — the requirement when the component
    * structure is unknown (corpus-scale dedup graphs, entity resolution),
    * where GraphX Pregel on a driver-coalesced edge list (the tiny-pair-
    * graph shape of [[graft.ops.DedupOps.clusters]]) stops being an
    * option.
    *
    * Each round is min-label relaxation PLUS pointer jumping
    * (`lab ← lab(lab)`, the Shiloach-Vishkin shortcut): labels hop to
    * their label's label, so label trees halve in depth every round and
    * convergence is O(log diameter) rounds instead of O(diameter) — on a
    * 1000-hop chain ~10 rounds, not 1000. Per round: one adjacency join +
    * one min-aggregate (relaxation), one self-join (jump), one bounded
    * change probe. Labels are (node, lab) pairs — fixed-width when the
    * caller iterates on ranks (see [[orderRanks]]) — and every
    * intermediate is Pins-checkpointed, so lineage stays flat across
    * rounds. Pure order comparisons: a SQL oracle replays the fixpoint as
    * reachability-min (component id = min reachable node), independent of
    * round structure.
    *
    * Input: any (s, o) edge relation — direction, duplicates and
    * self-loops are ignored; nodes with no edge are absent (union
    * singletons at the call site if needed). Output: (node, component).
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    // LONG node ids — the documented production currency (encoded ids /
    // orderRanks) — take the RDD-core loop: zero Catalyst planning per
    // round and a partitioner shared across rounds, so the adjacency
    // never reshuffles after its initial placement. String graphs keep
    // the DataFrame loop below.
    val longTyped = edges.schema.fields.take(2).forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped) return connectedComponentsLong(edges, maxRounds)
    connectedComponentsDF(edges, maxRounds)
  }

  /** The fixpoint of [[connectedComponents]] with the ROUNDS run at the
    * RDD layer: each round of a Catalyst loop re-analyzes and re-plans
    * the relax/jump shapes from scratch (~0.2-0.5 s/round of driver time
    * that is SCALE-INDEPENDENT — at 100 TB it is pure waste), while an
    * RDD loop compiles its closures once. The partitioner discipline is
    * the real scale win: adjacency and labels share one HashPartitioner,
    * so the relax join is NARROW every round — the |E| adjacency is
    * shuffled exactly once at setup, and each round moves only the
    * (neighbor, label) messages. Same algorithm as the DataFrame loop
    * (first relaxation folded into init, min-label relax, pointer jump,
    * converged when no label changed), identical output.
    */
  private def connectedComponentsLong(edges: DataFrame,
                                      maxRounds: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val c0 = edges.columns(0); val c1 = edges.columns(1)
    val base = edges.select(col(c0).as("s"), col(c1).as("o"))
      .where(col("s").isNotNull && col("o").isNotNull && col("s") =!= col("o"))
    // Partition-count knob (spark.graft.cc.partitions): measured at
    // sf0.1 the default (=shuffle partitions) vs 8 differs by <5% —
    // the fixpoint cost is per-round JOB latency, not per-task
    // overhead — so the default stands; the knob exists for clusters
    // where the pair graph is far smaller than the parallelism.
    val part = new HashPartitioner(
      spark.conf.get("spark.graft.cc.partitions",
        spark.sessionState.conf.numShufflePartitions.toString).toInt)
    // symmetrize, place by source, dedup WITHIN partitions (an exact
    // distinct would shuffle by the pair and then again by the key;
    // duplicates cannot change a min, only message volume)
    val und = base.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (s, o) => Iterator((s, o), (o, s)) }
      .partitionBy(part)
      .mapPartitions({ it =>
        val seen = new java.util.HashSet[(Long, Long)]()
        it.filter(seen.add)
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val toRelease = scala.collection.mutable.ListBuffer(und)
    // init with the first relaxation folded in: lab0(v) = min(v, nbrs)
    // — reduceByKey over the co-partitioned adjacency is map-side only
    var labels = und
      .mapPartitions({ it =>
        it.map { case (s, o) => (s, math.min(s, o)) }
      }, preservesPartitioning = true)
      .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      .persist(StorageLevel.MEMORY_AND_DISK)
    toRelease += labels
    var round = 0
    var done = false
    while (!done) {
      round += 1
      require(round <= maxRounds,
        s"connectedComponents did not converge in $maxRounds rounds")
      // relax: narrow join (shared partitioner), then ONE shuffle of the
      // (neighbor, label) messages + the self leg back onto `part`
      val msgs = und.join(labels)
        .map { case (_, (nbr, lab)) => (nbr, lab) }
      val relax = msgs.union(labels)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        .persist(StorageLevel.MEMORY_AND_DISK)
      toRelease += relax
      // convergence probe doubles as the materializing action (persist
      // caches computed partitions; any remainder fills in from shuffle
      // files on the next action): relax and labels are co-partitioned,
      // so the old-vs-new join is narrow, and isEmpty short-circuits on
      // the first changed label
      val changed = !relax.join(labels)
        .filter { case (_, (nl, ol)) => nl != ol }.isEmpty()
      if (!changed) {
        labels = relax
        done = true
      } else if (round == 1) {
        // skip the jump while label trees are still depth<=2 (the common
        // shallow-graph case converges in 2-3 relaxes and never needs
        // one); from round 2 on the Shiloach-Vishkin halving kicks in,
        // keeping O(log d) rounds on deep graphs at the cost of one
        // extra round overall
        labels = relax
      } else {
        // jump: lab(v) <- lab(lab(v)) — Shiloach-Vishkin label-tree
        // halving; labels are node ids, so the inner join always hits
        val jumped = relax.map { case (v, l) => (l, v) }
          .join(relax, part)
          .map { case (_, (v, l2)) => (v, l2) }
          .partitionBy(part)
          .persist(StorageLevel.MEMORY_AND_DISK)
        toRelease += jumped
        jumped.count()
        labels = jumped
      }
    }
    lastCcRounds.set(round)
    // seal: the result frame owns its blocks (Pins discipline), every
    // loop intermediate is released immediately
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = graft.Pins.checkpoint(spark.createDataFrame(
      labels.map { case (v, l) => org.apache.spark.sql.Row(v, l) }, schema))
    toRelease.foreach(_.unpersist(blocking = false))
    out
  }

  private def connectedComponentsDF(edges: DataFrame, maxRounds: Int): DataFrame = {
    val pins = new graft.Pins
    val base = edges.select(col("s"), col("o"))
      .where(col("s").isNotNull && col("o").isNotNull && col("s") =!= col("o"))
    val und = pins.pin(
      base.unionAll(base.select(col("o").as("s"), col("s").as("o"))).distinct())
    // seed labels with the FIRST relaxation folded in: lab₀(v) =
    // min(v, neighbors of v) comes straight off the adjacency with one
    // aggregate — same cost as the plain distinct-nodes init, one full
    // relax round (join + aggregate) cheaper overall
    var labels = pins.pin(
      und.select(col("s").as("node"), col("o").as("lab"))
        .unionAll(und.select(col("s").as("node"), col("s").as("lab")))
        .groupBy("node").agg(min(col("lab")).as("lab")))
    var round = 0
    var done = false
    while (!done) {
      round += 1
      require(round <= maxRounds,
        s"connectedComponents did not converge in $maxRounds rounds")
      // relax: lab'(v) = min(lab(v), min over neighbors u of lab(u)).
      // The self leg carries the node's PREVIOUS label through the same
      // aggregate (min ignores the neighbor leg's nulls), so convergence
      // is read off the pinned relax result with a filter — no separate
      // old-vs-new probe join per round.
      val relaxed = pins.pin(
        und.join(labels, und("s") === labels("node"))
          .select(und("o").as("node"), col("lab"),
            when(lit(false), col("lab")).as("labOld"))
          .unionAll(labels.select(col("node"), col("lab"),
            col("lab").as("labOld")))
          .groupBy("node")
          .agg(min(col("lab")).as("lab"), min(col("labOld")).as("labOld")))
      if (relaxed.where(col("lab") =!= col("labOld")).isEmpty) {
        // relax fixpoint: labels are constant per component already —
        // skip the final round's (now idempotent) jump
        labels = relaxed.select(col("node"), col("lab"))
        done = true
      } else {
        // jump: lab''(v) = lab'(lab'(v)) — the Shiloach-Vishkin shortcut;
        // labels are node ids, so the inner join always hits
        val r = relaxed.select(col("node"), col("lab"))
        labels = pins.pin(
          r.join(r.select(col("node").as("lab"), col("lab").as("lab2")),
              Seq("lab"))
            .select(col("node"), col("lab2").as("lab")))
      }
    }
    lastCcRounds.set(round)
    pins.seal(labels.select(col("node"), col("lab").as("component")))
  }

  /** Minimum hop distance from a seed set, bounded at `rounds` hops —
    * the DELTA-FRONTIER BFS: each round expands only the nodes first
    * discovered in the previous round (one equi-join of the frontier
    * against the pinned adjacency + one anti-join against the settled
    * set), so total work is O(Σ|frontier_k| · d̄) — edges incident to
    * settled nodes are never rescanned, unlike the min-aggregate
    * relaxation (label-prop shape) which re-expands the whole reached
    * set every round. Frontiers shrink to empty on exhausted components
    * and the loop exits early (one bounded count per round).
    *
    * Output: (node, dist) for every node within `rounds` hops of any
    * seed; unreachable nodes are absent. Deterministic — BFS layers are
    * set-valued, no tie-breaking — so a SQL oracle replays it exactly.
    */
  def bfsDistances(rankedAdj: DataFrame, sources: DataFrame,
                   rounds: Int): DataFrame = {
    require(rounds >= 0, "need rounds >= 0")
    val pins = new graft.Pins
    val adj =
      if (graft.Pins.isMaterialized(rankedAdj)) rankedAdj else pins.pin(rankedAdj)
    var dist = pins.pin(
      sources.select(col(sources.columns.head).as("node")).distinct()
        .withColumn("dist", lit(0L)))
    var frontier = dist.select(col("node"))
    var k = 1
    var exhausted = false
    while (k <= rounds && !exhausted) {
      val discovered = pins.pin(
        adj.join(frontier, adj("s") === frontier("node"))
          .select(adj("o").as("node")).distinct()
          .join(dist.select(col("node")), Seq("node"), "left_anti")
          .withColumn("dist", lit(k.toLong)))
      if (discovered.isEmpty) exhausted = true
      else {
        dist = pins.pin(dist.unionAll(discovered))
        frontier = discovered.select(col("node"))
      }
      k += 1
    }
    pins.seal(dist)
  }

  /** Round count of the most recent [[shortestPaths]] call (relaxation
    * rounds actually executed) and whether its frontier DRAINED before
    * the `rounds` bound: an undrained frontier leaves OVERESTIMATED —
    * not just missing — distances for nodes whose cheapest route has
    * more hops than `rounds`, so callers who can't bound path depth
    * must check [[lastShortestPathsDrained]] after the call. */
  private[graft] val lastShortestPathsRounds =
    new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val lastShortestPathsDrained =
    new java.util.concurrent.atomic.AtomicBoolean(true)

  /** Weighted single-source(-set) shortest paths — the weighted
    * sibling of [[bfsDistances]]: non-negative edge weights (ENFORCED
    * loudly — a negative weight breaks frontier relaxation silently),
    * frontier relaxation (each round extends only the nodes whose
    * distance just improved, so settled regions never re-join), exact
    * on any DAG or graph once the frontier drains (Bellman-Ford
    * convergence; rounds track the HOP COUNT of the weighted-shortest
    * paths, so bound `rounds` by the expected path depth like the BFS
    * contract). If the bound hits before the frontier drains, PRESENT
    * rows may carry overestimates — check
    * [[lastShortestPathsDrained]]. `edges` = (src, dst, weight) with
    * any numeric weight (computed in double, so fractional weights are
    * exact, not truncated); `sources` = one node column, all at
    * distance 0. Returns (node, dist: double) for every reached
    * node — the same deterministic set-valued shape as BFS, so a SQL
    * oracle replays it.
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame,
                    rounds: Int): DataFrame = {
    require(rounds >= 0, "need rounds >= 0")
    val Seq(ca, cb, cw) = edges.columns.take(3).toSeq
    val pins = new graft.Pins
    val e = pins.pin(edges.select(col(ca).as("a"), col(cb).as("b"),
      col(cw).cast("double").as("w")))
    // one one-row aggregate job over the pinned edges: the
    // non-negativity contract is load-bearing (frontier relaxation
    // assumes settled regions never improve), so violate it loudly
    val minW = e.agg(min(col("w"))).collect()(0)
    require(minW.isNullAt(0) || minW.getDouble(0) >= 0.0,
      "shortestPaths requires non-negative edge weights (found " +
        (if (minW.isNullAt(0)) "null" else minW.getDouble(0).toString) +
        ")")
    var dist = pins.pin(
      sources.select(col(sources.columns.head).as("node")).distinct()
        .withColumn("dist", lit(0.0)))
    var frontier = dist
    var k = 1
    var drained = false
    while (k <= rounds && !drained) {
      val cand = e.join(frontier, e("a") === frontier("node"))
        .select(e("b").as("node"), (col("dist") + col("w")).as("cd"))
        .groupBy("node").agg(min(col("cd")).as("cd"))
      // improved = strictly better than (or absent from) the settled set
      val improved = pins.pin(
        cand.join(dist.toDF("node", "old"), Seq("node"), "left")
          .where(col("old").isNull || col("cd") < col("old"))
          .select(col("node"), col("cd").as("dist")))
      if (improved.isEmpty) drained = true
      else {
        dist = pins.pin(
          dist.join(improved.select(col("node")), Seq("node"), "left_anti")
            .unionAll(improved))
        frontier = improved
      }
      k += 1
    }
    lastShortestPathsRounds.set(k - 1L)
    lastShortestPathsDrained.set(drained)
    pins.seal(dist)
  }

  /** Round count of the most recent [[stronglyConnectedComponents]]
    * call (total min-label propagation rounds across all peeling
    * passes) — scale-evidence telemetry: rounds track SCC diameters
    * plus min-anchored DAG layering, not row count. */
  private[graft] val lastSccRounds =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Largest edge-relation size the most recent
    * [[stronglyConnectedComponents]] call worked with (input edges or
    * any ACCEPTED reach-doubled composition) — scale-evidence
    * telemetry for the composed-edge growth bound. */
  private[graft] val lastSccEdges =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** How many times the most recent [[stronglyConnectedComponents]]
    * call REJECTED a reach-doubling because the composed set exceeded
    * the edge budget (each rejection degrades that peeling pass to
    * plain rounds, loudly). */
  private[graft] val lastSccEdgeBudgetTrips =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Strongly connected components of a DIRECTED edge relation — the
    * directed sibling of [[connectedComponents]], completing the graph
    * family (PageRank, label propagation, walks, triangles, BFS, CC).
    * Each vertex maps to its component's MINIMUM vertex id.
    *
    * DataFrame-native min-label forward/backward INTERSECTION PEELING
    * (the FW-BW family): per pass, every vertex propagates the minimum
    * label it can reach FORWARD and the minimum that reaches it
    * BACKWARD (two keyed-join fixpoints whose convergence is a
    * one-row label-sum aggregate — labels only decrease, so an
    * unchanged sum IS the fixpoint, no row-diff job); a vertex with
    * `minFwd == minBwd == m` both reaches m and is reached by m, so it
    * belongs to SCC(m) — and the global-minimum vertex's whole SCC is
    * always determined, so each pass peels at least one min-anchored
    * layer off the condensation DAG and the loop terminates.
    * Determined vertices drop, and so does every CROSS-CLASS edge: two
    * vertices of one SCC share their whole (minFwd, minBwd) label
    * PAIR, so the undetermined remainder partitions by pair and only
    * intra-class edges can be intra-SCC — a k-layer chain-of-SCCs
    * condensation splits into its k independent classes after ONE pass
    * and finishes on the next, instead of peeling k min-anchored
    * layers. Deep propagation inside a pass adaptively DOUBLES the
    * remainder's reach (every 8 rounds the edge set unions its own
    * composition — reachability, and therefore every label and SCC,
    * is unchanged while label travel distance doubles), so rounds
    * track log(diameter) on adversarially deep graphs. The composed
    * set can grow toward the remainder's transitive closure on dense
    * deep graphs, so every doubling is BUDGETED: the candidate is
    * counted and accepted only while it stays within
    * `spark.graft.graph.sccEdgeBudgetFactor` (default 8) times the
    * input edge count — past that the pass degrades LOUDLY to plain
    * rounds (stderr + [[lastSccEdgeBudgetTrips]], sizes in
    * [[lastSccEdges]]), still exact and still bounded by `maxRounds`.
    * Shuffle-shaped like [[connectedComponents]] (keyed equi-joins,
    * nothing driver-side), so it scales with the edge relation up to
    * the budget; `maxRounds` bounds the total loudly.
    */
  def stronglyConnectedComponents(spark: org.apache.spark.sql.SparkSession,
                                  edges: DataFrame,
                                  maxRounds: Int = 256): DataFrame = {
    val Seq(ca, cb) = edges.columns.take(2).toSeq
    val pins = new graft.Pins
    var remE = pins.pin(edges
      .select(col(ca).cast("long").as("a"), col(cb).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull).distinct())
    var remN = pins.pin(remE.select(col("a").as("node"))
      .unionAll(remE.select(col("b").as("node"))).distinct())
    val e0 = remE.count()
    val budgetFactor = spark.conf
      .get("spark.graft.graph.sccEdgeBudgetFactor", "8").toLong
    val edgeBudget = math.max(e0, 1L) * math.max(budgetFactor, 1L)
    lastSccEdges.set(e0)
    lastSccEdgeBudgetTrips.set(0)
    var rounds = 0L
    // min-label propagation to fixpoint over a (src, dst) view: each
    // round lab(v) = min(lab(v), min lab(w) over v -> w); converged
    // when the one-row label sum stops decreasing
    def labSum(lab: DataFrame): java.math.BigDecimal =
      lab.agg(sum(col("lab").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)
    def minReach(eIn: DataFrame, nodes: DataFrame): DataFrame = {
      var e = eIn
      var lab = pins.pin(nodes.select(col("node"), col("node").as("lab")))
      var s = labSum(lab)
      var localRound = 0
      var doubleStop = false
      var done = false
      while (!done) {
        rounds += 1
        localRound += 1
        require(rounds <= maxRounds,
          s"SCC propagation exceeded $maxRounds rounds - the " +
            "condensation DAG is adversarially deep; raise maxRounds" +
            (if (lastSccEdgeBudgetTrips.get() > 0)
               " (reach doubling hit the composed-edge budget " +
                 s"${lastSccEdgeBudgetTrips.get()} time(s); raising " +
                 "spark.graft.graph.sccEdgeBudgetFactor trades memory " +
                 "for rounds)"
             else "")
        )
        // deep propagation: double the reach so labels travel 2^k hops
        // (E ∪ E∘E preserves reachability exactly). Budgeted: a dense
        // deep remainder can push the composition toward its transitive
        // closure, so the candidate is counted and REJECTED past the
        // edge budget — the pass then degrades loudly to plain rounds.
        if (localRound % 8 == 0 && !doubleStop) {
          val (e2, n2) = pins.pinCounted(e.unionAll(
              e.toDF("a", "m").join(e.toDF("m", "b"), "m")
                .select("a", "b"))
            .distinct())
          if (n2 > edgeBudget) {
            doubleStop = true
            lastSccEdgeBudgetTrips.incrementAndGet()
            if (n2 > lastSccEdges.get()) lastSccEdges.set(n2)
            System.err.println(
              s"[graft] SCC reach doubling rejected: composed edge set " +
                s"$n2 exceeds budget $edgeBudget (= input $e0 x factor " +
                s"$budgetFactor); degrading this pass to plain rounds - " +
                "raise spark.graft.graph.sccEdgeBudgetFactor to trade " +
                "memory for rounds")
          } else {
            e = e2
            if (n2 > lastSccEdges.get()) lastSccEdges.set(n2)
          }
        }
        val next = pins.pin(
          lab.unionAll(e.join(lab, e("b") === lab("node"))
              .select(e("a").as("node"), col("lab")))
            .groupBy("node").agg(min(col("lab")).as("lab")))
        val s2 = labSum(next)
        done = s2.compareTo(s) == 0
        lab = next; s = s2
      }
      lab
    }
    val parts = scala.collection.mutable.ListBuffer[DataFrame]()
    var remaining = remN.count()
    while (remaining > 0) {
      val fwd = minReach(remE, remN)
      val bwd = minReach(
        remE.select(col("b").as("a"), col("a").as("b")), remN)
      val both = pins.pin(
        fwd.join(bwd.toDF("node", "lab2"), "node"))
      val det = both.where(col("lab") === col("lab2"))
        .select(col("node"), col("lab").as("scc"))
      parts += det
      remN = pins.pin(both.where(col("lab") =!= col("lab2"))
        .select(col("node")))
      // pair partition: an intra-SCC edge has identical (fwd, bwd)
      // pairs at both ends, and determined classes are exactly those
      // with fwd == bwd — keeping unequal-pair-matched edges drops
      // both the determined classes' edges and every cross-class one
      val pr = both.select(col("node"), col("lab").as("f"),
        col("lab2").as("b2"))
      remE = pins.pin(remE
        .join(pr.toDF("a", "fa", "ba"), "a")
        .join(pr.toDF("b", "fb", "bb"), "b")
        .where(col("fa") === col("fb") && col("ba") === col("bb") &&
          col("fa") =!= col("ba"))
        .select("a", "b"))
      remaining = remN.count()
    }
    lastSccRounds.set(rounds)
    if (parts.isEmpty)
      pins.seal(remN.select(col("node"), col("node").as("scc")))
    else pins.seal(parts.reduce(_.unionAll(_)))
  }
}
