package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over embedding columns (`array<float>`), Spark-first:
  * dot products are codegen'd higher-order-function folds (zip_with +
  * aggregate) in double precision with a fixed left-to-right order, so the
  * identical fold replays bit-exactly in the DuckDB oracle. No UDFs.
  *
  * Scale shapes:
  *   - brute-force top-k: corpus streamed, query set broadcast — one pass
  *     over the corpus per batch of queries, top-k via per-query window
  *     (at 100 TB swap the window for a per-partition bounded heap in
  *     mapPartitions if k*|Q| outgrows shuffle comfort);
  *   - IVF: assign every vector to its nearest centroid once (broadcast
  *     centroids), then search only the query's cell — the classic
  *     inverted-file ANN layout; cells are the partition pruning analog.
  */
object VectorOps {

  /** Corpus-proportional cluster count — THE SemDeDup/IVF scale knob.
    * k = max(floor, n / targetClusterSize): cluster population stays
    * ~constant as the corpus grows, so within-cluster quadratics
    * (Σ|cluster|² candidate pairs) stay bounded instead of n²/k with a
    * frozen k. SemDeDup (arXiv:2303.09540) uses 50k clusters for 100M
    * docs ≈ 2k per cluster; target 1024 is the same regime. The DuckDB
    * oracles replay the identical formula (`greatest(floor, n // target)`)
    * so derived-k gates stay engine-exact at any scale factor.
    */
  def clusterCount(n: Long, targetClusterSize: Long = 1024L,
                   floor: Int = 8): Int =
    math.min(math.max(floor.toLong, n / targetClusterSize), Int.MaxValue.toLong)
      .toInt

  /** Double-precision dot product. Uses the native codegen'd expression
    * (graft.functions.DotProductD, registered by GraftExtensions) — Spark's
    * higher-order functions would interpret the lambda per element. Same
    * strict left-to-right fold either way.
    */
  def dotD(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** HOF reference implementation of dotD (kept for sessions without
    * GraftExtensions; identical fold order and results).
    */
  def dotDHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity rounded to 6 decimals (rounding happens BEFORE any
    * ordering/thresholding so engine-identical ranking falls out).
    */
  def cosine6(a: Column, b: Column): Column =
    floor((dotD(a, b) / (norm2(a) * norm2(b))) * 1e6 + 0.5) / 1e6

  /** Brute-force top-k cosine neighbors for a (small) query subset. */
  def knnBrute(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine6(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .drop("qv", "nv")
  }

  /** Two-stage MRL retrieval: candidates by TRUNCATED-prefix cosine
    * (`dims` of the full width — the cheap scan a Matryoshka index
    * serves, cost scaled by dims/fullDims per pair), then an exact
    * full-dimension re-rank of only the `kCand` survivors per query.
    * Both stages are deterministic windows (cos desc, neighbor asc);
    * the candidate stage bounds the expensive full-width dot products
    * to kCand per query instead of the whole corpus.
    */
  def knnTwoStage(emb: DataFrame, queryPred: Column, dims: Int,
                  kCand: Int, k: Int): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val wT = Window.partitionBy("query_id")
      .orderBy(col("cos_t").desc, col("neighbor_id").asc)
    val wF = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("nv"),
        cosine6(slice(col("qv"), 1, dims), slice(col("nv"), 1, dims)).as("cos_t"))
      .withColumn("cand_rank", row_number().over(wT))
      .where(col("cand_rank") <= kCand)
      .select(col("query_id"), col("neighbor_id"),
        cosine6(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(wF))
      .where(col("rank") <= k)
  }

  /** Centroid relation (cent_id, cv) from a predicate over the corpus. */
  def centroidsOf(emb: DataFrame, centroidPred: Column): DataFrame =
    emb.where(centroidPred)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))

  /** Assign each vector to its top-`probes` max-cosine centroids (ties ->
    * smallest centroid id). probes = 1 is the storage assignment; probes >
    * 1 is the multi-probe QUERY side. Returns (vec_id, cell) rows.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, probes: Int = 1): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("cent_id").asc)
    vectors.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cent_id"), cosine6(col("embedding"), col("cv")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= probes)
      .select(col("vec_id"), col("cent_id").as("cell"))
  }

  /** IVF search: top-k within the query's `probes` nearest cells. Exact
    * w.r.t. the IVF contract; recall vs brute force grows with probes
    * (probes = #centroids degenerates to exact search).
    */
  def ivfSearch(emb: DataFrame, centroidPred: Column, queryPred: Column,
                k: Int, probes: Int = 1): DataFrame = {
    val cent = centroidsOf(emb, centroidPred)
    ivfSearchWith(emb, cent, ivfAssign(emb, cent), queryPred, k, probes)
  }

  /** IVF search over a PREBUILT index: `cent` and the storage-side cell
    * assignment `cells` are ingest artifacts (see `GraftStore.ivfIndex`)
    * — a query recomputes only ITS OWN cell assignment, never the
    * corpus's, matching the inverted-file lifecycle at scale (the index
    * is written once; queries prune to their cells).
    */
  def ivfSearchWith(emb: DataFrame, cent: DataFrame, cells: DataFrame,
                    queryPred: Column, k: Int, probes: Int = 1): DataFrame = {
    val withCell = emb.join(cells, Seq("vec_id"))
    val q = emb.where(queryPred)
      .join(ivfAssign(emb.where(queryPred), cent, probes), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    val n = withCell
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    n.join(broadcast(q), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine6(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic ±1 "random-sign" hyperplanes (LCG-derived), the
    * random-projection family for cosine LSH. Components are exactly
    * representable, so both engines compute bit-identical projections.
    */
  def signHyperplanes(numPlanes: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(numPlanes) { j =>
      Array.tabulate(dim) { t =>
        val h = (1103515245L * (j.toLong * dim + t) + 12345L) % 2147483648L
        if (((h >> 13) & 1L) == 1L) 1.0f else -1.0f
      }
    }

  /** LSH bucket id: bit j = sign of the projection onto hyperplane j. */
  def lshBucket(v: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dotD(v, lit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the query's bucket (single probe),
    * ranked by exact cosine. The scale path when centroids are unavailable
    * or the corpus churns: bucketing is a stateless projection, so ingest
    * never re-clusters. numPlanes trades recall for candidate volume.
    */
  def annLsh(emb: DataFrame, queryPred: Column, k: Int,
             numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = signHyperplanes(numPlanes, dim)
    val b = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val q = b.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val n = b.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    n.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine6(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (>= threshold): banded
    * hyperplane-LSH candidates + exact-cosine verify — the 100-TB shape.
    * Each vector gets `numPlanes` sign bits (deterministic hyperplanes),
    * split into `bands`; two vectors are candidates iff they agree on some
    * full band, so the join is an equi-join on (band, bits) — candidate
    * volume ∝ near-dup density, never the all-pairs square. Verification
    * is exact, so false candidates cost only the verify join; a missed
    * pair would need to disagree in EVERY band (probability (θ/π)-driven,
    * vanishing for near-duplicates — e.g. ~1e-6 at cos 0.95 with 8x2
    * bands). `embedDupPairsBrute` remains as the spec-level oracle.
    */
  def embedDupPairs(emb: DataFrame, threshold: Double,
                    numPlanes: Int = 16, bands: Int = 8, dim: Int = 64): DataFrame = {
    require(numPlanes % bands == 0, "bands must divide numPlanes")
    val rows = numPlanes / bands
    val planes = signHyperplanes(numPlanes, dim)
    val bits = planes.zipWithIndex.map { case (pl, j) =>
      when(dotD(col("embedding"), lit(pl)) > 0, lit(1L << (j % rows))).otherwise(lit(0L))
    }
    val bandKeys = array((0 until bands).map { b =>
      (b * rows until (b + 1) * rows).map(bits).reduce(_ + _)
    }: _*)
    val bucketed = emb
      .select(col("vec_id"), col("embedding"), posexplode(bandKeys).as(Seq("band", "key")))
    val cand = bucketed.as("x").join(bucketed.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val e = emb.select(col("vec_id"), col("embedding"))
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine6(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Exact per-dimension centroids of embedding groups: explode to
    * (bucket, dim, component), sum in integer micros (order-independent,
    * so map-side combine is safe and both engines agree bit-for-bit), one
    * float division at the end. The k-means-update / cluster-profile
    * primitive at corpus scale — a single map-side-combined aggregate.
    */
  def dimCentroids(emb: DataFrame, bucket: Column): DataFrame =
    emb
      .select(bucket.as("bucket"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("bucket"), (col("pos") + 1).as("dim"))
      .agg((sum(floor(col("v").cast("double") * 1e6 + 0.5).cast("long")).cast("double")
        / (count(lit(1)) * 1e6)).as("centroid"))

  /** Matryoshka-style truncation audit: retained L2 mass when keeping
    * only the first k dimensions — the dimensionality-reduction check
    * (MRL-trained embeddings front-load information, so `retained` and
    * `cos_full` = |v[:k]|/|v| tell you what a k-dim index loses). Pure
    * per-row expressions over a slice and the shared codegen dot kernel:
    * no shuffle, pipelines inside the scan; cosine between the truncated
    * and full vector IS the norm ratio (the tail contributes zero to the
    * dot), quantized to 6 decimals via the shared discipline.
    */
  def truncateStats(emb: DataFrame, k: Int): DataFrame = {
    val t = slice(col("embedding"), 1, k)
    emb.select(col("vec_id"),
      (floor(norm2(t) * 1e6 + 0.5) / 1e6).as("norm_k"),
      (floor(norm2(col("embedding")) * 1e6 + 0.5) / 1e6).as("norm_full"),
      (floor((norm2(t) / norm2(col("embedding"))) * 1e6 + 0.5) / 1e6)
        .as("retained"))
  }

  /** Per-dimension symmetric int8 quantization audit — the embedding-
    * compression stage (serving indexes, 4x-smaller training shards).
    * Pass 1 learns the per-dimension scale (max |v| / 127, one map-side-
    * combined aggregate); pass 2 re-streams the corpus against the
    * BROADCAST 64-row scale table, quantizes `code = floor(v/scale + 0.5)`
    * (explicit floor(+0.5): identical rounding on every engine, unlike
    * round()'s mode differences), and folds per-dimension error stats.
    * The reconstruction error sums in integer nanos, so the aggregate is
    * order-independent and bit-replayable in the oracle. Output per dim:
    * scale, saturated-code count, mean absolute reconstruction error.
    */
  def int8QuantStats(emb: DataFrame): DataFrame = {
    val e = emb.select(
      posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select((col("pos") + 1).as("dim"), col("vf").cast("double").as("v"))
    val scales = e.groupBy("dim")
      .agg((max(abs(col("v"))) / 127.0).as("scale"))
    val code = when(col("scale") > 0,
      floor(col("v") / col("scale") + 0.5)).otherwise(lit(0.0))
    e.join(broadcast(scales), Seq("dim"))
      .select(col("dim"), col("scale"), code.as("code"), col("v"))
      .groupBy("dim")
      .agg(
        (floor(first(col("scale")) * 1e9 + 0.5) / 1e9).as("scale"),
        sum((abs(col("code")) >= 127).cast("long")).as("n_saturated"),
        (sum(floor(abs(col("code") * col("scale") - col("v")) * 1e9 + 0.5)
          .cast("long")).cast("double") / (count(lit(1)) * 1e9))
          .as("mean_abs_err"))
  }

  /** Deterministic distributed k-means over the embedding corpus — the
    * cluster-based curation primitive (semantic-dedup buckets, domain
    * discovery, diversity-sampling quotas over training shards).
    *
    * Scale shape: each iteration is ONE narrow map pass — the k current
    * centroids ride along as literal float arrays, so the nearest-centroid
    * argmax is a pure codegen'd per-row expression (`greatest` over
    * (cos, -cluster) structs): no join, no shuffle of the corpus — plus
    * ONE map-side-combined aggregate for the centroid update. The k×dim
    * update result is collected driver-side (bounded: k·dim rows, the
    * same constant class as the stats/seed lookups). The iteration count
    * is FIXED: convergence-based stopping would make results depend on
    * float-comparison noise across engines.
    *
    * Determinism contract (replayed bit-for-bit by the DuckDB oracle):
    *   - seeds: the k vectors at vec_id = i·⌊n/k⌋ (spread, order-free);
    *   - assignment: max cosine6, ties to the smallest cluster id;
    *   - update: per-dim mean via integer-micros sums (order-independent,
    *     map-side-combine-safe), narrowed to float (IEEE round-to-nearest
    *     on both engines) so the next round's dot runs float-widened.
    * Clusters that lose all members simply drop out of the next round,
    * identically on both engines.
    */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame =
    kmeansAssigned(emb, k, iters)
      .select(col("vec_id"), col("cluster"), col("cos")).orderBy("vec_id")

  /** `kmeans` with the per-row embedding retained in the output — for
    * downstream ops that need the vector AND its cluster in one relation
    * (semantic dedup, per-cluster diversity sampling) without re-joining
    * the corpus. Same determinism contract as `kmeans`.
    *
    * Nearest-centroid assignment has TWO physical shapes with identical
    * results (max cosine6, ties to the smallest cluster id):
    *   - k ≤ `literalMax`: the centroids ride along as literal float
    *     arrays and the argmax is one codegen'd `greatest` over k structs
    *     — no join, no shuffle, the cheapest possible pass;
    *   - k > `literalMax`: a 50k-way literal expression is not a plan, so
    *     the centroids become a BROADCAST relation and the argmax is a
    *     map-side-combined `max(struct(cos, -cluster))` per vec_id — one
    *     broadcast nested-loop join + one partial-aggregated shuffle of
    *     ~n rows (NOT n·k: the combiner folds the k candidates before the
    *     exchange). This is the 100-TB shape `ivfAssign` uses, minus
    *     ivfAssign's window (an aggregate combines map-side; a window
    *     cannot).
    */
  def kmeansAssigned(emb: DataFrame, k: Int = 8, iters: Int = 3,
                     literalMax: Int = 64): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val n = e.count()
    val step = n / k
    require(step > 0, s"kmeans: need at least k=$k vectors, got $n")
    var cents: Seq[(Int, Seq[Float])] =
      e.where(col("vec_id") % step === 0 && col("vec_id") < k * step)
        .select((col("vec_id") / step).cast("int").as("cluster"), col("embedding"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Float](1)))
        .sortBy(_._1)

    def assigned: DataFrame =
      if (cents.size <= literalMax) {
        val best = greatest(cents.map { case (c, v) =>
          struct(cosine6(col("embedding"), typedLit(v)).as("cos"),
            lit(-c).as("nc"))
        }: _*)
        e.select(col("vec_id"), col("embedding"), best.as("b"))
          .select(col("vec_id"), col("embedding"),
            (-col("b.nc")).cast("int").as("cluster"), col("b.cos").as("cos"))
      } else {
        val spark = e.sparkSession
        import spark.implicits._
        val cdf = cents.toDF("cluster", "cv")
        e.crossJoin(broadcast(cdf))
          .select(col("vec_id"), col("embedding"),
            struct(cosine6(col("embedding"), col("cv")).as("cos"),
              (-col("cluster")).as("nc")).as("sc"))
          .groupBy(col("vec_id"))
          .agg(first(col("embedding")).as("embedding"), max(col("sc")).as("b"))
          .select(col("vec_id"), col("embedding"),
            (-col("b.nc")).cast("int").as("cluster"), col("b.cos").as("cos"))
      }

    for (_ <- 1 to iters) {
      val upd = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg((sum(floor(col("v").cast("double") * 1e6 + 0.5).cast("long")).cast("double")
          / (count(lit(1)) * 1e6)).cast("float").as("c"))
        .collect()
      cents = upd.toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
        .groupBy(_._1).toSeq
        .map { case (c, dims) => (c, dims.sortBy(_._2).map(_._3).toSeq) }
        .sortBy(_._1)
    }
    assigned
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means the embedding corpus, then prune
    * near-identical vectors WITHIN each cluster by exact cosine. A vector
    * is removed iff some lower-id member of its own cluster is at least
    * `threshold` cosine-similar — a monotone dominance rule rather than
    * the paper's greedy keep-one-per-group walk: it has no sequential
    * dependency, so the prune is ONE equi-join on the cluster id instead
    * of an O(|cluster|) serial scan, and it replays in plain SQL. (Both
    * rules keep the lowest-id member of every duplicate group; the
    * dominance rule may additionally drop a chain neighbor the greedy
    * walk would resurrect — at dedup thresholds ~0.95+ the difference is
    * items that are near-duplicates of near-duplicates.)
    *
    * Scale shape: clustering first is the whole point — candidate pairs
    * are Σ|cluster|², never corpus². k grows with the corpus (SemDeDup
    * uses 50k clusters for 100M docs) so per-cluster quadratics stay
    * bounded, and the pair join is a plain shuffle equi-join on the
    * cluster id; no all-pairs join exists in the plan. Output: one row
    * per vector (vec_id, cluster, removed).
    */
  def semDedup(emb: DataFrame, threshold: Double,
               k: Int = 8, iters: Int = 3): DataFrame =
    semDedupOver(kmeansAssigned(emb, k, iters), threshold)

  /** `semDedup` over a PREBUILT cluster assignment (vec_id, embedding,
    * cluster, ...) — see `GraftStore.kmeansIndex`: clustering is the
    * ingest stage, the prune re-runs per threshold.
    */
  def semDedupOver(assigned: DataFrame, threshold: Double): DataFrame = {
    val x = assigned
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val removed = x.as("a").join(x.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("b.vec_id") < col("a.vec_id"))
      .where(cosine6(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("a.vec_id").as("vec_id")).distinct()
      .withColumn("rm", lit(true))
    x.select(col("vec_id"), col("cluster"))
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("rm"), lit(false)).as("removed"))
      .orderBy("vec_id")
  }

  /** Cluster-balanced diversity sampling: the top-`m` most central
    * members of EVERY k-means cluster — the coverage-preserving
    * subsampling primitive (pick representatives from each semantic
    * bucket instead of frequency-weighted sampling that drowns small
    * modes). One window partitioned by cluster id over the prebuilt
    * assignment (`GraftStore.kmeansIndex`); output is k·m rows.
    */
  def diverseSample(assigned: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy("cluster")
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.select(col("vec_id"), col("cluster"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= m)
      .orderBy("cluster", "rank")
  }

  /** Embedding-space decontamination: score every training vector by its
    * maximum cosine against the held-out/eval set and flag those at or
    * above the threshold — the semantic-leakage check that n-gram
    * decontamination misses (paraphrased eval questions share no grams
    * but sit next to each other in embedding space). The eval side of a
    * decontamination run is bounded by construction, so it BROADCASTS and
    * the plan is one linear codegen scan of the training side (per-pair
    * `graft_dot`, then a map-side-combined max per vector) — no shuffle
    * of the big side at any corpus scale.
    */
  def decontaminateEmbed(train: DataFrame, test: DataFrame,
                         threshold: Double): DataFrame = {
    val t = broadcast(
      test.select(col("vec_id").as("__tid"), col("embedding").as("__tv")))
    train.select(col("vec_id"), col("embedding"))
      .crossJoin(t)
      .select(col("vec_id"), cosine6(col("embedding"), col("__tv")).as("cos"))
      .groupBy("vec_id")
      .agg(max(col("cos")).as("max_cos"))
      .withColumn("contaminated", (col("max_cos") >= threshold).cast("int"))
  }

  // ---------------------------------------------------------------- PQ ANN

  /** Per-subspace slices of the embedding corpus: (vec_id, sub, sv) with
    * sv = dims [sub·subDim+1 .. (sub+1)·subDim]. The product-quantization
    * working relation — one narrow explode pass, m rows per vector.
    */
  def subVectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * subDim + 1, lit(subDim)).as("sv"))

  /** Squared L2 distance in integer MICROS (long): the three dot products
    * are the deterministic left-to-right double folds of [[dotD]], the
    * combine is a fixed double expression, and the μ-quantization makes
    * every downstream comparison integer-exact on both engines.
    */
  def l2sqMicros(a: Column, b: Column): Column =
    floor((dotD(a, a) - lit(2.0) * dotD(a, b) + dotD(b, b)) * 1e6 + 0.5)
      .cast("long")

  /** Product-quantization codebooks (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): the embedding space splits
    * into `m` orthogonal subspaces and each learns its own k-centroid
    * quantizer, so a vector stores as m small codes (m·log₂k bits = 8
    * bytes at the m=16, k=16 default vs 256 bytes of floats — the RAM
    * story that lets a 100 TB corpus keep its ANN index in memory).
    * Codebook size is FIXED by the code width (k = 2^bits), not
    * corpus-proportional — growing the corpus grows the codes table,
    * never the codebook. m=16 (4-dim subspaces) holds candidate recall
    * up on near-isotropic embeddings, the hard case for PQ; drop m for
    * strongly-correlated dims if code size matters more.
    *
    * Training is `iters` rounds of per-subspace k-means, all m subspaces
    * in ONE pass per round: assignment joins the (m·k)-row broadcast
    * codebook against the subvector relation and takes the min-(d2μ,
    * cluster) struct per (vec_id, sub) — map-side-combined, no window —
    * and the update is the integer-micros per-dim mean narrowed to float
    * (the [[kmeansAssigned]] discipline, replayed bit-for-bit by the
    * DuckDB oracle). Seeds are the subvectors of the k stride-spread
    * vectors (vec_id = i·⌊n/k⌋), like `kmeans`.
    *
    * Returns (sub, cluster, centroid) rows — m·k·subDim floats, a
    * driver-side constant.
    */
  def pqTrain(emb: DataFrame, m: Int = 16, k: Int = 16, iters: Int = 2)
      : Seq[(Int, Int, Seq[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val pins = new graft.Pins
    val sv = pins.pin(subVectors(emb, m, subDim))
    val n = emb.count()
    val step = n / k
    require(step > 0, s"pqTrain: need at least k=$k vectors, got $n")
    var cents: Seq[(Int, Int, Seq[Float])] =
      sv.where(col("vec_id") % step === 0 && col("vec_id") < k * step)
        .select(col("sub"), (col("vec_id") / step).cast("int").as("cluster"),
          col("sv"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
        .sortBy(c => (c._1, c._2))
    def assigned(cs: Seq[(Int, Int, Seq[Float])]): DataFrame = {
      val cdf = broadcast(cs.toDF("sub", "cluster", "cv"))
      sv.join(cdf, Seq("sub"))
        .select(col("vec_id"), col("sub"), col("sv"),
          struct(l2sqMicros(col("sv"), col("cv")).as("d2m"),
            col("cluster")).as("sc"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(first(col("sv")).as("sv"), min(col("sc")).as("b"))
        .select(col("vec_id"), col("sub"), col("sv"),
          col("b.cluster").as("cluster"))
    }
    for (_ <- 1 to iters) {
      val upd = assigned(cents)
        .select(col("sub"), col("cluster"),
          posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg((sum(floor(col("v").cast("double") * 1e6 + 0.5).cast("long"))
          .cast("double") / (count(lit(1)) * 1e6)).cast("float").as("c"))
        .collect()
      cents = upd.toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getFloat(3)))
        .groupBy(c => (c._1, c._2)).toSeq
        .map { case ((s, c), dims) =>
          (s, c, dims.sortBy(_._3).map(_._4).toSeq) }
        .sortBy(c => (c._1, c._2))
    }
    pins.release()
    cents
  }

  /** Encode the corpus against a trained codebook: (vec_id, sub, code)
    * rows — the PQ codes table, n·m ints. Same assignment shape (and
    * tie-break) as training.
    */
  def pqEncode(emb: DataFrame, codebook: Seq[(Int, Int, Seq[Float])])
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = codebook.head._3.length
    val m = codebook.map(_._1).max + 1
    val cdf = broadcast(codebook.toDF("sub", "cluster", "cv"))
    subVectors(emb, m, subDim).join(cdf, Seq("sub"))
      .select(col("vec_id"), col("sub"),
        struct(l2sqMicros(col("sv"), col("cv")).as("d2m"),
          col("cluster")).as("sc"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(col("sc")).as("b"))
      .select(col("vec_id"), col("sub"), col("b.cluster").as("code"))
  }

  /** Asymmetric-distance (ADC) top-k search over PQ codes: each query
    * builds a (m·k)-entry lookup table of integer-micro inner products
    * between ITS subvectors and the codebook (queries stay full
    * precision; only the corpus is quantized — "asymmetric"), the LUT
    * broadcasts, and the approximate inner product of every corpus
    * vector is one map-side-combined integer SUM over its m code rows.
    * Scale shape: the corpus pass touches only the codes table (~2 bytes
    * per vector of payload, never the float vectors), one broadcast
    * hash join + one aggregate + the per-query top-k window — the
    * standard IVF-less ADC scan; ranking ties break to the smaller
    * neighbor id, and integer accumulation makes the ranking order-free.
    *
    * Output: (query_id, neighbor_id, adc, rnk), adc = approximate inner
    * product (micros / 1e6), rnk 1..topK by adc descending.
    */
  def pqSearch(emb: DataFrame, codebook: Seq[(Int, Int, Seq[Float])],
               codes: DataFrame, queryPred: Column, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = codebook.head._3.length
    val m = codebook.map(_._1).max + 1
    val cdf = codebook.toDF("sub", "cluster", "cv")
    val lut = subVectors(emb.where(queryPred), m, subDim)
      .withColumnRenamed("vec_id", "query_id")
      .join(cdf, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cluster"),
        floor(dotD(col("sv"), col("cv")) * 1e6 + 0.5).cast("long").as("lutm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adcm").desc, col("neighbor_id").asc)
    codes.join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("cluster"))
      .where(codes("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), codes("vec_id").as("neighbor_id"))
      .agg(sum(col("lutm")).as("adcm"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        (col("adcm") / 1e6).as("adc"), col("rnk"))
  }

  /** Exact inner-product re-rank of a bounded (query_id, neighbor_id)
    * candidate relation: only the candidates' vectors are fetched, the
    * rounded-micros ip makes the ranking engine-portable. The shared
    * second stage of every two-stage retrieval here (PQ, binary, IVFPQ).
    */
  def exactRerank(emb: DataFrame, cand: DataFrame, queryPred: Column,
                  topK: Int): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val n = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ip").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"))
      .join(n, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (floor(dotD(col("qv"), col("nv")) * 1e6 + 0.5) / 1e6).as("ip"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
  }

  /** Two-stage PQ retrieval — the production ANN shape: the ADC scan
    * generates `candidates` ids per query from the codes table alone
    * (never touching the float vectors), then ONLY those candidates'
    * vectors are fetched and re-ranked by the exact rounded inner
    * product. Cost: one codes-table pass + |Q|·candidates vector
    * fetches — the quantization error that caps pure-ADC recall is
    * paid only as a slightly larger candidate set (recall@10 ≈ 0.96 at
    * candidates=100 on the near-isotropic test corpus where pure ADC
    * sits at ~0.4). Output: (query_id, neighbor_id, ip, rnk).
    */
  def pqSearchRerank(emb: DataFrame, codebook: Seq[(Int, Int, Seq[Float])],
                     codes: DataFrame, queryPred: Column, topK: Int,
                     candidates: Int = 100): DataFrame =
    exactRerank(emb,
      pqSearch(emb, codebook, codes, queryPred, candidates), queryPred, topK)

  /** IVF + PQ — the canonical billion-scale composition (FAISS IVFPQ):
    * the inverted file prunes the corpus to the query's `probes` cells,
    * the ADC scan ranks ONLY those cells' code rows (integer-micro LUT
    * sums), and the top `rerank` candidates re-rank exactly. The full
    * corpus is touched by NOTHING: the cells table prunes, the codes
    * table scores, the float vectors appear only for |Q|·rerank rows.
    * All three inputs are ingest artifacts (`GraftStore.ivfIndex` /
    * `pqIndex`). Output: (query_id, neighbor_id, ip, rnk).
    */
  def ivfPqSearch(emb: DataFrame, cent: DataFrame, cells: DataFrame,
                  codebook: Seq[(Int, Int, Seq[Float])], codes: DataFrame,
                  queryPred: Column, topK: Int, probes: Int = 2,
                  rerank: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = codebook.head._3.length
    val m = codebook.map(_._1).max + 1
    val qCells = ivfAssign(emb.where(queryPred), cent, probes)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = qCells
      .join(cells.select(col("vec_id").as("neighbor_id"), col("cell")),
        Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
    val cdf = codebook.toDF("sub", "cluster", "cv")
    val lut = subVectors(emb.where(queryPred), m, subDim)
      .withColumnRenamed("vec_id", "query_id")
      .join(cdf, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cluster").as("code"),
        floor(dotD(col("sv"), col("cv")) * 1e6 + 0.5).cast("long").as("lutm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adcm").desc, col("neighbor_id").asc)
    val adcCand = cand
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
        Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lutm")).as("adcm"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= rerank)
    exactRerank(emb, adcCand, queryPred, topK)
  }

  /** Residual relation x − centroid(cell(x)) — what IVF leaves for PQ to
    * encode (Jégou et al. 2011 §IV: quantize the residual, not the raw
    * vector; residual energy is much smaller than vector energy, so the
    * same code budget spends on a tighter domain). One broadcast of the
    * (small) centroid table against the corpus; float subtraction, the
    * same arithmetic the DuckDB replay performs.
    */
  def residuals(emb: DataFrame, cent: DataFrame, cells: DataFrame): DataFrame =
    emb.join(cells, Seq("vec_id"))
      .join(broadcast(cent.select(col("cent_id").as("cell"), col("cv"))),
        Seq("cell"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("cv"),
          (x, c) => (x - c).cast("float")).as("embedding"))

  /** PQ codebook trained on IVF RESIDUALS — the canonical FAISS IVFPQ
    * composition. Same deterministic k-means as [[pqTrain]], over the
    * residual relation.
    */
  def pqTrainResidual(emb: DataFrame, cent: DataFrame, cells: DataFrame,
                      m: Int = 16, k: Int = 16, iters: Int = 2)
      : Seq[(Int, Int, Seq[Float])] =
    pqTrain(residuals(emb, cent, cells), m, k, iters)

  /** Corpus codes against a RESIDUAL codebook. */
  def pqEncodeResidual(emb: DataFrame, cent: DataFrame, cells: DataFrame,
                       codebook: Seq[(Int, Int, Seq[Float])]): DataFrame =
    pqEncode(residuals(emb, cent, cells), codebook)

  /** IVF + residual-PQ search. The inner-product metric collapses the
    * per-(query, probed-cell) LUTs of the L2 formulation to ONE
    * cell-independent LUT plus a scalar offset:
    * ip(q, c + r̂) = ip(q, c) + ip(q, r̂) — the LUT is the RAW query
    * subvectors against the residual codebook, and each (query, cell)
    * pair contributes a single centroid inner-product offset (a
    * |Q|·probes-row broadcast). Approximation error is the residual
    * quantization error alone — strictly tighter than raw-vector PQ
    * under IVF at the same code budget. Output: (query_id, neighbor_id,
    * ip, rnk), exact-reranked like [[ivfPqSearch]].
    */
  def ivfPqSearchResidual(emb: DataFrame, cent: DataFrame, cells: DataFrame,
                          codebook: Seq[(Int, Int, Seq[Float])],
                          codes: DataFrame, queryPred: Column, topK: Int,
                          probes: Int = 2, rerank: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val subDim = codebook.head._3.length
    val m = codebook.map(_._1).max + 1
    val qCells = ivfAssign(emb.where(queryPred), cent, probes)
      .select(col("vec_id").as("query_id"), col("cell"))
    // per-(query, probed cell) centroid offset, integer micros
    val qOff = qCells
      .join(broadcast(cent.select(col("cent_id").as("cell"), col("cv"))),
        Seq("cell"))
      .join(emb.where(queryPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        Seq("query_id"))
      .select(col("query_id"), col("cell"),
        floor(dotD(col("qv"), col("cv")) * 1e6 + 0.5).cast("long").as("offm"))
    val cand = qCells
      .join(cells.select(col("vec_id").as("neighbor_id"), col("cell")),
        Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("cell"))
    val cdf = codebook.toDF("sub", "cluster", "cv")
    val lut = subVectors(emb.where(queryPred), m, subDim)
      .withColumnRenamed("vec_id", "query_id")
      .join(cdf, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cluster").as("code"),
        floor(dotD(col("sv"), col("cv")) * 1e6 + 0.5).cast("long").as("lutm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adcm").desc, col("neighbor_id").asc)
    val adcCand = cand
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
        Seq("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"), col("cell"))
      .agg(sum(col("lutm")).as("resm"))
      .join(broadcast(qOff), Seq("query_id", "cell"))
      .select(col("query_id"), col("neighbor_id"),
        (col("resm") + col("offm")).as("adcm"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= rerank)
    exactRerank(emb, adcCand, queryPred, topK)
  }

  // ------------------------------------------------------------ binary ANN

  /** One 32-bit sign word of the embedding: bit i set iff
    * dim (32w + i + 1) > 0. Two words cover the 64-dim corpus — the
    * 1-bit-per-dimension quantization tier below PQ (8 bytes/vector
    * here, 32× smaller than the floats), with Hamming distance as the
    * similarity proxy (sign agreement ∝ angular closeness, the SimHash
    * argument). The build is a one-shot ingest fold; the SEARCH kernel
    * is pure codegen'd `bit_count(xor)`.
    */
  def signWord(emb: Column, w: Int): Column =
    aggregate(transform(sequence(lit(0), lit(31)),
      i => when(element_at(emb, lit(w * 32) + i + lit(1)) > lit(0.0),
        // shiftleft needs a literal shift width; 2^i is exact in double
        // for i ≤ 31, so the cast is the same integer both engines get
        // from 1 << i
        pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Binary signature table (vec_id, sig0, sig1) of a 64-dim corpus. */
  def binarySigs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      signWord(col("embedding"), 0).as("sig0"),
      signWord(col("embedding"), 1).as("sig1"))

  /** Two-stage binary-quantized retrieval: Hamming distance over the
    * signature table selects `candidates` per query (the corpus pass
    * touches 16 bytes per vector, never the floats; `bit_count(xor)` is
    * a codegen'd integer kernel), then the candidates' vectors re-rank
    * by exact rounded inner product. Ties break (distance asc,
    * neighbor_id asc) so both engines rank identically. Output:
    * (query_id, neighbor_id, ip, rnk).
    */
  def binarySearchRerank(emb: DataFrame, sigs: DataFrame, queryPred: Column,
                         topK: Int, candidates: Int = 100): DataFrame = {
    val q = sigs.join(emb.where(queryPred).select("vec_id"), Seq("vec_id"))
      .select(col("vec_id").as("query_id"),
        col("sig0").as("q0"), col("sig1").as("q1"))
    val ham = bit_count(col("sig0").bitwiseXOR(col("q0"))) +
      bit_count(col("sig1").bitwiseXOR(col("q1")))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("ham").asc, col("neighbor_id").asc)
    val cand = sigs.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), ham.as("ham"))
      .withColumn("rn", row_number().over(wc))
      .where(col("rn") <= candidates)
    exactRerank(emb, cand, queryPred, topK)
  }

  /** Brute-force reference implementation (spec oracle for the LSH path).
    */
  def embedDupPairsBrute(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine6(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
