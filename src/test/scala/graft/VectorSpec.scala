package graft

import graft.ops.VectorOps
import graft.store.GraftStore
import org.apache.spark.sql.functions._

/** Similarity search over hand-built vectors with known geometry. */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  // 0: x-axis, 1: near-x, 2: y-axis, 3: near-y, 4: diag
  lazy val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.1f, 0.9f, 0.0f)),
    (4L, Seq(0.7f, 0.7f, 0.0f))
  ).toDF("vec_id", "embedding")

  "dotD" should "compute exact double dot products" in {
    val d = emb.where($"vec_id" === 0)
      .select(VectorOps.dotD(col("embedding"), col("embedding")))
      .head().getDouble(0)
    d shouldBe 1.0
  }

  "knnBrute" should "rank the geometrically nearest vector first" in {
    val res = VectorOps.knnBrute(emb, col("vec_id") === 0, k = 2)
      .orderBy("rank").collect()
    res(0).getAs[Long]("neighbor_id") shouldBe 1L // near-x closest to x
    res(1).getAs[Long]("neighbor_id") shouldBe 4L // diag second
    res.map(_.getAs[Int]("rank")).toSeq shouldBe Seq(1, 2)
  }

  "ivfAssign" should "assign vectors to the nearest centroid" in {
    // centroids: 0 (x-axis) and 2 (y-axis)
    val cent = VectorOps.centroidsOf(emb, col("vec_id").isin(0L, 2L))
    val cells = VectorOps.ivfAssign(emb, cent)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cells(1L) shouldBe 0L // near-x -> x centroid
    cells(3L) shouldBe 2L // near-y -> y centroid
    cells(0L) shouldBe 0L
    cells(2L) shouldBe 2L
  }

  it should "probe multiple cells when asked" in {
    val cent = VectorOps.centroidsOf(emb, col("vec_id").isin(0L, 2L))
    val two = VectorOps.ivfAssign(emb, cent, probes = 2)
    two.groupBy("vec_id").count().collect()
      .foreach(_.getLong(1) shouldBe 2L) // every vector probes both cells
  }

  it should "reach brute-force recall at probes = #centroids" in {
    val full = VectorOps.ivfSearch(emb, col("vec_id").isin(0L, 2L),
        col("vec_id") === 3L, k = 4, probes = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val brute = VectorOps.knnBrute(emb, col("vec_id") === 3L, k = 4)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    full shouldBe brute
  }

  "ivfSearch" should "only return neighbors from the query's cell" in {
    val res = VectorOps.ivfSearch(emb, col("vec_id").isin(0L, 2L),
        col("vec_id") === 3L, k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // query 3 is in the y cell -> neighbors drawn from {2} (+4 if y cell)
    res should contain(2L)
    res should not contain (1L) // x-cell vector never searched
  }

  "ivfSearchWith" should "have recall monotone in probes" in {
    // more probed cells = a candidate superset; a candidate that displaces
    // a relevant top-10 hit must itself be in the exact top-10, so
    // recall@k can only rise with probes
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = VectorOps.centroidsOf(e, col("vec_id") < 16)
    val cells = VectorOps.ivfAssign(e, cent)
    val exact = VectorOps.knnBrute(e, col("vec_id") < 8, k = 10)
    val byProbes = Seq(1, 2, 4).map { p =>
      p -> graft.ops.RetrievalOps.retrievalEval(
          VectorOps.ivfSearchWith(e, cent, cells, col("vec_id") < 8,
            k = 10, probes = p),
          exact, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }.toMap
    for (q <- byProbes(1).keys) {
      byProbes(1)(q) should be <= byProbes(2)(q)
      byProbes(2)(q) should be <= byProbes(4)(q)
    }
    // the sweep does real work: some query gains recall from probing wider
    byProbes(4).values.sum should be > byProbes(1).values.sum
  }

  "embedDupPairsBrute" should "find only near-parallel pairs" in {
    val pairs = VectorOps.embedDupPairsBrute(emb, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((0L, 1L))
    pairs should not contain ((0L, 2L)) // orthogonal
  }

  "embedDupPairs" should "match brute force through the LSH-banded plan" in {
    // real 64-dim embeddings; deterministic planes -> deterministic buckets
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.loadPar(spark, d, "embeddings")
      val lsh = VectorOps.embedDupPairs(e, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = VectorOps.embedDupPairsBrute(e, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      lsh shouldBe brute
    }
  }

  "kmeans" should "assign every vector exactly once, deterministically" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count()
    val a = VectorOps.kmeans(e).collect()
    a.length.toLong shouldBe n
    a.map(_.getLong(0)).distinct.length.toLong shouldBe n
    val clusters = a.map(_.getInt(1)).distinct
    all(clusters) should (be >= 0 and be < 8)
    clusters.length should be > 1 // real partition of the corpus
    // bit-identical across runs (fixed seeds, fixed iterations)
    val b = VectorOps.kmeans(e).collect()
    a.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq shouldBe
      b.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
  }

  it should "keep each iteration join-free (centroids are literals)" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = VectorOps.kmeans(e).queryExecution.executedPlan.toString
    plan should not include "Join"
    // members move between clusters vs the seed assignment: the update
    // step did real work (guards against a frozen-centroid regression)
    val seeds = VectorOps.kmeans(e, iters = 0).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fin = VectorOps.kmeans(e).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    fin should not be seeds
  }

  it should "produce identical assignments through both physical shapes" in {
    // the scale knob: k ≤ literalMax runs the codegen greatest-over-
    // structs argmax; k above it runs the broadcast-join + map-side-
    // combined max(struct) — same (cos DESC, cluster ASC) contract, so
    // results must be bit-identical at any k
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    for (k <- Seq(4, 25)) {
      val lit = VectorOps.kmeansAssigned(e, k = k, literalMax = 64)
        .select("vec_id", "cluster", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
      val join = VectorOps.kmeansAssigned(e, k = k, literalMax = 0)
        .select("vec_id", "cluster", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
      join shouldBe lit
    }
  }

  it should "assign via a broadcast join, not a k-way greatest, at large k" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = VectorOps.kmeansAssigned(e, k = 25, literalMax = 0)
      .queryExecution.executedPlan.toString
    plan should include("Broadcast")
    plan should not include "greatest"
    // and the argmax aggregates map-side (partial_max before the exchange)
    plan should include("partial_max")
  }

  "clusterCount" should "grow with the corpus above the floor" in {
    VectorOps.clusterCount(500) shouldBe 8
    VectorOps.clusterCount(2000) shouldBe 8
    VectorOps.clusterCount(1024L * 50) shouldBe 50
    VectorOps.clusterCount(100L * 1000 * 1000) shouldBe 97656 // ~SemDeDup's 50k regime
    VectorOps.clusterCount(100, targetClusterSize = 10, floor = 4) shouldBe 10
  }

  "semDedup" should "prune identically over both assignment shapes" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    def run(litMax: Int) =
      VectorOps.semDedupOver(
          VectorOps.kmeansAssigned(e, k = 10, literalMax = litMax), 0.4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
    run(64) shouldBe run(0)
  }

  it should "match a driver-side replay of the dominance rule" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val res = VectorOps.semDedup(e, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap

    def cos6(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble
        }
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      math.floor(c * 1e6 + 0.5) / 1e6
    }
    val assign = VectorOps.kmeansAssigned(e).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val expected = assign.map { case (id, v, c) =>
      id -> assign.exists { case (id2, v2, c2) =>
        id2 < id && c2 == c && cos6(v, v2) >= 0.4
      }
    }.toMap

    res shouldBe expected
    res.values.exists(identity) shouldBe true  // some dup actually pruned
    res.values.forall(identity) shouldBe false // and some survivor kept
  }

  "diverseSample" should "take the m most central members per cluster" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val assigned = VectorOps.kmeansAssigned(e)
    val res = VectorOps.diverseSample(assigned, m = 2).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getDouble(2), r.getInt(3)))
    // per cluster: at most 2 rows, ranks 1..n, cos non-increasing
    res.groupBy(_._1).foreach { case (_, rows) =>
      rows.length should be <= 2
      rows.sortBy(_._4).map(_._4).toSeq shouldBe (1 to rows.length)
      val cs = rows.sortBy(_._4).map(_._3)
      cs.zip(cs.drop(1)).foreach { case (a, b) => a should be >= b }
    }
    // rank-1 row per cluster = that cluster's max-cos member
    val maxCos = assigned.collect()
      .map(r => (r.getInt(2), r.getDouble(3)))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).max }
    res.filter(_._4 == 1).foreach { case (c, _, cos, _) =>
      cos shouldBe maxCos(c)
    }
  }

  "truncateStats" should "report the L2 mass the kept prefix retains" in {
    val m = VectorOps.truncateStats(emb, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    m(0L) shouldBe ((1.0, 1.0))          // all mass in dim 1
    m(2L) shouldBe ((0.0, 0.0))          // none in dim 1
    m(4L)._2 shouldBe 0.707107 +- 1e-6   // diag keeps 1/sqrt(2)
  }

  "knnTwoStage" should "equal brute force when candidates cover the corpus" in {
    // kCand >= corpus size -> the truncated stage prunes nothing, so the
    // full-dim re-rank must reproduce knnBrute exactly
    val brute = VectorOps.knnBrute(emb, col("vec_id") < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val two = VectorOps.knnTwoStage(emb, col("vec_id") < 2,
        dims = 2, kCand = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    two shouldBe brute
  }

  "decontaminateEmbed" should "flag train vectors near any test vector" in {
    import spark.implicits._
    val train = Seq(
      (1L, Seq(1.0f, 0.0f)),   // identical to test 100 → cos 1.0
      (2L, Seq(0.0f, 1.0f)),   // orthogonal to both test vectors
      (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding") // 45° → cos ~0.707
    val test = Seq(
      (100L, Seq(1.0f, 0.0f)),
      (101L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val m = VectorOps.decontaminateEmbed(train, test, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    m(1L) shouldBe ((1.0, 1))
    m(2L)._2 shouldBe 0
    m(3L) shouldBe ((0.707107, 0))
  }

  it should "broadcast the bounded test side, never shuffle the train side" in {
    import spark.implicits._
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = VectorOps.decontaminateEmbed(
        e.where(col("vec_id") % 10 =!= 0),
        e.where(col("vec_id") % 10 === 0), threshold = 0.5)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    // the only exchange is the final tiny per-vector max aggregate
    plan should not include "SortMergeJoin"
  }

  "semDedup" should "prune only within clusters, via an equi-join" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = VectorOps.semDedup(e, threshold = 0.4)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "pqTrain/pqEncode" should "produce one in-range code per (vector, subspace), deterministically" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count()
    val cb = VectorOps.pqTrain(e)
    cb.map(_._1).distinct.sorted shouldBe (0 until 16)
    all(cb.map(_._3.length)) shouldBe 4 // subDim = 64 / 16
    val codes = VectorOps.pqEncode(e, cb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    codes.length.toLong shouldBe n * 16
    codes.map(c => (c._1, c._2)).distinct.length.toLong shouldBe n * 16
    all(codes.map(_._3)) should (be >= 0 and be < 16)
    // bit-identical across runs (fixed seeds, fixed iterations)
    VectorOps.pqTrain(e) shouldBe cb
  }

  it should "assign each subvector to its true argmin centroid" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = VectorOps.pqTrain(e)
    val byClu = cb.map(c => (c._1, c._2) -> c._3).toMap
    val codes = VectorOps.pqEncode(e, cb).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      math.floor((dot(a, a) - 2.0 * dot(a, b) + dot(b, b)) * 1e6 + 0.5)
    }
    val sample = e.where(col("vec_id") < 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    for ((id, v) <- sample; sub <- 0 until 16) {
      val sv = v.slice(sub * 4, sub * 4 + 4)
      val best = (0 until 16).flatMap(c => byClu.get((sub, c)).map(cv =>
        (d2(sv, cv), c))).min
      codes((id, sub)) shouldBe best._2
    }
  }

  "pqSearch" should "score by the summed LUT, beating chance recall by a wide margin" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = VectorOps.pqTrain(e)
    val codes = VectorOps.pqEncode(e, cb)
    val got = VectorOps.pqSearch(e, cb, codes, col("vec_id") < 8, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // driver-side replay of the ADC score for one (query, neighbor) pair
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val codeMap = codes.collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    val byClu = cb.map(c => (c._1, c._2) -> c._3).toMap
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble }
    val (q0, n0, adc0, _) = got.head
    val expect = (0 until 16).map { sub =>
      math.floor(dot(all(q0).slice(sub * 4, sub * 4 + 4),
        byClu((sub, codeMap((n0, sub))))) * 1e6 + 0.5).toLong
    }.sum / 1e6
    adc0 shouldBe expect
    // pure-ADC recall@10 vs the exact inner-product top-10: chance is
    // 10/499 ≈ 0.02 on this near-isotropic corpus (PQ's hard case)
    def recallOf(sel: Long => Set[Long]): Double = {
      val queries = all.keys.filter(_ < 8).toSeq
      val rs = queries.map { q =>
        val exact = all.toSeq.filter(_._1 != q)
          .map { case (id, v) => (dot(all(q), v), id) }
          .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        exact.intersect(sel(q)).size / 10.0
      }
      rs.sum / rs.size
    }
    recallOf(q => got.filter(_._1 == q).map(_._2).toSet) should be >= 0.25
  }

  "binarySigs" should "set exactly the sign bits of each 32-dim word" in {
    val v = (1 to 64).map(i =>
      if (i == 1 || i == 33 || i == 64) 0.5f else -0.5f)
    val one = Seq((7L, v)).toDF("vec_id", "embedding")
    val r = VectorOps.binarySigs(one).head()
    r.getLong(1) shouldBe 1L                      // dim 1 -> bit 0 of word 0
    r.getLong(2) shouldBe (1L | (1L << 31))       // dims 33, 64 -> bits 0, 31
    // zero is NOT positive: all-zero vector has empty signature
    val z = Seq((8L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    VectorOps.binarySigs(z).head().getLong(1) shouldBe 0L
  }

  "binarySearchRerank" should "recall most exact neighbors through the Hamming prefilter" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val got = VectorOps.binarySearchRerank(e, VectorOps.binarySigs(e),
        col("vec_id") < 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble }
    val queries = all.keys.filter(_ < 8).toSeq
    val recalls = queries.map { q =>
      val exact = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (dot(all(q), v), id) }
        .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
      exact.intersect(got.filter(_._1 == q).map(_._2).toSet).size / 10.0
    }
    (recalls.sum / recalls.size) should be >= 0.6
  }

  "ivfPqSearch" should "stay inside the probed cells and still recall well" in {
    val d = "/root/testdata/sf0.001"
    val e = Tables.loadPar(spark, d, "embeddings")
    val (cent, cells) = GraftStore.ivfIndex(spark, d)
    val (cb, codes) = GraftStore.pqIndex(spark, d)
    val got = VectorOps.ivfPqSearch(e, cent, cells, cb, codes,
        col("vec_id") < 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every returned neighbor lives in one of its query's probed cells
    val cellOf = cells.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = VectorOps.ivfAssign(e.where(col("vec_id") < 8), cent, 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    got.foreach { case (q, n) => probed(q) should contain(cellOf(n)) }
    // recall vs exact IP top-10, within the IVF contract (cell pruning
    // caps it; the PQ stage must not lose what the cells contain)
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (a, (p, q)) => a + p.toDouble * q.toDouble }
    val recalls = all.keys.filter(_ < 8).toSeq.map { q =>
      val exact = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (dot(all(q), v), id) }
        .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
      exact.intersect(got.filter(_._1 == q).map(_._2).toSet).size / 10.0
    }
    (recalls.sum / recalls.size) should be >= 0.2 // 2-probe cell cap dominates
  }

  "ivfPqSearchResidual" should "recall at least as well as the raw-codebook composition" in {
    val d = "/root/testdata/sf0.001"
    val e = Tables.loadPar(spark, d, "embeddings")
    val (cent, cells) = GraftStore.ivfIndex(spark, d)
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (a, (p, q)) => a + p.toDouble * q.toDouble }
    def recallOf(got: Array[(Long, Long)]): Double = {
      val rs = all.keys.filter(_ < 8).toSeq.map { q =>
        val exact = all.toSeq.filter(_._1 != q)
          .map { case (id, v) => (dot(all(q), v), id) }
          .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        exact.intersect(got.filter(_._1 == q).map(_._2).toSet).size / 10.0
      }
      rs.sum / rs.size
    }
    val (cbRaw, codesRaw) = GraftStore.pqIndex(spark, d)
    val raw = VectorOps.ivfPqSearch(e, cent, cells, cbRaw, codesRaw,
      col("vec_id") < 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (cbRes, codesRes) = GraftStore.pqResIndex(spark, d)
    val res = VectorOps.ivfPqSearchResidual(e, cent, cells, cbRes, codesRes,
      col("vec_id") < 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // same probes/rerank budget: residual codes must not lose recall
    recallOf(res) should be >= recallOf(raw)
    // residual results stay inside the probed-cell contract too
    val cellOf = cells.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = VectorOps.ivfAssign(e.where(col("vec_id") < 8), cent, 2)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    res.foreach { case (q, n) => probed(q) should contain(cellOf(n)) }
  }

  "persistAnnIndexes/openAnnIndexes" should "round-trip every ANN artifact identically" in {
    val d = "/root/testdata/sf0.001"
    val e = Tables.loadPar(spark, d, "embeddings")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_idx").toString
    GraftStore.persistAnnIndexes(spark, d, tmp)
    val (cb2, codes2, sigs2, cent2, cells2) = GraftStore.openAnnIndexes(spark, tmp)
    // PQ search over REOPENED artifacts == session-built artifacts
    val (cb, codes) = GraftStore.pqIndex(spark, d)
    cb2 shouldBe cb
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    rows(VectorOps.pqSearch(e, cb2, codes2, col("vec_id") < 4, topK = 5)) shouldBe
      rows(VectorOps.pqSearch(e, cb, codes, col("vec_id") < 4, topK = 5))
    rows(VectorOps.binarySearchRerank(e, sigs2, col("vec_id") < 4, topK = 5)) shouldBe
      rows(VectorOps.binarySearchRerank(e, GraftStore.binaryIndex(spark, d),
        col("vec_id") < 4, topK = 5))
    val (cent, cells) = GraftStore.ivfIndex(spark, d)
    rows(VectorOps.ivfSearchWith(e, cent2, cells2, col("vec_id") < 4, k = 5)) shouldBe
      rows(VectorOps.ivfSearchWith(e, cent, cells, col("vec_id") < 4, k = 5))
  }

  "pqSearchRerank" should "lift recall to near-exact via the two-stage shape" in {
    val e = Tables.loadPar(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = VectorOps.pqTrain(e)
    val codes = VectorOps.pqEncode(e, cb)
    val got = VectorOps.pqSearchRerank(e, cb, codes, col("vec_id") < 8,
        topK = 10).collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble }
    val queries = all.keys.filter(_ < 8).toSeq
    val recalls = queries.map { q =>
      val exact = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (dot(all(q), v), id) }
        .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
      exact.intersect(got.filter(_._1 == q).map(_._2).toSet).size / 10.0
    }
    (recalls.sum / recalls.size) should be >= 0.8
  }
}
