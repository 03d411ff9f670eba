package graft

import graft.ops.{RetrievalOps, TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Hybrid BM25 + dense retrieval with RRF fusion. */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "query", "data")
  private val qid = 7L

  "hybridRrf" should "match a driver-side replay of the fusion rule" in {
    val docs = Tables.loadPar(spark, dir, "documents")
    val emb = Tables.loadPar(spark, dir, "embeddings")

    val res = RetrievalOps.hybridRrf(docs, emb, terms, qid, n = 10, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getInt(4)))

    // lexical leg: BM25 scores, query doc dropped, top-10 by (score, id)
    val lex = TextOps.bm25(docs, terms).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 != qid)
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // dense leg: cosine6 vs the query vector, top-10
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qv = vecs.find(_._1 == qid).get._2
    def cos6(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble
        }
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      math.floor(c * 1e6 + 0.5) / 1e6
    }
    val den = vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cos6(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap

    val fused = (lex.keySet ++ den.keySet).toSeq
      .map { id =>
        val s = lex.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0) +
          den.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0)
        id -> math.floor(s * 1e9 + 0.5) / 1e9
      }
      .sortBy { case (id, s) => (-s, id) }.take(5)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }

    res.toSeq shouldBe fused
  }

  it should "bound both legs before the fuse join" in {
    val docs = Tables.loadPar(spark, dir, "documents")
    val emb = Tables.loadPar(spark, dir, "embeddings")
    val plan = RetrievalOps.hybridRrf(docs, emb, terms, qid)
      .queryExecution.executedPlan.toString
    // each leg is cut by sort+limit (local top-n per partition), so the
    // full-outer fuse join never sees the corpus
    plan should include("TakeOrderedAndProject")
  }

  "hardNegatives" should "return dense candidates disjoint from the BM25 positives" in {
    import spark.implicits._
    val docs = Tables.loadPar(spark, sfDir, "documents")
    val emb = Tables.loadPar(spark, sfDir, "embeddings")
    val terms = Seq("spark", "query", "data")
    val negs = RetrievalOps.hardNegatives(docs, emb, terms, queryVecId = 7L,
        kPos = 10, n = 50, kNeg = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    negs.length should be <= 10
    negs.map(_._1) should not contain 7L
    // ranked by cosine desc, contiguous ranks from 1
    negs.map(_._3).toSeq shouldBe (1 to negs.length)
    negs.map(_._2).toSeq shouldBe negs.map(_._2).toSeq.sorted.reverse
    // disjoint from the lexical positives
    val pos = graft.ops.TextOps.bm25(docs, terms)
      .where(col("doc_id") =!= 7L)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    negs.map(_._1).toSet.intersect(pos) shouldBe Set.empty
  }

  "retrievalEval" should "score recall@k and reciprocal rank per query" in {
    import spark.implicits._
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 12L, 3), // 2/3, first hit rank 1
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3))                // 0/3, no hit
      .toDF("query_id", "neighbor_id", "rank")
    val m = RetrievalOps.retrievalEval(approx, exact, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    m(1L) shouldBe ((0.666667, 1.0))
    m(2L) shouldBe ((0.0, 0.0))
  }
}
