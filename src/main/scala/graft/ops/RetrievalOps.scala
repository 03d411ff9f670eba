package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + dense retrieval with Reciprocal Rank Fusion
  * (Cormack et al., SIGIR 2009): fuse a BM25 candidate list and an
  * embedding-cosine candidate list by summed reciprocal rank
  * `1/(c + rank)` — the standard first-stage retriever for RAG corpora,
  * robust to the two scores living on incomparable scales.
  *
  * Scale shape: each leg is the already-scale-shaped retriever
  * (`TextOps.bm25`: one broadcast stats row + one streaming scan;
  * dense: one broadcast query vector + one streaming scan), each cut to
  * its top-n via sort+limit (Catalyst TakeOrderedAndProject — every
  * partition contributes its local top-n, no global sort). Ranking and
  * fusion then run over two BOUNDED n-row lists, so the full-outer fuse
  * join is constant-sized regardless of corpus size.
  *
  * Determinism: ranks are exact ints, `1/(c+rank)` is one IEEE double
  * division, and the two-term sum is fixed-order (lexical + dense), so
  * the fused score replays bit-identically in the oracle; the
  * floor(·1e9+0.5) discipline guards the final ordering anyway.
  */
object RetrievalOps {

  /** Top-k RRF fusion of BM25(terms) and cosine(query vector) candidate
    * lists over an aligned corpus (doc_id = vec_id). The query document
    * itself is excluded from both legs. Output: one row per fused hit —
    * (doc_id, lrank, drank, rrf, rank), lrank/drank null when the doc
    * appears in only one list.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                queryVecId: Long, n: Int = 50, k: Int = 20,
                c: Int = 60): DataFrame = {
    val wl = Window.orderBy(col("bm25").desc, col("doc_id").asc)
    val lex = TextOps.bm25(docs, terms)
      .where(col("doc_id") =!= queryVecId)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(n)
      .withColumn("lrank", row_number().over(wl))
      .select(col("doc_id"), col("lrank"))

    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val wd = Window.orderBy(col("cos").desc, col("doc_id").asc)
    val den = emb.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        VectorOps.cosine6(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(n)
      .withColumn("drank", row_number().over(wd))
      .select(col("doc_id"), col("drank"))

    val rrf = floor(
      (coalesce(lit(1.0) / (col("lrank") + lit(c)), lit(0.0)) +
        coalesce(lit(1.0) / (col("drank") + lit(c)), lit(0.0))) * 1e9 + 0.5
    ) / 1e9
    val wf = Window.orderBy(col("rrf").desc, col("doc_id").asc)
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lrank"), col("drank"), rrf.as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(wf))
  }

  /** Hard-negative mining for retriever training (the DPR/ANCE recipe):
    * the dense top-n candidates that the LEXICAL positives miss —
    * semantically close to the query (hard) yet outside the BM25 top-kPos
    * (assumed negative). These are exactly the examples a bi-encoder
    * needs to learn what "close but wrong" means; random negatives are
    * too easy. Both legs are bounded TakeOrderedAndProject lists, so the
    * anti join and final cut are constant-sized at any corpus scale.
    */
  def hardNegatives(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                    queryVecId: Long, kPos: Int = 10, n: Int = 50,
                    kNeg: Int = 10): DataFrame = {
    val pos = TextOps.bm25(docs, terms)
      .where(col("doc_id") =!= queryVecId)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(kPos)
      .select(col("doc_id"))
    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val cand = emb.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        VectorOps.cosine6(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(n)
    val w = Window.orderBy(col("cos").desc, col("doc_id").asc)
    cand.join(broadcast(pos), Seq("doc_id"), "left_anti")
      .orderBy(col("cos").desc, col("doc_id").asc).limit(kNeg)
      .withColumn("rank", row_number().over(w))
  }

  /** Retrieval-quality audit: per-query recall@k and reciprocal rank of
    * an APPROXIMATE neighbor list against the EXACT one — the
    * index-quality monitor an ANN deployment runs after each ingest (and
    * the quantitative answer to "what did IVF pruning cost?"). Inputs
    * are (query_id, neighbor_id, rank) relations; the exact top-k is the
    * relevant set; rr = 1/rank of the first relevant hit in the approx
    * list (0 when none). Two equi-joins + one aggregate over the tiny
    * ranked lists — never touches the embeddings themselves.
    */
  def retrievalEval(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val rel = exact.where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .join(rel, Seq("query_id", "neighbor_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hit"), min(col("rank")).as("first_hit"))
    rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (floor(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_rel") * 1e6 + 0.5) / 1e6).as("recall"),
        (floor(coalesce(lit(1.0) / col("first_hit"), lit(0.0)) * 1e6 + 0.5)
          / 1e6).as("rr"))
  }
}
