package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bgp.PredStats
import graft.dict.Dictionary

/** Ingested store handle: the analog of the reference's opened LMDB
  * environment (`Graphula.scala:34-48`). The reference ingests N-Triples
  * once and answers every query from the persisted index; likewise this
  * handle materializes, once per (session, dir):
  *   - the string triple relation (eager local checkpoint),
  *   - the hash-encoded triple relation + its collision certificate,
  *   - per-predicate statistics (the `Index.valueCount` analog) for
  *     greedy BGP ordering and zero-cardinality fail-fast.
  * On a cluster these are parquet tables written by an ingest job; here
  * they are checkpointed in-session because the driver gate is
  * self-contained per process.
  */
final case class StoreHandle(triples: DataFrame, enc: DataFrame,
                             pureHash: Boolean, stats: Map[String, PredStats],
                             encStats: Map[String, PredStats], totalCnt: Long)

object GraftStore {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), StoreHandle]

  def forDir(spark: SparkSession, sfDir: String): StoreHandle =
    cache.getOrElseUpdate((spark, sfDir), ingest(spark, sfDir))

  private def ingest(spark: SparkSession, sfDir: String): StoreHandle = {
    val triples = TripleStore.tableTriples(spark, sfDir, exploded = true)
      .localCheckpoint(true)
    val terms = triples.select(explode(array(col("s"), col("p"), col("o"))).as("term"))
    val pureHash = Dictionary.collisionFree(terms)
    val enc = (
      if (pureHash) Dictionary.encodeByHash(triples, Seq("s", "p", "o"))
      else {
        val dict = Dictionary.build(terms)
        Seq("s", "p", "o").foldLeft(triples)((df, c) => Dictionary.encode(df, dict, c))
      }
    ).localCheckpoint(true)
    val statRows = TripleStore.predicateStats(triples).collect()
    val stats = statRows.map(r =>
      r.getString(0) -> PredStats(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // same stats keyed by encoded predicate id (as string), for BGPs over
    // the encoded relation; sound on the pure-hash path
    val predIds = Dictionary.hashLiterals(spark, stats.keys.toSeq)
    val encStats =
      if (pureHash) stats.map { case (k, v) => predIds(k).toString -> v }
      else Map.empty[String, PredStats]
    StoreHandle(triples, enc, pureHash, stats, encStats, stats.values.map(_.cnt).sum)
  }

  private val gramCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Shared word-3-gram sets of the documents table, materialized once per
    * (session, dir) — the dedup family's common ingest artifact.
    */
  def docGrams(spark: SparkSession, sfDir: String): DataFrame =
    gramCache.getOrElseUpdate((spark, sfDir),
      graft.ops.DedupOps.gramSets(graft.Tables.loadPar(spark, sfDir, "documents")))

  /** Test hook: drop cached handles (e.g. between suites). */
  def invalidate(): Unit = { cache.clear(); gramCache.clear() }
}
