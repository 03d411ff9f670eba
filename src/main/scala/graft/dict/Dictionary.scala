package graft.dict

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed string<->id dictionary.
  *
  * Re-expresses the reference's dictionary (graphula
  * `core/src/main/scala/com/graphula/dictionary/Dictionary.scala:34-211`):
  * id = xxhash64(bytes) & Long.MaxValue (forced non-negative), with a
  * collision-escape path for the rare strings whose hashes collide.
  *
  * Spark-first design, built for 100 TB:
  *   - ids are content-derived (`xxhash64`, a codegen'd built-in), so two
  *     independent encode jobs agree on ids without coordination — no global
  *     sequence, no driver bottleneck, encode is embarrassingly parallel.
  *   - THE FAST PATH IS A PURE EXPRESSION: once `collisionFree` certifies the
  *     term universe (one aggregate pass), `encode` is just
  *     `xxhash64(col) & MaxValue` — a projection inside whole-stage codegen,
  *     no join, no shuffle. At 10^10 distinct terms the probability of any
  *     63-bit collision is small but not zero; the certificate makes relying
  *     on it sound instead of hopeful.
  *   - collision repair (rare path) ranks ONLY the colliding hash groups —
  *     never a window over the full dictionary.
  *   - decode is a join against the dictionary on demand — the analog of the
  *     reference's lazy per-variable decode (`LazyBinding.scala:22-28`):
  *     only SELECTed output columns ever pay for it, and `decodeAll` pays a
  *     single dictionary pass for any number of output columns.
  */
object Dictionary {

  /** Non-negative xxhash64 of a string column — the id function (D4). */
  def termHash(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(Long.MaxValue))

  /** Expression-based encode (D1 fast path): replace string columns with
    * their content-derived ids in one codegen'd projection. Sound whenever
    * the term universe passed `collisionFree`.
    */
  def encodeByHash(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, termHash(col(c))))

  /** One aggregate pass certifying that no two distinct terms share a hash
    * (the analog of the reference's collision-exception table being empty).
    * `terms` = any single-string-column DataFrame.
    *
    * Screening pass shuffles only small fixed-width check tuples — map-side
    * partial aggregation collapses duplicates before the exchange, and no
    * strings ever cross the wire. The check value pairs the 32-bit murmur3
    * with an INDEPENDENTLY-seeded xxhash64 (the seed literal changes the
    * input stream), so a false negative needs one term pair to collide on
    * the 63-bit id hash AND both check hashes simultaneously: ~2^-159 per
    * pair — below any realistic term universe (at 10^12 distinct terms,
    * ~10^24 pairs, the aggregate false-negative probability is ~2^-79).
    * The certificate is therefore probabilistic but with margin far beyond
    * hardware error rates; a suspect group (>1 distinct check value under
    * one id hash) still triggers the exact string-level re-verification, so
    * positives are always confirmed exactly.
    */
  def collisionFree(terms: DataFrame,
                    hashExpr: Column => Column = termHash): Boolean = {
    val col0 = terms.columns.head
    val t = terms.select(col(col0).cast("string").as("term"))
      .where(col("term").isNotNull)
    val checkHash = struct(hash(col("term")),
      xxhash64(lit(-7046029254386353131L), col("term")))
    val suspects = t
      .groupBy(hashExpr(col("term")).as("h"))
      .agg(countDistinct(checkHash).as("n"))
      .where(col("n") > 1).limit(1).count()
    if (suspects == 0L) return true
    // exact fallback: string-level distinct over the (rare) suspect case
    t.distinct()
      .groupBy(hashExpr(col("term")).as("h"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(1).count() == 0L
  }

  /** Ids of literal terms without touching any table — driver-side, no
    * job (`termHashLocal` is the same xxhash64 Catalyst computes). Valid
    * under the same collision-free certificate as `encodeByHash`.
    */
  def hashLiterals(spark: SparkSession, terms: Seq[String]): Map[String, Long] =
    terms.iterator.map(t => t -> termHashLocal(t)).toMap

  /** Build a dictionary `(id: Long, term: String)` from a single-string-column
    * DataFrame (D1). Fast path: no collisions -> id = hash, one distinct plus
    * one certifying aggregate. Rare path: deterministic repair over only the
    * colliding groups — collision losers (ordered by term) get `hash + rank`
    * probe ids, re-checked against the claimed-id set so the result is
    * collision-free regardless of hash quality. `hashExpr` is injectable for
    * tests (the reference forces collisions with a `hash % 10`
    * "terribleHasher"; we do the same).
    */
  def build(terms: DataFrame, hashExpr: Column => Column = termHash): DataFrame = {
    val col0 = terms.columns.head
    // Materialize the distinct term set once (eager local checkpoint): the
    // certificate aggregate, any repair rounds, and every downstream
    // encode/decode read the materialized set instead of re-shuffling the
    // raw term stream. At ingest scale this is the dictionary table write.
    val base = terms.select(col(col0).cast("string").as("term"))
      .where(col("term").isNotNull).distinct()
      .withColumn("h", hashExpr(col("term")))
      .localCheckpoint(true)
    val collidedHashes = base.groupBy("h").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).select("h")
    if (collidedHashes.limit(1).count() == 0L)
      return base.select(col("h").as("id"), col("term"))

    // Rare path: rank within each colliding hash group; rank 1 keeps the
    // hash as id, losers probe. The window runs over ONLY colliding groups.
    val clean = base.join(collidedHashes, Seq("h"), "left_anti")
      .select(col("h").as("id"), col("term"), lit(false).as("escaped"))
    val w = Window.partitionBy("h").orderBy("term")
    val dirty = base.join(collidedHashes, Seq("h"), "left_semi")
      .withColumn("rk", row_number().over(w))
      .withColumn("id", when(col("rk") === 1, col("h"))
        .otherwise(pmod(col("h") + col("rk"), lit(Long.MaxValue))))
      .select(col("id"), col("term"), (col("rk") > 1).as("escaped"))
    var dict = clean.unionAll(dirty)
    // Probe loop: an escape id may itself collide with a claimed id.
    // Each round re-ranks only the still-colliding ids; with a sane hash
    // this loop body never runs (guarded by a cheap count over a tiny set).
    var rounds = 0
    var clashes = clashCount(dict)
    while (clashes > 0 && rounds < 64) {
      val w2 = Window.partitionBy("id").orderBy("term")
      dict = dict
        .withColumn("rk", row_number().over(w2))
        .withColumn("id", when(col("rk") === 1, col("id"))
          .otherwise(pmod(col("id") + lit(1L << (rounds + 20)) + col("rk"), lit(Long.MaxValue))))
        .select(col("id"), col("term"), (col("escaped") || col("rk") > 1).as("escaped"))
      dict = dict.localCheckpoint(true) // cut lineage; loop is bounded + rare
      clashes = clashCount(dict)
      rounds += 1
    }
    dict.select("id", "term")
  }

  private def clashCount(dict: DataFrame): Long =
    dict.groupBy("id").count().where(col("count") > 1).limit(1).count()

  /** Encode: replace string column `c` with its dictionary id via join
    * (D1/D2 general path — needed only when the dictionary carries escaped
    * ids). Inner join: terms absent from the dictionary drop out, which is
    * the analog of the reference's dictionary-miss fail-fast (id 0 -> empty).
    */
  def encode(df: DataFrame, dict: DataFrame, c: String): DataFrame = {
    val d = dict.select(col("term").as(s"__t_$c"), col("id").as(s"__id_$c"))
    df.join(d, df(c) === d(s"__t_$c"), "inner")
      .drop(c, s"__t_$c")
      .withColumnRenamed(s"__id_$c", c)
  }

  /** Decode: replace id column `c` with its term (D3). Ids with no entry
    * render as `_:<id>` — the reference's blank-node convention
    * (`Dictionary.scala:103-118`).
    */
  def decode(df: DataFrame, dict: DataFrame, c: String): DataFrame = {
    val d = dict.select(col("id").as(s"__i_$c"), col("term").as(s"__term_$c"))
    df.join(d, df(c) === d(s"__i_$c"), "left")
      .withColumn(s"__term_$c",
        coalesce(col(s"__term_$c"), concat(lit("_:"), col(c).cast("string"))))
      .drop(c, s"__i_$c")
      .withColumnRenamed(s"__term_$c", c)
  }

  /** Decode several id columns of a small-result DataFrame with ONE pass
    * over the dictionary: semi-filter the dictionary down to the ids that
    * actually appear (the reference's lazy-decode discipline — only
    * projected variables pay, `LazyBinding.scala:22-28`), pin the slim
    * mapping with an eager local checkpoint, then broadcast-join per column.
    */
  def decodeAll(df: DataFrame, dict: DataFrame, cols: Seq[String]): DataFrame = {
    val ids = cols.map(c => df.select(col(c).cast("long").as("id")))
      .reduce(_.unionAll(_)).distinct()
    // dedup AFTER the semi filter, on the |appearing-ids|-sized slim
    // mapping: callers may pass a union of overlapping dictionaries
    // (snapshot diff decodes removed-only terms through before+after),
    // and deduping the full union first would shuffle |dict| rows to
    // serve a |delta|-sized decode. Overlapping entries are identical
    // (id, term) pairs along an update chain, so the pick is stable.
    val slim = dict.join(ids, Seq("id"), "left_semi")
      .dropDuplicates("id").localCheckpoint(true)
    cols.foldLeft(df)((d, c) => decode(d, broadcast(slim), c))
  }

  /** Driver-side point lookup (D2): ids for a small set of query constants.
    * Returns only the terms present; a missing term means the query can be
    * failed fast (reference: `GraphulaStageGenerator.scala:107-110`).
    */
  def lookup(dict: DataFrame, terms: Seq[String]): Map[String, Long] = {
    if (terms.isEmpty) return Map.empty
    dict.where(col("term").isin(terms: _*))
      .select("term", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** One dictionary scan answering, for a small driver-side term set on a
    * CERTIFIED (pure-hash) store, both membership and hash-claim safety:
    * which terms are present, and whether any term's content hash is
    * claimed by a DIFFERENT term — the one case where expression-encoded
    * constants would alias a store term (so callers must fall back to the
    * string path). Returns (present terms, clash?).
    */
  def probeClaims(spark: SparkSession, dict: DataFrame, terms: Seq[String])
      : (Set[String], Boolean) = {
    if (terms.isEmpty) return (Set.empty, false)
    import spark.implicits._
    // hash through the same codegen'd expression the store encode uses
    // (driver-side local relation — Catalyst folds it without a job)
    val probe = terms.toDF("pterm")
      .select(termHash(col("pterm")).as("hid"), col("pterm"))
    val hits = dict.join(broadcast(probe), col("id") === col("hid"))
      .select(col("pterm"), col("term")).collect()
    (hits.filter(r => r.getString(0) == r.getString(1)).map(_.getString(0)).toSet,
      hits.exists(r => r.getString(0) != r.getString(1)))
  }

  /** Driver-side twin of `termHash`: the EXACT xxhash64(seed 42) Catalyst
    * evaluates, called through Spark's own hash function so locally
    * computed ids agree with expression-encoded ids bit-for-bit (spec'd
    * in DictionarySpec). Hashing a handful of constants must not cost a
    * Spark action — an update script hashes a few strings per op, and
    * even a local-relation collect pays ~0.1-0.3 s of plan/codegen cycle.
    */
  def termHashLocal(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L) & Long.MaxValue

  /** Driver-side term→id map for a small term set — `termHashLocal`
    * applied in a plain loop (no job, no plan).
    */
  def hashTerms(spark: SparkSession, terms: Seq[String]): Map[String, Long] =
    terms.iterator.map(t => t -> termHashLocal(t)).toMap
}
