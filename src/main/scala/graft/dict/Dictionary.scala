package graft.dict

import org.apache.spark.sql.{Column, DataFrame}
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
  *   - collision repair is a window function over ONLY the colliding hash
  *     groups (expected a handful even at 10^10 distinct terms), so the
  *     skew-free common path never shuffles more than a distinct().
  *   - decode is a join against the dictionary on demand — the analog of the
  *     reference's lazy per-variable decode (`LazyBinding.scala:22-28`):
  *     only SELECTed output columns ever pay for it.
  */
object Dictionary {

  /** Non-negative xxhash64 of a string column — the id function (D4). */
  def termHash(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(Long.MaxValue))

  /** Build a dictionary `(id: Long, term: String)` from a single-string-column
    * DataFrame (D1). Deterministic: collision losers (ordered by term) get
    * `hash + rank` probe ids, re-checked against the claimed-id set so the
    * result is collision-free regardless of hash quality. `hashExpr` is
    * injectable for tests (the reference forces collisions with a
    * `hash % 10` "terribleHasher"; we do the same).
    */
  def build(terms: DataFrame, hashExpr: Column => Column = termHash): DataFrame = {
    val col0 = terms.columns.head
    val base = terms.select(col(col0).cast("string").as("term"))
      .where(col("term").isNotNull).distinct()
      .withColumn("h", hashExpr(col("term")))
    // rank within each colliding hash group; rank 1 keeps the hash as id
    val w = Window.partitionBy("h").orderBy("term")
    var dict = base
      .withColumn("rk", row_number().over(w))
      .withColumn("id", when(col("rk") === 1, col("h"))
        .otherwise(pmod(col("h") + col("rk"), lit(Long.MaxValue))))
      .select(col("id"), col("term"), (col("rk") > 1).as("escaped"))
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

  /** Encode: replace string column `c` with its dictionary id (D1/D2).
    * Inner join: terms absent from the dictionary drop out, which is the
    * analog of the reference's dictionary-miss fail-fast (id 0 -> empty).
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
}
