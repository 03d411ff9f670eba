package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles. When one join/group key carries a large
  * fraction of rows, a plain hash shuffle sends that key's rows to one
  * task. Salting splits the hot key across `salts` sub-keys: the big side
  * gets a deterministic salt derived from a high-cardinality column, the
  * small side is replicated once per salt value — result identical to the
  * unsalted join, but the hot partition shrinks by ~salts.
  * (AQE's skew-join handles sort-merge cases automatically; salting is
  * the explicit tool for aggregate skew and broadcast-averse shapes.)
  */
object SkewOps {

  /** Salted inner equi-join on `keys`: `big` rows are salted by hashing
    * `saltBy` (any per-row expression, e.g. a unique id), `small` is
    * replicated `salts` times.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Caller
    * supplies the two aggregation column lists; the classic example is
    * sum-of-partial-sums / sum-of-partial-counts.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBy: Column, salts: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
}
