package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively, composed from built-ins with
  * cluster-scale plan shapes (SURVEY §2.2 notes the reference has only
  * equi/semi joins; these extend the engine's join taxonomy).
  */
object JoinOps {

  /** As-of join: for every left row, attach the payload of the LATEST right
    * row with the same keys and rightTime <= leftTime (inclusive).
    *
    * Plan shape (the scalable one): tag both sides, union, ONE shuffle by
    * key, one ordered window scan carrying the last non-null right payload
    * forward. No per-row range probe, no skew-prone theta join; cost is
    * sort + linear scan per key partition, which survives 100x scale-up.
    * At identical timestamps the right row sorts first, so equality is
    * inclusive (matches DuckDB/pandas ASOF semantics).
    *
    * `rightPayload` columns must not collide with left column names.
    * `how` = "inner" (drop left rows with no match) or "left".
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], how: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(how), s"unsupported how=$how")
    val leftOnly = left.columns.toSeq.filterNot(keys.contains)
    val pType = StructType(rightPayload.map(c => right.schema(c)))
    val payload = struct(rightPayload.map(col): _*)

    val lA = left.select(
      keys.map(col) ++
        Seq(col(leftTime).cast("timestamp").as("__t"), lit(1).as("__tag"),
          lit(null).cast(pType).as("__p")) ++
        leftOnly.map(col): _*)
    val rA = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("timestamp").as("__t"), lit(0).as("__tag"),
          payload.as("__p")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lA.unionByName(rA)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val matched = if (how == "inner") carried.where(col("__last").isNotNull) else carried
    val extracted = rightPayload.foldLeft(matched)(
      (df, c) => df.withColumn(c, col(s"__last.$c")))
    extracted.drop("__t", "__tag", "__p", "__last")
  }

  /** Range join of a fact column against a small interval dimension:
    * broadcast the intervals, nested-loop probe with the BETWEEN condition
    * evaluated in codegen. At scale the small side is always the interval
    * table, so this never shuffles the fact side.
    */
  def rangeJoin(facts: DataFrame, intervals: DataFrame,
                value: Column, lo: Column, hi: Column): DataFrame =
    facts.join(broadcast(intervals), value >= lo && value <= hi)
}
