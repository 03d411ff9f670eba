package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression:
  * `graft_bloom_contains(filterBytes, hash)` is true iff the serialized
  * `BloomFilter` (a foldable binary literal — built driver-side with
  * `Dataset.stat.bloomFilter`, a few MB regardless of corpus size) might
  * contain the long hash. The filter deserializes ONCE per executor
  * (transient lazy, shipped inside the codegen reference array — the
  * same mechanics Spark's own runtime-filter injection uses) and each
  * probe is a handful of bit tests, so a 100 TB corpus side streams
  * through the filter with no join, no shuffle, and no broadcast-hash
  * build. Callers pair it with an exact verification join over the
  * (tiny) surviving slice, so false positives never reach the output.
  */
case class BloomMightContain(filterExpr: Expression, child: Expression)
    extends BinaryExpression {

  override def left: Expression = filterExpr
  override def right: Expression = child
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (filterExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains filter must be binary, got ${filterExpr.dataType.simpleString}")
    else if (!filterExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains filter must be a literal (foldable)")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains value must be bigint, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(f: Any, v: Any): Any =
    mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(filterExpr = newLeft, child = newRight)
}
