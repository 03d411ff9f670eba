package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash of an `array<long>` of token hashes as a native
  * codegen'd Catalyst expression.
  *
  * The declarative formulation (`DedupOps.simhash32Hof`) needs 32
  * interpreted `aggregate` higher-order functions — one pass over the
  * token array PER BIT, with boxed lambdas (Spark HOFs are
  * CodegenFallback). This expression makes ONE pass: per token, each of
  * the 32 bit-counters moves ±1; bit j of the result is set iff its
  * counter ends positive. Identical semantics (the ±1 sum is
  * order-independent integer arithmetic), ~32x less work on the dedup
  * ingest path. Null elements are skipped (token hashes are non-null by
  * construction).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) res |= 1L << j
      j += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val res = ctx.freshName("res")
      s"""
         |int[] $counts = new int[32];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < 32; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |    }
         |  }
         |}
         |long $res = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($counts[$j] > 0) $res |= 1L << $j;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
