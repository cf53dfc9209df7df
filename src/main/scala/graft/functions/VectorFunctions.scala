package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity-search hot loop.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * materializes a 64-element intermediate array per pair and evaluates the
  * lambda through interpreted HOF plumbing — at millions of candidate pairs
  * that allocation dominates the runtime. This expression generates a tight
  * primitive loop over the two `ArrayData` buffers inside whole-stage codegen:
  * no allocation, no virtual calls per element.
  *
  * Summation is sequential left-to-right, matching both the HOF formulation
  * it replaces and DuckDB's list_sum, so oracle results are unchanged.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_arrays expects two array<double> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** Register `dot_arrays` in the session's function registry (idempotent) so
    * it is usable from both the Column API (via `expr`) and SQL text.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_arrays",
      exprs => ArrayDotProduct(exprs(0), exprs(1)),
      "built-in")

  /** Dot product of two array<double> columns (names or expressions). */
  def dotArrays(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"dot_arrays($a, $b)")
  }
}
