package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native left-to-right dot product over two `array<double>` columns — a
  * custom Catalyst `Expression` with whole-stage codegen.
  *
  * The similarity family (cosine kNN, hyperplane LSH, k-means assignment)
  * computes thousands of 64-dim dot products per row; the portable
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates
  * higher-order lambdas interpreted, one closure call per element. This
  * expression emits a tight primitive loop instead — SAME accumulation
  * order (sequential adds, i = 0..n-1), so results stay bit-identical to
  * the lambda form and to the DuckDB oracle's `list_reduce` twin
  * ([[graft.queries.Q]] determinism contract), just ~an order of magnitude
  * cheaper per row.
  */
case class DotD(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on null input, null element, or length mismatch — EXACTLY the
  // null-poisoning of `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (zip_with
  // pads the shorter side with null), so [[RewriteDotProduct]] is a pure
  // plan substitution.
  override def nullable: Boolean = true

  override def prettyName: String = "dotd"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dotd requires two array<double> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotD =
    copy(left = newLeft, right = newRight)
}

object DotD {

  /** Register `dotd` in the session's function registry (idempotent; also
    * wired through [[GraftExtensions]] for the SQL surface).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("dotd"),
      new ExpressionInfo(classOf[DotD].getName, "dotd"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dotd takes exactly two arguments")
        DotD(children.head, children(1))
      })

  /** Column-level entry point; requires [[register]] (or GraftExtensions). */
  def dotd(a: Column, b: Column): Column = call_function("dotd", a, b)
}
