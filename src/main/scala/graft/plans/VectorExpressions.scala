package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two numeric vectors (array<float> or
  * array<double> on either side) — SURVEY.md §2.K's "codegen Expression"
  * row, justified by profiling: the higher-order `aggregate(zip_with(...))`
  * formulation is interpreted per row (no whole-stage codegen for lambda
  * functions) and dominated the similarity benchmarks (~155 s of a 250 s
  * sf0.1 run). This expression generates a tight Java loop inside the
  * WholeStageCodegen stage instead.
  *
  * Accumulation order is the same sequential left-to-right fold as the HOF
  * formulation and DuckDB's list loops, so §7.2 float parity is preserved.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType(left).isDefined && elemType(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def get(d: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => d.getFloat(i).toDouble
    case _         => d.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, tx, i) * get(y, ty, i)
      i += 1
    }
    acc
  }

  private def genGet(v: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _         => s"$v.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val (tx, ty) = (elemType(left).get, elemType(right).get)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(a, tx, i)} * ${genGet(b, ty, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Make `vec_dot` callable from expr()/SQL in this session. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", args => FloatVecDot(args(0), args(1)), "built-in")
}

/** SparkSessionExtensions entry point — the idiomatic deployment path:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * injects the engine's native expressions into every session at build time
  * (no per-query register() call needed on a cluster).
  */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
}
