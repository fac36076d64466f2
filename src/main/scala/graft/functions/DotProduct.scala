package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two double arrays.
  *
  * The `functions`-composed equivalent —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is semantically right
  * but higher-order lambdas are CodegenFallback: each row pays
  * interpreted evaluation plus an allocated intermediate array. This is
  * the case SURVEY §3 reserves for a custom Catalyst `Expression`:
  * built-ins can express the WHAT but not the tight loop. `doGenCode`
  * emits a primitive-only Java loop that whole-stage codegen inlines
  * into the surrounding stage (no allocation, no virtual calls).
  *
  * Accumulation is a sequential fold in array order — bit-identical to
  * the HOF form and to the DuckDB oracle's list_sum, so swapping this in
  * changes no query result.
  *
  * Reference analogue: the JIT-specialized kernels of
  * gpu-kernel-compiler/src/codegen.rs — Spark's codegen plays that role.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two ARRAY<DOUBLE> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  // nullable even for non-null inputs: mismatched lengths return NULL
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  // Null semantics mirror the documented-equivalent HOF form
  // (`aggregate(zip_with(a,b,_*_), 0.0, _+_)`): zip_with null-pads a
  // length mismatch and a null element poisons the sum, so both cases
  // return NULL here — a dimension mismatch from a data bug must not
  // produce a plausible-looking partial dot product.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(args.head, args(1))
    })

  /** Column-API entry point; resolves against the function registry, so
    * the session must be built with [[graft.GraftExtensions]]. */
  def dotp(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
