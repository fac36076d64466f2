package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping matches of a FIXED regex — the token-count
  * inner loop (t03/p01/p02 run it 1-2× per row over full document
  * text).
  *
  * The composed form `size(regexp_extract_all(text, pat, 0))` counts by
  * MATERIALIZING every match: one UTF8String copy per token plus one
  * ArrayData per row, allocated only to be thrown away by `size` —
  * millions of dead allocations per corpus scan (GC pressure is exactly
  * what the 100 TB profile can't afford on a text pipeline's hottest
  * map stage). This expression runs the same `Matcher.find()` loop and
  * just counts, allocating nothing per match; the compiled Pattern is
  * attached to the generated class via a codegen reference, and the
  * loop stays inside whole-stage codegen.
  *
  * Match semantics are identical to `regexp_extract_all(_, pat, 0)`
  * (both are successive `Matcher.find()` calls — same non-overlapping
  * greedy scan), so the DuckDB oracle twin
  * (`len(regexp_extract_all(...))`, TextFunctions) is unchanged.
  */
case class RegexpCount(child: Expression, pattern: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_regexp_count requires STRING, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_regexp_count"

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(textValue: Any): Any = {
    val m = compiled.matcher(textValue.asInstanceOf[UTF8String].toString)
    var cnt = 0
    while (m.find()) cnt += 1
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, text => {
      val m = ctx.freshName("matcher")
      val cnt = ctx.freshName("cnt")
      s"""
         |java.util.regex.Matcher $m = $patRef.matcher($text.toString());
         |int $cnt = 0;
         |while ($m.find()) $cnt++;
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpCount =
    copy(child = newChild)
}

object RegexpCount {
  /** Registration triple: SQL shape `graft_regexp_count(text, 'pat')`
    * with a foldable pattern. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_regexp_count"),
    new ExpressionInfo(classOf[RegexpCount].getName, "graft_regexp_count"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_regexp_count takes (text, pattern)")
      val pat = args(1) match {
        case e if e.foldable && e.dataType == StringType =>
          e.eval(null).asInstanceOf[UTF8String].toString
        case _ => throw new IllegalArgumentException(
          "graft_regexp_count: pattern must be a literal string")
      }
      RegexpCount(args.head, pat)
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def regexpCount(text: Column, pattern: String): Column =
    call_function("graft_regexp_count", text,
      org.apache.spark.sql.functions.lit(pattern))
}
