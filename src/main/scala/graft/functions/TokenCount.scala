package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Split-free token counting: ONE pass over the UTF-8 BYTES, no regex
  * engine, no `UTF8String → String` copy, no per-token allocation — the
  * t03 hot loop (round-13 verdict item 7: at sf10 the two
  * [[RegexpCount]] matchers were the suite's 4th-largest entry, and a
  * matcher still pays a full decoded-string copy per row plus
  * backtracking bookkeeping per token).
  *
  * Two modes, each value-identical to the regex it replaces (pinned by
  * RegexpCountSpec on the corpus AND on adversarial unicode):
  *
  *  - `ws`: matches of `\S+` — maximal runs of bytes outside Java
  *    `\s` = `[ \t\n\x0B\f\r]`. Those six chars are single-byte ASCII
  *    and UTF-8 continuation bytes are ≥ 0x80, so a byte-level run of
  *    non-ws bytes IS a char-level run of non-ws chars (unicode
  *    whitespace like U+00A0 is `\S` under Java's default regex
  *    flags, and its bytes are all ≥ 0x80 — non-ws here too).
  *  - `bpe`: matches of `[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r\x0B]` over
  *    ALREADY-LOWERCASED text ([[TextFunctions.BpePattern]]) — letter
  *    runs + digit runs + one per other non-ws CODE POINT. The classes
  *    `[a-z]`/`[0-9]`/ws are single-byte ASCII, so classifying each
  *    code point by its START byte (continuation bytes skipped) is
  *    exact; a letter run broken by a digit (or vice versa) starts a
  *    new match exactly as the regex alternation does.
  *
  * The caller keeps the same composition as the regex form
  * (`lower(...)` outside for bpe), so the DuckDB oracle twins
  * (TextFunctions.sqlWsTokenCount / sqlBpeTokenCount) are unchanged.
  */
case class TokenCount(child: Expression, mode: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if TokenCount.Modes.contains(mode) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count mode must be one of ${TokenCount.Modes.mkString("/")}, got '$mode'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count requires STRING, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  private val bpe = mode == "bpe"

  override def nullSafeEval(textValue: Any): Any =
    TokenCount.count(textValue.asInstanceOf[UTF8String], bpe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TokenCount.count($text, $bpe);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  val Modes: Set[String] = Set("ws", "bpe")

  /** Shared by interpreted eval and the generated code (a static call
    * stays inside whole-stage codegen — the StopwordHits discipline). */
  def count(s: UTF8String, bpe: Boolean): Int = {
    val n = s.numBytes
    var cnt = 0
    var i = 0
    if (!bpe) {
      var inRun = false
      while (i < n) {
        val b = s.getByte(i) & 0xff
        val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
        if (!ws && !inRun) cnt += 1
        inRun = !ws
        i += 1
      }
    } else {
      var prev = 0 // 0 = ws, 1 = [a-z] run, 2 = [0-9] run, 3 = other
      while (i < n) {
        val b = s.getByte(i) & 0xff
        if ((b & 0xc0) != 0x80) { // code-point start byte
          val cls =
            if (b >= 'a' && b <= 'z') 1
            else if (b >= '0' && b <= '9') 2
            else if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) 0
            else 3
          if (cls == 3) cnt += 1
          else if (cls != 0 && cls != prev) cnt += 1
          prev = cls
        }
        i += 1
      }
    }
    cnt
  }

  /** Registration triple: SQL shape `graft_token_count(text, 'ws')`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_count"),
    new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_token_count takes (text, mode)")
      val mode = args(1) match {
        // `e.eval(null) != null` guards CAST(NULL AS STRING): foldable and
        // string-typed, but folding to null — fall through to the clean error.
        case e if e.foldable && e.dataType == StringType && e.eval(null) != null =>
          e.eval(null).toString
        case _ => throw new IllegalArgumentException(
          "graft_token_count: mode must be a string literal")
      }
      TokenCount(args.head, mode)
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def tokenCount(text: Column, mode: String): Column =
    call_function("graft_token_count", text, lit(mode))
}
