package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of words contained in a FIXED stopword set — the hot inner
  * loop of language-ID and quality scoring (t01/t02 run it 5×/1× per
  * row).
  *
  * The composed form `size(filter(words, w -> w IN (...)))` pays an
  * interpreted lambda per element plus a linear IN-list scan per word.
  * This expression holds the stopword set in a shared java HashSet
  * (attached to the generated class via a codegen reference) and emits a
  * primitive counting loop — O(1) membership, no lambda, stays inside
  * whole-stage codegen.
  *
  * Results are identical to the composed form; the DuckDB oracle twin
  * (TextFunctions.sqlStopwordHits) is unchanged.
  */
case class StopwordHits(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_hits requires ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_stopword_hits"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(wordsValue: Any): Any = {
    val words = wordsValue.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (stopSet.contains(words.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, words => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $words.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($setRef.contains($words.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  /** Registration triple: SQL shape
    * `graft_stopword_hits(words, array('the', 'a', ...))` with a
    * foldable stopword array. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_stopword_hits"),
    new ExpressionInfo(classOf[StopwordHits].getName, "graft_stopword_hits"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_stopword_hits takes (words, stopwords)")
      val stop = args(1) match {
        case e if e.foldable =>
          e.eval(null).asInstanceOf[ArrayData].toArray[UTF8String](StringType)
            .map(_.toString).toSeq
        case _ => throw new IllegalArgumentException(
          "graft_stopword_hits: stopwords must be a literal array")
      }
      StopwordHits(args.head, stop)
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def stopwordHits(words: Column, stop: Seq[String]): Column =
    call_function("graft_stopword_hits", words, array(stop.map(lit): _*))
}
