package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Array-returning sibling of [[ShingleExplode]]: the DISTINCT word-
  * `k`-shingles of a word array as one `ARRAY<STRING>` value — the form
  * the Jaccard set-intersection join consumes. Replaces the composed
  * `array_distinct(transform(sequence, slice+concat_ws))` pipeline
  * (three interpreted higher-order passes) with a single pass.
  * Set equality with the composed form is what the oracle relies on;
  * output order is first-occurrence, which downstream set operations
  * ignore.
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_set requires ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override def nullSafeEval(wordsValue: Any): Any = {
    val words = wordsValue.asInstanceOf[ArrayData]
    new GenericArrayData(
      ShingleExplode.distinctShingles(words, k).toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  /** Registration triple: SQL shape `graft_shingle_set(words, k)`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingle_set"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_shingle_set takes (words, k)")
      val k = args(1) match {
        case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_shingle_set: k must be a literal")
      }
      ShingleSet(args.head, k)
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def shingleSet(words: Column, k: Int): Column =
    call_function("graft_shingle_set", words, org.apache.spark.sql.functions.lit(k))
}
