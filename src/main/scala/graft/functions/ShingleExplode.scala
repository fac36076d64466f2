package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting the DISTINCT word-`k`-shingles of a word array,
  * one output row per shingle.
  *
  * The `functions`-composed pipeline — `transform(sequence(...),
  * slice+concat_ws)` to build the array, `array_distinct`, then
  * `explode` — pays three interpreted higher-order passes and
  * materializes the full shingle array per row before the generate.
  * This generator produces shingles straight from the word array in one
  * pass (a LinkedHashSet dedupes in place), which is the shape the
  * MinHash/SimHash pipelines consume. Documents shorter than `k` words
  * emit their whole text as one shingle, like
  * [[TextFunctions.shingles]], so no row drops out of dedup.
  *
  * Semantics equal `explode(list_distinct(shingles))` — set equality is
  * what the DuckDB oracle relies on; downstream aggregates (min-hash,
  * bit votes, intersection counts) are order-independent.
  */
case class ShingleExplode(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires ARRAY<STRING>, got $other")
  }

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val words = child.eval(input).asInstanceOf[ArrayData]
    if (words == null) return Iterator.empty
    ShingleExplode.distinctShingles(words, k).asScala.iterator.map(s => InternalRow(s))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  private val space = UTF8String.fromString(" ")

  /** Distinct word-`k`-shingles in first-occurrence order — the single
    * implementation behind both [[ShingleExplode]] (row form) and
    * [[ShingleSet]] (array form), so the two registered SQL functions
    * cannot drift apart. */
  private[functions] def distinctShingles(
      words: ArrayData, k: Int): java.util.LinkedHashSet[UTF8String] = {
    val n = words.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = words.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(space, all: _*))
    } else {
      val buf = new Array[UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { buf(j) = words.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(space, buf: _*))
        i += 1
      }
    }
    out
  }

  /** Registration triple for `SparkSessionExtensions.injectFunction`.
    * SQL shape: `graft_shingles(words, k)` with `k` a literal. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[ShingleExplode].getName, "graft_shingles"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_shingles takes (words, k)")
      val k = args(1) match {
        case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException("graft_shingles: k must be a literal")
      }
      ShingleExplode(args.head, k)
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def shingleExplode(words: Column, k: Int): Column =
    call_function("graft_shingles", words, org.apache.spark.sql.functions.lit(k))
}
