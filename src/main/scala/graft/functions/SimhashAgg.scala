package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash aggregate over md5-hex feature hashes.
  *
  * The `functions`-composed form — 64 separate `sum(CASE substring(h,d,1)
  * IN (...))` aggregates — re-reads every input row 64 times (one
  * substring + set probe per bit). This aggregate parses the 16 hex
  * digits ONCE per row and updates all 64 vote counters in a primitive
  * int array: same votes, 1/64th of the string work. Partial buffers
  * merge by element-wise addition, so map-side combine still applies and
  * the shuffle carries one 64-int buffer per group.
  *
  * Bit semantics (identical to the DuckDB oracle): bit `i` lives in hex
  * digit `i/4` at in-digit position `i%4` (MSB first); a set bit votes
  * +1, a clear bit −1; the result is the 64-char '1'/'0' string of
  * vote-sum > 0. A NULL input row votes −1 on all 64 bits — exactly what
  * the composed form does (CASE over a NULL substring falls to ELSE), so
  * the vote-for-vote equivalence holds on nullable inputs too.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a STRING (md5 hex) argument, got $other")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val h = child.eval(input).asInstanceOf[UTF8String]
    if (h == null) {
      // identical to the composed form: CASE substring(NULL,d,1) IN (...)
      // falls to ELSE, so a NULL hash votes -1 on every bit
      var i = 0
      while (i < 64) { buf(i) -= 1; i += 1 }
    } else {
      val bytes = h.getBytes
      var d = 0
      while (d < 16) {
        // identical to the composed `substring(h,d,1) IN (bit set)` form:
        // a missing or non-hex digit is "not in set" → every bit votes -1
        val v = if (d < bytes.length) hexVal(bytes(d)) else -1
        val base = d * 4
        if (v >= 0) {
          buf(base) += (if ((v & 8) != 0) 1 else -1)
          buf(base + 1) += (if ((v & 4) != 0) 1 else -1)
          buf(base + 2) += (if ((v & 2) != 0) 1 else -1)
          buf(base + 3) += (if ((v & 1) != 0) 1 else -1)
        } else {
          buf(base) -= 1; buf(base + 1) -= 1; buf(base + 2) -= 1; buf(base + 3) -= 1
        }
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      out(i) = if (buf(i) > 0) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimhashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_simhash takes exactly 1 argument")
      SimhashAgg(args.head).toAggregateExpression()
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def simhashAgg(h: Column): Column = call_function("graft_simhash", h)
}
