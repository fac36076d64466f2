package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each of `numHashes` seeds,
  * the minimum md5 of `"<seed>|<shingle>"` over the group's shingles.
  *
  * Value-identical to `numHashes` separate `min(md5(concat(...)))`
  * aggregates — md5 hex strings compare lexicographically exactly as
  * their digest bytes compare unsigned — but evaluated in ONE pass with
  * a reused MessageDigest and raw 16-byte running minima; hex strings
  * materialize once per GROUP at eval, not once per row-and-seed.
  * Partial buffers merge element-wise (min), so map-side combine holds
  * and the shuffle carries numHashes × 16 bytes per doc.
  *
  * md5 (not xxhash) is deliberate: SURVEY §5 cross-engine determinism —
  * the DuckDB oracle recomputes the identical signature.
  */
case class MinhashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a STRING shingle argument, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(h => s"$h|".getBytes("UTF-8")).toArray

  @transient private lazy val md: MessageDigest = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](numHashes)

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val sh = child.eval(input).asInstanceOf[UTF8String]
    if (sh != null) {
      val shBytes = sh.getBytes
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(seedPrefixes(h))
        md.update(shBytes)
        val digest = md.digest()
        if (buf(h) == null || unsignedLess(digest, buf(h))) buf(h) = digest
        h += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var h = 0
    while (h < numHashes) {
      if (a(h) == null || (b(h) != null && unsignedLess(b(h), a(h)))) a(h) = b(h)
      h += 1
    }
    a
  }

  private val hexChars = "0123456789abcdef".toCharArray

  override def eval(buf: Array[Array[Byte]]): Any = {
    if (buf.exists(_ == null)) return null // empty group
    new GenericArrayData(buf.map { digest =>
      val out = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((digest(i) >> 4) & 0xf).toByte
        out(2 * i + 1) = hexChars(digest(i) & 0xf).toByte
        i += 1
      }
      UTF8String.fromBytes(out)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](numHashes * 17)
    var h = 0
    while (h < numHashes) {
      if (buf(h) != null) {
        out(h * 17) = 1
        System.arraycopy(buf(h), 0, out, h * 17 + 1, 16)
      }
      h += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](numHashes)
    var h = 0
    while (h < numHashes) {
      if (bytes(h * 17) == 1) {
        val d = new Array[Byte](16)
        System.arraycopy(bytes, h * 17 + 1, d, 0, 16)
        buf(h) = d
      }
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinhashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashAgg =
    copy(child = newChildren.head)
}

object MinhashAgg {
  /** Registration triple: SQL shape `graft_minhash(shingle, numHashes)`
    * with a literal hash count. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinhashAgg].getName, "graft_minhash"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_minhash takes (shingle, numHashes)")
      val n = args(1) match {
        case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException(
          "graft_minhash: numHashes must be a literal")
      }
      MinhashAgg(args.head, n).toAggregateExpression()
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def minhashAgg(sh: Column, numHashes: Int): Column =
    call_function("graft_minhash", sh, org.apache.spark.sql.functions.lit(numHashes))
}
