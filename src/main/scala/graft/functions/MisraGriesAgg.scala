package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Weighted Misra-Gries heavy-hitters sketch as a mergeable
  * TypedImperativeAggregate: `graft_heavy_hitters(item, weight, k)`
  * returns a MAP<STRING,BIGINT> of at most `k` retained items with
  * UNDER-estimates of their weighted frequencies.
  *
  * Guarantees (Misra-Gries 1982; merged form Agarwal et al., "Mergeable
  * summaries", PODS 2012): with total stream weight N,
  *   - est(x) <= true(x) <= est(x) + N/(k+1) for every item, and
  *   - every item with true(x) > N/(k+1) is retained —
  * and both survive ARBITRARY merge trees, so map-side partial sketches
  * combine through the normal two-phase aggregate and the shuffle
  * carries one <=k-entry buffer per group instead of the item
  * vocabulary. That is the point at 100 TB: frequent-item detection
  * with O(k) state per task where an exact groupBy would shuffle every
  * distinct item.
  *
  * Update treats each row as a singleton merge (add weight; if the
  * sketch overflows k entries, subtract the (k+1)-th largest counter
  * from all and drop the non-positive — for a single overflowing
  * insert that is the classic decrement-all step). The retained SET
  * and its guarantees are merge-order-independent; retained VALUES are
  * not, so queries must consume the sketch through guarantee-backed
  * verdicts (t18's shape), never by hashing raw estimates.
  */
case class MisraGriesAgg(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (StringType, LongType | IntegerType) =>
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("graft_heavy_hitters needs k >= 1")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters requires (STRING item, INT/BIGINT weight), got $other")
    }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Subtract the (k+1)-th largest counter from all and drop the
    * non-positive; no-op while the sketch fits. */
  private def trim(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size() <= k) return
    val vals = new Array[Long](buf.size())
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val dec = vals(vals.length - (k + 1)) // (k+1)-th largest
    val entries = buf.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      val v = e.getValue - dec
      if (v <= 0) entries.remove() else e.setValue(v)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val item = child.eval(input).asInstanceOf[UTF8String]
    val w = weight.eval(input)
    if (item != null && w != null) {
      val wl: Long = w match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case other => other.asInstanceOf[Number].longValue()
      }
      if (wl > 0) {
        val key = item.toString
        val cur = buf.get(key)
        buf.put(key, cur + wl) // get() misses return 0L for the unboxed Long
        trim(buf)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.put(e.getKey, a.get(e.getKey) + e.getValue)
    }
    trim(a)
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val n = buf.size()
    val keys = new Array[AnyRef](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.keySet().iterator()
    val encoded = new java.util.ArrayList[Array[Byte]](buf.size())
    while (it0.hasNext) {
      val kb = it0.next().getBytes(StandardCharsets.UTF_8)
      encoded.add(kb)
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val kb = encoded.get(i)
      bb.putInt(kb.length).put(kb).putLong(e.getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}

object MisraGriesAgg {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_hitters"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_heavy_hitters takes (item, weight, k)")
      val k = args(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_heavy_hitters k must be an INT literal, got $other")
      }
      MisraGriesAgg(args(0), args(1), k).toAggregateExpression()
    })

  /** Column-API entry point (session must install [[graft.GraftExtensions]]). */
  def heavyHitters(item: Column, weight: Column, k: Int): Column =
    call_function("graft_heavy_hitters", item, weight,
      org.apache.spark.sql.functions.lit(k))
}
