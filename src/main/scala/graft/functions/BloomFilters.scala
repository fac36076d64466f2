package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Bloom-filter build/probe surface over Spark's own runtime-filter
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
  * the machinery `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`
  * injects for join pruning), exposed as registered functions so the
  * library can build the SAME shape explicitly where the optimizer
  * cannot see it: semi-join-style prefilters against a reference set
  * that is too large to broadcast as a hash table (d13 decontamination
  * — reference: the mandated LLM-pipeline extensions; the reference
  * engine has no runtime-filter analogue).
  *
  * Both functions hash their value argument through `xxhash64` (the
  * hash family `BloomFilterAggregate` is specified over), so any
  * hashable input type works and build/probe can never disagree on the
  * hash. The aggregate's partial buffers are the bloom bitsets
  * themselves, which OR together — map-side combine holds, and the
  * driver/exchange only ever carries `numBits/8` bytes per partial.
  *
  * Scale contract (why a bloom instead of the d07 broadcast set): a
  * distinct-key broadcast costs O(keys × keybytes) per executor and
  * dies somewhere past ~10⁸ keys; a bloom at ~9.6 bits/key for 1% fp
  * costs ~120 MB for 10⁸ keys REGARDLESS of key width, streams the
  * probe side map-side with zero shuffle, and the fp rate only
  * inflates the (tiny) candidate set a downstream exact join confirms
  * — never the result. */
object BloomFilters {

  /** Default expected distinct items per build (sized for benchmark
    * suites; callers with bigger reference sets pass their own). */
  val DefaultExpectedItems = 1000000L

  private def longLit(e: Expression, what: String): Long = e match {
    case l if l.foldable => l.eval(null) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg: $what must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"graft_bloom_agg: $what must be foldable")
  }

  /** `graft_bloom_agg(value[, expectedItems])` → binary bloom filter of
    * the group's xxhash64(value)s. */
  val aggRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (args: Seq[Expression]) => args match {
      case Seq(v) =>
        new BloomFilterAggregate(new XxHash64(Seq(v)), DefaultExpectedItems)
      case Seq(v, n) =>
        new BloomFilterAggregate(new XxHash64(Seq(v)), longLit(n, "expectedItems"))
      case _ => throw new IllegalArgumentException(
        "graft_bloom_agg takes (value[, expectedItems])")
    })

  /** `graft_might_contain(bloom, value)` — `bloom` must be a constant
    * or scalar subquery (Spark's own `BloomFilterMightContain`
    * contract: the bitset is resolved once per query, then probed
    * map-side). */
  val containsRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_might_contain takes (bloom, value)")
      BloomFilterMightContain(args.head, new XxHash64(Seq(args(1))))
    })

  /** Build a bloom over `values` (a column of any hashable type). The
    * result is a ONE-ROW binary DataFrame — pass `.scalar()` of it (or
    * this method's Column via [[bloomOf]]) into [[mightContain]]. */
  def bloomAgg(values: Column, expectedItems: Long = DefaultExpectedItems): Column =
    call_function("graft_bloom_agg", values,
      org.apache.spark.sql.functions.lit(expectedItems))

  /** The bloom of a reference column as a SCALAR-SUBQUERY Column: the
    * build runs once (reference-set sized), and the planner folds the
    * resulting bitset into every probe task. */
  def bloomOf(ref: org.apache.spark.sql.DataFrame, valueCol: String,
      expectedItems: Long = DefaultExpectedItems): Column =
    ref.agg(bloomAgg(org.apache.spark.sql.functions.col(valueCol), expectedItems))
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].scalar()

  /** Map-side probe: true iff `value` MIGHT be in the bloom (false
    * positives possible at the configured fp rate, false negatives
    * never — so `filter(mightContain(...))` is a sound prefilter for
    * any downstream exact confirmation). */
  def mightContain(bloom: Column, value: Column): Column =
    call_function("graft_might_contain", bloom, value)

  /** The bloom bitset MATERIALIZED to driver bytes — for embedding as
    * a literal in plans where a scalar subquery cannot go (a streaming
    * query probing a STATIC reference set: the bitset is built once in
    * batch at stream start and rides the plan as a constant). */
  def bloomBytesOf(ref: org.apache.spark.sql.DataFrame, valueCol: String,
      expectedItems: Long = DefaultExpectedItems): Array[Byte] =
    ref.agg(bloomAgg(org.apache.spark.sql.functions.col(valueCol), expectedItems)
      .as("b")).head().getAs[Array[Byte]]("b")
}
