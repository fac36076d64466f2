package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the payload of the
  * right row with the greatest `rightTime <= leftTime` within the same
  * key group (the classic event-attribution / point-in-time-lookup
  * operator; the reference engine has no counterpart, and Spark has no
  * built-in either).
  *
  * NOT implemented as a non-equi join: an equi-join on key with a
  * `rightTime <= leftTime` residual would produce every left×prior-right
  * pair before a max-per-left reduction — quadratic in events per key.
  * Instead both sides are unioned and sorted once per key:
  *
  *  1. tag rows (left = 1, right = 0) and align schemas with
  *     `unionByName(allowMissingColumns)`;
  *  2. one window over `(keys)` ordered by `(time, tag)` carries the
  *     most recent right-row payload forward (`last(_, ignoreNulls)`
  *     over unbounded-preceding..current);
  *  3. keep only left rows.
  *
  * Cost at scale: ONE shuffle of left+right on the key columns and a
  * per-key sort — the same plan shape as a windowed aggregation; no
  * pair explosion, no driver state. Per-key partitions must fit an
  * executor (same constraint as any window), which holds when keys are
  * user/entity ids.
  *
  * Semantics notes:
  *  - ties: a right row at exactly `leftTime` IS visible (inclusive
  *    `<=`), because right tags sort before left tags at equal time —
  *    matching DuckDB/pandas ASOF JOIN backward semantics.
  *  - the whole right ROW is carried as one struct, so a right row
  *    whose payload value is NULL still shadows older right rows
  *    (`last(ignoreNulls)` skips only absent rows, not null fields).
  *  - right rows should be unique per `(keys, rightTime)`; with
  *    duplicates the carried row among the tied group is unspecified
  *    (as in DuckDB's ASOF).
  */
object AsOfJoin {

  /** @param payload right columns to attach, emitted as `prefix+name`
    *                (rename collisions with left columns are the
    *                caller's responsibility via `prefix`).
    * @param toleranceMs max lookback: a matched right row older than
    *                    `leftTime - toleranceMs` is masked to NULL (the
    *                    pandas `merge_asof(tolerance=...)` semantics —
    *                    the nearest prior row either qualifies or the
    *                    left row gets no match; there is no fallback to
    *                    an even older row). The plan is unchanged: the
    *                    window still carries the single most recent
    *                    right row, and the mask is a map-side CASE. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      prefix: String = "asof_", toleranceMs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val outPayload = payload.map(prefix + _)
    val l = left
      .withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_left", lit(1))
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_asof_t"), lit(0).as("_asof_left")) ++
        payload.zip(outPayload).map { case (p, o) => col(p).as(o) }: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched right row's own time rides along so the tolerance
    // mask can compare it against the left row's time after the carry
    val carried = when(col("_asof_left") === 0,
      struct((outPayload.map(col) :+ col("_asof_t").as("_asof_rt")): _*))
    val withinTol = toleranceMs match {
      case Some(ms) =>
        unix_micros(col("_asof_t")) -
          unix_micros(col("_asof_row._asof_rt")) <= ms * 1000L
      case None => lit(true)
    }
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_row", last(carried, ignoreNulls = true).over(w))
      .filter(col("_asof_left") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        outPayload.map(p => when(withinTol, col(s"_asof_row.$p")).as(p)): _*)
  }
}
