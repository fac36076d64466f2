package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the driver-checked query suite.
  *
  * Cross-engine float determinism: a double SUM's value depends on
  * accumulation order, which differs between Spark (partitioned) and the
  * DuckDB oracle. So aggregates over doubles are computed in exact
  * decimal arithmetic — each input is rounded once to 4 decimals
  * (identical IEEE-754 → identical decimal in both engines), summed
  * exactly, then cast back to double. Row-level arithmetic (no
  * reordering) stays in plain doubles.
  */
object Ops {
  /** Exact, order-independent sum of a double column. SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Exact-sum-based average. SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL-side twins, for building oracle strings. */
  def sqlDsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(28,4))) AS DOUBLE)"
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / COUNT($e))"

  /** Table read for the query suite. In CBO mode (the Verify/Bench
    * planning mode: `GraftEngine.enableCbo` fed table statistics and
    * set `spark.sql.cbo.enabled`), the read resolves to the stats-
    * backed catalog relation enableCbo registered for this exact path,
    * so DATAFRAME-path multijoins get the same CostBasedJoinReorder
    * treatment the SQL surface gets (round-15 verdict: q07 was
    * hand-ordered because this path was stat-less) — and the raised
    * broadcast threshold's decompressed-size justification now holds
    * for these frames too. Outside CBO mode (specs, ad-hoc sessions)
    * this is a plain lazy parquet read, estimated from file sizes as
    * before; the fallthrough also covers CBO sessions whose catalog
    * has no entry for this corpus dir. Schema and values are identical
    * either way (same files), so oracles don't care which path planned
    * the scan. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (spark.conf.get("spark.sql.cbo.enabled", "false") == "true") {
      val cat = s"graft_cat_${name}_${graft.GraftEngine.pathTag(path)}"
      if (spark.catalog.tableExists(cat)) return spark.table(cat)
    }
    spark.read.parquet(path)
  }

  /** DuckDB twin of [[graft.operators.Dedup.dot]]: sequential fold in
    * list order, bounds derived from the list itself (no hard-coded
    * dimension — a corpus with a different embedding width stays
    * oracle-comparable). Matches DotProduct's edge semantics: length
    * mismatch → NULL (never a plausible partial sum over the shorter
    * prefix), two empty lists → 0.0 (SQL SUM of zero rows is NULL). */
  def sqlListDot(a: String, b: String): String =
    s"(CASE WHEN $a IS NULL OR $b IS NULL OR len($a) <> len($b) THEN NULL ELSE " +
      s"coalesce(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])), 0.0) END)"

  /** DuckDB twin of the per-vector L2 norm used by cosine scoring. */
  def sqlListNorm(e: String): String =
    s"sqrt(list_sum(list_transform($e, x -> x * x)))"

  /** DuckDB twin of [[graft.operators.Dedup.signBucket]]. */
  def sqlSignBucket(v: String, bits: Int): String =
    (1 to bits).map(i => s"CASE WHEN $v[$i] > 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** DuckDB twin of [[graft.operators.Dedup.adaptiveSignBits]]: a CASE
    * chain over the SAME integer thresholds (target·2^b), generated
    * from the same constants — integer compares on both sides, so the
    * engines cannot straddle a boundary the way float log2 could. */
  def sqlAdaptiveSignBits(countExpr: String): String = {
    import graft.operators.Dedup
    val cases = (Dedup.SignBits until Dedup.MaxSignBits)
      .map(b => s"WHEN $countExpr <= ${Dedup.SignBucketTarget << b} THEN $b")
      .mkString(" ")
    s"(CASE $cases ELSE ${Dedup.MaxSignBits} END)"
  }

  /** DuckDB twin of [[graft.operators.Similarity.adaptiveCells]]: the
    * power-of-2 doubling over the SAME integer thresholds
    * (target · k), generated from the same constants. */
  def sqlAdaptiveCells(countExpr: String): String = {
    import graft.operators.Similarity
    val ks = Iterator.iterate(Similarity.NCentroids)(_ * 2)
      .takeWhile(_ < Similarity.MaxSemCells).toSeq
    val cases = ks
      .map(k => s"WHEN $countExpr <= ${Similarity.SemCellTarget * k} THEN $k")
      .mkString(" ")
    s"(CASE $cases ELSE ${Similarity.MaxSemCells} END)"
  }

  /** Variable-width twin of [[sqlSignBucket]] for when the bit count
    * is itself a SQL expression (the adaptive-width oracle). */
  def sqlSignBucketVar(v: String, bitsExpr: String): String =
    s"array_to_string(list_transform(range(1, $bitsExpr + 1), " +
      s"i -> CASE WHEN $v[i] > 0 THEN '1' ELSE '0' END), '')"

  /** Normalize the events `ts` column to a session-TZ TIMESTAMP,
    * whatever physical type the fixture vintage stored:
    *
    *  - TIMESTAMP(NANOS) parquet + `spark.sql.legacy.parquet.nanosAsLong`
    *    (set once in GraftEngine.session) → Spark reads a raw LongType of
    *    epoch-nanos; rebuild with integer division (`ts / 1000` in double
    *    would lose precision at nanosecond epoch magnitudes).
    *  - plain `timestamp[us]` parquet → Spark reads TIMESTAMP_NTZ;
    *    reinterpret as a session-TZ instant. The session TZ is UTC
    *    (GraftConfig.sessionTimeZone), so the cast is value-preserving
    *    and matches what the DuckDB oracle sees reading the same file.
    *  - already TimestampType → pass through.
    *
    * Every consumer downstream (date_part grouping, as-of joins,
    * watermarked streaming) then sees one stable TimestampType column
    * regardless of which fixture generation wrote the parquet. */
  def normalizeEventTs(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)         => expr("timestamp_micros(ts DIV 1000)")
      case Some(TimestampNTZType) => col("ts").cast("timestamp")
      case _                      => col("ts")
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.withColumn("ts", normalizeEventTs(raw))
  }
}
