package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-string entity resolution: match a "dirty" corpus column
  * against a clean reference registry under an edit-distance bound,
  * with prefix blocking so the candidate set is never corpus × registry.
  *
  * Reference scope note: the reference engine's join surface is exact
  * equi-join only (executor.rs:220-265); fuzzy matching is part of the
  * data-cleaning surface a training-data pipeline needs (catalog /
  * registry reconciliation, near-duplicate entity names).
  *
  * Scale shape: blocking is a pure map-side key derivation on BOTH
  * sides, the candidate join is an equi-join on the block key (shuffle
  * bounded by block sizes, broadcast when the registry is small — the
  * common case for a reference registry), and `levenshtein` — an
  * O(m·n) comparison — runs only inside blocks. The best-match
  * resolution is a single groupBy on the dirty id: the winner is
  * encoded as the string-min of `dist ++ "|" ++ name` (dist is a single
  * digit for any sane edit bound), so (min distance, then lexicographic
  * name) resolves without a window or a second aggregate pass.
  */
object Resolve {

  /** Leading characters shared by a dirty string and its registry match
    * (the blocking key). Corruptions inside the first `BlockPrefix`
    * chars fall outside this blocker by design — production would union
    * a second blocker (e.g. a suffix or phonetic key) for recall. */
  val BlockPrefix = 2

  /** Maximum accepted edit distance. Must stay ≤ 9: the best-match
    * encoding relies on the distance being one digit. */
  val MaxEdits = 1

  /** Resolve `dirty(idCol, dirtyCol)` against `registry(regCol)`.
    *
    * Output: one row per dirty row — id, the dirty string, and
    * (best_dist, matched_name, n_cand) where n_cand counts registry
    * candidates within the bound (0 and nulls when nothing matched).
    */
  def resolve(dirty: DataFrame, registry: DataFrame,
              idCol: String, dirtyCol: String, regCol: String,
              maxEdits: Int = MaxEdits): DataFrame = {
    require(maxEdits <= 9, "best-match encoding needs a single-digit distance")
    val d = dirty.select(col(idCol), col(dirtyCol))
      .withColumn("__blk", substring(col(dirtyCol), 1, BlockPrefix))
    val r = registry.select(col(regCol).as("__rname")).distinct()
      .withColumn("__blk", substring(col("__rname"), 1, BlockPrefix))
    val cand = d.join(r, "__blk")
      .withColumn("__dist", levenshtein(col(dirtyCol), col("__rname")))
      .filter(col("__dist") <= maxEdits)
    val best = cand.groupBy(col(idCol))
      .agg(
        min(concat(col("__dist").cast("string"), lit("|"), col("__rname"))).as("__bk"),
        count(lit(1)).as("n_cand"))
    dirty.select(col(idCol), col(dirtyCol))
      .join(best, Seq(idCol), "left")
      .select(
        col(idCol), col(dirtyCol),
        substring(col("__bk"), 1, 1).cast("int").as("best_dist"),
        expr("substring(__bk, 3, length(__bk))").as("matched_name"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }

  /** Deterministic one-character deletion at an md5-derived position in
    * [3, length-1] — the harness's "dirty" generator (prefix-preserving
    * so the blocker holds; production callers bring real dirty data).
    * Meaningful for strings of length ≥ 4; shorter strings delete their
    * last character (the `greatest` keeps the modulus total — a length-3
    * input must not throw a remainder-by-zero under ANSI if a future
    * fixture carries one). SQL twin in the d15 oracle. */
  def deleteOneChar(c: Column, salt: String, keyCol: Column): Column = {
    val h = conv(substring(md5(concat(lit(s"$salt|"), keyCol.cast("string"))), 1, 4), 16, 10)
      .cast("long")
    val pos = (lit(3) + h % greatest(length(c) - lit(3), lit(1)).cast("long")).cast("int")
    concat(substr(c, lit(1), pos - 1), substr(c, pos + 1, length(c)))
  }
}
