package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers — the two table layouts a 100 TB deployment
  * leans on, surfaced as an explicit API so pipelines declare them
  * instead of re-deriving shuffles per query:
  *
  *  - BUCKETED tables: rows pre-hashed into a fixed number of buckets
  *    on the join/aggregation key at WRITE time. Two tables bucketed on
  *    the same key with the same bucket count join with NO exchange on
  *    either side — the single biggest shuffle eliminator for repeated
  *    fact-fact joins (the reference's radix-partitioned hash join plays
  *    this role per-query; bucketing amortizes it across every query
  *    that touches the table).
  *  - PARTITIONED tables: one directory per key value; predicate on the
  *    partition column prunes whole directories at planning time, so a
  *    day-scoped query over years of data reads one day's files.
  *
  * Bucketing metadata lives in the session catalog (`saveAsTable` —
  * Spark's bucket layout is catalog-described, not self-describing
  * parquet), so readers go through `spark.table(name)`.
  */
object TableLayout {

  /** Write `df` bucketed (and sorted within buckets) by `key` into the
    * session catalog as `name`. Sorting within buckets additionally
    * lets sort-merge joins skip their sort phase. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)

  /** Write `df` directory-partitioned by `key` at `path`. */
  def writePartitioned(df: DataFrame, path: String, key: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(key).parquet(path)

  /** Read a bucketed table back (catalog lookup — bucket metadata does
    * not survive a plain `spark.read.parquet`). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Totally-ordered layout: `repartitionByRange` samples the key to
    * cut balanced ranges across `partitions` tasks, then each task
    * sorts locally — a global sort with NO single-reducer bottleneck
    * (file i holds keys entirely before file i+1's). This is how sorted
    * output leaves a 100 TB job; `orderBy` alone reaches the same plan
    * only when nothing downstream repartitions first. */
  def writeGlobalSorted(df: DataFrame, path: String, key: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, df(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
