package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builds from an append-only change log —
  * the warehouse transform that turns "every observation of an entity"
  * into "the version history of an entity" (Kimball SCD Type 2).
  *
  * Reference evidence: the reference engine's surface stops at
  * point-in-time scans of loaded tables (catalog.rs); dimension
  * lifecycle is part of the deferred storage/warehouse surface this
  * library includes, like x07's MERGE and x08's time travel.
  */
object Scd {

  /** Type-2 history: per `key`, collapse the observation log (ordered
    * by `orderCol`, ties by `tieCol`) into attribute-change intervals —
    * one row per run of equal `attr`, numbered by `version`, valid from
    * the first observation of the run until the next run starts (NULL
    * `valid_to` = current version).
    *
    * Scale shape: ONE corpus shuffle — both windows (the lag that
    * detects changes, then version numbering + interval close over the
    * surviving change rows) partition on the same key with the same
    * ordering, so Catalyst plans a single exchange + sort and the
    * second window rides the first's ordering. No self-join, no
    * global window; a key's history is never wider than its change
    * count. Output dates are formatted strings: a DATE/TIMESTAMP
    * round-trips differently through the two engines' result paths.
    */
  def scd2(log: DataFrame, key: Column, attr: Column,
           orderCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__d"), col("__tie"))
    val changes = log
      .select(key.as("__k"), attr.as("__a"), orderCol.as("__d"), tieCol.as("__tie"))
      .withColumn("__prev", lag(col("__a"), 1).over(w))
      .filter(col("__prev").isNull || col("__a") =!= col("__prev"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("__to", lead(col("__d"), 1).over(w))
      .select(col("__k").as("key"), col("version"), col("__a").as("attr"),
        date_format(col("__d"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("__to"), "yyyy-MM-dd").as("valid_to"))
  }
}
