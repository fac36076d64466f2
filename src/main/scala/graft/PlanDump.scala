package graft

/** Dev utility: print the formatted physical plan of named queries
  * (exchange/stage diagnosis while iterating — see PLANS.md for the
  * audited shapes the bench pins).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-plandump", shufflePartitions = 8))
    args.foreach { name =>
      val df = graft.queries.Queries.all(name)(spark, sfDir)
      val plan = GraftEngine.explainPlan(df)
      println(s"==== $name ====")
      println(plan)
      val ex = "Exchange".r.findAllIn(plan).length
      println(s"[plandump] $name exchanges=$ex")
    }
    spark.stop()
  }
}
