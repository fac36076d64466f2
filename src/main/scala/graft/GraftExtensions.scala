package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Catalyst extension hook for the engine's native expressions
  * (SURVEY §3 strategy (c): extend Spark through
  * `SparkSessionExtensions`, never around it). Installed by
  * [[GraftEngine.session]]; usable standalone via
  * `spark.sql.extensions=graft.GraftExtensions` on any cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer: implied-predicate extraction from multi-table ORs
    // (TPC-H Q7/Q19 shape); runs inside the operator-optimization
    // fixed point, so standard pushdown relocates what it derives.
    ext.injectOptimizerRule(graft.plans.DeriveOrBranchPredicates.apply)
    ext.injectFunction(graft.functions.DotProduct.registration)
    ext.injectFunction(graft.functions.ShingleExplode.registration)
    ext.injectFunction(graft.functions.SimhashAgg.registration)
    ext.injectFunction(graft.functions.StopwordHits.registration)
    ext.injectFunction(graft.functions.OverlapCount.registration)
    ext.injectFunction(graft.functions.MinhashAgg.registration)
    ext.injectFunction(graft.functions.ShingleSet.registration)
    ext.injectFunction(graft.functions.RegexpCount.registration)
    ext.injectFunction(graft.functions.TokenCount.registration)
    ext.injectFunction(graft.functions.BloomFilters.aggRegistration)
    ext.injectFunction(graft.functions.BloomFilters.containsRegistration)
    ext.injectFunction(graft.functions.MisraGriesAgg.registration)
  }
}
