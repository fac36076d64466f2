package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter

/** DeriveOrBranchPredicates: implied single-table predicates extracted
  * from multi-table OR-of-conjunctions reach the scans (the TPC-H Q7
  * shape), results are unchanged, and the optimizer batch converges.
  */
class DerivedPredicateSpec extends SparkSpec {

  test("h07's nation-pair OR pushes an implied IN to BOTH nation scans") {
    // AQE wraps the physical tree, so assert on the formatted plan text:
    // every nation scan must carry the derived disjunction as a pushed
    // filter (self-join = two scans, or one scan + a reused exchange).
    val df = queries.Queries.all("h07_volume_shipping")(spark, sfDir)
    val plan = GraftEngine.explainPlan(df)
    val nationScans = plan.linesIterator
      .filter(l => l.contains("nation.parquet"))
      .filter(_.contains("Location")).size
    assert(nationScans >= 1, s"no nation scan found:\n$plan")
    val pushed = "Or\\(EqualTo\\(n_name,NATION_[12]\\),EqualTo\\(n_name,NATION_[12]\\)\\)".r
      .findAllIn(plan).size
    assert(pushed >= nationScans,
      s"derived nation disjunction not pushed to every nation scan " +
        s"($pushed pushed vs $nationScans scans):\n$plan")
  }

  test("derivation preserves three-valued semantics: rows match the undeferred filter") {
    import spark.implicits._
    // NULL names exercise the NULL-vs-FALSE edge: cond NULL must stay
    // rejected, and the derived clause must never flip a TRUE row out.
    val t1 = Seq((1, "A"), (2, "B"), (3, null), (4, "C"))
      .toDF("k1", "a").as("t1")
    val t2 = Seq((1, "B"), (2, "A"), (3, "A"), (4, null)).toDF("k2", "b").as("t2")
    val joined = t1.join(t2, $"k1" === $"k2")
    val cond = ($"a" === "A" && $"b" === "B") || ($"a" === "B" && $"b" === "A")
    val got = joined.filter(cond).select("k1").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2), s"got ${got.toSeq}")
  }

  test("the optimizer fixed point converges: no max-iterations warning plan growth") {
    // Re-optimizing an already-derived plan must be a no-op — the
    // constraint check stops re-derivation after pushdown relocates
    // the clause. A non-converging batch would leave >2 copies of the
    // derived disjunction in the optimized plan's filter conditions.
    val df = queries.Queries.all("h07_volume_shipping")(spark, sfDir)
    val conds = df.queryExecution.optimizedPlan.collect {
      case f: Filter => f.condition.sql
    }
    val copies = conds.map(c => "NATION_1".r.findAllIn(c).size).sum
    assert(copies <= 8, s"derived clauses accumulated (non-convergence?): $conds")
  }
}
