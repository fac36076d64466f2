package graft

import graft.queries.TpchQueries

/** Pins the production decimal mode (GraftConfig.exactDecimal = false):
  * the mechanical exact→double rewrite must (a) leave no DECIMAL cast
  * behind in any h-query, (b) still parse and run, and (c) agree with
  * the exact-mode values within float-noise tolerance — the ONLY
  * licensed divergence is summation-order ulp drift.
  */
class FastMathSpec extends SparkSpec {

  test("fastMoney strips every decimal-sum wrapper from the whole h-suite") {
    TpchQueries.sqlFor(exactDecimal = false).foreach { case (name, q) =>
      assert(!q.contains("AS DECIMAL"),
        s"$name still carries a DECIMAL cast after rewrite:\n$q")
      // the rewrite must not eat aggregates: SUM stays present wherever
      // the exact form had one
      assert(("SUM\\(".r.findAllIn(q).size ==
        "SUM\\(".r.findAllIn(TpchQueries.sql(name)).size),
        s"$name lost a SUM in rewrite")
    }
  }

  test("every fast twin matches its exact form within 1e-9 relative") {
    // the full twin registry: the 5 decimal-bound h-queries plus the
    // DataFrame-built q57/t16 dual modes (round-8 verdict item: extend
    // the h01 pattern to the remaining decimal-taxed queries)
    graft.queries.Queries.fastTwins.foreach { case (name, fastRun) =>
      val exact = graft.queries.Queries.all(name)(spark, sfDir).collect()
      val fast = fastRun(spark, sfDir).collect()
      assert(exact.length == fast.length && exact.nonEmpty, s"$name row mismatch")
      exact.zip(fast).foreach { case (a, b) =>
        (0 until a.length).foreach { i =>
          (a.get(i), b.get(i)) match {
            case (x: Double, y: Double) =>
              assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
                s"$name col $i diverged beyond float noise: exact=$x fast=$y")
            case (x, y) => assert(x == y, s"$name col $i: $x != $y")
          }
        }
      }
    }
  }

  test("engine.tpch honors config.exactDecimal") {
    val exact = new GraftEngine(spark, GraftConfig(exactDecimal = true))
    val fast = new GraftEngine(spark, GraftConfig(exactDecimal = false))
    Tables.all.foreach { t =>
      exact.loadTable(t, s"$sfDir/$t.parquet")
    }
    // views are session-global; fast engine sees the same tables
    val a = exact.tpch("h22_global_sales").collect()
    val b = fast.tpch("h22_global_sales").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) == y.getInt(0) && x.getLong(1) == y.getLong(1))
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) <=
        1e-9 * math.max(1.0, math.abs(x.getDouble(2))))
    }
  }
}
