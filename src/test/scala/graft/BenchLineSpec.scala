package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stdout contract the driver's bench artifact depends on.
  *
  * The artifact keeps only the LAST 2000 characters of stdout and
  * parses the bench JSON out of that window; rounds 1–6 all recorded
  * `parsed: null` because the full-name line never fit. The compact
  * final line exists to fit — this spec fails if query-inventory
  * growth ever pushes it back over the window (minus ~100 chars for
  * the sbt `[success]` footer that lands after it).
  */
class BenchLineSpec extends AnyFunSuite {

  private def allBenchNames: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted ++
      graft.queries.Queries.fastTwins.map(_._1.takeWhile(_ != '_') + "_fast_double")

  test("compact bench line fits the driver's 2000-char stdout tail") {
    // worst-case widths: every query at the "99"-second clamp — the 2-sf
    // render bounds every value at 4 chars, whatever the runtime was
    val entries = allBenchNames.map(_ -> 999.99)
    val line = Bench.compactLine(entries, 99999.999, 114, "/root/testdata/sf0.1")
    assert(line.length <= 1900,
      s"compact line is ${line.length} chars — no longer fits the driver's " +
        "2000-char tail with footer headroom; shorten keys or values")
  }

  test("2-significant-figure values: bounded width, failure marker intact") {
    assert(Bench.sig2(-1.0) == "-1")
    assert(Bench.sig2(0.0) == "0.00")
    assert(Bench.sig2(0.274) == "0.27")
    assert(Bench.sig2(0.996) == "1.0")
    assert(Bench.sig2(1.34) == "1.3")
    assert(Bench.sig2(9.96) == "10")
    assert(Bench.sig2(42.7) == "43")
    assert(Bench.sig2(99.5) == "99")
    assert(Bench.sig2(12345.6) == "99", "clamp: detail belongs to BENCH_LOCAL.json")
    Seq(-1.0, 0.0, 0.05, 0.55, 1.05, 5.5, 10.5, 55.0, 98.0, 1e6).foreach { v =>
      assert(Bench.sig2(v).length <= 4, s"sig2($v) wider than 4 chars")
    }
  }

  test("short keys are unique and structurally valid JSON keys") {
    val keys = Bench.shortKeys(allBenchNames)
    assert(keys.values.toSeq.distinct.size == keys.size, "short-key collision")
    keys.values.foreach(k => assert(k.matches("[A-Za-z0-9_]+"), s"odd key $k"))
    // suite prefixes stay recognizable: q06a keeps its letter suffix,
    // fast-mode entries carry the f marker
    assert(keys("q06a_join_left") == "q06a")
    assert(keys("h01_fast_double") == "h01f")
    assert(keys("h01_pricing_summary") == "h01")
  }

  test("compact line is balanced and single-line") {
    val entries = allBenchNames.map(_ -> 1.234)
    val line = Bench.compactLine(entries, 140.5, 0, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("""{"metric":"total","value":140.500"""))
    assert(line.endsWith(""""sf":"/root/testdata/sf0.1"}"""))
    // diagnostics stay out of the contract map: no fast-double twins
    // (their short keys end digit-then-f, e.g. "h01f")
    assert(!""""[a-z]+\d+f":""".r.findFirstIn(line).isDefined,
      "fast-mode diagnostic keys leaked into the contract line")
    // every value rendered with exactly 3 decimals — no 17-digit doubles
    assert(!line.matches(""".*\d\.\d{4,}.*"""), "unrounded double leaked in")
  }

  test("compact line stays valid JSON under a comma-decimal locale") {
    // The scala `f` interpolator formats with the JVM default locale;
    // a de_DE default would turn 1.234 into "1,234" and break the
    // driver's JSON parse. compactLine must pin Locale.ROOT.
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(Seq("q01_scan_project" -> 1.234), 1.234, 0, "/d")
      assert(line.contains(""""q01":1.2"""), line)
      assert(line.contains(""""value":1.234"""), line)
    } finally java.util.Locale.setDefault(prev)
  }

  test("fast-mode short keys derive structurally for any prefix length") {
    val keys = Bench.shortKeys(Seq("q06a_join_left", "q06a_fast_double"))
    assert(keys("q06a_fast_double") == "q06af")
    assert(keys("q06a_join_left") == "q06a")
  }
}
