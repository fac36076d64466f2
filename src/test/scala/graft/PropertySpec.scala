package graft

import graft.operators.{AsOfJoin, Dedup, Splits}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Randomized differential properties: each operator is replayed
  * against a brute-force in-memory oracle on ScalaCheck-generated
  * inputs. The fixed-case specs pin known answers; these pin the
  * operator SEMANTICS across the input space (ties, empty groups,
  * singleton docs, disconnected graphs, degenerate tolerances) where
  * hand-picked cases can silently miss a branch.
  *
  * Seeded (`withInitialSeed`) so a failure reproduces exactly; case
  * counts are small because every case runs real Spark jobs.
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, cases: Int, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(Seed(0xC0FFEE)), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ---- as-of join vs brute force -----------------------------------------

  test("property: as-of join equals the brute-force nearest-prior scan") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val genRows = Gen.listOfN(14,
      for {
        k <- Gen.choose(1, 3)
        t <- Gen.choose(0L, 50L)
        v <- Gen.choose(0, 999)
      } yield (k, t, v))
    val genTol = Gen.option(Gen.choose(1L, 20L))
    val prop = Prop.forAll(genRows, genRows, genTol) { (lRows, rRows, tol) =>
      // de-dup right rows on (key, time): with several right rows at the
      // SAME key+time the window carry picks the last by its internal
      // order — the operator documents nearest-prior by TIME only, so
      // the differential contract is defined on time-unique right rows
      val r = rRows.distinctBy(x => (x._1, x._2))
      val lds = lRows.map(x => (x._1, ts(x._2), x._3)).toDF("k", "t", "lv")
      val rds = r.map(x => (x._1, ts(x._2), x._3)).toDF("k", "t", "rv")
      val got = AsOfJoin.backward(
          lds, rds, Seq("k"), "t", "t", Seq("rv"), toleranceMs = tol.map(_ * 1000L))
        .collect()
        .map(x => (x.getInt(0), x.getTimestamp(1).getTime / 1000L, x.getInt(2),
          Option(x.get(3)).map(_.asInstanceOf[Int])))
        .sorted.toSeq
      val want = lRows.map { case (k, t, lv) =>
        val prior = r.filter(x => x._1 == k && x._2 <= t)
        val m = if (prior.isEmpty) None else Some(prior.maxBy(_._2))
        val masked = m.filter(x => tol.forall(ms => t - x._2 <= ms))
        (k, t, lv, masked.map(_._3))
      }.sorted
      got == want
    }
    check("asof", 10, prop)
  }

  // ---- shard packing vs the single-window oracle -------------------------

  test("property: blocked shard packing equals the global running-sum oracle") {
    import spark.implicits._
    val genDocs = Gen.listOfN(40, Gen.choose(1L, 30L)).map(_.zipWithIndex
      .map { case (tok, i) => (i.toLong, tok) })
    val gen = for {
      docs <- genDocs
      budget <- Gen.choose(10L, 120L)
      block <- Gen.oneOf(1L, 3L, 7L, 10000L) // block size must never matter
    } yield (docs, budget, block)
    val prop = Prop.forAll(gen) { case (docs, budget, block) =>
      val got = Splits.packShards(
          docs.toDF("doc_id", "n_tokens"), col("doc_id"), col("n_tokens"),
          budget, blockSize = block)
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var cum = 0L
      val want = docs.sortBy(_._1).map { case (id, tok) =>
        val shard = cum / budget; cum += tok; id -> shard
      }.toMap
      got == want
    }
    check("packShards", 10, prop)
  }

  // ---- substring-span dedup vs brute force -------------------------------

  test("property: substring spans equal the brute-force window intersection") {
    import spark.implicits._
    val w = 3
    val genDoc = Gen.choose(6, 18).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val gen = for {
      n <- Gen.choose(2, 5)
      docs <- Gen.listOfN(n, genDoc)
      maxDf <- Gen.oneOf(2, 3, 50)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, maxDf)
    val prop = Prop.forAll(gen) { case (docs, maxDf) =>
      val got = Dedup.substringSpanPairs(docs.toDF("doc_id", "text"), w, maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // brute force: windows per doc, df cap, per-pair shared positions,
      // runs of consecutive positions
      val wins = docs.map { case (id, t) =>
        id -> t.split(" ").sliding(w).map(_.mkString(" ")).toVector
      }.toMap
      val df = wins.values.flatMap(_.distinct).groupBy(identity).map {
        case (win, occ) => win -> occ.size
      }
      val want = (for {
        (a, wa) <- wins; (b, wb) <- wins if a < b
        bSet = wb.filter(df(_) <= maxDf).toSet
        hits = wa.zipWithIndex.collect {
          case (win, p) if df(win) <= maxDf && bSet(win) => p
        }
        if hits.nonEmpty
      } yield {
        val runs = hits.foldLeft(List.empty[Long]) {
          case (acc, p) if acc.nonEmpty && hits.contains(p - 1) =>
            (acc.head + 1) :: acc.tail
          case (acc, _) => 1L :: acc
        }
        (a, b) -> (hits.size.toLong, runs.max + w - 1)
      }).toMap
      got == want
    }
    check("substringSpans", 10, prop)
  }

  // ---- z-order dominance monotonicity ------------------------------------

  test("property: z-value preserves coordinate-wise dominance") {
    import spark.implicits._
    // if x1 <= x2 AND y1 <= y2 then z(x1,y1) <= z(x2,y2): each
    // coordinate's rank bits sit at fixed significances, so the curve
    // is monotone per coordinate, and dominance composes — the
    // property file skipping leans on (a key-range box maps to a
    // bounded z-range). All generated cases evaluate in ONE Spark job.
    val gen = for {
      lo <- Gen.choose(-1000000L, 1000000L)
      span <- Gen.oneOf(1L, 97L, 65536L, 1L << 40) // incl. the overflow regime
      pairs <- Gen.listOfN(60, for {
        x1 <- Gen.choose(0L, span); y1 <- Gen.choose(0L, span)
        dx <- Gen.choose(0L, span - x1); dy <- Gen.choose(0L, span - y1)
      } yield (lo + x1, lo + y1, lo + x1 + dx, lo + y1 + dy))
    } yield (lo, span, pairs)
    val prop = Prop.forAll(gen) { case (lo, span, pairs) =>
      val mins = Seq(lo, lo)
      val maxs = Seq(lo + span, lo + span)
      val bad = pairs.toDF("x1", "y1", "x2", "y2")
        .select(
          graft.sources.TableLayout.zValue(Seq(col("x1"), col("y1")), mins, maxs).as("z1"),
          graft.sources.TableLayout.zValue(Seq(col("x2"), col("y2")), mins, maxs).as("z2"))
        .filter(col("z1") > col("z2")).count()
      bad == 0L
    }
    check("zDominance", 10, prop)
  }

  // ---- connected components vs union-find --------------------------------

  test("property: cluster resolution equals union-find on random graphs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 16)
      m <- Gen.choose(0, 12)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.distinct)
    val prop = Prop.forAll(gen) { case (n, edges) =>
      val vertices = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.resolveComponents(vertices, pairs, maxIters = 4)
        .select("doc_id", "cluster_rep").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(v => v.toLong -> find(v).toLong).toMap
      got == want
    }
    check("components", 8, prop)
  }

  test("property: CDC chunking equals the brute-force in-memory chunker") {
    import spark.implicits._
    // same boundary rule as the operator: first 4 md5 hex chars mod D
    def isCut(w: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % Dedup.CdcDivisor == 0
    }
    def bfChunks(ws: List[String]): List[String] = {
      val cuts = ws.indices.filter(i => i == 0 || isCut(ws(i)))
      cuts.zipAll(cuts.drop(1), -1, ws.length)
        .map { case (a, b) => ws.slice(a, b).mkString(" ") }.toList
    }
    // small vocab mixing known cut words (hash, line) with non-cut ones
    val word = Gen.oneOf("hash", "line", "agg", "scan", "key", "part", "row")
    val genDoc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(Gen.listOfN(4, genDoc)) { docsW =>
      val df = docsW.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.cdcChunks(df).collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toList }
      val want = docsW.zipWithIndex
        .map { case (ws, i) => i.toLong -> bfChunks(ws) }.toMap
      got == want
    }
    check("cdc-chunks", 8, prop)
  }

  test("property: fuzzy resolution equals the brute-force blocked matcher") {
    import spark.implicits._
    import graft.operators.Resolve
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val word = Gen.oneOf("abc", "abd", "abcd", "abde", "xyz", "xy", "abce")
    val genReg = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word))
    val genDirty = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(genReg, genDirty) { (reg, dirty) =>
      val regD = reg.distinct
      val dirtyIdx = dirty.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Resolve.resolve(
        dirtyIdx.toDF("id", "dname"), reg.toDF("name"), "id", "dname", "name")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None
           else Some((r.getInt(2), r.getString(3), r.getLong(4))))).toMap
      val want = dirtyIdx.map { case (id, s) =>
        val cands = regD.filter(n =>
          n.take(Resolve.BlockPrefix) == s.take(Resolve.BlockPrefix) &&
            lev(s, n) <= Resolve.MaxEdits)
        id -> (if (cands.isEmpty) None
               else {
                 val best = cands.map(n => (lev(s, n), n)).min
                 Some((best._1, best._2, cands.size.toLong))
               })
      }.toMap
      got == want
    }
    check("fuzzy-resolve", 10, prop)
  }

  test("property: funnel stage counts equal the brute-force subsequence matcher") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val steps = Seq("v", "c", "p")
    def bfStage(evts: Seq[(Long, String)]): Int = {
      // greedy earliest-match with strict time increase — optimal for
      // subsequence matching, so it IS the semantics
      var stage = 0
      var at = Long.MinValue
      evts.sortBy(_._1).foreach { case (t, tp) =>
        if (stage < steps.size && tp == steps(stage) && t > at) { stage += 1; at = t }
      }
      stage
    }
    val genEvt = for {
      u <- Gen.choose(1, 4)
      t <- Gen.choose(1L, 20L) // small range: same-instant collisions likely
      tp <- Gen.oneOf(steps :+ "x")
    } yield (u.toLong, t, tp)
    val prop = Prop.forAll(Gen.listOfN(18, genEvt)) { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, t, tp), i) => (u, t, tp, i.toLong) }
        .toDF("user_id", "t", "event_type", "event_id")
        .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
          col("event_type"), col("event_id"))
      val got = EventAnalytics.funnel(df, steps,
        col("user_id"), col("ts"), col("event_type"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val stages = rows.groupBy(_._1).values
        .map(es => bfStage(es.map(e => (e._2, e._3)))).toSeq
      val want = (1 to steps.size)
        .map(k => k -> stages.count(_ >= k).toLong).toMap
      got == want
    }
    check("funnel", 10, prop)
  }

  test("property: transitions equal the brute-force consecutive-pair counter") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    val genEvt = for {
      u <- Gen.choose(1, 3)
      t <- Gen.choose(1L, 10L)
      tp <- Gen.oneOf("A", "B", "C")
    } yield (u.toLong, t, tp)
    val prop = Prop.forAll(Gen.listOfN(14, genEvt)) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((u, t, tp), i) => (u, t, tp, i.toLong) }
      val df = rows.toDF("user_id", "t", "event_type", "event_id")
        .select(col("user_id"), timestamp_micros(col("t")).as("ts"),
          col("event_type"), col("event_id"))
      val got = EventAnalytics.transitions(df,
        col("user_id"), col("ts"), col("event_type"), col("event_id"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).values.flatMap { es =>
        val s = es.sortBy(e => (e._2, e._4))
        s.zip(s.drop(1)).map { case (a, b) => (a._3, b._3) }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == want
    }
    check("transitions", 10, prop)
  }

  test("property: A/B arm counts and conversions equal the brute-force split") {
    import spark.implicits._
    import graft.operators.EventAnalytics
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def arm(u: Long): Long = java.lang.Long.parseLong(md5hex(s"ab|$u").take(2), 16) % 2
    val genUser = for {
      u <- Gen.choose(1, 30)
      purchases <- Gen.choose(0, 3)
    } yield (u.toLong, purchases)
    val prop = Prop.forAll(Gen.listOfN(12, genUser)) { users0 =>
      val users = users0.distinctBy(_._1)
      val rows = users.flatMap { case (u, np) =>
        (1 to np).map(i => (u, u * 100L + i, "purchase")) :+ ((u, u * 100L, "view"))
      }
      val df = rows.toDF("user_id", "t", "event_type")
        .select(col("user_id"), timestamp_micros(col("t")).as("ts"), col("event_type"))
      val out = EventAnalytics.abTest(df, col("user_id"), col("event_type"),
        convertType = "purchase", minCount = 2).collect()(0)
      val byArm = users.groupBy(u => arm(u._1)).withDefaultValue(Nil)
      def n(a: Long) = byArm(a).size.toLong
      def c(a: Long) = byArm(a).count(_._2 >= 2).toLong
      // an absent arm surfaces as NULL counts
      def got(i: Int): Long = if (out.isNullAt(i)) -1L else out.getLong(i)
      def wantN(a: Long): Long = if (byArm(a).isEmpty) -1L else n(a)
      def wantC(a: Long): Long = if (byArm(a).isEmpty) -1L else c(a)
      got(0) == wantN(0) && got(1) == wantC(0) && got(2) == wantN(1) && got(3) == wantC(1)
    }
    check("ab-test", 8, prop)
  }

  // ---- SCD2 vs an in-memory run-length fold ------------------------------

  test("property: scd2 equals the in-memory run-length interval fold") {
    import spark.implicits._
    val gen = for {
      nKeys <- Gen.choose(1, 4)
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, nKeys.toLong)
        day <- Gen.choose(0, 20)
        a <- Gen.oneOf("O", "F", "P")
      } yield (k, day, a))
    } yield rows.zipWithIndex.map { case ((k, d, a), i) => (k, d, a, i.toLong) }
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("k", "d", "a", "tie")
        .select(col("k"), col("a"),
          date_add(lit("2024-01-01").cast("date"), col("d")).as("day"), col("tie"))
      val got = graft.operators.Scd.scd2(df, col("k"), col("a"), col("day"), col("tie"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
          Option(r.getString(4))))
        .sortBy(t => (t._1, t._2))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val ordered = rs.sortBy(t => (t._2, t._4))
        // collapse runs of equal attr, then build intervals
        val changes = ordered.foldLeft(Vector.empty[(Int, String)]) { (acc, r) =>
          if (acc.lastOption.exists(_._2 == r._3)) acc else acc :+ ((r._2, r._3))
        }
        changes.zipWithIndex.map { case ((d, a), i) =>
          def fmt(dd: Int) = java.time.LocalDate.of(2024, 1, 1).plusDays(dd).toString
          (k, i + 1, a, fmt(d), changes.lift(i + 1).map(c => fmt(c._1)))
        }
      }.sortBy(t => (t._1, t._2))
      got.toSeq == want
    }
    check("scd2", 10, prop)
  }

  // ---- containment vs brute-force shingle arithmetic ---------------------

  test("property: containment ratios equal brute-force shingle math on every pair") {
    import spark.implicits._
    val word = Gen.choose(1, 12).map(i => s"w$i")
    val gen = for {
      n <- Gen.choose(2, 6)
      docs <- Gen.listOfN(n, Gen.choose(5, 25).flatMap(len =>
        Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def shingles(text: String): Set[String] = {
      val ws = text.toLowerCase.split(" ").toSeq
      if (ws.size < 3) Set(ws.mkString(" "))
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val prop = Prop.forAll(gen) { docs =>
      val df = docs.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("s").as("source"), length(col("text")).as("n_chars"))
      val got = Dedup.containmentPairs(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      // every emitted pair's ratios must equal the brute-force shingle
      // arithmetic (the candidate SET is LSH's to choose; the VALUES
      // are not), and clear the floor in at least one direction
      got.forall { case ((a, b), (cab, cba)) =>
        val (sa, sb) = (shingles(docs(a.toInt)._2), shingles(docs(b.toInt)._2))
        val inter = sa.intersect(sb).size.toDouble
        def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        cab == r6(inter / sa.size) && cba == r6(inter / sb.size) &&
          math.max(cab, cba) >= Dedup.ContainmentThreshold
      }
    }
    check("containment", 10, prop)
  }

  // ---- adaptive dials vs their generated SQL CASE twins -------------------

  test("property: adaptive dials equal their SQL CASE twins across every threshold boundary") {
    import spark.implicits._
    import graft.operators.Similarity
    import graft.queries.Ops
    // every integer threshold either dial can straddle, probed at ±1 —
    // an off-by-one in EITHER the Scala loop or the generated CASE
    // chain (the oracle's side) must show up here, not at a corpus
    // size the fixtures never reach
    val signThresholds = (Dedup.SignBits until Dedup.MaxSignBits)
      .map(b => Dedup.SignBucketTarget << b)
    val cellThresholds = Iterator.iterate(Similarity.NCentroids.toLong)(_ * 2)
      .takeWhile(_ < Similarity.MaxSemCells)
      .map(_ * Similarity.SemCellTarget).toSeq
    val boundary = (signThresholds ++ cellThresholds)
      .flatMap(t => Seq(t - 1, t, t + 1))
    // plus seeded random draws across the whole plausible corpus range
    // (to 2^41 ≈ 2.2e12 docs — far past either dial's cap)
    val random = Gen.listOfN(256, Gen.choose(1L, 1L << 41))
      .apply(Gen.Parameters.default, Seed(0xD1A75)).get
    val ns = (Seq(1L, 2L) ++ boundary ++ random).distinct
    val rows = ns.toDF("n")
      .selectExpr("n",
        s"${Ops.sqlAdaptiveSignBits("n")} AS sql_bits",
        s"${Ops.sqlAdaptiveCells("n")} AS sql_cells")
      .collect()
    assert(rows.length == ns.length)
    rows.foreach { r =>
      val n = r.getLong(0)
      assert(r.getInt(1) == Dedup.adaptiveSignBits(n),
        s"adaptiveSignBits($n)=${Dedup.adaptiveSignBits(n)} but SQL CASE says ${r.getInt(1)}")
      assert(r.getInt(2) == Similarity.adaptiveCells(n),
        s"adaptiveCells($n)=${Similarity.adaptiveCells(n)} but SQL CASE says ${r.getInt(2)}")
    }
    // and the dials' own contract: smallest width/count within bounds
    // whose mean bucket population meets the target; monotone in n
    ns.foreach { n =>
      val b = Dedup.adaptiveSignBits(n)
      assert(b >= Dedup.SignBits && b <= Dedup.MaxSignBits)
      if (b < Dedup.MaxSignBits) assert(n <= (Dedup.SignBucketTarget << b))
      if (b > Dedup.SignBits) assert(n > (Dedup.SignBucketTarget << (b - 1)))
      val k = Similarity.adaptiveCells(n)
      assert(k >= Similarity.NCentroids && k <= Similarity.MaxSemCells)
      if (k < Similarity.MaxSemCells) assert(n <= Similarity.SemCellTarget * k)
      if (k > Similarity.NCentroids) assert(n > Similarity.SemCellTarget * (k / 2))
    }
    val sorted = ns.sorted
    assert(sorted.map(Dedup.adaptiveSignBits) == sorted.map(Dedup.adaptiveSignBits).sorted,
      "adaptiveSignBits must be monotone in corpus size")
    assert(sorted.map(Similarity.adaptiveCells) == sorted.map(Similarity.adaptiveCells).sorted,
      "adaptiveCells must be monotone in corpus size")
  }
}
