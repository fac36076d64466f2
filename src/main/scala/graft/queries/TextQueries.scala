package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import Ops._

/** Text-analysis operators t01–t04 (SURVEY.md §2 #25–#28) over the
  * `documents` table. All four are narrow projections over a single
  * scan — no shuffle at all except t01's final ORDER BY (driver-compare
  * determinism only; at 100 TB these run as pure map-side pipelines
  * inside one whole-stage-codegen span per partition).
  */
object TextQueries {

  /** Per-language stopword score columns, shared by t01/t02. */
  private def scoreCols = Stopwords.map { case (lang, set) =>
    lang -> stopwordHits(words(col("text")), set)
  }
  private def sqlScore(lang: String): String =
    sqlStopwordHits(sqlWords("text"), Stopwords.toMap.apply(lang))

  /** Deterministic argmax with fixed priority order en>de>fr>es>zh —
    * identical CASE shape in the DuckDB twin so ties break the same. */
  private val langs = Stopwords.map(_._1)

  /** t11 bigram-frequency floor: prunes the Zipf tail before the PMI
    * joins (rare bigrams have degenerate PMI and dominate the vocab). */
  val MinBigramFreq = 5

  /** t15 feature-hash width. A production fastText-style model uses
    * 2^20+ buckets; the chain is bucket-count-agnostic. */
  val ClfBuckets = 64

  /** t19 merge-training iterations. A production tokenizer runs tens of
    * thousands; the loop is step-count-agnostic (state is the
    * vocabulary, never the corpus) and ten steps keep the unrolled
    * oracle CTE chain readable. */
  val BpeTrainSteps = 10

  /** t17 TextRank: power iterations and keyword-list size. Ten
    * iterations is the published convergence budget for keyword graphs
    * (Mihalcea & Tarau 2004 report 20-30 to 1e-4; the 10-dp-rounded
    * fixed-point chain is deterministic at ANY count, so the oracle
    * holds regardless). */
  val TextRankIters = 10
  val TextRankTopK = 50

  /** t18 Misra-Gries capacity and the deterministic skew harness: the
    * fixture vocabulary is deliberately uniform (~30 words, no natural
    * heavy hitter), so tokens starting with 's' carry weight HhBoost —
    * the d15-style fixture trick that plants KNOWN hitters while every
    * count stays exactly derivable by the oracle. Capacity 16 <
    * vocabulary forces real evictions. */
  val HhK = 16
  val HhBoost = 20

  /** t16 add-k smoothing constant for the bigram LM. */
  val BigramK = 0.5

  /** t12 BM25 constants: the standard Robertson k1/b, and a fixed
    * query-term set drawn from the corpus vocabulary (a retrieval
    * pass's query is user input — fixed here for the oracle). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms: Seq[String] = Seq("join", "stream", "vector")
  val Bm25TopK = 20

  /** t13: how many top adjacent-character pairs the BPE count step
    * reports (one merge-candidate ranking). */
  val BpeTopPairs = 50

  /** t14 Gopher-rule thresholds (Rae et al. 2021 §A1.1, the published
    * heuristic filter battery). Word-count floor adapted to the short
    * synthetic docs (the paper uses 50; the RULE STRUCTURE is the
    * capability, the thresholds are corpus tuning); the rest are the
    * paper's values: mean word length in [3,10], symbol-to-word ratio
    * ≤ 0.1, ≥ 80 % of words with an alphabetic character, ≥ 2
    * stopword hits. */
  val GopherMinWords = 10
  val GopherMaxWords = 100000

  /** The t14 rule battery as a reusable projection (also registered as
    * the `graft_gopher_rules` SQL view). */
  def gopherRules(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ws = words(col("text"))
    val nw = size(ws)
    val nonspace = length(regexp_replace(col("text"), "\\s", ""))
    val punct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
    val alphaw = size(filter(ws, w => w.rlike("[a-z]")))
    val stopHits = stopwordHits(ws, Stopwords.toMap.apply("en"))
    docs.select(
      col("doc_id"),
      nw.as("n_words"),
      nw.between(GopherMinWords, GopherMaxWords).as("r_words"),
      (nonspace >= nw * 3 && nonspace <= nw * 10).as("r_word_len"),
      (punct * 10 <= nw).as("r_symbols"),
      (alphaw * 5 >= nw * 4).as("r_alpha"),
      (stopHits >= 2).as("r_stopwords"))
      .withColumn("passes",
        col("r_words") && col("r_word_len") && col("r_symbols") &&
          col("r_alpha") && col("r_stopwords"))
  }

  val defs: Map[String, Q] = Map(
    // #25 language-ID: stopword-hit argmax (rows stay put; one scan)
    // Per-doc MAP-ONLY outputs carry NO global orderBy (t01–t06, t04,
    // t14): the driver compare is row-sorted, and a global sort over a
    // map-only chain re-executes it — Spark's range partitioner samples
    // the child as a separate job and no shuffle boundary exists whose
    // files it could reuse (see q01's note; measured round 14). Queries
    // whose plan already shuffles (t08–t10, t15, t16) keep the orderBy:
    // there the sample job reuses the shuffle files and the sort is
    // output-sized.
    "t01_langid" -> ((s, dir) => {
      val scored = scoreCols.foldLeft(t(s, dir, "documents")) {
        case (df, (lang, c)) => df.withColumn(s"s_$lang", c)
      }
      val pred = langs.init.zipWithIndex.foldLeft(when(lit(false), "")) {
        case (acc, (lang, i)) =>
          val rest = langs.drop(i + 1)
          acc.when(rest.map(r => col(s"s_$lang") >= col(s"s_$r")).reduce(_ && _), lang)
      }.otherwise(langs.last)
      scored.select(
        (col("doc_id") +: langs.map(l => col(s"s_$l"))) :+ pred.as("lang_pred"): _*)
    }),

    // #26 quality scoring: length/punct/stopword ratios + a composite
    "t02_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val nw = wsTokenCount(col("text"))
      val stopHits = stopwordHits(words(col("text")), Stopwords.toMap.apply("en"))
      d.select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        nw.as("n_words"),
        (length(col("text")).cast("double") / nw).as("avg_word_len"),
        punctRatio(col("text")).as("punct_ratio"),
        (stopHits.cast("double") / nw).as("stop_ratio"),
        (when(nw.between(10, 500), 1.0).otherwise(0.5) *
          (lit(1.0) - punctRatio(col("text")))).as("quality_score"))
    }),

    // #27 token counting: whitespace + BPE-ish pre-tokenization
    "t03_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"))),

    // #28 document fingerprinting: md5 of whitespace-normalized content
    "t04_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        length(col("text")).as("raw_len"))),

    // t07 vocabulary extraction: corpus-level token frequencies, top
    // 100 by count — the counting pass a tokenizer build starts from.
    // explode is a generator in the scan stage; the groupBy(word) gets
    // map-side partial counts, so the shuffle carries one row per
    // distinct word per task (vocabulary-sized, not corpus-sized), and
    // the global top-k plans as TakeOrderedAndProject.
    "t07_vocab" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(100)),

    // t13 BPE pair counting: the statistics step a BPE tokenizer
    // training loop iterates — total corpus frequency of every
    // adjacent CHARACTER pair, counted at ALL positions (overlap
    // included). The scale trick is aggregating to the VOCABULARY
    // first (t07's word-count shuffle — the only corpus-sized
    // exchange), then exploding pairs per UNIQUE word weighted by its
    // count: O(|vocab| × word_len) pair rows instead of O(corpus
    // tokens), which at 100 TB is the difference between re-scanning
    // petabytes per merge iteration and re-scanning a vocab table.
    // The merge LOOP is driver-side iteration over this primitive on
    // the (vocab-sized, cached) word-count table; top-k is
    // TakeOrderedAndProject.
    "t13_bpe_pairs" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
        .filter(length(col("word")) >= 2)
        .select(col("c"), explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair"))
        .limit(BpeTopPairs)),

    // t19 BPE merge TRAINING: t13 computes one round of pair
    // statistics; this runs the real trainer loop — count pairs over
    // the VOCABULARY, merge the argmax pair into every word, recount —
    // for BpeTrainSteps rounds, emitting the learned merge table. The
    // GraphRank/d06 checkpointed-loop discipline applied to t13's
    // aggregate: ONE corpus pass builds the word-count vocabulary;
    // every iteration after that reads the checkpointed vocab
    // (vocabulary-sized state, corpus never rescanned — the shape that
    // makes tokenizer training feasible at 100 TB).
    "t19_bpe_train" -> ((s, dir) => bpeTrain(s, dir)),

    // t20 BPE ENCODE: t19's other half — apply the learned merges to
    // the corpus and count true tokenizer tokens per document. The
    // encoder is the trainer's final vocabulary state (no per-occurrence
    // merge replay); corpus work is one broadcast join + one doc-keyed
    // shuffle. See [[bpeEncode]] for the scale shape.
    "t20_bpe_encode" -> ((s, dir) => bpeEncode(s, dir)),

    // t14 Gopher rules: the published heuristic filter battery as
    // per-document boolean flags + the conjunction. Every rule is
    // INTEGER arithmetic (mean-word-length [3,10] becomes
    // 3·nw ≤ nonspace ≤ 10·nw, the 0.1 symbol ratio becomes
    // 10·punct ≤ nw, the 80 % alpha fraction 5·alphaw ≥ 4·nw), so the
    // cross-engine verdicts cannot flip on a float boundary. One scan,
    // fully map-side — the filter battery a 100 TB curation pass runs
    // inside the read stage.
    "t14_gopher_rules" -> ((s, dir) =>
      gopherRules(t(s, dir, "documents"))),

    // t15 hashed linear classifier inference — the fastText-style
    // quality-classifier scoring pass (CCNet/LLaMA-style curation):
    // hash each token into ClfBuckets features, look up a weight, and
    // score the doc as the mean feature weight; label = score > 0.
    // The weights here are md5-derived stand-ins (deterministic, so the
    // whole chain is value-oracled); a trained model swaps in a real
    // weight table — broadcast, or in-expression exactly like this.
    // Scale shape: hashing AND the weight lookup are in-expression
    // (zero joins, no model shuffle); the only shuffle is the per-doc
    // aggregate. Inference over 100 TB is embarrassingly parallel.
    "t15_classifier" -> ((s, dir) => {
      val toks = fanScan(t(s, dir, "documents"))
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
      val b = conv(substring(md5(concat(lit("clf|"), col("word"))), 1, 4), 16, 10)
        .cast("long") % ClfBuckets
      val w = round(
        (conv(substring(md5(concat(lit("w|"), b.cast("string"))), 1, 4), 16, 10)
          .cast("double") - 32767.5) / 65535.0, 6)
      toks.withColumn("w", w)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          (sum(col("w").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .cast("double") / count(lit(1))).as("score"))
        .withColumn("label", col("score") > 0)
        .orderBy("doc_id")
    }),

    // t16 bigram-LM perplexity — the CCNet/KenLM-style quality filter:
    // train an add-k-smoothed bigram model ON the corpus
    // (P(w2|w1) = (c12+k)/(c1+k·V), c1 = w1's count as a bigram left,
    // V = unigram vocab size) and score each doc by mean conditional
    // NLL and perplexity. Extends t10 from unigram to conditional
    // probabilities — the ranking a perplexity-gated curation pass
    // uses.
    // Scale shape: bigrams generate inside the scan stage; the model
    // tables are VOCABULARY-sized aggregates (bigram counts shared via
    // lazy localCheckpoint so the left-count derivation re-reads 40k
    // rows, not the corpus); the scoring joins are vocab-keyed and
    // unhinted (AQE sizes them); the doc rollup is the one corpus
    // shuffle. Per-term NLLs round at 6 dp and sum in exact decimal.
    "t16_bigram_ppl" -> ((s, dir) => bigramPpl(s, dir, exactDecimal = true)),

    // t11 PMI collocations: bigrams ranked by pointwise mutual
    // information — log((P(ab)) / (P(a)·P(b))) over corpus token
    // probabilities — the multiword-expression/collocation miner a
    // tokenizer or phrase-vocab build runs after t07's unigram pass.
    // Scale shape: bigram generation is a generator inside the scan
    // stage; both count aggregates get map-side partials so the
    // shuffles are vocabulary-sized; the two unigram joins are left
    // unhinted (AQE picks broadcast vs shuffle by actual vocab size);
    // the corpus total is a one-row broadcast; the freq floor prunes
    // the Zipf tail BEFORE the joins; top-k is TakeOrderedAndProject.
    // All-integer inputs into one identically-parenthesized double
    // expression → IEEE-754-identical PMI in both engines at 6 dp.
    "t11_collocations" -> ((s, dir) => {
      val toksW = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("w"))
      val uni = toksW.select(explode(col("w")).as("word"))
      val uf = uni.groupBy("word").agg(count(lit(1)).as("uf"))
      val total = uni.select(count(lit(1)).as("n_total"))
      val bi = toksW.filter(size(col("w")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("w1"),
            element_at(col("w"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= MinBigramFreq)
      bi
        .join(uf.select(col("word").as("w1"), col("uf").as("uf1")), "w1")
        .join(uf.select(col("word").as("w2"), col("uf").as("uf2")), "w2")
        .crossJoin(broadcast(total))
        .withColumn("pmi", round(log(
          (col("freq").cast("double") * col("n_total").cast("double")) /
            (col("uf1").cast("double") * col("uf2").cast("double"))), 6))
        .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
          col("freq"), col("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(100)
    }),

    // t17 TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    // PageRank over the word co-occurrence graph — t11's floored bigram
    // counts, symmetrized (w(a,b) = freq(a,b) + freq(b,a), self-loops
    // dropped) — surfacing the corpus's central vocabulary rather than
    // its frequent or surprising pairs.
    // Scale shape: the corpus collapses to the vocabulary-sized edge
    // list BEFORE the loop (same generator-in-scan bigram aggregate as
    // t11); GraphRank then runs ten vocabulary-sized join+aggregate
    // rounds with per-iteration lineage truncation. The decimal-exact
    // update chain makes all ten iterations engine-identical, so the
    // oracle replays them as an unrolled CTE chain.
    "t17_textrank" -> ((s, dir) => {
      val toksW = t(s, dir, "documents").select(words(col("text")).as("w"))
      val bi = toksW.filter(size(col("w")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("w1"),
            element_at(col("w"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= MinBigramFreq && col("w1") =!= col("w2"))
      val edges = bi.select(col("w1").as("src"), col("w2").as("dst"), col("freq").as("f"))
        .union(bi.select(col("w2"), col("w1"), col("freq")))
        .groupBy("src", "dst").agg(sum("f").as("w"))
      graft.operators.GraphRank.pageRank(edges, TextRankIters)
        .orderBy(col("rank").desc, col("word"))
        .limit(TextRankTopK)
    }),

    // t18 heavy hitters via the weighted Misra-Gries sketch
    // (graft_heavy_hitters, a mergeable TypedImperativeAggregate):
    // one pass over the weighted token stream with O(k) state per
    // task — where an exact groupBy would shuffle the vocabulary —
    // then verdicts against the published guarantees: every item with
    // true weight > N/(k+1) is retained, with an underestimate no more
    // than N/(k+1) low. The exact-count pass exists only to power the
    // verdict (q42's sketch-oracle discipline); all comparisons are
    // INTEGER arithmetic (cnt*(k+1) > N), so no float boundary can
    // flip a verdict.
    "t18_heavy_hitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .withColumn("rep",
          when(substring(col("w"), 1, 1) === "s", lit(HhBoost)).otherwise(lit(1)))
      val sketch = toks.agg(
        graft.functions.MisraGriesAgg.heavyHitters(col("w"), col("rep"), HhK).as("sk"))
      val exact = toks.groupBy("w").agg(sum(col("rep").cast("long")).as("cnt"))
      val total = exact.agg(sum("cnt").as("n"))
      exact.crossJoin(broadcast(total))
        .filter(col("cnt") * (HhK + 1) > col("n"))
        .crossJoin(broadcast(sketch))
        .select(col("w").as("word"), col("cnt"),
          element_at(col("sk"), col("w")).isNotNull.cast("int").as("in_sketch"),
          (element_at(col("sk"), col("w")) <= col("cnt") &&
            (col("cnt") - element_at(col("sk"), col("w"))) * (HhK + 1) <= col("n"))
            .cast("int").as("bound_ok"))
        .orderBy(col("cnt").desc, col("word"))
    }),

    // t08 TF-IDF keyword extraction: top-3 highest-scoring terms per
    // document. Term frequencies shuffle once on (doc, word), document
    // frequencies derive from them with a second vocabulary-sized
    // groupBy, the corpus total is a one-row broadcast, and the per-doc
    // top-3 plans as WindowGroupLimit. The df join is left unhinted —
    // vocabulary size varies wildly across corpora, so AQE picks
    // broadcast vs shuffle at runtime.
    // t09 per-language repetition-median gate: keep docs whose t06
    // duplicate-word mass is at or BELOW their LANGUAGE's median — the
    // per-domain adaptive threshold a mixed-language corpus needs (a
    // fixed global cutoff over- or under-prunes whichever language
    // structurally repeats more, e.g. analytic vs synthetic languages).
    // Scale shape: the median is found on the (lang, ratio) HISTOGRAM
    // (cardinality = distinct ratios per language, not docs — the q29
    // discipline), and rank localization is BLOCKED (q29's round-6
    // pattern, specialized for a single rank): the ratio domain is
    // [0,1] so each histogram row hashes to a fixed value block, block
    // subtotals roll up into a ≤ |lang|·64-row offsets table whose
    // single-row-per-language filter pins the block CONTAINING the
    // median rank, and only that block's histogram slice (≈1/64 of it)
    // pays a cumulative window. A lang-partitioned window over the
    // full histogram would cap parallelism at |languages| AND sort
    // everything to use one row; the lower-median pick stays a
    // discrete MIN over existing values (no FP interpolation to
    // diverge between engines), and the 5-row threshold table
    // broadcasts back onto a single corpus scan.
    "t09_quality_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val nBlocks = 64
      val ws = words(col("text"))
      val rep = lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)
      val scored = d.select(col("doc_id"), col("lang"), rep.as("q"))
      val blocked = scored.groupBy(col("lang"), col("q")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk", least(lit(nBlocks - 1), greatest(lit(0),
          floor(col("q") * nBlocks).cast("int"))))
      val wOff = Window.partitionBy("lang").orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLang = Window.partitionBy("lang")
      // one row per language: the block holding the median rank, with
      // the cumulative count of all earlier blocks and the rank itself
      val targets = blocked.groupBy(col("lang"), col("blk"))
        .agg(sum("cnt").as("bcnt"))
        .withColumn("cumb", sum("bcnt").over(wOff))
        .withColumn("target", ceil(max("cumb").over(wLang) / 2.0))
        .filter(col("cumb") >= col("target") &&
          col("cumb") - col("bcnt") < col("target"))
        .select(col("lang"), col("blk"),
          (col("cumb") - col("bcnt")).as("off"), col("target"))
      val wMed = Window.partitionBy("lang").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = blocked.join(broadcast(targets), Seq("lang", "blk"))
        .withColumn("cum", sum("cnt").over(wMed) + col("off"))
        .filter(col("cum") >= col("target"))
        .groupBy("lang").agg(min("q").as("med"))
      scored.join(broadcast(med), "lang")
        .filter(col("q") <= col("med"))
        .select(col("doc_id"), col("lang"), round(col("q"), 6).as("word_rep_ratio"))
        .orderBy("doc_id")
    }),

    "t08_tfidf" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val total = d.select(count(lit(1)).as("n_docs"))
      val tf = d.select(col("doc_id"), explode(words(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      // df as a COUNT over a word-partitioned window instead of a
      // groupBy(word)+self-join: the join form evaluates the whole
      // explode→groupBy tf subtree TWICE (two non-identical plan
      // branches share no exchange), i.e. two scans of documents. The
      // window form scans once; its word-hash shuffle is the same
      // distribution the groupBy(word) needed anyway. tf rows are one
      // per (doc, word) — Zipf-bounded per-word partitions, no skew
      // cliff at 100× (the hottest stopword's row count is bounded by
      // n_docs, not corpus tokens).
      val wDf = Window.partitionBy("word")
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("word").asc)
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(broadcast(total))
        .withColumn("tfidf",
          round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"),
          col("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // t10: unigram LM surprisal — mean negative log-likelihood of each
    // doc's words under the corpus's own unigram distribution, the
    // exact-arithmetic core of a CCNet-style perplexity filter (high
    // surprisal = text unlike the corpus: gibberish, boilerplate
    // explosions, wrong-language fragments). Scale shape: the
    // vocabulary table is Zipf-bounded, so the word join shuffles
    // vocabulary-sized keys, and the per-doc mean is one groupBy on
    // doc_id; per-word ln terms round to 6dp then sum in exact decimal
    // so the mean is order-independent and engine-identical.
    "t10_lm_surprise" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"), explode(words(col("text"))).as("word"))
      val freq = toks.groupBy("word").agg(count(lit(1)).as("wf"))
      val total = toks.select(count(lit(1)).as("n_total"))
      toks.join(freq, "word")
        .crossJoin(broadcast(total))
        .withColumn("nll",
          round(-log(col("wf").cast("double") / col("n_total").cast("double")), 6))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          (sum(col("nll").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .cast("double") / count(lit(1))).as("mean_nll"))
        .orderBy("doc_id")
    }),

    // t06 repetition / composition signals (the Gopher-style filters a
    // crawl-cleaning pipeline gates on): duplicate-word mass, mean word
    // length, symbols-per-word. Pure map-side projection, one scan.
    "t06_repetition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ws = words(col("text"))
      val nw = size(ws)
      val nd = size(array_distinct(ws))
      val nonspace = length(regexp_replace(col("text"), "\\s", ""))
      val punct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
      d.select(
        col("doc_id"),
        nw.as("n_words"),
        nd.as("n_distinct_words"),
        round(lit(1.0) - nd.cast("double") / nw, 6).as("word_rep_ratio"),
        round(nonspace.cast("double") / nw, 6).as("mean_word_len"),
        round(punct.cast("double") / nw, 6).as("symbols_per_word"))
    }),

    // t05 PII redaction: the synthetic corpus carries no PII-shaped
    // spans, so each doc is first augmented with a deterministic
    // doc_id-derived email + phone — the redactor then has something
    // real to scrub and the oracle stays value-checkable. Pure map-side
    // projection (regexp_replace/regexp_count are codegen'd built-ins).
    "t05_pii" -> ((s, dir) => {
      val aug = concat(
        lit("user"), col("doc_id").cast("string"),
        lit("@mail.example.com wrote: "), col("text"),
        lit(" call +1-555-01"), col("doc_id").cast("string"))
      t(s, dir, "documents").select(
        col("doc_id"),
        piiRedact(aug).as("clean_text"),
        regexp_count(aug, lit(EmailPattern)).as("n_emails"),
        regexp_count(regexp_replace(aug, EmailPattern, "<EMAIL>"),
          lit(PhonePattern)).as("n_phones"))
    }),

    // t12 BM25 retrieval scoring (§2 #35): Okapi BM25 of a fixed query
    // term set against the corpus — the lexical-retrieval ranking a
    // curation pipeline uses to pull topic-relevant training docs (and
    // the baseline any embedding retriever is graded against).
    // Scale shape: tokens are scanned ONCE; the term filter prunes to
    // query-term hits BEFORE the (doc,word) aggregate, so the shuffle
    // carries O(matching docs × |query|) rows, not corpus tokens; df
    // and the corpus length stats are tiny broadcast aggregates;
    // top-k plans as TakeOrderedAndProject (no global window).
    // Float discipline: integer tf/df/dl through one identically-
    // parenthesized double expression, per-term contributions rounded
    // to 6 dp then DECIMAL-summed (order-independent, engine-identical
    // — the t10 pattern).
    "t12_bm25" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
      val stats = toks.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = toks
        .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
        .filter(col("word").isin(Bm25Terms: _*))
        .groupBy("doc_id", "dl", "word").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("word")
        .agg(countDistinct(col("doc_id")).as("df"))
      tf.join(broadcast(dfq), "word")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("contrib", round(
          col("idf") * (col("tf") * (lit(Bm25K1) + 1.0)) /
            (col("tf") + lit(Bm25K1) *
              (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))), 6))
        .groupBy("doc_id")
        .agg(sum(col("contrib").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double").as("score"),
          count(lit(1)).cast("int").as("n_terms"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(Bm25TopK)
    }))

  /** t16's shared shape in either decimal mode. Exact mode (the oracle
    * path): per-term NLLs round at 6 dp and sum in exact DECIMAL(28,6)
    * so the doc rollup is order-independent and bit-matches DuckDB.
    * Production mode (`t16_fast_double`, bench-only — the h01 dual-mode
    * pattern): the same plan with a plain double NLL sum, staying in
    * whole-stage codegen's primitive fast path; FastMathSpec bounds the
    * drift vs exact. */
  private[graft] def bigramPpl(s: SparkSession, dir: String,
      exactDecimal: Boolean): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    // scan fan-out for the bigram explode chain (ABBA A/B at sf0.1:
    // min 1.10 -> 0.92 s, fan faster in all 6 interleaved pairs)
    val docsW = fanScan(t(s, dir, "documents"))
      .select(col("doc_id"), words(col("text")).as("w"))
    val bi = docsW.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bf = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(eager = false) // vocab-sized; read 3x below
    val leftCounts = bf.groupBy("w1").agg(sum(col("c12")).as("c1"))
    // model vocabulary = words observable in bigram events, derived
    // from the (already aggregated) bigram table — the corpus is
    // scanned exactly TWICE (bigram counting, scoring), never a
    // third time for a unigram pass
    val vocab = bf.select(col("w1").as("t")).union(bf.select(col("w2").as("t")))
      .agg(countDistinct(col("t")).as("v"))
    val nllSum =
      if (exactDecimal) sum(col("nll").cast(dec6)).cast("double")
      else sum(col("nll"))
    // the per-bigram NLL depends ONLY on model-side values (c12, c1, V),
    // so it is computed once per DISTINCT bigram on the vocabulary-sized
    // model table and the corpus side joins a finished double — not per
    // occurrence, which evaluated log+round corpus-bigram times (~1000×
    // the distinct count at sf10) and was t16's real residual cost (the
    // round-11 verdict: the fast twin bought ~10 % because the decimal
    // sum never was the bottleneck; this is)
    val model = bf.join(leftCounts, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), round(-log(
        (col("c12").cast("double") + lit(BigramK)) /
          (col("c1").cast("double") + lit(BigramK) * col("v").cast("double"))), 6)
        .as("nll"))
    // model is vocab-sized BY CONSTRUCTION (one row per distinct
    // bigram) but its subtree ends in a cross join whose size estimate
    // is unknown, so the unhinted planner picked the CORPUS side as
    // the build relation (measured at sf1: broadcasting 5M occurrence
    // rows, 2.7 s → 6.3 s). The hint states what the plan shape
    // already guarantees; at vocabularies too big for one executor the
    // join degrades to shuffle by removing the hint, not by rewriting.
    bi.join(broadcast(model), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (nllSum / count(lit(1))).as("mean_nll"))
      .withColumn("ppl", round(exp(col("mean_nll")), 4))
      .orderBy("doc_id")
  }

  /** Bench hook: t16 in production (double-sum) mode. */
  def bigramPplFast(s: SparkSession, dir: String): DataFrame =
    bigramPpl(s, dir, exactDecimal = false)

  /** t19: corpus pass → vocabulary, then the merge loop. Trainer input
    * is restricted to pure-alnum words: BPE training always runs after
    * pre-tokenization, and the restriction is also what makes the
    * `(sym)` string encoding below collision-free (symbols can never
    * contain the delimiter characters). */
  def bpeTrain(s: SparkSession, dir: String,
               steps: Int = BpeTrainSteps): DataFrame =
    bpeTrainMerges(s, bpeVocab0(s, dir), steps)

  /** The trainer's initial vocabulary: one row per distinct eligible
    * word, `repr` its character-split symbol encoding. */
  def bpeVocab0(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 2 && col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(col("c"), regexp_replace(col("word"), "(.)", "($1)").as("repr"))

  /** The merge-training loop over a (c, repr) vocabulary, where `repr`
    * encodes a word's current symbol sequence as `(s1)(s2)...(sn)`.
    *
    * Why a string encoding and not a symbol array: applying one merge
    * is then a single codegen'd `regexp_replace` whose global
    * replacement IS the trainer's left-to-right non-overlap semantics
    * (the scan resumes after each match, so `(a)(a)(a)` under merge
    * (a,a) yields `(aa)(a)`, never `(aa)(aa)`), and the pattern can
    * never match mid-symbol because every occurrence carries its own
    * `)(`-delimiters — adjacent matches share no characters. The same
    * two regex calls replay identically in the DuckDB oracle (RE2 and
    * Java regex agree on all constructs used: one dot-capture and
    * literal alternation-free patterns).
    *
    * Scale shape: the loop state is the VOCABULARY (one row per
    * distinct word), localCheckpoint'd each round so iteration k's
    * lineage does not replay rounds 1..k-1 (the GraphRank loop
    * discipline); per round one vocabulary-sized aggregate + a 1-row
    * argmax collect. The corpus is touched exactly once, by the
    * vocab build in [[bpeTrain]].
    *
    * Round-17: the per-round checkpoint is LAZY (`localCheckpoint(
    * eager = false)`) — round k's own argmax job materializes it, so a
    * round costs ONE Spark job instead of two (measured 64 ms fixed
    * overhead per job at sf0.1; the eager form spent half the
    * trainer's wall time on checkpoint-only jobs). Same lineage
    * truncation, same state, same merges — an eager checkpoint just
    * pays a dedicated job for what the next aggregate does anyway. */
  def bpeTrainMerges(s: SparkSession, vocab0: DataFrame,
                     steps: Int): DataFrame =
    bpeTrainLoop(s, vocab0, steps)._1

  /** The loop itself, returning BOTH the merge table and the FINAL
    * vocabulary state (every non-`repr` column of `vocab0` carried
    * through unchanged). The final state is t20's encoder for free:
    * after k merges each word's `repr` IS its fully-merged symbol
    * sequence, so the encode pass never re-applies a single merge —
    * it reads token counts off the vocabulary the trainer already
    * materialized (the t16 discipline: per-DISTINCT-word work happens
    * on the vocabulary-sized table, never per corpus occurrence). */
  private[queries] def bpeTrainLoop(s: SparkSession, vocab0: DataFrame,
                     steps: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    var vocab = vocab0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var dry = false
    while (k <= steps && !dry) {
      topPairs(vocab, 1).headOption match {
        case None => dry = true // every word fused to one symbol
        case Some((a, b, cnt)) =>
          merges += ((k, a, b, cnt))
          vocab = vocab.withColumn("repr",
            regexp_replace(col("repr"), s"\\($a\\)\\($b\\)", s"($a$b)"))
            .localCheckpoint(eager = false)
          k += 1
      }
    }
    (merges.result().toDF("step", "merge_a", "merge_b", "pair_count"), vocab)
  }

  /** Top-`n` adjacent-symbol pairs of a (c, repr) vocabulary by
    * (count DESC, a ASC, b ASC) — the per-round argmax of both trainer
    * loops, as ONE Spark job.
    *
    * Round-17: this was a groupBy(a, b) + orderBy + limit DataFrame
    * aggregate — semantically identical, but under AQE it executes as
    * TWO stage-jobs per round (shuffle-map, then TakeOrdered), and at
    * the fixed ~60 ms/job driver overhead the 10-round trainer spent
    * more time scheduling than counting (measured: 22 jobs, ~1.4 s at
    * sf0.1, pair counting itself ~5 ms/round). Per-partition hash maps
    * merged with `reduce` produce the SAME exact counts and the same
    * total-order tie-break in a single job per round. Memory shape:
    * one (pair → count) entry per DISTINCT adjacent pair — bounded by
    * the summed symbol length of the vocabulary, the same bound the
    * shuffle form's hash aggregate carries; merge maps live one (plus
    * one incoming) at a time on the driver. A trainer at production
    * merge budgets uses [[bpeTrainBatched]] either way (VERDICT r16
    * item 5), which amortizes the per-round cost over `batch` merges. */
  private def topPairs(vocab: DataFrame, n: Int): Seq[(String, String, Long)] = {
    def mergeInto(m1: scala.collection.mutable.HashMap[String, Long],
        m2: scala.collection.mutable.HashMap[String, Long]) = {
      val (into, from) = if (m1.size >= m2.size) (m1, m2) else (m2, m1)
      from.foreach { case (k, v) => into.update(k, into.getOrElse(k, 0L) + v) }
      into
    }
    val total = vocab.select(col("c"), col("repr")).rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { r =>
        val c = r.getLong(0)
        val repr = r.getString(1)
        // symbols of "(s1)(s2)...(sn)": split the delimiter-stripped
        // body on ")(" — the same parse the SQL form used
        val syms = repr.substring(1, repr.length - 1).split("\\)\\(")
        var i = 0
        while (i < syms.length - 1) {
          // alnum-only symbols can never contain ')', so ")(" is an
          // unambiguous, collision-free pair-key separator
          val key = syms(i) + ")(" + syms(i + 1)
          m.update(key, m.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      Iterator.single(m)
    }.reduce(mergeInto)
    val ord = Ordering.by[(String, String, Long), (Long, String, String)] {
      case (a, b, cnt) => (-cnt, a, b)
    }
    total.iterator.map { case (key, cnt) =>
      val Array(a, b) = key.split("\\)\\(", 2)
      (a, b, cnt)
    }.toSeq.sorted(ord).take(n)
  }

  /** BATCHED merge training — the production-merge-budget form of
    * [[bpeTrainLoop]]. The sequential loop pays one driver round-trip
    * (a 1-row argmax collect) per merge: fine at the fixture's
    * 10-step budget, O(32k) Spark jobs at a real vocabulary size. This
    * variant selects up to `batch` merges per round under an explicit
    * disjointness rule and applies them in ONE vocabulary projection,
    * cutting driver round-trips (and pair-count aggregates) by ~batch×.
    *
    * The batch rule, stated exactly (the spec pins it):
    *  - rank all pairs by (count DESC, a ASC, b ASC) and take the top
    *    `4·batch` as the candidate pool (collected — ≤ 4·batch rows);
    *  - scan the pool in rank order, keeping a pair iff it shares NO
    *    symbol with any pair already kept this round, until `batch`
    *    pairs are kept or the pool is exhausted;
    *  - apply the kept merges to every word in rank order within one
    *    projection (a fold of regexp_replace calls).
    *
    * Why symbol-disjointness makes the batch well-defined: merging
    * (a,b) only creates adjacencies involving the new symbol `ab` and
    * only destroys adjacencies containing a or b — the count of ANY
    * pair sharing no symbol with (a,b) is invariant under the merge.
    * Kept pairs are pairwise disjoint, so their counts at selection
    * time equal their counts at application time whatever the order,
    * and within-round sequential application ≡ batch application.
    * (This is a batched APPROXIMATION of classic BPE, not an
    * equivalent: classic recounts after every merge and may next pick
    * a pair this rule defers. batch = 1 reduces EXACTLY to
    * [[bpeTrainLoop]] — pool head = global argmax — which is how the
    * variant inherits the t19 oracle: TextQueriesSpec pins the
    * batch=1 merge table byte-identical to the sequential one.)
    *
    * Returns the merge table with its `round` column (which fold of
    * the loop emitted each merge) so the disjointness invariant is
    * externally checkable, plus the final vocabulary state. */
  /** Public surface of [[bpeTrainBatchedLoop]]: the merge table. */
  def bpeTrainBatched(s: SparkSession, vocab0: DataFrame,
      steps: Int, batch: Int): DataFrame =
    bpeTrainBatchedLoop(s, vocab0, steps, batch)._1

  private[queries] def bpeTrainBatchedLoop(s: SparkSession, vocab0: DataFrame,
      steps: Int, batch: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    require(batch >= 1, s"batch must be >= 1 (got $batch)")
    var vocab = vocab0.localCheckpoint()
    val merges = Seq.newBuilder[(Int, Int, String, String, Long)]
    var k = 1
    var round = 1
    var dry = false
    while (k <= steps && !dry) {
      val want = math.min(batch, steps - k + 1)
      val pool = topPairs(vocab, 4 * batch)
      if (pool.isEmpty) dry = true
      else {
        val kept = Seq.newBuilder[(String, String, Long)]
        val used = scala.collection.mutable.Set[String]()
        var n = 0
        pool.iterator.takeWhile(_ => n < want).foreach { case (a, b, cnt) =>
          if (!used(a) && !used(b)) {
            kept += ((a, b, cnt))
            used += a; used += b
            n += 1
          }
        }
        val batchKept = kept.result()
        batchKept.foreach { case (a, b, cnt) =>
          merges += ((k, round, a, b, cnt))
          k += 1
        }
        val repr = batchKept.foldLeft(col("repr")) { case (c, (a, b, _)) =>
          regexp_replace(c, s"\\($a\\)\\($b\\)", s"($a$b)")
        }
        vocab = vocab.withColumn("repr", repr).localCheckpoint(eager = false)
        round += 1
      }
    }
    (merges.result().toDF("step", "round", "merge_a", "merge_b", "pair_count"),
      vocab)
  }

  /** t20: BPE ENCODE — apply t19's learned merges to the corpus and
    * count TRUE tokenizer tokens per document (t03 counts
    * pre-tokenization words; this is the other half of the tokenizer
    * story, and the count a real token-budget pass would feed p09).
    *
    * Shape: the trainer's final vocabulary state already holds each
    * distinct word's fully-merged symbol sequence, so encoding is a
    * LENGTH EXPRESSION over the vocabulary (symbols = ')' count), not
    * a per-occurrence regex replay — per-word work runs once per
    * DISTINCT word (t16's model-side discipline). The corpus then
    * joins the vocabulary-sized (word → token count) table broadcast
    * and aggregates per doc: corpus scanned twice total (vocabulary
    * build, encode join), one doc-keyed shuffle. A vocabulary too big
    * for one executor degrades to a shuffle join by removing the
    * hint, not by rewriting.
    *
    * Word domain = the trainer's (pure-alnum, length ≥ 2): BPE runs
    * after pre-tokenization, and the alnum restriction is also the
    * regex-metachar injection guard on the merge patterns. Docs with
    * zero eligible words are absent (matching the oracle's join). */
  def bpeEncode(s: SparkSession, dir: String,
                steps: Int = BpeTrainSteps): DataFrame = {
    val docs = t(s, dir, "documents")
    def eligibleWords(d: DataFrame): DataFrame = d
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 2 && col("word").rlike("^[a-z0-9]+$"))
    val vocab0 = eligibleWords(docs)
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(col("word"), col("c"),
        regexp_replace(col("word"), "(.)", "($1)").as("repr"))
    val (_, finalVocab) = bpeTrainLoop(s, vocab0, steps)
    // tokens per word = symbol count = number of ')' delimiters
    val wordToks = finalVocab.select(col("word"),
      (length(col("repr")) - length(translate(col("repr"), ")", "")))
        .cast("long").as("tok"))
    eligibleWords(docs)
      .join(broadcast(wordToks), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("tok")).as("n_bpe_tokens"))
  }

  /** t19's DuckDB oracle: the trainer unrolled as a CTE chain (t17's
    * recipe) — v0 is the vocabulary, then per step k: pair counts over
    * v(k-1), a 1-row argmax (same count-desc/lexicographic tie-break),
    * and v(k) via the same delimiter-anchored global regexp_replace. */
  private def bpeTrainOracleSql(steps: Int): String = {
    val union = (1 to steps)
      .map(k => s"SELECT $k AS step, a, b, cnt FROM m$k")
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeChainSql(steps, keepWord = false)}
       |SELECT CAST(step AS INTEGER) AS step, a AS merge_a, b AS merge_b,
       |  cnt AS pair_count
       |FROM ($union)
       |ORDER BY step""".stripMargin
  }

  /** The trainer replay CTEs shared by t19's and t20's oracles: v0 is
    * the vocabulary, then per step k pair counts over v(k-1), a 1-row
    * argmax (same count-desc/lexicographic tie-break as the Spark
    * loop), and v(k) via the same delimiter-anchored global
    * regexp_replace. `keepWord` carries the word through every v(k) —
    * t20 needs the final state as a word → repr encoder; t19's merge
    * replay doesn't pay for the extra column. */
  private def bpeChainSql(steps: Int, keepWord: Boolean): String = {
    val w = if (keepWord) "word, " else ""
    val v0 =
      s"""v0 AS (
         |  SELECT ${w}COUNT(*) AS c, regexp_replace(word, '(.)', '(\\1)', 'g') AS repr
         |  FROM (SELECT unnest(${sqlWords("text")}) AS word FROM documents)
         |  WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+$$')
         |  GROUP BY word)""".stripMargin
    val chain = (1 to steps).map { k =>
      s"""p$k AS (
         |  SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(c) AS BIGINT) AS cnt
         |  FROM (SELECT c, s, unnest(range(1, len(s))) AS i
         |        FROM (SELECT c, string_split(trim(repr, '()'), ')(') AS s
         |              FROM v${k - 1}))
         |  GROUP BY 1, 2),
         |m$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |v$k AS (
         |  SELECT ${w}c, regexp_replace(repr,
         |    '\\(' || a || '\\)\\(' || b || '\\)', '(' || a || b || ')', 'g') AS repr
         |  FROM v${k - 1} CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s"""$v0,
       |$chain""".stripMargin
  }

  /** t20's oracle: the shared trainer replay with `word` carried to the
    * final vocabulary state, token counts as the ')'-count length
    * expression, and the same eligible-word corpus join + per-doc
    * rollup the Spark side plans. */
  private[queries] def bpeEncodeOracleSql(steps: Int): String =
    s"""WITH ${bpeChainSql(steps, keepWord = true)},
       |wt AS (
       |  SELECT word, CAST(length(repr) - length(replace(repr, ')', '')) AS BIGINT) AS tok
       |  FROM v$steps),
       |dw AS (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, unnest(${sqlWords("text")}) AS word FROM documents)
       |  WHERE length(word) >= 2 AND regexp_matches(word, '^[a-z0-9]+$$'))
       |SELECT doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(tok) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN wt USING (word)
       |GROUP BY doc_id""".stripMargin

  // The map-only queries' oracles (t01-t06, t14) carry NO ORDER BY,
  // matching their unsorted Spark sides: the driver compare and
  // selfcheck canonicalize by sorting rows, and the oracle text is also
  // what baseline_duckdb.py TIMES — a sorted oracle against an unsorted
  // Spark plan would skew the cross-engine ratio (round-15 symmetry fix).
  val oracles: Map[String, String] = Map(
    "t19_bpe_train" -> bpeTrainOracleSql(BpeTrainSteps),
    "t20_bpe_encode" -> bpeEncodeOracleSql(BpeTrainSteps),

    "t01_langid" -> {
      val scores = langs.map(l => s"${sqlScore(l)} AS s_$l").mkString(",\n  ")
      val cases = langs.init.zipWithIndex.map { case (lang, i) =>
        val rest = langs.drop(i + 1)
        s"WHEN ${rest.map(r => s"s_$lang >= s_$r").mkString(" AND ")} THEN '$lang'"
      }.mkString(" ")
      s"""SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
         |  CASE $cases ELSE '${langs.last}' END AS lang_pred
         |FROM (SELECT doc_id,
         |  $scores
         |FROM documents)""".stripMargin
    },

    "t02_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars_calc,
         |  ${sqlWsTokenCount("text")} AS n_words,
         |  CAST(length(text) AS DOUBLE) / ${sqlWsTokenCount("text")} AS avg_word_len,
         |  ${sqlPunctRatio("text")} AS punct_ratio,
         |  CAST(${sqlStopwordHits(sqlWords("text"), Stopwords.toMap.apply("en"))} AS DOUBLE)
         |    / ${sqlWsTokenCount("text")} AS stop_ratio,
         |  (CASE WHEN ${sqlWsTokenCount("text")} BETWEEN 10 AND 500 THEN 1.0 ELSE 0.5 END
         |    * (1.0 - ${sqlPunctRatio("text")})) AS quality_score
         |FROM documents""".stripMargin,

    "t09_quality_gate" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    (1.0 - CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE)
         |      / len(${sqlWords("text")})) AS q
         |  FROM documents),
         |hist AS (SELECT lang, q, COUNT(*) AS cnt FROM scored GROUP BY lang, q),
         |c AS (SELECT lang, q,
         |    SUM(cnt) OVER (PARTITION BY lang ORDER BY q
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(cnt) OVER (PARTITION BY lang) AS n
         |  FROM hist),
         |med AS (SELECT lang, MIN(q) AS med FROM c
         |  WHERE cum >= CEIL(n / 2.0) GROUP BY lang)
         |SELECT s.doc_id, s.lang, round(s.q, 6) AS word_rep_ratio
         |FROM scored s JOIN med USING (lang) WHERE s.q <= med.med
         |ORDER BY s.doc_id""".stripMargin,

    "t03_tokens" ->
      s"""SELECT doc_id,
         |  ${sqlWsTokenCount("text")} AS ws_tokens,
         |  ${sqlBpeTokenCount("text")} AS bpe_tokens
         |FROM documents""".stripMargin,

    "t04_fingerprint" ->
      s"""SELECT doc_id, ${sqlFingerprint("text")} AS fp,
         |  length(text) AS raw_len
         |FROM documents""".stripMargin,

    "t08_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, word, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(${sqlWords("text")}) AS word FROM documents)
         |  GROUP BY doc_id, word),
         |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
         |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tf.word, tf.tf, dfreq.df,
         |    round(tf.tf * ln((tot.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
         |  FROM tf JOIN dfreq USING (word) CROSS JOIN tot)
         |SELECT doc_id, word, tf, df, tfidf, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "t10_lm_surprise" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${sqlWords("text")}) AS word FROM documents),
         |freq AS (SELECT word, COUNT(*) AS wf FROM toks GROUP BY word),
         |tot AS (SELECT COUNT(*) AS n_total FROM toks),
         |nlls AS (
         |  SELECT doc_id,
         |    round(-ln(CAST(wf AS DOUBLE) / CAST(n_total AS DOUBLE)), 6) AS nll
         |  FROM toks JOIN freq USING (word) CROSS JOIN tot)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_nll
         |FROM nlls GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t07_vocab" ->
      s"""SELECT word, COUNT(*) AS freq,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |FROM (SELECT doc_id, unnest(${sqlWords("text")}) AS word FROM documents)
         |GROUP BY word ORDER BY freq DESC, word LIMIT 100""".stripMargin,

    // t13: identical pair enumeration — per unique word, substrings of
    // width 2 at positions 1..len-1, weighted by the word's corpus count
    "t13_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(${sqlWords("text")}) AS word FROM documents),
         |wc AS (SELECT word, COUNT(*) AS c FROM w
         |  WHERE length(word) >= 2 GROUP BY word),
         |p AS (SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, c
         |  FROM (SELECT word, c, unnest(range(1, length(word))) AS i FROM wc))
         |SELECT pair, CAST(SUM(c) AS BIGINT) AS pair_count
         |FROM p GROUP BY pair
         |ORDER BY pair_count DESC, pair LIMIT $BpeTopPairs""".stripMargin,

    "t11_collocations" ->
      s"""WITH w AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
         |uni AS (SELECT unnest(w) AS word FROM w),
         |uf AS (SELECT word, COUNT(*) AS uf FROM uni GROUP BY word),
         |tot AS (SELECT COUNT(*) AS n_total FROM uni),
         |bi AS (SELECT w[i+1] AS w1, w[i+2] AS w2
         |  FROM (SELECT w, unnest(range(0, len(w) - 1)) AS i
         |        FROM w WHERE len(w) >= 2)),
         |bf AS (SELECT w1, w2, COUNT(*) AS freq FROM bi
         |  GROUP BY w1, w2 HAVING COUNT(*) >= $MinBigramFreq)
         |SELECT bf.w1 || ' ' || bf.w2 AS bigram, bf.freq,
         |  round(ln((CAST(bf.freq AS DOUBLE) * CAST(tot.n_total AS DOUBLE)) /
         |    (CAST(u1.uf AS DOUBLE) * CAST(u2.uf AS DOUBLE))), 6) AS pmi
         |FROM bf
         |JOIN uf u1 ON bf.w1 = u1.word
         |JOIN uf u2 ON bf.w2 = u2.word
         |CROSS JOIN tot
         |ORDER BY pmi DESC, bigram LIMIT 100""".stripMargin,

    // t17: identical graph build (t11's floored bigrams, symmetrized),
    // then the ten decimal-exact power iterations UNROLLED as a CTE
    // chain — each iteration's per-edge contribution, decimal sum, and
    // damped update use the same literals and parenthesization as the
    // Spark loop, so every iteration reproduces bit for bit
    "t17_textrank" -> {
      val iterCtes = (1 to TextRankIters).map { i =>
        s"""r$i AS (SELECT e.dst AS word,
           |  round((1.0 - 0.85) + 0.85 * CAST(SUM(CAST(round(
           |      (CAST(e.w AS DOUBLE) * r.rank) / CAST(e.ow AS DOUBLE), 12)
           |    AS DECIMAL(28,12))) AS DOUBLE), 10) AS rank
           |  FROM e JOIN r${i - 1} r ON e.src = r.word GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (SELECT ${sqlWords("text")} AS w FROM documents),
         |bi AS (SELECT w[i+1] AS w1, w[i+2] AS w2
         |  FROM (SELECT w, unnest(range(0, len(w) - 1)) AS i
         |        FROM w WHERE len(w) >= 2)),
         |bf AS (SELECT w1, w2, COUNT(*) AS freq FROM bi
         |  GROUP BY w1, w2 HAVING COUNT(*) >= $MinBigramFreq AND w1 <> w2),
         |edges AS (SELECT src, dst, CAST(SUM(f) AS BIGINT) AS w FROM (
         |    SELECT w1 AS src, w2 AS dst, freq AS f FROM bf
         |    UNION ALL SELECT w2, w1, freq FROM bf) GROUP BY src, dst),
         |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
         |e AS (SELECT edges.src, edges.dst, edges.w, ow.ow
         |      FROM edges JOIN ow USING (src)),
         |r0 AS (SELECT DISTINCT src AS word, CAST(1.0 AS DOUBLE) AS rank FROM edges),
         |$iterCtes
         |SELECT word, rank FROM r$TextRankIters
         |ORDER BY rank DESC, word LIMIT $TextRankTopK""".stripMargin
    },

    // t18: exact weighted counts + literal-TRUE verdicts (the sketch's
    // guarantees are what Spark must reproduce)
    "t18_heavy_hitters" ->
      s"""WITH u AS (SELECT unnest(${sqlWords("text")}) AS w FROM documents),
         |e AS (SELECT w, CAST(COUNT(*) *
         |    (CASE WHEN substr(w, 1, 1) = 's' THEN $HhBoost ELSE 1 END)
         |    AS BIGINT) AS cnt FROM u GROUP BY w),
         |t AS (SELECT SUM(cnt) AS n FROM e)
         |SELECT w AS word, cnt, 1 AS in_sketch, 1 AS bound_ok
         |FROM e CROSS JOIN t WHERE cnt * ${HhK + 1} > n
         |ORDER BY cnt DESC, word""".stripMargin,

    // t12: identical BM25 arithmetic — integer tf/df/dl, constants
    // written in the same literal/parenthesis shape the Spark side
    // evaluates, 6-dp-rounded contributions DECIMAL-summed
    "t12_bm25" -> {
      val termsSql = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH tl AS (SELECT doc_id, ${sqlWords("text")} AS w,
         |    len(${sqlWords("text")}) AS dl FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM tl),
         |tf AS (SELECT doc_id, dl, word, COUNT(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(w) AS word FROM tl)
         |  WHERE word IN ($termsSql)
         |  GROUP BY doc_id, dl, word),
         |dfq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |contrib AS (SELECT t.doc_id,
         |    round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) *
         |      (t.tf * ($Bm25K1 + 1.0)) /
         |      (t.tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * t.dl / s.avgdl)), 6) AS c
         |  FROM tf t JOIN dfq d USING (word) CROSS JOIN stats s)
         |SELECT doc_id,
         |  CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS score,
         |  CAST(COUNT(*) AS INTEGER) AS n_terms
         |FROM contrib GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    },

    // t14: identical integer-arithmetic rules; nonspace/punct reuse
    // t06's regex character classes verbatim
    "t14_gopher_rules" ->
      s"""WITH f AS (SELECT doc_id,
         |    len(${sqlWords("text")}) AS nw,
         |    length(regexp_replace(text, '[$SqlWs]', '', 'g')) AS nonspace,
         |    length(regexp_replace(lower(text), '[a-z0-9$SqlWs]', '', 'g')) AS punct,
         |    len(list_filter(${sqlWords("text")}, x -> regexp_matches(x, '[a-z]'))) AS alphaw,
         |    ${sqlStopwordHits(sqlWords("text"), Stopwords.toMap.apply("en"))} AS sh
         |  FROM documents)
         |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
         |  (nw BETWEEN $GopherMinWords AND $GopherMaxWords) AS r_words,
         |  (nonspace >= nw * 3 AND nonspace <= nw * 10) AS r_word_len,
         |  (punct * 10 <= nw) AS r_symbols,
         |  (alphaw * 5 >= nw * 4) AS r_alpha,
         |  (sh >= 2) AS r_stopwords,
         |  ((nw BETWEEN $GopherMinWords AND $GopherMaxWords)
         |    AND (nonspace >= nw * 3 AND nonspace <= nw * 10)
         |    AND (punct * 10 <= nw) AND (alphaw * 5 >= nw * 4)
         |    AND (sh >= 2)) AS passes
         |FROM f""".stripMargin,

    // t16: identical bigram generation (t11's), identical smoothing
    // arithmetic and parenthesization; integer counts → one double
    // expression → 6-dp round → exact decimal sum
    "t16_bigram_ppl" ->
      s"""WITH w AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
         |bi AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
         |  FROM (SELECT doc_id, w, unnest(range(0, len(w) - 1)) AS i
         |        FROM w WHERE len(w) >= 2)),
         |bf AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
         |lc AS (SELECT w1, SUM(c12) AS c1 FROM bf GROUP BY w1),
         |voc AS (SELECT COUNT(*) AS v
         |  FROM (SELECT w1 FROM bf UNION SELECT w2 FROM bf)),
         |nlls AS (SELECT doc_id, round(-ln(
         |      (CAST(c12 AS DOUBLE) + $BigramK)
         |    / (CAST(c1 AS DOUBLE) + $BigramK * CAST(v AS DOUBLE))), 6) AS nll
         |  FROM bi JOIN bf USING (w1, w2) JOIN lc USING (w1) CROSS JOIN voc)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_nll,
         |  round(exp(CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)), 4) AS ppl
         |FROM nlls GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // t15: identical hash → bucket → md5-derived weight → exact decimal
    // mean; label compares the same double in both engines
    "t15_classifier" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${sqlWords("text")}) AS word FROM documents),
         |tb AS (SELECT doc_id,
         |    ('0x' || substr(md5('clf|' || word), 1, 4))::BIGINT % $ClfBuckets AS b
         |  FROM toks),
         |tw AS (SELECT doc_id,
         |    round((('0x' || substr(md5('w|' || CAST(b AS VARCHAR)), 1, 4))::BIGINT
         |      - 32767.5) / 65535.0, 6) AS w
         |  FROM tb)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS score,
         |  (CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) > 0) AS label
         |FROM tw GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t06_repetition" ->
      s"""SELECT doc_id,
         |  len(${sqlWords("text")}) AS n_words,
         |  len(list_distinct(${sqlWords("text")})) AS n_distinct_words,
         |  round(1.0 - CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE)
         |    / len(${sqlWords("text")}), 6) AS word_rep_ratio,
         |  round(CAST(length(regexp_replace(text, '[$SqlWs]', '', 'g')) AS DOUBLE)
         |    / len(${sqlWords("text")}), 6) AS mean_word_len,
         |  round(CAST(length(regexp_replace(lower(text), '[a-z0-9$SqlWs]', '', 'g')) AS DOUBLE)
         |    / len(${sqlWords("text")}), 6) AS symbols_per_word
         |FROM documents""".stripMargin,

    "t05_pii" ->
      s"""WITH aug AS (SELECT doc_id,
         |  'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com wrote: '
         |    || text || ' call +1-555-01' || CAST(doc_id AS VARCHAR) AS t
         |  FROM documents)
         |SELECT doc_id, ${sqlPiiRedact("t")} AS clean_text,
         |  len(regexp_extract_all(t, '$EmailPattern')) AS n_emails,
         |  len(regexp_extract_all(
         |    regexp_replace(t, '$EmailPattern', '<EMAIL>', 'g'),
         |    '$PhonePattern')) AS n_phones
         |FROM aug""".stripMargin)
}
