package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2 #18–#28). Everything here composes codegen'd built-ins
  * from `org.apache.spark.sql.functions` — no UDFs — and each builder has
  * an exact DuckDB SQL twin (the `sql*` methods) so the driver's oracle
  * compare is bit-deterministic across engines (SURVEY §5).
  *
  * The reference engine's content mandate is the north-star capability
  * set; nothing here ports reference code (the reference is a relational
  * GPU engine with no text operators — these are the mandated extensions).
  */
object TextFunctions {

  /** Java regex `\s` is `[ \t\n\x0B\f\r]` but RE2's (DuckDB's) `\s`
    * EXCLUDES vertical tab — the one divergence between the engines'
    * regex dialects this library touches. The SQL twins therefore spell
    * the class out (identical to Java's `\s`), so a corpus containing
    * \x0B still hash-matches the oracle. */
  val SqlWs = """ \t\n\f\r\x0B"""

  /** Whitespace-collapsed, trimmed, lower-cased content — the canonical
    * form shared by fingerprinting (t04) and exact dedup (d01). */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))
  def sqlNormText(e: String): String =
    s"lower(trim(regexp_replace($e, '[$SqlWs]+', ' ', 'g')))"

  /** 128-bit content fingerprint of the normalized text (t04/d01).
    * md5 chosen over xxhash because both Spark and DuckDB expose it with
    * identical hex-string output (SURVEY §5 cross-engine determinism). */
  def fingerprint(c: Column): Column = md5(normText(c))
  def sqlFingerprint(e: String): String = s"md5(${sqlNormText(e)})"

  /** Whitespace token count (t03): runs of non-space characters.
    * Counted with [[TokenCount]] (one pass over the UTF-8 bytes, no
    * regex engine, no decoded-string copy) — identical to
    * `size(regexp_extract_all(_, '\\S+', 0))`, pinned by
    * RegexpCountSpec. */
  def wsTokenCount(c: Column): Column =
    TokenCount.tokenCount(c, "ws")
  def sqlWsTokenCount(e: String): String =
    s"len(regexp_extract_all(trim($e), '[^$SqlWs]+'))"

  /** BPE-ish subword-boundary token count (t03): letter runs, digit
    * runs, and single non-alphanumeric marks — the pre-tokenization
    * split most BPE vocabularies start from. Counted with
    * [[TokenCount]] (byte-level class walk, no regex engine); the
    * lower() stays OUTSIDE so the composition matches the regex form
    * and the SQL twin exactly. */
  // the explicit class spelling keeps the SHARED pattern string
  // identical to `[^a-z0-9\s]` in Java while staying \x0B-correct in RE2
  val BpePattern = s"[a-z]+|[0-9]+|[^a-z0-9$SqlWs]"
  def bpeTokenCount(c: Column): Column =
    TokenCount.tokenCount(lower(c), "bpe")
  def sqlBpeTokenCount(e: String): String =
    s"len(regexp_extract_all(lower($e), '$BpePattern'))"

  /** Lower-cased whitespace word list — input to stopword scoring and
    * shingling. Single-space split (the corpus is single-spaced; for
    * arbitrary text compose with [[normText]]). */
  def words(c: Column): Column = split(lower(c), " ")
  def sqlWords(e: String): String = s"string_split(lower($e), ' ')"

  /** Count of words that fall in a fixed stopword set (t01/t02) — the
    * native codegen'd expression ([[StopwordHits]]: shared HashSet +
    * primitive loop; the composed `size(filter(...))` form pays an
    * interpreted lambda and a linear IN scan per word). */
  def stopwordHits(wordsCol: Column, stop: Seq[String]): Column =
    StopwordHits.stopwordHits(wordsCol, stop)
  def sqlStopwordHits(wordsExpr: String, stop: Seq[String]): String =
    s"len(list_filter($wordsExpr, w -> w IN (${stop.map(s => s"'$s'").mkString(",")})))"

  /** Small public stopword sets per language (t01's n-gram/stopword
    * heuristic). Deliberately tiny: the langid signal is argmax of hit
    * counts, not coverage. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "uno", "una", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Ratio of non-alphanumeric, non-space characters (t02). */
  def punctRatio(c: Column): Column =
    length(regexp_replace(lower(c), "[a-z0-9\\s]", "")).cast("double") / length(c)
  def sqlPunctRatio(e: String): String =
    s"(CAST(length(regexp_replace(lower($e), '[a-z0-9$SqlWs]', '', 'g')) AS DOUBLE) / length($e))"

  /** PII scrubbing (t05): email and phone-number shaped spans replaced
    * with typed placeholders. Patterns restricted to constructs whose
    * semantics are identical in Java regex (Spark, codegen'd
    * regexp_replace) and RE2 (DuckDB): `(?i)`, character classes and
    * greedy quantifiers — no alternation/backrefs. Emails first so the
    * phone pass never splits an address's digit runs. The phone class
    * admits separators (dots, parens, spaces) but must END on a digit,
    * so it never swallows trailing prose; over-matching adjacent digit
    * groups is accepted — for a scrubber, over-redaction is the safe
    * failure mode. */
  val EmailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+"
  val PhonePattern = "[+]?[(]?[0-9][0-9() .-]{5,}[0-9]"
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
  def sqlPiiRedact(e: String): String =
    s"regexp_replace(regexp_replace($e, '$EmailPattern', '<EMAIL>', 'g'), " +
      s"'$PhonePattern', '<PHONE>', 'g')"

  /** Word `k`-shingles joined with spaces (MinHash/Jaccard input,
    * d02/d04). `sequence` + `slice` stay inside codegen; documents with
    * fewer than `k` words yield their full text as one shingle so no
    * row silently drops out of dedup. */
  def shingles(wordsCol: Column, k: Int): Column = {
    val n = size(wordsCol)
    when(n < k, array(concat_ws(" ", wordsCol)))
      .otherwise(transform(
        sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(wordsCol, i, lit(k)))))
  }
  def sqlShingles(wordsExpr: String, k: Int): String =
    s"""CASE WHEN len($wordsExpr) < $k
       | THEN [array_to_string($wordsExpr, ' ')]
       | ELSE list_transform(generate_series(1, len($wordsExpr) - ${k - 1}),
       |        i -> array_to_string($wordsExpr[i:i+${k - 1}], ' '))
       |END""".stripMargin.replace("\n", " ")
}
