package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY §2 C1-C4) — all built from
  * `org.apache.spark.sql.functions` higher-order functions, so everything
  * stays inside whole-stage codegen (no UDFs anywhere).
  *
  * Every function here has an exact DuckDB twin used by the oracle; the
  * paired SQL fragments live next to the Spark builders (`*Duck`) so the
  * two dialects can never drift apart silently. Parity rules (SURVEY §4):
  * integer arithmetic everywhere hashes are involved; ratios are a single
  * int→double division.
  */
object TextFunctions {

  /** Tokenizer: lowercase, strip non-alphanumerics to spaces, split, drop
    * empties. The `[^a-z0-9]+` class is applied AFTER lower(). */
  def tokens(text: Column): Column =
    filter(split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " "),
      t => t =!= "")

  def tokensDuck(c: String): String =
    s"list_filter(str_split_regex(trim(regexp_replace(lower($c), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"

  /** C1 — token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** C1x — GPT-2-style pretokenizer: contraction suffixes, then
    * space-prefixed letter / digit / punctuation runs, then residual
    * whitespace. Both regex dialects (java.util.regex, RE2) use
    * leftmost-first alternation, so match COUNTS agree exactly. */
  val bpePattern = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  /** Same pattern with the leading apostrophe doubled for a DuckDB
    * single-quoted literal (RE2 sees the identical pattern). */
  val bpeDuckPattern = "''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** C9 — PII patterns, written in the dialect common to java.util.regex
    * (Spark) and RE2 (DuckDB oracle): character classes + bounded
    * repetition only — no lookarounds, no backrefs (RE2 has neither). */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiUrl   = "https?://[A-Za-z0-9._/-]+"
  val piiPhone = "\\+[0-9][0-9 ]{6,}[0-9]"

  /** C4 — rolling polynomial fingerprint over the character stream:
    * h = (h*31 + ascii(c)) mod 1e9+7, left fold. Deterministic integer
    * arithmetic — the oracle computes the identical fold. */
  def charFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * lit(31L) + ascii(c), lit(1000000007L)))

  def charFingerprintDuck(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(str_split($c, ''), ch -> ascii(ch))), (h, ch) -> (h * 31 + ch) % 1000000007)"

  /** C4 production path — 64-bit xxhash of the whole text; no fold, no
    * vocabulary, one codegen'd call per row. Not oracle-comparable (DuckDB
    * has no xxhash64), hence the separate deterministic fold above. */
  def xxFingerprint(text: Column): Column = xxhash64(text)

  /** C15 — Unicode NFC normalization via the native codegen expression
    * ([[NfcNormalizeExpr]]; Spark has no built-in). DuckDB twin:
    * `nfc_normalize`. */
  def nfcNormalize(text: Column): Column = call_function("graft_nfc", text)

  /** C15 — accent stripping (NFD → drop combining marks → NFC) via
    * [[StripAccentsExpr]]. DuckDB twin: `strip_accents`. */
  def stripAccents(text: Column): Column =
    call_function("graft_strip_accents", text)

  /** Language profiles for the stopword-overlap language-ID heuristic.
    * Alphabetical key order is also the tie-break order. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "du", "est", "pas"),
    "zh" -> Seq("de0", "shi4", "bu4", "le0", "zai4", "ren2", "you3", "wo3", "ta1", "zhe4"))

  private def arrayLit(words: Seq[String]): Column = array(words.map(lit): _*)
  private def arrayLitDuck(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Count of tokens that appear in `words` (HOF form — kept as the
    * cross-check twin of the native path; spec asserts equality). */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(arrayLit(words), t)))

  /** ALL language-profile stopword counts in one native pass
    * ([[StopwordScoresExpr]]): array slot i = `stopwordCount(toks,
    * langProfiles(i)._2)`. The hot path for quality + language-ID. */
  def stopwordScores(toks: Column): Column =
    call_function("graft_stopword_scores", toks)

  /** Slot index of a language in [[langProfiles]] (for `element_at`,
    * which is 1-based: pass `langIndex(l) + 1`). */
  def langIndex(lang: String): Int = langProfiles.indexWhere(_._1 == lang)

  def stopwordCountDuck(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> list_contains(${arrayLitDuck(words)}, t)))"

  /** C3 — argmax language over the profiles, ties to the alphabetically
    * first language (the CASE chain evaluates in alphabetical order with
    * >= in both dialects). `scores` must align with langProfiles order. */
  def langIdFromScores(scores: Seq[Column]): Column = {
    val langs = langProfiles.map(_._1)
    val cases = langs.zipWithIndex.init.foldLeft(when(lit(false), "")) {
      case (acc, (lang, i)) =>
        val cond = scores.zipWithIndex.collect { case (s, j) if j != i => scores(i) >= s }
          .reduce(_ && _)
        acc.when(cond, lang)
    }
    cases.otherwise(langs.last)
  }

  def langIdFromScoresDuck(scoreExprs: Seq[String]): String = {
    val langs = langProfiles.map(_._1)
    val whens = langs.zipWithIndex.init.map { case (lang, i) =>
      val cond = scoreExprs.zipWithIndex.collect { case (s, j) if j != i => s"${scoreExprs(i)} >= $s" }
        .mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }

  /** C2 — quality-score components. The composite is a fixed affine blend,
    * computed from integer counts with single double divisions.
    *
    * Callers on a hot path should pass a pre-materialized token column
    * (see the overload) — inlining `tokens(text)` here evaluates the
    * regex tokenization once per component. */
  def qualityComponents(text: Column): Seq[(String, Column)] =
    qualityComponents(text, tokens(text))

  def qualityComponents(text: Column, toks: Column): Seq[(String, Column)] = {
    val enStops = langProfiles.find(_._1 == "en").get._2
    qualityComponents(text, toks, stopwordCount(toks, enStops))
  }

  /** Overload taking a pre-computed en-stopword count — hot paths hand in
    * `element_at(stopwordScores(toks), langIndex("en") + 1)` so the whole
    * quality+langid chain does ONE stopword pass. */
  def qualityComponents(text: Column, toks: Column, nStop: Column): Seq[(String, Column)] = {
    val nTok = size(toks)
    val nChars = length(text)
    val stripped = length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    val punct = nChars - stripped
    val sumTokLen = aggregate(transform(toks, t => length(t)), lit(0), (a, b) => a + b)
    Seq(
      "n_tokens" -> nTok,
      "punct_ratio" -> when(nChars > 0, punct.cast("double") / nChars.cast("double")).otherwise(lit(0.0)),
      "stop_ratio" -> when(nTok > 0, nStop.cast("double") / nTok.cast("double")).otherwise(lit(0.0)),
      "avg_token_len" -> when(nTok > 0, sumTokLen.cast("double") / nTok.cast("double")).otherwise(lit(0.0)))
  }

  /** score = 0.4·min(n_tokens/100,1) + 0.3·stop_ratio + 0.2·(1−punct_ratio)
    *       + 0.1·min(avg_token_len/10,1). Emitted unrounded: every term is
    *       deterministic double arithmetic, so both engines produce the
    *       bit-identical value (rounding would only add half-tie risk). */
  def qualityScore(nTok: Column, punctRatio: Column, stopRatio: Column, avgTokLen: Column): Column =
    least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
      stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.2 +
      least(avgTokLen / 10.0, lit(1.0)) * 0.1
}
