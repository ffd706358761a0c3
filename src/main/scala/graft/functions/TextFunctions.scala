package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Text-analysis primitives for large-scale training-data pipelines.
  * All pure Catalyst built-in expressions (codegen'd, no UDFs) so they
  * stay inside whole-stage codegen and scale to arbitrary input sizes.
  */
object TextFunctions {

  /** Whitespace tokenization. The corpus guarantees single-space
    * separation; for messier text swap the delimiter for "\\s+". */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Type-token ratio: distinct tokens / tokens (vocabulary richness). */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Ratio of characters outside [a-z0-9 ] — punctuation/noise share. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1))

  /** Composite quality score in [0,1]: length credit + vocabulary
    * richness + cleanliness. Weights are declared constants (the
    * reference has no analog; this is the training-data extension). */
  def qualityScore(text: Column): Column =
    round(
      least(tokenCount(text).cast("double") / 60.0, lit(1.0)) * 0.4 +
        typeTokenRatio(text) * 0.3 +
        (lit(1.0) - punctRatio(text)) * 0.3,
      6)

  /** Stopword-frequency language scores for the n-gram-heuristic
    * language ID. Each score = number of matches of that language's
    * high-frequency function words. RE2/Java-regex-compatible patterns
    * so the DuckDB oracle can mirror them verbatim. */
  val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of|to)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "es" -> "\\b(el|la|los|y|es)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b")

  def langScore(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Predicted language: argmax score, ties broken by langPatterns
    * order (en first), all-zero scores → "und" (undetermined). */
  def langId(text: Column): Column = {
    val scored = langPatterns.map { case (l, p) => (l, langScore(text, p)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Sentence count for readability: terminal-punctuation runs, with
    * a floor of 1 (prose without periods is one long sentence, not a
    * division by zero). RE2-compatible. */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1))

  /** Syllable estimate: vowel-group runs (the classic cheap proxy —
    * "readability" counts relative syllable load, and vowel groups
    * track it closely enough to rank documents). Case-insensitive via
    * the lowered text. */
  def syllableCount(text: Column): Column =
    regexp_count(lower(text), lit("[aeiouy]+"))

  /** Flesch reading-ease score
    * (206.835 − 1.015·words/sentences − 84.6·syllables/words): the
    * standard prose-difficulty readout — a quality-filter feature
    * next to [[qualityScore]] (very low scores flag boilerplate /
    * machine text; "very high" flags word-salad). Pure pinned
    * arithmetic over three exact integer counts — replayable
    * anywhere; null-safe via the ≥1 floors. */
  def fleschReadingEase(text: Column): Column = {
    val words = greatest(tokenCount(text), lit(1)).cast("double")
    val sentences = sentenceCount(text).cast("double")
    val syllables = syllableCount(text).cast("double")
    lit(206.835) - lit(1.015) * (words / sentences) -
      lit(84.6) * (syllables / words)
  }

  /** Mojibake/encoding-damage signal: count of Unicode replacement
    * characters (U+FFFD — a decoder already gave up) plus C1 control
    * bytes (U+0080–U+009F — the classic latin-1/cp1252-as-utf8
    * smudge). Any nonzero count marks a doc for re-decode or drop. */
  def mojibakeCount(text: Column): Column =
    regexp_count(text, lit("[\\x{FFFD}\\x{0080}-\\x{009F}]"))

  /** Content fingerprint: 16-hex-char prefix of md5 over the
    * whitespace-normalized lowercase text (document identity for
    * exact-dedup; SURVEY F1's scheme generalized). */
  def fingerprint(text: Column): Column =
    substring(md5(lower(trim(text))), 1, 16)

  /** 60-bit numeric hash of a string: first 15 hex chars of md5,
    * base-16 → base-10. Deterministic across engines (DuckDB:
    * CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)), unlike JVM
    * hashCode or xxhash64 which DuckDB cannot reproduce. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** High-precision PII shapes for corpus scrubbing, applied in
    * declaration order (emails, then SSN-shaped ids, then phone
    * numbers — SSN before phone so `123-45-6789` is typed `<SSN>`,
    * never partially eaten as a phone). RE2/Java-compatible so a SQL
    * oracle replays them verbatim. Deliberately simple, precise
    * shapes: a training-corpus scrub favors precision (don't mangle
    * prose) and layers more patterns as needed. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    // no leading \b (a boundary never sits between space and '(' or
    // '+', all non-word — it would miss "(555) ..." and "+1 ..."),
    // and RE2 (the oracle's engine) has no lookbehind; instead a
    // captured one-char guard `(^|[^0-9.-])` keeps the pattern from
    // matching a SUFFIX of a longer digit run ('serial 0555-123-4567'
    // stays intact), with `$1` restoring the guard char in the
    // replacement (the oracle's dialect spells it `\1`). The trailing
    // \b pins the number's end.
    "(^|[^0-9.-])((?:\\+?1[ .-])?(?:\\(\\d{3}\\)|\\d{3})[ .-]\\d{3}[ .-]\\d{4})\\b"
      -> "$1<PHONE>")

  /** Replace every PII match with its typed placeholder — a pure
    * codegen'd regexp_replace chain (one map pass, no shuffle). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Number of PII matches in the raw text (counted BEFORE
    * redaction, per pattern, summed). */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (p, _) => regexp_count(text, lit(p)) }
      .reduce(_ + _).cast("long")

  /** Canonicalize an http(s) URL column — the normalization pass a
    * crawl pipeline runs before URL-level dedup so trivially-distinct
    * spellings collapse: lowercase scheme+host, strip the
    * scheme-default port (:443 / :80), drop the fragment, drop
    * `utm_*` tracking params, and tidy the separators the removals
    * leave behind. Path/query case is preserved (it is significant).
    * Pure regexp/string built-ins, engine-replayable. */
  def canonicalizeUrl(url: Column): Column = {
    val headPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val head = lower(regexp_extract(url, "(" + headPat + ")", 1))
    val headNoPort = when(head.startsWith("https://"),
        regexp_replace(head, ":443$", ""))
      .otherwise(regexp_replace(head, ":80$", ""))
    val tail = regexp_replace(url, headPat, "")
    val noFrag = regexp_replace(tail, "#.*", "")
    // utm removal runs on the QUERY substring only — '&' is a legal
    // RFC 3986 path character, so a whole-tail pattern would let
    // '[^&]*' swallow path segments after a literal '&' in the path.
    // Three shapes: '&utm_x=v' drops clean; '?utm_x=v&' promotes the
    // next param to '?'; a lone trailing '?utm_x=v' drops with its
    // '?'; then any dangling '?'/'&' is trimmed
    val path = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_replace(noFrag, "^[^?]*", "")
    val noUtm = regexp_replace(regexp_replace(regexp_replace(query,
      "&utm_[A-Za-z0-9_]*=[^&]*", ""),
      "\\?utm_[A-Za-z0-9_]*=[^&]*&", "?"),
      "\\?utm_[A-Za-z0-9_]*=[^&]*$", "")
    concat(headNoPort, path, regexp_replace(noUtm, "[?&]$", ""))
  }

  /** Unicode NFC canonical composition — see [[NfcNormalizeExpr]]. */
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  /** Full text normalization for content keying: NFC-compose, then
    * lowercase, then collapse every whitespace run (space, tab,
    * newline) to one space and trim. The canonical pre-pass before
    * [[fingerprint]]/shingling on a multilingual crawl — composed vs
    * decomposed accents, case, and whitespace shape all stop mattering
    * to downstream content keys. NFC is the native codegen'd
    * [[NfcNormalizeExpr]]; the rest are codegen'd built-ins. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(nfc(text)), "\\s+", " "))

  /** Crawl text extraction: strip HTML down to its visible text — the
    * step between raw crawl payloads and every text operator in this
    * library (a corpus fed raw HTML would shingle/fingerprint markup,
    * not content). Deliberately regex-based and engine-replayable
    * (RE2-compatible: no backreferences — script/style each get their
    * own pattern): script/style/comment blocks drop wholesale, all
    * remaining tags become spaces (block boundaries must separate
    * words, not concatenate them), the five ubiquitous entities decode
    * — `&amp;` LAST, so `&amp;lt;` correctly yields the literal
    * `&lt;` — and whitespace collapses. A readability-grade extractor
    * (DOM parsing, boilerplate classification) is out of scope; this
    * is the deterministic fast path that handles the overwhelming
    * bulk of crawl markup in one codegen'd map pass, zero shuffles. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Lowercased registered host of an http(s) URL, without port or
    * credentials — the grouping key for domain-level crawl curation
    * (per-domain quality stats, blocklists, crawl budgets). Empty
    * string when the value does not parse as a scheme://host URL.
    * Pure regexp built-ins, engine-replayable. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Positional word n-gram shingles (duplicates kept, document
    * order preserved — winnowing needs the sequence). Backed by the
    * native codegen'd [[ShinglesExpr]]; the previous higher-order
    * `transform(sequence(...))` form evaluated interpreted on the
    * hottest map pass of every dedup operator. */
  def posWordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(tokens(text)), n))

  /** Distinct word n-gram shingles of a document, as an array column. */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(posWordShingles(text, n))
}
