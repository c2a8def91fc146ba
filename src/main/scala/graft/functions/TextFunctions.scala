package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data-pipeline operators
  * (beyond the reference's surface — SURVEY §7 step 8). All are
  * compositions of codegen'd built-ins; definitions are chosen to be
  * reproducible in ANSI-ish SQL for the DuckDB oracle (1-based element_at,
  * single-space tokenization).
  */
object TextFunctions {

  /** Tokens on single spaces (corpus is space-normalized). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles, preserving order, 1-based positions so the SQL
    * twin (element_at / list indexing) matches exactly.
    *
    * NOTE: when `text` is an expression (not a plain attribute), the
    * tokenization is embedded in every element_at of the transform lambda
    * and HOF lambdas are interpreted without CSE — stage `split` through a
    * materialized column and use [[shinglesFromTokens]] on the hot path.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles over an already-tokenized array column. Pass a materialized
    * attribute (a `.select(split(...).as("toks"))` stage) so each lambda
    * evaluation is an O(1) array access, not a re-tokenization.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // guard the short-doc case: Spark's sequence(1, len-n+1) counts DOWN
    // when len < n (DuckDB's range is empty there) and would index 0
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** One row per word-n-gram shingle OCCURRENCE, built without
    * higher-order functions: posexplode the token array and assemble each
    * shingle from element_at lookups. Identical strings to
    * `explode(shinglesFromTokens(...))`, but every expression is
    * codegen'd — the interpreted transform lambda is the whole cost of
    * the shingle pipelines (measured 5x at sf0.1: 7 s -> 1.4 s for the
    * same 260k shingles).
    *
    * Docs with fewer than n tokens emit no rows; `keepEmptyDocs = true`
    * emits one null-shingle row for them instead (the explode_outer
    * analog, for aggregates that must keep every doc). Null text counts
    * as an empty token array — split(null) is null and posexplode would
    * silently drop the doc, so the split is coalesced to array().
    */
  def explodedShingles(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, n: Int,
                       keepEmptyDocs: Boolean = false)
  : org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col(idCol).as("id"),
        coalesce(split(col(textCol), " "), array(lit(""))).as("toks"))
      .select(col("id"), col("toks"), posexplode(col("toks")))
    val toks = col("toks")
    val pos = col("pos") // 0-based
    val isShingle = pos <= size(toks) - n
    val shingle = concat_ws(" ",
      (1 to n).map(k => element_at(toks, pos + k)): _*)
    if (keepEmptyDocs)
      base.filter(isShingle || (size(toks) < n && pos === 0))
        .select(col("id"), when(isShingle, shingle).as("shingle"))
    else
      base.filter(isShingle).select(col("id"), shingle.as("shingle"))
  }

  /** Pattern redaction for PII scrubbing — each regex match replaced by
    * its tag, applied in deterministic (sorted-tag) order so overlapping
    * patterns resolve identically on every run. Pure codegen'd
    * regexp_replace chain; patterns use the conservative common subset
    * (no lookarounds) so they behave the same under RE2-style engines if
    * a downstream system re-applies them.
    */
  def redact(text: Column,
             patterns: Map[String, String] = defaultPiiPatterns): Column =
    patterns.toSeq.sortBy(_._2).foldLeft(text) {
      case (c, (regex, tag)) => regexp_replace(c, regex, tag)
    }

  /** HTML → text extraction (the C4/CommonCrawl-style boilerplate
    * strip): drop script and style blocks, drop chrome containers
    * (nav/footer-class divs), strip remaining tags, unescape the core
    * entities, collapse whitespace. A pure codegen'd regexp_replace
    * chain — no parser, no UDF — using the RE2-safe subset (inline
    * `(?s)` dotall, non-greedy spans, no lookarounds), so an engine-twin
    * reproduces the extraction byte for byte. Entity order matters:
    * `&amp;` unescapes LAST, or `&amp;lt;` would double-decode.
    *
    * A regex chain is the honest 100 TB shape for MACHINE-GENERATED
    * wrappers (fixed template classes); arbitrary wild HTML needs a real
    * parser behind the [[graft.operators.Multimodal]] quarantine seam.
    */
  def extractHtmlText(html: Column): Column = {
    val structural = Seq(
      "(?s)<script.*?</script>",
      "(?s)<style.*?</style>",
      "(?s)<title.*?</title>",
      "(?s)<div class=\"(nav|footer)\">.*?</div>",
      "<[^>]*>")
    val stripped = structural.foldLeft(html)(
      (c, p) => regexp_replace(c, p, " "))
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(stripped) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Email, phone-ish digit runs, and IPv4 literals. Deliberately
    * conservative: favors precision (a training corpus survives a missed
    * phone number; aggressive patterns eat code and dates).
    */
  val defaultPiiPatterns: Map[String, String] = Map(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d\\s().-]{7,}\\d" -> "<PHONE>")

  /** Count of occurrences of a literal substring. */
  def occurrences(text: Column, sub: String): Column =
    ((length(text) - length(replace(text, lit(sub), lit("")))) / sub.length)
      .cast("long")

  /** BPE-ish tokenization pattern: letter runs, SINGLE digits (byte-pair
    * vocabularies split numbers), single punctuation marks. The three
    * alternatives match DISJOINT first-character classes, so leftmost-
    * first (Java regex) and RE2-family engines (DuckDB, Go) tokenize
    * identically — alternation order can never matter. Whitespace is an
    * EXPLICIT class, not `\s`: Java's `\s` is [ \t\n\x0B\f\r] but
    * RE2's (DuckDB's) excludes \x0B, so the shorthand silently diverges
    * on vertical tab; spelling the five characters out makes the two
    * engines tokenize identically by construction.
    */
  val bpeTokenPattern: String =
    "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  /** Approximate LLM-token count via [[bpeTokenPattern]] — the standard
    * cheap stand-in for a real tokenizer when budgeting training tokens
    * (whitespace counting undercounts code/punctuation-heavy text badly).
    * Codegen'd regexp_extract_all; cross-engine reproducible.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Quality-signal counts (exact integers; ratios are for the caller). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  def stopwordCount(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column =
    stopwords
      .map(w => occurrences(concat(lit(" "), text, lit(" ")), s" $w "))
      .reduce(_ + _)

  /** Language-ID heuristic: marker-token votes, argmax with deterministic
    * tie-break on language order. Markers are per-language function words.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"))

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) =>
      (lang, ms.map(m => occurrences(concat(lit(" "), text, lit(" ")), s" $m "))
        .reduce(_ + _))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 hex of the text (stable across engines). A
    * rolling-hash variant can be added as a custom Expression if profiling
    * demands.
    */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** First 32 bits of md5 as a non-negative long — the portable base hash
    * for the signature pipelines (minhash). md5 produces identical hex in
    * every engine (Spark, DuckDB, Trino), so signatures built on it are
    * bit-reproducible cross-engine: dedup decisions become auditable from
    * any SQL engine, and the gate can oracle-check candidate PAIRS, not
    * just row counts. murmur/xxhash64 are cheaper per byte but their
    * seeds/variants differ across engines; the md5 premium is paid once
    * per shingle inside a codegen'd stage and is invisible next to the
    * shuffle in every measurement (see DedupSpec timings).
    *
    * Value range [0, 2^32): small enough that `a*h + b` for the universal-
    * hash permutation family stays far from 64-bit overflow in engines
    * that error on it (DuckDB) rather than wrap (JVM).
    */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Portable 64-bit hash: first 16 md5 hex chars, packed hi<<32 | lo from
    * two 32-bit halves. Packing uses bitwise shift/or (wraps into the sign
    * bit, never errors); oracle SQL avoids the signed-overflow question
    * entirely by working on the halves.
    */
  def portableHash64(c: Column): Column = {
    val m = md5(c.cast("binary"))
    shiftleft(conv(substring(m, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(m, 9, 8), 16, 10).cast("long"))
  }

  /** URL canonicalization — the CommonCrawl-style pre-dedup normalizer:
    * two fetches of the same page must map to one key before content
    * ever loads. The rules, each a codegen'd regexp step (RE2-safe
    * subset, no lookarounds, engine-twin reproducible):
    *
    *  1. scheme and host lowercase (path/query case is significant);
    *  2. default ports stripped (`:80`, `:443`);
    *  3. fragment dropped (never sent to the server);
    *  4. trailing path slashes stripped (empty path == "/");
    *  5. query reduced to the WHITELISTED content parameter `id` —
    *     tracking params (utm_*, ref, fbclid, ...) are unbounded vendor
    *     noise, so the whitelist is the stable canonical form (the
    *     blacklist alternative churns with every new tracker).
    *
    * Pure per-row projection: no shuffle, no state — canonicalization
    * cost is scan-linear and embarrassingly parallel at any corpus size.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1))
    val hostNoPort = regexp_replace(host, ":(80|443)$", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val idVal = regexp_extract(query, "(^|&)id=([^&]*)", 2)
    concat(scheme, lit("://"), hostNoPort, path,
      when(idVal =!= "", concat(lit("?id="), idVal)).otherwise(lit("")))
  }
}
