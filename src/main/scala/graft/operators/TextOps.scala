package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, quality
  * stats, BPE-ish token counting, n-gram shingling, language-ID scoring and
  * fingerprinting. All pure Catalyst column expressions (codegen-friendly, no
  * UDFs) with exact DuckDB-oracle twins.
  *
  * These extend the reference's surface (it has no string ops — SURVEY.md
  * §2.3): they're the LLM-data-pipeline tier demanded by the build target.
  */
object TextOps {

  /** Whitespace tokens, empties dropped; null text ⇒ no tokens (defensive —
    * without the guard `size(split(null))` is -1, a classic silent poison).
    * DuckDB twin: `list_filter(string_split(text, ' '), x -> x != '')`. */
  def tokens(text: Column): Column =
    filter(split(coalesce(text, lit("")), " "), x => x =!= "")

  /** 3-token shingles joined by spaces; whole text if fewer than 3 tokens.
    * DuckDB twin uses `list_transform(range(1, len-1), ...)`. */
  def shingles3(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 3, array(text)).otherwise(
      transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
  }

  // ---- hot-path twins ----------------------------------------------------
  // The declarative tokens/shingles3 run through higher-order functions
  // (CodegenFallback: interpreted per element). For the full-corpus explode
  // paths (millions of shingles) these native-expression twins
  // (graft.functions.TextExpressions) build the identical strings in one
  // static UTF8String-level call generated INSIDE whole-stage codegen — no
  // UDF serialization barrier, no String round-trip (the round-1/2 JIT-UDF
  // workaround is retired; TextKernelIdentitySpec pins output identity).

  /** Fast twin of [[tokens]] — identical output. */
  def tokensFast(text: Column): Column = graft.functions.TextKernels.spaceTokens(text)

  /** Fast twin of [[shingles3]] — identical output. */
  def shingles3Fast(text: Column): Column = graft.functions.TextKernels.shingles3(text)

  /** Width-N token shingles (N=13 is the decontamination standard); whole
    * text if fewer than N tokens — [[shingles3]] semantics generalized. */
  def shinglesNFast(text: Column, width: Int): Column =
    graft.functions.TextKernels.shinglesN(text, width)

  /** Pre-tokenizer (GPT-2-style) match count: runs of letters, runs of
    * digits, single other non-space chars. This was the round-1..5 "BPE-ish"
    * PROXY count; kept as the pre-merge baseline column. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def preTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** REAL BPE token count: deterministic greedy merges over the literal
    * [[graft.functions.Bpe.Merges]] table (codegen kernel; the DuckDB twin
    * replays the identical merge chain as string replaces). */
  def bpeTokenCount(text: Column): Column = graft.functions.BpeKernels.bpeCount(text)

  /** REAL BPE token stream (array) — chunking operates on these. */
  def bpeTokens(text: Column): Column = graft.functions.BpeKernels.bpeTokens(text)

  /** Letters-only ratio of the text (quality signal). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)

  /** Count of tokens present in a literal stopword list (non-distinct —
    * every hit counts). Portable: membership test per token. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Polynomial rolling hash over the text's Unicode codepoints:
    * h ← (h·31 + c) mod (10⁹+7), seeded with the first codepoint (empty text
    * ⇒ 0). Exact integer arithmetic; DuckDB twin:
    * `list_reduce(codepoints, (a,b) -> (a*31+b) % 1000000007)`. */
  val RollP = 1000000007L
  def rollingHash(text: Column): Column = graft.functions.TextKernels.rollingHash(text)

  /** Duplicate-3-gram fraction of a document (the Gopher-style repetition
    * quality signal): 1 − distinct/total shingles. Pure column arithmetic
    * over the in-row shingle array — no explode, no shuffle; the signal is
    * computed inside the scan projection, so at corpus scale it costs one
    * pass like any other per-row expression. Exact integer division →
    * bit-identical across engines unrounded. */
  def repetitionRatio(text: Column): Column = {
    val sh = shingles3Fast(text)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  // -------------------------------------------------- PII / secret scrubbing

  /** PII patterns — deliberately restricted to the dialect-portable regex
    * subset (character classes, bounded/unbounded repetition, alternation;
    * NO lookaround or backreferences, which RE2-based engines reject), so
    * the DuckDB oracle runs the LITERAL same patterns. Emails before phones
    * before keys when replacing: the patterns are mutually exclusive on
    * well-formed text, but a fixed order makes the chain deterministic by
    * construction rather than by argument. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val SecretRe = "(sk|pk|key|tok)_[A-Za-z0-9]{16,}"

  /** Per-doc match counts (on the ORIGINAL text) for the three PII shapes. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
     regexp_count(text, lit(PhoneRe)),
     regexp_count(text, lit(SecretRe)))

  /** The scrubbing chain: emails → `[EMAIL]`, phones → `[PHONE]`,
    * key-shaped tokens → `[KEY]`. Pure `regexp_replace` column expressions
    * — computed inside the scan projection at corpus scale, one pass, no
    * UDF fence, no shuffle. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      SecretRe, "[KEY]")

  /** Tracking query parameters a URL canonicalizer strips — the params
    * that vary per click while naming the same resource (the Common Crawl
    * dedup convention). Dialect-portable alternation (no lookaround). */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)="

  /** URL canonicalization — the crawl-pipeline normalization that maps the
    * many raw spellings of one resource to a single key for exact URL-level
    * dedup: lowercase scheme and host (ONLY those — paths are
    * case-sensitive), strip the fragment, strip the scheme's OWN default
    * port (:80 for http, :443 for https — `http://h:443/x` keeps its
    * non-default port and stays distinct),
    * strip a leading `www.`, strip trailing path slashes, drop tracking
    * params ([[TrackingParamRe]]), and sort the surviving query params
    * (param ORDER varies per emitter, the resource doesn't). Pure column
    * expressions over the dialect-portable regex subset — computed inside
    * the scan projection, no UDF, no shuffle; DuckDB runs the literal same
    * patterns and the same list_filter/list_sort chain. */
  def urlCanonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val host = regexp_replace(noPort, "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val q = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      sort_array(filter(split(q, "&"),
        p => !p.rlike(TrackingParamRe) && p =!= "")), "&")
    concat(scheme, lit("://"), host, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** Language-ID stopword tables (tiny, per-language function words). */
  val StopwordTable: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "他"),
  )
}
