package graft.queries

import graft.operators.{Artifacts, Dedup, LmScorer, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication catalog entries over `documents`, each with
  * a DuckDB oracle. The hashing is the portable md5-prefix integer hash so
  * both engines agree exactly; float ratios come from exact-integer division
  * (bit-identical) and are rounded in both engines.
  */
object TextDedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-document quality stats: token counts, BPE-ish token count, alpha
    * ratio, average token length. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs(s, dir).select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      TextOps.bpeTokenCount(col("text")).as("bpe_tokens"),
      round(TextOps.alphaRatio(col("text")), 6).as("alpha_ratio"),
      round(aggregate(transform(t, x => length(x)), lit(0), _ + _).cast("double") / size(t), 4)
        .as("avg_tok_len"))
  }

  /** Quality-filter pass — the keep/drop decision a pretraining pipeline
    * makes per document, as one filter over pure column expressions (pushes
    * into the scan, no UDF): length window, letters-ratio floor, English
    * stopword-presence floor. Emits the kept docs with the signals that
    * admitted them, so downstream stages (dedup, split) read an
    * already-reduced corpus. */
  def textQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs(s, dir).select(
      col("doc_id"),
      size(t).as("n_tokens"),
      round(TextOps.alphaRatio(col("text")), 6).as("alpha_ratio"),
      TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en"))
        .as("stop_hits"))
      .where(col("n_tokens").between(5, 5000) &&
        col("alpha_ratio") >= 0.5 && col("stop_hits") >= 1)
  }

  /** QUARTER-bits-per-token ceiling for [[textLmQuality]]'s keep decision
    * (19 = 4.75 bits/token) — calibrated inside the corpus's bigram
    * self-surprisal band (sf0.01 ranges 4.08–4.8 b/t), so the cut drops the
    * high-perplexity tail; gibberish token sequences land far above it. */
  private val LmQuarterBitsPerTok = 19

  /** MODEL-BASED quality scoring — the learned stage after the rule-based
    * [[textQualityFilter]]: train a bigram add-one LM on the rule-filter's
    * keep set, score EVERY doc's total bigram surprisal in integer bits
    * ([[LmScorer.lmQuality]]), keep iff 4·bits ≤ 19·n_bigrams. The oracle
    * replays the training counts, the vocabulary size, and every
    * floor-log2 quantized surprisal fold with pure integer arithmetic. */
  def textLmQuality(s: SparkSession, dir: String): DataFrame =
    LmScorer.lmQuality(docs(s, dir),
      textQualityFilter(s, dir).select(col("doc_id")),
      "doc_id", "text", maxQuarterBits = LmQuarterBitsPerTok)

  /** Quarter-bits-per-trigram keep threshold for [[textLmQuality3]]:
    * measured at sf0.01 the rule-keep band tops out at 16.02 and the
    * rule-drop band starts at 17.07 — 17 sits in the gap (the trigram
    * model separates where the corpus bands overlap under the bigram,
    * LmScorerSpec pins the planted case). */
  private val Lm3QuarterBitsPerTok = 17

  /** TRIGRAM back-off upgrade of [[textLmQuality]] (r8 verdict #8, KenLM
    * shape): [[LmScorer.lmQuality3]] — add-one trigram surprisal with
    * stupid-backoff to the bigram on unseen contexts, every quantity
    * integer ([[LmScorer.BackoffBits]] whole-bit penalty), trained on the
    * same rule-filter keep set. Catches bigram-chained gibberish the
    * order-2 model scores as clean. */
  def textLmQuality3(s: SparkSession, dir: String): DataFrame =
    LmScorer.lmQuality3(docs(s, dir),
      textQualityFilter(s, dir).select(col("doc_id")),
      "doc_id", "text", maxQuarterBits = Lm3QuarterBitsPerTok)

  /** Hashed-feature bucket count for [[textQualityClf]] — small enough that
    * the learned weight table broadcasts, large enough that a 10k-token
    * vocabulary averages ~20 tokens/bucket (the hashing-trick regime). */
  private val ClfBuckets = 512

  /** 1/16-bit-per-token keep threshold for [[textQualityClf]] — between
    * the corpus's drop-doc NB band (~6/16 bits/token) and its keep band
    * (~12/16), measured at sf0.01; 46/47 rule-drops and 440/453 rule-keeps
    * agree at this cut (the learned filter is an approximation of its
    * teacher BY DESIGN — disagreements are the generalization surface). */
  private val ClfQ16PerTok = 8

  /** Sub-bit integer log2 for a positive integer column: `16·e + L[m]`
    * with e the floor exponent (binary-string length) and m the floored
    * 4-bit mantissa — a MONOTONE 1/16-bit-resolution approximation within
    * two units below the true `floor(16·log2 q)` (mantissa flooring loses
    * up to ~1.4 units near m=16, the table floor up to one more; exact at
    * powers of two).
    * The classifier's NB weights need sub-bit resolution (whole-bit
    * floor-log2, the [[LmScorer]] discipline, is too coarse: the keep/drop
    * bands here are ~0.4 bits/token apart); what the hash gate needs is
    * only that both engines spell the SAME quantization. `q·16 / 2^e` is
    * exact in doubles for q < 2^49 — count-scale forever; fractional bits
    * from a 16-entry literal table both engines index identically. */
  private[queries] def log2q16(q: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val e = length(bin(q)) - 1
    val m = floor((q * 16).cast("double") / pow(lit(2.0), e.cast("double"))).cast("int")
    (e * 16).cast("long") + element_at(Log2MantissaQ16Lits, m - 15).cast("long")
  }
  /** floor(16·(log2(m) − 4)) for m in 16..31 — the mantissa table. */
  private[queries] val Log2MantissaQ16 = Seq(0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 12, 13, 14, 15)
  private val Log2MantissaQ16Lits = array(Log2MantissaQ16.map(lit): _*)

  /** LEARNED quality classifier — the fastText/CCNet stage of a pretraining
    * pipeline: a hashed-feature naive-Bayes model TRAINED IN-PIPELINE on the
    * rule-based filter's own keep/drop labels ([[textQualityFilter]] as the
    * weak teacher), then applied per document. Features are unigram tokens
    * hashed into [[ClfBuckets]] buckets (the hashing trick — the weight
    * table is fixed-size no matter the vocabulary); per-bucket NB log-odds
    * are quantized to EXACT 1/16-bit integers ([[log2q16]] — no
    * transcendental crosses the engine boundary), and a doc is kept iff its
    * summed log-odds clear [[ClfQ16PerTok]] per token. Measured at sf0.01
    * the learned cut agrees with its teacher on 97% of docs and separates
    * the corpus's gibberish band by >2× in bits/token.
    *
    * Scale shape: training is ONE token-explode scan + a 512-group
    * map-side-combining aggregate; the two scalar totals ride a broadcast
    * 1-row cross join (never a collect); scoring joins the token stream
    * against the BROADCAST 512-row weight table and reduces per doc. At
    * 100 TB the weight table would be trained once on a sample and reused —
    * the scoring pass is a single scan either way. */
  def textQualityClf(s: SparkSession, dir: String): DataFrame = {
    val B = ClfBuckets
    val t = TextOps.tokensFast(col("text"))
    val base = docs(s, dir).select(
      col("doc_id"), t.as("t"),
      (size(t).between(5, 5000) &&
        round(TextOps.alphaRatio(col("text")), 6) >= 0.5 &&
        TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en")) >= 1)
        .cast("int").as("rule_keep"))
    val tokens = base
      .select(col("doc_id"), col("rule_keep"), explode(col("t")).as("tok"))
      .withColumn("b",
        graft.functions.VectorSql.md5Hash60(concat(lit("clf:"), col("tok"))) % B)
    val tr = tokens.groupBy(col("b"))
      .agg(sum(col("rule_keep")).as("nk"), sum(lit(1) - col("rule_keep")).as("nd"))
    val tot = tr.agg(sum(col("nk")).as("tk"), sum(col("nd")).as("td"))
    val w = tr.crossJoin(broadcast(tot))
      .select(col("b"),
        (log2q16(col("nk") + 1) - log2q16(col("nd") + 1)
          - (log2q16(col("tk") + B) - log2q16(col("td") + B))).as("w"))
    val sc = tokens.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).cast("long").as("clf_q16"))
    base.select(col("doc_id"), col("rule_keep"))
      .join(sc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("clf_q16"), lit(0L)).as("clf_q16"),
        (coalesce(col("clf_q16"), lit(0L)) >=
          coalesce(col("n_toks"), lit(0L)) * ClfQ16PerTok).cast("int").as("pred_keep"),
        col("rule_keep"))
  }

  /** CONFUSION MATRIX for the learned quality filter — the ML-ops
    * acceptance report beside [[clfCalibration]]'s monotonicity check
    * (calibration says scores ORDER well; this says where the DECISION
    * threshold actually lands): the NB classifier's per-doc predictions
    * against the rule labels it was trained on, folded to the 2×2 table
    * plus precision / recall / F1 in exact ppm integers (count·10⁶ DIV
    * denominator; F1 derived from the two ppm values by the same integer
    * algebra — no float ratio anywhere). Consumes [[textQualityClf]]'s
    * proven chain; constant-size output at any corpus. */
  def clfConfusion(s: SparkSession, dir: String): DataFrame =
    textQualityClf(s, dir)
      .agg(
        sum(expr("cast(rule_keep = 1 and pred_keep = 1 as bigint)")).as("tp"),
        sum(expr("cast(rule_keep = 0 and pred_keep = 1 as bigint)")).as("fp"),
        sum(expr("cast(rule_keep = 1 and pred_keep = 0 as bigint)")).as("fn"),
        sum(expr("cast(rule_keep = 0 and pred_keep = 0 as bigint)")).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(1000000 * tp) DIV (tp + fp)").as("precision_ppm"),
        expr("(1000000 * tp) DIV (tp + fn)").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("(2 * precision_ppm * recall_ppm) DIV (precision_ppm + recall_ppm)"))

  /** PII/secret redaction — the pre-training hygiene pass: scrub emails,
    * phone numbers, and key-shaped tokens, reporting per-doc redaction
    * counts. The synthetic corpus carries no natural PII, so the query
    * PLANTS it deterministically (an email per doc, a phone on even ids, an
    * sk_-style secret on ids divisible by 5 — all pure functions of doc_id
    * both engines construct identically), then runs the
    * [[TextOps.piiRedact]] chain. Counts are measured on the pre-redaction
    * text; the full redacted string rides under the hash gate, so one
    * mis-scrubbed character anywhere mismatches. Everything is in-scan
    * column expressions — no UDF, no shuffle, one pass at corpus scale. */
  def textPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val aug = concat(col("text"),
      lit(" contact user"), idStr, lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com"),
      when(col("doc_id") % 2 === 0, concat(
        lit(" call 555-"), lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((col("doc_id") * 13 % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" sk_"), substring(md5(idStr), 1, 20))).otherwise(lit("")))
    val d = docs(s, dir).withColumn("aug", aug)
    val (ne, np, nk) = TextOps.piiCounts(col("aug"))
    d.select(col("doc_id"),
      ne.cast("int").as("n_emails"), np.cast("int").as("n_phones"),
      nk.cast("int").as("n_keys"),
      TextOps.piiRedact(col("aug")).as("redacted"))
  }

  /** Unicode text normalization — the cleanup pass a crawl corpus runs
    * before tokenization: NFC canonical composition (decomposed accents →
    * composed forms, via the codegen [[graft.functions.NfcNormalize]]
    * kernel with its in-place ASCII fast path), zero-width character strip
    * (ZWSP/ZWNJ/ZWJ/BOM), Unicode-space mapping (NBSP, en/em/thin spaces,
    * ideographic space → ASCII space), and whitespace-run collapse + trim.
    * The corpus is pure ASCII, so the mess is PLANTED deterministically per
    * doc_id (decomposed é, zero-width splits, NBSP runs, combining ring —
    * doc_id % 5 = 4 stays clean as the no-op control); both engines build
    * the identical raw string and the full normalized text rides under the
    * hash gate, so one mis-composed codepoint anywhere mismatches. DuckDB
    * runs its own `nfc_normalize` (utf8proc) against the JDK Normalizer —
    * two independent Unicode implementations agreeing per codepoint. All
    * in-scan expressions: no UDF fence, no shuffle, one pass at corpus
    * scale. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val raw = when(col("doc_id") % 5 === 0, // decomposed e + COMBINING ACUTE
        concat(lit("Cafe\u0301 "), col("text")))
      .when(col("doc_id") % 5 === 1, // ZWSP mid-word + trailing ZWJ
        concat(lit("zero\u200Bwidth\u200D "), col("text")))
      .when(col("doc_id") % 5 === 2, // NBSP + EM SPACE + IDEOGRAPHIC SPACE
        concat(lit("nb\u00A0sp \u2003 \u3000 "), col("text")))
      .when(col("doc_id") % 5 === 3, // A + COMBINING RING (composes to A-ring) + BOM
        concat(lit("A\u030A ring\uFEFF "), col("text")))
      .otherwise(col("text")) // clean control: the pass must be a no-op
    docs(s, dir).withColumn("raw", raw)
      .select(col("doc_id"), length(col("raw")).as("len_raw"),
        trim(regexp_replace(regexp_replace(regexp_replace(
          graft.functions.TextKernels.nfcNormalize(col("raw")),
          "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", ""),
          "[\\x{00A0}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{3000}]", " "),
          " +", " ")).as("text_norm"))
      .withColumn("len_norm", length(col("text_norm")))
  }

  /** Heuristic language ID: stopword-hit scores per language, fixed-priority
    * argmax. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir).select(
      col("doc_id") +: TextOps.StopwordTable.map { case (lang, words) =>
        TextOps.stopwordHits(col("text"), words).as(s"s_$lang")
      }: _*)
    val Seq(en, de, es, fr, zh) = TextOps.StopwordTable.map(p => col(s"s_${p._1}"))
    scored.withColumn("pred",
      when(en >= de && en >= es && en >= fr && en >= zh, "en")
        .when(de >= es && de >= fr && de >= zh, "de")
        .when(es >= fr && es >= zh, "es")
        .when(fr >= zh, "fr")
        .otherwise("zh"))
  }

  /** Per-domain document cap for [[textDomainCap]] — RefinedWeb keeps a
    * bounded number of pages per registered domain so no single site
    * dominates the corpus; 5 per 37 synthetic domains exercises real
    * competition at every SF. */
  private val DomainCapK = 5

  /** PER-DOMAIN DOCUMENT CAP — the anti-domination pass of a crawl corpus
    * (RefinedWeb/C4 keep at most N pages per registered domain): keep the
    * top-[[DomainCapK]] docs per domain by quality (content length here;
    * any integer score slots in), deterministic doc-id tie-break. The
    * corpus has no URL column, so the domain is synthesized as a pure
    * function of doc_id both engines spell identically — the operator
    * under test is the capping, not the parse. Runs on the per-key HEAP
    * operator ([[graft.plans.TopKPerKey]]): partial k-heaps pre-exchange,
    * key-clustered exchange, final heap merge — never a per-domain sort,
    * so a million-page domain costs O(n·log k) map-side and the reduce side
    * sees ≤ k rows per domain (the skew answer a window-rank formulation
    * lacks). Oracle = the window-rank formulation it replaces. */
  def textDomainCap(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    fork.experimental.extraStrategies =
      fork.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val d = docs(fork, dir).select(col("doc_id"), col("n_chars"),
      concat(lit("d"), (col("doc_id") % 37).cast("string"), lit(".example.com"))
        .as("domain"))
    graft.plans.TopKPerKey.topKPerKey(d,
      keys = Seq(col("domain")),
      order = Seq(col("n_chars").desc, col("doc_id").asc), k = DomainCapK)
      .select(col("domain"), col("doc_id"), col("n_chars"))
  }

  /** The deterministically-messy raw URL per document for [[dedupUrl]] —
    * every raw string is a pure function of doc_id both engines construct
    * identically, and documents sharing `base` name the SAME resource
    * through different spellings: scheme/host case, an optional `www.`, an
    * explicit default port, a trailing slash, shuffled query-param order,
    * tracking junk (utm/fbclid), and a fragment. Most docs pair up
    * (base = doc_id div 2); every 4th-mod-3 doc instead joins a bigger
    * div-16 cluster, so group sizes vary. */
  private def rawUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val base = when(id % 4 === 3, expr("doc_id div 16")).otherwise(expr("doc_id div 2"))
    val scheme = when(id % 3 === 0, lit("HTTPS")).otherwise(lit("https"))
    val www = when(id % 4 === 0, lit("WWW."))
      .when(id % 4 === 1, lit("www.")).otherwise(lit(""))
    val host = concat(lit("d"), (base % 37).cast("string"),
      when(id % 2 === 0, lit(".Example.COM")).otherwise(lit(".example.com")))
    val port = when(id % 5 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/p/"), (base % 101).cast("string"),
      when(id % 2 === 0, lit("/")).otherwise(lit("")))
    val p1 = concat(lit("id="), (base % 53).cast("string"))
    val p2 = concat(lit("a="), (base % 7).cast("string"))
    val qcore = when(id % 2 === 0, concat(p1, lit("&"), p2))
      .otherwise(concat(p2, lit("&"), p1))
    val junk = concat(
      when(id % 3 === 1, lit("&utm_source=feed")).otherwise(lit("")),
      when(id % 7 === 0, concat(lit("&fbclid=x"), id.cast("string"))).otherwise(lit("")))
    val frag = when(id % 6 === 0, concat(lit("#sec"), (id % 9).cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, lit("?"), qcore, junk, frag)
  }

  /** URL-LEVEL EXACT DEDUP — the first dedup stage of a crawl pipeline
    * (before any content hashing): canonicalize raw URLs
    * ([[TextOps.urlCanonicalize]] — lowercase scheme/host, strip fragment /
    * default port / `www.` / trailing slash / tracking params, sort the
    * survivors) and keep one document per canonical resource. The
    * canonicalization is in-scan column expressions; the dedup is ONE
    * map-side-combining groupBy on the canonical key (count + min survive
    * partial aggregation — no window, no join-back, skew-immune the same
    * way `dedup_exact` is). The oracle rebuilds the identical raw mess and
    * replays the literal same regex/sort chain. */
  def dedupUrl(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), rawUrl.as("raw"))
      .select(col("doc_id"), TextOps.urlCanonicalize(col("raw")).as("url_canonical"))
      .groupBy(col("url_canonical"))
      .agg(count(lit(1)).cast("long").as("n_docs"), min(col("doc_id")).as("keep_doc"))

  /** CRAWL-CLEAN CAPSTONE — the round-8 acquisition stages chained as ONE
    * entry, each consuming the previous stage's reduced id set (the
    * `pipeline_pack_clean` discipline applied to the crawl front of the
    * pipeline): (1) URL-level exact dedup (one survivor per canonical
    * resource), (2) the LEARNED quality filter (NB classifier trained on
    * the full corpus' rule labels, applied to the survivors), (3) the
    * per-domain cap (top-[[DomainCapK]] by length through the heap
    * operator), (4) quality-weighted sampling. The oracle rebinds the
    * proven CTE fragments ([[urlCanonCtes]], [[clfScoreCtes]], the rank
    * window, the hash threshold) into the same chain — a drift in ANY
    * stage breaks the final hash. Stage order is the production order:
    * cheap exact dedup first, the model next, per-domain shaping and
    * sampling last (each stage's cost falls on an already-reduced set). */
  def pipelineCrawlClean(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    fork.experimental.extraStrategies =
      fork.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val urlKeep = docs(fork, dir)
      .select(col("doc_id"), TextOps.urlCanonicalize(rawUrl).as("c"))
      .groupBy(col("c")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val clfKeep = textQualityClf(fork, dir)
      .where(col("pred_keep") === 1).select(col("doc_id"))
    val s2 = urlKeep.join(clfKeep, Seq("doc_id"), "left_semi")
    val d = docs(fork, dir).select(col("doc_id"), col("n_chars"),
        concat(lit("d"), (col("doc_id") % 37).cast("string"), lit(".example.com"))
          .as("domain"))
      .join(s2, Seq("doc_id"), "left_semi")
    val s3 = graft.plans.TopKPerKey.topKPerKey(d,
      keys = Seq(col("domain")),
      order = Seq(col("n_chars").desc, col("doc_id").asc), k = DomainCapK)
    s3.withColumn("rate_ppm",
        least(lit(1000000L), col("n_chars").cast("long") * 4000))
      .where(graft.functions.VectorSql.md5Hash60(
        concat(lit("ws:"), col("doc_id").cast("string"))) % 1000000 < col("rate_ppm"))
      .select(col("doc_id"), col("domain"), col("n_chars"), col("rate_ppm"))
  }

  /** CORPUS DRIFT MONITOR — the check between two ingest batches: per
    * source, compare document count, rule-filter keep rate, and mean
    * length across batch A and batch B (the interleaved doc-id halves play
    * the two drops; in production the batch key is the ingest date). A
    * keep-rate delta flags an upstream quality shift BEFORE it poisons a
    * training mix; rates are exact integer ppm (`n_keep·10⁶ div n_docs`),
    * mean lengths exact char-per-kilodoc integers, so the drift report
    * rides the hash gate. One scan, conditional aggregates, per-source
    * output. */
  def docCorpusDrift(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokensFast(col("text"))
    val rk = (size(t).between(5, 5000) &&
      round(TextOps.alphaRatio(col("text")), 6) >= 0.5 &&
      TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en")) >= 1)
      .cast("long")
    docs(s, dir)
      .select(col("source"), (col("doc_id") % 2).as("b"), rk.as("rk"), col("n_chars"))
      .groupBy(col("source"))
      .agg(sum(when(col("b") === 0, 1L).otherwise(0L)).as("a_docs"),
        sum(when(col("b") === 1, 1L).otherwise(0L)).as("b_docs"),
        sum(when(col("b") === 0, col("rk")).otherwise(0L)).as("a_keep"),
        sum(when(col("b") === 1, col("rk")).otherwise(0L)).as("b_keep"),
        sum(when(col("b") === 0, col("n_chars")).otherwise(0L)).as("a_chars"),
        sum(when(col("b") === 1, col("n_chars")).otherwise(0L)).as("b_chars"))
      .select(col("source"), col("a_docs"), col("b_docs"),
        expr("a_keep * 1000000 div greatest(a_docs, 1)").as("a_keep_ppm"),
        expr("b_keep * 1000000 div greatest(b_docs, 1)").as("b_keep_ppm"),
        expr("b_keep * 1000000 div greatest(b_docs, 1) - a_keep * 1000000 div greatest(a_docs, 1)")
          .as("keep_delta_ppm"),
        expr("a_chars * 1000 div greatest(a_docs, 1)").as("a_chars_per_kdoc"),
        expr("b_chars * 1000 div greatest(b_docs, 1)").as("b_chars_per_kdoc"))
  }

  /** LOG₂ LENGTH HISTOGRAM — the distribution companion to
    * [[docCorpusCard]]'s per-source means: document character lengths in
    * power-of-two buckets (the bucket IS the binary-string length of
    * n_chars — integer-exact, in-scan, no boundary arithmetic to get
    * wrong), per source. Length pathologies a mean hides — a spike of
    * empty docs, a truncation cliff, a runaway tail — each show as a
    * bucket anomaly. One scan, (source × ~12 buckets) output. */
  def docLengthHistogram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"),
        when(col("n_chars") <= 0, lit(0))
          .otherwise(length(bin(col("n_chars")))).cast("int").as("log2_bucket"))
      .groupBy(col("source"), col("log2_bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"))

  /** URL/CONTENT CONFLICT REPORT — the crawl-QA pass after URL dedup: a
    * canonical URL backed by MULTIPLE distinct content digests means the
    * canonicalizer is merging pages it shouldn't (lost a significant
    * param), the site serves dynamic/per-visit content, or a soft-404 is
    * shadowing real pages — each a different fix, all found by the same
    * report. One groupBy on the canonical key with an exact distinct-digest
    * count (exact is affordable because the group sizes are the URL-dup
    * cluster sizes — tiny by construction; at 100 TB the same query runs
    * with HLL per `q_approx_distinct`'s proven path). Emits only the
    * conflicted canonicals with their spread. */
  def urlContentConflicts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(TextOps.urlCanonicalize(rawUrl).as("url_canonical"),
        md5(col("text")).as("digest"), col("doc_id"))
      .groupBy(col("url_canonical"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("digest")).cast("long").as("n_digests"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_digests") > 1)

  /** CLASSIFIER CALIBRATION TABLE — the ML-ops check run before trusting a
    * learned filter in production: bucket the corpus into deciles of the
    * classifier's per-token score and report each decile's rule-label keep
    * rate. A calibrated score is MONOTONE in the teacher's keep rate
    * (bottom deciles mostly drops, top mostly keeps — CalibrationSpec
    * asserts it); a flat curve would mean the hashed features learned
    * nothing. Integer discipline: the per-token score is
    * `clf_q16·1000 div n_toks` (milli-1/16-bit units). Deciles come from
    * VALUE-HISTOGRAM CUTPOINTS, not a global ntile (r11 verdict closed the
    * last acknowledged global-sort-over-docs here): `spt_milli` is an
    * integer in [0, 16000] BY CONSTRUCTION (≤16 q16-units per token ×
    * 1000), so its value histogram is ≤16001 rows regardless of corpus
    * size — one map-side-combining groupBy, a bounded driver fold to the
    * nine exact type-1 decile boundaries (smallest value whose cumulative
    * count reaches ⌈N·i/10⌉), and decile assignment as NINE LITERAL
    * COMPARISONS in-scan (`1 + Σ (spt > cᵢ)`). Equal scores always share a
    * decile (value semantics — no doc_id tie-break splitting a tied mass),
    * so decile ranges are disjoint and ordered; a value carrying >10% of
    * the corpus collapses the deciles it spans (the honest report of a
    * degenerate score). At 100 TB: two scans (histogram + bucketed
    * aggregate), zero sorts, zero shuffles beyond the 16k-row histogram —
    * strictly better than the sketch-cutpoint path the r11 scaladoc
    * promised, because the bounded value domain makes EXACT cutpoints
    * cheaper than approximate ones. */
  def clfCalibration(s: SparkSession, dir: String): DataFrame = {
    val scored = textQualityClf(s, dir)
      .select(col("doc_id"), col("rule_keep"),
        expr("cast(clf_q16 * 1000 div greatest(n_toks, 1) as bigint)")
          .as("spt_milli"))
    // bounded collect: ≤16001 (value, count) rows whatever the corpus size
    val hist = scored.groupBy(col("spt_milli")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("spt_milli"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = hist.map(_._2).sum
    val cum = hist.scanLeft(0L)(_ + _._2).tail
    val cuts = (1 to 9).map { i =>
      val target = (total * i + 9) / 10 // ceil(N·i/10), exact in integers
      hist(cum.indexWhere(_ >= target))._1
    }
    val decile = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col("spt_milli") > c, 1).otherwise(0)
    }
    scored.withColumn("decile", decile.cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("rule_keep")).cast("long").as("n_rule_keep"),
        min(col("spt_milli")).as("min_spt_milli"),
        max(col("spt_milli")).as("max_spt_milli"))
  }

  /** RELIABILITY CURVE with isotonic calibration — the composition that
    * completes the ML-ops chain (calibration table → confusion → AUC →
    * CALIBRATED PROBABILITIES): [[clfCalibration]]'s decile table (the
    * classifier's score deciles vs the rule teacher's keep rate) fitted
    * with the PAV minimax closed form `mlIsotonic` proved — ŷ_k =
    * max_{i≤k} min_{j≥k} mean(keep rate over deciles i..j) — so each
    * decile reports both its RAW observed keep rate (the reliability
    * diagram's y-axis) and the monotone CALIBRATED probability a serving
    * layer would actually threshold on. Exact integers throughout: rates
    * are e6 floors of prefix-sum rationals, and floor commutes with
    * min/max, so iso_ppm = floor(1e6·true isotonic value) on both
    * engines. Cost: the calibration table's two scans + an O(10³)-row
    * broadcast triple-join over the DECILE histogram — bounded by
    * construction at any corpus size. Spec runs driver-side PAV over the
    * gated decile table and pins equality + monotonicity. */
  def clfReliability(s: SparkSession, dir: String): DataFrame = {
    val dec = clfCalibration(s, dir)
      .select(col("decile"), col("n_docs").as("n"), col("n_rule_keep").as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // prefix sums over the ≤10-row decile histogram (bounded window)
    val pre = dec.withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("pos")).over(w))
      .localCheckpoint(eager = true) // three self-join consumers
    val lo = pre.select(col("decile").as("i"),
      (col("cn") - col("n")).as("n0"), (col("cp") - col("pos")).as("p0"))
    val hi = pre.select(col("decile").as("j"), col("cn").as("n1"), col("cp").as("p1"))
    val m = broadcast(lo).join(broadcast(hi), col("i") <= col("j"))
      .select(col("i"), col("j"),
        expr("(1000000 * (p1 - p0)) div (n1 - n0)").as("mean_ppm"))
    val ks = pre.select(col("decile").as("k"), col("n"), col("pos"))
    val inner = broadcast(m)
      .join(broadcast(ks), col("i") <= col("k") && col("j") >= col("k"))
      .groupBy(col("k"), col("n"), col("pos"), col("i"))
      .agg(min(col("mean_ppm")).as("mn"))
    inner.groupBy(col("k").as("decile"), col("n"), col("pos"))
      .agg(max(col("mn")).as("iso_ppm"))
      .select(col("decile"), col("n").as("n_docs"), col("pos").as("n_rule_keep"),
        expr("(1000000 * pos) div n").as("raw_ppm"), col("iso_ppm"))
  }

  /** PER-SOURCE CORPUS CARD — the observability report a pipeline publishes
    * with every data drop (the "datasheet" row per source): document count,
    * REAL BPE token total, rule-filter keep count, language mix, and
    * character volume, every number drawn from the already-proven kernels
    * (BPE count, quality rule, stopword language ID) so the card cannot
    * drift from the operators it summarizes. ONE scan + one
    * source-cardinality groupBy (all five aggregates partial-combine
    * map-side); at 100 TB this is the cheapest query in the catalog per
    * byte scanned — and the first thing run on an unfamiliar drop. */
  def docCorpusCard(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.tokensFast(col("text"))
    val hits = TextOps.StopwordTable.map { case (lang, words) =>
      lang -> TextOps.stopwordHits(col("text"), words)
    }.toMap
    val (en, de, es, fr, zh) = (hits("en"), hits("de"), hits("es"), hits("fr"), hits("zh"))
    val langPred = when(en >= de && en >= es && en >= fr && en >= zh, "en")
      .when(de >= es && de >= fr && de >= zh, "de")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
    val ruleKeep = (size(t).between(5, 5000) &&
      round(TextOps.alphaRatio(col("text")), 6) >= 0.5 &&
      TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en")) >= 1)
      .cast("int")
    docs(s, dir).select(col("source"), col("n_chars"),
        TextOps.bpeTokenCount(col("text")).as("bpe"),
        ruleKeep.as("rk"), (langPred === "en").cast("int").as("is_en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).cast("long").as("bpe_tokens"),
        sum(col("rk")).cast("long").as("n_rule_keep"),
        sum(col("is_en")).cast("long").as("n_pred_en"),
        sum(col("n_chars")).cast("long").as("tot_chars"))
  }

  /** Document fingerprints: mod-64-selected shingle hashes (winnowing-style
    * content signature). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    // filter-before-distinct: hash every shingle occurrence, keep the mod-64
    // selected ~1/64, distinct only the survivors (one shuffle of a tiny set
    // instead of a distinct over the full shingle stream).
    docs(s, dir)
      .select(col("doc_id").as("doc"), explode(TextOps.shingles3Fast(col("text"))).as("sh"))
      .select(col("doc"), graft.functions.VectorSql.md5Hash60(col("sh")).as("fp"))
      .where(col("fp") % 64 === 0)
      .distinct()

  /** Top-5 TF-IDF terms per document, through the CUSTOM heap operator
    * (per-key top-k — a second catalog consumer besides `q_topk_per_key`).
    * tf and df are exact integers from one grouped pass each (df counts the
    * tf table's rows per term — no second distinct); N arrives as a 1-row
    * broadcast cross join, never a driver action. The only float is the
    * idf: `ln(N/df)` is the one libm call, so it alone is quantized
    * (round 9) in BOTH engines — after that, `tf · idf` is exact double
    * arithmetic on identical inputs and the final round(6) + ranking are
    * identical by construction. (Quantizing only the end score would leave
    * every (tf, df) combination exposed to a 1-ulp ln flip; quantizing the
    * idf shrinks the exposure to the few hundred distinct df values, the
    * same per-intermediate discipline as som_update.) Terms stay strings
    * here for output readability; at corpus scale the shuffle key would be
    * the 60-bit term hash like the dedup family. */
  def textTfidfTopk(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    fork.experimental.extraStrategies =
      fork.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val d = docs(fork, dir)
    val tf = d.select(col("doc_id"), explode(TextOps.tokensFast(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val idf = round(log(col("n_docs").cast("double") / col("df")), 9)
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        (round(col("tf") * idf, 6) + lit(0.0)).as("score"))
    graft.plans.TopKPerKey.topKPerKey(scored,
      keys = Seq(col("doc_id")),
      order = Seq(col("score").desc, col("term").asc), k = 5)
  }

  /** BM25 top-5 terms per document — the IR-standard upgrade of
    * [[textTfidfTopk]] (same heap-operator shape, same per-intermediate
    * float discipline): score = idf_BM25 · tf·(k1+1) / (tf + k1·(1 − b +
    * b·dl/avgdl)) with k1 = 1.25, b = 0.75 — DYADIC constants, so k1+1,
    * 1−b and every constant fold is exactly representable (1.2 would make
    * `k1+1` a rounding coin-flip between engines) — and idf_BM25 =
    * ln((N − df + 0.5)/(df + 0.5) + 1). The two libm-adjacent
    * intermediates (idf, the length normalization) are quantized in BOTH
    * engines; tf/dl/avgdl inputs are exact integers, so the final
    * round(6) score and the (score, term) ranking are identical by
    * construction. */
  /** Docs per posting-list block — deliberately tiny so even the smallest
    * test corpus exercises multi-block terms; a production index would size
    * segments in the millions of docs. The SHAPE, not the constant, is the
    * scale claim. */
  val InvBlockDocs = 16L

  /** Inverted-index build, BLOCK-SEGMENTED (the Lucene-segment shape and
    * the honest skew answer: a stopword appearing in every document never
    * becomes one giant group — its posting list splits across doc_id-range
    * blocks of [[InvBlockDocs]] docs, so per-group state is bounded by the
    * block width no matter how common the term). Within a block the
    * postings are DELTA-ENCODED off the block base (the standard
    * compression form); per term the output carries df, cf, block count,
    * and a hash chaining every block's delta stream in block order — a
    * lost doc, a mis-sorted posting, or a wrong gap all break it.
    *
    * Build cost at scale: one (term, doc) shuffle for tf, one
    * (term, block) shuffle whose groups are ≤ block width, then a
    * vocabulary-sized rollup. Nothing is ever corpus-sized in one task. */
  /** Result cut for [[textPhraseSearch]]. */
  val PhraseTopK = 50

  /** PHRASE SEARCH — the positional half of the search-engine story
    * ([[textInvertedIndex]] is the term half; real engines pair postings
    * with positions exactly so multi-word queries stay index-serviceable):
    * adjacent-bigram occurrences are the positional index here, the query
    * phrase is the corpus's most frequent bigram (count desc, lexicographic
    * tiebreak — a deterministic, corpus-derived query, no magic literal),
    * and the serve is occurrences-per-document top-[[PhraseTopK]] on the
    * (count, doc_id) total order. Bigrams build in-scan from the token
    * array (1-based `element_at` mirroring DuckDB's 1-based list index —
    * no window, no self-join on positions); the query side is a 1-row
    * broadcast. At 100 TB: one scan + one count shuffle to pick the
    * query, one scan + one per-doc count for the serve, global top-k via
    * TakeOrderedAndProject. */
  def textPhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val toks = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextKernels.spaceTokens(col("text")).as("t"))
      .where(size(col("t")) >= 2) // Spark sequence(1,0) would DESCEND
    val big = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(t) - 1), " +
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
    val query = big.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(1)
      .select(col("bigram").as("phrase"))
    big.join(broadcast(query), col("bigram") === col("phrase"))
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(PhraseTopK)
  }

  /** Minimum bigram support and result cut for [[textCollocations]]. */
  val CollocMinSupport = 5
  val CollocTopK = 50

  /** COLLOCATION MINING — PMI-ranked bigrams, the corpus-linguistics pass
    * that surfaces multiword units ("new york") a frequency list buries:
    * score = lift = N·c(x,y) / (c(x,·)·c(·,y)) over the bigram
    * contingency table (left-marginal, right-marginal, total — the PMI
    * exponential; taking the log would order identically and cost a
    * transcendental whose last ulp differs across libms, so the gate
    * carries the EXACT INTEGER floor-e6 lift instead). Support-filtered
    * (≥[[CollocMinSupport]]) so rare exclusive pairs don't dominate,
    * top-[[CollocTopK]] on the (lift, bigram) total order. Three
    * aggregates over the in-scan bigram stream + two marginal joins —
    * every count exact, partial-combining, at any corpus size. */
  def textCollocations(s: SparkSession, dir: String): DataFrame = {
    val toks = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextKernels.spaceTokens(col("text")).as("t"))
      .where(size(col("t")) >= 2)
    val big = toks.select(explode(expr(
      "transform(sequence(1, size(t) - 1), " +
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
      .select(col("bigram"),
        expr("split(bigram, ' ')[0]").as("x"), expr("split(bigram, ' ')[1]").as("y"))
    val cxy = big.groupBy(col("bigram"), col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
    val cx = big.groupBy(col("x")).agg(count(lit(1)).as("c_x"))
    val cy = big.groupBy(col("y")).agg(count(lit(1)).as("c_y"))
    val n = big.agg(count(lit(1)).as("n_bigrams"))
    cxy.join(cx, "x").join(cy, "y").crossJoin(broadcast(n))
      .where(col("c_xy") >= CollocMinSupport)
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        expr("(1000000 * n_bigrams * c_xy) DIV (c_x * c_y)").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("bigram"))
      .limit(CollocTopK)
  }

  def textInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorSql.md5Hash60
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(TextOps.tokensFast(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val blocks = tf.withColumn("blk", expr(s"doc_id div $InvBlockDocs"))
      .groupBy(col("term"), col("blk"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("df_blk"), sum(col("tf")).as("cf_blk"))
      .withColumn("deltas", expr(
        s"""transform(ids, (x, i) ->
           |  CASE WHEN i = 0 THEN x - blk * $InvBlockDocs
           |       ELSE x - element_at(ids, i) END)""".stripMargin))
      .withColumn("phash",
        md5Hash60(concat_ws(",", expr("transform(deltas, x -> cast(x as string))"))))
    blocks.groupBy(col("term"))
      .agg(sum(col("df_blk")).cast("long").as("df"),
        sum(col("cf_blk")).cast("long").as("cf"),
        count(lit(1)).as("n_blocks"),
        md5Hash60(concat_ws(";", expr(
          """transform(sort_array(collect_list(struct(blk, phash))),
            |  x -> concat_ws(':', x.blk, x.phash))""".stripMargin)))
          .as("index_hash"))
  }

  def textBm25Topk(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    fork.experimental.extraStrategies =
      fork.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val d = docs(fork, dir)
    val tf = d.select(col("doc_id"), explode(TextOps.tokensFast(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = d.select(col("doc_id"), size(TextOps.tokensFast(col("text"))).cast("long").as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"), lit(1).as("one"))
    val totDl = dl.agg(sum(col("dl")).as("tot_dl"), lit(1).as("one"))
    val (k1, b) = (1.25, 0.75)
    val idf = round(log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0), 9)
    val norm = round(lit(k1) * (lit(1.0) - b + lit(b) * col("dl") /
      (col("tot_dl").cast("double") / col("n_docs"))), 9)
    val scored = tf.join(df, "term").join(dl, "doc_id")
      .crossJoin(broadcast(n.drop("one"))).crossJoin(broadcast(totDl.drop("one")))
      .select(col("doc_id"), col("term"), col("tf"),
        (round(idf * (col("tf") * (k1 + 1)) / (col("tf") + norm), 6) + lit(0.0))
          .as("score"))
    graft.plans.TopKPerKey.topKPerKey(scored,
      keys = Seq(col("doc_id")),
      order = Seq(col("score").desc, col("term").asc), k = 5)
  }

  /** Context-window CHUNKING with overlap — the "split long docs into
    * training windows" step that complements packing (packing concatenates
    * short docs; chunking splits long ones): chunk k covers tokens
    * [k·stride, k·stride + size), stride = size − overlap. Windows are in
    * REAL BPE token space (what the training run sees), not whitespace
    * tokens. A chunk is only started if it adds unseen tokens:
    * nChunks = 1 + ⌈max(n − size, 0) / stride⌉ — the earlier
    * start-while-k·stride<n rule emitted a trailing chunk fully contained
    * in its predecessor whenever n ∈ (k·stride, k·stride+overlap],
    * silently duplicating training tokens. Emits exact integers plus the
    * 60-bit hash of each chunk's tokens (payload-free, hash-stable). Pure
    * per-row explode — computed inside the scan, no shuffle at any scale. */
  val ChunkSize = 64
  val ChunkStride = 48 // 16-token overlap between consecutive chunks
  def textChunks(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.bpeTokens(col("text"))
    docs(s, dir)
      .select(col("doc_id"), t.as("t"), size(t).as("n"))
      .withColumn("k", explode(sequence(lit(0),
        expr(s"(greatest(n - $ChunkSize, 0) + ${ChunkStride - 1}) div $ChunkStride"))))
      .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
        least(lit(ChunkSize), col("n") - col("k") * ChunkStride)
          .cast("int").as("n_chunk_tokens"),
        graft.functions.VectorSql.md5Hash60(
          concat_ws(" ", slice(col("t"), col("k") * ChunkStride + 1, lit(ChunkSize))))
          .as("chunk_hash"))
  }

  /** Real-BPE token accounting per document: the pre-tokenizer (pre-merge)
    * count next to the post-merge BPE count — the number every packing
    * budget and chunk window in this catalog is measured in. */
  def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      TextOps.preTokenCount(col("text")).cast("int").as("pre_tokens"),
      TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))

  /** Distributed BPE vocabulary TRAINING over the corpus — learn 5 merges
    * from scratch ([[graft.operators.BpeTrainer]]): one corpus pass for
    * word frequencies, then per round a vocab-sized pair count + 1-row
    * argmax. The oracle replays every round (counts, tie-break, and the
    * winner's application) so a drift anywhere in the loop breaks the hash. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.operators.BpeTrainer.train(docs(s, dir), "text", rounds = 5)

  /** Corpus vocabulary in REAL BPE token space: top-200 tokens with
    * frequency ranks (freq DESC, token ASC — total order, deterministic
    * cut). The id-assignment step of a tokenizer build; `text_token_freq`
    * is its whitespace-word sibling. The global window runs over the
    * already-aggregated vocab (small), never the corpus. */
  def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok"))
    docs(s, dir)
      .select(explode(TextOps.bpeTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 200)
  }

  /** Corpus-level token frequency, top 100 — the C4-style vocabulary
    * analysis pass. Global top-k = orderBy+limit (TakeOrderedAndProject,
    * never a full sort); ties broken by token so the cut is deterministic. */
  def textTokenFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextOps.tokensFast(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(100)

  /** Whole-document polynomial rolling hash (exact integer content id). */
  def textRollingHash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), TextOps.rollingHash(col("text")).as("rh"))

  /** 60-bit SimHash per document. */
  def textSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")

  /** Exact dedup: survivor (min doc_id) per content digest. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSurvivors(docs(s, dir), "doc_id", "text")

  /** C4-style paragraph (line-level) dedup: corpus-wide keep-FIRST over
    * 3-word segments, docs reassembled from surviving segments. width=3 so
    * the ~30-word vocabulary actually produces cross-doc duplicate segments
    * at every SF (30³ possible segments vs 10⁴–10⁶ occurrences) — the
    * operator provably drops text, not just passes it through. */
  def dedupParagraph(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupParagraphs(docs(s, dir), "doc_id", "text", width = 3)

  // ---- shared dedup artifacts (VERDICT r1: the sig/pairs pipeline used to
  // be rebuilt from the raw corpus by every family member — ~4 scans of the
  // same shingle stream per bench round). Signatures (16 rows/doc) and
  // confirmed pairs (near-dup suspects only) are the two REDUCED artifacts
  // worth materializing; the shingle stream itself never is.

  /** MinHash signature table, written once per corpus as a DISK LAYOUT
    * (r17, the r16 verdict's pre-approved convention move #9): signatures
    * are a deterministic, immutable, REDUCED function of the corpus (16
    * rows/doc) — the same artifact class as the IVF serving layouts, which
    * a real deployment materializes once and serves many queries from.
    * The honest cold cost of the full chain stays visible per bench rep in
    * the new `dedup_pairs_cold` entry (the dual-reporting condition the
    * r16 verdict set for this move). Raw occurrences feed the signature
    * directly — min() is duplicate-insensitive, so the distinct shuffle is
    * skipped. */
  private def sharedSignatures(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(Artifacts.sharedPath(s"minhash_sig:$dir") { path =>
      Dedup.minhashSignatures(Dedup.docShinglesRaw(docs(s, dir), "doc_id", "text"))
        .write.parquet(path)
    })

  /** Confirmed near-dup pairs (LSH candidates → exact Jaccard ≥ 0.8),
    * written once per corpus as a disk layout (see [[sharedSignatures]];
    * `dedup_pairs_cold` re-pays the whole chain per rep). The exact-Jaccard
    * confirm re-shingles ONLY candidate docs — the full corpus is touched
    * exactly once, by the signature scan. */
  private[graft] def sharedPairs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(Artifacts.sharedPath(s"minhash_pairs:$dir") { path =>
      confirmedPairsFrom(s, dir, sharedSignatures(s, dir), maxBandDf = Some(64))
        .write.parquet(path)
    })

  /** The LSH-candidates → exact-Jaccard confirm chain tail, from a given
    * signature table — one definition for the shared layouts and the cold
    * re-pay entry. `maxBandDf`: hot-bucket skew guard (star fallback above
    * 64 docs per band key — giant exact-dup clusters stay linear, see Dedup
    * scaladoc). The DuckDB oracle models the same hot/cold fallback, so the
    * guard stays oracle-checked even on a corpus where it binds. */
  private def confirmedPairsFrom(s: SparkSession, dir: String, sigs: DataFrame,
                                 maxBandDf: Option[Int]): DataFrame = {
    val cand = Dedup.lshCandidates(sigs, maxBandDf = maxBandDf)
      .localCheckpoint(eager = true) // reused: candDocs filter + pair-confirm join
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val rawCand = Dedup.docShinglesRaw(
      docs(s, dir).join(broadcast(candDocs), "doc_id"), "doc_id", "text")
    Dedup.jaccardPairs(rawCand, 0.8, candidates = Some(cand))
  }

  /** The FULL dedup chain — shingles → signatures → capped banding → exact
    * Jaccard — rebuilt from the raw corpus with NO shared artifact, every
    * invocation (r17): the honest cold pipeline cost the bench must keep
    * paying per rep now that the chain's artifacts live as session disk
    * layouts (the r16 verdict's dual-reporting condition). Same output —
    * and the same DuckDB oracle — as `dedup_minhash_pairs`. */
  def dedupPairsCold(s: SparkSession, dir: String): DataFrame =
    confirmedPairsFrom(s, dir,
      Dedup.minhashSignatures(Dedup.docShinglesRaw(docs(s, dir), "doc_id", "text")),
      maxBandDf = Some(64))

  /** Dump the confirmed-pairs artifact for the cluster-logic oracles
    * (called by [[graft.Verify]]; see the ORACLE ARTIFACTS note there).
    * One parquet, (doc_a, doc_b) — exactly the edge set the keep-list /
    * quality-rep / CC queries consume via [[sharedPairs]]. */
  def dumpOracleArtifacts(s: SparkSession, dir: String, outDir: String): Unit =
    sharedPairs(s, dir).select(col("doc_a"), col("doc_b"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/pairs.parquet")

  /** MinHash signatures (16 affine permutations over 3-token shingles). */
  def dedupMinhashSig(s: SparkSession, dir: String): DataFrame =
    sharedSignatures(s, dir)

  /** Near-dup pairs: LSH band candidates → exact Jaccard ≥ 0.8. */
  def dedupMinhashPairs(s: SparkSession, dir: String): DataFrame =
    sharedPairs(s, dir)

  /** Dedup end-artifact: the keep-list. Near-dup pairs (MinHash, jac ≥ 0.8)
    * → 3-round min-label propagation → (doc, canonical) for every document;
    * keep rows where doc == canonical. */
  def dedupKeepList(s: SparkSession, dir: String): DataFrame =
    Dedup.keepList(docs(s, dir), "doc_id",
      sharedPairs(s, dir).select(col("doc_a"), col("doc_b")), rounds = 3)

  /** The daily-increment path end-to-end: docs < 250 play yesterday's
    * corpus (its signatures and confirmed pairs are the carried artifacts),
    * docs ≥ 250 are today's crawl. The incremental result must equal a full
    * recompute — so the oracle IS the full-corpus pair oracle. Uncapped
    * banding on both legs (a df cap would bind against different
    * populations on the two paths). */
  def dedupIncrementalPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val oldDocs = d.where(col("doc_id") < 250)
    val newIds = d.where(col("doc_id") >= 250).select(col("doc_id").as("doc"))
    val oldShingles = Dedup.docShinglesRaw(oldDocs, "doc_id", "text")
    // "yesterday's" carried artifacts: the band table and confirmed pairs
    val oldSigs = Dedup.minhashSignatures(oldShingles)
    val oldBanded = Dedup.bandedTable(oldSigs)
    val oldPairs = Dedup.jaccardPairs(oldShingles, 0.8,
      candidates = Some(Dedup.lshCandidates(oldSigs)))
    Dedup.incrementalPairs(d, newIds, "doc_id", "text", oldBanded, oldPairs)
  }

  /** Quality-weighted representative per near-dup cluster: keep-the-longest
    * instead of min-id. Shares the confirmed-pairs artifact with the other
    * keep-list entries. */
  def dedupQualityRep(s: SparkSession, dir: String): DataFrame =
    Dedup.qualityRepresentatives(docs(s, dir), "doc_id", "text",
      sharedPairs(s, dir).select(col("doc_a"), col("doc_b")))

  /** Keep-list via the CONVERGED (fixpoint) label propagation — exact
    * connected components whatever the cluster diameter. Oracle is a
    * recursive-CTE transitive closure (true CC), so this entry stays green
    * even on a corpus where the bounded 3-round twin would split a chain. */
  def dedupCcKeepList(s: SparkSession, dir: String): DataFrame =
    Dedup.keepListConverged(docs(s, dir), "doc_id",
      sharedPairs(s, dir).select(col("doc_a"), col("doc_b")))

  /** LEAKAGE-FREE train/test split — the cluster-aware upgrade of
    * `ml_train_test_split`: hashing the DOC id sends two near-duplicate
    * documents to different splits ~32% of the time (2·0.8·0.2), which is
    * test-set contamination by construction. Keying the split hash on the
    * near-dup cluster CANONICAL (connected components over the confirmed
    * pairs) puts every cluster wholly in one split: a near-dup pair can
    * never straddle train/test. Same shape as dedup_cc_keep_list plus one
    * in-scan hash — no extra shuffle beyond the CC itself; the oracle
    * replays CC from the dumped pairs artifact (sf1-gate friendly). */
  def mlSplitLeakfree(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorSql.md5Hash60
    Dedup.keepListConverged(docs(s, dir), "doc_id",
        sharedPairs(s, dir).select(col("doc_a"), col("doc_b")))
      .select(col("doc").as("doc_id"), col("canonical"),
        when(md5Hash60(concat(lit("split:"), col("canonical").cast("string"))) % 100 < 80,
          "train").otherwise("test").as("split"))
  }

  /** Uncapped confirmed pairs — the artifact flavor the incremental AND
    * cascade families carry (a df-cap star binds against different
    * populations before and after a delta/delete, breaking their
    * equals-recompute contracts; see [[graft.operators.Dedup.scrubArtifacts]]). */
  private def sharedPairsUncapped(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(Artifacts.sharedPath(s"minhash_pairs_uncapped:$dir") { path =>
      confirmedPairsFrom(s, dir, sharedSignatures(s, dir), maxBandDf = None)
        .write.parquet(path)
    })

  /** GDPR delete CASCADED through the dedup artifacts (VERDICT r7 ask #5):
    * the deletion set (`doc_id % 97 = 0`, the `q_gdpr_delete` request) is
    * scrubbed out of the carried band table and confirmed pairs
    * ([[graft.operators.Dedup.scrubArtifacts]]), and the keep-list is
    * re-derived from the scrubbed pairs (components can split when the
    * deleted doc was the bridge). Output: one row per doc in the SCRUBBED
    * BAND TABLE joined (full outer) with the re-derived keep-list — a
    * doomed doc surviving either artifact, or a survivor missing from
    * either, breaks the row set. The oracle is a FULL RECOMPUTE FROM
    * SCRATCH over the surviving corpus (shingles → signatures → uncapped
    * banding → exact Jaccard → recursive-CTE CC): the cascade's whole
    * contract is being indistinguishable from it. */
  def dedupGdprCascade(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val doomed = d.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("doc"))
    val banded = Dedup.bandedTable(sharedSignatures(s, dir))
    val (bandedS, pairsS) =
      Dedup.scrubArtifacts(banded, sharedPairsUncapped(s, dir), doomed)
    val survivors = d.join(broadcast(doomed),
      d("doc_id") === doomed("doc"), "left_anti")
    val keep = Dedup.keepListConverged(survivors, "doc_id",
      pairsS.select(col("doc_a"), col("doc_b")))
    val bandCounts = bandedS.groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_band_rows"))
    keep.join(bandCounts, Seq("doc"), "full_outer")
  }

  /** The daily-increment path for the FINGERPRINT families
    * ([[graft.operators.Dedup.simhashIncrementalPairs]]): docs < 250 play
    * yesterday's corpus (carried artifacts: the HASH table and its
    * uncapped pairs), docs ≥ 250 today's crawl. Bands are RE-DERIVED from
    * the combined hash table — the adaptive block count is a function of
    * combined corpus size, so a carried band TABLE would go stale the day
    * a delta crosses a width threshold (the operator scaladoc's argument).
    * The result must equal a full recompute, so the oracle is the
    * full-corpus UNCAPPED adaptive-banding replay. */
  def dedupSimhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val all = Dedup.simhash(docs(s, dir), "doc_id", "text")
      .localCheckpoint(eager = true)
    val oldH = all.where(col("doc") < 250)
    val newH = all.where(col("doc") >= 250)
    val oldPairs = Dedup.simhashPairs(oldH, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    Dedup.simhashIncrementalPairs(oldH, newH, oldPairs)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }

  /** STREAMING near-dup pairs under the hash gate — the eighth streaming
    * sink, and the first over the DOCUMENTS table: the corpus flows through
    * `readStream` into [[graft.streaming.DocStream]] (per-row signatures →
    * band grouping → stateful per-bucket confirm) and the parquet sink,
    * read back and band-deduped, must hash-match the batch UNCAPPED pair
    * oracle (the incremental family's). The continuous-crawl shape:
    * tomorrow's docs would flow into the SAME checkpointed state and emit
    * only the new pairs (DedupStreamSpec proves two-batch == one-batch ==
    * batch). */
  def dedupPairsStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    val root = StreamScratch.fresh("dedup_pairs")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    // stage the corpus into a directory: the file stream source reads
    // directories, and the driver testdata is a single parquet file
    val docsIn = fork.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docsIn.write.parquet(inDir)
    // no maxFilesPerTrigger: ONE micro-batch loads every staged file, so the
    // per-batch volume bound is the staged TOTAL, not the largest file
    StreamScratch.sizeStateStoresAdaptiveTotal(fork, inDir)
    val stream = fork.readStream.schema(docsIn.schema).parquet(inDir)
    val q = graft.streaming.DocStream.pairsStream(
        graft.streaming.DocStream.bandRows(stream, "doc_id", "text")
          .as[graft.streaming.DocStream.BandDoc])
      .toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a pair found through two bands lands twice — collapse, like the batch
    // candidate distinct; schema-pinned read so a pair-free corpus yields
    // an empty frame instead of an inference error
    fork.read.schema("doc_a LONG, doc_b LONG, jaccard DOUBLE").parquet(outDir)
      .distinct()
  }

  /** [[dedupPairsStreamed]] through the HORIZON-EVICTION state mode
    * ([[graft.streaming.DocStream.pairsStreamEvicting]] — the text twin
    * of `dedup_embedding_lsh_stream_evict`): the continuous-crawl path
    * where per-bucket state is bounded by the dedup horizon's crawl
    * volume (watermark-retired members evicted, idle buckets expired via
    * EventTimeTimeout) instead of carrying the whole corpus. Event time
    * is the deterministic `timestamp_seconds(doc_id)` ingest clock; the
    * gated run sizes the horizon to the corpus's event-time span, so
    * within-horizon covers everything and the output sits under the
    * UNCHANGED batch oracle while the eviction machinery (watermark
    * plumbing, member filter, timeout registration) runs live.
    * DedupStreamSpec plants cross-horizon near-dups and measures the
    * state-row drop this entry's configuration deliberately avoids. */
  def dedupPairsStreamEvict(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    val root = StreamScratch.fresh("dedup_evict")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val docsIn = fork.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // split across files, one per trigger: the watermark genuinely ADVANCES
    // between micro-batches, so the eviction machinery runs live (a
    // single-batch run exercises it only vacuously — r11 self-review)
    docsIn.repartition(3).write.parquet(inDir)
    StreamScratch.sizeStateStoresAdaptive(fork, inDir)
    // span of the doc_id ingest clock (ids need not be dense); horizon
    // covers it all, and the watermark delay keeps every row un-late:
    // delay = maxId+1 s puts the fully-advanced watermark one second BELOW
    // doc 0's event time — a row AT the watermark is dropped as late, so
    // delay = maxId would silently lose doc 0's pairs once batches split
    // (the embedding twin had this right; fixed here by r11 self-review)
    val maxId = docsIn.agg(max(col("doc_id"))).head.getLong(0)
    val horizonMs = (maxId + 1L) * 1000L
    // +1 day keeps every event time strictly above the INITIAL watermark
    // (0): a row AT the watermark is dropped as late by the stateful
    // operator, which would silently lose doc_id 0's pairs
    val stream = fork.readStream.schema(docsIn.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .withColumn("ts", timestamp_seconds(col("doc_id") + lit(86400L)))
    val q = graft.streaming.DocStream.pairsStreamEvicting(
        graft.streaming.DocStream.bandRowsT(stream, "doc_id", "text")
          .as[graft.streaming.DocStream.BandDocT],
        horizonMs, watermarkDelay = s"${maxId + 1} seconds")
      .toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.schema("doc_a LONG, doc_b LONG, jaccard DOUBLE").parquet(outDir)
      .distinct()
  }

  /** Span width for the exact repeated-span (substring) dedup family:
    * Lee et al. 2022 run 50-token spans on web-scale corpora; the fixture
    * docs are 10–99 tokens (median 56), so 15 keeps the same
    * "long-verbatim-run" semantics at fixture scale. */
  val SpanW = 15

  /** Cross-document duplicated-span inventory (Lee et al. exact-substring
    * dedup, windowed re-expression — see [[Dedup.spanInventory]]). */
  def dedupSpanInventory(s: SparkSession, dir: String): DataFrame =
    Dedup.spanInventory(docs(s, dir), "doc_id", "text", SpanW)

  /** Repeated-span scrub: all but the corpus-first occurrence of every
    * duplicated W-token span removed, overlapping windows merged, docs
    * rebuilt from surviving tokens ([[Dedup.spanScrub]]). */
  def textSpanScrub(s: SparkSession, dir: String): DataFrame =
    Dedup.spanScrub(docs(s, dir), "doc_id", "text", SpanW)

  /** Standalone exact n-gram Jaccard pairs: the inverted-index shingle
    * self-join WITHOUT an LSH pre-filter, with the production skew guard
    * exercised (document-frequency cap 5 — shingles present in more than 5
    * docs are excluded from both intersection and union). The honest
    * full-recall baseline the LSH family approximates: join cost is
    * Σ_sh df² over capped shingles, bounded by cap·|shingle stream|. */
  def dedupJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Dedup.docShinglesRaw(docs(s, dir), "doc_id", "text"),
      minJaccard = 0.5, maxShingleDf = Some(5))

  /** Directed containment threshold (ppm) for [[dedupContainmentPairs]]. */
  val ContainPpm = 800000L

  /** SUBSUMED-DOCUMENT pairs by asymmetric shingle containment
    * ([[graft.operators.Dedup.containmentPairs]]): C(a→b) = |A∩B|/|A| ≥
    * 80%, the excerpt/quote/boilerplate-wrap case [[dedupJaccardPairs]]'s
    * symmetric score misses when the container dwarfs the contained. Same
    * df-cap-5 skew guard and hashed-shingle inverted index; the score
    * stays exact ppm integers end to end. */
  def dedupContainmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Dedup.docShinglesRaw(docs(s, dir), "doc_id", "text"),
      minContainPpm = ContainPpm, maxShingleDf = Some(5))

  /** Near-dup pairs by SimHash hamming ≤ 3 (pigeonhole band join).
    * maxChunkDf = 64: hot-bucket star fallback. Unlike the minhash band cap
    * this one BINDS on the corpus (templated docs share low chunks — the
    * largest bucket is 77 docs at sf0.01 and grows with N), so the oracle
    * models the same star semantics. */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Dedup.simhash(docs(s, dir), "doc_id", "text"),
        maxChunkDf = Some(64))
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))

  /** Within-document repetition signal: duplicate-3-gram fraction (Gopher
    * rule). Pure projection — computed inside the scan, no shuffle. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.shingles3Fast(col("text"))
    docs(s, dir).select(col("doc_id"),
      size(sh).as("n_shingles"),
      round(TextOps.repetitionRatio(col("text")), 6).as("rep_ratio"))
  }

  /** Benchmark decontamination: docs sharing any 3-token shingle with the
    * "eval set" (doc_id < 20 stands in for a benchmark's prompt set). Both
    * doc_id filters push into the parquet scan, so the eval side reads ~20
    * rows and the corpus side is scanned exactly once. */
  def dedupContamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contamination(
      Dedup.docShinglesRaw(d.where(col("doc_id") >= 20), "doc_id", "text"),
      Dedup.docShinglesRaw(d.where(col("doc_id") < 20), "doc_id", "text"))
  }

  /** Production-width decontamination: 13-token shingle overlap (the
    * benchmark-leak standard — a shared 13-gram means a verbatim quote, where
    * 3-grams also fire on idiom). Same single-pass broadcast plan. */
  def dedupContamination13g(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contamination(
      Dedup.docShinglesRawN(d.where(col("doc_id") >= 20), "doc_id", "text", 13),
      Dedup.docShinglesRawN(d.where(col("doc_id") < 20), "doc_id", "text", 13))
  }

  /** Sharded linear sequence packing at a 2048-token budget over 8 shards
    * (shards ≥ cluster parallelism at real scale; 8 keeps testdata packs
    * non-trivial). All-integer → oracle-exact with no rounding. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packSequences(docs(s, dir), "doc_id",
      TextOps.bpeTokenCount(col("text")), budget = 2048, shards = 8)

  /** NO-SPLIT packing twin: next-fit within shard, docs atomic, padding
    * waste surfaced per pack. The oracle replays the same sequential fold as
    * a recursive CTE over the in-shard row order. */
  def packSequencesNoSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packSequencesNoSplit(docs(s, dir), "doc_id",
      TextOps.bpeTokenCount(col("text")), budget = 2048, shards = 8)

  /** The END-TO-END training-data pipeline as ONE oracle-checked query —
    * what a user of this engine actually runs nightly, composed from the
    * already-proved catalog operators over a progressively-reduced corpus:
    *
    *   quality filter → exact dedup → benchmark decontamination (13-gram
    *   verbatim-overlap vs the eval set — the production width; 3-gram
    *   would nuke 75% of this corpus on idiom collisions) → near-dup
    *   keep-list (MinHash LSH → Jaccard ≥ 0.8 → min-label propagation) →
    *   sequence packing of the survivors.
    *
    * Scale shape: each stage consumes the previous stage's REDUCED id set
    * (semi/anti joins against small survivor lists, never re-materializing
    * the corpus); the near-dup confirm re-shingles only candidate docs.
    * The oracle composes the same proven CTE fragments over `toks` bound to
    * the clean sub-corpus — a drift in ANY stage breaks the final hash. */
  def pipelinePackClean(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val qualIds = textQualityFilter(s, dir).select(col("doc_id"))
      .where(col("doc_id") >= 20) // eval docs never enter the corpus
    val qualDocs = d.join(qualIds, Seq("doc_id"), "left_semi")
    val exactIds = Dedup.exactSurvivors(qualDocs, "doc_id", "text")
      .select(col("survivor_id").as("doc_id"))
    val exactDocs = qualDocs.join(exactIds, Seq("doc_id"), "left_semi")
    val contaminated = Dedup.contamination(
        Dedup.docShinglesRawN(exactDocs, "doc_id", "text", 13),
        Dedup.docShinglesRawN(d.where(col("doc_id") < 20), "doc_id", "text", 13))
      .select(col("doc").as("doc_id"))
    val cleanDocs = exactDocs.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true) // consumed by 3 downstream stages
    val sigs = Dedup.minhashSignatures(Dedup.docShinglesRaw(cleanDocs, "doc_id", "text"))
    val cand = Dedup.lshCandidates(sigs, maxBandDf = Some(64))
    val pairs = Dedup.jaccardPairs(
      Dedup.docShinglesRaw(cleanDocs, "doc_id", "text"), 0.8, candidates = Some(cand))
    val keptIds = Dedup.keepList(cleanDocs, "doc_id",
        pairs.select(col("doc_a"), col("doc_b")), rounds = 3)
      .where(col("doc") === col("canonical")).select(col("doc").as("doc_id"))
    val keptDocs = cleanDocs.join(keptIds, Seq("doc_id"), "left_semi")
    graft.operators.Packing.packSequences(keptDocs, "doc_id",
      TextOps.bpeTokenCount(col("text")), budget = 2048, shards = 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_pack_clean" -> pipelinePackClean _,
    "text_repetition" -> textRepetition _,
    "dedup_contamination" -> dedupContamination _,
    "dedup_contamination_13g" -> dedupContamination13g _,
    "pack_sequences" -> packSequences _,
    "pack_sequences_nosplit" -> packSequencesNoSplit _,
    "text_stats" -> textStats _,
    "text_quality_filter" -> textQualityFilter _,
    "text_lm_quality" -> textLmQuality _,
    "text_lm_quality3" -> textLmQuality3 _,
    "text_quality_clf" -> textQualityClf _,
    "text_domain_cap" -> textDomainCap _,
    "dedup_url" -> dedupUrl _,
    "pipeline_crawl_clean" -> pipelineCrawlClean _,
    "doc_corpus_card" -> docCorpusCard _,
    "clf_calibration" -> clfCalibration _,
    "clf_reliability" -> clfReliability _,
    "clf_confusion" -> clfConfusion _,
    "url_content_conflicts" -> urlContentConflicts _,
    "doc_length_histogram" -> docLengthHistogram _,
    "doc_corpus_drift" -> docCorpusDrift _,
    "text_pii_redact" -> textPiiRedact _,
    "text_normalize" -> textNormalize _,
    "ml_split_leakfree" -> mlSplitLeakfree _,
    "text_langid" -> textLangId _,
    "text_fingerprint" -> textFingerprint _,
    "text_rolling_hash" -> textRollingHash _,
    "text_token_freq" -> textTokenFreq _,
    "text_chunks" -> textChunks _,
    "text_bpe_tokens" -> textBpeTokens _,
    "bpe_train" -> bpeTrain _,
    "bpe_vocab" -> bpeVocab _,
    "text_bm25_topk" -> textBm25Topk _,
    "text_inverted_index" -> textInvertedIndex _,
    "text_phrase_search" -> textPhraseSearch _,
    "text_collocations" -> textCollocations _,
    "text_tfidf_topk" -> textTfidfTopk _,
    "text_simhash" -> textSimhash _,
    "dedup_exact" -> dedupExact _,
    "dedup_paragraph" -> dedupParagraph _,
    "dedup_minhash_sig" -> dedupMinhashSig _,
    "dedup_minhash_pairs" -> dedupMinhashPairs _,
    "dedup_pairs_cold" -> dedupPairsCold _,
    "dedup_incremental_pairs" -> dedupIncrementalPairs _,
    "dedup_keep_list" -> dedupKeepList _,
    "dedup_quality_rep" -> dedupQualityRep _,
    "dedup_cc_keep_list" -> dedupCcKeepList _,
    "dedup_gdpr_cascade" -> dedupGdprCascade _,
    "dedup_pairs_stream" -> dedupPairsStreamed _,
    "dedup_pairs_stream_evict" -> dedupPairsStreamEvict _,
    "dedup_simhash_incremental" -> dedupSimhashIncremental _,
    "dedup_simhash_pairs" -> dedupSimhashPairs _,
    "dedup_jaccard_pairs" -> dedupJaccardPairs _,
    "dedup_containment" -> dedupContainmentPairs _,
    "dedup_span_inventory" -> dedupSpanInventory _,
    "text_span_scrub" -> textSpanScrub _,
  )

  // ---- shared oracle CTE fragments ----
  private[queries] val toksCte =
    """toks AS (SELECT doc_id, text,
      | list_filter(string_split(text, ' '), x -> x != '') AS t FROM documents)""".stripMargin
  // dsh carries HASHED shingles (60-bit longs): both engines hash before the
  // distinct, so every downstream set op (sizes, intersections, jaccard)
  // runs over the identical hashed shingle space — and the join/distinct
  // payloads are 8-byte keys, mirroring the Spark side's shuffle shape.
  private[queries] val shinglesCte =
    """shs AS (SELECT doc_id AS doc, unnest(
      |   CASE WHEN len(t) < 3 THEN [text]
      |        ELSE list_transform(range(1, len(t) - 1),
      |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      | FROM toks),
      |dsh AS (SELECT DISTINCT doc,
      |   ('0x' || substr(md5(sh), 1, 15))::BIGINT AS sh FROM shs)""".stripMargin
  private def h60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
  /** Width-N twin of `shinglesCte` (CTE names suffixed to avoid clashes):
    * `range(1, len - ${width-2})` yields i = 1..len-width+1, one shingle per
    * window start, matching the kernel's n-width+1 count. */
  private def shinglesCteN(width: Int): String = {
    val terms = (0 until width).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""shs$width AS (SELECT doc_id AS doc, unnest(
       |   CASE WHEN len(t) < $width THEN [text]
       |        ELSE list_transform(range(1, len(t) - ${width - 2}),
       |               i -> $terms) END) AS sh
       | FROM toks),
       |dsh$width AS (SELECT DISTINCT doc,
       |   ('0x' || substr(md5(sh), 1, 15))::BIGINT AS sh FROM shs$width)""".stripMargin
  }
  /** POSITIONAL twin of [[shinglesCteN]] for the repeated-span family:
    * emits (doc, pos, sh) with pos 0-based, one row per stride-1 W-token
    * window (whole text at pos 0 for docs shorter than W — the kernel
    * convention). */
  private def spanCtes(width: Int): String = {
    val terms = (0 until width).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""sp0 AS (SELECT doc_id, text, t, unnest(range(1,
       |    CASE WHEN len(t) < $width THEN 2 ELSE len(t) - ${width - 2} END)) AS i
       | FROM toks),
       |spans AS (SELECT doc_id AS doc, CAST(i - 1 AS INT) AS pos,
       |  ${h60(s"CASE WHEN len(t) < $width THEN text ELSE $terms END")} AS sh
       | FROM sp0)""".stripMargin
  }

  private[queries] val sigCte =
    s"""hx AS (SELECT doc, sh % 1000000007 AS x FROM dsh),
       |sig AS (SELECT doc, CAST(h.h AS INT) AS h,
       |  min(((h.h * 2 + 3) * x + h.h * 97 + 1) % 1000000007) AS minhash
       | FROM hx CROSS JOIN (SELECT unnest(range(0, 16)) AS h) h
       | GROUP BY 1, 2)""".stripMargin
  // cand models the SAME maxBandDf=64 hot/cold star fallback the Spark side
  // runs (Dedup.lshCandidates): cold buckets all-pairs, hot buckets star
  // around the min-doc hub. The cap doesn't bind on this corpus (largest
  // band bucket ≪ 64), but modelling it means a larger corpus where it DOES
  // bind stays hash-green instead of failing as an opaque mismatch.
  private val pairsCtes =
    """banded AS (SELECT doc, h // 4 AS band,
      |   string_agg(minhash::VARCHAR, ',' ORDER BY h, minhash) AS key
      |  FROM sig GROUP BY 1, 2),
      |bstats AS (SELECT band, key, count(*) AS df, min(doc) AS hub
      |  FROM banded GROUP BY 1, 2),
      |btag AS (SELECT b.doc, b.band, b.key, s.df, s.hub
      |  FROM banded b JOIN bstats s USING (band, key)),
      |cand AS (SELECT DISTINCT doc_a, doc_b FROM (
      |  SELECT a.doc AS doc_a, b.doc AS doc_b
      |    FROM btag a JOIN btag b
      |      ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
      |   WHERE a.df <= 64 AND b.df <= 64
      |  UNION ALL
      |  SELECT hub AS doc_a, doc AS doc_b FROM btag
      |   WHERE df > 64 AND doc <> hub)),
      |sizes AS (SELECT doc, count(*) AS n FROM dsh GROUP BY 1),
      |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS c
      |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc < b.doc
      |  GROUP BY 1, 2),
      |jac AS (SELECT i.doc_a, i.doc_b,
      |   i.c * 1.0 / (sa.n + sb.n - i.c) AS jaccard
      |  FROM inter i
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN sizes sa ON i.doc_a = sa.doc
      |  JOIN sizes sb ON i.doc_b = sb.doc)""".stripMargin
  private val simhashCte =
    s"""hv AS (SELECT DISTINCT doc_id AS doc, ${h60("tok")} AS x
       |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
       |votes AS (SELECT doc, b.b, sum((x >> b.b) % 2 * 2 - 1) AS vote
       |  FROM hv CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b GROUP BY 1, 2),
       |sh64 AS (SELECT doc, CAST(sum(CASE WHEN vote > 0
       |    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1)""".stripMargin

  // language-ID fragments shared with the centroid oracle (MlQueries)
  private[queries] val langCaseSql: String =
    """CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |      WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |      WHEN s_fr >= s_zh THEN 'fr'
      |      ELSE 'zh' END""".stripMargin
  private[queries] val langScoredCtes: String = {
    val scores = TextOps.StopwordTable.map { case (lang, words) =>
      val lits = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(t, x -> list_contains($lits, x))) AS INT) AS s_$lang"
    }.mkString(",\n ")
    s"""$toksCte,
       |scored AS (SELECT doc_id, $scores FROM toks)""".stripMargin
  }

  // shingle LISTS kept in-row (for the repetition signal — no explode)
  private val shingleListCte =
    """shl AS (SELECT doc_id,
      |  CASE WHEN len(t) < 3 THEN [text]
      |       ELSE list_transform(range(1, len(t) - 1),
      |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS sh
      | FROM toks)""".stripMargin

  /** Full-corpus confirmed-pair oracle — shared by the full and incremental
    * entries (the incremental path's whole contract is equality with this). */
  private lazy val confirmedPairsSql =
    s"""WITH $toksCte, $shinglesCte, $sigCte, $pairsCtes
       |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
       |FROM jac WHERE jaccard >= 0.8""".stripMargin

  // UNCAPPED banding candidates — the incremental path runs no maxBandDf
  // fallback on either leg (Dedup.incrementalPairs), so its oracle must
  // model plain all-pairs-within-bucket semantics. Sharing the capped CTE
  // would only stay green while the cap never binds on the corpus.
  private[queries] val pairsCtesUncapped =
    """banded AS (SELECT doc, h // 4 AS band,
      |   string_agg(minhash::VARCHAR, ',' ORDER BY h, minhash) AS key
      |  FROM sig GROUP BY 1, 2),
      |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc),
      |sizes AS (SELECT doc, count(*) AS n FROM dsh GROUP BY 1),
      |inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS c
      |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc < b.doc
      |  GROUP BY 1, 2),
      |jac AS (SELECT i.doc_a, i.doc_b,
      |   i.c * 1.0 / (sa.n + sb.n - i.c) AS jaccard
      |  FROM inter i
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN sizes sa ON i.doc_a = sa.doc
      |  JOIN sizes sb ON i.doc_b = sb.doc)""".stripMargin

  private lazy val incrementalPairsSql =
    s"""WITH $toksCte, $shinglesCte, $sigCte, $pairsCtesUncapped
       |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
       |FROM jac WHERE jaccard >= 0.8""".stripMargin

  /** Composed pipeline oracle: the shared fragments (`shinglesCte`,
    * `sigCte`, `pairsCtes`) run verbatim with `toks` BOUND TO THE CLEAN
    * SUB-CORPUS — quality-passed, exact-deduped, decontaminated — so the
    * near-dup + packing stages are checked on exactly the rows the Spark
    * pipeline feeds them. */
  private lazy val pipelineOracleSql = {
    val en = TextOps.StopwordTable.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val terms13 = (0 until 13).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    val sh13 = s"""CASE WHEN len(t) < 13 THEN [text]
                  |     ELSE list_transform(range(1, len(t) - 11),
                  |            i -> $terms13) END""".stripMargin
    s"""WITH toks_all AS (SELECT doc_id, text,
       |  list_filter(string_split(text, ' '), x -> x != '') AS t FROM documents),
       |qual AS (SELECT doc_id FROM (
       |  SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
       |    round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text), 6) AS alpha_ratio,
       |    CAST(len(list_filter(t, x -> list_contains($en, x))) AS INT) AS stop_hits
       |  FROM toks_all)
       |  WHERE n_tokens BETWEEN 5 AND 5000 AND alpha_ratio >= 0.5
       |    AND stop_hits >= 1 AND doc_id >= 20),
       |exact AS (SELECT min(d.doc_id) AS doc_id
       |  FROM documents d JOIN qual USING (doc_id) GROUP BY md5(d.text)),
       |toks_pre AS (SELECT a.doc_id, a.text, a.t
       |  FROM toks_all a JOIN exact USING (doc_id)),
       |ev_sh AS (SELECT DISTINCT ${h60("sh")} AS sh FROM (
       |  SELECT unnest($sh13) AS sh FROM toks_all WHERE doc_id < 20)),
       |csh AS (SELECT DISTINCT doc_id AS doc, ${h60("sh")} AS sh FROM (
       |  SELECT doc_id, unnest($sh13) AS sh FROM toks_pre)),
       |cont AS (SELECT DISTINCT doc FROM csh JOIN ev_sh USING (sh)),
       |toks AS (SELECT * FROM toks_pre
       |  WHERE doc_id NOT IN (SELECT doc FROM cont)),
       |$shinglesCte, $sigCte, $pairsCtes,
       |jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp
       |  UNION ALL SELECT doc_id, doc_id FROM toks),
       |l1 AS (SELECT src AS doc, min(dst) AS lbl FROM edges GROUP BY 1),
       |l2 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
       |  FROM edges e JOIN l1 l ON e.dst = l.doc GROUP BY 1),
       |l3 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
       |  FROM edges e JOIN l2 l ON e.dst = l.doc GROUP BY 1),
       |keep AS (SELECT doc FROM l3 WHERE doc = lbl),
       |kept AS (SELECT toks.doc_id, toks.text
       |  FROM toks JOIN keep ON toks.doc_id = keep.doc),
       |${graft.functions.Bpe.oracleCountCte("kept", "p")},
       |pk AS (SELECT doc_id, bpe_tokens AS n_tokens,
       |  ('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 8 AS shard
       | FROM pcnt),
       |pc AS (SELECT doc_id, shard, n_tokens,
       |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       | FROM pk)
       |SELECT doc_id, shard,
       | CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
       | CAST((cum - n_tokens) % 2048 AS BIGINT) AS offset,
       | n_tokens
       |FROM pc""".stripMargin
  }

  // the classifier's training + scoring CTE chain (labs…sc; binds on toks)
  // — shared by text_quality_clf and the crawl-clean capstone. floor() is
  // mandatory in lgSql: DuckDB's `//` with a DOUBLE divisor is plain
  // division, and CAST alone rounds half-even (off-by-one mantissa).
  private def lgSql(q: String) = {
    val mant = Log2MantissaQ16.mkString("[", ", ", "]")
    s"(16 * (length(bin($q)) - 1) + ($mant)[CAST(floor(($q) * 16 / power(2, length(bin($q)) - 1)) AS INT) - 15])"
  }
  private[queries] val clfScoreCtes: String = {
    val en = TextOps.StopwordTable.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val B = ClfBuckets
    s"""labs AS (SELECT doc_id,
       |  CASE WHEN len(t) BETWEEN 5 AND 5000
       |   AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text) >= 0.5
       |   AND len(list_filter(t, x -> list_contains($en, x))) >= 1
       |  THEN 1 ELSE 0 END AS keep FROM toks),
       |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       |bt AS (SELECT doc_id,
       |  ('0x' || substr(md5('clf:' || tok), 1, 15))::BIGINT % $B AS b FROM tok),
       |trc AS (SELECT b, sum(keep) AS nk, sum(1 - keep) AS nd
       |  FROM bt JOIN labs USING (doc_id) GROUP BY 1),
       |tot AS (SELECT sum(nk) AS tk, sum(nd) AS td FROM trc),
       |wt AS (SELECT b, ${lgSql("nk + 1")} - ${lgSql("nd + 1")}
       |    - ((SELECT ${lgSql(s"tk + $B")} - ${lgSql(s"td + $B")} FROM tot)) AS w
       |  FROM trc),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |    CAST(sum(w) AS BIGINT) AS clf_q16
       |  FROM bt JOIN wt USING (b) GROUP BY 1)""".stripMargin
  }

  // the raw-URL mess + canonicalization chain of dedup_url (raw…canon) —
  // shared by dedup_url and the crawl-clean capstone. NB: no line here may
  // BEGIN with `||` — this fragment is re-embedded inside stripMargin'ed
  // oracle strings, whose margin stripping would eat the first pipe.
  private[queries] val urlCanonCtes: String =
    """raw AS (SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
      |  CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
      |       WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END ||
      |  'd' || CAST(base % 37 AS VARCHAR) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '.Example.COM' ELSE '.example.com' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      |  '/p/' || CAST(base % 101 AS VARCHAR) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      |  '?' ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN 'id=' || CAST(base % 53 AS VARCHAR) || '&a=' || CAST(base % 7 AS VARCHAR)
      |       ELSE 'a=' || CAST(base % 7 AS VARCHAR) || '&id=' || CAST(base % 53 AS VARCHAR) END ||
      |  CASE WHEN doc_id % 3 = 1 THEN '&utm_source=feed' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN '&fbclid=x' || CAST(doc_id AS VARCHAR) ELSE '' END ||
      |  CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END AS u
      |  FROM (SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 3 THEN doc_id // 16 ELSE doc_id // 2 END AS base
      |    FROM documents)),
      |nofrag AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM raw),
      |parts AS (SELECT doc_id,
      |  lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
      |  regexp_replace(regexp_replace(
      |    lower(regexp_extract(u, '^[A-Za-z]+://([^/?#]+)', 1)),
      |    CASE lower(regexp_extract(u, '^([A-Za-z]+)://', 1))
      |      WHEN 'http' THEN ':80$' WHEN 'https' THEN ':443$'
      |      ELSE '^$' END, ''), '^www\.', '') AS host,
      |  regexp_replace(regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      |    '/+$', '') AS path,
      |  array_to_string(list_sort(list_filter(
      |    string_split(regexp_extract(u, '\?([^#]*)', 1), '&'),
      |    p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=') AND p != '')),
      |    '&') AS params
      |  FROM nofrag),
      |canon AS (SELECT doc_id, scheme || '://' || host || path ||
      |  CASE WHEN params != '' THEN '?' || params ELSE '' END AS url_canonical
      |  FROM parts)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "pipeline_pack_clean" -> pipelineOracleSql,
    "text_repetition" ->
      s"""WITH $toksCte, $shingleListCte
         |SELECT doc_id, CAST(len(sh) AS INT) AS n_shingles,
         | round(1.0 - len(list_distinct(sh)) * 1.0 / len(sh), 6) AS rep_ratio
         |FROM shl""".stripMargin,
    "dedup_contamination" ->
      s"""WITH $toksCte, $shinglesCte,
         |evl AS (SELECT sh, min(doc) AS first_eval FROM dsh
         |        WHERE doc < 20 GROUP BY 1)
         |SELECT d.doc, CAST(count(DISTINCT d.sh) AS BIGINT) AS n_shared,
         |       min(e.first_eval) AS first_eval
         |FROM dsh d JOIN evl e USING (sh)
         |WHERE d.doc >= 20 GROUP BY 1""".stripMargin,
    "dedup_contamination_13g" ->
      s"""WITH $toksCte, ${shinglesCteN(13)},
         |evl AS (SELECT sh, min(doc) AS first_eval FROM dsh13
         |        WHERE doc < 20 GROUP BY 1)
         |SELECT d.doc, CAST(count(DISTINCT d.sh) AS BIGINT) AS n_shared,
         |       min(e.first_eval) AS first_eval
         |FROM dsh13 d JOIN evl e USING (sh)
         |WHERE d.doc >= 20 GROUP BY 1""".stripMargin,
    "pack_sequences" ->
      s"""WITH ${graft.functions.Bpe.oracleCountCte("documents", "b")},
         |t AS (SELECT doc_id, bpe_tokens AS n_tokens,
         |  ('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 8 AS shard
         | FROM bcnt),
         |c AS (SELECT doc_id, shard, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         | FROM t)
         |SELECT doc_id, shard,
         | CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
         | CAST((cum - n_tokens) % 2048 AS BIGINT) AS offset,
         | n_tokens
         |FROM c""".stripMargin,
    // next-fit is a sequential fold — the oracle runs it as ONE
    // list_reduce scan per shard (elements are singleton struct-lists so
    // the accumulator carries the whole prefix; acc[-1] is the running
    // state). The prior per-row recursive-CTE replay ground DuckDB 30+ min
    // at 5,000 docs; this form is 0.05 s at sf0.1 / 0.5 s at sf1, which is
    // what lets the FULL catalog hash-gate at sf0.1 complete. Semantics
    // unchanged: a doc joins the running pack iff it fits OR the pack is
    // empty (zero-length docs can leave used = 0); otherwise it opens the
    // next pack.
    "pack_sequences_nosplit" ->
      s"""WITH ${graft.functions.Bpe.oracleCountCte("documents", "b")},
         |t AS (SELECT doc_id, bpe_tokens AS n_tokens,
         |  ('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 8 AS shard
         | FROM bcnt),
         |s AS (SELECT shard, list_transform(
         |   list({'doc_id': doc_id, 'n': n_tokens} ORDER BY doc_id),
         |   x -> [{'doc_id': x.doc_id, 'n': x.n, 'pack': CAST(0 AS BIGINT),
         |          'off': CAST(0 AS BIGINT), 'used': CAST(x.n AS BIGINT)}]) AS els
         | FROM t GROUP BY shard),
         |f AS (SELECT shard, list_reduce(els, (acc, x) -> list_append(acc,
         |   CASE WHEN acc[-1].used + x[1].n <= 2048 OR acc[-1].used = 0
         |        THEN {'doc_id': x[1].doc_id, 'n': x[1].n, 'pack': acc[-1].pack,
         |              'off': acc[-1].used, 'used': acc[-1].used + x[1].n}
         |        ELSE {'doc_id': x[1].doc_id, 'n': x[1].n, 'pack': acc[-1].pack + 1,
         |              'off': CAST(0 AS BIGINT), 'used': CAST(x[1].n AS BIGINT)} END)) AS res
         | FROM s),
         |fit AS (SELECT shard, u.doc_id AS doc_id, u.pack AS pack_id,
         |   u.off AS "offset", u.n AS n_tokens
         | FROM (SELECT shard, unnest(res) AS u FROM f)),
         |w AS (SELECT shard, pack_id, max("offset" + n_tokens) AS used
         |  FROM fit GROUP BY 1, 2)
         |SELECT f.doc_id, f.shard, f.pack_id, f."offset" AS "offset", f.n_tokens,
         |  greatest(2048 - w.used, 0) / 2048.0 AS waste_frac
         |FROM fit f JOIN w USING (shard, pack_id)""".stripMargin,
    "text_stats" ->
      s"""WITH $toksCte, ${graft.functions.Bpe.oracleCountCte("documents", "b")}
         |SELECT toks.doc_id,
         | CAST(len(t) AS INT) AS n_tokens,
         | CAST(len(list_distinct(t)) AS INT) AS n_distinct,
         | CAST(bcnt.bpe_tokens AS INT) AS bpe_tokens,
         | round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text), 6) AS alpha_ratio,
         | round(list_sum(list_transform(t, x -> len(x))) * 1.0 / len(t), 4) AS avg_tok_len
         |FROM toks JOIN bcnt USING (doc_id)""".stripMargin,
    "text_quality_filter" -> {
      val en = TextOps.StopwordTable.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $toksCte,
         |q AS (SELECT doc_id,
         |  CAST(len(t) AS INT) AS n_tokens,
         |  round(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text), 6) AS alpha_ratio,
         |  CAST(len(list_filter(t, x -> list_contains($en, x))) AS INT) AS stop_hits
         | FROM toks)
         |SELECT doc_id, n_tokens, alpha_ratio, stop_hits FROM q
         |WHERE n_tokens BETWEEN 5 AND 5000
         |  AND alpha_ratio >= 0.5 AND stop_hits >= 1""".stripMargin
    },
    // the bigram-LM replay: training counts + vocab from the rule-filter
    // keep set, then every floor-log2 integer surprisal fold — `bin`/`//`
    // keep the whole chain transcendental-free in both engines
    "text_lm_quality" -> {
      val en = TextOps.StopwordTable.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $toksCte,
         |keeps AS (SELECT doc_id FROM toks
         | WHERE len(t) BETWEEN 5 AND 5000
         |   AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text) >= 0.5
         |   AND len(list_filter(t, x -> list_contains($en, x))) >= 1),
         |bg AS (SELECT doc_id,
         |   unnest(list_transform(range(1, len(t)), i -> {'a': t[i], 'b': t[i+1]})) AS p
         |  FROM toks WHERE len(t) >= 2),
         |bg2 AS (SELECT doc_id, p.a AS a, p.b AS b FROM bg),
         |tr AS (SELECT bg2.* FROM bg2 JOIN keeps USING (doc_id)),
         |cab AS (SELECT a, b, count(*) AS cab FROM tr GROUP BY 1, 2),
         |c1 AS (SELECT a, count(*) AS c1 FROM tr GROUP BY 1),
         |vocab AS (SELECT count(DISTINCT tok) AS v
         |  FROM (SELECT unnest(t) AS tok FROM toks JOIN keeps USING (doc_id))),
         |sc AS (SELECT doc_id,
         |   length(bin((coalesce(c1.c1, 0) + (SELECT v FROM vocab))
         |              // (coalesce(cab.cab, 0) + 1))) - 1 AS bits
         |  FROM bg2 LEFT JOIN cab USING (a, b) LEFT JOIN c1 USING (a)),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |   CAST(sum(bits) AS BIGINT) AS lm_bits FROM sc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(lm_bits, 0) AS lm_bits,
         |  CAST(coalesce(lm_bits, 0) * 4 <= coalesce(n_bigrams, 0) * $LmQuarterBitsPerTok AS INT) AS keep
         |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin
    },
    // the trigram back-off replay: order-3 counts + context counts + the
    // bigram fallback tables; seen contexts score the add-one trigram
    // floor-log2, unseen contexts pay the whole-bit stupid-backoff penalty
    // plus the add-one bigram floor-log2 of the LAST pair — all integer
    "text_lm_quality3" -> {
      val en = TextOps.StopwordTable.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $toksCte,
         |keeps AS (SELECT doc_id FROM toks
         | WHERE len(t) BETWEEN 5 AND 5000
         |   AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text) >= 0.5
         |   AND len(list_filter(t, x -> list_contains($en, x))) >= 1),
         |tg2 AS (SELECT doc_id, p.a AS a, p.b AS b, p.c AS c FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
         |     i -> {'a': t[i], 'b': t[i+1], 'c': t[i+2]})) AS p
         |   FROM toks WHERE len(t) >= 3)),
         |bg2 AS (SELECT doc_id, p.a AS a, p.b AS b FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |     i -> {'a': t[i], 'b': t[i+1]})) AS p
         |   FROM toks WHERE len(t) >= 2)),
         |tr3 AS (SELECT tg2.* FROM tg2 JOIN keeps USING (doc_id)),
         |trb AS (SELECT bg2.* FROM bg2 JOIN keeps USING (doc_id)),
         |c3 AS (SELECT a, b, c, count(*) AS c3 FROM tr3 GROUP BY 1, 2, 3),
         |c2 AS (SELECT a, b, count(*) AS c2 FROM tr3 GROUP BY 1, 2),
         |cbc AS (SELECT a AS b, b AS c, count(*) AS cbc FROM trb GROUP BY 1, 2),
         |c1b AS (SELECT a AS b, count(*) AS c1 FROM trb GROUP BY 1),
         |vocab AS (SELECT count(DISTINCT tok) AS v
         |  FROM (SELECT unnest(t) AS tok FROM toks JOIN keeps USING (doc_id))),
         |sc AS (SELECT tg2.doc_id,
         |  CASE WHEN c2.c2 IS NOT NULL
         |    THEN length(bin((c2.c2 + (SELECT v FROM vocab))
         |                    // (coalesce(c3.c3, 0) + 1))) - 1
         |    ELSE ${LmScorer.BackoffBits}
         |         + length(bin((coalesce(c1b.c1, 0) + (SELECT v FROM vocab))
         |                       // (coalesce(cbc.cbc, 0) + 1))) - 1
         |  END AS bits
         |  FROM tg2 LEFT JOIN c3 USING (a, b, c) LEFT JOIN c2 USING (a, b)
         |           LEFT JOIN cbc USING (b, c) LEFT JOIN c1b USING (b)),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |   CAST(sum(bits) AS BIGINT) AS lm_bits FROM sc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(n_trigrams, 0) AS n_trigrams,
         |  coalesce(lm_bits, 0) AS lm_bits,
         |  CAST(coalesce(lm_bits, 0) * 4 <= coalesce(n_trigrams, 0) * $Lm3QuarterBitsPerTok AS INT) AS keep
         |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin
    },
    // hashed-feature NB classifier: the rule labels, the md5 bucket hash,
    // the per-bucket counts, the 1/16-bit log2 (exponent from bin-length +
    // the SAME 16-entry mantissa table), and the per-doc threshold all
    // replayed with pure integer arithmetic
    "text_quality_clf" ->
      s"""WITH $toksCte,
         |$clfScoreCtes
         |SELECT l.doc_id,
         |  coalesce(n_toks, 0) AS n_toks,
         |  coalesce(clf_q16, 0) AS clf_q16,
         |  CAST(coalesce(clf_q16, 0) >= coalesce(n_toks, 0) * $ClfQ16PerTok AS INT)
         |    AS pred_keep,
         |  l.keep AS rule_keep
         |FROM labs l LEFT JOIN sc USING (doc_id)""".stripMargin,
    // the same scoring chain folded to the 2x2 table; ppm metrics and F1
    // all by integer division — nothing float crosses the gate
    "clf_confusion" ->
      s"""WITH $toksCte,
         |$clfScoreCtes,
         |pd AS (SELECT l.keep AS rule_keep,
         |    CAST(coalesce(clf_q16, 0) >= coalesce(n_toks, 0) * $ClfQ16PerTok AS INT)
         |      AS pred_keep
         |  FROM labs l LEFT JOIN sc USING (doc_id)),
         |m AS (SELECT
         |  CAST(sum(CASE WHEN rule_keep = 1 AND pred_keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN rule_keep = 0 AND pred_keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN rule_keep = 1 AND pred_keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN rule_keep = 0 AND pred_keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM pd),
         |r AS (SELECT tp, fp, fn, tn,
         |  (1000000 * tp) // (tp + fp) AS precision_ppm,
         |  (1000000 * tp) // (tp + fn) AS recall_ppm FROM m)
         |SELECT tp, fp, fn, tn, precision_ppm, recall_ppm,
         |  (2 * precision_ppm * recall_ppm) // (precision_ppm + recall_ppm) AS f1_ppm
         |FROM r""".stripMargin,
    "doc_corpus_drift" -> {
      val en = TextOps.StopwordTable.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $toksCte,
         |r AS (SELECT doc_id, text, source, n_chars, doc_id % 2 AS b,
         |  CASE WHEN len(t) BETWEEN 5 AND 5000
         |   AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text) >= 0.5
         |   AND len(list_filter(t, x -> list_contains($en, x))) >= 1
         |  THEN 1 ELSE 0 END AS rk
         |  FROM toks JOIN documents USING (doc_id, text)),
         |agg AS (SELECT source,
         |  sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS a_docs,
         |  sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS b_docs,
         |  sum(CASE WHEN b = 0 THEN rk ELSE 0 END) AS a_keep,
         |  sum(CASE WHEN b = 1 THEN rk ELSE 0 END) AS b_keep,
         |  sum(CASE WHEN b = 0 THEN n_chars ELSE 0 END) AS a_chars,
         |  sum(CASE WHEN b = 1 THEN n_chars ELSE 0 END) AS b_chars
         | FROM r GROUP BY 1)
         |SELECT source, CAST(a_docs AS BIGINT) AS a_docs,
         |  CAST(b_docs AS BIGINT) AS b_docs,
         |  CAST(a_keep * 1000000 // greatest(a_docs, 1) AS BIGINT) AS a_keep_ppm,
         |  CAST(b_keep * 1000000 // greatest(b_docs, 1) AS BIGINT) AS b_keep_ppm,
         |  CAST(b_keep * 1000000 // greatest(b_docs, 1)
         |     - a_keep * 1000000 // greatest(a_docs, 1) AS BIGINT) AS keep_delta_ppm,
         |  CAST(a_chars * 1000 // greatest(a_docs, 1) AS BIGINT) AS a_chars_per_kdoc,
         |  CAST(b_chars * 1000 // greatest(b_docs, 1) AS BIGINT) AS b_chars_per_kdoc
         |FROM agg""".stripMargin
    },
    "doc_length_histogram" ->
      """SELECT source,
        |  CAST(CASE WHEN n_chars <= 0 THEN 0
        |       ELSE length(bin(n_chars)) END AS INT) AS log2_bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // the same canon chain + md5 digests; only conflicted canonicals emit
    "url_content_conflicts" ->
      s"""WITH $urlCanonCtes,
         |cd AS (SELECT c.url_canonical, md5(d.text) AS digest, d.doc_id
         |  FROM canon c JOIN documents d USING (doc_id))
         |SELECT url_canonical, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT digest) AS BIGINT) AS n_digests,
         |  min(doc_id) AS first_doc
         |FROM cd GROUP BY 1 HAVING count(DISTINCT digest) > 1""".stripMargin,
    // calibration: the classifier chain's per-doc scores re-derived, the
    // milli-per-token normalization, ntile over the identical total order
    // histogram cutpoints replayed exactly: bounded value histogram,
    // cumulative window over ≤16001 rows, nine ceil-rank boundaries,
    // in-scan comparison assignment (1 + count of cutpoints below)
    "clf_calibration" ->
      s"""WITH $toksCte,
         |$clfScoreCtes,
         |perdoc AS MATERIALIZED (SELECT l.doc_id, l.keep AS rule_keep,
         |    coalesce(clf_q16, 0) * 1000 // greatest(coalesce(n_toks, 0), 1)
         |      AS spt_milli
         |  FROM labs l LEFT JOIN sc USING (doc_id)),
         |hist AS (SELECT spt_milli, CAST(count(*) AS BIGINT) AS cnt
         |  FROM perdoc GROUP BY 1),
         |cum AS (SELECT spt_milli,
         |    CAST(sum(cnt) OVER (ORDER BY spt_milli) AS BIGINT) AS cum,
         |    CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS total FROM hist),
         |cuts AS (SELECT ii.i, min(cum.spt_milli) AS v
         |  FROM (SELECT unnest(range(1, 10)) AS i) ii
         |  JOIN cum ON cum.cum >= (cum.total * ii.i + 9) // 10
         |  GROUP BY ii.i),
         |dc AS (SELECT p.rule_keep, p.spt_milli,
         |    CAST(1 + (SELECT count(*) FROM cuts c WHERE p.spt_milli > c.v)
         |      AS INT) AS decile
         |  FROM perdoc p)
         |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(rule_keep) AS BIGINT) AS n_rule_keep,
         |  CAST(min(spt_milli) AS BIGINT) AS min_spt_milli,
         |  CAST(max(spt_milli) AS BIGINT) AS max_spt_milli
         |FROM dc GROUP BY 1""".stripMargin,
    // clf_calibration's decile chain verbatim, then ml_isotonic's minimax
    // chain over the decile histogram — the e6 floor commutes with min/max
    // so both engines emit identical calibrated integers
    "clf_reliability" ->
      s"""WITH $toksCte,
         |$clfScoreCtes,
         |perdoc AS MATERIALIZED (SELECT l.doc_id, l.keep AS rule_keep,
         |    coalesce(clf_q16, 0) * 1000 // greatest(coalesce(n_toks, 0), 1)
         |      AS spt_milli
         |  FROM labs l LEFT JOIN sc USING (doc_id)),
         |hist AS (SELECT spt_milli, CAST(count(*) AS BIGINT) AS cnt
         |  FROM perdoc GROUP BY 1),
         |cum AS (SELECT spt_milli,
         |    CAST(sum(cnt) OVER (ORDER BY spt_milli) AS BIGINT) AS cum,
         |    CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS total FROM hist),
         |cuts AS (SELECT ii.i, min(cum.spt_milli) AS v
         |  FROM (SELECT unnest(range(1, 10)) AS i) ii
         |  JOIN cum ON cum.cum >= (cum.total * ii.i + 9) // 10
         |  GROUP BY ii.i),
         |dc AS (SELECT p.rule_keep, p.spt_milli,
         |    CAST(1 + (SELECT count(*) FROM cuts c WHERE p.spt_milli > c.v)
         |      AS INT) AS decile
         |  FROM perdoc p),
         |dec AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(rule_keep) AS BIGINT) AS pos FROM dc GROUP BY 1),
         |pre AS (SELECT decile, n, pos,
         |    CAST(sum(n) OVER w AS BIGINT) AS cn,
         |    CAST(sum(pos) OVER w AS BIGINT) AS cp
         |  FROM dec
         |  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |m AS (SELECT lo.decile AS i, hi.decile AS j,
         |    (1000000 * (hi.cp - (lo.cp - lo.pos))) // (hi.cn - (lo.cn - lo.n)) AS mean_ppm
         |  FROM pre lo JOIN pre hi ON lo.decile <= hi.decile),
         |inner_min AS (SELECT k.decile AS k, k.n, k.pos, m.i,
         |    CAST(min(m.mean_ppm) AS BIGINT) AS mn
         |  FROM m JOIN pre k ON m.i <= k.decile AND m.j >= k.decile
         |  GROUP BY 1, 2, 3, 4)
         |SELECT k AS decile, n AS n_docs, pos AS n_rule_keep,
         |  CAST((1000000 * pos) // n AS BIGINT) AS raw_ppm,
         |  CAST(max(mn) AS BIGINT) AS iso_ppm
         |FROM inner_min GROUP BY 1, 2, 3""".stripMargin,
    // every card number drawn from the proven kernels: the BPE count CTE,
    // the rule-filter CASE, the stopword language-ID case
    "doc_corpus_card" -> {
      val en = graft.operators.TextOps.StopwordTable.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH ${graft.functions.Bpe.oracleCountCte("documents", "m")},
         |$langScoredCtes,
         |lp AS (SELECT doc_id, $langCaseSql AS lang_pred FROM scored),
         |rules AS (SELECT doc_id,
         |  CASE WHEN len(t) BETWEEN 5 AND 5000
         |   AND len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text) >= 0.5
         |   AND len(list_filter(t, x -> list_contains($en, x))) >= 1
         |  THEN 1 ELSE 0 END AS keep FROM toks)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(mcnt.bpe_tokens) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(rules.keep) AS BIGINT) AS n_rule_keep,
         |  CAST(sum(CASE WHEN lp.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en,
         |  CAST(sum(d.n_chars) AS BIGINT) AS tot_chars
         |FROM documents d
         |JOIN mcnt USING (doc_id) JOIN lp USING (doc_id) JOIN rules USING (doc_id)
         |GROUP BY 1""".stripMargin
    },
    // the capstone oracle rebinds the proven fragments — URL canon chain,
    // classifier train+score, rank window, hash threshold — into one chain;
    // a drift in any stage breaks the final hash
    "pipeline_crawl_clean" ->
      s"""WITH $toksCte,
         |$clfScoreCtes,
         |$urlCanonCtes,
         |u1 AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY url_canonical),
         |c2 AS (SELECT l.doc_id FROM labs l LEFT JOIN sc USING (doc_id)
         |  WHERE coalesce(sc.clf_q16, 0) >= coalesce(sc.n_toks, 0) * $ClfQ16PerTok),
         |s2 AS (SELECT doc_id FROM u1 JOIN c2 USING (doc_id)),
         |dom AS (SELECT d.doc_id, d.n_chars,
         |  'd' || CAST(d.doc_id % 37 AS VARCHAR) || '.example.com' AS domain
         |  FROM documents d JOIN s2 USING (doc_id)),
         |rk AS (SELECT domain, doc_id, n_chars,
         |  row_number() OVER (PARTITION BY domain
         |    ORDER BY n_chars DESC, doc_id) AS r FROM dom),
         |s3 AS (SELECT domain, doc_id, n_chars FROM rk WHERE r <= $DomainCapK)
         |SELECT doc_id, domain, n_chars,
         |  CAST(least(1000000, n_chars * 4000) AS BIGINT) AS rate_ppm
         |FROM s3
         |WHERE ('0x' || substr(md5('ws:' || doc_id), 1, 15))::BIGINT % 1000000
         |  < least(1000000, n_chars * 4000)""".stripMargin,
    // the heap operator's result == the window-rank formulation it replaces
    "text_domain_cap" ->
      s"""WITH dom AS (SELECT doc_id, n_chars,
         |  'd' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS domain
         |  FROM documents),
         |rk AS (SELECT domain, doc_id, n_chars,
         |  row_number() OVER (PARTITION BY domain
         |    ORDER BY n_chars DESC, doc_id) AS r FROM dom)
         |SELECT domain, doc_id, n_chars FROM rk WHERE r <= $DomainCapK""".stripMargin,
    // the identical raw-URL mess rebuilt from doc_id, then the LITERAL same
    // canonicalization chain (regexes are the dialect-portable subset; the
    // param sort is byte-lex over ASCII in both engines)
    "dedup_url" ->
      s"""WITH $urlCanonCtes
        |SELECT url_canonical, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS keep_doc
        |FROM canon GROUP BY 1""".stripMargin,
    // the LITERAL same regex patterns (dialect-portable subset) + the same
    // planted Unicode mess (decomposed accents, zero-width chars, exotic
    // spaces) replayed via chr(); DuckDB's utf8proc nfc_normalize vs the
    // JDK Normalizer -- two independent Unicode implementations must agree
    // on every codepoint for the hash to match
    "text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id, CASE doc_id % 5
        |    WHEN 0 THEN 'Cafe' || chr(769) || ' ' || text
        |    WHEN 1 THEN 'zero' || chr(8203) || 'width' || chr(8205) || ' ' || text
        |    WHEN 2 THEN 'nb' || chr(160) || 'sp ' || chr(8195) || ' ' || chr(12288) || ' ' || text
        |    WHEN 3 THEN 'A' || chr(778) || ' ring' || chr(65279) || ' ' || text
        |    ELSE text END AS r
        |  FROM documents)
        |SELECT doc_id, CAST(length(r) AS INT) AS len_raw,
        |  trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(r),
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |    '[\x{00A0}\x{2000}-\x{200A}\x{2028}\x{2029}\x{3000}]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS text_norm,
        |  CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(r),
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |    '[\x{00A0}\x{2000}-\x{200A}\x{2028}\x{2029}\x{3000}]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS INT) AS len_norm
        |FROM raw""".stripMargin,
    // deterministic PII planting; the redacted string itself is hashed
    "text_pii_redact" -> {
      val (em, ph, sk) = (TextOps.EmailRe, TextOps.PhoneRe, TextOps.SecretRe)
      s"""WITH aug AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com'
         |    || CASE WHEN doc_id % 2 = 0 THEN ' call 555-'
         |         || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-'
         |         || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
         |       ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0
         |         THEN ' sk_' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 20)
         |       ELSE '' END AS a
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(a, '$em')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(a, '$ph')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(a, '$sk')) AS INT) AS n_keys,
         |  regexp_replace(regexp_replace(regexp_replace(a,
         |    '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$sk', '[KEY]', 'g')
         |    AS redacted
         |FROM aug""".stripMargin
    },
    "text_langid" ->
      s"""WITH $langScoredCtes
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, $langCaseSql AS pred
         |FROM scored""".stripMargin,
    "text_fingerprint" ->
      s"""WITH $toksCte, $shinglesCte
         |SELECT DISTINCT doc, sh AS fp FROM dsh
         |WHERE sh % 64 = 0""".stripMargin,
    "text_token_freq" ->
      s"""WITH $toksCte
         |SELECT tok, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest(t) AS tok FROM toks)
         |GROUP BY 1 ORDER BY n DESC, tok LIMIT 100""".stripMargin,
    // chunk k covers 1-based BPE tokens [k*stride+1, k*stride+size]; DuckDB
    // list slicing t[a:b] is 1-based inclusive and clamps past the end,
    // matching Spark's slice(t, start, length) truncation. A chunk exists
    // only if it adds unseen tokens: 1 + ceil(max(n - size, 0) / stride).
    "text_chunks" ->
      s"""WITH ${graft.functions.Bpe.oracleTokensCte("documents", "b")},
         |c AS (SELECT doc_id, t, len(t) AS n,
         |  unnest(range(0, 1 + (GREATEST(len(t) - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride)) AS k
         | FROM btok)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |  CAST(LEAST($ChunkSize, n - k * $ChunkStride) AS INT) AS n_chunk_tokens,
         |  ${h60(s"array_to_string(t[CAST(k * $ChunkStride + 1 AS INT):CAST(k * $ChunkStride + $ChunkSize AS INT)], ' ')")} AS chunk_hash
         |FROM c""".stripMargin,
    "text_bpe_tokens" ->
      s"""WITH ${graft.functions.Bpe.oracleCountCte("documents", "b")}
         |SELECT d.doc_id, CAST(len(d.text) AS INT) AS n_chars,
         |  CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS pre_tokens,
         |  CAST(b.bpe_tokens AS INT) AS bpe_tokens
         |FROM documents d JOIN bcnt b USING (doc_id)""".stripMargin,
    "bpe_train" -> graft.functions.Bpe.oracleTrainSql("documents", 5),
    "bpe_vocab" ->
      s"""WITH ${graft.functions.Bpe.oracleTokensCte("documents", "b")},
         |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(t) AS tok FROM btok) GROUP BY 1)
         |SELECT tok, freq,
         |  CAST(row_number() OVER (ORDER BY freq DESC, tok) AS INT) AS rank
         |FROM v QUALIFY rank <= 200""".stripMargin,
    // BM25 twin of the tfidf oracle: identical CTE skeleton, the BM25
    // formula with dyadic k1/b and both risky intermediates quantized —
    // expression shapes copied operator-for-operator from the Spark side
    // delta replayed as lag() defaulting to the block base; hashes chain
    // per-block delta streams in block order — the same strings Spark builds
    // the full contingency table in exact integers; floor-e6 lift instead
    // of a log whose last ulp differs across libms
    "text_collocations" ->
      s"""WITH $toksCte,
         |bg AS (SELECT unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1])) AS bigram
         |  FROM toks WHERE len(t) >= 2),
         |b2 AS (SELECT bigram, string_split(bigram, ' ')[1] AS x,
         |  string_split(bigram, ' ')[2] AS y FROM bg),
         |cxy AS (SELECT bigram, x, y, CAST(count(*) AS BIGINT) AS c_xy
         |  FROM b2 GROUP BY 1, 2, 3),
         |cx AS (SELECT x, CAST(count(*) AS BIGINT) AS c_x FROM b2 GROUP BY 1),
         |cy AS (SELECT y, CAST(count(*) AS BIGINT) AS c_y FROM b2 GROUP BY 1),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bigrams FROM b2)
         |SELECT bigram, c_xy, c_x, c_y,
         |  (1000000 * n_bigrams * c_xy) // (c_x * c_y) AS lift_e6
         |FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN nb
         |WHERE c_xy >= $CollocMinSupport
         |ORDER BY lift_e6 DESC, bigram LIMIT $CollocTopK""".stripMargin,
    // identical bigram extraction (1-based list indexing both sides), the
    // same deterministic query pick, the same (count, doc_id) top-k cut
    "text_phrase_search" ->
      s"""WITH $toksCte,
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1])) AS bigram
         |  FROM toks WHERE len(t) >= 2),
         |q AS (SELECT bigram FROM bg GROUP BY 1
         |  ORDER BY count(*) DESC, bigram LIMIT 1)
         |SELECT (SELECT bigram FROM q) AS phrase, doc_id,
         |  CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM bg WHERE bigram = (SELECT bigram FROM q)
         |GROUP BY 2
         |ORDER BY n_occurrences DESC, doc_id LIMIT $PhraseTopK""".stripMargin,
    "text_inverted_index" ->
      s"""WITH $toksCte,
         |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
         |g AS (SELECT term, doc_id // $InvBlockDocs AS blk, doc_id, tf,
         |  doc_id - COALESCE(lag(doc_id) OVER (
         |      PARTITION BY term, doc_id // $InvBlockDocs ORDER BY doc_id),
         |    (doc_id // $InvBlockDocs) * $InvBlockDocs) AS delta
         | FROM tf),
         |b AS (SELECT term, blk, count(*) AS df_blk, sum(tf) AS cf_blk,
         |  ('0x' || substr(md5(string_agg(CAST(delta AS VARCHAR), ','
         |      ORDER BY doc_id)), 1, 15))::BIGINT AS phash
         | FROM g GROUP BY 1, 2)
         |SELECT term,
         | CAST(sum(df_blk) AS BIGINT) AS df,
         | CAST(sum(cf_blk) AS BIGINT) AS cf,
         | CAST(count(*) AS BIGINT) AS n_blocks,
         | ('0x' || substr(md5(string_agg(
         |     CAST(blk AS VARCHAR) || ':' || CAST(phash AS VARCHAR), ';'
         |     ORDER BY blk)), 1, 15))::BIGINT AS index_hash
         |FROM b GROUP BY 1""".stripMargin,
    "text_bm25_topk" ->
      s"""WITH $toksCte,
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf,
         |    round(round(ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0), 9)
         |      * (tf * 2.25)
         |      / (tf + round(1.25 * (1.0 - 0.75 + 0.75 * dl
         |                    / (CAST(tot_dl AS DOUBLE) / n_docs)), 9)), 6) + 0 AS score
         |  FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
         |  CROSS JOIN n CROSS JOIN tot)
         |SELECT doc_id, term, tf, score FROM (
         |  SELECT doc_id, term, tf, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |WHERE rn <= 5""".stripMargin,
    "text_tfidf_topk" ->
      // `+ 0` on the rounded score (signed-zero discipline: ln(1)=0 terms);
      // ranking happens on the SAME rounded value as Spark's
      s"""WITH $toksCte,
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tf.term, tf,
         |    round(tf * round(ln(CAST(n_docs AS DOUBLE) / df), 9), 6) + 0 AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, score FROM (
         |  SELECT doc_id, term, tf, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |WHERE rn <= 5""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        | CASE WHEN len(text) = 0 THEN 0
        |      ELSE list_reduce(
        |        list_transform(range(1, len(text) + 1),
        |          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |        (a, b) -> (a * 31 + b) % 1000000007)
        | END AS rh
        |FROM documents""".stripMargin,
    "text_simhash" ->
      s"""WITH $toksCte, $simhashCte
         |SELECT doc, simhash FROM sh64""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS survivor_id,
        | CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_paragraph" ->
      // row_number keep-first is the oracle's shape; the Spark side uses the
      // skew-immune min(struct) groupBy — same (doc_id, pos) total order
      s"""WITH $toksCte,
         |segs0 AS (SELECT doc_id, t,
         |   unnest(range(0, (len(t) + 2) // 3)) AS pos FROM toks),
         |segs AS (SELECT doc_id, CAST(pos AS INT) AS pos,
         |   array_to_string(t[(pos*3+1):(pos*3+3)], ' ') AS seg,
         |   CAST((len(t) + 2) // 3 AS INT) AS n_segs FROM segs0),
         |kept AS (SELECT * FROM (SELECT *, row_number() OVER (
         |     PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn FROM segs)
         |   WHERE rn = 1)
         |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(max(n_segs) - count(*) AS BIGINT) AS n_dropped
         |FROM kept GROUP BY doc_id""".stripMargin,
    "dedup_minhash_sig" ->
      s"""WITH $toksCte, $shinglesCte, $sigCte
         |SELECT doc, h, minhash FROM sig""".stripMargin,
    "dedup_minhash_pairs" -> confirmedPairsSql,
    // the cold re-pay twin computes the identical pair set from scratch
    "dedup_pairs_cold" -> confirmedPairsSql,
    // incremental must equal the full recompute, but its candidate step is
    // UNCAPPED banding on both legs — model exactly that (see pairsCtesUncapped)
    "dedup_incremental_pairs" -> incrementalPairsSql,
    // streaming twin: the sink must equal the same uncapped batch pairs
    "dedup_pairs_stream" -> incrementalPairsSql,
    // horizon-eviction mode sized so the whole corpus is within-horizon:
    // the eviction machinery runs live, the pair set must not move
    "dedup_pairs_stream_evict" -> incrementalPairsSql,
    // incremental fingerprint maintenance == full recompute: the UNCAPPED
    // adaptive-banding replay (cap 2e9: the cold branch covers every
    // bucket, the star never fires — banding is result-invisible uncapped,
    // which is exactly why the incremental path can re-band freely)
    "dedup_simhash_incremental" ->
      s"""WITH $toksCte, $simhashCte,
         |${graft.operators.Dedup.simhashBandSql("sh64", graft.operators.Dedup.SimhashBits, 2000000000)}""".stripMargin,
    // The three cluster-logic oracles below replay from the DUMPED pairs
    // artifact (placeholder substituted by Verify) rather than recomputing
    // the MinHash chain: the full-chain DuckDB replay spills >72 GB at 50k
    // docs, which is what kept the sf1 hash gate off this family. The pairs
    // themselves stay full-chain-verified by dedup_minhash_pairs; these
    // entries verify the CLUSTER logic over that proven edge set.
    "dedup_keep_list" ->
      s"""WITH
         |jp AS (SELECT doc_a, doc_b FROM '__GRAFT_ARTIFACTS__/pairs.parquet/*.parquet'),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |  UNION ALL SELECT doc_id, doc_id FROM documents),
         |l1 AS (SELECT src AS doc, min(dst) AS lbl FROM edges GROUP BY 1),
         |l2 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
         |  FROM edges e JOIN l1 l ON e.dst = l.doc GROUP BY 1),
         |l3 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
         |  FROM edges e JOIN l2 l ON e.dst = l.doc GROUP BY 1)
         |SELECT doc, lbl AS canonical FROM l3""".stripMargin,
    "dedup_quality_rep" ->
      // same 3-round label propagation as dedup_keep_list, then the argmax
      // (keep-the-longest, tie min doc) the Spark side does with min(struct)
      s"""WITH $toksCte,
         |jp AS (SELECT doc_a, doc_b FROM '__GRAFT_ARTIFACTS__/pairs.parquet/*.parquet'),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |  UNION ALL SELECT doc_id, doc_id FROM documents),
         |l1 AS (SELECT src AS doc, min(dst) AS lbl FROM edges GROUP BY 1),
         |l2 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
         |  FROM edges e JOIN l1 l ON e.dst = l.doc GROUP BY 1),
         |l3 AS (SELECT e.src AS doc, min(l.lbl) AS lbl
         |  FROM edges e JOIN l2 l ON e.dst = l.doc GROUP BY 1),
         |m AS (SELECT l3.doc, l3.lbl AS canonical, CAST(len(t) AS INT) AS n_tokens
         |  FROM l3 JOIN toks ON l3.doc = toks.doc_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY canonical ORDER BY n_tokens DESC, doc) AS rn,
         |  count(*) OVER (PARTITION BY canonical) AS n_members FROM m)
         |SELECT canonical, doc AS rep_id, n_tokens AS rep_tokens,
         | CAST(n_members AS BIGINT) AS n_members
         |FROM r WHERE rn = 1""".stripMargin,
    "dedup_cc_keep_list" ->
      // TRUE connected components as a recursive transitive closure — the
      // oracle for the fixpoint loop is exact at ANY cluster diameter
      // (unlike the 3-round chain above, which is the bounded twin's oracle)
      s"""WITH RECURSIVE
         |jp AS (SELECT doc_a, doc_b FROM '__GRAFT_ARTIFACTS__/pairs.parquet/*.parquet'),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |  UNION ALL SELECT doc_id, doc_id FROM documents),
         |reach AS (SELECT src AS doc, dst AS r FROM edges
         |  UNION
         |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src)
         |SELECT doc, min(r) AS canonical FROM reach GROUP BY 1""".stripMargin,
    "dedup_gdpr_cascade" ->
      // RECOMPUTE FROM SCRATCH on the surviving corpus — shingles,
      // signatures, UNCAPPED banding, exact Jaccard, recursive-CTE CC, and
      // the band-table row counts — the equality the cascade must achieve.
      // No artifact file is read: this oracle is the independent witness.
      s"""WITH RECURSIVE ${toksCte.replace("FROM documents",
             "FROM documents WHERE doc_id % 97 != 0")},
         |$shinglesCte, $sigCte, $pairsCtesUncapped,
         |jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |  UNION ALL SELECT doc_id, doc_id FROM documents
         |    WHERE doc_id % 97 != 0),
         |reach AS (SELECT src AS doc, dst AS r FROM edges
         |  UNION
         |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |cc AS (SELECT doc, min(r) AS canonical FROM reach GROUP BY 1),
         |bc AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_band_rows
         |  FROM banded GROUP BY 1)
         |SELECT cc.doc, cc.canonical, bc.n_band_rows
         |FROM cc JOIN bc USING (doc)""".stripMargin,
    "ml_split_leakfree" ->
      // CC from the dumped pairs artifact (like dedup_cc_keep_list), then
      // the split hash keyed on the cluster canonical — the same
      // 'split:'||key convention as ml_train_test_split
      s"""WITH RECURSIVE
         |jp AS (SELECT doc_a, doc_b FROM '__GRAFT_ARTIFACTS__/pairs.parquet/*.parquet'),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |  UNION ALL SELECT doc_id, doc_id FROM documents),
         |reach AS (SELECT src AS doc, dst AS r FROM edges
         |  UNION
         |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         |cc AS (SELECT doc, min(r) AS canonical FROM reach GROUP BY 1)
         |SELECT doc AS doc_id, canonical,
         |  CASE WHEN ('0x' || substr(md5('split:' || canonical), 1, 15))::BIGINT % 100 < 80
         |       THEN 'train' ELSE 'test' END AS split
         |FROM cc""".stripMargin,
    "dedup_span_inventory" ->
      s"""WITH $toksCte, ${spanCtes(SpanW)},
         |agg AS (SELECT sh AS span_hash, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occ, min(doc) AS first_doc
         | FROM spans GROUP BY 1 HAVING count(DISTINCT doc) >= 2),
         |fp AS (SELECT s.sh, min(s.pos) AS first_pos FROM spans s
         | JOIN agg a ON s.sh = a.span_hash AND s.doc = a.first_doc GROUP BY 1)
         |SELECT a.span_hash, a.n_docs, a.n_occ, a.first_doc, f.first_pos
         |FROM agg a JOIN fp f ON a.span_hash = f.sh""".stripMargin,
    "text_span_scrub" ->
      s"""WITH $toksCte, ${spanCtes(SpanW)},
         |agg AS (SELECT sh, min(doc) AS fdoc FROM spans GROUP BY 1 HAVING count(*) >= 2),
         |fp AS (SELECT s.sh, min(s.pos) AS fpos FROM spans s
         | JOIN agg a ON s.sh = a.sh AND s.doc = a.fdoc GROUP BY 1),
         |rem AS (SELECT s.doc, s.pos FROM spans s
         | JOIN agg a ON s.sh = a.sh JOIN fp f ON s.sh = f.sh
         | WHERE NOT (s.doc = a.fdoc AND s.pos = f.fpos)),
         |isl AS (SELECT doc, pos, CASE WHEN pos > coalesce(max(pos + $SpanW)
         |    OVER (PARTITION BY doc ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |  THEN 1 ELSE 0 END AS ni FROM rem),
         |isl2 AS (SELECT doc, pos, sum(ni) OVER (PARTITION BY doc ORDER BY pos) AS island
         | FROM isl),
         |iv AS (SELECT doc, island, min(pos) AS s, max(pos) + $SpanW - 1 AS e
         | FROM isl2 GROUP BY 1, 2),
         |rempos AS (SELECT doc, CAST(unnest(range(s, e + 1)) AS INT) AS pos FROM iv),
         |tokpos AS (SELECT doc_id AS doc, CAST(i - 1 AS INT) AS pos, t[i] AS tok
         | FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
         |kept AS (SELECT tp.doc, tp.pos, tp.tok FROM tokpos tp
         | ANTI JOIN rempos r ON tp.doc = r.doc AND tp.pos = r.pos),
         |keptagg AS (SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         |  count(*) AS n_kept FROM kept GROUP BY 1),
         |tot AS (SELECT doc_id AS doc, len(t) AS n_toks FROM toks)
         |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  CAST(t.n_toks - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
         |FROM documents d JOIN tot t ON d.doc_id = t.doc
         |LEFT JOIN keptagg k ON d.doc_id = k.doc""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""WITH $toksCte, $shinglesCte,
         |freq AS (SELECT sh, count(*) AS df FROM dsh GROUP BY 1),
         |ds AS (SELECT doc, d.sh FROM dsh d JOIN freq USING (sh) WHERE df <= 5),
         |szs AS (SELECT doc, count(*) AS n FROM ds GROUP BY 1),
         |itr AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS c
         |  FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2),
         |jacs AS (SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
         |  FROM itr JOIN szs sa ON doc_a = sa.doc JOIN szs sb ON doc_b = sb.doc)
         |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
         |FROM jacs WHERE jaccard >= 0.5""".stripMargin,
    // the same capped inverted index; one undirected intersection row
    // scores BOTH orientations; exact-ppm integer containment
    "dedup_containment" ->
      s"""WITH $toksCte, $shinglesCte,
         |freq AS (SELECT sh, count(*) AS df FROM dsh GROUP BY 1),
         |ds AS (SELECT doc, d.sh FROM dsh d JOIN freq USING (sh) WHERE df <= 5),
         |szs AS (SELECT doc, count(*) AS n FROM ds GROUP BY 1),
         |itr AS (SELECT a.doc AS u, b.doc AS v, count(*) AS c
         |  FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc < b.doc GROUP BY 1, 2),
         |sized AS (SELECT u, v, c, su.n AS nu, sv.n AS nv FROM itr
         |  JOIN szs su ON u = su.doc JOIN szs sv ON v = sv.doc),
         |directed AS (
         |  SELECT u AS doc_a, v AS doc_b, c AS inter, nu AS na FROM sized
         |  UNION ALL SELECT v, u, c, nv FROM sized)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(na AS BIGINT) AS na,
         |  CAST((1000000 * inter) // na AS BIGINT) AS cont_ppm
         |FROM directed
         |WHERE (1000000 * inter) // na >= ${ContainPpm}""".stripMargin,
    "dedup_simhash_pairs" ->
      // models the maxChunkDf=64 hot-bucket star fallback (this corpus HAS
      // chunk buckets over the cap — templated docs share low chunks), so
      // the skew guard binds in the catalog and stays oracle-checked; the
      // banding tail (corpus-adaptive block count + cold/hot star) is the
      // shared generator — ONE SQL twin for all four fingerprint families
      s"""WITH $toksCte, $simhashCte,
         |${graft.operators.Dedup.simhashBandSql("sh64", graft.operators.Dedup.SimhashBits, 64)}""".stripMargin,
  )
}
