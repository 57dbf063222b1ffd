package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy byte-pair-encoding tokenizer over a LITERAL merges
  * table — the real-token-count basis for packing budgets and chunk windows
  * (replacing the round-1..5 pre-tokenizer regex PROXY count, which over- or
  * under-counted every word the vocabulary would have merged or split).
  *
  * Semantics (chosen to be exactly mirrorable in SQL):
  *  1. pre-tokenize like the GPT-2-style pattern `[A-Za-z]+|[0-9]+|`
  *     `[^A-Za-z0-9 ]` (letter runs, digit runs, single other codepoints;
  *     spaces separate, control chars \x01-\x03 are stripped first);
  *  2. each word starts as one symbol per codepoint;
  *  3. each merge rule is applied IN TABLE ORDER, one full left-to-right
  *     non-overlapping pass per rule (the original Sennrich-BPE encode
  *     order, not the GPT-2 rank-priority loop) — merges never cross word
  *     boundaries;
  *  4. the doc's token stream is the concatenation of its words' final
  *     symbol sequences.
  *
  * The DuckDB oracle replays step 3 LITERALLY: the doc is encoded as
  * `\x01sym\x02` wrapped symbols joined by `\x03` word boundaries, and each
  * merge becomes one string `replace('\x01a\x02\x01b\x02' → '\x01ab\x02')`.
  * Because every match consumes two complete wrapped symbols and the
  * replacement is one complete wrapped symbol that can never equal either
  * input symbol, matches share no characters and a rule can never cascade
  * within its own pass — so Java-side array merging, Java `String.replace`,
  * and DuckDB `replace` all provably produce the identical result
  * regardless of rescan behavior ([[BpeSpec]] pins the first equivalence,
  * the CORRECTNESS gate the second).
  *
  * Scale notes: pure per-row kernel (no shuffle, runs inside whole-stage
  * codegen via [[BpeCount]]/[[BpeTokenize]]); a bounded per-thread word
  * memo exploits Zipf repetition, so the 200-rule loop runs once per
  * DISTINCT word per task, not once per occurrence.
  */
object Bpe {

  /** The literal merges table (~200 rules, English-frequency ordered:
    * char-pair tier first, then multi-char extensions whose sides are
    * formed by earlier rules). A rule whose sides never co-occur as
    * adjacent symbols is a harmless no-op, so table order affects
    * segmentation quality only, never determinism. */
  val Merges: Vector[(String, String)] = Vector(
    // tier 1 — frequent English char bigrams
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"), ("n", "e"), ("e", "a"),
    ("r", "a"), ("c", "e"), ("l", "i"), ("c", "h"), ("l", "l"),
    ("b", "e"), ("m", "a"), ("s", "i"), ("o", "m"), ("u", "r"),
    ("c", "a"), ("e", "l"), ("t", "a"), ("l", "a"), ("n", "s"),
    ("d", "i"), ("f", "o"), ("h", "o"), ("p", "e"), ("e", "c"),
    ("p", "r"), ("n", "o"), ("c", "t"), ("u", "s"), ("a", "c"),
    ("o", "t"), ("i", "l"), ("t", "r"), ("l", "y"), ("n", "c"),
    ("u", "l"), ("u", "t"), ("s", "s"), ("s", "o"), ("r", "s"),
    ("u", "n"), ("l", "o"), ("w", "a"), ("g", "e"), ("i", "e"),
    ("w", "h"), ("e", "e"), ("w", "i"), ("e", "m"), ("a", "d"),
    ("o", "l"), ("o", "s"), ("p", "o"), ("m", "i"), ("u", "p"),
    ("b", "l"), ("f", "i"), ("v", "i"), ("g", "h"), ("q", "u"),
    ("p", "a"), ("f", "e"), ("w", "o"), ("e", "x"), ("k", "e"),
    ("g", "r"), ("b", "u"), ("b", "o"), ("s", "h"), ("o", "p"),
    ("l", "d"), ("i", "r"), ("i", "d"), ("a", "y"), ("e", "y"),
    ("e", "w"), ("w", "e"), ("m", "o"), ("o", "v"), ("s", "a"),
    ("e", "v"), ("t", "y"), ("u", "m"), ("a", "g"), ("s", "p"),
    ("d", "u"), ("a", "m"), ("o", "w"), ("a", "p"), ("c", "l"),
    ("f", "a"), ("g", "o"), ("k", "i"), ("n", "a"), ("p", "l"),
    // digit pairs (years, round numbers)
    ("1", "9"), ("2", "0"), ("0", "0"),
    // tier 2 — extensions over symbols formed above
    ("th", "e"), ("in", "g"), ("io", "n"), ("ti", "on"), ("an", "d"),
    ("en", "t"), ("fo", "r"), ("er", "e"), ("at", "e"), ("er", "s"),
    ("es", "t"), ("at", "i"), ("al", "l"), ("in", "t"), ("te", "r"),
    ("ve", "r"), ("it", "h"), ("st", "a"), ("re", "s"), ("on", "s"),
    ("ou", "r"), ("he", "r"), ("te", "d"), ("ea", "r"), ("ma", "n"),
    ("th", "a"), ("wa", "s"), ("ar", "e"), ("no", "t"), ("y", "ou"),
    ("b", "ut"), ("c", "on"), ("c", "om"), ("p", "ro"), ("p", "er"),
    ("d", "is"), ("p", "re"), ("st", "r"), ("me", "nt"), ("b", "le"),
    ("a", "ble"), ("gh", "t"), ("i", "ght"), ("ou", "gh"), ("ou", "ld"),
    ("w", "ould"), ("es", "s"), ("n", "ess"), ("l", "ess"), ("ati", "on"),
    ("i", "tion"), ("wi", "th"), ("th", "is"), ("th", "at"), ("ro", "m"),
    ("f", "rom"), ("ha", "ve"), ("hi", "s"), ("s", "he"), ("ic", "h"),
    ("wh", "ich"), ("wh", "at"), ("wh", "en"), ("wh", "ere"), ("th", "ere"),
    ("e", "ir"), ("th", "eir"), ("th", "ey"), ("il", "l"), ("w", "ill"),
    ("be", "en"), ("we", "re"), ("we", "ll"), ("or", "e"), ("m", "ore"),
    ("so", "me"), ("ti", "me"), ("ot", "her"), ("ou", "t"), ("b", "out"),
    ("a", "bout"), ("in", "to"), ("ov", "er"), ("on", "ly"), ("al", "so"),
    ("f", "ter"), ("a", "fter"), ("ir", "st"), ("f", "irst"), ("t", "wo"),
    ("n", "ew"), ("sa", "id"), ("ca", "n"), ("ha", "d"), ("ha", "s"),
    ("hi", "m"), ("it", "s"), ("th", "an"), ("th", "em"), ("th", "en"),
    ("es", "e"), ("th", "ese"), ("wh", "o"), ("ho", "w"), ("no", "w"),
    ("ma", "y"), ("an", "y"), ("d", "ay"), ("w", "ay"), ("y", "ear"),
    ("mo", "st"), ("ma", "ke"), ("li", "ke"), ("us", "e"), ("us", "ed"),
    ("or", "k"), ("w", "ork"), ("20", "0"), ("19", "9"),
  )

  private val ruleA: Array[String] = Merges.map(_._1).toArray
  private val ruleB: Array[String] = Merges.map(_._2).toArray
  private val ruleAB: Array[String] = Merges.map(p => p._1 + p._2).toArray

  // Bounded per-thread word memo: BPE is a pure function of the word, and
  // corpora are Zipf-distributed, so the hit rate is high. Cleared wholesale
  // on overflow — correctness never depends on it.
  private val wordCache = ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](
    () => new java.util.HashMap[String, Array[String]]())
  private val MaxCacheWords = 1 << 16

  private def isWordLetter(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isWordDigit(c: Char) = c >= '0' && c <= '9'

  /** Greedy merge of one pre-token. Returns the final symbol array. */
  def encodeWord(word: String): Array[String] = {
    val cache = wordCache.get()
    val hit = cache.get(word)
    if (hit != null) return hit
    // one symbol per codepoint
    var n = 0
    val syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    while (i < word.length) {
      val w = Character.charCount(word.codePointAt(i))
      syms(n) = word.substring(i, i + w)
      n += 1; i += w
    }
    var arr = syms
    var r = 0
    while (r < ruleA.length && arr.length > 1) {
      // substring precheck: adjacent symbols are contiguous in the original
      // word, so rule (a,b) can only apply if "ab" occurs in the word
      if (word.contains(ruleAB(r))) {
        val a = ruleA(r); val b = ruleB(r); val ab = ruleAB(r)
        var changed = false
        var read = 0; var write = 0
        val out = new Array[String](arr.length)
        while (read < arr.length) {
          if (read < arr.length - 1 && arr(read) == a && arr(read + 1) == b) {
            out(write) = ab; read += 2; changed = true
          } else { out(write) = arr(read); read += 1 }
          write += 1
        }
        if (changed) arr = java.util.Arrays.copyOf(out, write)
      }
      r += 1
    }
    if (cache.size >= MaxCacheWords) cache.clear()
    cache.put(word, arr)
    arr
  }

  /** Pre-tokens of a document: letter runs, digit runs, single other
    * codepoints; spaces separate. \x01-\x03 are STRIPPED FIRST (they are
    * the oracle's symbol markers): stripping — not treating them as
    * separators — matters, because the oracle's `regexp_replace(text,
    * '[\x01-\x03]', '')` JOINS the surrounding runs into one word
    * (BpeSpec's adversarial control-chars case pins this). */
  def preTokens(text0: String): java.util.ArrayList[String] = {
    val text =
      if (text0.indexOf('\u0001') < 0 && text0.indexOf('\u0002') < 0 &&
          text0.indexOf('\u0003') < 0) text0
      else text0.filter(c => c != '\u0001' && c != '\u0002' && c != '\u0003')
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == ' ') i += 1
      else if (isWordLetter(c)) {
        val start = i
        while (i < text.length && isWordLetter(text.charAt(i))) i += 1
        out.add(text.substring(start, i))
      } else if (isWordDigit(c)) {
        val start = i
        while (i < text.length && isWordDigit(text.charAt(i))) i += 1
        out.add(text.substring(start, i))
      } else {
        val w = Character.charCount(text.codePointAt(i))
        out.add(text.substring(i, i + w))
        i += w
      }
    }
    out
  }

  /** Token COUNT of a document (no token materialization). null ⇒ 0. */
  def countDoc(s: UTF8String): Int = {
    if (s == null) return 0
    val words = preTokens(s.toString)
    var total = 0
    var i = 0
    while (i < words.size) { total += encodeWord(words.get(i)).length; i += 1 }
    total
  }

  /** Pre-token stream of a document (the trainer's word source). null ⇒ []. */
  def preTokenizeDoc(s: UTF8String): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val words = preTokens(s.toString)
    val out = new Array[Any](words.size)
    var i = 0
    while (i < words.size) { out(i) = UTF8String.fromString(words.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Encode one word under an ARBITRARY merges list (the trainer's path —
    * merges grow per round, so the static-table word memo can't be used).
    * Identical pass semantics to [[encodeWord]]. */
  def encodeWordWith(word: String, merges: Seq[(String, String)]): Array[String] = {
    var n = 0
    val syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    while (i < word.length) {
      val w = Character.charCount(word.codePointAt(i))
      syms(n) = word.substring(i, i + w)
      n += 1; i += w
    }
    var arr = syms
    for ((a, b) <- merges if arr.length > 1) {
      if (word.contains(a + b)) {
        var changed = false
        var read = 0; var write = 0
        val out = new Array[String](arr.length)
        while (read < arr.length) {
          if (read < arr.length - 1 && arr(read) == a && arr(read + 1) == b) {
            out(write) = a + b; read += 2; changed = true
          } else { out(write) = arr(read); read += 1 }
          write += 1
        }
        if (changed) arr = java.util.Arrays.copyOf(out, write)
      }
    }
    arr
  }

  /** Full BPE token stream of a document (for chunking). null ⇒ []. */
  def tokenizeDoc(s: UTF8String): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val words = preTokens(s.toString)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < words.size) {
      val syms = encodeWord(words.get(i))
      var j = 0
      while (j < syms.length) { out.add(UTF8String.fromString(syms(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ---- oracle SQL generation (the mirroring point: built from the SAME
  // literal Merges table the kernel runs) --------------------------------

  private val S1 = "\u0001"; private val S2 = "\u0002"; private val S3 = "\u0003"

  /** One replace-chain segment over an encoded-symbol-string expression.
    * DuckDB's expression binder recurses per nesting level (limit 128), so
    * the full table is split across several CTE stages of ≤ 96 merges. */
  private def chainSqlPart(expr: String, part: Seq[(String, String)]): String =
    part.foldLeft(expr) { case (e, (a, b)) =>
      s"replace($e, '$S1$a$S2$S1$b$S2', '$S1$a$b$S2')"
    }

  /** CTE pipeline `<tag>enc` → final encoded string, one row per `doc_id` of
    * `src` (which must expose doc_id + text). Steps: strip \x01-\x03,
    * pre-tokenize, join words with \x03, wrap every codepoint as
    * \x01c\x02 (unwrapping the \x03 separators), then the merge chain
    * staged as one CTE per ≤ 96 rules (binder depth). */
  def oracleEncCte(src: String, tag: String): String = {
    val groups = Merges.grouped(96).toList
    val stages = groups.zipWithIndex.map { case (g, i) =>
      val in = if (i == 0) s"replace(w, '$S1$S3$S2', '$S3')" else "w"
      val from = if (i == 0) s"${tag}raw" else s"${tag}e${i - 1}"
      val name = if (i == groups.length - 1) s"${tag}enc" else s"${tag}e$i"
      s"$name AS (SELECT doc_id, ${chainSqlPart(in, g)} AS w FROM $from)"
    }
    (s"""${tag}raw AS (SELECT doc_id,
       |  regexp_replace(array_to_string(regexp_extract_all(
       |    regexp_replace(coalesce(text, ''), '[\\x01-\\x03]', '', 'g'),
       |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'), '$S3'),
       |    '([\\s\\S])', '$S1\\1$S2', 'g') AS w
       | FROM $src)""".stripMargin +: stages).mkString(",\n")
  }

  /** CTE `<tag>cnt(doc_id, bpe_tokens)` — token count per doc. */
  def oracleCountCte(src: String, tag: String): String =
    s"""${oracleEncCte(src, tag)},
       |${tag}cnt AS (SELECT doc_id,
       |  CAST(len(w) - len(replace(w, '$S1', '')) AS BIGINT) AS bpe_tokens
       | FROM ${tag}enc)""".stripMargin

  /** CTE `<tag>tok(doc_id, t)` — full token LIST per doc (chunking). */
  def oracleTokensCte(src: String, tag: String): String =
    s"""${oracleEncCte(src, tag)},
       |${tag}body AS (SELECT doc_id, replace(w, '$S3', '') AS w FROM ${tag}enc),
       |${tag}tok AS (SELECT doc_id,
       |  CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
       |       ELSE string_split(substr(w, 2, len(w) - 2), '$S2$S1') END AS t
       | FROM ${tag}body)""".stripMargin

  /** Oracle replay of [[graft.operators.BpeTrainer.train]]: `rounds` CTE
    * stages, each counting adjacent wrapped-symbol pairs (weighted by word
    * frequency, overlapping occurrences included), taking the argmax with
    * the identical (freq DESC, l, r) tie-break, and applying the winner via
    * scalar-subquery `replace` before the next stage. */
  def oracleTrainSql(src: String, rounds: Int): String = {
    val head =
      s"""wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
         |  SELECT unnest(regexp_extract_all(
         |    regexp_replace(coalesce(text, ''), '[\\x01-\\x03]', '', 'g'),
         |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS w FROM $src) GROUP BY 1),
         |e0 AS (SELECT w, cnt,
         |  regexp_replace(w, '([\\s\\S])', '$S1\\1$S2', 'g') AS s FROM wc)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"e${r - 1}"
      s"""t$r AS (SELECT cnt, string_split(substr(s, 2, len(s) - 2), '$S2$S1') AS t
         |  FROM $prev WHERE len(s) > 0),
         |p$r AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i + 1 AS INT)] AS r,
         |    CAST(sum(cnt) AS BIGINT) AS freq
         |  FROM (SELECT cnt, t, unnest(range(1, len(t))) AS i FROM t$r
         |        WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |r$r AS (SELECT l, r, freq FROM p$r ORDER BY freq DESC, l, r LIMIT 1),
         |e$r AS (SELECT w, cnt, replace(s,
         |    '$S1' || (SELECT l FROM r$r) || '$S2$S1' || (SELECT r FROM r$r) || '$S2',
         |    '$S1' || (SELECT l FROM r$r) || (SELECT r FROM r$r) || '$S2') AS s
         |  FROM $prev)""".stripMargin
    }
    val finals = (1 to rounds)
      .map(r => s"SELECT $r AS round, l AS merge_l, r AS merge_r, freq FROM r$r")
      .mkString("\nUNION ALL ")
    s"WITH $head,\n${roundCtes.mkString(",\n")}\n$finals"
  }

  // ---- reference replay (spec-only): the wrapped-string replace chain the
  // oracle runs, executed with Java String.replace — pins kernel ≡ chain.
  private[graft] def replayTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val stripped = text.filter(c => c != '\u0001' && c != '\u0002' && c != '\u0003')
    val words = preTokens(stripped)
    val sb = new StringBuilder
    var i = 0
    while (i < words.size) {
      if (i > 0) sb.append(S3)
      words.get(i).codePoints().forEach { cp =>
        sb.append(S1).append(new String(Character.toChars(cp))).append(S2)
      }
      i += 1
    }
    var s = sb.toString
    for ((a, b) <- Merges) s = s.replace(s"$S1$a$S2$S1$b$S2", s"$S1$a$b$S2")
    val body = s.replace(S3, "")
    if (body.isEmpty) Array.empty
    else body.substring(1, body.length - 1).split(s"$S2$S1", -1)
  }
}

/** Real-BPE token count (int, never null; null text ⇒ 0). */
case class BpeCount(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = IntegerType
  override protected def helper: String = "graft.functions.Bpe.countDoc"
  override protected def evalKernel(s: UTF8String): Any = Bpe.countDoc(s)
  override protected def withNewChildInternal(c: Expression): BpeCount = copy(c)
  override def prettyName: String = "bpe_count"
}

/** Real-BPE token stream (array<string>, never null; null text ⇒ []). */
case class BpeTokenize(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def helper: String = "graft.functions.Bpe.tokenizeDoc"
  override protected def evalKernel(s: UTF8String): Any = Bpe.tokenizeDoc(s)
  override protected def withNewChildInternal(c: Expression): BpeTokenize = copy(c)
  override def prettyName: String = "bpe_tokenize"
}

/** Pre-token stream (pre-merge words; the trainer's input). */
case class BpePreTokenize(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def helper: String = "graft.functions.Bpe.preTokenizeDoc"
  override protected def evalKernel(s: UTF8String): Any = Bpe.preTokenizeDoc(s)
  override protected def withNewChildInternal(c: Expression): BpePreTokenize = copy(c)
  override def prettyName: String = "bpe_pre_tokenize"
}

object BpeKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bpeCount(text: Column): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text)))
  def bpeTokens(text: Column): Column =
    ColumnBridge.column(BpeTokenize(ColumnBridge.expression(text)))
  def preTokens(text: Column): Column =
    ColumnBridge.column(BpePreTokenize(ColumnBridge.expression(text)))
}
