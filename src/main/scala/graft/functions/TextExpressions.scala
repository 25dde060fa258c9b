package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass codegen text kernels for the dedup/text-analysis surface.
  *
  * The declarative form — `filter(split(lower(text), "[^a-z]+"), ...)` and
  * the n-gram `transform(sequence(...), i -> concat_ws(element_at ...))`
  * chain — is correct but evaluates interpreted, and worse: Catalyst
  * infers `size(toks) > 0` filters from downstream `explode`s and pushes
  * them below the projection, re-inlining the whole chain into a
  * per-row filter where the `split` re-evaluates per `element_at`
  * (measured 13s for 5k docs at sf0.1 on the uncached path). These
  * expressions are one linear scan per document, no regex, no per-element
  * allocation beyond the output — and being single expressions they stay
  * cheap even when an optimizer rule duplicates them into a filter.
  *
  * Semantics are EXACTLY the declarative chain's (the DuckDB oracle
  * depends on it):
  *   tokens   = maximal runs of [a-z] after full lowercasing
  *   shingles = distinct joins of n consecutive tokens with ' ';
  *              fewer than n tokens → the whole token stream joined
  *              (dropped if empty)
  */
object TextKernels {
  /** Lowercased alpha-run tokenization — equals
    * `filter(split(lower(text), "[^a-z]+"), t => t =!= "")`. */
  def tokenize(text: UTF8String): Array[String] = {
    // UTF8String.toLowerCase IS Spark's lower(): a locale-independent
    // ASCII fast path, default-locale String.toLowerCase only for
    // non-ASCII input. Delegating to it makes kernel == declarative form
    // by construction on every platform (a hand-rolled toLowerCase with
    // either Locale.ROOT or the default locale diverges on tr_TR JVMs —
    // for non-ASCII or ASCII input respectively).
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      var j = i
      while (j < n && s.charAt(j) >= 'a' && s.charAt(j) <= 'z') j += 1
      if (j > i) out += s.substring(i, j)
      i = if (j > i) j else i + 1
    }
    out.toArray
  }

  /** One-pass rolling-hash cut positions (see [[graft.functions.CdcCuts]]).
    * Iterates CODE POINTS so positions match Spark's character-indexed
    * `length`/`substr` on any input; exact long arithmetic throughout. */
  def cdcCutsArray(text: UTF8String, w: Int, p: Long, m: Long): ArrayData = {
    val s = text.toString
    val nChars = s.codePointCount(0, s.length)
    if (nChars < w) return new GenericArrayData(Array.empty[Any])
    var pw1 = 1L // p^(w-1)
    var k = 1
    while (k < w) { pw1 *= p; k += 1 }
    val win = new Array[Long](w) // circular buffer of code points
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L // hash of the last ≤w chars, newest at p^0
    var ci = 0 // 0-based count of processed characters
    var si = 0 // string (UTF-16) offset
    while (si < s.length) {
      val cp = s.codePointAt(si)
      // drop the outgoing char c[ci-w] (still stored at ci % w), then
      // shift the surviving terms one power up and add the newest
      if (ci >= w) h -= win(ci % w) * pw1
      h = h * p + cp.toLong
      win(ci % w) = cp.toLong
      ci += 1
      if (ci >= w && h % m == 0L) out += Integer.valueOf(ci)
      si += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray)
  }

  def tokensArray(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    val arr = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** Canonical stopword lists for the language-ID heuristic (the single
    * source of truth — `ops.TextOps.stopwords` aliases this map, and the
    * DuckDB oracle SQL embeds the same lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "pas", "pour", "que", "une"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "en", "por", "con", "una"))

  /** Language order of the hit-count fields in [[textStats]]. */
  val statLangs: Seq[String] = Seq("en", "de", "fr", "es")

  // word → bitmask over statLangs (a word can sit in several lists,
  // e.g. "la" is both French and Spanish)
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for ((lang, i) <- statLangs.zipWithIndex; w <- stopwords(lang)) {
      val prev = m.get(w)
      m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
    }
    m
  }

  /** One scan over the token stream: token count, the BPE-ish alpha
    * subword estimate Σ ceil(len/4), and occurrence counts against each
    * language's stopword list. Each value equals its declarative form
    * (`size(tokens)`, the `aggregate` fold, `stopwordHits`) — asserted in
    * TextKernelSpec; the declarative chain re-tokenizes per derived
    * column and its HOF lambdas evaluate interpreted (CodegenFallback),
    * measured 4.6 s → sub-second for 5k docs at sf0.1. */
  def textStats(text: UTF8String): InternalRow = {
    val toks = tokenize(text)
    var subw = 0L
    var hitsEn = 0; var hitsDe = 0; var hitsFr = 0; var hitsEs = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      subw += (t.length + 3) / 4 // = ceil(len/4) for len >= 0
      val m = wordMask.get(t)
      if (m != null) {
        val mask = m.intValue()
        if ((mask & 1) != 0) hitsEn += 1
        if ((mask & 2) != 0) hitsDe += 1
        if ((mask & 4) != 0) hitsFr += 1
        if ((mask & 8) != 0) hitsEs += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length, subw, hitsEn, hitsDe, hitsFr, hitsEs))
  }

  /** Distinct word n-gram shingle set; first-occurrence order (same set
    * as `array_distinct` over the declarative n-gram transform). */
  /** Positional q-grams with occurrence numbers — see
    * [[PositionalQGrams]] for the contract it replicates. */
  def posQGramsArray(text: UTF8String, q: Int): ArrayData = {
    val len = text.numChars()
    if (len < q) return new GenericArrayData(Array.empty[Any])
    val n = len - q + 1
    val out = new Array[AnyRef](n)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var p = 0
    while (p < n) {
      val gram = text.substring(p, p + q)
      val prev = counts.get(gram)
      val occ = if (prev == null) 1 else prev.intValue + 1
      counts.put(gram, Integer.valueOf(occ))
      out(p) = new GenericInternalRow(Array[Any](gram, occ))
      p += 1
    }
    new GenericArrayData(out)
  }

  def shinglesArray(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var o = 0
        while (o < n) {
          if (o > 0) sb.append(' ')
          sb.append(toks(i + o))
          o += 1
        }
        seen.add(sb.toString): Unit
        i += 1
      }
    } else if (toks.nonEmpty) {
      seen.add(toks.mkString(" ")): Unit
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  /** 64-bit word n-gram hashes with NO gram-string materialization, one
    * hash per position (occurrence order preserved, duplicates kept):
    * FNV-1a over each token's chars once, then a golden-ratio polynomial
    * fold across every n-window, finished with the murmur3 fmix64
    * avalanche. Replaces the `xxhash64(concat_ws(' ', slice(toks,...)))`
    * chain, which allocates a sliced array plus a joined string per
    * gram — this kernel touches each token's characters exactly once
    * per document. Same accepted ~2⁻⁶⁴ collision trade (the oracles
    * compare gram-derived COUNTS, never hash values; the streaming
    * ledgers persist these hashes, so all call sites switch together
    * by construction — this kernel is the single definition). */
  def gramHashArray(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      var h = 1469598103934665603L // FNV-1a offset basis
      val t = toks(i)
      var j = 0
      while (j < t.length) { h = (h ^ t.charAt(j).toLong) * 1099511628211L; j += 1 }
      th(i) = h
      i += 1
    }
    val out = new Array[Any](toks.length - n + 1)
    var p = 0
    while (p + n <= toks.length) {
      var h = 0L
      var j = p
      while (j < p + n) { h = h * -7046029254386353131L + th(j); j += 1 } // 0x9E3779B97F4A7C15
      h ^= (h >>> 33); h *= -49064778989728563L                          // 0xFF51AFD7ED558CCD
      h ^= (h >>> 33); h *= -4265267296055464877L                        // 0xC4CEB9FE1A85EC53
      h ^= (h >>> 33)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_gram_hashes(text, n)` — codegen word-n-gram hashing (see
  * [[TextKernels.gramHashArray]]). */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(t: Any): Any =
    TextKernels.gramHashArray(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.gramHashArray($t, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_tokens(text)` — codegen tokenizer (see [[TextKernels]]). */
/** Unicode normalization kernels — the canonicalization every multilingual
  * pipeline runs BEFORE fingerprinting/dedup: the composed ("é") and
  * decomposed ("e"+U+0301) encodings of the same text are different byte
  * strings (different md5, different exact-dedup keys) until normalized.
  * ASCII input short-circuits without allocating: at 100 TB the common
  * case is a pure byte scan. */
object UnicodeKernels {
  def nfc(text: UTF8String): UTF8String = {
    // ASCII fast path: NFC is identity on ASCII; numBytes == numChars
    // iff every byte is single-byte (ASCII)
    if (text.numBytes == text.numChars) text
    else UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC))
  }

  /** NFD + strip combining marks — DuckDB's `strip_accents` semantics. */
  def stripAccents(text: UTF8String): UTF8String = {
    if (text.numBytes == text.numChars) text
    else UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", ""))
  }
}

/** `graft_nfc(text)` — Unicode NFC canonicalization (codegen; ASCII
  * short-circuits to the input buffer). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(t: Any): Any =
    UnicodeKernels.nfc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.UnicodeKernels.nfc($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_strip_accents(text)` — NFD + combining-mark removal. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"
  override def nullSafeEval(t: Any): Any =
    UnicodeKernels.stripAccents(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.UnicodeKernels.stripAccents($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TokenizeWords(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(t: Any): Any =
    TextKernels.tokensArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.tokensArray($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_text_stats(text)` — single-pass token/subword/stopword counters
  * (see [[TextKernels.textStats]]). */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords_alpha", LongType, nullable = false),
    StructField("hits_en", IntegerType, nullable = false),
    StructField("hits_de", IntegerType, nullable = false),
    StructField("hits_fr", IntegerType, nullable = false),
    StructField("hits_es", IntegerType, nullable = false)))
  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(t: Any): Any =
    TextKernels.textStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.textStats($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_shingles(text, n)` — codegen word n-gram shingle set
  * (see [[TextKernels]]); n is a compile-time constant. */
/** `graft_cdc_cuts(text)` — content-defined chunk boundaries via a
  * Rabin-Karp rolling hash in ONE linear pass (the codegen upgrade of
  * `TextOps.cdcCutsHof`, whose nested interpreted HOFs cost O(len·w)
  * per row with per-position allocation — measured 26.8 s vs sub-second
  * for 5k docs at sf0.1). Semantics are EXACTLY the HOF form's
  * (TextKernelSpec cross-checks): position i (1-based character index,
  * i ≥ w) is a cut when `(Σ_{k=0..w-1} cp(text[i-k])·p^k) % m == 0`,
  * with cp = the character's code point (equals Spark's `ascii` on the
  * ASCII corpus the oracle runs on). The rolling update
  * `H' = (H − cp_out·p^{w−1})·p + cp_in` stays far below 2⁶³ for the
  * shipped p/w, so it reproduces the HOF's integer sum bit-for-bit. */
case class CdcCuts(child: Expression, w: Int, p: Long, m: Long)
    extends UnaryExpression {
  require(w >= 2 && p > 1 && m > 1, "degenerate rolling-hash parameters")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_cuts expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(t: Any): Any =
    TextKernels.cdcCutsArray(t.asInstanceOf[UTF8String], w, p, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.cdcCutsArray($t, $w, ${p}L, ${m}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_pos_qgrams(key, q)` — positional q-grams with per-gram
  * occurrence numbers, ONE pass per key (r21). Replaces the Ed-Join
  * prefix chain's `explode(sequence) + substring + row_number() OVER
  * (PARTITION BY id, gram ORDER BY p)` derivation, whose window
  * SHUFFLES the full positional-gram stream (≈ len−q+1 rows per key,
  * a corpus-scale exchange at 100 TB) just to number occurrences that
  * are a per-row function of the key string. Semantics are EXACTLY the
  * declarative chain's: gram(p) = substring(key, p+1, q) for p in
  * 0..len−q (code-point positions, as Spark's `substring`), occ =
  * 1-based occurrence index of that gram in ascending-p order; keys
  * shorter than q yield an empty array (callers pre-filter anyway). */
case class PositionalQGrams(child: Expression, q: Int) extends UnaryExpression {
  require(q >= 1, "q-gram width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pos_qgrams expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("occ", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pos_qgrams"

  override def nullSafeEval(t: Any): Any =
    TextKernels.posQGramsArray(t.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.posQGramsArray($t, $q)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any): Any =
    TextKernels.shinglesArray(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.shinglesArray($t, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
