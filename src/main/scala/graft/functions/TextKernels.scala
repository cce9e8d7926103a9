package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels invoked from generated code (one virtual call per row; the
  * loops inside are JIT-compiled Scala, not interpreted Catalyst).
  */
object TextKernels extends Serializable {

  private val Mask32 = 0xFFFFFFFFL
  private val Seed = 42L // Spark's xxhash64 default seed — value parity

  private def xx32(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed) & Mask32
  }

  /** Distinct 32-bit hashes of the word 3-shingles, first-occurrence
    * order; docs shorter than 3 tokens contribute one whole-text shingle.
    * Value-identical to the declarative form
    * `array_distinct(transform(3-grams, xxhash64 & 0xFFFFFFFF))`.
    */
  def shingleHashes(text: UTF8String): ArrayData = {
    // space-only trim + limit=-1 split: exactly Spark's
    // split(trim(text), "\\s+") — see wordNgrams for why Java's trim
    // (which also strips \t/\n) would diverge from the declarative form
    val raw = text.toString
    var tb = 0
    var te = raw.length
    while (tb < te && raw.charAt(tb) == ' ') tb += 1
    while (te > tb && raw.charAt(te - 1) == ' ') te -= 1
    val trimmed = raw.substring(tb, te)
    val toks = trimmed.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    if (toks.length >= 3) {
      var i = 0
      while (i + 2 < toks.length) {
        seen.add(xx32(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
        i += 1
      }
    } else {
      seen.add(xx32(trimmed))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Per-language stopword lists for the language-ID heuristic (top
    * function words; public-domain common knowledge). Order fixes the
    * output struct field order: en, de, fr, es.
    */
  val StopwordLangs: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "por", "para"))

  /** One pass over the lowercased whitespace tokens counting hits per
    * language, plus a CJK codepoint counter (`s_zh`) over the same
    * string. Value-identical to four
    * `size(filter(tokens, isin(words)))` columns plus
    * `size(regexp_extract_all(text, '[\\u4e00-\\u9fff]', 0))` — the regex
    * form materializes an array of every CJK character per document just
    * to take its length (measured as the suite's highest pure operator
    * task time); this counts in the same kernel pass with zero
    * allocation. The range is BMP-only, so a per-char compare is exact
    * (no surrogate pairs), and case mapping never touches CJK.
    */
  // longest stopword across all lists: tokens longer than this can never
  // hit, so the scan skips their substring + 4 set probes entirely
  private val MaxStopwordLen = StopwordLangs.iterator.flatMap(_._2).map(_.length).max

  // Java regex \s — the exact class split(trim(x), "\s+") breaks on
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def stopwordHits(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new Array[Int](StopwordLangs.length + 1)
    // toLowerCase on the UTF8String for locale-independent case mapping
    // (Java's String.toLowerCase is locale-sensitive — Turkish dotless i)
    val lowered = text.toLowerCase.toString
    val len = lowered.length
    // One manual scan replaces trim + regex split (the regex engine and
    // its token-array allocation dominated the kernel at ~3 KB/doc):
    // tokens are maximal non-\s runs — trim+split("\s+") yields the same
    // runs (its lone ""-token edge on all-whitespace input is not a
    // stopword, so counts agree) — and CJK codepoints tally in the same
    // pass. Only stopword-length tokens materialize a substring.
    var cjk = 0
    var i = 0
    while (i < len) {
      val c = lowered.charAt(i)
      if (isWs(c)) {
        i += 1
      } else {
        if (c >= '\u4e00' && c <= '\u9fff') cjk += 1
        val start = i
        i += 1
        var cc = ' '
        while (i < len && { cc = lowered.charAt(i); !isWs(cc) }) {
          if (cc >= '\u4e00' && cc <= '\u9fff') cjk += 1
          i += 1
        }
        if (i - start <= MaxStopwordLen) {
          val tok = lowered.substring(start, i)
          var l = 0
          while (l < StopwordLangs.length) {
            if (StopwordLangs(l)._2.contains(tok)) counts(l) += 1
            l += 1
          }
        }
      }
    }
    counts(StopwordLangs.length) = cjk
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      counts.map(c => c: Any))
  }

  /** Polynomial rolling hash over code points:
    * acc = (acc·31 + codepoint) mod 1e9+7. Value-identical to the
    * declarative `aggregate(split(text, ''), 0, (acc,c) -> ...)` form.
    */
  def rollingFingerprint(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Word n-grams of a string, joined by single spaces — the shared
    * primitive of decontamination and repetition scoring. Tokenization
    * matches `split(trim(text), "\\s+")` exactly (runs of ASCII regex
    * whitespace), so the declarative DuckDB oracles stay bit-identical;
    * only the interpreted per-element lambda is replaced by this one
    * JVM loop (~100x, same trade as [[shingleHashes]]). Fewer than n
    * tokens yields an empty array.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    // replicate Spark's trim (strips SPACES only, not \t/\n — Java's
    // String.trim would) and split's limit=-1 (keeps trailing empties),
    // so the kernel agrees with split(trim(text), "\\s+") on every edge
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = s.substring(b, e).split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Excise every occurrence of a corpus-duplicated k-token span from
    * one document, in ONE pass: tokenize (identically to
    * `split(trim(text), "\\s+")`, see [[wordNgrams]]), probe each
    * positional k-gram against the broadcast hash set (O(1) per probe —
    * the interpreted `array_contains`-over-literal spelling this kernel
    * replaces was an O(|dupSet|) linear scan per n-gram), mark covered
    * token positions, and rejoin the survivors single-spaced. Returns
    * (cleaned, n_kept, n_removed) as one struct so the caller's
    * projection stays single-pass.
    */
  def removeSpans(text: UTF8String, k: Int,
      spans: java.util.HashSet[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = s.substring(b, e).split("\\s+", -1)
    val n = toks.length
    val covered = new Array[Boolean](n)
    if (n >= k && !spans.isEmpty) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + k <= n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        if (spans.contains(sb.toString)) {
          var p = i
          while (p < i + k) { covered(p) = true; p += 1 }
        }
        i += 1
      }
    }
    val out = new java.lang.StringBuilder
    var kept = 0
    var i = 0
    while (i < n) {
      if (!covered(i)) {
        if (kept > 0) out.append(' ')
        out.append(toks(i))
        kept += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(out.toString), kept.toLong, (n - kept).toLong))
  }

  /** Unicode NFC normalization (canonical composition) with two
    * zero-allocation fast paths: pure-ASCII strings are detected with
    * one byte scan (no String materialization at all — the overwhelming
    * case in a web corpus), and already-composed strings return the
    * input UTF8String unchanged after the cheap `isNormalized` check.
    * Only strings actually containing decomposed sequences pay the
    * Normalizer pass.
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val n = text.numBytes
    var i = 0L
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var ascii = true
    while (ascii && i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
