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
    * language. Value-identical to four
    * `size(filter(tokens, isin(words)))` columns, ~4× less token work
    * and zero interpreted lambdas.
    */
  def stopwordHits(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new Array[Int](StopwordLangs.length)
    // toLowerCase on the UTF8String for locale-independent case mapping
    // (Java's String.toLowerCase is locale-sensitive — Turkish dotless i)
    val toks = text.toLowerCase.toString.trim.split("\\s+")
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < StopwordLangs.length) {
        if (StopwordLangs(l)._2.contains(toks(i))) counts(l) += 1
        l += 1
      }
      i += 1
    }
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
}
