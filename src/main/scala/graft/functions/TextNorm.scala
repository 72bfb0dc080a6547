package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the documented ON-RAMP to every
  * tokenize/shingle/fingerprint family ([[graft.operators.DedupOps]]
  * `tokenSet`/`shingles`, [[graft.operators.TextOps]]): real web corpora
  * mix composed and decomposed encodings, letter case, and diacritics,
  * and WITHOUT this pass two visually-identical documents ("Café" NFC
  * vs "Café" NFD vs "café") near-miss every shingle, MinHash,
  * SimHash, and suffix fingerprint downstream — near-dup recall silently
  * collapses exactly on the noisiest slices of a crawl.
  *
  * The pipeline, fixed order, JDK-only (`java.text.Normalizer` — no new
  * dependencies):
  *
  *   1. NFC — canonical composition, so case mapping sees precomposed
  *      characters;
  *   2. case fold — `toLowerCase(Locale.ROOT)` (locale-invariant: no
  *      Turkish dotless-i surprises from the host locale);
  *   3. accent strip — NFD, drop combining marks (categories Mn/Mc/Me,
  *      what utf8proc-based engines strip), NFC re-compose.
  *
  * Cross-engine exactness: equals DuckDB's
  * `strip_accents(lower(nfc_normalize(s)))` — pinned by the q166 oracle
  * — for ASCII and the Latin accent range (á…ü, ñ, ç, both cases).
  * Characters whose CASE mapping differs between the JDK's full mapping
  * and utf8proc's simple mapping (İ U+0130, contextual Greek final
  * sigma) are outside the exactness contract; non-decomposable letters
  * (ł, ø, ß) pass through unchanged in both engines.
  *
  * Scale: a codegen'd per-row kernel, no shuffle, no allocation on the
  * dominant path — ASCII input (the q166 corpus probe: 100% of
  * `documents`) short-circuits to an in-place lowercase without touching
  * `Normalizer`. */
object TextNorm {

  /** normalize(s) = stripAccents(casefold(nfc(s))); see object doc. */
  def normalizeString(s: String): String = {
    // ASCII fast path: no composition, no marks — lowercase is the
    // whole pipeline, and most bytes of a large corpus take it
    var i = 0
    var ascii = true
    var hasUpper = false
    while (ascii && i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) { if (hasUpper) s.toLowerCase(java.util.Locale.ROOT) else s }
    else {
      val lower = Normalizer.normalize(s, Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT)
      val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val c = nfd.charAt(j)
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.append(c)
        j += 1
      }
      Normalizer.normalize(sb, Normalizer.Form.NFC)
    }
  }

  /** UTF8String seam for codegen ([[UnicodeNormalize]]). */
  def normalizeUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(normalizeString(s.toString))

  /** NFC + casefold + accent-strip as a codegen'd Catalyst expression. */
  case class UnicodeNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "unicode_normalize"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects string, got $other")
    }
    override protected def nullSafeEval(input: Any): Any =
      TextNorm.normalizeUTF8(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextNorm.normalizeUTF8($c)")
    override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
      copy(child = c)
  }

  /** Column API: `normalize($"text")`. */
  def normalize(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c)))

  /** The DuckDB expression [[normalize]] is exact against (the q166
    * oracle's building block — keep the two definitions in sight of
    * each other). */
  def normalizeSql(expr: String): String =
    s"strip_accents(lower(nfc_normalize($expr)))"
}
