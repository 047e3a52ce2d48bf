package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unicode text normalization — `fold_text(s, 'nfc'|'strip'|'fold')`.
  *
  * Curation motivation: exact dedup, shingle hashing, and vocab lookups
  * all operate on BYTES — the same text in NFC vs NFD (or with a
  * fullwidth/accent variant) hashes differently and silently defeats
  * them. Normalizing is the first pass of every web-corpus pipeline
  * (reference: the cleaners' text standardization stage,
  * `src/transform/cleaners.py:46`), so it must run at scan cost: one
  * fused codegen'd expression, no regex chains, no HOFs.
  *
  * Modes:
  *  - `nfc`   — canonical composition only (byte-stable form for hashing).
  *  - `strip` — accent strip: NFD, drop combining marks (Mn/Mc/Me), NFC
  *              recompose. Mirrors DuckDB `strip_accents` (utf8proc
  *              recomposes after stripping — Hangul syllables survive
  *              composed; non-decomposable letters like ø/ł keep their
  *              shape).
  *  - `fold`  — the full matching key: strip, then PER-CODEPOINT
  *              lowercase, then ASCII-whitespace collapse + trim.
  *              Per-codepoint (`Character.toLowerCase(int)`, not
  *              `String.toLowerCase`) deliberately: it matches utf8proc's
  *              simple case mapping — final sigma stays σ, no Turkish-İ
  *              locale surprises (the İ dot is a combining mark, already
  *              stripped) — so the DuckDB oracle `lower(strip_accents(s))`
  *              reproduces it codepoint-for-codepoint. Whitespace is the
  *              RE2 `\s` set ([ \t\n\v\f\r]) for the same reason.
  *
  * Engine-portable by construction — all three modes hash-match the
  * DuckDB oracle on planted non-ASCII rows (`q_text_fold`, against
  * `nfc_normalize` / `strip_accents` / `lower` + `\s`-collapse), and
  * the exact-dedup composition is oracle-matched by `q_dedup_fold`.
  */
case class FoldTextExpr(child: Expression, mode: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fold_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!FoldTextExpr.Modes.contains(mode))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName mode must be one of ${FoldTextExpr.Modes.mkString("/")}, got '$mode'")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  @transient private lazy val modeId: Int = FoldTextExpr.Modes.indexOf(mode)

  override def nullSafeEval(input: Any): Any =
    FoldTextExpr.compute(input.asInstanceOf[UTF8String], modeId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FoldTextExpr.compute($c, $modeId)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FoldTextExpr {
  val Modes: Seq[String] = Seq("nfc", "strip", "fold")

  /** Static helper shared by eval and codegen. */
  def compute(s: UTF8String, modeId: Int): UTF8String = {
    val in = s.toString
    val out = modeId match {
      case 0 => Normalizer.normalize(in, Normalizer.Form.NFC)
      case 1 => stripAccents(in)
      case _ => collapseWs(lowerByCodepoint(stripAccents(in)))
    }
    UTF8String.fromString(out)
  }

  /** NFD → drop combining marks → NFC recompose (utf8proc semantics). */
  private def stripAccents(in: String): String = {
    val nfd = Normalizer.normalize(in, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb, Normalizer.Form.NFC)
  }

  /** Simple (context-free) case mapping, codepoint by codepoint. */
  private def lowerByCodepoint(in: String): String = {
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    while (i < in.length) {
      val cp = in.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Collapse runs of RE2-`\s` whitespace to one space; trim ends. */
  private def collapseWs(in: String): String = {
    val sb = new java.lang.StringBuilder(in.length)
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
