package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy word-wrap kernel behind pandas `str.wrap(width)` (reference
  * proxy `parallel_str_dt.py:91-116` → `textwrap.wrap` joined with
  * '\n'). Curated contract (documented deviations from CPython
  * textwrap, chosen so the kernel is a pure token fold a SQL oracle
  * can replicate):
  *
  *   - replace_whitespace=True and drop_whitespace=True semantics,
  *     with whitespace RUNS collapsed to a single separator and
  *     leading/trailing whitespace trimmed (textwrap keeps mid-line
  *     runs — "a  b" counts 4 columns there, 3 here — and keeps
  *     first-line leading whitespace);
  *   - break_long_words=True: a token longer than the remaining line
  *     fills it (when ≥1 column is free on a started line) and
  *     continues in full-width slices — CPython
  *     `_handle_long_word`'s fill-then-slice behavior;
  *   - break_on_hyphens=False: hyphenated compounds never split at
  *     the hyphen (CPython's default-on hyphen chunker is a 10-branch
  *     regex whose near-miss would be silent wrong answers).
  */
object TextWrapKernel {
  /** Null-free kernel; lines joined with '\n' like
    * `'\n'.join(textwrap.wrap(s, width))`. Widths count CODE POINTS
    * (like CPython) — an astral char (emoji, CJK-ext) is one column,
    * and the long-word slicer never splits a surrogate pair. */
  def wrap(s: String, width: Int): String = {
    val tokens = s.split("\\s+")
    val sb = new java.lang.StringBuilder(s.length + 8)
    var lineLen = 0
    var i = 0
    while (i < tokens.length) {
      var t = tokens(i)
      if (t.nonEmpty) {
        var tLen = t.codePointCount(0, t.length)
        // break_long_words: fill the remainder of a started line when
        // at least one column is free, then whole-width slices
        while (tLen > width) {
          val space = if (lineLen == 0) width else width - lineLen - 1
          if (space >= 1) {
            if (lineLen > 0) sb.append(' ')
            val cut = t.offsetByCodePoints(0, space)
            sb.append(t, 0, cut)
            t = t.substring(cut); tLen -= space
          }
          sb.append('\n'); lineLen = 0
        }
        if (lineLen == 0) { sb.append(t); lineLen = tLen }
        else if (lineLen + 1 + tLen <= width) {
          sb.append(' ').append(t); lineLen += 1 + tLen
        } else { sb.append('\n').append(t); lineLen = tLen }
      }
      i += 1
    }
    sb.toString
  }

  def wrapUtf8(s: UTF8String, width: Int): UTF8String =
    UTF8String.fromString(wrap(s.toString, width))
}

/** Native codegen'd expression wrapping [[TextWrapKernel]] — one
  * per-row kernel call inside WholeStageCodegen, zero serialization,
  * like the rest of the str accessor. Null in -> null out. */
case class TextWrap(child: Expression, width: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(width >= 1, s"str.wrap: width must be >= 1, got $width")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_wrap"

  override def nullSafeEval(a: Any): Any =
    TextWrapKernel.wrapUtf8(a.asInstanceOf[UTF8String], width)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextWrapKernel.wrapUtf8($a, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextWrap {
  import org.apache.spark.sql.GraftSqlShim

  def wrap(c: Column, width: Int): Column =
    GraftSqlShim.column(TextWrap(GraftSqlShim.expression(c), width))
}
