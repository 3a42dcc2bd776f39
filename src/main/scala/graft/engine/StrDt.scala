package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String / datetime scalar function surface (`.parallel.str` /
  * `.parallel.dt` in the reference — a dynamic proxy over the whole
  * pandas accessor, `/root/reference/parallel_pandas/core/
  * parallel_str_dt.py:91-116`; ops exercised by tests listed in
  * SURVEY.md §2.10).
  *
  * Everything here is a stock codegen'd Catalyst expression — these stay
  * inside WholeStageCodegen and vectorize over the parquet scan.
  */
object StrDt {

  // ---- str ----
  def strLower(c: Column): Column = lower(c)
  def strUpper(c: Column): Column = upper(c)
  def strLen(c: Column): Column = length(c)
  def strStrip(c: Column): Column = trim(c)
  /** pandas str.contains is REGEX by default. */
  def strContains(c: Column, pat: String): Column = c.rlike(pat)
  def strStartsWith(c: Column, p: String): Column = c.startsWith(p)
  def strEndsWith(c: Column, p: String): Column = c.endsWith(p)
  def strReplace(c: Column, pat: String, repl: String, regex: Boolean): Column =
    if (regex) regexp_replace(c, pat, repl)
    else regexp_replace(c, java.util.regex.Pattern.quote(pat),
      java.util.regex.Matcher.quoteReplacement(repl))
  /** pandas str.slice(i, j) — 0-based, end-exclusive. */
  def strSlice(c: Column, start: Int, stop: Int): Column =
    substring(c, start + 1, stop - start)
  /** Occurrences of a regex pattern (pandas str.count). */
  def strCount(c: Column, pat: String): Column =
    when(c.isNull, lit(null)).otherwise(size(split(c, pat, -1)) - 1)
  /** pandas str.zfill: left-pad with '0' (sign-aware variant deviates —
    * documented; reference tests don't cover negative numerics). */
  def strZfill(c: Column, n: Int): Column = lpad(c, n, "0")
  def strExtract(c: Column, pat: String, group: Int): Column =
    regexp_extract(c, pat, group)
  def strSplitItem(c: Column, sep: String, i: Int): Column =
    split(c, java.util.regex.Pattern.quote(sep)).getItem(i)

  // ---- dt ----
  def dtYear(c: Column): Column = year(c)
  def dtMonth(c: Column): Column = month(c)
  def dtDay(c: Column): Column = dayofmonth(c)
  def dtHour(c: Column): Column = hour(c)
  def dtMinute(c: Column): Column = minute(c)
  def dtQuarter(c: Column): Column = quarter(c)
  /** pandas dayofweek: Monday=0..Sunday=6; Spark dayofweek: Sunday=1. */
  def dtDayOfWeek(c: Column): Column = (dayofweek(c) + 5) % 7
  def dtDayName(c: Column): Column = date_format(c, "EEEE")
  def dtFloor(c: Column, unit: String): Column = date_trunc(unit, c)
  /** dt.ceil: truncate, and bump one unit unless already aligned. */
  def dtCeil(c: Column, unit: String): Column = {
    val fl = date_trunc(unit, c)
    when(fl === c, c).otherwise(fl + expr(s"INTERVAL 1 $unit"))
  }

  /** strftime -> java.time format translation (the tokens pandas tests
    * use; extend as needed). */
  private val strftimeTokens = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss",
    "%B" -> "MMMM", "%b" -> "MMM", "%A" -> "EEEE", "%a" -> "EEE",
    "%j" -> "DDD", "%y" -> "yy")
  def strftimeToJava(fmt: String): String =
    strftimeTokens.foldLeft(fmt) { case (s, (k, v)) => s.replace(k, v) }
  def dtStrftime(c: Column, fmt: String): Column =
    date_format(c, strftimeToJava(fmt))

  def dtTzConvert(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
}
