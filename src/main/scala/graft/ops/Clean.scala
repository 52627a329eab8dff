package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text/numeric cleaning functions — the reference's F-layer
  * (SURVEY.md §2.4) re-expressed as pure `Column => Column` transforms so
  * every one of them stays inside whole-stage codegen (zero UDFs).
  *
  * Reference provenance:
  *  - cleanTextV1: dask-with-dataframe.py:15-18 (strip non-word chars, cap 255)
  *  - cleanTextV2: dask-with-dataframe-[2].py:26-33 (null guard, strip
  *    non-ASCII, cap, trim)
  *  - coerceNumeric: dask-with-dataframe.py:52-53 (`pd.to_numeric(
  *    errors='coerce').fillna(0)`)
  *  - stripThousands: dask-with-dataframe-[2].py:90 (`float(v.replace(',',''))`)
  *  - monthNumber/quarterLabel: dask-with-dataframe-[2].py:41-61
  */
object Clean {

  /** Strip non-word/non-space chars and truncate. Java regex `\w` is
    * ASCII-only (vs Python's Unicode default) — the harness data is ASCII,
    * and the DuckDB oracle (RE2) agrees on the ASCII interpretation, so we
    * pin ASCII semantics deliberately.
    */
  def cleanTextV1(c: Column, maxLen: Int = 255): Column =
    substring(regexp_replace(c, "[^\\w\\s]", ""), 1, maxLen)

  /** Null→"", stringify, strip non-ASCII runs, truncate, strip. The final
    * strip is regex `\s`-based, not Spark's `trim` — Python's `.strip()`
    * (the reference, dask-with-dataframe-[2].py:33) removes ALL
    * whitespace (tabs, newlines), Spark/DuckDB `trim` only removes
    * spaces. Caught by the ScalaCheck property suite.
    */
  def cleanTextV2(c: Column, maxLen: Int = 255): Column =
    regexp_replace(
      substring(
        regexp_replace(coalesce(c.cast("string"), lit("")), "[^\\x00-\\x7F]+", ""),
        1, maxLen),
      "^\\s+|\\s+$", "")

  /** Unparseable → NULL → 0.0. Must behave identically whether ANSI mode is
    * on or off, hence `try_cast` (a bare `cast` throws under ANSI).
    */
  def coerceNumeric(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  /** `"1,234,567.89"` → 1234567.89 (thousands-separator strip). */
  def stripThousands(c: Column): Column =
    regexp_replace(c, ",", "").try_cast("double")

  /** Indonesian month name → month number (reference's `bulan_map`,
    * dask-with-dataframe-[2].py:41-46). Constant map — Catalyst folds the
    * lookup into codegen'd branches.
    */
  private val bulanMap: Seq[(String, Int)] = Seq(
    "Januari" -> 1, "Februari" -> 2, "Maret" -> 3, "April" -> 4,
    "Mei" -> 5, "Juni" -> 6, "Juli" -> 7, "Agustus" -> 8,
    "September" -> 9, "Oktober" -> 10, "November" -> 11, "Desember" -> 12)

  def monthNumber(name: Column): Column =
    bulanMap.foldLeft(lit(null).cast("int")) { case (acc, (m, n)) =>
      when(name === m, lit(n)).otherwise(acc)
    }

  /** month, year → "Q{1..4} {year}" (dask-with-dataframe-[2].py:58-61). */
  def quarterLabel(month: Column, year: Column): Column =
    concat(lit("Q"), (((month - 1) / 3).cast("int") + 1).cast("string"),
      lit(" "), year.cast("string"))

  /** Stringify with null guard (`str(x) if pd.notna(x) else ""`). */
  def stringify(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** F7 — date-pattern extraction (dask-with-dataframe-[2].py:49-53):
    * `Pada Tanggal (\d{1,2}) (\w+) (\d{4})` → (day, month-name, year).
    * One regexp_extract per group (Spark has no multi-group single call);
    * non-matching input yields empty strings, like `re.search` → None
    * guarded by the reference.
    */
  private val datePat = "Pada Tanggal (\\d{1,2}) (\\w+) (\\d{4})"
  def extractDay(c: Column): Column   = regexp_extract(c, datePat, 1)
  def extractMonth(c: Column): Column = regexp_extract(c, datePat, 2)
  def extractYear(c: Column): Column  = regexp_extract(c, datePat, 3)

  /** F8 — substring between two literal markers
    * (dask-with-dataframe-[2].py:72-78: `text.find(start)`, slice to
    * `text.find(end, start)`). `(?s)` so the span crosses newlines;
    * non-greedy; missing markers → "".
    */
  def extractBetween(c: Column, start: String, end: String): Column =
    regexp_extract(c,
      "(?s)" + java.util.regex.Pattern.quote(start) + "(.*?)"
        + java.util.regex.Pattern.quote(end), 1)

  /** F9 — line parse into (item, value, rest)
    * (`re.match(r"(.+?)\s+([\d,.]+)\s*(.*)", line)`,
    * dask-with-dataframe-[2].py:86-90). Pair with [[lineMatches]] to drop
    * non-matching lines (C:91-92).
    */
  private val linePat = "^(.+?)\\s+([\\d,.]+)\\s*(.*)$"
  def lineItem(c: Column): Column  = regexp_extract(c, linePat, 1)
  def lineValue(c: Column): Column = regexp_extract(c, linePat, 2)
  def lineRest(c: Column): Column  = regexp_extract(c, linePat, 3)
  def lineMatches(c: Column): Column = regexp_like(c, lit(linePat))
}
