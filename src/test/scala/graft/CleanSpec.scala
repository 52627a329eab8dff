package graft

import org.apache.spark.sql.functions._
import graft.ops.Clean

class CleanSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).first().get(0)

  test("cleanTextV1 strips punctuation and caps length") {
    assert(one(Clean.cleanTextV1(lit("a-b.c d!"))) == "abc d")
    assert(one(Clean.cleanTextV1(lit("x" * 300))) == "x" * 255)
    assert(one(Clean.cleanTextV1(lit(""))) == "")
  }

  test("cleanTextV2 null-guards, strips non-ASCII, trims") {
    assert(one(Clean.cleanTextV2(lit(null).cast("string"))) == "")
    assert(one(Clean.cleanTextV2(lit("  héllo wörld  "))) == "hllo wrld")
    assert(one(Clean.cleanTextV2(lit("oké"))) == "ok")
  }

  test("coerceNumeric: unparseable -> 0.0, numbers pass") {
    assert(one(Clean.coerceNumeric(lit("abc"))) == 0.0)
    assert(one(Clean.coerceNumeric(lit("12.5"))) == 12.5)
    assert(one(Clean.coerceNumeric(lit(null).cast("string"))) == 0.0)
    assert(one(Clean.coerceNumeric(lit("1e3"))) == 1000.0)
  }

  test("stripThousands") {
    assert(one(Clean.stripThousands(lit("1,234,567.89"))) == 1234567.89)
    assert(one(Clean.stripThousands(lit("nope"))) == null)
  }

  test("monthNumber maps all 12 Indonesian months, else null") {
    assert(one(Clean.monthNumber(lit("Januari"))) == 1)
    assert(one(Clean.monthNumber(lit("Desember"))) == 12)
    assert(one(Clean.monthNumber(lit("January"))) == null)
  }

  test("quarterLabel") {
    assert(one(Clean.quarterLabel(lit(1), lit(2024))) == "Q1 2024")
    assert(one(Clean.quarterLabel(lit(3), lit(2024))) == "Q1 2024")
    assert(one(Clean.quarterLabel(lit(4), lit(2024))) == "Q2 2024")
    assert(one(Clean.quarterLabel(lit(12), lit(2023))) == "Q4 2023")
  }

  test("stringify null guard") {
    assert(one(Clean.stringify(lit(null).cast("int"))) == "")
    assert(one(Clean.stringify(lit(42))) == "42")
  }

  test("F7 date extraction (reference's Pada Tanggal pattern)") {
    val s = lit("Laporan Pada Tanggal 31 Desember 2023 dan 2022")
    assert(one(Clean.extractDay(s)) == "31")
    assert(one(Clean.extractMonth(s)) == "Desember")
    assert(one(Clean.extractYear(s)) == "2023")
    assert(one(Clean.extractDay(lit("no date here"))) == "")
  }

  test("F8 between-markers extraction, dotall + non-greedy") {
    val s = lit("junk START a\nb END more START c END")
    assert(one(Clean.extractBetween(s, "START", "END")) == " a\nb ")
    assert(one(Clean.extractBetween(s, "MISSING", "END")) == "")
  }

  test("F9 line parse + matcher") {
    val s = lit("Penjualan bersih 1,992,527 Sales")
    assert(one(Clean.lineItem(s)) == "Penjualan bersih")
    assert(one(Clean.lineValue(s)) == "1,992,527")
    assert(one(Clean.lineRest(s)) == "Sales")
    assert(one(Clean.lineMatches(lit("no numbers at all"))) == false)
    assert(one(Clean.stripThousands(Clean.lineValue(s))) == 1992527.0)
  }
}
