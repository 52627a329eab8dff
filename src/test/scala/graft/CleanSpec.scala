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
}
