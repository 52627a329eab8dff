package graft

import org.apache.spark.sql.functions._
import graft.ops.Sectionize

class SectionizeSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    (1, "preamble junk"),
    (2, "## Intro"),
    (3, "first line"),
    (4, "second line"),
    (5, "## Empty section"),
    (6, "## Body"),
    (7, "tail"))
    .toDF("line_no", "text")

  test("sectionize groups body under headings, drops preamble") {
    val got = Sectionize.sectionize(lines, $"line_no",
        $"text".startsWith("## "), $"text")
      .orderBy($"section_no")
      .select($"section_no", $"heading", $"n_lines", $"body")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "## Intro", 2L, "first line second line"),
      (2L, "## Empty section", 0L, ""),
      (3L, "## Body", 1L, "tail")))
  }

  test("sectionizeBy partitions per document") {
    val twoDocs = Seq(
      ("d1", 1, "## A"), ("d1", 2, "x"),
      ("d2", 1, "## B"), ("d2", 2, "y"), ("d2", 3, "z"))
      .toDF("doc", "line_no", "text")
    val got = Sectionize.sectionizeBy(twoDocs, Seq($"doc"), $"line_no",
        $"text".startsWith("## "), $"text")
      .orderBy($"doc", $"section_no")
      .select($"doc", $"heading", $"body")
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(("d1", "## A", "x"), ("d2", "## B", "y z")))
  }

  test("no headings -> empty result") {
    val none = Seq((1, "a"), (2, "b")).toDF("line_no", "text")
    assert(Sectionize.sectionize(none, $"line_no",
      $"text".startsWith("#"), $"text").count() == 0)
  }
}
