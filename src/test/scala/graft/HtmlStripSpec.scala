package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** [[TextOps.htmlToText]] cascade semantics on the markup shapes the
  * oracle gate's fixed furniture can't vary: multiline script bodies,
  * attributes on stripped blocks, double-encoded entities, numeric
  * references, and tag-free input.
  */
class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextOps.htmlToText($"h")).first().getString(0)

  test("script/style subtrees vanish WITH content, across lines and attrs") {
    val html = "<p>keep</p><script type=\"text/javascript\">\nvar a = 1 < 2;\n" +
      "if (a) { alert('x') }\n</script><style media=\"all\">\nbody { color: red }\n" +
      "</style><p>also</p>"
    assert(strip(html) == "keep also")
  }

  test("comments and tags go; entities decode; numeric refs drop") {
    assert(strip("<b>bold &amp; <i>nested</i></b><!-- gone\nacross lines -->") ==
      "bold & nested")
    assert(strip("a &lt;tag&gt; &quot;q&quot; x&#39;s &#8212; b") ==
      "a <tag> \"q\" x's b")
  }

  test("uppercase/mixed-case script and style blocks strip with content") {
    assert(strip("<p>a</p><SCRIPT>var leak = 1;</SCRIPT><Style>.x{}</Style><p>b</p>")
      == "a b")
  }

  test("numeric refs become a seam, never fusing neighboring words") {
    assert(strip("day&#8212;night") == "day night")
  }

  test("double-encoded &amp;lt; yields the literal entity text, not '<'") {
    // &amp; decodes LAST, so the author who wrote &amp;lt; meant the
    // four characters "&lt;" to be displayed
    assert(strip("say &amp;lt; out loud") == "say &lt; out loud")
  }

  test("whitespace seams collapse; tag-free text passes through trimmed") {
    assert(strip("<div>\n  <p>a</p>\n  <p>b</p>\n</div>") == "a b")
    assert(strip("  plain text, no markup  ") == "plain text, no markup")
  }
}
