package graft

/** README's query counts are derived claims — this gate re-derives them
  * from the registry so they cannot drift (r12 shipped with both wrong;
  * flagged in ADVICE). If this fails, fix README, not the test.
  */
class DocCountsSpec extends SparkSpec {

  private val readme = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("README.md")), "UTF-8")

  test("README's 'N named queries' matches the registry") {
    val n = graft.queries.Registry.queries.size
    val claimed = "(\\d+) named queries".r.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
    assert(claimed.contains(n),
      s"README claims ${claimed.orNull} named queries, registry has $n")
    val claimed2 = "\\((\\d+) queries in the\\s+registry".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(claimed2.contains(n),
      s"README 'queries in the registry' claims ${claimed2.orNull}, registry has $n")
  }

  test("README's streaming-query count matches StreamingGates") {
    val n = graft.queries.StreamingGates.queries.size
    val word = Map(2 -> "two", 3 -> "three", 4 -> "four", 5 -> "five",
      6 -> "six", 7 -> "seven", 8 -> "eight", 9 -> "nine", 10 -> "ten",
      11 -> "eleven", 12 -> "twelve", 13 -> "thirteen", 14 -> "fourteen",
      15 -> "fifteen", 16 -> "sixteen")(n)
    assert(readme.contains(s"$word that execute REAL Structured"),
      s"README should say '$word that execute REAL Structured' (registry has $n)")
  }

  test("README's selfcheck 'N/N PASS' comment matches the registry") {
    val n = graft.queries.Registry.queries.size
    val claimed = "# (\\d+)/(\\d+) PASS".r.findFirstMatchIn(readme)
      .map(m => (m.group(1).toInt, m.group(2).toInt))
    assert(claimed.contains((n, n)),
      s"README selfcheck comment claims ${claimed.orNull}, registry has $n")
  }

  test("every registry query has an oracle") {
    val qs = graft.queries.Registry.queries.keySet
    val os = graft.queries.Registry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert((qs -- os).isEmpty, s"queries without oracles: ${qs -- os}")
  }
}
