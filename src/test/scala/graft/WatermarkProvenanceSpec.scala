package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards floor provenance — the r16 elevation lesson: the whole host
  * ran 1.5-1.9x hot for a stretch, and a floor minted inside such a
  * window would have committed an elevated watermark with nothing
  * recording it, permanently laxening that query's drift gate. Since
  * r17 every BENCH_WATERMARKS row is {"floor": sec, "host": factor}:
  * graft.Bench measures the canonical probe (Bench.ProbeQuery, always
  * against sf0.1) at the start of every run, and merge_new_soak.py
  * stamps the measured factor onto every floor it mints. This spec
  * fails when:
  *  - a row is malformed (missing floor/host, floor <= 0, host < 0);
  *  - a floor was minted above the disclosed threshold (host > 1.25)
  *    without an explicit "host_note" adjudication string;
  *  - a row claims the pre-probe sentinel (host == 0) without being in
  *    the frozen r17 migration set (tools/preprobe_floors.txt) — new
  *    floors can never dodge the stamp by claiming to predate it;
  *  - the probe query itself has no committed floor (the instrument
  *    must always have a reference), or Bench's hand-rolled watermark
  *    parser disagrees with a real JSON parse of the committed file.
  */
class WatermarkProvenanceSpec extends AnyFunSuite {

  /** Disclosed mint-time elevation threshold. Matches Bench's stderr
    * warning: floors minted when the probe reads above this need an
    * explicit host_note or a clean-host re-mint.
    */
  private val DisclosedMaxHost = 1.25

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def wm = mapper.readTree(new java.io.File("BENCH_WATERMARKS.json"))

  test("every watermark row is {floor>0, host>=0}") {
    val bad = Seq.newBuilder[String]
    val rows = wm
    rows.fieldNames().forEachRemaining { q =>
      val r = rows.get(q)
      if (!r.isObject || r.get("floor") == null || r.get("host") == null)
        bad += s"$q: not a {floor, host} row"
      else {
        if (!(r.get("floor").asDouble() > 0)) bad += s"$q: floor <= 0"
        if (r.get("host").asDouble() < 0) bad += s"$q: host < 0"
      }
    }
    val msgs = bad.result()
    assert(msgs.isEmpty, s"malformed watermark rows:\n${msgs.mkString("\n")}")
  }

  test(s"no floor minted above host $DisclosedMaxHost without a host_note") {
    val bad = Seq.newBuilder[String]
    val rows = wm
    rows.fieldNames().forEachRemaining { q =>
      val r = rows.get(q)
      val host = r.get("host").asDouble()
      val noted = Option(r.get("host_note")).exists(n =>
        n.isTextual && n.asText().trim.nonEmpty)
      if (host > DisclosedMaxHost && !noted)
        bad += f"$q: host=$host%.2f"
    }
    val msgs = bad.result()
    assert(msgs.isEmpty,
      "floors minted on an elevated host with no adjudication (re-mint " +
        s"on a clean host or add a host_note):\n${msgs.mkString("\n")}")
  }

  test("the pre-probe sentinel set is frozen to the r17 migration") {
    val frozen = scala.io.Source.fromFile("tools/preprobe_floors.txt")
      .getLines().map(_.trim).filter(_.nonEmpty).toSet
    val violators = Seq.newBuilder[String]
    val rows = wm
    rows.fieldNames().forEachRemaining { q =>
      if (rows.get(q).get("host").asDouble() == 0 && !frozen(q))
        violators += q
    }
    val msgs = violators.result()
    assert(msgs.isEmpty,
      "rows claiming the pre-probe host=0 sentinel that are not in the " +
        s"frozen r17 set: ${msgs.mkString(", ")} — new floors must carry " +
        "the probe-measured factor (mint via graft.Bench + merge_new_soak.py)")
  }

  test("the probe query has a committed floor and Bench's parser agrees with JSON") {
    val parsed = Bench.loadWatermarks("BENCH_WATERMARKS.json")
    assert(parsed.contains(Bench.ProbeQuery),
      s"no committed floor for probe '${Bench.ProbeQuery}'")
    val viaJson = scala.collection.mutable.Map.empty[String, Double]
    val rows = wm
    rows.fieldNames().forEachRemaining { q =>
      viaJson(q) = rows.get(q).get("floor").asDouble()
    }
    assert(parsed == viaJson.toMap,
      "Bench.loadWatermarks (regex parser) drifted from the committed file's JSON")
  }
}
