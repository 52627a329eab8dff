package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the scale-soak artifact against measurement rot — the r14
  * lesson: a benchmark-methodology fix (toRdd vs count()) silently
  * invalidated 35 committed soak rows because nothing tied a soak row's
  * sf0.1 base to the living watermark. This spec fails when:
  *  - a soak row's base drifts more than 2x from the committed
  *    clean-host floor in either direction (stale base, or a floor
  *    re-measured under different methodology), or
  *  - a soak row is missing its bench-method stamp (`"bench": 2` =
  *    cold toRdd.count(); unstamped rows predate the honesty fix).
  * Coverage is universal: every registry query must have a committed
  * floor and a 10x soak row (generated corpora cover the
  * fixture-bound image queries — tools/make_soak_images.py); only the
  * 100x point may lawfully lag, for note-adjudicated quadratic tails.
  */
class SoakDriftSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def readTree(path: String) =
    mapper.readTree(new java.io.File(path))

  test("every soak row's sf0.1 base is within 2x of the committed floor") {
    val soak = readTree("BENCH_SOAK.json")
    val wm = readTree("BENCH_WATERMARKS.json")
    val bad = Seq.newBuilder[String]
    for (scale <- Seq("soak10x", "soak100x")) {
      val qs = soak.get(scale).get("queries")
      qs.fieldNames().forEachRemaining { q =>
        val base = qs.get(q).get("sf0.1_sec").asDouble()
        // r17: watermark rows are nested {"floor": sec, "host": factor}
        val w = Option(wm.get(q)).map(_.get("floor").asDouble())
        w.foreach { floor =>
          // 0.15s absolute slack: sub-0.1s rows jitter across hosts
          // without any methodology change
          val drift = base > 2 * floor + 0.15 || floor > 2 * base + 0.15
          if (drift) bad += f"$scale/$q: base=$base%.3f floor=$floor%.3f"
        }
      }
    }
    val msgs = bad.result()
    assert(msgs.isEmpty,
      "stale soak bases (re-soak under tools/run.sh graft.Bench + " +
        s"merge_new_soak.py):\n${msgs.mkString("\n")}")
  }

  test("every registry query has a committed floor and a 10x soak row") {
    // formalizes the per-query artifact loop: registering a query
    // without benching its floor and soaking it at 10x is a red build,
    // not a silent coverage gap. (100x may lawfully lag — adjudicated
    // tails like incremental_ingest — so only 10x is universal.)
    val names = graft.queries.Registry.all.map(_.name).toSet
    val wm = readTree("BENCH_WATERMARKS.json")
    val missingFloor = names.filter(q => wm.get(q) == null)
    assert(missingFloor.isEmpty,
      s"queries with no clean-host floor in BENCH_WATERMARKS.json: " +
        missingFloor.toSeq.sorted.mkString(", "))
    val q10 = readTree("BENCH_SOAK.json").get("soak10x").get("queries")
    val missingSoak = names.filter(q => q10.get(q) == null)
    assert(missingSoak.isEmpty,
      s"queries with no 10x soak row: ${missingSoak.toSeq.sorted.mkString(", ")}")
  }

  test("every query has a 100x soak row OR an explicit scale-cap note") {
    // the r15 lesson, one level up from the bench stamp: an honestly-
    // absent 100x row used to be recorded only in BENCH_SOAK's free-text
    // note, which made it indistinguishable from a forgotten soak. The
    // accounting is now two-level: the REGISTRY carries the design
    // statement (Q.scaleNote — "this audit is scale-capped on purpose,
    // here is the bounded twin that carries the 100x number") and the
    // soak artifact may carry a matching per-row "adjudicated" key.
    // Absence of both is a red build — rot self-detects instead of
    // hiding in prose — and a soak-level adjudication WITHOUT a registry
    // note is red too: a per-round machine judgment that was never
    // promoted to an explicit design decision.
    val reg = graft.queries.Registry.all
    val names = reg.map(_.name).toSet
    val notes = reg.map(q => q.name -> q.scaleNote).toMap
    val soak = readTree("BENCH_SOAK.json")
    val q100 = soak.get("soak100x").get("queries")
    val q10 = soak.get("soak10x").get("queries")
    val unaccounted = names.filter { q =>
      q100.get(q) == null && notes(q).forall(_.trim.isEmpty)
    }
    assert(unaccounted.isEmpty,
      "queries with neither a 100x soak row nor a registry scaleNote: " +
        s"${unaccounted.toSeq.sorted.mkString(", ")}")
    val unpromoted = names.filter { q =>
      Option(q10.get(q)).exists(_.get("adjudicated") != null) &&
        notes(q).forall(_.trim.isEmpty)
    }
    assert(unpromoted.isEmpty,
      "soak rows adjudicated without a registry scaleNote (promote the " +
        s"design decision): ${unpromoted.toSeq.sorted.mkString(", ")}")
    // and the converse discipline: a note/adjudication on a query that
    // HAS a 100x row is stale annotation — remove it when the row lands
    val stale = names.filter { q =>
      q100.get(q) != null &&
        (notes(q).exists(_.trim.nonEmpty) ||
          Option(q10.get(q)).exists(_.get("adjudicated") != null))
    }
    assert(stale.isEmpty,
      s"stale scale-cap notes (100x row exists): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every soak row carries the current bench-method stamp") {
    val soak = readTree("BENCH_SOAK.json")
    val unstamped = Seq.newBuilder[String]
    for (scale <- Seq("soak10x", "soak100x")) {
      val qs = soak.get(scale).get("queries")
      qs.fieldNames().forEachRemaining { q =>
        val b = Option(qs.get(q).get("bench")).map(_.asInt()).getOrElse(0)
        if (b < 2) unstamped += s"$scale/$q"
      }
    }
    val msgs = unstamped.result()
    assert(msgs.isEmpty,
      s"soak rows without the bench=2 (cold toRdd) stamp:\n${msgs.mkString("\n")}")
  }
}
