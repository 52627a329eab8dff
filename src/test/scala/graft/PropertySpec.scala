package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{Clean, DedupOps, Ids, TextOps}

/** Property-based specs (SURVEY.md §5.2(3)) for the scalar F-layer and
  * the ID-minting invariants — raw ScalaCheck driven from FunSuite (the
  * scalatest/scalacheck bridge artifact isn't in the offline cache).
  * Inputs run through Spark itself, not a reimplementation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  private val asciiGen: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString.take(300))

  // words with repeats and occasional empties (double spaces) — the
  // token shapes that stress split/shingle boundary semantics
  private val docGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.oneOf("a", "b", "cc", "dd", "e f"),
        Gen.alphaNumStr.map(_.take(6))))
      .map(_.mkString(" ").take(400))

  test("native hash kernels == HOF pipelines on arbitrary docs") {
    check(Prop.forAll(Gen.listOfN(6, docGen)) { ss =>
      ss.isEmpty || {
        val df = ss.toDF("text")
        val rows = df.select(
            DedupOps.shingleHashSetNative($"text", 3).as("n_hs"),
            when(size(DedupOps.shingleHashes($"text", 3)) > 0,
              array_sort(array_distinct(DedupOps.shingleHashes($"text", 3)))).as("h_hs"),
            DedupOps.minhashSigNative($"text", 3, 4).as("n_sig"),
            when(size(DedupOps.shingleHashes($"text", 3)) > 0,
              DedupOps.minhashFromHashes(DedupOps.shingleHashes($"text", 3), 4)).as("h_sig"),
            DedupOps.simhashNative($"text", 16, 5).as("n_sim"),
            DedupOps.simhashFromHashes(DedupOps.tokenHashes($"text", 5), 16).as("h_sim"))
          .collect()
        rows.forall { r =>
          r.getSeq[Long](0) == r.getSeq[Long](1) &&
            r.getSeq[Long](2) == r.getSeq[Long](3) &&
            r.getLong(4) == r.getLong(5)
        }
      }
    }, minTests = 10)
  }

  test("coerceNumeric: never null, batch-size preserved") {
    check(Prop.forAll(Gen.listOfN(12, Gen.oneOf(asciiGen, Gen.numStr,
        Gen.double.map(_.toString)))) { ss =>
      ss.isEmpty || {
        val out = ss.toDF("s").select(Clean.coerceNumeric($"s").as("v"))
          .collect()
        out.length == ss.length && out.forall(!_.isNullAt(0))
      }
    })
  }

  test("cleanTextV1: no punctuation survives, length <= 255") {
    check(Prop.forAll(Gen.listOfN(8, asciiGen)) { ss =>
      ss.isEmpty || ss.toDF("s").select(Clean.cleanTextV1($"s").as("v"))
        .as[String].collect()
        .forall(v => v.length <= 255 && v.forall(c =>
          c.isLetterOrDigit || c == '_' || c.isWhitespace))
    })
  }

  test("cleanTextV2: \\s-stripped (Python .strip parity), pure ASCII, <= 255") {
    val ws = " \t\n\f\r".toSet // Java regex \s — what Python strip removes
    val anyString = Gen.listOf(Gen.choose(1.toChar, 1000.toChar)).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(8, anyString)) { ss =>
      ss.isEmpty || ss.toDF("s").select(Clean.cleanTextV2($"s").as("v"))
        .as[String].collect()
        .forall(v => v.length <= 255 && v.forall(_ < 128)
          && (v.isEmpty || (!ws(v.head) && !ws(v.last))))
    })
  }

  test("global IDs: permutation of 1..n, monotone in declared order") {
    check(Prop.forAll(Gen.listOfN(25, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 500)))) {
      rows =>
        val d = rows.distinct
        d.isEmpty || {
          val got = Ids.withGlobalId(d.toDF("src_rank", "line_no"), "id",
              Seq($"src_rank", $"line_no"))
            .select($"src_rank", $"line_no", $"id")
            .as[(Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
          got.map(_._3).toSeq == (1 to d.length)
        }
    }, minTests = 10)
  }

  test("minhash components in [0, p); equal docs -> equal signatures") {
    check(Prop.forAll(Gen.listOfN(8, Gen.choose(0, 20))) { words =>
      words.length < 4 || {
        val text = words.map(w => s"w$w").mkString(" ")
        val sigs = Seq(text, text).toDF("text").select(
            DedupOps.minhashFromHashes(
              DedupOps.shingleHashes($"text", 2), 8).as("sig"))
          .as[Seq[Long]].collect()
        sigs(0) == sigs(1) && sigs(0).length == 8 &&
          sigs(0).forall(h => h >= 0 && h < DedupOps.MinhashPrime)
      }
    }, minTests = 10)
  }

  test("bit_length64 == length(bin(v)) for every long, codegen and eval") {
    // the quantile sketch's octave bucketing relies on this identity:
    // the native nlz expression must agree with the string form the
    // DuckDB oracle uses, across the full long domain incl. 0,
    // negatives, and both extremes
    val edge = Seq(0L, 1L, -1L, 7L, 8L, Long.MaxValue, Long.MinValue)
    val rnd = new scala.util.Random(17)
    val vals = edge ++ Seq.fill(500)(rnd.nextLong()) ++
      (0 until 63).map(1L << _)
    val diff = vals.toDF("v")
      .select(graft.plans.VectorExpressions.bitLength64($"v").as("fast"),
        length(expr("bin(v)")).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.isEmpty, diff.collect().take(5).mkString(","))
  }

  test("fingerprint64 invariant to case and whitespace runs") {
    check(Prop.forAll(asciiGen) { s =>
      val variants = Seq(s, s.toUpperCase, "  " + s.replace(" ", "   ") + " ")
      variants.toDF("s").select(TextOps.fingerprint64($"s").as("f"))
        .as[Long].collect().distinct.length == 1
    }, minTests = 15)
  }

  /** Driver-side reference BPE trainer — same algorithm on plain Scala
    * strings (sentinel chars, Java `String.replace` = left-to-right
    * non-overlapping, tie-break on the raw pair's binary order), used
    * as a differential oracle for the distributed trainer.
    */
  private def refBpeTrain(docs: Seq[String], n: Int): Seq[(Int, String, Long)] = {
    var vocab: Seq[(String, Long)] = docs
      .flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    var expansion = Map.empty[Char, String]
    val out = Seq.newBuilder[(Int, String, Long)]
    var it = 1
    var done = false
    while (it <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (rep, c) =>
        var i = 0
        while (i < rep.length - 1) {
          val p = rep.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (raw, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        val expanded = raw.map(ch => expansion.getOrElse(ch, ch.toString)).mkString
        expansion += (it.toChar -> expanded)
        out += ((it, expanded, cnt))
        vocab = vocab.map { case (rep, c) => (rep.replace(raw, it.toChar.toString), c) }
        it += 1
      }
    }
    out.result()
  }

  // lowercase-letter words only: the generator must not emit the
  // sentinel range the trainer reserves
  private val bpeDocGen: Gen[String] =
    Gen.listOf(Gen.choose(1, 5).flatMap(k =>
      Gen.listOfN(k, Gen.choose('a', 'd')).map(_.mkString)))
      .map(_.mkString(" ").take(120))

  test("bpeTrainMerges == driver-side reference trainer on random corpora") {
    check(Prop.forAll(Gen.listOfN(5, bpeDocGen)) { ss =>
      val docs = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = graft.queries.TextAnalysis.bpeTrainMerges(docs, nMerges = 3)
        .as[(Int, String, Long)].collect().toSeq
      got == refBpeTrain(ss, 3)
    }, minTests = 8)
  }

  test("lshKeeper drops every injected exact duplicate") {
    // duplicate each doc once under a higher id: the copy shares every
    // band bucket with its original, so it can never be kept
    check(Prop.forAll(Gen.listOfN(4, docGen.suchThat(_.split(" ").length >= 3))) { ss =>
      val originals = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val copies = ss.zipWithIndex.map { case (s, i) => (100L + i, s) }
      val got = graft.queries.DedupQueries.lshKeeper(
          (originals ++ copies).toDF("doc_id", "text"))
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      copies.forall { case (cid, text) =>
        // docs shorter than the shingle width have no signature at all
        // (sig null) and legitimately drop out of the frame
        !got.contains(cid) || (got(cid)._1 <= cid - 100 && !got(cid)._2)
      } && originals.forall { case (oid, _) =>
        !got.contains(oid) || got(oid)._1 <= oid
      }
    }, minTests = 8)
  }
}
