package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact layout contracts the driver depends on —
  * every one of these has been broken by a past round (r6 extractor
  * miss, r7 line-count overflow, r9 head truncation, r15 total-line
  * overflow), so they are asserted at full registry size instead of
  * re-discovered by losing a round's perf signal. */
class BenchArtifactSpec extends AnyFunSuite {

  /** A full-registry-sized synthetic result set: long realistic names,
    * values spanning ms to minutes, one error, ~50 write gates. */
  private val names = (0 until 231).map(i =>
    f"q$i%03d_some_realistically_long_operator_name")
  private val gates = names.filter(_.hashCode % 5 == 0).toSet
  private val rawTimes: Map[String, Seq[Option[Double]]] =
    names.zipWithIndex.map { case (n, i) =>
      val base = 0.005 * (i + 1) + (i % 7) * 0.4
      n -> (if (i == 37) Seq(Some(base), None, Some(base))
            else Seq(Some(base), Some(base * 1.25), Some(base * 1.1)))
    }.toMap
  private val results: Map[String, Option[Double]] =
    rawTimes.map { case (n, ts) =>
      n -> (if (ts.forall(_.isDefined)) Some(ts.flatten.min) else None)
    }
  private val calib = Seq("scan_shuffle" -> 0.41, "write" -> 0.52,
    "read" -> 0.11)
  private val lines = Bench.artifactLines(results, rawTimes, gates,
    "/root/testdata/sf0.1", calib)

  test("every artifact line is self-contained valid JSON") {
    lines.foreach { l =>
      assert(JsonMethods.parseOpt(l).isDefined, s"unparseable line: $l")
    }
  }

  test("the total line prints first AND last, identically, and stays " +
      "inside the driver's ~2000-char tail window (the r15 defect)") {
    assert(lines.head === lines.last)
    val t = JsonMethods.parse(lines.last)
    assert((t \ "metric") === JString("total"))
    assert(lines.last.length < 1900,
      s"total line ${lines.last.length} chars — the 2000-char tail " +
        "capture would truncate it mid-JSON again")
    // compact by construction: top-20 only, no embedded maps
    val JObject(fields) = t: @unchecked
    assert(!fields.exists(_._1 == "spread_pct"))
    assert(!fields.exists(_._1 == "write_gates"))
    val JObject(qs) = (t \ "queries"): @unchecked
    assert(qs.size === 20)
  }

  test("digest lines carry every query exactly once, cheapest-first, " +
      "with family tags; the error is reported as \"err\", not a timing") {
    val qLines = lines.tail.init.filter(_.startsWith("""{"queries""""))
    val seen = qLines.flatMap { l =>
      val JObject(qs) = (JsonMethods.parse(l) \ "queries"): @unchecked
      qs.map(_._1)
    }
    assert(seen.sorted === names.sorted)
    assert(seen.size === seen.distinct.size)
    // cheapest-first across digest lines; the errored query sorts last
    val vals = qLines.flatMap { l =>
      val JObject(qs) = (JsonMethods.parse(l) \ "queries"): @unchecked
      qs.map(_._2)
    }
    val nums = vals.collect { case JDouble(d) => d }
    assert(nums === nums.sorted)
    assert(vals.last === JString("err"))
    val fams = qLines.flatMap { l =>
      val JObject(fs) = (JsonMethods.parse(l) \ "fam"): @unchecked
      fs
    }.toMap
    assert(fams.keySet === names.toSet)
    assert(names.forall(n =>
      fams(n) === JString(if (gates(n)) "w" else "r")))
  }

  test("spread covers the FULL registry (r15 #6) and rides INSIDE the " +
      "timing digests (r16 advice: separate lines overflowed the tail)") {
    val qLines = lines.tail.init.filter(_.startsWith("""{"queries""""))
    val spread = qLines.flatMap { l =>
      val JObject(s) = (JsonMethods.parse(l) \ "spread_pct"): @unchecked
      s.map(_._1)
    }
    // every query with >= 2 successful reps has a spread entry — here,
    // all of them (the errored query still has two good reps) — and each
    // digest's spread names exactly its own queries, so a capture cut
    // can never separate a timing from its spread
    assert(spread.sorted === names.sorted)
    qLines.foreach { l =>
      val j = JsonMethods.parse(l)
      val JObject(qs) = (j \ "queries"): @unchecked
      val JObject(sp) = (j \ "spread_pct"): @unchecked
      assert(sp.map(_._1).toSet === qs.map(_._1).toSet, s"digest: $l")
    }
    // no standalone spread lines remain
    assert(!lines.exists(_.startsWith("""{"spread_pct"""")))
  }

  test("the artifact fits the ~35-line tail capture at full registry " +
      "size (the r16-advice regression: ~51 lines pushed cheap timings " +
      "out of the window)") {
    assert(lines.size <= 30, s"${lines.size} lines — tail capture would " +
      "drop the cheapest digests again")
  }

  test("the calibration probe prints as its own line AND as calib_sec " +
      "in the total line (r16 verdict #6: cross-day drift normalization)") {
    val cl = lines.filter(_.startsWith("""{"calib""""))
    assert(cl.size === 1)
    val JObject(c) = (JsonMethods.parse(cl.head) \ "calib"): @unchecked
    assert(c.map(_._1) === List("scan_shuffle", "write", "read"))
    val t = JsonMethods.parse(lines.last)
    val JDouble(cs) = (t \ "calib_sec"): @unchecked
    assert(math.abs(cs - calib.map(_._2).sum) < 1e-9)
    // the calib line sits between the last digest and the gate map, so
    // any tail window that keeps the gates keeps the calibration too
    assert(lines.indexWhere(_.startsWith("""{"calib"""")) ===
      lines.indexWhere(_.startsWith("""{"write_gates"""")) - 1)
    // and a calib-less invocation (spec-sized harness runs) omits both
    val bare = Bench.artifactLines(results, rawTimes, gates, "/x")
    assert(!bare.exists(_.startsWith("""{"calib"""")))
    assert(!bare.last.contains("calib_sec"))
  }

  test("the write-gate map line is complete and gate-only") {
    val gl = lines.filter(_.startsWith("""{"write_gates""""))
    assert(gl.size === 1)
    val JObject(g) = (JsonMethods.parse(gl.head) \ "write_gates"): @unchecked
    assert(g.map(_._1).toSet === gates)
  }
}
