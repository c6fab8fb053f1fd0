package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout artifact format against the driver's consumption
  * shape (2000-char tail, json.loads of the last line) WITHOUT running a
  * bench: Bench.artifactLines formats synthetic results, and
  * tools/artifact_check.py — the executable statement of the contract —
  * validates them. A format drift (the r10 seconds-map and r11
  * headline-total truncation classes) now fails `sbt test` instead of
  * blinding a future round's verdict. The negative case proves the
  * checker actually discriminates.
  */
class ArtifactContractSpec extends AnyFunSuite {

  /** Synthetic per-key results shaped like a real run: one normal key per
    * registry entry (reusing the REAL key names so suspect-zero logic sees
    * real oracle membership), plus one crashed key (rows = -1).
    */
  private def syntheticLines(breakOne: Boolean): Seq[String] = {
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val results = keys.zipWithIndex.map { case (k, i) =>
      Bench.KeyRes(k,
        countedSec = 0.1 + (i % 7) * 0.01,
        fullSec = 0.15 + (i % 7) * 0.01,
        cpuSec = 0.3 + (i % 5) * 0.01,
        rows = if (breakOne && i == 3) -1L else 10L + i,
        order = i,
        firstAttempt = if (i == 5) Some(9.87) else None)
    }
    val plans = keys.map(k => (k, "ok"))
    Bench.artifactLines(results, plans, calibration = 0.2,
      sfDir = "/root/testdata/sf0.1", diverted = Seq.empty,
      // model a drift-bearing sweep so the contract check sees the r16
      // calibration_end_sec / calibration_drift scalars on the last line
      calibrationEnd = 0.24)
  }

  private def runChecker(lines: Seq[String]): (Int, String) = {
    val f = Files.createTempFile("bench_stdout", ".txt")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    val pb = new ProcessBuilder("python3", "tools/artifact_check.py",
      f.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    Files.deleteIfExists(f)
    (rc, out)
  }

  test("the emitted artifact lines satisfy the driver-tail contract") {
    val (rc, out) = runChecker(syntheticLines(breakOne = false))
    assert(rc == 0, s"checker rejected a well-formed artifact:\n$out")
    assert(out.contains("artifact contract OK"), out)
  }

  test("a crashed key still yields a contract-conforming artifact " +
    "(errors listed, excluded from total_ok)") {
    val lines = syntheticLines(breakOne = true)
    val (rc, out) = runChecker(lines)
    assert(rc == 0, s"checker rejected the crashed-key artifact:\n$out")
    // the crashed key appears in the ROWS line's errors array; the final
    // line carries only the COUNT (unbounded arrays there are the
    // truncation class the contract exists to prevent)
    val rowsLine = lines.find(_.contains("\"metric\":\"rows\"")).get
    assert(rowsLine.contains("\"errors\":[\""), rowsLine)
    assert(lines.last.contains("\"n_errors\":1"), lines.last)
  }

  test("a deliberately mangled artifact fails the check (truncation class)") {
    // Reproduce the r11 failure mode: fold a map INTO the final line.
    // The splice must stay VALID standalone JSON and keep all four
    // lines, or the checker rejects it for an unrelated reason (line
    // count / parse error) and the map-bearing rule — the actual r11
    // truncation guard — never executes.
    val good = syntheticLines(breakOne = false)
    val mangledLast =
      good.last.dropRight(1) + ",\"queries\":{\"agg_group\":0.1}}"
    assert(mangledLast.contains("\"metric\":\"total\""))
    val mangled = good.dropRight(1) :+ mangledLast
    assert(mangled.size == good.size)
    val (rc, out) = runChecker(mangled)
    assert(rc != 0, "checker must reject a map-bearing final line")
    assert(out.contains("must not embed any map"), out)
  }

  test("an error-ARRAY-bearing final line fails the check (mass-failure " +
    "truncation class)") {
    // The r12 second review's finding: an unbounded errors array on the
    // final line recreates the truncation class under mass failure.
    val good = syntheticLines(breakOne = false)
    val mangledLast =
      good.last.dropRight(1) + ",\"errors\":[\"a\",\"b\"]}"
    val mangled = good.dropRight(1) :+ mangledLast
    val (rc, out) = runChecker(mangled)
    assert(rc != 0, "checker must reject an array-bearing final line")
    assert(out.contains("must not embed any map/array"), out)
  }

  test("a reordered artifact (total not last) fails the check") {
    val good = syntheticLines(breakOne = false)
    val (rc, _) = runChecker(Seq(good(0), good(3), good(1), good(2)))
    assert(rc != 0, "checker must reject total-not-last ordering")
  }

  test("the committed CORRECTNESS round artifacts satisfy the shape contract") {
    import scala.jdk.CollectionConverters._
    val arts = Files.list(Paths.get(".")).iterator().asScala
      .filter(_.getFileName.toString.matches("CORRECTNESS_r\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    assume(arts.nonEmpty, "no committed correctness artifacts")
    // the latest artifact is the binding one; older rounds predate fields
    val latest = arts.last
    val pb = new ProcessBuilder("python3", "tools/artifact_check.py",
      "--correctness", latest.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"$latest violates the shape contract:\n$out")
    assert(out.contains("correctness artifact OK"), out)
  }

  test("the current round carries a DRIFT_rNN.json drift artifact of " +
    "valid shape (VERDICT r16 task 5: comparability is an artifact, " +
    "not a re-derivation)") {
    import scala.jdk.CollectionConverters._
    // Current round = latest committed CORRECTNESS round + 1 (the driver
    // commits CORRECTNESS_r{N} when round N closes, so a tree holding
    // r16 is round 17 in progress). The pin activates once the round's
    // first full sweep has run via tools/round_close_bench.py — from
    // then on, a deleted or stale drift artifact fails sbt test.
    val rounds = Files.list(Paths.get(".")).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("CORRECTNESS_r\\d+\\.json") =>
        s.stripPrefix("CORRECTNESS_r").stripSuffix(".json").toInt }
      .toSeq
    assume(rounds.nonEmpty, "no committed correctness artifacts")
    val current = rounds.max + 1
    val drift = Paths.get(s"DRIFT_r$current.json")
    assert(Files.exists(drift),
      s"DRIFT_r$current.json missing — run tools/round_close_bench.py " +
        s"$current <prev-official.jsonl> (the round-close sweep command " +
        "emits it alongside BENCH_LOCAL_LAST.jsonl)")
    val txt = Files.readString(drift)
    for (field <- Seq("\"reference\"", "\"runs\"", "\"settled_sum_ratio\"",
        "\"settled_median_ratio\"", "\"decile_median_ratio\""))
      assert(txt.contains(field), s"DRIFT_r$current.json lacks $field")
  }

  test("BENCH_LOCAL_LAST.jsonl written by the last real bench run (if any) " +
    "also satisfies the contract") {
    // .jsonl since r15: the file is one JSON object per line (ADVICE r14
    // — the old .json extension broke json.load with "Extra data").
    val f = Paths.get("BENCH_LOCAL_LAST.jsonl")
    assume(Files.exists(f), "no local bench artifact yet — run graft.Bench")
    val (rc, out) = runChecker(
      Files.readString(f).split("\n").toSeq)
    assert(rc == 0, s"persisted bench artifact violates the contract:\n$out")
  }
}
