package graft

import org.scalatest.funsuite.AnyFunSuite

/** Makes the contaminated-prior mistake machine-caught instead of
  * documented (VERDICT r14 item 2). The failure mode fired at two round
  * boundaries running: the driver's own live sweep (load_avg 4–7 —
  * every cell inflated by host contention) ended up as the committed
  * BENCH_LOCAL.json, poisoning the next round's storm ratios. Two
  * guards, both exercised here through the REAL python tools (like
  * BenchTailFixtureSpec, python3 missing fails loudly — the driver's
  * consumers are python):
  *  - `tools/repin_bench_local.py` now REFUSES to pin a source whose
  *    own telemetry says the host was loaded, unless --force;
  *  - `tools/check_prior.py` asserts the COMMITTED prior (git HEAD —
  *    the working-tree copy is legitimately overwritten by every live
  *    Bench run) parses, has telemetry, and was measured idle. Run
  *    here so `sbt test` goes red the round after a contaminated
  *    commit, with the restore recipe in the failure message.
  */
class PriorHygieneSpec extends AnyFunSuite {
  import scala.sys.process._

  private def run(cmd: String*): (Int, String) = {
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'))
    (cmd.!(logger), out.toString)
  }

  /** A minimal live-format artifact line (emit() shape). `bootId`,
    * `storm`, and `watch` are the RAW text inserted at those positions
    * — tests for the re-pin tool's sanitization pass JSON escapes
    * through them. */
  private def artifact(loadAvg: Double, value: String = "3.5001",
      queries: String = """"q1_agg":1.2500,"dedup_exact":2.2501""",
      bootId: String = "8d4f-test",
      storm: String = """"q1_agg":0.900""",
      watch: String = """"w1""""): String =
    s"""{"metric":"total","value":$value,"unit":"sec",""" +
      s""""queries":{$queries},"storm_ratio":{$storm},""" +
      """"unescaped":[],"unescaped_total":0,""" +
      """"revisit_cleared":[],"revisit_cleared_total":0,""" +
      """"revisit_pending":[],"revisit_pending_total":0,""" +
      s""""watch":[$watch],"watch_total":1,""" +
      s""""sibling_jvms":0,"load_avg":$loadAvg,""" +
      s""""suite_median_storm":0.9000,"boot_id":"$bootId",""" +
      """"sf":"/root/testdata/sf0.1"}"""

  private def tmpWrite(dir: java.nio.file.Path, name: String,
      text: String): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, text + "\n")
    p.toString
  }

  test("repin_bench_local refuses a contended-host source without --force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val src = tmpWrite(dir, "contaminated.json", artifact(loadAvg = 4.37))
    val out = dir.resolve("out.json").toString
    val (rc, msg) = run("python3", "tools/repin_bench_local.py", src, "-o", out)
    assert(rc !== 0, s"contaminated source must be refused:\n$msg")
    assert(msg.contains("CONTENDED"), s"refusal must name the cause:\n$msg")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)),
      "a refused re-pin must not write the output file")
    // --force overrides (a deliberate, stated decision)
    val (rcF, msgF) =
      run("python3", "tools/repin_bench_local.py", src, "-o", out, "--force")
    assert(rcF === 0, s"--force must pin anyway:\n$msgF")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
    // an idle-host source needs no force
    val clean = tmpWrite(dir, "clean.json", artifact(loadAvg = 0.21))
    assert(run("python3", "tools/repin_bench_local.py", clean,
      "-o", out)._1 === 0)
  }

  test("--keep-storm-ratio restores the source's total verbatim " +
      "(no recompute drift from 4dp-rounded cells)") {
    // emit() writes value = round(sum(unrounded cells)); recomputing
    // from the rounded cells drifted the restored total in the last
    // decimal (ADVICE r14: 186.5023 -> 186.5029). Here the rounded
    // cells sum to 3.5001 + 0.0001 drift if recomputed: cells 1.2500 +
    // 2.2501 = 3.5001 == value, so craft a real drift case instead:
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    // unrounded 1.00005 + 1.00005 = 2.0001 (emit's value), but the
    // 4dp cells are 1.0001 each -> recomputed 2.0002
    val src = tmpWrite(dir, "live.json", artifact(loadAvg = 0.3,
      value = "2.0001", queries = """"a":1.0001,"b":1.0001"""))
    val out = dir.resolve("out.json")
    assert(run("python3", "tools/repin_bench_local.py", src,
      "-o", out.toString, "--keep-storm-ratio")._1 === 0)
    val restored = java.nio.file.Files.readString(out)
    assert(restored.contains(""""value":2.0001,"""),
      s"verbatim restore must carry the source's value:\n$restored")
    // the default (hand re-pin) path recomputes — its cell set may
    // legitimately differ from the source's
    assert(run("python3", "tools/repin_bench_local.py", src,
      "-o", out.toString)._1 === 0)
    assert(java.nio.file.Files.readString(out).contains(""""value":2.0002,"""))
  }

  test("multi-source re-pin min-merges per cell, drops all-failed " +
      "sentinels, and rejects --keep-storm-ratio") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val s1 = tmpWrite(dir, "s1.json", artifact(loadAvg = 0.31,
      queries = """"a":1.0001,"b":2.0000,"c":-1.0000"""))
    val s2 = tmpWrite(dir, "s2.json", artifact(loadAvg = 0.22,
      queries = """"a":1.2000,"b":1.5000,"c":-1.0000"""))
    val out = dir.resolve("merged.json")
    val (rc, msg) = run("python3", "tools/repin_bench_local.py",
      s1, s2, "-o", out.toString)
    assert(rc === 0, s"merge failed:\n$msg")
    val merged = java.nio.file.Files.readString(out)
    assert(merged.contains(""""a":1.0001""") &&
      merged.contains(""""b":1.5000"""), s"per-cell min:\n$merged")
    assert(!merged.contains(""""c":"""),
      s"all-failed sentinel must be dropped, not pinned:\n$merged")
    assert(msg.contains("c"), "the dropped cell must be SAID")
    // env telemetry follows the quietest source
    assert(merged.contains(""""load_avg":0.2200"""), merged)
    // the merged prior passes the committed-prior hygiene check
    assert(run("python3", "tools/check_prior.py", out.toString)._1 === 0)
    // a merge is not a verbatim restore
    assert(run("python3", "tools/repin_bench_local.py", s1, s2,
      "-o", out.toString, "--keep-storm-ratio")._1 !== 0)
    // the contamination guard applies to EVERY source
    val hot = tmpWrite(dir, "hot.json", artifact(loadAvg = 4.0,
      queries = """"a":0.9000"""))
    assert(run("python3", "tools/repin_bench_local.py", s1, hot,
      "-o", out.toString)._1 !== 0)
    // SINGLE-source hand re-pins drop sentinels too (only the verbatim
    // --keep-storm-ratio path preserves them), so every default-path
    // output passes check_prior
    val single = dir.resolve("single.json")
    assert(run("python3", "tools/repin_bench_local.py", s1,
      "-o", single.toString)._1 === 0)
    assert(!java.nio.file.Files.readString(single).contains(""""c":"""))
    assert(run("python3", "tools/check_prior.py", single.toString)._1 === 0)
  }

  test("repin sanitizes externally-sourced boot ids (ADVICE r15: a " +
      "quote or backslash in a hand-written prior's boot_id must " +
      "neither crash nor be silently rewritten on re-parse)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    // the source FILE carries a backslash-u-0041 escape and an
    // escaped quote INSIDE the boot_id string (decoded value:
    // bad, one backslash, u0041, one quote, id) — raw interpolation
    // would silently rewrite the former to 'A' on re-parse and the
    // latter produces invalid JSON outright
    val src = tmpWrite(dir, "evil.json",
      artifact(loadAvg = 0.2, bootId = "bad\\\\u0041\\\"id"))
    val out = dir.resolve("out.json")
    val (rc, msg) = run("python3", "tools/repin_bench_local.py", src,
      "-o", out.toString)
    assert(rc === 0, s"sanitized re-pin must succeed:\n$msg")
    val text = java.nio.file.Files.readString(out)
    assert(text.contains(""""boot_id":"badu0041id""""),
      s"boot_id must be identifier-filtered like " +
        s"BenchPriors.sanitizeId:\n$text")
    // the hand re-pin path drops the live-run-relative watch array
    // (derived from the very storm ratios it drops)...
    assert(!text.contains("watch"),
      s"hand re-pin must drop the watch array:\n$text")
    assert(run("python3", "tools/check_prior.py", out.toString)._1 === 0)
    // ...while the verbatim-restore path carries it through
    val clean = tmpWrite(dir, "clean.json", artifact(loadAvg = 0.2))
    assert(run("python3", "tools/repin_bench_local.py", clean,
      "-o", out.toString, "--keep-storm-ratio")._1 === 0)
    val restored = java.nio.file.Files.readString(out)
    assert(restored.contains(""""watch":["w1"],"watch_total":1"""),
      s"verbatim restore must keep the watch array:\n$restored")
  }

  test("repin REFUSES escape-array names and storm_ratio keys that " +
      "sanitization would alter (ADVICE r17: a silent rewrite can " +
      "rename a cell, collide two keys into a duplicate json key, or " +
      "emit an empty name — none of it caught by the queries " +
      "self-check)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val out = dir.resolve("out.json")
    // a storm_ratio key with a space: sanitize would rewrite
    // 'foo bar' -> 'foobar', silently renaming the cell — refuse,
    // naming the offending value, and write nothing
    val spaceKey = tmpWrite(dir, "space_key.json", artifact(loadAvg = 0.2,
      storm = """"q1_agg":0.900,"foo bar":1.000"""))
    val (rcK, msgK) = run("python3", "tools/repin_bench_local.py",
      spaceKey, "-o", out.toString, "--keep-storm-ratio")
    assert(rcK !== 0, s"altered storm_ratio key must be refused:\n$msgK")
    assert(msgK.contains("storm_ratio key") && msgK.contains("foo bar"),
      s"refusal must name the field and offending value:\n$msgK")
    assert(!java.nio.file.Files.exists(out),
      "a refused re-pin must not write the output file")
    // a watch name carrying a backslash escape (decoded: bad, one
    // backslash, u0041, w): the old silent path rewrote it to
    // 'badu0041w' on re-parse; now it refuses
    val evilWatch = tmpWrite(dir, "evil_watch.json", artifact(
      loadAvg = 0.2, watch = """"bad\\u0041w""""))
    val (rcW, msgW) = run("python3", "tools/repin_bench_local.py",
      evilWatch, "-o", out.toString, "--keep-storm-ratio")
    assert(rcW !== 0, s"altered watch name must be refused:\n$msgW")
    assert(msgW.contains("watch name"),
      s"refusal must say which array the name came from:\n$msgW")
    // an empty-string unescaped name (sanitize keeps it empty — an
    // unaddressable cell): refused too
    val emptyName = tmpWrite(dir, "empty_name.json",
      artifact(loadAvg = 0.2).replace(""""unescaped":[]""",
        """"unescaped":[""]"""))
    assert(run("python3", "tools/repin_bench_local.py", emptyName,
      "-o", out.toString, "--keep-storm-ratio")._1 !== 0,
      "an empty-string escape-array name must be refused")
    // a clean live-shaped artifact (names all [A-Za-z0-9_]) passes
    // unchanged — real Bench output is never refused
    val clean = tmpWrite(dir, "clean_names.json", artifact(loadAvg = 0.2,
      storm = """"q1_agg":0.900,"dedup_exact":1.000"""))
    val (rcC, msgC) = run("python3", "tools/repin_bench_local.py",
      clean, "-o", out.toString, "--keep-storm-ratio")
    assert(rcC === 0, s"clean names must pass:\n$msgC")
    val text = java.nio.file.Files.readString(out)
    assert(text.contains(""""watch":["w1"],"watch_total":1""") &&
      text.contains(""""dedup_exact":1.000"""),
      s"clean names must carry through byte-identical:\n$text")
  }

  test("repin validates storm/watch names against the STRICT " +
      "[A-Za-z0-9_]+ class BenchPriors re-parses, refusing hyphens " +
      "and non-string values (ADVICE r18: the r17 refuse check " +
      "inherited sanitize_id's wider [A-Za-z0-9_-], under which a " +
      "doctored hyphenated name passed unchanged yet was invisible " +
      "to every downstream scoped re-parse; a JSON number in the " +
      "watch array was silently str()-coerced)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val out = dir.resolve("out.json")
    // a hyphenated storm_ratio key: unchanged by sanitize (hyphen is
    // in its class) so the r17 check passed it — but BenchPriors'
    // "([A-Za-z0-9_]+)" scan can never match it, so the pinned ratio
    // would be dead telemetry. Refuse.
    val hyphenKey = tmpWrite(dir, "hyphen_key.json", artifact(
      loadAvg = 0.2, storm = """"q1_agg":0.900,"fast-path":1.000"""))
    val (rcH, msgH) = run("python3", "tools/repin_bench_local.py",
      hyphenKey, "-o", out.toString, "--keep-storm-ratio")
    assert(rcH !== 0, s"hyphenated storm_ratio key must be refused:\n$msgH")
    assert(msgH.contains("fast-path") && msgH.contains("storm_ratio key"),
      s"refusal must name the field and offending value:\n$msgH")
    assert(!java.nio.file.Files.exists(out),
      "a refused re-pin must not write the output file")
    // a hyphenated watch name: same hole, same refusal
    val hyphenWatch = tmpWrite(dir, "hyphen_watch.json",
      artifact(loadAvg = 0.2, watch = """"bad-cell""""))
    val (rcW, msgW) = run("python3", "tools/repin_bench_local.py",
      hyphenWatch, "-o", out.toString, "--keep-storm-ratio")
    assert(rcW !== 0, s"hyphenated watch name must be refused:\n$msgW")
    assert(msgW.contains("bad-cell") && msgW.contains("watch name"), msgW)
    // a JSON number smuggled into the watch array: the old path
    // str()-coerced 42 -> "42" (which passes the character class) —
    // now refused as a non-string
    val numWatch = tmpWrite(dir, "num_watch.json",
      artifact(loadAvg = 0.2, watch = "42"))
    val (rcN, msgN) = run("python3", "tools/repin_bench_local.py",
      numWatch, "-o", out.toString, "--keep-storm-ratio")
    assert(rcN !== 0, s"non-string watch value must be refused:\n$msgN")
    assert(msgN.contains("42") && msgN.contains("watch name"), msgN)
    // boot_id stays on the PLAIN sanitize path (single-valued, no
    // collision hazard; pinned r15 behavior): the default artifact's
    // hyphenated "8d4f-test" — a real kernel boot UUID shape — still
    // passes through unrefused
    val clean = tmpWrite(dir, "clean.json", artifact(loadAvg = 0.2))
    val (rcB, msgB) = run("python3", "tools/repin_bench_local.py",
      clean, "-o", out.toString, "--keep-storm-ratio")
    assert(rcB === 0, s"hyphenated boot_id must still pass:\n$msgB")
    assert(java.nio.file.Files.readString(out)
      .contains(""""boot_id":"8d4f-test""""),
      "boot_id keeps the wide sanitize class (kernel UUIDs carry -)")
  }

  test("sweep_history prints a cell's prior + per-sweep ratios and an " +
      "idle-same-boot min, excluding (by name) contended, other-boot, " +
      "and cell-missing sweeps (VERDICT r18 item 5: the borderline " +
      "watch-cell adjudication — 'does the fresh min beat all stored " +
      "idle sweeps, or is the prior a lucky min?' — was previously a " +
      "hand-grep across /tmp/sweep*.json)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val bootNow = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/proc/sys/kernel/random/boot_id")).trim
    // prior pins the cell at 0.2000
    val prior = tmpWrite(dir, "prior.json", artifact(loadAvg = 0.2,
      queries = """"cellx":0.2000,"dedup_exact":2.2501"""))
    // idle same-boot sweeps at 1.10x and 1.25x of the prior
    val s1 = tmpWrite(dir, "sweepA.json", artifact(loadAvg = 0.25,
      queries = """"cellx":0.2200""", bootId = bootNow))
    val s2 = tmpWrite(dir, "sweepB.json", artifact(loadAvg = 0.30,
      queries = """"cellx":0.2500""", bootId = bootNow))
    // a contended sweep (load 2.5) and an other-boot sweep: both
    // listed as EXCLUDED, neither in the min
    val s3 = tmpWrite(dir, "sweepC.json", artifact(loadAvg = 2.5,
      queries = """"cellx":0.1000""", bootId = bootNow))
    val s4 = tmpWrite(dir, "sweepD.json", artifact(loadAvg = 0.2,
      queries = """"cellx":0.0500""", bootId = "deadbeef-other"))
    val (rc, msg) = run("python3", "tools/sweep_history.py", "cellx",
      "--prior", prior,
      "--sweeps", s"${dir.toString}/sweep*.json")
    assert(rc === 0, s"sweep_history must exit 0 on parseable input:\n$msg")
    assert(msg.contains("prior     0.2000s"), msg)
    // the idle min is the 1.10x sweep over exactly 2 eligible sweeps —
    // NOT the contended 0.50x or the other-boot 0.25x value
    assert(msg.contains("min(idle same-boot)   0.2200s = 1.10x of " +
      "prior over 2 sweep(s)"), msg)
    assert(msg.contains("EXCLUDED"), msg)
    assert(msg.contains("OTHER-BOOT"), msg)
    // a failed-query sentinel (-1, the value repin drops because it
    // is not a measurement) is excluded from the min, not treated as
    // a -5.00x "improvement"; a valid-JSON-but-not-object sweep is
    // listed unreadable instead of crashing the remaining cells
    val s5 = tmpWrite(dir, "zsentinel.json", artifact(loadAvg = 0.2,
      queries = """"cellx":-1.0""", bootId = bootNow))
    val s6 = tmpWrite(dir, "znonobj.json", "[1,2]")
    val (rc2, msg2) = run("python3", "tools/sweep_history.py", "cellx",
      "--prior", prior,
      "--sweeps", s"${dir.toString}/sweepA.json",
      "--sweeps", s"${dir.toString}/z*.json")
    assert(rc2 === 0, msg2)
    assert(msg2.contains("FAILED-SENTINEL"), msg2)
    assert(msg2.contains("not a JSON object"), msg2)
    assert(msg2.contains("min(idle same-boot)   0.2200s = 1.10x of " +
      "prior over 1 sweep(s)"),
      s"sentinel and unreadable sweeps must stay out of the min:\n$msg2")
    // a cell the prior never pinned still reports the idle min
    // (without a ratio), not silence
    val s7 = tmpWrite(dir, "nopr.json", artifact(loadAvg = 0.2,
      queries = """"nope":0.5000""", bootId = bootNow))
    val (rc3, msg3) = run("python3", "tools/sweep_history.py", "nope",
      "--prior", prior, "--sweeps", s7)
    assert(rc3 === 0, msg3)
    assert(msg3.contains("MISSING"), msg3)
    assert(msg3.contains("min(idle same-boot)   0.5000s (no prior to " +
      "ratio against) over 1 sweep(s)"), msg3)
  }

  test("sweep_history survives malformed load_avg and resolves --git " +
      "priors cwd-relative (ADVICE r19: a JSON-list load_avg raised " +
      "TypeError in the format spec and aborted the whole report; " +
      "--git built 'REV:path' verbatim so an absolute --prior — or a " +
      "run from a subdirectory — hit git's misleading 'exists on " +
      "disk, but not in HEAD'; json.loads of the git-show output " +
      "tracebacked instead of SystemExit)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val bootNow = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/proc/sys/kernel/random/boot_id")).trim
    val prior = tmpWrite(dir, "prior.json", artifact(loadAvg = 0.2,
      queries = """"cellx":0.2000"""))
    // one good idle sweep, one whose load_avg is a JSON list: the
    // malformed sweep must be listed (load rendered as '?', EXCLUDED)
    // without aborting the report, and the min must come from the
    // good sweep alone
    val good = tmpWrite(dir, "sweepA.json", artifact(loadAvg = 0.25,
      queries = """"cellx":0.2200""", bootId = bootNow))
    tmpWrite(dir, "sweepB.json", artifact(loadAvg = 0.2,
      queries = """"cellx":0.1000""", bootId = bootNow)
      .replace(""""load_avg":0.2,""", """"load_avg":[1,2],"""))
    val (rc, msg) = run("python3", "tools/sweep_history.py", "cellx",
      "--prior", prior, "--sweeps", s"${dir.toString}/sweep*.json")
    assert(rc === 0, s"a malformed load_avg must not abort:\n$msg")
    assert(!msg.contains("Traceback"), msg)
    assert(msg.contains("load=    ?"),
      s"non-scalar load must render as '?':\n$msg")
    assert(msg.contains("min(idle same-boot)   0.2200s = 1.10x of " +
      "prior over 1 sweep(s)"),
      s"the malformed sweep must stay out of the min:\n$msg")
    // --git with an ABSOLUTE prior path: previously 'HEAD:/abs/path'
    // failed; now relpath'd to a ./-pathspec git resolves cwd-relative
    val abs = new java.io.File("BENCH_LOCAL.json").getAbsolutePath
    val (rcA, msgA) = run("python3", "tools/sweep_history.py",
      "dedup_exact", "--git", "HEAD", "--prior", abs, "--sweeps", good)
    assert(rcA === 0, s"absolute --prior with --git must resolve:\n$msgA")
    assert(!msgA.contains("MISSING") && msgA.contains("HEAD:"),
      s"the committed prior must be read, not reported missing:\n$msgA")
    // same resolution from a subdirectory with a relative path
    val (rcS, msgS) = {
      val out = new StringBuilder
      val logger = ProcessLogger(l => out.append(l).append('\n'))
      (Process(Seq("python3", "sweep_history.py", "dedup_exact",
        "--git", "HEAD", "--prior", "../BENCH_LOCAL.json",
        "--sweeps", good), new java.io.File("tools")).!(logger),
        out.toString)
    }
    assert(rcS === 0 && !msgS.contains("MISSING"),
      s"subdirectory --git read must resolve ../-relative:\n$msgS")
    // --git pointed at a committed non-JSON file: SystemExit with the
    // prior named, not an uncaught JSONDecodeError traceback
    val (rcJ, msgJ) = run("python3", "tools/sweep_history.py", "cellx",
      "--git", "HEAD", "--prior", "CLAUDE.md")
    assert(rcJ !== 0, s"a non-JSON prior must fail:\n$msgJ")
    assert(msgJ.contains("not valid JSON") && msgJ.contains("CLAUDE.md"),
      s"the failure must name the prior and the cause:\n$msgJ")
    assert(!msgJ.contains("Traceback"),
      s"must be a SystemExit message, not a traceback:\n$msgJ")
  }

  test("repin omits load_avg when the source never measured one, and " +
      "check_prior rejects the resulting unknown-contamination prior " +
      "(ADVICE r15: no fabricated -1 that reads as verified-idle)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    // sibling_jvms present, load_avg absent (partial old telemetry) —
    // the old env block fabricated "load_avg":-1.0000 here
    val src = tmpWrite(dir, "noload.json",
      """{"metric":"total","value":1.2500,"unit":"sec",""" +
        """"queries":{"a":1.2500},"storm_ratio":{},""" +
        """"sibling_jvms":0,"boot_id":"8d4f-test","sf":"/x"}""")
    val out = dir.resolve("out.json")
    val (rc, msg) = run("python3", "tools/repin_bench_local.py", src,
      "-o", out.toString)
    assert(rc === 0, msg)
    val text = java.nio.file.Files.readString(out)
    assert(text.contains(""""sibling_jvms":0,"""), text)
    assert(!text.contains("load_avg"),
      s"must omit unmeasured load_avg, not fabricate a sentinel:\n$text")
    // the gate then FAILS the unknown-contamination prior, naming the
    // missing field (previously the -1 slipped it as verified-idle)
    val (rcG, msgG) = run("python3", "tools/check_prior.py", out.toString)
    assert(rcG !== 0, msgG)
    assert(msgG.contains("load_avg"), msgG)
    // an explicit negative load_avg is a sentinel, not a measurement:
    // rejected by the gate AND refused by the re-pin tool
    val neg = tmpWrite(dir, "neg.json", artifact(loadAvg = -1.0))
    val (rcN, msgN) = run("python3", "tools/check_prior.py", neg)
    assert(rcN !== 0, msgN)
    assert(msgN.contains("negative"), msgN)
    assert(run("python3", "tools/repin_bench_local.py", neg,
      "-o", out.toString)._1 !== 0)
  }

  test("check_prior passes a clean prior, fails contamination and " +
      "pinned failure sentinels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val clean = tmpWrite(dir, "clean.json", artifact(loadAvg = 0.21))
    val (rc0, msg0) = run("python3", "tools/check_prior.py", clean)
    assert(rc0 === 0, s"clean prior must pass:\n$msg0")

    val hot = tmpWrite(dir, "hot.json", artifact(loadAvg = 4.37))
    val (rc1, msg1) = run("python3", "tools/check_prior.py", hot)
    assert(rc1 !== 0, s"output:\n$msg1"); assert(msg1.contains("CONTENDED"), s"output:\n$msg1")

    // a pinned -1.0 failed-query sentinel permanently de-arms that
    // cell's storm escape — a prior must never carry one
    val sentinel = tmpWrite(dir, "sentinel.json", artifact(loadAvg = 0.2,
      queries = """"a":1.2500,"load_fake":-1.0000"""))
    assert(run("python3", "tools/check_prior.py", sentinel)._1 !== 0)

    // no telemetry at all (pre-r12 format): not checkable, fail
    val old = tmpWrite(dir, "old.json",
      """{"metric":"total","value":1.0,"queries":{"a":1.0}}""")
    val (rc3, msg3) = run("python3", "tools/check_prior.py", old)
    assert(rc3 !== 0, s"output:\n$msg3"); assert(msg3.contains("load_avg"), s"output:\n$msg3")
  }

  test("compare_bench warns when a compact artifact's unescaped array " +
      "is truncated (capped names must not read as fresh code signals)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val old = tmpWrite(dir, "old.json", artifact(loadAvg = 0.2,
      queries = """"a":1.0000,"b":1.0000"""))
    // a compact driver line: 1 name listed, 9 storms actually occurred
    val nw = tmpWrite(dir, "new.json",
      """{"metric":"total","value":9.0,"unit":"sec",""" +
        """"queries":{"a":8.0000,"b":1.0000},""" +
        """"unescaped":["a"],"unescaped_total":9,"sf":"/x"}""")
    val (rc, msg) = run("python3", "tools/compare_bench.py", old, nw)
    assert(rc === 1, s"the 8x cell must still flag:\n$msg")
    assert(msg.contains("TRUNCATED") && msg.contains("9"),
      s"truncation must be warned with the real total:\n$msg")
    // an uncapped artifact (len == total) warns nothing
    val full = tmpWrite(dir, "full.json",
      """{"metric":"total","value":9.0,"unit":"sec",""" +
        """"queries":{"a":8.0000,"b":1.0000},""" +
        """"unescaped":["a"],"unescaped_total":1,"sf":"/x"}""")
    val (_, msg2) = run("python3", "tools/compare_bench.py", old, full)
    assert(!msg2.contains("TRUNCATED"), msg2)
    assert(msg2.contains("unescaped storm"),
      s"adjudicated storm must keep its marker:\n$msg2")
  }

  test("compare_bench surfaces the watch marker on flagged cells and " +
      "warns when a compact watch array is truncated (r16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    val old = tmpWrite(dir, "old.json", artifact(loadAvg = 0.2,
      queries = """"a":1.0000,"b":1.0000"""))
    // a compact driver line: 1 watch name listed, 9 actually watched
    val nw = tmpWrite(dir, "new.json",
      """{"metric":"total","value":9.0,"unit":"sec",""" +
        """"queries":{"a":8.0000,"b":1.0000},""" +
        """"watch":["a"],"watch_total":9,"sf":"/x"}""")
    val (rc, msg) = run("python3", "tools/compare_bench.py", old, nw)
    assert(rc === 1, s"the 8x cell must still flag:\n$msg")
    assert(msg.contains("watch-listed"),
      s"a flagged cell the run already watched must say so:\n$msg")
    assert(msg.contains("TRUNCATED") && msg.contains("watch"),
      s"watch-cap truncation must be warned like unescaped:\n$msg")
  }

  test("compare_bench reads the watch->cleared lifecycle without the " +
      "prior file: a cell watched in OLD that returns to steady state " +
      "in NEW flags as an improvement carrying the OLD-side watch mark " +
      "(VERDICT r16 item 5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    // the r16->r17 adjudication shape: shared_prefix_edges read 11.06s
    // in the contended load-6.9 driver sweep (named in its watch
    // array), then a fresh idle sweep reads it back at its ~4.5s
    // steady state — compare_bench flags the 2.4x swing, and the
    // OLD-side mark tells the reader the swing is the WATCHED cell
    // clearing, not a fresh code signal, with no prior-file join
    val old = tmpWrite(dir, "watched_old.json",
      """{"metric":"total","value":12.0,"unit":"sec",""" +
        """"queries":{"shared_prefix_edges":11.0600,"b":1.0000},""" +
        """"watch":["shared_prefix_edges"],"watch_total":1,"sf":"/x"}""")
    val nw = tmpWrite(dir, "cleared_new.json", artifact(loadAvg = 0.2,
      queries = """"shared_prefix_edges":4.5200,"b":1.0000"""))
    val (rc, msg) = run("python3", "tools/compare_bench.py", old, nw)
    assert(rc === 1, s"the cleared cell must flag as an improvement:\n$msg")
    assert(msg.contains("shared_prefix_edges") &&
      msg.contains("OLD side was watch-listed"),
      s"the improvement must carry the OLD-side watch mark:\n$msg")
  }

  test("adjudication must read the FULL artifact, not the capped " +
      "compact line (VERDICT r17 item 5): fed the full watch array " +
      "the overflow cell's swing carries the OLD-side watch mark with " +
      "no truncation warning; fed the capped line the same cell loses " +
      "its mark and only the TRUNCATED warning says why") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prior")
    // the real r17 overflow shape, reduced: 9 watched cells, compact
    // line lists the first 8 worst — rel_large_orders (the ninth) is
    // only in the full artifact (BENCH_LIVE.json)
    val eight = (1 to 8).map(i => s""""w$i"""").mkString(",")
    val qs = """"rel_large_orders":6.0000,"b":1.0000"""
    val capped = tmpWrite(dir, "capped_old.json",
      s"""{"metric":"total","value":7.0,"unit":"sec","queries":{$qs},""" +
        s""""watch":[$eight],"watch_total":9,"sf":"/x"}""")
    val full = tmpWrite(dir, "full_old.json",
      s"""{"metric":"total","value":7.0,"unit":"sec","queries":{$qs},""" +
        s""""watch":[$eight,"rel_large_orders"],"watch_total":9,""" +
        """"sf":"/x"}""")
    val nw = tmpWrite(dir, "idle_new.json", artifact(loadAvg = 0.2,
      queries = """"rel_large_orders":2.0000,"b":1.0000"""))
    // full artifact: the cleared overflow cell is recognized as
    // watch-listed, and nothing warns of truncation
    val (rcF, msgF) = run("python3", "tools/compare_bench.py", full, nw)
    assert(rcF === 1, s"the 3x swing must flag either way:\n$msgF")
    assert(msgF.contains("rel_large_orders") &&
      msgF.contains("OLD side was watch-listed"),
      s"full-artifact read must mark the overflow cell watched:\n$msgF")
    assert(!msgF.contains("TRUNCATED"),
      s"an uncapped array must not warn of truncation:\n$msgF")
    // capped line: the mark is LOST (the ninth name isn't there) and
    // the TRUNCATED warning is the only trace — which is exactly why
    // the adjudication recipe reads BENCH_LIVE.json
    val (rcC, msgC) = run("python3", "tools/compare_bench.py", capped, nw)
    assert(rcC === 1, msgC)
    assert(!msgC.contains("OLD side was watch-listed"),
      s"the capped line cannot know the ninth cell was watched:\n$msgC")
    assert(msgC.contains("TRUNCATED"),
      s"the capped read must at least warn it is partial:\n$msgC")
  }

  test("the COMMITTED BENCH_LOCAL.json was measured on an idle host " +
      "(git HEAD — live runs may overwrite the working tree freely)") {
    val (rc, msg) = run("python3", "tools/check_prior.py", "--git", "HEAD")
    assert(rc === 0,
      "the COMMITTED bench prior is contaminated or unreadable — a " +
        "round boundary likely committed the driver's own live sweep " +
        "again (r13/r14 failure mode). Restore the last clean prior: " +
        "`git log --format=%h -- BENCH_LOCAL.json`, find the commit " +
        "whose load_avg is < 1, `git checkout <commit> -- " +
        s"BENCH_LOCAL.json`, commit. Tool said:\n$msg")
  }
}
