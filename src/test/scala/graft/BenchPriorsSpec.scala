package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-prior parsing contract that broke in r12: Bench's
  * in-line parser accepted only its own compact format, the re-pin
  * commits wrote Python-`json.dumps` style, and the storm escape
  * silently ran with zero priors (`max_storm_ratio: 0.0` in
  * BENCH_r12). [[BenchPriors.parse]] must accept BOTH styles, and —
  * the test that would have caught the break — the COMMITTED
  * `BENCH_LOCAL.json` must round-trip through the real code path
  * non-empty. */
class BenchPriorsSpec extends AnyFunSuite {

  test("parses Bench's own compact emit() format") {
    val line = """{"metric":"total","value":3.5,"unit":"sec",""" +
      """"queries":{"q1_agg":1.25,"dedup_exact":2.25},""" +
      """"storm_ratio":{"q1_agg":0.9},"sf":"/root/testdata/sf0.1"}"""
    assert(BenchPriors.parse(line) ===
      Map("q1_agg" -> 1.25, "dedup_exact" -> 2.25))
  }

  test("parses Python json.dumps style (spaces after ':' and ',') — " +
      "the exact format the r12 re-pin committed") {
    val line = """{"metric": "total", "value": 3.5, "unit": "sec", """ +
      """"queries": {"q1_agg": 1.25, "dedup_exact": 2.25}, """ +
      """"storm_ratio": {"q1_agg": 0.9}, "sf": "/root/testdata/sf0.1"}"""
    assert(BenchPriors.parse(line) ===
      Map("q1_agg" -> 1.25, "dedup_exact" -> 2.25))
  }

  test("parses indented pretty-printed style") {
    val txt =
      """|{
         |  "metric": "total",
         |  "queries": {
         |    "q1_agg": 1.25,
         |    "dedup_exact": 2.25
         |  },
         |  "storm_ratio": {"q1_agg": 99.0}
         |}""".stripMargin
    assert(BenchPriors.parse(txt) ===
      Map("q1_agg" -> 1.25, "dedup_exact" -> 2.25))
  }

  test("storm_ratio values never clobber the seconds") {
    // the artifact keys storm_ratio by the SAME query names; the scan
    // must stop at the queries object's closing brace
    val line = """{"queries":{"a":5.0},"storm_ratio":{"a":0.001}}"""
    assert(BenchPriors.parse(line) === Map("a" -> 5.0))
  }

  test("no queries object / truncated object -> empty, not a throw") {
    assert(BenchPriors.parse("""{"metric":"total","value":1.0}""").isEmpty)
    assert(BenchPriors.parse("""{"queries":{"a":1.0""").isEmpty)
    assert(BenchPriors.parse("").isEmpty)
  }

  test("the COMMITTED BENCH_LOCAL.json parses non-empty through the " +
      "real code path (the r12-break regression test)") {
    // forked tests run with cwd = repo root (sbt default); the prior
    // file Bench loads by default must always parse through this exact
    // function, whatever tool last rewrote it
    val f = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assert(java.nio.file.Files.exists(f),
      "committed BENCH_LOCAL.json missing from the repo root")
    val priors = BenchPriors.parse(java.nio.file.Files.readString(f))
    assert(priors.size >= 100,
      s"committed priors parsed to only ${priors.size} entries - " +
        "format drift would de-arm the storm escape (the r12 failure)")
    assert(priors.contains("bigram_probs"),
      "headline query missing from parsed priors")
    assert(priors.valuesIterator.forall(v => v > 0 && v < 3600),
      "parsed prior seconds outside sane range")
  }

  test("numField/strField extract prior-provenance telemetry from both " +
      "the full emit() format (r14, with unescaped/boot_id fields) and " +
      "a re-pinned artifact that omits them") {
    // the full r14 emit() shape: escape arrays + env telemetry + the
    // previous prior's provenance riding along
    val live = """{"metric":"total","value":185.1400,"unit":"sec",""" +
      """"queries":{"q1_agg":1.2500,"load_fake":-1.0000},""" +
      """"storm_ratio":{"q1_agg":0.900},""" +
      """"unescaped":["rel_salted_agg"],"unescaped_total":1,""" +
      """"revisit_cleared":[],"revisit_cleared_total":0,""" +
      """"revisit_pending":[],"revisit_pending_total":0,""" +
      """"sibling_jvms":0,"load_avg":0.2300,""" +
      """"suite_median_storm":0.9412,""" +
      """"boot_id":"8d4f2c2e-1111-2222-3333-444455556666",""" +
      """"prior_load_avg":0.1100,"prior_boot_id":"older-boot",""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(BenchPriors.numField(live, "load_avg") === Some(0.23))
    assert(BenchPriors.numField(live, "prior_load_avg") === Some(0.11))
    assert(BenchPriors.numField(live, "sibling_jvms") === Some(0.0))
    assert(BenchPriors.strField(live, "boot_id") ===
      Some("8d4f2c2e-1111-2222-3333-444455556666"))
    assert(BenchPriors.strField(live, "prior_boot_id") === Some("older-boot"))
    // the new fields must not disturb the queries scan (scoped past
    // storm_ratio, tolerant of trailing arrays), including the -1
    // failed-query sentinel
    assert(BenchPriors.parse(live) ===
      Map("q1_agg" -> 1.25, "load_fake" -> -1.0))
    // a hand re-pinned artifact omits provenance: None, not a throw
    val repinned = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q1_agg":1.2500},"storm_ratio":{},""" +
      """"sibling_jvms":0,"load_avg":0.2300,"sf":"/x"}"""
    assert(BenchPriors.numField(repinned, "prior_load_avg").isEmpty)
    assert(BenchPriors.strField(repinned, "boot_id").isEmpty)
    assert(BenchPriors.numField(repinned, "load_avg") === Some(0.23))
    assert(BenchPriors.numField("", "load_avg").isEmpty)
    assert(BenchPriors.strField("", "boot_id").isEmpty)
  }

  test("sanitizeId strips JSON-breaking chars from external identifiers " +
      "but passes kernel boot UUIDs through unchanged") {
    // the prior file's boot_id is re-embedded into the emitted artifact
    // line; a backslash or quote from a hand-written prior must never
    // produce an invalid JSON escape there (ADVICE r14)
    assert(BenchPriors.sanitizeId("8d79dc1d-17f2-404a-8eca-7f27f7768706") ===
      "8d79dc1d-17f2-404a-8eca-7f27f7768706")
    assert(BenchPriors.sanitizeId("evil\\u0022id\"x") === "evilu0022idx")
    assert(BenchPriors.sanitizeId("a b\tc{}") === "abc")
    assert(BenchPriors.sanitizeId("older-boot_2") === "older-boot_2")
  }

  test("watchCells names cliff-edge cells: above the normalized factor, " +
      "not already adjudicated in the escape arrays, worst-first (the " +
      "r15 ann_prototype_classify gap)") {
    // r15 driver-sweep fixture numbers (VERDICT r15 item 2):
    // ann_prototype_classify shipped at 2.970x its prior under suite
    // median 1.1445 — normalized 2.595, 0.001 under the 3.0 raw escape
    // trigger, so it carried NO marker and was findable only via a
    // prior-file join. watchCells is what the artifact's `watch` array
    // now derives from. The exclusion predicate is membership in the
    // unescaped/revisit_cleared/revisit_pending arrays (the cells with
    // their OWN artifact marker), not "ever tripped the escape".
    val ratios = Map(
      "ann_prototype_classify" -> 2.970, // normalized 2.60 -> watched
      "rel_part_supplier_counts" -> 1.946, // normalized 1.70 -> under
      "q1_agg" -> 1.144, // at the median -> under
      "rel_salted_agg" -> 15.4) // named in unescaped -> excluded
    assert(BenchPriors.watchCells(ratios, 1.1445,
      Set("rel_salted_agg")) === Seq("ann_prototype_classify"))
    // ADVICE r16: a cell that TRIPPED the escape but recovered inside
    // the 3.0 factor is in none of the escape arrays — its `+stormN`
    // mode goes only to stderr — so when it still sits above the watch
    // threshold it MUST be watched, not silently excluded (the old
    // escapeTripped predicate re-opened the r15 gap for exactly this
    // shape: e.g. an escape landing at 2.9x prior, normalized >2).
    assert(BenchPriors.watchCells(
      Map("tripped_escaped" -> 2.9, "steady" -> 1.0), 1.0,
      Set.empty[String]) === Seq("tripped_escaped"))
    // worst-first so the compact line's 8-name cap keeps the worst;
    // ties broken by name for determinism
    assert(BenchPriors.watchCells(
      Map("a" -> 3.0, "b" -> 4.0, "c" -> 2.5, "d" -> 1.0), 1.0,
      Set.empty[String]) === Seq("b", "a", "c"))
    assert(BenchPriors.watchCells(Map("z" -> 3.0, "y" -> 3.0), 1.0,
      Set.empty[String]) === Seq("y", "z"))
    // no median (prior-less sweep): empty, never a divide-by-zero
    assert(BenchPriors.watchCells(Map("a" -> 9.0), 0.0,
      Set.empty[String]).isEmpty)
  }

  test("load() warns when the file exists but yields zero priors") {
    val tmp = java.nio.file.Files.createTempFile("graft-prior", ".json")
    try {
      java.nio.file.Files.writeString(tmp, """{"metric":"total"}""")
      var warned = List.empty[String]
      val p = BenchPriors.load(tmp.toString, w => warned ::= w)
      assert(p.isEmpty)
      assert(warned.exists(_.contains("zero priors")),
        "existing-but-unparseable prior file must warn, not silently " +
          "disable the storm escape")
      // absent file: no warning (first round has no prior by design)
      warned = Nil
      assert(BenchPriors.load(tmp.toString + ".absent", w => warned ::= w).isEmpty)
      assert(warned.isEmpty)
    } finally java.nio.file.Files.delete(tmp)
  }
}
