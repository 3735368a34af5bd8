package graft

/** Parser for the per-query prior map Bench loads from the previous
  * round's committed artifact (`BENCH_LOCAL.json`).
  *
  * Extracted from `Bench.main` and made FORMAT-TOLERANT after the r12
  * break (VERDICT r12 "What's wrong"): the in-line parser matched the
  * literal `"queries":{` and a space-free `"name":1.23` pair regex —
  * i.e. exactly and only the format Bench's own `emit()` writes — but
  * the r12 re-pin commits rewrote `BENCH_LOCAL.json` in Python
  * `json.dumps` style (`"queries": {`, `"name": 1.23`). Result: zero
  * priors loaded, the adaptive storm escape silently disabled
  * (`max_storm_ratio: 0.0` in BENCH_r12), and 16 un-escaped deopt-storm
  * cells shipped in the driver artifact. This object parses BOTH
  * styles (any whitespace around `:` and `,`), and `BenchPriorsSpec`
  * round-trips the actual committed `BENCH_LOCAL.json` through this
  * exact code path so a future artifact-format drift fails `sbt test`
  * instead of silently de-arming the escape.
  *
  * Not a general JSON parser by design (zero-dependency, artifact
  * lines only): it scopes the scan to the `"queries"` object — the
  * artifact also carries a `"storm_ratio"` object keyed by the SAME
  * query names, which a whole-text scan would let clobber the seconds
  * — relying on the artifact shape (neither nested object contains
  * `{` or `}` in keys/values, so the first `}` after the opener closes
  * `"queries"`).
  */
object BenchPriors {
  private val Opener = """"queries"\s*:\s*\{""".r
  private val Pair = """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9][0-9.]*)""".r

  /** Per-query seconds from one artifact's `"queries"` object; empty
    * when the text carries none (absent file contents, malformed
    * artifact). Never throws on malformed numbers — a pair whose value
    * fails to parse is skipped, the rest survive. */
  def parse(txt: String): Map[String, Double] =
    Opener.findFirstMatchIn(txt) match {
      case None => Map.empty
      case Some(m) =>
        val close = txt.indexOf('}', m.end)
        if (close < 0) Map.empty
        else Pair.findAllMatchIn(txt.substring(m.end, close)).flatMap { p =>
          try Some(p.group(1) -> p.group(2).toDouble)
          catch { case _: NumberFormatException => None }
        }.toMap
    }

  /** A top-level numeric telemetry field's value from an artifact line
    * (`load_avg`, `sibling_jvms`, ...), for the prior-provenance fields
    * Bench re-emits (r14). First occurrence wins; same artifact-shape
    * reliance as [[parse]] — telemetry names never appear as query
    * keys, so an unscoped scan is safe for THESE names (it would not
    * be for arbitrary ones). None on absence or a malformed number. */
  def numField(txt: String, name: String): Option[Double] = {
    val re = ("\"" + java.util.regex.Pattern.quote(name) +
      """"\s*:\s*(-?[0-9][0-9.eE+-]*)""").r
    re.findFirstMatchIn(txt).flatMap { m =>
      try Some(m.group(1).toDouble)
      catch { case _: NumberFormatException => None }
    }
  }

  /** A top-level string field's value (`boot_id`, `sf`, ...); same
    * caveats as [[numField]]. */
  def strField(txt: String, name: String): Option[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(name) +
      """"\s*:\s*"([^"]*)"""").r
    re.findFirstMatchIn(txt).map(_.group(1))
  }

  /** Identifier-safe subset of an external string, for re-embedding a
    * PRIOR file's field into the artifact JSON Bench emits (ADVICE
    * r14): [[strField]] accepts any non-quote chars, so a hand-written
    * prior whose `boot_id` carries a backslash would otherwise yield
    * an invalid JSON escape that breaks the strict take-the-last-line
    * consumer for the whole sweep. Kernel boot UUIDs are `[-0-9a-f]`,
    * so legitimate values pass through unchanged. */
  def sanitizeId(s: String): String =
    s.filter(c => c.isLetterOrDigit || c == '-' || c == '_')

  /** Cliff-edge storm cells for the artifact's `watch` array (VERDICT
    * r15 item 2): r15 shipped `ann_prototype_classify` at 2.970× its
    * prior — 0.001 under the 3.0 escape trigger — with no marker, so a
    * consumer needed a prior-file join to find it. A watch cell is one
    * whose SUITE-MEDIAN-NORMALIZED ratio (ratio / median, the
    * compare_bench.py boot lens — a uniform host shift lifts every
    * ratio, so the raw value alone over-flags on a contended sweep)
    * exceeds `normFactor` and that carries no OTHER in-artifact marker:
    * `adjudicated` must hold exactly for cells already named in the
    * `unescaped`/`revisit_cleared`/`revisit_pending` arrays. Merely
    * TRIPPING the adaptive escape does not adjudicate (ADVICE r16) —
    * a cell that tripped and recovered under the escape factor records
    * its `+stormN` mode only on stderr, so excluding it here would
    * re-open the r15 gap for e.g. a 2.9×-prior escape landing. Ordered
    * worst-first so the compact line's 8-name cap keeps the cells most
    * worth reading; empty when no median exists (prior-less sweep). */
  def watchCells(ratios: collection.Map[String, Double], median: Double,
      adjudicated: String => Boolean, normFactor: Double = 2.0): Seq[String] =
    if (median <= 0) Seq.empty
    else ratios.iterator
      .filter { case (k, r) => r / median > normFactor && !adjudicated(k) }
      .toSeq.sortBy { case (k, r) => (-r, k) }.map(_._1)

  /** [[parse]] over a file; empty map when unreadable. `warn` receives
    * one diagnostic line when the file EXISTS but yields zero priors —
    * the silent-de-arm failure mode r12 shipped (ADVICE r12: warn
    * instead of silently using Map.empty). */
  def load(path: String, warn: String => Unit): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val p = parse(txt)
      if (p.isEmpty)
        warn(s"[bench] WARNING: prior file $path exists but yielded zero " +
          "priors (format drift?) - adaptive storm escape is DISABLED")
      p
    } catch { case _: Exception => Map.empty }
}
