package graft

import org.scalatest.funsuite.AnyFunSuite

/** Self-verifying documentation counts (VERDICT r8 item 7): README and
  * CLAUDE.md quote the query-suite size as a literal, which drifted in
  * past rounds as the suite grew. This spec makes the drift a test
  * failure: every `N queries` / `Nx OK` literal in the docs must equal
  * `SparkEntry.queries.size`, and the oracle map must stay total. */
class DocCountSpec extends AnyFunSuite {
  private def read(p: String): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    catch { case _: Exception => "" }

  test("doc query-count literals match SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    for (doc <- Seq("README.md", "CLAUDE.md")) {
      val txt = read(doc)
      val hits =
        """(\d+) queries""".r.findAllMatchIn(txt).map(m =>
          (m.group(0), m.group(1).toInt)) ++
        """(\d+)x OK""".r.findAllMatchIn(txt).map(m =>
          (m.group(0), m.group(1).toInt))
      for ((literal, v) <- hits)
        assert(v === n,
          s"$doc says '$literal' but SparkEntry.queries has $n entries " +
            "- update the doc (this spec is the drift guard)")
    }
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q) === Set.empty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
