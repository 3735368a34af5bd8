package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck property pinning [[BenchPriors]]' full input grammar —
  * the component whose format brittleness caused the r12 break (an
  * exact-format parser met a Python-styled re-pin and silently loaded
  * zero priors). `BenchPriorsSpec` pins three concrete styles and the
  * committed artifact; this property closes the space between them:
  * ANY whitespace layout around `:` / `,` / braces, any key order,
  * any mix of integer/decimal renderings, and a conflicting
  * `storm_ratio` object must round-trip the queries map exactly. */
object BenchPriorsProps extends Properties("BenchPriors") {

  private val qname: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const('_'))))
  } yield (h :: t).take(40).mkString

  // values in the shapes Bench/the re-pin tool actually write:
  // 4dp decimals and bare integers (regex accepts both)
  private val secs: Gen[(Double, String)] = Gen.oneOf(
    Gen.chooseNum(0, 9_000_000).map { i =>
      val v = i / 10000.0
      // Locale.ROOT: a comma decimal separator would silently miss the
      // pair regex and turn the property into a locale test
      (v, String.format(java.util.Locale.ROOT, "%.4f", Double.box(v)))
    },
    Gen.chooseNum(0, 900).map(i => (i.toDouble, i.toString)),
    // the -1 failed-query sentinel Bench emits into the queries map —
    // the Pair regex's '-?' branch was untested (ADVICE r13)
    Gen.const((-1.0, "-1.0000")))

  private val ws: Gen[String] =
    Gen.oneOf("", " ", "  ", "\n", "\n  ", "\t")

  private def obj(pairs: Seq[(String, String)]): Gen[String] =
    for {
      a <- ws; b <- ws; c <- ws; d <- ws
    } yield pairs
      .map { case (k, v) => s""""$k"$a:$b$v""" }
      .mkString("{" + c, "," + d, c + "}")

  private val queriesGen: Gen[Map[String, (Double, String)]] =
    Gen.mapOf(Gen.zip(qname, secs)).map(_.take(30))

  property("round-trips any whitespace/ordering/number-style layout, " +
      "scoped past a conflicting storm_ratio object") = Prop.forAll(
    queriesGen, ws, Gen.oneOf(true, false)) { (qs, w, ratioFirst) =>
    (qs.nonEmpty) ==> Prop.delay {
      val qPairs = qs.toSeq.map { case (k, (_, s)) => (k, s) }
      // storm_ratio keyed by the SAME names with different values —
      // the scan must stop at the queries object's first '}'
      val rPairs = qs.toSeq.map { case (k, _) => (k, "0.001") }
      val g = for {
        qo <- obj(qPairs)
        ro <- obj(rPairs)
      } yield {
        val head = s"""{"metric"$w:$w"total","value"$w:${w}1.0,"""
        val mid =
          if (ratioFirst) s""""storm_ratio"$w:$w$ro,"queries"$w:$w$qo"""
          else s""""queries"$w:$w$qo,"storm_ratio"$w:$w$ro"""
        head + mid + s""","sf"$w:$w"/x"}"""
      }
      Prop.forAllNoShrink(g) { txt =>
        val expect = qs.map { case (k, (v, _)) => k -> v }
        val got = BenchPriors.parse(txt)
        // ratioFirst puts storm_ratio's '{' before "queries": the
        // opener regex keys on the "queries" LABEL, so the scan still
        // lands on the right object either way
        Prop(got == expect) :| s"got=$got expect=$expect txt=$txt"
      }
    }
  }

  property("truncation inside the queries object yields empty, never " +
      "a throw or a partial-silent map with storm values") =
    Prop.forAll(queriesGen) { qs =>
      (qs.nonEmpty) ==> Prop.delay {
        val qPairs = qs.toSeq.map { case (k, (_, s)) => (k, s) }
        val full = qPairs.map { case (k, v) => s""""$k":$v""" }
          .mkString("""{"queries":{""", ",", "")
        BenchPriors.parse(full).isEmpty // no closing '}' -> empty
      }
    }
}
