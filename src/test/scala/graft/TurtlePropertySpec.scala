package graft

import graft.store.Turtle
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the Turtle writer↔parser pair: random graphs of
  * IRIs and literals (plain / lang-tagged / typed, with escape-worthy
  * characters) serialize via `Results.toTurtle` and must parse back to
  * the identical term set — pinning quoting, escaping, prefix
  * compression, and `;`/`,` grouping against each other across 100
  * seeded samples. Blank nodes round-trip too: the writer rewrites the
  * store's `scope:label` form to a colon-free BLANK_NODE_LABEL
  * (`Results.blankPn`) and the parser re-skolemizes under the new
  * scope, so the expected term set maps blanks through the same two
  * deterministic steps.
  */
class TurtlePropertySpec extends SparkSpec {
  import spark.implicits._

  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  private val iriGen: Gen[String] = Gen.frequency(
    3 -> Gen.chooseNum(0, 9).map(i => s"http://ex.org/n$i"),
    2 -> Gen.chooseNum(0, 5).map(i => s"urn:thing:$i"),
    1 -> Gen.chooseNum(0, 3).map(i => s"http://other.net/x$i"))

  private val lexGen: Gen[String] = Gen.oneOf(
    "plain", "with space", "tab\there", "line\nbreak", "quote\"inside",
    "back\\slash", "émoji😀", "mixed \"q\" and \\ and\tall", "")

  private def escape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c => c.toString
  }

  private val literalGen: Gen[String] = for {
    lex <- lexGen
    form <- Gen.chooseNum(0, 2)
    tag <- Gen.oneOf("en", "en-GB", "de")
    dt <- Gen.oneOf(XSD + "integer", XSD + "byte", "http://ex.org/dt")
  } yield form match {
    case 0 => "\"" + escape(lex) + "\""
    case 1 => "\"" + escape(lex) + "\"@" + tag
    case _ => "\"" + escape(lex) + "\"^^<" + dt + ">"
  }

  // store-form blank labels: scope:label with '_'/'.'/':' stressing the
  // writer's PN escaping
  private val blankGen: Gen[String] = Gen.oneOf(
    "_:f00d:b1", "_:f00d:b_2", "_:f00d:gen3", "_:f00d:x.y", "_:f00d:a-b")

  private val tripleGen: Gen[(String, String, String)] = for {
    s <- Gen.frequency(4 -> iriGen, 1 -> blankGen)
    p <- iriGen
    o <- Gen.frequency(2 -> iriGen, 3 -> literalGen, 1 -> blankGen)
  } yield (s, p, o)

  private val graphGen: Gen[List[(String, String, String)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, tripleGen))

  "toTurtle then Turtle.parse" should "round-trip 100 random graphs exactly" in {
    val prefixes = Map("ex" -> "http://ex.org/", "xsd" -> XSD)
    (1 to 100).foreach { i =>
      val rows = graphGen(Gen.Parameters.default, Seed(i.toLong * 7919)).get
      val ttl = graft.sparql.Results.toTurtle(
        rows.toDF("s", "p", "o"), prefixes)
      val back = Turtle.parse(ttl, s"rt$i").toSet
      def expect(t: String): String =
        if (t.startsWith("_:"))
          s"_:rt$i:" + graft.sparql.Results.blankPn(t.substring(2))
        else t
      val want = rows.map { case (s, p, o) => (expect(s), p, expect(o)) }.toSet
      withClue(s"seed $i, turtle:\n$ttl\n") {
        back shouldBe want
      }
    }
  }
}
