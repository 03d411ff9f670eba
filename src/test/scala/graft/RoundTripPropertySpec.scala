package graft

import graft.store.{JsonLd, RdfXml}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the RDF/XML and JSON-LD writer↔parser pairs — the
  * same 100-seeded-graphs discipline as TurtlePropertySpec: random
  * graphs of IRIs, blanks, and literals with escape-worthy characters
  * must survive toRdfXml∘parse and toJsonLd∘parse with blanks mapped
  * through the writers' deterministic relabeling.
  *
  * Deliberate generator constraints mirror real format limits: RDF/XML
  * predicates must admit an NCName local part (a digit-initial suffix
  * like `urn:thing:4` is UNSERIALIZABLE in RDF/XML by spec — the writer
  * rejects it, tested separately), and XML 1.0 cannot carry \b/\f
  * control characters in any form.
  */
class RoundTripPropertySpec extends SparkSpec {
  import spark.implicits._

  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  // letter-initial local parts only (the RDF/XML QName constraint)
  private val predGen: Gen[String] = Gen.frequency(
    3 -> Gen.chooseNum(0, 9).map(i => s"http://ex.org/n$i"),
    1 -> Gen.chooseNum(0, 3).map(i => s"http://other.net/x$i"))

  private val iriGen: Gen[String] = Gen.frequency(
    3 -> Gen.chooseNum(0, 9).map(i => s"http://ex.org/n$i"),
    2 -> Gen.chooseNum(0, 5).map(i => s"urn:thing:$i"))

  private val lexGen: Gen[String] = Gen.oneOf(
    "plain", "with space", "tab\there", "line\nbreak", "quote\"inside",
    "back\\slash", "émoji😀", "xml <&> specials", "mixed \"q\" \\ and\tall", "")

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

  private val blankGen: Gen[String] = Gen.oneOf(
    "_:f00d:b1", "_:f00d:b_2", "_:f00d:gen3", "_:f00d:x.y", "_:f00d:a-b")

  private val tripleGen: Gen[(String, String, String)] = for {
    s <- Gen.frequency(4 -> iriGen, 1 -> blankGen)
    p <- predGen
    o <- Gen.frequency(2 -> iriGen, 3 -> literalGen, 1 -> blankGen)
  } yield (s, p, o)

  private val graphGen: Gen[List[(String, String, String)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, tripleGen))

  private def sample(i: Int): List[(String, String, String)] =
    graphGen(Gen.Parameters.default, Seed(i.toLong * 6037)).get

  "toRdfXml then RdfXml.parse" should "round-trip 100 random graphs" in {
    (1 to 100).foreach { i =>
      val rows = sample(i)
      val doc = graft.sparql.Results.toRdfXml(
        rows.toDF("s", "p", "o"), Map("ex" -> "http://ex.org/"))
      val back = RdfXml.parse(doc, s"rt$i").toSet
      def expect(t: String): String =
        if (t.startsWith("_:"))
          s"_:rt$i:b" + graft.sparql.Results.blankPn(t.substring(2))
        else t
      val want = rows.map { case (s, p, o) => (expect(s), p, expect(o)) }.toSet
      withClue(s"seed $i, rdf/xml:\n$doc\n") {
        back shouldBe want
      }
    }
  }

  "toJsonLd then JsonLd.parse" should "round-trip 100 random graphs" in {
    (1 to 100).foreach { i =>
      val rows = sample(i)
      val doc = graft.sparql.Results.toJsonLd(
        rows.toDF("s", "p", "o"), Map("ex" -> "http://ex.org/"))
      val back = JsonLd.parse(doc, s"rt$i").toSet
      def expect(t: String): String =
        if (t.startsWith("_:"))
          s"_:rt$i:b" + graft.sparql.Results.blankPn(t.substring(2))
        else t
      val want = rows.map { case (s, p, o) => (expect(s), p, expect(o)) }.toSet
      withClue(s"seed $i, json-ld:\n$doc\n") {
        back shouldBe want
      }
    }
  }

  "toRdfXml" should "reject digit-initial predicate local parts" in {
    an[IllegalArgumentException] should be thrownBy
      graft.sparql.Results.toRdfXml(
        Seq(("http://ex.org/a", "urn:thing:4", "\"x\"")).toDF("s", "p", "o"))
  }
}
