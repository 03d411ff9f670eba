package graft

import graft.store.{JsonLd, TripleStore}

/** JSON-LD core-subset parser: contexts (terms, prefixes, @vocab, @id
  * coercion), node/value objects, lists, scalar typing, blank scoping,
  * and the documented rejects.
  */
class JsonLdSpec extends SparkSpec {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  private def p(doc: String): Set[(String, String, String)] =
    JsonLd.parse(doc, "T").toSet

  "JsonLd.parse" should "expand terms, prefixes and @vocab" in {
    p("""{"@context": {"@vocab": "http://v.org/", "ex": "http://ex.org/",
        |              "friend": "http://ex.org/knows"},
        | "@id": "http://ex.org/a", "@type": "Person",
        | "name": "Alice", "friend": {"@id": "ex:b"}, "ex:age": 42}
        |""".stripMargin) shouldBe Set(
      ("http://ex.org/a", RDF + "type", "http://v.org/Person"),
      ("http://ex.org/a", "http://v.org/name", "\"Alice\""),
      ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
      ("http://ex.org/a", "http://ex.org/age",
        "\"42\"^^<" + XSD + "integer>"))
  }

  it should "type scalars per the JSON-LD value rules" in {
    p("""{"@context": {"@vocab": "v:"}, "@id": "x:a",
        | "i": 7, "d": 2.5, "b": true, "s": "str"}""".stripMargin) shouldBe Set(
      ("x:a", "v:i", "\"7\"^^<" + XSD + "integer>"),
      ("x:a", "v:d", "\"2.5\"^^<" + XSD + "double>"),
      ("x:a", "v:b", "\"true\"^^<" + XSD + "boolean>"),
      ("x:a", "v:s", "\"str\""))
  }

  it should "handle value objects, arrays, @id coercion and datatype coercion" in {
    p("""{"@context": {"@vocab": "v:",
        |   "link": {"@id": "v:link", "@type": "@id"},
        |   "stamp": {"@id": "v:stamp", "@type": "v:dt"}},
        | "@id": "x:a",
        | "lbl": [{"@value": "Wort", "@language": "de"},
        |         {"@value": "P1D", "@type": "v:dur"}],
        | "link": ["x:b", "x:c"], "stamp": "2020"}""".stripMargin) shouldBe Set(
      ("x:a", "v:lbl", "\"Wort\"@de"),
      ("x:a", "v:lbl", "\"P1D\"^^<v:dur>"),
      ("x:a", "v:link", "x:b"),
      ("x:a", "v:link", "x:c"),
      ("x:a", "v:stamp", "\"2020\"^^<v:dt>"))
  }

  it should "nest node objects and build @list chains" in {
    val got = p(
      """{"@context": {"@vocab": "v:"}, "@id": "x:a",
        | "child": {"@type": "Kid", "name": "Bo"},
        | "seq": {"@list": ["one", "two"]},
        | "none": {"@list": []}}""".stripMargin)
    val kid = got.collect { case ("x:a", "v:child", o) => o }.head
    kid should startWith("_:T:gen")
    got should contain((kid, RDF + "type", "v:Kid"))
    got should contain((kid, "v:name", "\"Bo\""))
    val head = got.collect { case ("x:a", "v:seq", o) => o }.head
    got should contain((head, RDF + "first", "\"one\""))
    val rest = got.collect { case (s, p2, o) if s == head && p2 == RDF + "rest" => o }.head
    got should contain((rest, RDF + "first", "\"two\""))
    got should contain((rest, RDF + "rest", RDF + "nil"))
    got should contain(("x:a", "v:none", RDF + "nil"))
  }

  it should "keep explicit blank labels and a top-level @graph array" in {
    p("""{"@context": {"@vocab": "v:"},
        | "@graph": [
        |   {"@id": "_:x", "name": "anon"},
        |   {"@id": "x:a", "ref": {"@id": "_:x"}}
        | ]}""".stripMargin) shouldBe Set(
      ("_:T:x", "v:name", "\"anon\""),
      ("x:a", "v:ref", "_:T:x"))
  }

  it should "reject the documented out-of-subset constructs" in {
    an[JsonLd.ParseException] should be thrownBy
      p("""{"@context": "http://remote.org/ctx"}""")
    an[JsonLd.ParseException] should be thrownBy
      p("""{"@id": "x:a", "@index": "i", "p": "v"}""")
    // named-graph content on the TRIPLES entry points at parseQuads
    val e = the[JsonLd.ParseException] thrownBy
      p("""{"@id": "g:1", "@graph": [{"@id": "x:a", "p": "v"}]}""")
    e.getMessage should include("parseQuads")
    an[JsonLd.ParseException] should be thrownBy p("""{"unclosed": """)
  }

  it should "flip @reverse entries (object becomes subject)" in {
    p("""{"@context": {"@vocab": "v:"}, "@id": "x:a",
        | "@reverse": {"childOf": [{"@id": "x:b"}, "x:c"]}}""".stripMargin) shouldBe
      Set(("x:b", "v:childOf", "x:a"), ("x:c", "v:childOf", "x:a"))
  }

  it should "skip null property values as entry removal" in {
    p("""{"@context": {"@vocab": "v:"}, "@id": "x:a",
        | "gone": null, "some": ["kept", null], "name": "A"}""".stripMargin) shouldBe
      Set(("x:a", "v:some", "\"kept\""), ("x:a", "v:name", "\"A\""))
  }

  it should "type whole-valued exponent and fraction numbers as xsd:double" in {
    p("""{"@context": {"@vocab": "v:"}, "@id": "x:a",
        | "e": 1e2, "f": 1.0, "i": 100, "v": {"@value": 2e1}}""".stripMargin) shouldBe
      Set(
        ("x:a", "v:e", "\"100.0\"^^<" + XSD + "double>"),
        ("x:a", "v:f", "\"1.0\"^^<" + XSD + "double>"),
        ("x:a", "v:i", "\"100\"^^<" + XSD + "integer>"),
        ("x:a", "v:v", "\"20.0\"^^<" + XSD + "double>"))
  }

  "JsonLd.parseQuads" should "land graph-object contents in the named graph" in {
    val got = JsonLd.parseQuads(
      """{"@context": {"@vocab": "v:"},
        |"@graph": [
        |  {"@id": "x:top", "kind": "meta"},
        |  {"@id": "g:1", "creator": "alice", "@graph": [
        |    {"@id": "x:a", "p": "in-g1",
        |     "q": {"@id": "x:nested", "r": "also-g1"}}]}
        |]}""".stripMargin, "T").toSet
    got shouldBe Set(
      // default graph: the top node AND the graph object's own property
      ("x:top", "v:kind", "\"meta\"", None),
      ("g:1", "v:creator", "\"alice\"", None),
      // named graph g:1: direct and NESTED node statements
      ("x:a", "v:p", "\"in-g1\"", Some("g:1")),
      ("x:a", "v:q", "x:nested", Some("g:1")),
      ("x:nested", "v:r", "\"also-g1\"", Some("g:1")))
  }

  "Results.toJsonLd" should "round-trip ground graphs through JsonLd.parse" in {
    import spark.implicits._
    val g = Seq(
      ("http://ex.org/a", RDF + "type", "http://ex.org/Person"),
      ("http://ex.org/a", "http://ex.org/name", "\"Li \\\"q\\\" ne\\nx\""),
      ("http://ex.org/a", "http://ex.org/age", "\"42\"^^<" + XSD + "integer>"),
      ("http://ex.org/a", "http://ex.org/ok", "\"true\"^^<" + XSD + "boolean>"),
      ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
      ("http://ex.org/b", "http://ex.org/tag", "\"wort\"@de"),
      ("http://ex.org/b", "http://ex.org/when", "\"2020\"^^<http://ex.org/dt>")
    )
    val doc = graft.sparql.Results.toJsonLd(g.toDF("s", "p", "o"),
      Map("ex" -> "http://ex.org/"))
    JsonLd.parse(doc, "Z").toSet shouldBe g.toSet
  }

  it should "round-trip blank nodes up to relabeling" in {
    import spark.implicits._
    val g = Seq(
      ("_:f:x", "http://ex.org/name", "\"anon\""),
      ("http://ex.org/a", "http://ex.org/ref", "_:f:x"))
    val doc = graft.sparql.Results.toJsonLd(g.toDF("s", "p", "o"))
    val back = JsonLd.parse(doc, "Z")
    back should have size 2
    val b = back.collect { case (s, "http://ex.org/name", "\"anon\"") => s }
    b should have size 1
    back should contain(("http://ex.org/a", "http://ex.org/ref", b.head))
  }

  "TripleStore.parseJsonLd" should "scope generated blanks per file" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonld-spec")
    val doc = """{"@context": {"@vocab": "v:"}, "name": "anon"}"""
    java.nio.file.Files.writeString(dir.resolve("f1.jsonld"), doc)
    java.nio.file.Files.writeString(dir.resolve("f2.jsonld"), doc)
    val rows = TripleStore.parseJsonLd(spark, dir.toString + "/*.jsonld").collect()
    rows should have length 2
    rows.map(_.getString(0)).distinct should have length 2
  }
}
