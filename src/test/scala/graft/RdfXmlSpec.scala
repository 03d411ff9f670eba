package graft

import graft.store.{RdfXml, TripleStore}

/** RDF/XML parser: every supported construct against hand-computed
  * triple sets, the W3C-spec corner rules (li numbering, lang reset,
  * xml:base, reification), error rejection, and the distributed loader's
  * per-file blank scoping.
  */
class RdfXmlSpec extends SparkSpec {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private def p(xml: String): Set[(String, String, String)] =
    RdfXml.parse(xml, "T").toSet

  "RdfXml.parse" should "handle Description, literals, resources, datatypes" in {
    p("""<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="http://ex.org/a">
        |    <ex:name>Alice</ex:name>
        |    <ex:knows rdf:resource="http://ex.org/b"/>
        |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#int">42</ex:age>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin) shouldBe Set(
      ("http://ex.org/a", "http://ex.org/name", "\"Alice\""),
      ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
      ("http://ex.org/a", "http://ex.org/age",
        "\"42\"^^<http://www.w3.org/2001/XMLSchema#int>"))
  }

  it should "emit rdf:type for typed node elements and type attrs" in {
    p("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <ex:Person rdf:about="http://ex.org/a"/>
        |  <rdf:Description rdf:about="http://ex.org/b" rdf:type="http://ex.org/Dog"/>
        |</rdf:RDF>""".stripMargin) shouldBe Set(
      ("http://ex.org/a", RDF + "type", "http://ex.org/Person"),
      ("http://ex.org/b", RDF + "type", "http://ex.org/Dog"))
  }

  it should "apply property attributes with the in-scope language" in {
    p("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/" xml:lang="de">
        |  <rdf:Description rdf:about="http://ex.org/a" ex:name="Hund">
        |    <ex:word xml:lang="">plain</ex:word>
        |    <ex:tagged>Wort</ex:tagged>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin) shouldBe Set(
      ("http://ex.org/a", "http://ex.org/name", "\"Hund\"@de"),
      // xml:lang="" RESETS the language
      ("http://ex.org/a", "http://ex.org/word", "\"plain\""),
      ("http://ex.org/a", "http://ex.org/tagged", "\"Wort\"@de"))
  }

  it should "resolve rdf:ID and relative rdf:about against xml:base" in {
    p("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/" xml:base="http://base.org/doc">
        |  <rdf:Description rdf:ID="frag">
        |    <ex:next rdf:resource="other"/>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin) shouldBe Set(
      ("http://base.org/doc#frag", "http://ex.org/next", "http://base.org/other"))
  }

  it should "nest node elements and scope blank nodes deterministically" in {
    val got = p(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="http://ex.org/a">
        |    <ex:knows>
        |      <ex:Person>
        |        <ex:name>Bob</ex:name>
        |      </ex:Person>
        |    </ex:knows>
        |    <ex:ref rdf:nodeID="z"/>
        |  </rdf:Description>
        |  <rdf:Description rdf:nodeID="z"><ex:name>Zed</ex:name></rdf:Description>
        |</rdf:RDF>""".stripMargin)
    got should contain(("http://ex.org/a", "http://ex.org/ref", "_:T:z"))
    got should contain(("_:T:z", "http://ex.org/name", "\"Zed\""))
    val anon = got.collect {
      case ("http://ex.org/a", "http://ex.org/knows", o) => o
    }
    anon should have size 1
    anon.head should startWith("_:T:gen")
    got should contain((anon.head, RDF + "type", "http://ex.org/Person"))
    got should contain((anon.head, "http://ex.org/name", "\"Bob\""))
  }

  it should "number rdf:li densely even mixed with named properties" in {
    p("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="http://ex.org/bag">
        |    <rdf:li>one</rdf:li>
        |    <ex:other>x</ex:other>
        |    <rdf:li>two</rdf:li>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin) shouldBe Set(
      ("http://ex.org/bag", RDF + "_1", "\"one\""),
      ("http://ex.org/bag", "http://ex.org/other", "\"x\""),
      ("http://ex.org/bag", RDF + "_2", "\"two\""))
  }

  it should "expand parseType Resource, Collection and Literal" in {
    val got = p(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="http://ex.org/a">
        |    <ex:addr rdf:parseType="Resource">
        |      <ex:city>Bern</ex:city>
        |    </ex:addr>
        |    <ex:list rdf:parseType="Collection">
        |      <rdf:Description rdf:about="http://ex.org/i1"/>
        |      <rdf:Description rdf:about="http://ex.org/i2"/>
        |    </ex:list>
        |    <ex:none rdf:parseType="Collection"/>
        |    <ex:xml rdf:parseType="Literal">a <ex:b attr="v">c</ex:b> d</ex:xml>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin)
    // Resource: one blank with the nested property
    val addr = got.collect { case ("http://ex.org/a", "http://ex.org/addr", o) => o }
    addr should have size 1
    got should contain((addr.head, "http://ex.org/city", "\"Bern\""))
    // Collection: first/rest chain ending in nil; empty list IS nil
    val head = got.collect { case ("http://ex.org/a", "http://ex.org/list", o) => o }.head
    got should contain((head, RDF + "first", "http://ex.org/i1"))
    val rest = got.collect { case (s, p2, o) if s == head && p2 == RDF + "rest" => o }.head
    got should contain((rest, RDF + "first", "http://ex.org/i2"))
    got should contain((rest, RDF + "rest", RDF + "nil"))
    got should contain(("http://ex.org/a", "http://ex.org/none", RDF + "nil"))
    // Literal: inner XML captured as rdf:XMLLiteral
    got should contain(("http://ex.org/a", "http://ex.org/xml",
      "\"a <ex:b attr=\\\"v\\\">c</ex:b> d\"^^<" + RDF + "XMLLiteral>"))
  }

  it should "reify statements under rdf:ID on a property element" in {
    val got = p(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/" xml:base="http://b.org/d">
        |  <rdf:Description rdf:about="http://ex.org/a">
        |    <ex:says rdf:ID="st1">hi</ex:says>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin)
    got shouldBe Set(
      ("http://ex.org/a", "http://ex.org/says", "\"hi\""),
      ("http://b.org/d#st1", RDF + "type", RDF + "Statement"),
      ("http://b.org/d#st1", RDF + "subject", "http://ex.org/a"),
      ("http://b.org/d#st1", RDF + "predicate", "http://ex.org/says"),
      ("http://b.org/d#st1", RDF + "object", "\"hi\""))
  }

  it should "accept a rootless node element and empty literals" in {
    p("""<ex:Thing xmlns:ex="http://ex.org/" rdf:about="http://ex.org/t"
        |  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |  <ex:note></ex:note>
        |</ex:Thing>""".stripMargin) shouldBe Set(
      ("http://ex.org/t", RDF + "type", "http://ex.org/Thing"),
      ("http://ex.org/t", "http://ex.org/note", "\"\""))
  }

  it should "reject mixed content, unknown parseType, and malformed XML" in {
    val rdfNs = "xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\""
    an[RdfXml.ParseException] should be thrownBy p(
      s"""<rdf:RDF $rdfNs xmlns:ex="http://ex.org/">
         |  <rdf:Description rdf:about="http://ex.org/a">
         |    <ex:bad>text <ex:Thing/> tail</ex:bad>
         |  </rdf:Description>
         |</rdf:RDF>""".stripMargin)
    an[RdfXml.ParseException] should be thrownBy p(
      s"""<rdf:RDF $rdfNs xmlns:ex="http://ex.org/">
         |  <rdf:Description><ex:x rdf:parseType="Other">z</ex:x></rdf:Description>
         |</rdf:RDF>""".stripMargin)
    an[RdfXml.ParseException] should be thrownBy p("<rdf:RDF <unclosed")
  }

  "Results.toRdfXml" should "round-trip ground graphs through RdfXml.parse" in {
    import spark.implicits._
    val g = Seq(
      ("http://ex.org/a", "http://ex.org/name", "\"Li \\\"q\\\" ne\\nx\""),
      ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
      ("http://ex.org/a", "http://ex.org/age",
        "\"42\"^^<http://www.w3.org/2001/XMLSchema#int>"),
      ("http://ex.org/b", "http://ex.org/tag", "\"wort\"@de"),
      ("http://ex.org/b", "http://ex.org/esc", "\"a<b&c>d\"")
    )
    val doc = graft.sparql.Results.toRdfXml(g.toDF("s", "p", "o"))
    RdfXml.parse(doc, "Z").toSet shouldBe g.toSet
  }

  it should "round-trip blank nodes up to relabeling" in {
    import spark.implicits._
    val g = Seq(
      ("_:f:x", "http://ex.org/name", "\"anon\""),
      ("http://ex.org/a", "http://ex.org/ref", "_:f:x"))
    val doc = graft.sparql.Results.toRdfXml(g.toDF("s", "p", "o"))
    val back = RdfXml.parse(doc, "Z")
    back should have size 2
    val b = back.collect { case (s, "http://ex.org/name", "\"anon\"") => s }
    b should have size 1
    b.head should startWith("_:Z:")
    back should contain(("http://ex.org/a", "http://ex.org/ref", b.head))
  }

  it should "reject predicates with no QName split" in {
    import spark.implicits._
    val g = Seq(("http://ex.org/a", "name", "\"x\"")).toDF("s", "p", "o")
    an[IllegalArgumentException] should be thrownBy
      graft.sparql.Results.toRdfXml(g)
  }

  "TripleStore.parseRdfXml" should "scope blanks per file" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-rdfxml-spec")
    val doc =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <ex:Thing><ex:name>anon</ex:name></ex:Thing>
        |</rdf:RDF>""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("f1.rdf"), doc)
    java.nio.file.Files.writeString(dir.resolve("f2.rdf"), doc)
    val rows = TripleStore.parseRdfXml(spark, dir.toString + "/*.rdf").collect()
    rows should have length 4
    // two files, one anonymous node each — scopes must differ
    val subjects = rows.map(_.getString(0)).distinct
    subjects should have length 2
    subjects.foreach(_ should startWith("_:"))
  }
}
