package graft

import graft.sparql.Sparql

/** Named-graph (quad dataset) surface: GRAPH blocks, dataset clauses,
  * and default-graph scoping over one (s, p, o, g) relation — the SPARQL
  * 1.1 §13 semantics the reference lacks entirely (single-graph store,
  * named-graph Update targets error).
  */
class QuadsSpec extends SparkSpec {
  import spark.implicits._

  // default graph: the g-null rows; two named graphs
  lazy val quads = Seq(
    ("x", "type", "Root", null),
    ("x", "in", "g1", null),
    ("a", "p", "1", "g1"),
    ("a", "q", "2", "g1"),
    ("b", "p", "1", "g2"),
    ("a", "p", "9", "g2")
  ).toDF("s", "p", "o", "g")

  private def run(q: String): Set[Seq[String]] =
    Sparql.executeQuads(spark, quads, q).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.getString(i)): Seq[String]).toSet

  "executeQuads" should "confine a GRAPH block's patterns to one graph" in {
    // (?s :p 1 . ?s :q 2) co-occur only inside g1 — b/g2 must not leak in
    run("""PREFIX : <>
          |SELECT ?g ?s WHERE { GRAPH ?g { ?s :p "1" . ?s :q "2" } }""".stripMargin) shouldBe
      Set(Seq("g1", "a"))
  }

  it should "bind the graph variable across all matching graphs" in {
    run("""PREFIX : <>
          |SELECT ?g ?s WHERE { GRAPH ?g { ?s :p "1" } }""".stripMargin) shouldBe
      Set(Seq("g1", "a"), Seq("g2", "b"))
  }

  it should "scan a constant GRAPH target only" in {
    run("""PREFIX : <>
          |SELECT ?s ?o WHERE { GRAPH <g2> { ?s :p ?o } }""".stripMargin) shouldBe
      Set(Seq("b", "1"), Seq("a", "9"))
  }

  it should "match default-graph patterns against the g-null slice only" in {
    run("""PREFIX : <>
          |SELECT ?s WHERE { ?s :type "Root" }""".stripMargin) shouldBe
      Set(Seq("x"))
    // :p lives only in named graphs -> invisible to the default graph
    run("""PREFIX : <>
          |SELECT ?s WHERE { ?s :p "1" }""".stripMargin) shouldBe Set.empty
  }

  it should "join GRAPH-block bindings with outer patterns" in {
    // the default graph names g1; the GRAPH var joins against that value
    run("""PREFIX : <>
          |SELECT ?s WHERE { <x> :in ?g . GRAPH ?g { ?s :p "1" } }""".stripMargin) shouldBe
      Set(Seq("a"))
  }

  it should "merge FROM graphs into the default graph" in {
    run("""PREFIX : <>
          |SELECT ?s ?o FROM <g1> FROM <g2> WHERE { ?s :p ?o }""".stripMargin) shouldBe
      Set(Seq("a", "1"), Seq("b", "1"), Seq("a", "9"))
    // an explicit dataset EXCLUDES the original default graph
    run("""PREFIX : <>
          |SELECT ?s FROM <g1> WHERE { ?s :type "Root" }""".stripMargin) shouldBe
      Set.empty
  }

  it should "restrict GRAPH visibility to FROM NAMED" in {
    run("""PREFIX : <>
          |SELECT ?g ?s FROM NAMED <g2> WHERE { GRAPH ?g { ?s :p "1" } }""".stripMargin) shouldBe
      Set(Seq("g2", "b"))
    // FROM NAMED alone -> empty default graph
    run("""PREFIX : <>
          |SELECT ?s FROM NAMED <g1> WHERE { ?s :type "Root" }""".stripMargin) shouldBe
      Set.empty
  }

  it should "support FILTER and BIND inside GRAPH blocks" in {
    run("""PREFIX : <>
          |SELECT ?g ?k WHERE {
          |  GRAPH ?g { ?s :p ?o . FILTER(?o > 5) BIND(CONCAT(?s, "!") AS ?k) }
          |}""".stripMargin) shouldBe
      Set(Seq("g2", "a!"))
  }

  it should "aggregate per graph" in {
    val got = Sparql.executeQuads(spark, quads,
      """PREFIX : <>
        |SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
        |GROUP BY ?g ORDER BY ?g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    got shouldBe Seq(("g1", 2L), ("g2", 2L))
  }

  it should "handle repeated variables inside a quad pattern" in {
    val q2 = Seq(("a", "p", "a", "g1"), ("a", "p", "b", "g1"))
      .toDF("s", "p", "o", "g")
    Sparql.executeQuads(spark, q2,
      """PREFIX : <>
        |SELECT ?s WHERE { GRAPH ?g { ?s :p ?s } }""".stripMargin)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a")
  }
}
