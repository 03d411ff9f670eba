package graft

import graft.bgp._

/** Mirrors the reference's engine-level BGP tests
  * (core/src/test/scala/com/graphula/GraphulaSpec.scala): 3-pattern chain,
  * star, cross product, plus fail-fast and existence-check cases. The
  * fixture graph is the reference's `(1,2,3)(3,4,5)(3,4,6)(5,2,5)(6,2,5)`
  * rendered as strings.
  */
class BgpSpec extends SparkSpec {
  import spark.implicits._

  lazy val triples = Seq(
    ("1", "2", "3"), ("3", "4", "5"), ("3", "4", "6"),
    ("5", "2", "5"), ("6", "2", "5")
  ).toDF("s", "p", "o")

  def run(ps: TriplePattern*): Set[Seq[String]] =
    Bgp.compile(spark, triples, ps).collect()
      .map(r => (0 until r.length).map(r.getString)).toSet

  "Bgp.compile" should "answer the reference's 3-pattern chain" in {
    // { ?a 2 ?b . ?b 4 ?c . ?c 2 5 } -> {(1,3,5),(1,3,6)}
    run(
      TriplePattern(V("a"), C("2"), V("b")),
      TriplePattern(V("b"), C("4"), V("c")),
      TriplePattern(V("c"), C("2"), C("5"))
    ) shouldBe Set(Seq("1", "3", "5"), Seq("1", "3", "6"))
  }

  it should "answer a star query" in {
    // { 3 4 ?x } -> {5, 6}
    run(TriplePattern(C("3"), C("4"), V("x"))) shouldBe Set(Seq("5"), Seq("6"))
  }

  it should "produce cross products for disconnected patterns" in {
    run(
      TriplePattern(C("1"), C("2"), V("x")),
      TriplePattern(V("y"), C("4"), C("5"))
    ) shouldBe Set(Seq("3", "3"))
  }

  it should "return empty on a failing existence check" in {
    run(
      TriplePattern(V("a"), C("2"), V("b")),
      TriplePattern(C("1"), C("99"), C("99"))
    ) shouldBe Set.empty
  }

  it should "keep rows through a passing existence check" in {
    run(
      TriplePattern(C("3"), C("4"), V("x")),
      TriplePattern(C("1"), C("2"), C("3"))
    ) shouldBe Set(Seq("5"), Seq("6"))
  }

  it should "handle all-vars-bound semi-join patterns" in {
    // { ?a 2 ?b . ?b 4 ?c . ?a 2 ?c }: needs (a,c) also linked by p=2.
    // a=1,b=3,c in {5,6}: (1,2,5)? no. (1,2,6)? no. -> empty
    run(
      TriplePattern(V("a"), C("2"), V("b")),
      TriplePattern(V("b"), C("4"), V("c")),
      TriplePattern(V("a"), C("2"), V("c"))
    ) shouldBe Set.empty
  }

  it should "handle repeated variables inside one pattern" in {
    // { ?x 2 ?x } -> s == o with p=2 -> (5,2,5)
    run(TriplePattern(V("x"), C("2"), V("x"))) shouldBe Set(Seq("5"))
  }

  it should "fail fast on predicates absent from stats" in {
    val stats = Map("2" -> PredStats(3, 3, 2), "4" -> PredStats(2, 1, 2))
    val df = Bgp.compile(spark, triples,
      Seq(TriplePattern(V("a"), C("nope"), V("b"))), stats)
    df.count() shouldBe 0
  }

  "Bgp.count" should "count without enumeration" in {
    Bgp.count(spark, triples, Seq(TriplePattern(V("s"), C("2"), V("o")))) shouldBe 3
  }

  it should "answer single-pattern counts from statistics with no job" in {
    val stats = Map("2" -> PredStats(3, 3, 2), "4" -> PredStats(2, 1, 2))
    // stats shortcut (reference Graphula.scala:388-390): value comes from
    // the stats relation, matching the enumerated count
    Bgp.count(spark, triples, Seq(TriplePattern(V("s"), C("2"), V("o"))), stats) shouldBe 3
    Bgp.count(spark, triples, Seq(TriplePattern(V("s"), C("4"), V("o"))), stats) shouldBe 2
    Bgp.count(spark, triples, Seq(TriplePattern(V("s"), C("nope"), V("o"))), stats) shouldBe 0
    // repeated variable disables the shortcut (s == o constrains rows)
    Bgp.count(spark, triples, Seq(TriplePattern(V("x"), C("2"), V("x"))), stats) shouldBe 1
  }

  "Bgp.order" should "place low-cardinality connected patterns first" in {
    val stats = Map(
      "common" -> PredStats(1000000, 1000, 1000),
      "rare" -> PredStats(10, 10, 2))
    val ordered = Bgp.order(Seq(
      TriplePattern(V("a"), C("common"), V("b")),
      TriplePattern(V("b"), C("rare"), C("x"))
    ), stats, 1000010)
    ordered.head.p shouldBe C("rare")
  }
}
