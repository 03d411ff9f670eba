package graft

import graft.ops.ReasonOps
import graft.ops.ReasonOps.{Domain, Range, SubClassOf, SubPropertyOf}

/** RDFS materialization: exact closure on a hand-computed fixture
  * (sub-property chains, INHERITED domains, range typing, sub-class
  * expansion over derived types), cycle termination, idempotence, and
  * the TBox fail-fast cap.
  */
class ReasonSpec extends SparkSpec {
  import spark.implicits._

  private def tset(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  "ReasonOps.transitive" should "close chains and drop reflexive pairs" in {
    ReasonOps.transitive(Seq("a" -> "b", "b" -> "c", "c" -> "d")).toSet shouldBe
      Set("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
  }

  it should "terminate on cycles with every cross pair and no self pair" in {
    // a <-> b cycle plus an exit edge: each cycle member reaches the other
    // and the exit, but never itself
    ReasonOps.transitive(Seq("a" -> "b", "b" -> "a", "b" -> "c")).toSet shouldBe
      Set("a" -> "b", "a" -> "c", "b" -> "a", "b" -> "c")
  }

  "ReasonOps.rdfsClosure" should "derive the exact rho-df closure" in {
    // worksFor sp employedBy sp affiliated; employedBy has the domain, so
    // a base worksFor statement must pick it up through INHERITANCE;
    // Person sc Agent sc Entity two-level class chain; range types the
    // OBJECT and that derived type must itself sub-class-expand.
    val g = Seq(
      ("worksFor", SubPropertyOf, "employedBy"),
      ("employedBy", SubPropertyOf, "affiliated"),
      ("employedBy", Domain, "Person"),
      ("affiliated", Range, "Org"),
      ("Person", SubClassOf, "Agent"),
      ("Agent", SubClassOf, "Entity"),
      ("Org", SubClassOf, "Agent"),
      ("alice", "worksFor", "acme"),
      ("bob", "a", "Person")
    ).toDF("s", "p", "o")
    val got = tset(ReasonOps.rdfsClosure(g))
    val expected = Set(
      // base
      ("worksFor", SubPropertyOf, "employedBy"),
      ("employedBy", SubPropertyOf, "affiliated"),
      ("employedBy", Domain, "Person"),
      ("affiliated", Range, "Org"),
      ("Person", SubClassOf, "Agent"),
      ("Agent", SubClassOf, "Entity"),
      ("Org", SubClassOf, "Agent"),
      ("alice", "worksFor", "acme"),
      ("bob", "a", "Person"),
      // rdfs5: closed property hierarchy
      ("worksFor", SubPropertyOf, "affiliated"),
      // rdfs11: closed class hierarchy
      ("Person", SubClassOf, "Entity"),
      ("Org", SubClassOf, "Entity"),
      // rdfs7: property expansion of the one ABox edge
      ("alice", "employedBy", "acme"),
      ("alice", "affiliated", "acme"),
      // rdfs2 via inheritance: worksFor inherits employedBy's domain
      ("alice", "a", "Person"),
      // rdfs3 via inheritance: worksFor inherits affiliated's range
      ("acme", "a", "Org"),
      // rdfs9 over base AND derived types
      ("alice", "a", "Agent"), ("alice", "a", "Entity"),
      ("acme", "a", "Agent"), ("acme", "a", "Entity"),
      ("bob", "a", "Agent"), ("bob", "a", "Entity"))
    got shouldBe expected
  }

  it should "be idempotent" in {
    val g = Seq(
      ("p1", SubPropertyOf, "p2"),
      ("p2", Domain, "C"),
      ("C", SubClassOf, "D"),
      ("x", "p1", "y")
    ).toDF("s", "p", "o")
    val once = ReasonOps.rdfsClosure(g)
    tset(ReasonOps.rdfsClosure(once)) shouldBe tset(once)
  }

  it should "terminate on a class-hierarchy cycle" in {
    val g = Seq(
      ("A", SubClassOf, "B"),
      ("B", SubClassOf, "A"),
      ("x", "a", "A")
    ).toDF("s", "p", "o")
    val got = tset(ReasonOps.rdfsClosure(g))
    got should contain allOf (("x", "a", "A"), ("x", "a", "B"),
      ("A", SubClassOf, "B"), ("B", SubClassOf, "A"))
    // no reflexive hierarchy statements, no self-typing of classes
    got should not contain (("A", SubClassOf, "A"))
    got should not contain (("B", SubClassOf, "B"))
  }

  it should "fail fast on a non-schema-shaped TBox" in {
    val g = (1 to 100).map(i => (s"s$i", SubClassOf, s"o$i")).toDF("s", "p", "o")
    val e = intercept[IllegalArgumentException] {
      ReasonOps.rdfsClosure(g, tboxCap = 10)
    }
    e.getMessage should include("TBox")
  }
}
