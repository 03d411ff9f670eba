package graft

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.sparql.Sparql
import graft.store.{GraftStore, TripleStore}

/** LUBM at TEN universities by skolem-offset cloning: University0's
  * 318k triples replicate into ten disjoint namespaces
  * (`University0.edu` → `University0.cK.edu` for k ≥ 1, applied
  * uniformly to IRIs AND literals, so each clone is an exact
  * isomorphic copy), and every expected answer DERIVES from the clone
  * structure — no new goldens. The clone namespace is deliberately
  * FRESH rather than `UniversityK.edu`: LUBM data cross-references
  * external universities (a student's `undergraduateDegreeFrom` may
  * point at the dangling `University1.edu`), so renaming clone 1 onto
  * that URI would capture every clone's external references and
  * manufacture q2 triangles that exist at no university count.
  *
  *   - queries anchored on a University0/Department0 constant (1, 3,
  *     4, 5, 7, 8, 10, 11, 12, 13) must return EXACTLY the 1-university
  *     golden rows (the clones are namespace-disjoint, so nothing new
  *     may match);
  *   - unanchored queries (2, 6, 9, 14) must return exactly the union
  *     of the golden rows under each clone's substitution — 10× the
  *     rows, per-clone content identical up to renaming.
  *
  * This is the reference workload's scale story on the SAME plans: the
  * per-query BGP pipelines are untouched, only the store grows 10×.
  */
class Lubm10Spec extends SparkSpec {

  private val dataDir = LubmData.dir

  private def golden(queryId: Int): Seq[Seq[String]] = {
    val src = Source.fromFile(s"$dataDir/answers_query$queryId.txt")
    try {
      val lines = src.getLines().toList
      if (lines.headOption.contains("NO ANSWERS.")) Seq.empty
      else lines.tail.map(_.split("\t", -1).toSeq)
    } finally src.close()
  }

  private def bare(v: String): String =
    if (v != null && v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
      v.substring(1, v.length - 1)
    else v

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => bare(r.getString(i))).toSeq)

  private def cloneTerm(v: String, k: Int): String =
    if (k == 0) v
    else v.replace("University0.edu", s"University0.c$k.edu")

  /** University0 × 10 under the skolem-offset substitution (clone 0
    * stays verbatim so the constant-anchored goldens keep matching). */
  private lazy val store10 = {
    val t0 = TripleStore.parseNTriples(spark, s"$dataDir/university0_*.nt")
    def rep(c: org.apache.spark.sql.Column) =
      when(col("__k") === 0, c).otherwise(
        regexp_replace(c, lit("University0\\.edu"),
          concat(lit("University0.c"), col("__k"), lit(".edu"))))
    val cloned = t0.crossJoin(spark.range(10).toDF("__k"))
      .select(rep(col("s")).as("s"), col("p"), rep(col("o")).as("o"))
    GraftStore.ingestTriples(spark, cloned)
  }

  // anchored on University0/Department0 constants: clone rows are
  // namespace-disjoint, so the 10x store must return the 1x goldens
  private val anchored = Seq(1, 3, 4, 5, 7, 8, 10, 11, 12, 13)
  // no per-university constant: each clone answers isomorphically
  private val unanchored = Seq(2, 6, 9, 14)

  "LUBM x10 clones" should "grow the store exactly 10x" in {
    assume(LubmData.available, s"LUBM fixtures absent (${LubmData.dir})")
    val one = TripleStore.parseNTriples(spark,
      s"$dataDir/university0_*.nt").count()
    store10.triples.count() shouldBe one * 10
  }

  anchored.foreach { qid =>
    it should s"answer anchored query $qid with the unchanged goldens" in {
      assume(LubmData.available, s"LUBM fixtures absent (${LubmData.dir})")
      val got = rowsOf(Sparql.execute(spark, store10.triples,
        LubmQueries.queries(qid - 1), store10.stats))
      got.sortBy(_.mkString("\t")) shouldBe
        golden(qid).sortBy(_.mkString("\t"))
    }
  }

  unanchored.foreach { qid =>
    it should s"answer unanchored query $qid with all ten clones' rows" in {
      assume(LubmData.available, s"LUBM fixtures absent (${LubmData.dir})")
      val expected = (0 until 10).flatMap(k =>
        golden(qid).map(_.map(cloneTerm(_, k))))
      val got = rowsOf(Sparql.execute(spark, store10.triples,
        LubmQueries.queries(qid - 1), store10.stats))
      got.sortBy(_.mkString("\t")) shouldBe
        expected.sortBy(_.mkString("\t"))
    }
  }

  it should "answer unanchored query 2 identically on the encoded store" in {
    assume(LubmData.available, s"LUBM fixtures absent (${LubmData.dir})")
    val expected = (0 until 10).flatMap(k =>
      golden(2).map(_.map(cloneTerm(_, k))))
    val got = rowsOf(Sparql.executeEncoded(spark, store10,
      LubmQueries.queries(1)))
    got.sortBy(_.mkString("\t")) shouldBe
      expected.sortBy(_.mkString("\t"))
  }
}
