package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The gate-audit invariant, as a real spec: every `SparkEntry.queries`
  * gate has a DuckDB oracle and vice versa, so the driver's correctness
  * harness never downgrades a gate to a weaker rows-only check. The
  * compare sorts columns by name and hashes values, so a gate without an
  * oracle (or an oracle without a gate) is a silent coverage hole — this
  * spec turns drift into a test failure. (No SparkSession needed: both
  * maps are plain data.)
  */
class GateAuditSpec extends AnyFlatSpec with Matchers {

  "SparkEntry" should "back every gate query with an oracle and vice versa" in {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    withClue(s"gates without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without gate: ${(o -- q).toSeq.sorted}\n") {
      q shouldBe o
    }
  }

  it should "have a non-empty oracle SQL string for every gate" in {
    val blankOracles = SparkEntry.oracleSql.collect {
      case (k, sql) if sql == null || sql.trim.isEmpty => k
    }.toSeq.sorted
    blankOracles shouldBe Seq.empty[String]
  }
}
