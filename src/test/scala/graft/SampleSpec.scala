package graft

import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines: seeded uniform sample
  * and stratified sampleBy. No cross-engine oracle (PRNG is
  * engine-specific), so determinism and statistical bounds are pinned
  * here instead.
  */
class SampleSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sfDir)

  "sample" should "be deterministic for a fixed seed and near the target rate" in {
    val a = docs.sample(withReplacement = false, 0.3, seed = 42).count()
    val b = docs.sample(withReplacement = false, 0.3, seed = 42).count()
    a shouldBe b
    val n = docs.count().toDouble
    a.toDouble should (be >= n * 0.15 and be <= n * 0.45)
  }

  "sampleBy" should "hit per-stratum fractions within tolerance" in {
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.9, "fr" -> 0.5, "zh" -> 0.5)
    val sampled = docs.stat.sampleBy("lang", fractions, seed = 7L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (lang, f) =>
      val got = sampled.getOrElse(lang, 0L).toDouble
      val want = totals(lang) * f
      // binomial tolerance: 4 sigma
      val sigma = math.sqrt(totals(lang) * f * (1 - f))
      math.abs(got - want) should be <= (4 * sigma + 1)
    }
  }

  "stratified downsampling" should "rebalance a skewed language mix" in {
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCount = totals.values.min.toDouble
    val fractions = totals.map { case (l, n) => l -> math.min(1.0, minCount / n) }
    val balanced = docs.stat.sampleBy("lang", fractions, seed = 11L)
      .groupBy("lang").count().collect().map(_.getLong(1))
    // after rebalancing, the largest stratum is within 3x of the smallest
    balanced.max.toDouble / balanced.min should be < 3.0
  }
}
