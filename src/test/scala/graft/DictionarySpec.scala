package graft

import graft.dict.Dictionary
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Mirrors the reference's dictionary tests
  * (core/src/test/scala/com/graphula/dictionary/DictionarySpec.scala):
  * round-trip over arbitrary strings, and collision handling forced with a
  * deliberately terrible hash (reference: hash % 10 "terribleHasher").
  */
class DictionarySpec extends SparkSpec {

  "Dictionary.build" should "assign unique ids and round-trip encode/decode" in {
    import spark.implicits._
    val terms = Seq("a", "b", "c", "hello world", "", "ünïcødé", "42", "-7")
    val dict = Dictionary.build(terms.toDF("t")).cache()
    dict.count() shouldBe terms.distinct.size
    dict.select("id").distinct().count() shouldBe terms.distinct.size

    val df = Seq(("a", "b"), ("c", "hello world")).toDF("x", "y")
    val enc = Dictionary.encode(Dictionary.encode(df, dict, "x"), dict, "y")
    enc.schema("x").dataType.typeName shouldBe "long"
    val dec = Dictionary.decode(Dictionary.decode(enc, dict, "x"), dict, "y")
    dec.select("x", "y").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet shouldBe Set(("a", "b"), ("c", "hello world"))
  }

  it should "repair forced collisions deterministically (terribleHasher)" in {
    import spark.implicits._
    val terms = (1 to 200).map(i => s"term$i")
    // hash mod 10 -> heavy collisions, like the reference's terribleHasher
    val terrible = (c: org.apache.spark.sql.Column) =>
      pmod(xxhash64(c), lit(10L))
    val d1 = Dictionary.build(terms.toDF("t"), terrible).cache()
    d1.count() shouldBe 200
    d1.select("id").distinct().count() shouldBe 200
    // deterministic: a second build yields identical ids
    val d2 = Dictionary.build(terms.toDF("t"), terrible)
    d1.except(d2).count() shouldBe 0
    d2.except(d1).count() shouldBe 0
  }

  it should "round-trip arbitrary string lists (property)" in {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.alphaNumStr)
    (1 to 5).foreach { i =>
      val ss = gen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val distinct = ss.distinct
      if (distinct.nonEmpty) {
        val dict = Dictionary.build(distinct.toDF("t"))
        val got = dict.select("term").as[String].collect().toSet
        got shouldBe distinct.toSet
        dict.select("id").distinct().count() shouldBe distinct.size
      }
    }
  }

  "Dictionary.lookup" should "return ids for present terms only" in {
    import spark.implicits._
    val dict = Dictionary.build(Seq("x", "y").toDF("t"))
    val m = Dictionary.lookup(dict, Seq("x", "zzz"))
    m.keySet shouldBe Set("x")
  }

  "Dictionary.termHashLocal" should "agree bit-for-bit with the termHash expression" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the driver-side hash must be THE id function — any drift would
    // silently corrupt the certified-store fast paths that mix locally
    // computed and expression-encoded ids
    val terms = Seq("", "x", "region:0", "\"lit\"@en", "nation:12",
      "_:b1", "http://ex/α∂ß", "a" * 1000)
    val viaExpr = terms.toDF("t")
      .select(col("t"), Dictionary.termHash(col("t")).as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach(t => Dictionary.termHashLocal(t) shouldBe viaExpr(t))
  }
}
