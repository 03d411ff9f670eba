package graft

import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Chunking, redaction, and centroid operators on hand-built inputs with
  * known expected outputs.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  "chunks" should "produce overlapping fixed-size windows" in {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val rows = TextOps.chunks(docs, chunkSize = 4, overlap = 2)
      .orderBy("chunk_no")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
    // step 2: starts 0, 2, 4, 6
    rows shouldBe Seq(
      (0, "w1 w2 w3 w4", 4),
      (1, "w3 w4 w5 w6", 4),
      (2, "w5 w6 w7", 3),
      (3, "w7", 1))
  }

  it should "emit a single chunk for short documents" in {
    val docs = Seq((1L, "only three words")).toDF("doc_id", "text")
    TextOps.chunks(docs, chunkSize = 32, overlap = 8).count() shouldBe 1L
  }

  "redact" should "mask emails, urls and long digit runs" in {
    val docs = Seq(
      (1L, "contact me at bob@example.com or https://ex.org/x?id=1 ref 123456 ok 123")
    ).toDF("doc_id", "text")
    val r = docs.select(
      TextOps.redact(col("text")).as("red"),
      TextOps.redactionCount(col("text")).as("n")).head()
    r.getString(0) shouldBe "contact me at <EMAIL> or <URL> ref <NUM> ok 123"
    r.getInt(1) shouldBe 3 // short digit run not counted
  }

  "repetitionRatio" should "score degenerate repetition high and clean text zero" in {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 6 trigrams, 1 distinct
      (2L, "all words here are completely distinct today"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val m = docs.select(col("doc_id"), TextOps.repetitionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m(1L) shouldBe (1.0 - 1.0 / 6) +- 1e-6
    m(2L) shouldBe 0.0
    m(3L) shouldBe 0.0 // no trigram
  }

  "decontaminate" should "flag only docs overlapping the test set" in {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),   // test
      (10L, "one two three four five six seven eight completely different"),
      (11L, "nothing in common with anything held out at all here")
    ).toDF("doc_id", "text")
    val res = graft.ops.DedupOps.decontaminate(docs, col("doc_id") < 10, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res shouldBe Map(10L -> 1L) // shares exactly the one 8-gram "one..eight"
  }

  "decontaminateBloom" should "match the postings-join result exactly, even at crude fpp" in {
    // a deliberately terrible filter (fpp 0.5) floods the prune with
    // false positives — the exact verify join must still remove them
    // all, so both paths produce the identical relation
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),   // test
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // test
      (10L, "one two three four five six seven eight completely different"),
      (11L, "nothing in common with anything held out at all here"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta something else")
    ).toDF("doc_id", "text")
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = graft.ops.DedupOps
        .decontaminateBloom(docs, col("doc_id") < 10, n = 8, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = graft.ops.DedupOps
        .decontaminate(docs, col("doc_id") < 10, n = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      bloom shouldBe exact
      bloom shouldBe Map(10L -> 1L, 12L -> 1L)
    }
  }

  it should "probe with a codegen'd expression and never miss an inserted key" in {
    // no false negatives: every inserted hash must report might-contain
    val grams = Seq.tabulate(500)(i => s"gram token number $i").toDF("gram")
    val bf = grams.select(xxhash64(col("gram")).as("h"))
      .stat.bloomFilter("h", 500, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val hits = grams.where(call_function("graft_bloom_contains",
        lit(bos.toByteArray), xxhash64(col("gram"))))
    hits.count() shouldBe 500L
  }

  "decontaminateFuzzy" should "flag near-duplicates of test docs, not mere overlaps" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),   // test
      (10L, "the quick brown fox jumps over the lazy cat tonight"),  // near-dup
      (11L, "the quick start guide covers none of that material"),   // slight overlap
      (12L, "nothing in common with anything held out at all here")
    ).toDF("doc_id", "text")
    val res = graft.ops.DedupOps
      .decontaminateFuzzy(docs, col("doc_id") < 10, threshold = 0.4, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    res.map(_._1) shouldBe List(10L)          // only the near-dup is flagged
    res.head._2 shouldBe 1L
    res.head._3 should be >= 0.4
  }

  "dupSpans" should "count cross-document duplicated windows" in {
    val shared = "a b c d e f g h i j k l m" // 13 words = one 13-gram
    val docs = Seq(
      (1L, shared + " unique1 tail1"),
      (2L, shared + " unique2 tail2"),
      (3L, "totally different words that never repeat anywhere else in corpus one two three four"),
      (4L, "too short for any window")
    ).toDF("doc_id", "text")
    val res = graft.ops.DedupOps.dupSpans(docs, n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    res(1L)._2 shouldBe 1L // the shared window
    res(2L)._2 shouldBe 1L
    res(3L)._2 shouldBe 0L
    res.contains(4L) shouldBe false // sub-window docs form no spans
  }

  "removeDupSpans" should "excise non-first duplicated windows and rebuild" in {
    val shared = "a b c d e f g h i j k l m" // exactly one 13-gram
    val docs = Seq(
      (1L, shared + " tail one"),      // first occurrence -> untouched
      (2L, "head " + shared),          // loses positions 1..13
      (3L, "short unrelated text")
    ).toDF("doc_id", "text")
    val m = graft.ops.DedupOps.removeDupSpans(docs, n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    m(1L) shouldBe ((0L, shared + " tail one"))
    m(2L) shouldBe ((13L, "head"))
    m(3L) shouldBe ((0L, "short unrelated text"))
  }

  "unigramSurprisal" should "rank rare-token docs above common-token docs" in {
    val docs = Seq(
      (1L, "the the the the"),          // most common token
      (2L, "zyzzyva qwerty plugh xyzzy") // singletons
    ).toDF("doc_id", "text")
    val m = TextOps.unigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    m(2L) should be > m(1L)
    // doc 1: -ln(4/8) per token = ln 2
    m(1L) shouldBe math.log(2.0) +- 1e-6
  }

  "charEntropy" should "separate prose from degenerate repetition" in {
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaa"),               // one symbol -> 0 bits
      (2L, "the quick brown fox jumps over")  // prose ~ 3-4 bits
    ).toDF("doc_id", "text")
    val m = TextOps.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    m(1L) shouldBe 0L
    m(2L) should be > 3000000L // > 3 bits/char in micros
  }

  "tokenBudgetFill" should "fill each domain best-quality-first within budget" in {
    val long = ("w " * 64).trim                       // 64 tokens, quality-max length
    val docs = Seq(
      (1L, long + " the and of to is", "a"),          // high quality (stopwords)
      (2L, long, "a"),                                // mid
      (3L, long + " !!! ... ;;; ???", "a"),           // punct-penalized
      (4L, "tiny", "b")
    ).toDF("doc_id", "text", "source")
    val kept = TextOps.tokenBudgetFill(docs, budgetPerDomain = 140L)
      .collect().map(r => r.getLong(0)).toSet
    // domain a: doc1 (69 tok) then doc2 (64 tok) fit 140; doc3 would overflow
    kept shouldBe Set(1L, 2L, 4L)
  }

  "dsirWeights" should "up-weight docs resembling the target slice" in {
    val docs = Seq(
      (1L, "alpha beta gamma", true),   // target exemplar
      (2L, "alpha beta delta", false),  // close to target
      (3L, "zig zag zog", false)        // far from target
    ).toDF("doc_id", "text", "tgt")
    val m = TextOps.dsirWeights(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    m(2L) should be > m(3L)   // shares 2/3 unigrams with the target
    m(1L) should be > m(3L)
    // exactness: replay the integer-micros fold driver-side
    val words = Seq("alpha" -> (2L, 1L), "beta" -> (2L, 1L), "gamma" -> (1L, 1L))
    val (tAll, tTgt, v) = (9L, 3L, 7L)
    val expect1 = words.map { case (_, (cAll, cTgt)) =>
      math.floor((math.log((cTgt + 0.5) / (tTgt + 0.5 * v)) -
        math.log((cAll + 0.5) / (tAll + 0.5 * v))) * 1e6 + 0.5).toLong
    }.sum
    m(1L) shouldBe expect1
  }

  "bm25" should "rank exact topical matches above diluted ones" in {
    val docs = Seq(
      (1L, "spark query data"),                        // all three terms, short
      (2L, "spark spark spark filler filler filler filler filler filler"),
      (3L, "completely unrelated words here"),         // no match -> dropped
      (4L, "data data query")
    ).toDF("doc_id", "text")
    val m = TextOps.bm25(docs, Seq("spark", "query", "data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m.keySet shouldBe Set(1L, 2L, 4L)       // non-matching doc excluded
    m(1L) should be > m(2L)                 // 3 distinct terms beat repeated 1
    m(1L) should be > m(4L)
    all(m.values) should be > 0.0           // Lucene idf keeps scores positive
  }

  "tfIdfKeywords" should "surface distinctive terms over ubiquitous ones" in {
    val docs = Seq(
      (1L, "common zebra"),
      (2L, "common yak"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val top1 = TextOps.tfIdfKeywords(docs, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same tf=1: df-1 terms (idf ln4) beat the df-3 term (idf ln2)
    top1(1L) shouldBe "zebra"
    top1(2L) shouldBe "yak"
    top1(3L) shouldBe "common" // only term left
  }

  "stratifiedKeep" should "apply per-stratum rates deterministically" in {
    val docs = (0 until 200).map(i => (i.toLong, s"unique document text $i",
      if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "text", "lang")
    val kept = docs.where(TextOps.stratifiedKeep(
      col("text"), col("lang"), Map("en" -> 0), defaultRate = 1000))
    // rate 0 drops every en doc; rate 1000 (== mod) keeps every zh doc
    kept.where(col("lang") === "en").count() shouldBe 0L
    kept.where(col("lang") === "zh").count() shouldBe 100L
    // content-hash: same input -> identical sample
    val again = docs.where(TextOps.stratifiedKeep(
      col("text"), col("lang"), Map("en" -> 0), defaultRate = 1000))
    again.agg(sum("doc_id")).head().getLong(0) shouldBe
      kept.agg(sum("doc_id")).head().getLong(0)
  }

  "domainCap" should "keep the n best-quality docs per domain with deterministic ties" in {
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.7), (4L, "a", 0.5),
      (5L, "b", 0.1)
    ).toDF("doc_id", "source", "q")
    val out = TextOps.domainCap(docs, col("source"), col("q"), n = 3)
      .orderBy("source", "rank_in_domain")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    // ties on q=0.5 break by doc_id: 2 before 4, and 4 is cut
    out shouldBe Seq((1L, "a", 1), (3L, "a", 2), (2L, "a", 3), (5L, "b", 1))
  }

  "int8QuantStats" should "learn per-dim scales and bounded reconstruction error" in {
    val emb = Seq(
      (0L, Seq(127.0f, 1.0f)),
      (1L, Seq(-127.0f, 0.5f)),
      (2L, Seq(63.5f, -1.0f))
    ).toDF("vec_id", "embedding")
    val m = VectorOps.int8QuantStats(emb)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    m(1)._1 shouldBe 1.0 // scale = 127/127
    m(2)._1 shouldBe (1.0 / 127.0) +- 1e-9
    m(1)._2 shouldBe 2L  // +-127 both saturate
    m(2)._2 shouldBe 2L  // +-1.0 hit the extreme code too
    // max error bounded by scale/2 per component
    m(1)._3 should be <= 0.5 + 1e-9
    m(2)._3 should be <= 0.5 / 127.0 + 1e-9
  }

  "temperatureMix" should "flatten the mixture toward small domains within budget" in {
    val docs = Tables.loadPar(spark, "/root/testdata/sf0.01", "documents")
    val n = docs.count()
    val kept = TextOps.temperatureMix(docs, col("source"), budget = n / 2)
      .collect()
    kept.length should be > 0
    kept.length.toLong should be <= n / 2
    // keep-fraction is monotone anti-correlated with domain size: w_d ∝
    // sqrt(n_d), so target_n/n_docs ∝ 1/sqrt(n_d) — the biggest domain
    // must keep a strictly smaller fraction than the smallest (unless a
    // small domain saturated at 100%)
    val perDomain = kept.groupBy(_.getString(1)).map { case (dom, rows) =>
      (dom, rows.head.getLong(2), rows.length.toLong)
    }.toSeq
    perDomain.size should be > 1
    val big = perDomain.maxBy(_._2)
    val small = perDomain.minBy(_._2)
    if (big._2 > small._2) {
      val bigFrac = big._3.toDouble / big._2
      val smallFrac = math.min(1.0, small._3.toDouble / small._2)
      bigFrac should be < smallFrac + 1e-9
    }
    // deterministic: identical kept set across runs
    val again = TextOps.temperatureMix(docs, col("source"), budget = n / 2)
      .collect().map(_.getLong(0)).toSeq
    again shouldBe kept.map(_.getLong(0)).toSeq
  }

  "bpeLearn" should "learn merges by weighted pair frequency with asc tiebreak" in {
    // freq: aaab ×2, aab ×1
    // round 1: (a,a) = 2·2+1 = 5 beats (a,b) = 3 → merge aa
    //   aaab → " aa  a  b ", aab → " aa  b "
    // round 2: (aa,a)=2 ties (a,b)=2 → lhs asc picks (a,b) → ab
    // round 3: (aa,ab)=2 beats (aa,b)=1 → aaab
    val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val res = TextOps.bpeLearn(docs, merges = 3).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    res.toSeq shouldBe Seq(
      (1, "a", "a", "aa", 5L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "ab", "aaab", 2L))
  }

  it should "merge adjacent occurrences left-to-right, non-overlapping" in {
    // "aaaa": three (a,a) positions count once each; the merge pass
    // produces [aa][aa] (each match borrows one delimiter space, the
    // replacement restores it)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val res = TextOps.bpeLearn(docs, merges = 2).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    res.toSeq shouldBe Seq(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L))
  }

  "bpeEncodeCounts" should "count symbols under the learned merges" in {
    // merges (from the bpeLearn case): aa, ab, aaab
    // doc 1: aaab → 1 symbol ×2, aab → [aa][b] = 2 symbols → n_bpe 4
    // doc 2: ab → [ab] = 1, ba → [b][a] = 2 → n_bpe 3
    val docs = Seq((1L, "aaab aaab aab"), (2L, "ab ba")).toDF("doc_id", "text")
    val res = TextOps.bpeEncodeCounts(docs, merges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    res(1L) shouldBe ((3L, 4L))
    res(2L) shouldBe ((2L, 3L))
  }

  "bigramSurprisal" should "score repeated bigrams as less surprising" in {
    // corpus: "a b" ×3 in doc 1, "a c" once in doc 2; V = 3
    // c(a,b)=3, c(a,c)=1, c(b,a)=2; c(a)=4, c(b)=2
    // doc2 bigram (a,c): nll = ln((4+3)/(1+1)) = ln(3.5)
    val docs = Seq((1L, "a b a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = TextOps.bigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    m(2L)._1 shouldBe 1L
    m(2L)._2 shouldBe (math.floor(math.log(3.5) * 1e6 + 0.5) / 1e6)
    // doc 1's bigrams are the corpus mode → strictly less surprising
    assert(m(1L)._2 < m(2L)._2)
  }

  it should "drop single-word documents from the output" in {
    val docs = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
    TextOps.bigramSurprisal(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
  }

  "oovRate" should "count tokens outside the top-k vocabulary" in {
    // freq: a×4, b×2, c×1, d×1 → top-2 = {a, b}; ties beyond broken by word
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val m = TextOps.oovRate(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    m(1L) shouldBe ((4L, 1L)) // c is OOV
    m(2L) shouldBe ((4L, 1L)) // d is OOV
  }

  it should "break vocabulary-cut ties deterministically by word order" in {
    // b and c tie at 1; top-2 = {a, b} (count desc, word asc)
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = TextOps.oovRate(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    m(1L) shouldBe 0L
    m(2L) shouldBe 1L // c lost the tie
  }

  "classifierScores" should "learn a separable label through the hashed features" in {
    // label = contains the marker word; the marker's hash bucket is a
    // perfect separator feature, so 8 GD steps must push the classes apart
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "good clean prose text here")
      else (i, "spammy junk marker gibberish blob")
    }.toDF("doc_id", "text")
    val res = TextOps.classifierScores(docs, col("text").contains("marker"))
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Double]("score")))
    val pos = res.filter(_._1 == 1).map(_._2)
    val neg = res.filter(_._1 == 0).map(_._2)
    assert(pos.min > neg.max,
      s"classes must separate: pos min ${pos.min} vs neg max ${neg.max}")
    res.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
  }

  it should "be deterministic across runs" in {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "a b e f"))
      .toDF("doc_id", "text")
    def run() = TextOps.classifierScores(docs, col("doc_id") === 1L,
        dim = 8, iters = 3, lr = 4.0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sorted
    run() shouldBe run()
  }

  it should "produce identical scores through the driver and distributed paths" in {
    val docs = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) "aa bb cc dd" else "ee ff gg hh ii"))
      .toDF("doc_id", "text")
    def run(cap: Long) = TextOps.classifierScores(docs,
        col("doc_id") % 3 === 0, dim = 8, iters = 4, lr = 8.0, driverCap = cap)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sorted
    run(0L) shouldBe run(1L << 16)
  }

  it should "score 0.5 everywhere with zero iterations" in {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    TextOps.classifierScores(docs, lit(true), dim = 4, iters = 0)
      .collect().foreach(_.getDouble(2) shouldBe 0.5)
  }

  "nfcNormalize" should "compose decomposed sequences and leave composed/ASCII untouched" in {
    val rows = Seq(
      (0L, "plain ascii"),
      (1L, "cafe\u0301"),   // decomposed e + combining acute
      (2L, "caf\u00e9"),    // already composed
      (3L, "a\u0301e\u0300o\u0302"), // several combining marks
      (4L, "")
    ).toDF("id", "t")
    val len = org.apache.spark.sql.functions.length _
    val got = rows.select(col("id"), TextOps.nfcNormalize(col("t")).as("n"),
        len(col("t")).as("lr"), len(TextOps.nfcNormalize(col("t"))).as("ln"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    got(0L) shouldBe (("plain ascii", 11, 11))
    got(1L) shouldBe (("caf\u00e9", 5, 4))
    got(2L) shouldBe (("caf\u00e9", 4, 4))
    got(3L) shouldBe (("\u00e1\u00e8\u00f4", 6, 3))
    got(4L) shouldBe (("", 0, 0))
    // null-safe
    rows.select(TextOps.nfcNormalize(lit(null).cast("string")))
      .head().isNullAt(0) shouldBe true
  }

  "unigramKl" should "be ~zero on identical slices and positive under drift" in {
    val same = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "alpha beta gamma delta", false)
    ).toDF("doc_id", "text", "t")
    val klSame = TextOps.unigramKl(same, col("t")).head().getDouble(3)
    klSame shouldBe 0.0 +- 1e-9
    val drift = Seq(
      (1L, "alpha alpha alpha beta", true),
      (2L, "gamma gamma delta delta", false)
    ).toDF("doc_id", "text", "t")
    val klDrift = TextOps.unigramKl(drift, col("t")).head().getDouble(3)
    klDrift should be > 0.5
    // deterministic across runs (order-free integer-nano sum)
    TextOps.unigramKl(drift, col("t")).head().getDouble(3) shouldBe klDrift
  }

  "gopherFlags" should "decide each published rule exactly on crafted fixtures" in {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ") // 50 alpha words
    val docs = Seq(
      (0L, fifty + " the of and"),                    // passes everything
      (1L, "the of and a few words only"),            // too short
      (2L, fifty + " the of " + ("### " * 9).trim),   // symbol-heavy
      (3L, (1 to 50).map(_ => "no-vowel-alpha 123456789").mkString(" ")), // digits drag alpha share
      (4L, "- bullet one\n- bullet two\n- bullet three\nthe of and " + fifty),
      (5L, fifty + " the of trailing...\nand more...\nplain line")
    ).toDF("doc_id", "text")
    val m = TextOps.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    m(0L).getAs[Boolean]("keep") shouldBe true
    m(1L).getAs[Boolean]("ok_words") shouldBe false
    m(2L).getAs[Boolean]("ok_symbols") shouldBe false
    m(2L).getAs[Boolean]("ok_words") shouldBe true
    m(3L).getAs[Boolean]("ok_alpha") shouldBe false // half the tokens are digit runs
    m(4L).getAs[Boolean]("ok_bullets") shouldBe true // 3 of 4 lines = 75% ≤ 90%
    m(5L).getAs[Boolean]("ok_ellipsis") shouldBe false // 2 of 3 lines > 30%
    m(0L).getAs[Boolean]("ok_stopwords") shouldBe true
  }

  "dimCentroids" should "compute exact per-dimension means" in {
    val emb = Seq(
      (0L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 4.0f)), // same bucket (mod 2)
      (1L, Seq(10.0f, 20.0f))
    ).toDF("vec_id", "embedding")
    val m = VectorOps.dimCentroids(emb, col("vec_id") % 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    m((0L, 1)) shouldBe 2.0 // (1+3)/2
    m((0L, 2)) shouldBe 3.0 // (2+4)/2
    m((1L, 1)) shouldBe 10.0
    m((1L, 2)) shouldBe 20.0
  }
}
