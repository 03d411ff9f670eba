package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All column-level, built from codegen'd built-ins (no UDFs), so they
  * pipeline inside whole-stage codegen and scale linearly with input —
  * no shuffle unless the caller aggregates.
  */
object TextOps {

  /** Tokens = maximal alnum runs (a BPE-ish, language-neutral proxy). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0)))

  /** Whitespace-word count. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct pieces,
    * without lookahead so it runs on both Java regex and RE2): optional
    * leading space + letter run | digit run | punct run.
    */
  val bpePattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** BPE-ish piece count (the LLM-token-count proxy). */
  def bpeCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** The BPE-ish pieces themselves (for inspection / downstream vocab). */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Quality heuristics: length, punctuation ratio, stopword ratio,
    * mean word length. Mirrors common pretraining-corpus filters
    * (C4/Gopher-style rules) as pure column expressions.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  def stopwordCount(text: Column): Column = {
    val pat = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0)))

  /** Composite quality score in [0,1]: penalize very short docs, high
    * punctuation density, zero stopwords (word-salad indicator).
    * Rounded to 4 decimals via `floor(x·10⁴ + 0.5)` — pure IEEE double
    * ops, so the oracle reproduces the value bit-for-bit even when x
    * sits on a decimal half-boundary (engine round() modes diverge
    * there: observed once in 5,000 docs at sf0.1).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nTok, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 4.0)
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    floor(((lenScore + punctScore + stopScore) / 3.0) * 10000.0 + 0.5) / 10000.0
  }

  /** Language-ID by stopword-marker voting: argmax over languages of the
    * count of language-characteristic tokens (an n-gram-free heuristic that
    * stays codegen'd; a real model would slot in as a mapInPandas/ONNX
    * stage). Ties break by language code order (deterministic).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langScore(text: Column, lang: String): Column = {
    val pat = "(?i)(^|\\s)(" + langMarkers(lang).mkString("|") + ")(\\s|$|[\\.,;:!\\?])"
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    // argmax: sort (score asc, lang desc) and take the last element
    val best = element_at(array_sort(array(scored: _*),
      (a, b) => when(a("score") < b("score"), -1)
        .when(a("score") > b("score"), 1)
        .otherwise(when(a("lang") > b("lang"), -1).when(a("lang") < b("lang"), 1).otherwise(0))), -1)
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Polynomial rolling hash over the characters of a string (base 31,
    * mod 2^32 — the classic Java-style string hash, kept overflow-free in
    * long arithmetic). Pure higher-order-function pipeline: split ->
    * transform(ascii) -> aggregate fold, all codegen'd, no UDF. Chosen over
    * xxhash64 because the identical fold is expressible in ANSI-ish SQL
    * (DuckDB `list_reduce`), so fingerprints are oracle-checkable.
    */
  def polyHash(s: Column): Column =
    aggregate(
      transform(filter(split(s, ""), ch => length(ch) === 1),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 4294967296L)

  /** Document fingerprint: rolling hash of the normalized text (lowercased,
    * whitespace-collapsed) — the exact-dedup key. A content-derived id,
    * like the reference dictionary's content hashes (`Dictionary.scala:34-37`).
    */
  def fingerprint(text: Column): Column =
    polyHash(normalize(text))

  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Unicode NFC canonical composition (native codegen expression,
    * `graft.functions.NfcNormalize`): web corpora mix composed and
    * decomposed producers, so every byte-level op downstream —
    * fingerprints, exact dedup, equality joins — must see ONE canonical
    * form. ASCII/already-composed text short-circuits without
    * allocation, so the pass is ~free on the common path.
    */
  def nfcNormalize(text: Column): Column =
    call_function("graft_nfc", text)

  /** Character n-gram shingles of the normalized text (for Jaccard /
    * MinHash). Returns array<string>; distinct shingles.
    */
  def shingles(text: Column, n: Int = 5): Column = {
    val norm = normalize(text)
    val len = length(norm)
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(len - (n - 1), lit(1))),
          i => substring(norm, i, lit(n))),
        s => length(s) === n))
  }

  /** Fixed-size word chunks with overlap — the training-data chunking
    * stage (context-window packing): one output row per (doc, window),
    * windows starting every `chunkSize - overlap` words. Pure
    * explode-over-sequence, no shuffle, no UDF; at 100 TB this pipelines
    * inside the scan stage.
    */
  def chunks(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    docs
      .select(col("doc_id"), split(normalize(col("text")), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)), lit(step)))
          .as(Seq("chunk_no", "start")))
      .select(col("doc_id"), col("chunk_no"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(chunkSize))).as("chunk"),
        least(size(col("w")) - col("start"), lit(chunkSize)).as("n_chunk_words"))
  }

  /** PII-style redaction: emails -> <EMAIL>, URLs -> <URL>, long digit
    * runs -> <NUM>, applied in that order (all-occurrence replacement).
    * Patterns avoid lookahead so they run identically on Java regex and
    * RE2-family engines.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  val longNumPattern = "\\d{4,}"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      longNumPattern, "<NUM>")

  /** Count of redaction sites (pre-replacement). */
  def redactionCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit(s"$emailPattern|$urlPattern|$longNumPattern"), lit(0)))

  /** Within-document repetition ratio (Gopher-style repetition filter):
    * 1 - distinct_trigrams / total_trigrams over the normalized words —
    * 0 for no internal repetition, approaching 1 for degenerate loops.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(size(split(normalize(text), " ")) - (n - 1), lit(0))
    val distinctN = size(wordNgrams(text, n))
    when(total > 0,
      floor((lit(1.0) - distinctN.cast("double") / total) * 1e6 + 0.5) / 1e6)
      .otherwise(lit(0.0))
  }

  /** Per-document unigram surprisal (corpus-frequency LM proxy, the
    * perplexity-style quality filter): mean of -ln(count(w)/total) over
    * the document's tokens. The corpus frequency table is one map-side-
    * combined aggregate; per-doc means fold ln terms in POSITION ORDER
    * (collect-sort-fold), so the float sum replays bit-identically in the
    * oracle — same discipline as the vector dot product.
    */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(normalize(col("text")), " ")).as(Seq("pos", "w")))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = toks.crossJoin(broadcast(toks.agg(count(lit(1)).as("total"))))
    total.join(freq, Seq("w"))
      .withColumn("nll", log(col("total").cast("double") / col("cnt")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("nll")))),
            x => x.getField("nll")),
          lit(0.0), (acc, x) => acc + x).as("sum_nll"))
      .select(col("doc_id"), col("n_tokens"),
        (floor((col("sum_nll") / col("n_tokens")) * 1e6 + 0.5) / 1e6)
          .as("avg_surprisal"))
  }

  /** Unigram-distribution drift between two corpus slices:
    * KL(target ‖ rest) over add-1-smoothed unigram distributions — the
    * domain-shift / split-drift audit (is the validation slice
    * distributionally representative? did this source drift from the
    * corpus?). Per-word KL terms quantize to integer NANOS before the
    * sum, so the total is order-free and replays exactly in SQL; the
    * whole op is one token aggregate + one broadcast scalar join + one
    * map-side-combined sum. Output: one row (n_vocab, tot_target,
    * tot_rest, kl).
    */
  def unigramKl(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(isTarget.as("t"),
      explode(split(normalize(col("text")), " ")).as("w"))
    val counts = toks.groupBy("w").agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("t"), 0L).otherwise(1L)).as("cb"))
    val tot = counts.agg(count(lit(1)).as("v"),
      sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + 1).cast("double") / (col("ta") + col("v")))
      .withColumn("q", (col("cb") + 1).cast("double") / (col("tb") + col("v")))
      .withColumn("term",
        floor(col("p") * log(col("p") / col("q")) * 1e9 + 0.5).cast("long"))
      .groupBy(col("v").as("n_vocab"), col("ta").as("tot_target"),
        col("tb").as("tot_rest"))
      .agg((sum(col("term")) / 1e9).as("kl"))
  }

  /** BM25 retrieval scores for a literal query-term set — the corpus-
    * search primitive (filtering a pretraining corpus by topical queries,
    * building eval retrieval sets). Two scans, both linear:
    *   1. one map-side-combined aggregate computes the GLOBAL stats — doc
    *      count, average document length, per-term document frequencies —
    *      as a single broadcast-able row;
    *   2. the corpus streams once more, each doc scoring against the
    *      broadcast stats row.
    * Per-term contributions are summed in QUERY-TERM ORDER as separate
    * column additions (not an aggregate over rows), so the float sum is
    * deterministic and replays identically in the oracle. Lucene-style
    * idf = ln(1 + (n - df + 0.5)/(df + 0.5)) keeps scores positive.
    * Only docs matching at least one term are returned.
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    def tfCol(i: Int) = col(s"__tf_$i")
    def dfCol(i: Int) = col(s"__df_$i")
    val base = docs.select(
      col("doc_id") +: size(toks).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === t)).cast("double").as(s"__tf_$i")
        }: _*)
    val statCols =
      count(lit(1)).cast("double").as("__n") +:
        (sum(col("dl")) / count(lit(1))).as("__avgdl") +:
        terms.indices.map(i =>
          sum((tfCol(i) > 0).cast("long")).cast("double").as(s"__df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val score = terms.indices
      .map { i =>
        val idf = log(lit(1.0) +
          (col("__n") - dfCol(i) + 0.5) / (dfCol(i) + 0.5))
        idf * ((tfCol(i) * (k1 + 1.0)) /
          (tfCol(i) + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
      }
      .reduce(_ + _)
    scored
      .where(terms.indices.map(i => tfCol(i) > 0).reduce(_ || _))
      .select(col("doc_id"), (floor(score * 1e6 + 0.5) / 1e6).as("bm25"))
  }

  /** Per-document top-k TF-IDF keywords — the doc-side retrieval/tagging
    * primitive (BM25 is the query-side twin). Two linear stages:
    *   1. term frequencies per (doc, term) — one map-side-combined
    *      aggregate of the exploded tokens;
    *   2. document frequencies per term joined back (the df relation is
    *      corpus-vocabulary-sized; at corpus scale it stays a shuffle
    *      join — no broadcast assumption), then a per-doc window keeps
    *      the k best by weight with term-order tiebreak.
    * Weight = tf · ln(1 + n/df): single-expression doubles over integer
    * inputs, fixed-point-free but boundary-safe because the rounding is
    * the floor discipline.
    */
  def tfIdfKeywords(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(col("doc_id")).distinct().count().toDouble
    val w = Window.partitionBy("doc_id")
      .orderBy(col("weight").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("weight",
        floor((col("tf").cast("double") *
          log(lit(1.0) + lit(n) / col("df").cast("double"))) * 1e6 + 0.5) / 1e6)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("weight"), col("rank"))
  }

  /** Per-document CHARACTER entropy (bits) of the normalized text — the
    * gibberish/compressibility filter: natural prose sits ~4 bits/char,
    * repeated-character junk near 0, uniform random base36 ~5.2. One
    * explode + two map-side-combined aggregates; per-character
    * `-p·log2 p` terms quantize to integer MICROS and sum exactly, so
    * the oracle replays the float math bit-for-bit. Output:
    * (doc_id, n_chars, entropy_micros).
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val chars = docs.select(col("doc_id"),
        explode(split(normalize(col("text")), "")).as("c"))
      .where(length(col("c")) > 0)
    val freq = chars.groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
    val tot = chars.groupBy("doc_id").agg(count(lit(1)).as("n_chars"))
    val p = col("n").cast("double") / col("n_chars")
    // bits via ln(p)·(1/ln 2): both engines run the same ln + multiply
    // (a native log2 could differ in the last bit)
    val invLn2 = 1.4426950408889634
    freq.join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("n_chars"),
        floor(-p * log(p) * invLn2 * 1e6 + 0.5).cast("long").as("term_micros"))
      .groupBy("doc_id")
      .agg(first(col("n_chars")).as("n_chars"),
        sum(col("term_micros")).as("entropy_micros"))
  }

  /** Token-budget curation: per domain, keep the BEST-quality documents
    * whose running token total stays within `budgetPerDomain` — the
    * greedy quality-first fill of a fixed training-token budget (the
    * step between quality scoring and mixture weighting). One
    * domain-partitioned window (quality desc, doc_id tiebreak) computes
    * the inclusive running token sum; tokens are integers, so the cumsum
    * is exact and engine-replayable. At scale: one shuffle to the domain
    * key; a skewed mega-domain's extra rows fall to the same window pass
    * the budget cuts anyway.
    */
  def tokenBudgetFill(docs: DataFrame, budgetPerDomain: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"),
        qualityScore(col("text")).as("quality"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") <= budgetPerDomain)
  }

  /** DSIR-style importance weights (hashed-n-gram importance resampling,
    * the data-selection stage that up-weights documents close to a target
    * distribution): score each document by the unigram log-likelihood
    * ratio between a TARGET slice of the corpus (the in-domain exemplar
    * set, selected by `isTarget`) and the corpus itself. Three stages,
    * all linear:
    *   1. one map-side-combined aggregate builds the per-word
    *      target/corpus count table over the exploded tokens;
    *   2. three global scalars (target total, corpus total, vocabulary
    *      size) collect driver-side — one bounded row;
    *   3. each word's add-half-smoothed log ratio quantizes to integer
    *      MICROS, and per-doc scores are integer sums of those micros —
    *      associative and order-free, so the distributed sum is exact
    *      and the oracle replays it bit-for-bit (the same integer-units
    *      discipline as the centroid/graph sums).
    * At 100 TB: one shuffle to the word domain, one word-keyed join back
    * (AQE splits the stopword-skewed partitions), one doc-keyed
    * aggregate. The paper's fixed-width hashed buckets drop in by
    * replacing `w` with a hash-mod column; the raw-word form is the
    * engine-neutral (oracle-checkable) shape.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val words = docs.select(col("doc_id"), isTarget.as("is_target"),
        explode(split(normalize(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0)
    val vocab = words.groupBy("w").agg(
      count(lit(1)).as("c_all"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
    val t = vocab.agg(sum(col("c_all")), sum(col("c_tgt")), count(lit(1))).head()
    val (tAll, tTgt, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val lr = log((col("c_tgt").cast("double") + 0.5) / lit(tTgt + 0.5 * v)) -
      log((col("c_all").cast("double") + 0.5) / lit(tAll + 0.5 * v))
    val byWord = vocab.select(col("w"),
      floor(lr * 1e6 + 0.5).cast("long").as("lr_micros"))
    words.join(byWord, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_micros")).as("weight_micros"))
  }

  /** Deterministic stratified sampling: keep a document iff its content
    * fingerprint mod `mod` falls under its stratum's quota. The
    * per-stratum rates implement mixture re-balancing (upsample
    * low-resource strata, downsample dominant ones); the content hash
    * makes the sample reproducible across engines and immune to input
    * order — no PRNG, no state, pipelines inside the scan.
    */
  def stratifiedKeep(text: Column, stratum: Column,
                     rates: Map[String, Int], defaultRate: Int,
                     mod: Int = 1000): Column = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    pmod(fingerprint(text), lit(mod.toLong)) < rate.cast("long")
  }

  /** Temperature-scaled domain mixing: down/up-weight a multi-domain
    * corpus to a document budget with mixture weights w_d ∝ n_d^α — the
    * standard re-balancing between raw crawl proportions (α=1, big
    * domains dominate) and uniform (α=0). α is FIXED at 1/2: `sqrt` is
    * IEEE-correctly-rounded on every engine (libm `pow` is not), and the
    * per-domain weights round to integer micros before the normalizing
    * sum, so the whole target computation is order-free and replays
    * bit-for-bit in the oracle. Within a domain the kept subset is chosen
    * by content-fingerprint order (PRNG-free pseudo-random, reproducible
    * across engines, input orders and retries; doc_id tiebreak).
    *
    * Scale shape: one map-side-combined count aggregate (one row per
    * domain) normalized against a one-row total, broadcast back, then a
    * single row_number window keyed by domain — same skew posture as
    * domainCap: the mega-domain the mix down-samples is exactly what AQE
    * skew-splits, and the window state is one counter per domain.
    */
  def temperatureMix(docs: DataFrame, domain: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), domain.as("domain"),
      fingerprint(col("text")).as("fp"))
    val wts = d.groupBy("domain").agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        floor(sqrt(col("n_docs").cast("double")) * 1e6 + 0.5).cast("long"))
    val tot = wts.agg(sum(col("w")).as("w_total"))
    // budget·w ≤ ~2^42 at any plausible domain count: the double division
    // below is exact-operand, and floor after one IEEE division is
    // engine-identical.
    val tgt = wts.crossJoin(broadcast(tot))
      .withColumn("target_n",
        floor((lit(budget).cast("double") * col("w")) / col("w_total"))
          .cast("long"))
      .select(col("domain"), col("n_docs"), col("target_n"))
    val win = Window.partitionBy("domain")
      .orderBy(col("fp").asc, col("doc_id").asc)
    d.join(broadcast(tgt), Seq("domain"))
      .withColumn("pick", row_number().over(win))
      .where(col("pick") <= col("target_n"))
      .select(col("doc_id"), col("domain"), col("n_docs"), col("target_n"))
      .orderBy("doc_id")
  }

  /** Per-domain quota capping: keep at most `n` documents per domain,
    * best-quality first (ties break on doc_id, so the cap is
    * deterministic). The shuffle key is the DOMAIN — each domain's docs
    * sort locally in its partition; at corpus scale a skewed mega-domain
    * is exactly what the cap removes, and AQE's skew handling covers the
    * sort itself. The standard corpus-balancing stage between quality
    * scoring and training.
    */
  def domainCap(docs: DataFrame, domain: Column, score: Column,
                n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("__q", score)
      .withColumn("rank_in_domain", row_number().over(
        Window.partitionBy(domain).orderBy(col("__q").desc, col("doc_id").asc)))
      .where(col("rank_in_domain") <= n)
      .drop("__q")
  }

  /** BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909) over the
    * corpus — the tokenizer-TRAINING stage of a data pipeline, not just
    * token counting. Returns the learned merge table
    * (step, lhs, rhs, merged, pair_count).
    *
    * Scale shape (the classic BPE trick): everything iterates over the
    * WORD-FREQUENCY table (|vocab| rows), never the corpus — one corpus
    * scan builds it, then each of the `merges` rounds is one map-side-
    * combined pair-count aggregate plus a 1-row driver collect of the
    * argmax pair (the same bounded-constant class as the k-means centroid
    * update), and one string map applies the merge.
    *
    * Determinism contract (replayed exactly by the DuckDB oracle):
    *   - argmax pair: count desc, then (lhs, rhs) asc;
    *   - words ride as delimiter strings `" s1  s2  ...  sn "` — DOUBLE
    *     space between symbols, single at the ends — so applying a merge
    *     is a plain left-to-right non-overlapping
    *     `replace(" a  b ", " ab ")`: identical builtin semantics in
    *     Spark and DuckDB; adjacent occurrences still merge (each match
    *     consumes one space of the neighbor's double delimiter, the
    *     replacement restores it) while a partial symbol can never
    *     false-match (its neighboring character breaks the delimiter).
    * No end-of-word marker: word-internal merges only (documented
    * simplification; the marker would just be one more initial symbol).
    */
  def bpeLearn(docs: DataFrame, merges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pins = new graft.Pins
    val (out, _) = bpeTrain(docs, merges, pins)
    pins.release()
    out.toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** The BPE training loop shared by `bpeLearn` and `bpeEncodeCounts`:
    * returns the merge table AND the final vocabulary (word, freq, seq)
    * with every merge applied. Intermediates are tracked in the caller's
    * `pins`; the returned vocab is the LAST pinned round — callers must
    * consume (or re-checkpoint) it before releasing.
    */
  private def bpeTrain(docs: DataFrame, merges: Int, pins: graft.Pins)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var vocab = pins.pin(docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(lit(" "),
          concat_ws("  ", regexp_extract_all(col("word"), lit("."), lit(0))),
          lit(" ")).as("seq")))
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to merges) {
      val syms = split(trim(col("seq")), "  ")
      val top = vocab
        .select(col("freq"), syms.as("syms"))
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i - 1] AS l, syms[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step, l, r, l + r, c))
        vocab = pins.pin(vocab.withColumn("seq",
          call_function("replace", col("seq"),
            lit(s" $l  $r "), lit(s" $l$r "))))
      }
    }
    (out.result(), vocab)
  }

  /** `bpeTrain` with the final vocabulary SEALED into its own checkpoint
    * (training-round intermediates freed) — the per-corpus tokenizer
    * artifact shape `GraftStore.bpeModel` caches.
    */
  def bpeTrainSealed(docs: DataFrame, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val pins = new graft.Pins
    val (out, vocab) = bpeTrain(docs, merges, pins)
    (out, pins.seal(vocab))
  }

  /** BPE ENCODING with the learned merges — the tokenizer-APPLY stage
    * (`bpeLearn` is training; this is what the trained tokenizer costs on
    * the corpus): per document, the number of BPE symbols its words
    * tokenize into under the final merged vocabulary, plus the word
    * count. The trained per-word symbol table is |vocab|-sized and joins
    * the exploded corpus words — at scale one word-keyed shuffle join
    * (AQE splits hot common-word partitions), never a per-document loop.
    */
  def bpeEncodeCounts(docs: DataFrame, merges: Int = 10): DataFrame =
    bpeEncodeCountsOver(docs, bpeTrainSealed(docs, merges)._2)

  /** Encoding over a pre-trained (shared/cached) vocabulary relation. */
  def bpeEncodeCountsOver(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val enc = vocab.select(col("word"),
      size(split(trim(col("seq")), "  ")).as("n_sym"))
    docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("word"))
      .join(enc, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
  }

  /** Add-one-smoothed bigram language-model surprisal — the KenLM-style
    * perplexity-proxy filter one step up from [[unigramSurprisal]]: the
    * corpus trains its own bigram model, then every document is scored by
    * its average per-bigram negative log-likelihood
    * `nll(u,v) = ln((c(u)+V) / (c(u,v)+1))` (add-1 smoothing over the
    * unigram vocabulary V). High surprisal = improbable word sequences =
    * gibberish/boilerplate candidates. Scale shape: one bigram shuffle for
    * the count table, a second aggregate DERIVED from it for the context
    * counts (|bigram-types| rows, not corpus rows), one broadcast vocab
    * scalar, one join back, one per-doc aggregate. The per-doc float sum
    * folds in POSITION order (same discipline as unigramSurprisal) so the
    * oracle replays it bit-for-bit; the result rounds to integer micros.
    */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val ws = docs.select(col("doc_id"),
      split(normalize(col("text")), " ").as("words"))
    val toks = ws.select(explode(col("words")).as("w"))
    val bi = ws
      .where(size(col("words")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("words")) - 1),
          i => struct(i.as("pos"),
            element_at(col("words"), i).as("u"),
            element_at(col("words"), i + 1).as("v")))).as("b"))
      .select(col("doc_id"), col("b.pos"), col("b.u"), col("b.v"))
    val cuv = bi.groupBy("u", "v").agg(count(lit(1)).as("cuv"))
    val cu = cuv.groupBy("u").agg(sum("cuv").as("cu"))
    val vocab = toks.agg(countDistinct(col("w")).as("vsz"))
    bi.join(cuv, Seq("u", "v")).join(cu, Seq("u"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        log((col("cu") + col("vsz")).cast("double") / (col("cuv") + 1)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("nll")))),
            x => x.getField("nll")),
          lit(0.0), (acc, x) => acc + x).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor((col("sum_nll") / col("n_bigrams")) * 1e6 + 0.5) / 1e6)
          .as("avg_surprisal2"))
  }

  /** Out-of-vocabulary rate against the corpus' own top-`vocabSize`
    * vocabulary — the tokenizer-coverage audit run before committing to a
    * vocab: documents dense in OOV tokens fragment into long byte-level
    * sequences at training time. The cut is deterministic (count desc,
    * word asc tiebreak); the vocabulary is bounded so the membership join
    * broadcasts; one token shuffle + one per-doc aggregate.
    */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(normalize(col("text")), " ")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        floor(col("n_oov").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)
  }

  /** Hashed bag-of-words features for [[classifierScores]]: one row per
    * doc with `y6` (label in integer micros), `x0..x{dim-1}` — term
    * frequencies per hash bucket, normalized by document length — and a
    * unit-scale length feature `x{dim}` (`min(n_words/64, 1)`, the same
    * leg the rule-based [[qualityScore]] uses), all quantized to integer
    * micros. One token shuffle, computed ONCE per training run
    * (iterations re-scan this relation, never the corpus).
    */
  def hashedBowFeatures(docs: DataFrame, label: Column, dim: Int): DataFrame = {
    val hashed = docs.select(col("doc_id"),
        (label.cast("int").cast("long") * 1000000L).as("y6"),
        explode(split(normalize(col("text")), " ")).as("w"))
      .withColumn("b", (polyHash(col("w")) % dim).cast("int"))
    val counted = hashed.groupBy(col("doc_id"), col("y6"))
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(b =>
          sum(when(col("b") === b, 1L).otherwise(0L)).as(s"c$b")): _*)
    counted.select(col("doc_id") +: col("y6") +: ((0 until dim).map(b =>
      floor(col(s"c$b").cast("double") / col("n") * 1e6 + 0.5)
        .cast("long").as(s"x$b")) :+
      floor(least(col("n").cast("double") / 64.0, lit(1.0)) * 1e6 + 0.5)
        .cast("long").as(s"x$dim")): _*)
  }

  /** Model-based quality/domain filtering, trained IN the engine: a
    * logistic-regression classifier over hashed bag-of-words features
    * (the fastText-style linear filter behind FineWeb-Edu / DCLM-class
    * corpus curation), fit with `iters` full-batch gradient steps and then
    * applied to every document. Deterministic by construction — features,
    * sigmoid outputs, and weight updates all quantize to integer micros
    * (gradients accumulate as exact integer picos in decimal sums, safe at
    * any corpus size), so the DuckDB oracle replays training bit-for-bit.
    * Scale shape: the feature relation is built once (one token shuffle);
    * each iteration is ONE codegen map pass over it plus ONE map-side-
    * combined
    * aggregate collapsing to a single `dim+2`-column gradient row on the
    * driver — the same fixed-rounds discipline as [[bpeLearn]] and
    * `VectorOps.kmeans`. Returns (doc_id, label, score, pred).
    */
  def classifierScores(docs: DataFrame, label: Column, dim: Int = 16,
                       iters: Int = 8, lr: Double = 16.0,
                       driverCap: Long = 1L << 16): DataFrame = {
    require(dim > 0 && iters >= 0, "classifierScores needs dim>0, iters>=0")
    val nf = dim + 1 // hashed tf buckets + the length feature
    // pin the feature relation ONCE — every gradient pass and the final
    // scoring scan read the materialized features, never re-tokenizing
    // the corpus (without this, iters+1 plans each replay the token
    // explode+aggregate: measured 10 s -> ~7 s at sf0.1)
    val pins = new graft.Pins
    val feat = pins.pin(hashedBowFeatures(docs, label, dim))
    var w = Array.fill(nf)(0L)
    var bias = 0L
    val nd = feat.count()
    if (nd <= driverCap) {
      // small-corpus fast path: the feature table is a bounded nf+2
      // column relation, so GD runs on the driver over ONE collected
      // copy — identical integer math (sums are order-free exact;
      // |err*x| <= 1e12 so a 2^16-row sum stays far from Long overflow),
      // zero per-iteration Spark jobs. Same discipline as the update
      // engine's <64k driver-side batches.
      val rows = feat.select(col("y6") +: (0 until nf).map(b =>
        col(s"x$b")): _*).collect()
      val y = rows.map(_.getLong(0))
      val xs = rows.map(r => Array.tabulate(nf)(b => r.getLong(b + 1)))
      for (_ <- 0 until iters) {
        var gb = 0L
        val g = Array.fill(nf)(0L)
        var i = 0
        while (i < rows.length) {
          var m = 0L
          var b = 0
          while (b < nf) { m += xs(i)(b) * w(b); b += 1 }
          val p6 = math.floor(
            1.0 / (1.0 + math.exp(-(m.toDouble / 1e12 + bias.toDouble / 1e6)))
              * 1e6 + 0.5).toLong
          val err = y(i) - p6
          gb += err
          b = 0
          while (b < nf) { g(b) += err * xs(i)(b); b += 1 }
          i += 1
        }
        bias += math.floor(lr * gb.toDouble / nd + 0.5).toLong
        w = Array.tabulate(nf)(b =>
          w(b) + math.floor(lr * g(b).toDouble / nd / 1e6 + 0.5).toLong)
      }
    } else {
      def margin: Column =
        (0 until nf).map(b => col(s"x$b") * lit(w(b))).reduce(_ + _)
          .cast("double") / 1e12 + lit(bias.toDouble / 1e6)
      def p6: Column =
        floor(lit(1.0) / (lit(1.0) + exp(-margin)) * 1e6 + 0.5).cast("long")
      for (_ <- 0 until iters) {
        val err = (col("y6") - p6).as("e")
        val g = feat.agg(
          count(lit(1)).as("nd"),
          sum(err.cast("decimal(28,0)")).as("gb") +:
            (0 until nf).map(b =>
              sum((err * col(s"x$b")).cast("decimal(38,0)")).as(s"g$b")): _*)
          .collect()(0)
        bias += math.floor(
          lr * g.getAs[java.math.BigDecimal]("gb").doubleValue / nd + 0.5).toLong
        w = Array.tabulate(nf)(b => w(b) + math.floor(
          lr * g.getAs[java.math.BigDecimal](s"g$b").doubleValue / nd / 1e6
            + 0.5).toLong)
      }
    }
    def marginFinal: Column =
      (0 until nf).map(b => col(s"x$b") * lit(w(b))).reduce(_ + _)
        .cast("double") / 1e12 + lit(bias.toDouble / 1e6)
    pins.seal(feat.select(col("doc_id"),
        (col("y6") / 1000000L).cast("int").as("label"),
        (floor(lit(1.0) / (lit(1.0) + exp(-marginFinal)) * 1e6 + 0.5) / 1e6)
          .as("score"))
      .withColumn("pred", (col("score") >= 0.5).cast("int")))
  }

  /** Word n-grams (for n-gram Jaccard dedup). */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val words = split(TextOps.normalize(text), " ")
    val cnt = size(words)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(cnt - n, lit(0))),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))),
        s => size(split(s, " ")) === n))
  }

  /** The Gopher quality-filter rule set (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", Table A1) — the published heuristic battery most
    * web-corpus pipelines start from. One boolean flag per rule plus
    * the conjunction `keep`:
    *   - 50 ≤ word count ≤ 100,000;
    *   - mean word length in [3, 10] characters;
    *   - symbol-to-word ratio ("#" or "...") ≤ 0.1;
    *   - ≤ 90 % of lines start with a bullet, ≤ 30 % end with "...";
    *   - ≥ 80 % of words contain at least one alphabetic character;
    *   - at least two of the eight listed English function words.
    * Every rule is a pure codegen'd expression over INTEGER counts —
    * ratio thresholds compare cross-multiplied integers, so both
    * engines decide each flag exactly, never through a float. One
    * narrow map pass; trivially 100 TB-safe.
    */
  def gopherFlags(docs: DataFrame): DataFrame = {
    val text = col("text")
    val words = size(regexp_extract_all(text, lit("\\S+"), lit(0)))
    val chars = length(regexp_replace(text, "\\s", ""))
    val alphaWords =
      size(regexp_extract_all(text, lit("\\S*[A-Za-z]\\S*"), lit(0)))
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
    val lines = length(text) - length(regexp_replace(text, "\\n", "")) + 1
    val bulletLines =
      size(regexp_extract_all(text, lit("(?m)^[ \\t]*[-*\u2022]"), lit(0)))
    val ellipsisLines =
      size(regexp_extract_all(text, lit("(?m)(\\.\\.\\.|\u2026)[ \\t]*$"),
        lit(0)))
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(text.rlike("(?i)\\b" + w + "\\b"), 1).otherwise(0))
      .reduce(_ + _)
    docs.select(col("doc_id"), words.as("n_words"),
        (words >= 50 && words <= 100000).as("ok_words"),
        (chars >= words * 3 && chars <= words * 10).as("ok_wordlen"),
        (symbols * 10 <= words).as("ok_symbols"),
        (bulletLines * 10 <= lines * 9).as("ok_bullets"),
        (ellipsisLines * 10 <= lines * 3).as("ok_ellipsis"),
        (alphaWords * 5 >= words * 4).as("ok_alpha"),
        (stopHits >= 2).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_words") && col("ok_wordlen") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stopwords"))
  }
}
