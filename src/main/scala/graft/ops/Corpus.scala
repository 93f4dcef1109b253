package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-curation operators over `documents` (SURVEY §2 T8–T10) — the
  * operations a pretraining-data pipeline needs around dedup/quality:
  * train/test decontamination, deterministic stratified sampling, and
  * numeric profiling. Extensions beyond the reference surface; all pure
  * Column pipelines (whole-stage codegen, no UDFs) with DuckDB oracles.
  */
object Corpus {

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-grams of a text column, with duplicates (empty array below n
    * tokens — Spark's sequence(1, 0) is DESCENDING, not empty). Dedup
    * happens downstream where the set is already small: per-row
    * array_distinct is a quadratic scan over hundreds of grams per doc.
    *
    * Each gram is one `slice` + `array_join`, NOT n element_at calls:
    * higher-order `transform` lambdas run interpreted (no codegen, no
    * common-subexpression elimination), so every expression referencing
    * the token array re-evaluates the regex split per element — n
    * element_at's made gram construction O(n·grams·|text|) per document
    * (measured 20.5 s for a 235k-gram corpus single-core; slice makes it
    * one re-split per gram, ~8× less).
    */
  private[ops] def wordNgrams(text: Column, n: Int): Column = {
    val t = toks(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  val DecontamNgram = 8

  /** T8: train/test decontamination — the standard n-gram method: a corpus
    * document is contaminated if it shares any word n-gram (n=8) with the
    * held-out benchmark set, and is reported with its distinct shared-gram
    * count.
    *
    * Scale shape: the ~50-byte gram strings never leave the scan projection
    * — both sides hash each gram to two independently-seeded 64-bit values
    * (`xxhash64(gram)` and `xxhash64(gram, salt)`) right after the explode,
    * so the join key, the shuffle rows, and the distinct-count all move 16
    * bytes instead of wide strings (~3× less shuffle volume on an 8-word
    * gram; at 100 TB this is the difference between shuffling tokens×50
    * bytes and tokens×16). The benchmark side (tiny next to the corpus) is
    * distinct-deduped and AQE-broadcast while it fits; only matching hashes
    * ever shuffle into the map-side-combined count. The combined key is
    * effectively a 128-bit fingerprint: a false positive needs one gram
    * pair to collide in BOTH independent hashes (~1e-38 per pair, so no
    * realistic corpus×benchmark product reaches it — collision-proof at
    * 100 TB in the sense the DuckDB string-join oracle checks).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      n: Int = DecontamNgram): DataFrame = {
    // gram construction is compute-bound (8 element_at + concat per gram):
    // don't let a small file count serialize it onto a few cores (no-op on
    // an already-wide 100 TB corpus)
    val p = corpus.sparkSession.sparkContext.defaultParallelism
    val wide = if (corpus.rdd.getNumPartitions < p) corpus.repartition(p)
      else corpus
    // second hash seeded by tupling in a constant: xxhash64(gram, salt)
    // is independent of xxhash64(gram)
    def gh2(gram: Column): Column = xxhash64(gram, lit("graft.decontam.2"))
    val bGrams = benchmark
      .select(explode(wordNgrams(col("text"), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gh"), gh2(col("gram")).as("gh2"))
      .distinct()
    wide.select(col("doc_id"), explode(wordNgrams(col("text"), n)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"),
        gh2(col("gram")).as("gh2"))
      .join(bGrams, Seq("gh", "gh2"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gh"), col("gh2")).as("n_shared_ngrams"))
  }

  /** Driver entry: every 10th doc_id stands in for the benchmark set, the
    * rest are the corpus (production passes a real benchmark table).
    */
  def decontaminateQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(
      docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(10L)) === 0L))
  }

  def decontaminateSql(n: Int = DecontamNgram): String = {
    val gram = (0 until n).map(j => s"t[i + $j]").mkString(" || ' ' || ")
    s"""WITH tk AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= $n
       |    THEN list_transform(range(1, len(t) - ${n - 2}), i -> $gram)
       |    ELSE []::VARCHAR[] END)) AS gram
       |  FROM tk
       |),
       |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
       |cg AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 0)
       |SELECT cg.doc_id, count(*) AS n_shared_ngrams
       |FROM cg JOIN bg USING (gram)
       |GROUP BY cg.doc_id""".stripMargin
  }

  val LongDocTokens = 150
  val FracLong = 0.7
  val FracShort = 0.3

  /** Uniform [0,1) from the first 8 hex digits of md5 of the id — the
    * engine-neutral, content-independent coin for reproducible sampling
    * (id-multiplicative hashing would overflow ANSI Long arithmetic at
    * petabyte-scale id ranges; md5 exists in both engines at any scale).
    */
  private def sampleU(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** T9: deterministic stratified sampling — reproducible data mixing:
    * per-stratum keep fractions applied via the md5 coin, so a given doc
    * is kept identically in every engine, run, and partitioning. Strata
    * here are token-length buckets (long docs kept at 70%, short at 30%);
    * production plugs language/quality/domain in as the stratum column.
    * Zero shuffles: the whole operator is a codegen'd scan + filter.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks(col("text")))
    val stratum = when(nTok >= LongDocTokens, "long").otherwise("short")
    val frac = when(stratum === "long", FracLong).otherwise(FracShort)
    Tables.documents(spark, dir)
      .select(col("doc_id"), stratum.as("stratum"), sampleU(col("doc_id")).as("u"),
        frac.as("frac"))
      .filter(col("u") < col("frac"))
      .select(col("doc_id"), col("stratum"))
  }

  def sampleStratifiedSql: String = {
    // first-8-hex-digits of md5 as a u32: positional digit sum via strpos
    // (DuckDB has no conv)
    val digits = (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, md5(doc_id::VARCHAR) AS hx,
       |    CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= $LongDocTokens
       |      THEN 'long' ELSE 'short' END AS stratum
       |  FROM documents
       |), u AS (
       |  SELECT doc_id, stratum, ($digits)::DOUBLE / 4294967296.0 AS u
       |  FROM t)
       |SELECT doc_id, stratum FROM u
       |WHERE u < CASE WHEN stratum = 'long' THEN $FracLong ELSE $FracShort END""".stripMargin
  }

  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** T10: numeric profiling — per-column row/distinct counts, min/max, and
    * exact interpolated quartiles over lineitem's measures: the stats a
    * pipeline records before/after each filter stage. One scan computes
    * all columns' aggregates; the result is unpivoted to long form.
    * (percentile() is Spark's exact linear-interpolation aggregate ≡
    * DuckDB quantile_cont.)
    */
  def numericProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val aggs = ProfileCols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        count_distinct(col(c)).as(s"${c}_nd"),
        round(min(col(c)).cast("double"), 6).as(s"${c}_min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}_max"),
        round(percentile(col(c), lit(0.25)), 6).as(s"${c}_q25"),
        round(percentile(col(c), lit(0.5)), 6).as(s"${c}_q50"),
        round(percentile(col(c), lit(0.75)), 6).as(s"${c}_q75"))
    }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val rows = ProfileCols.map { c =>
      struct(lit(c).as("column"), col(s"${c}_n").as("n"),
        col(s"${c}_nd").as("n_distinct"), col(s"${c}_min").as("minv"),
        col(s"${c}_max").as("maxv"), col(s"${c}_q25").as("q25"),
        col(s"${c}_q50").as("q50"), col(s"${c}_q75").as("q75"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  val numericProfileSql: String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS column, count($c) AS n,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(min($c)::DOUBLE, 6) AS minv, round(max($c)::DOUBLE, 6) AS maxv,
         |  round(quantile_cont($c, 0.25), 6) AS q25,
         |  round(quantile_cont($c, 0.5), 6) AS q50,
         |  round(quantile_cont($c, 0.75), 6) AS q75
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Hashed-feature bucket count — fixed at 16^3 so the bucket is exactly
    * the value of three md5 hex digits, computable identically in Spark
    * (`conv(substr(md5(g), 30, 3), 16, 10)`) and DuckDB (strpos hex-digit
    * arithmetic; it has no conv).
    */
  val DsirBuckets = 4096
  val DsirTargetLang = "en"

  private def dsirBucket(g: Column): Column =
    conv(substring(md5(g), 30, 3), 16, 10).cast("int")

  /** T12: DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of a *target* distribution (here
    * the `lang = 'en'` slice) against the raw corpus, under hashed n-gram
    * (unigram + bigram) bag-of-words models with Laplace smoothing.
    * Documents that look like the target score high; selection/mixing then
    * samples by weight. The standard data-mixing operator for pretraining
    * pipelines.
    *
    * Scale shape: ONE corpus scan builds both models at once (per-bucket
    * raw count + target count in the same map-side-combined aggregate over
    * ≤ [[DsirBuckets]] keys); the per-bucket log-ratio table is bounded at
    * 4096 rows by construction — a constant-size dim, broadcast
    * explicitly — so the second scan's scoring join never shuffles the
    * grams; the only corpus-sized shuffle is the map-side-combined per-doc
    * sum, ∝ distinct doc_ids. Feature hashing (3 md5 hex digits) keeps the
    * model size independent of vocabulary, which is the point of DSIR's
    * hashed variant at web scale.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val p = spark.sparkContext.defaultParallelism
    val wide = if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
    dsir(wide)
  }

  /** Core of T12 over any (doc_id, lang, text) frame — see [[dsirWeights]]. */
  def dsir(docs: DataFrame): DataFrame = {
    // unigrams + adjacent bigrams, lowercased — the paper's feature set
    val feats = docs.select(col("doc_id"), col("lang"),
      explode(concat(toks(col("text")), wordNgrams(col("text"), 2))).as("g"))
    // checkpointed (r15): the model aggregate AND the scoring join both
    // consume this gram-bucket view — un-checkpointed, the second
    // consumer re-ran the whole tokenize + explode + md5 pass (the
    // query's dominant compute; at corpus scale that is a second full
    // decode of the text). The checkpoint materializes 16 bytes/gram
    // inside the model aggregate's own job; the per-gram sum expressions
    // are unchanged, so the scored multiset is bit-identical.
    val fb = feats.select(col("doc_id"), col("lang"), dsirBucket(col("g")).as("bucket"))
      .localCheckpoint(eager = false)
    val bc = fb.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    // model totals: O(1) driver scalars off the bucket aggregate
    val tot = bc.agg(sum(col("cr")), sum(col("ct"))).head()
    val (tr, tt) = (tot.getLong(0), tot.getLong(1))
    val b = DsirBuckets
    // identical term order to the oracle SQL: ln(ct+1) − ln(Tt+B) −
    // ln(cr+1) + ln(Tr+B), left-associative in both engines
    val w = bc.select(col("bucket"),
      (log(col("ct") + 1) - log(lit((tt + b).toDouble)) -
        log(col("cr") + 1) + log(lit((tr + b).toDouble))).as("w"))
    fb.join(broadcast(w), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("w")), 6).as("dsir_logratio"))
  }

  def dsirSql(b: Int = DsirBuckets, target: String = DsirTargetLang): String = {
    def hx(i: Int) = s"(strpos('0123456789abcdef', substr(md5(g), $i, 1)) - 1)"
    s"""WITH t AS (
       |  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, lang, unnest(ws) AS g FROM t
       |  UNION ALL
       |  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS g
       |  FROM t, unnest(range(1, len(ws))) AS u(i)
       |), fb AS (
       |  SELECT doc_id, lang,
       |    ${hx(30)} * 256 + ${hx(31)} * 16 + ${hx(32)} AS bucket
       |  FROM feats
       |), bc AS (
       |  SELECT bucket, count(*) AS cr,
       |    sum(CASE WHEN lang = '$target' THEN 1 ELSE 0 END) AS ct
       |  FROM fb GROUP BY 1
       |), tot AS (
       |  SELECT sum(cr) AS tr, sum(ct) AS tt FROM bc
       |), w AS (
       |  SELECT bucket,
       |    ln(ct + 1) - ln(tt + $b) - ln(cr + 1) + ln(tr + $b) AS w
       |  FROM bc, tot
       |)
       |SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |  round(sum(w.w), 6) AS dsir_logratio
       |FROM fb JOIN w USING (bucket)
       |GROUP BY 1""".stripMargin
  }

  val MixAlpha = 0.3
  val MixBudgetFrac = 0.5

  /** T18: temperature-based source mixing — the multilingual-LM sampling
    * scheme (XLM-R / mBERT, α=0.3): per-source weights w_s ∝ n_s^α
    * normalized over sources, flattening the head so low-resource strata
    * are over-sampled relative to their raw share; then per-source keep
    * rates realizing a global doc budget (rates cap at 1 — a stratum can't
    * be sampled above its size).
    *
    * One map-side-combined count per source is the only corpus-sized work;
    * the normalization window runs over the O(#sources) aggregate. The
    * rates feed T9's md5 coin for the actual reproducible sample, so
    * mixture design and mixture execution stay separate, auditable steps.
    */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val p = pow(col("n_docs").cast("double"), lit(MixAlpha))
    val w = p / sum(p).over(all)
    val budget = sum(col("n_docs")).over(all).cast("double") * lit(MixBudgetFrac)
    val rate = least(lit(1.0), w * budget / col("n_docs").cast("double"))
    Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        round(w, 6).as("weight"),
        round(rate, 6).as("rate"),
        floor(col("n_docs").cast("double") * rate).cast("long").as("expected_docs"))
  }

  def mixWeightsSql(alpha: Double = MixAlpha,
      budgetFrac: Double = MixBudgetFrac): String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
       |), w AS (
       |  SELECT source, n_docs,
       |    pow(n_docs, $alpha) / sum(pow(n_docs, $alpha)) OVER () AS weight,
       |    CAST(sum(n_docs) OVER () AS DOUBLE) * $budgetFrac AS budget
       |  FROM counts
       |)
       |SELECT source, n_docs,
       |  round(weight, 6) AS weight,
       |  round(least(1.0, weight * budget / n_docs), 6) AS rate,
       |  CAST(floor(n_docs * least(1.0, weight * budget / n_docs)) AS BIGINT)
       |    AS expected_docs
       |FROM w""".stripMargin

  /** Bloom geometry: k = 4 hash functions over m = 2^16 bits. Like the CMS
    * (T17) and HLL (T20) sketches, the hashes are disjoint 4-hex-digit
    * windows of ONE md5 of the document text — 16 bits each, so the bit
    * array needs no modulo and the SAME positions are computable in
    * DuckDB: the approximate filter is hash-oracle-checkable, not
    * tolerance-banded. (Bloom 1970; k=4, m/n≈13 at the sf0.01 corpus
    * ⇒ theoretical FP rate ≈ (1−e^{−kn/m})^k ≈ 5e-3.)
    */
  val BloomK = 4

  private[graft] def bloomPositions(hx: Column): Column =
    array((0 until BloomK).map { i =>
      conv(substring(hx, 4 * i + 1, 4), 16, 10).cast("long")
    }: _*)

  /** T21: Bloom-filter dedup membership probe — the ingest-time "probably
    * already in the corpus?" gate (the cheap pre-filter in front of exact
    * dedup D1 when the corpus index can't be joined per arriving batch).
    *
    * Docs with doc_id ≡ 0 (mod 10) play the arriving batch; the rest are
    * the standing corpus. The corpus folds into its ≤ m distinct set bit
    * positions with map-side combine — the shuffle is O(m), not O(corpus),
    * exactly the CMS/HLL cell-fold shape — and the bounded bit table
    * broadcasts to the probe side, so probing never shuffles the corpus.
    * The exact-membership column (one hash-key join, co-partitioned at
    * scale, deliberately unhinted) sits next to the Bloom verdict so the
    * one-sided error contract is visible in the output: bloom_hit ≥
    * exact_dup row-wise (no false negatives, property-tested), false
    * positives measurable as bloom_hit=1 ∧ exact_dup=0.
    */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("hx"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val bits = corpus
      .select(explode(bloomPositions(col("hx"))).as("pos"))
      .distinct() // ≤ m = 65536 rows, map-side combined
      .withColumn("hit", lit(1L))
    val member = probe
      .select(col("doc_id"), col("hx"),
        explode(bloomPositions(col("hx"))).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("hx"))
      .agg(min(coalesce(col("hit"), lit(0L))).as("bloom_hit"))
    val corpusSet = corpus.select(col("hx")).distinct()
      .withColumn("ex", lit(1L))
    member.join(corpusSet, Seq("hx"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("ex"), lit(0L)).as("exact_dup"))
  }

  val bloomProbeSql: String = {
    def pos(tbl: String, i: Int): String = (0 until 4).map { j =>
      s"(strpos('0123456789abcdef', substr($tbl.hx, ${4 * i + j + 1}, 1)) - 1) * ${1 << (4 * (3 - j))}"
    }.mkString("(", " + ", ")")
    val corpusPos = (0 until BloomK)
      .map(i => s"SELECT ${pos("c", i)} AS pos FROM corpus c")
      .mkString("\n  UNION\n  ")
    val probePos = (0 until BloomK)
      .map(i => s"SELECT p.doc_id, p.hx, ${pos("p", i)} AS pos FROM probe p")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
       |  SELECT md5(text) AS hx FROM documents WHERE doc_id % 10 <> 0
       |), probe AS (
       |  SELECT doc_id, md5(text) AS hx FROM documents WHERE doc_id % 10 = 0
       |), bits AS (
       |  $corpusPos
       |), pp AS (
       |  $probePos
       |), mem AS (
       |  SELECT pp.doc_id, pp.hx,
       |    CAST(min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |      AS bloom_hit
       |  FROM pp LEFT JOIN bits b ON pp.pos = b.pos
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, bloom_hit,
       |  CAST(CASE WHEN hx IN (SELECT hx FROM corpus) THEN 1 ELSE 0 END
       |    AS BIGINT) AS exact_dup
       |FROM mem""".stripMargin
  }
}
