package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication operators over the `documents` table (SURVEY §2 D1–D5).
  *
  * Scale story (100 TB): exact dedup and MinHash+LSH are the production
  * paths — both are groupBy/join pipelines whose shuffle keys (content hash,
  * band signature) distribute uniformly. The exact all-pairs n-gram Jaccard
  * is the *oracle* baseline: it is inherently O(n²) in the worst case
  * (common shingles), which is precisely why MinHash exists; at scale run
  * `minhashLsh`, which only ever materializes LSH candidate pairs.
  */
object Dedup {
  val ShingleSize = 5
  val BandRows = 6
  val NumBands = 21
  val NumHashes = BandRows * NumBands // 126
  // Band shape is tuned to the corpus's similarity profile: template-built
  // documents share a baseline 5-gram Jaccard of 0.1–0.35, so 2-row bands
  // would flag ~all n² pairs as candidates (P(cand | j=0.25) = 98% — the
  // verify join becomes quadratic). 6-row × 21-band:
  //   P(cand | j=0.25) ≈ 0.5%   (candidates stay ~linear)
  //   P(miss | j=0.8)  ≈ 0.17%  (contract threshold)
  //   P(miss | j=0.93) ≈ 3e-10  (the planted near-dup range)

  /** Distinct k-character shingles of a string column, as array<string>. */
  def shingles(text: Column, k: Int = ShingleSize): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** Exploded (doc_id, sh) shingle table, distinct per doc. */
  private def shingleTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))

  /** D1: exact dedup by content hash — keep the min doc_id per group. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** D2: exact all-pairs 5-gram Jaccard ≥ threshold (the ground truth the
    * probabilistic methods approximate). Inherently O(n²) on common
    * shingles — the oracle baseline, not the scale path.
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingleTable(spark, dir)
    val inter = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    jaccardFromIntersections(sh, inter, threshold)
  }

  /** Exact Jaccard for an explicit candidate-pair set: only candidate
    * pairs' shingles are ever joined (linear in |cands|·|doc|, never n²).
    */
  private def jaccardOfCandidates(sh: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame = {
    val candSh = broadcast(cands)
      .join(sh.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a"))
    val inter = candSh
      .join(sh.select(col("doc_id"), col("sh").as("sh_b")),
        col("id_b") === col("doc_id") && col("sh") === col("sh_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    jaccardFromIntersections(sh, inter, threshold)
  }

  private def jaccardFromIntersections(sh: DataFrame, inter: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  def ngramJaccardSql(threshold: Double = 0.8): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, substr(text, i::INT, $ShingleSize) AS sh
       |  FROM documents, unnest(range(1, greatest(length(text) - ${ShingleSize - 2}, 2))) AS t(i)
       |),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
       |  SELECT id_a, id_b,
       |    inter::DOUBLE / (x.n + y.n - inter) AS j
       |  FROM inter JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id) t
       |WHERE j >= $threshold""".stripMargin

  /** D3: MinHash + LSH banding, exact-verified. 126 signatures via double
    * hashing; 21 bands × 6 rows hashed to a band key; docs sharing any band
    * key become candidates; candidates are verified with exact Jaccard so
    * the output equals `ngramJaccard` up to band-recall (≈1-3e-10 on the
    * planted j≥0.93 pairs) — which is why the DuckDB oracle is the exact
    * all-pairs SQL.
    *
    * This is the 100 TB path: shingle explode is linear, the signature
    * groupBy has map-side combine, band buckets are uniform, and the
    * verification join touches only candidate pairs.
    */
  /** (doc_id, sig: array<long>) MinHash signatures for a (doc_id, text)
    * table — shared by the pipeline and its profiler so stage timings
    * always measure the code that actually runs.
    */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.MinHashSigFn.minhashSig(col("text"), ShingleSize, NumHashes).as("sig"))

  /** (doc_id, band, bsig): one hashed band key per signature slice. */
  def bandTable(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until NumBands).map { j =>
      val rows = (0 until BandRows).map(r =>
        element_at(col("sig"), j * BandRows + r + 1))
      struct(lit(j).as("band"), xxhash64(rows: _*).as("bsig"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
  }

  /** Distinct (id_a < id_b) pairs sharing any band bucket. */
  def candidatePairs(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the signature projection is compute-bound: make sure a small file
    // count doesn't serialize it onto a few cores (a 100 TB corpus is
    // already wide — the guard is a no-op there)
    val p = spark.sparkContext.defaultParallelism
    val wide = if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
    // full signature in ONE codegen'd projection (graft.functions.MinHashSig)
    // — no shingle explode, no 126-column aggregation, no shuffle before
    // the band buckets
    val sigs = signatures(wide)
    val cands = candidatePairs(bandTable(sigs)).persist()
    // exact-verify only candidate documents: semi-join the corpus down to
    // docs that appear in some candidate pair before exploding shingles
    val candIds = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
    val sh = docs.join(broadcast(candIds), "doc_id")
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
    // cands stays cached until the returned plan is executed (it feeds both
    // the semi-join and the verification); entry is candidate-pair-sized
    jaccardOfCandidates(sh, cands, threshold)
  }

  /** D4: SimHash (64-bit, whitespace tokens, token-frequency weighted) with
    * 4×16-bit band blocking; near-dup pairs at Hamming distance ≤ maxHamming.
    * (No SQL-expressible oracle — xxhash64 is Spark-side; checked by tests
    * against the planted near-dup pairs.)
    */
  /** 64-bit SimHash fingerprints (whitespace tokens, frequency weighted). */
  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$k"))
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k => when(col(s"b$k") > 0L, lit(1L) * lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val fps = simhashFingerprints(spark, dir)
    val banded = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.key"))
    banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** D5: embedding cosine near-dup pairs ≥ threshold. Brute-force all-pairs
    * (the scale path is `Similarity.annLsh` bucketing).
    */
  def embeddingCosine(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  def embeddingCosineSql(threshold: Double = 0.4): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.v, b.v) >= $threshold""".stripMargin
}
