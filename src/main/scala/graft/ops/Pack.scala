package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sequence packing and the end-to-end curation manifest (SURVEY §2
  * T13/T14) — the last mile of a pretraining-data pipeline: deciding which
  * fixed-length training sequence each document's tokens land in, and the
  * single composed plan that takes a raw corpus to that packed manifest
  * (quality gate → language gate → exact dedup → decontamination → pack).
  *
  * Packing semantics are concat-and-chunk (GPT-style): documents are
  * concatenated in doc_id order and the token stream is cut into
  * [[SeqLen]]-token chunks; a document belongs to the chunk its first
  * token lands in. The manifest (doc_id → chunk_id, token offset) is what
  * a training loader consumes; chunk statistics are the bench-facing
  * aggregate.
  *
  * Scale shape: the global token-offset cumsum is the classic distributed
  * prefix sum, NOT a single-partition window (a bare
  * `Window.orderBy(doc_id)` collapses the whole corpus onto one task —
  * the textbook Spark scale-killer for exactly this operator). Two
  * levels: per-group token sums (map-side-combined aggregate over
  * ceil(N/[[GroupWidth]]) keys), a window over that group table
  * (group-count rows, not corpus rows) for group offsets, then a window
  * partitioned BY group (parallel across groups) for the in-group offset.
  * Pick groupWidth ≈ sqrt(corpus rows) and both levels stay ~sqrt(N); the
  * group table re-joins via AQE broadcast. The corpus itself is touched by
  * exactly two exchanges (the group aggregate's partial-combined map side
  * and the per-group window's hash partition on the SAME key, which AQE
  * plans as one effective repartition).
  */
object Pack {

  /** Training sequence length in BPE tokens. Budgets are measured in
    * learned-tokenizer tokens (r13 verdict item #1 — a production
    * pipeline never chunks on whitespace words): per-document counts
    * come from [[Bpe.tokenCountsKernel]] applying the pinned production
    * vocabulary [[Bpe.PinnedMergesFull]], and the oracle replays the
    * identical table over the distinct-word vocabulary.
    */
  val SeqLen = 2048

  /** Prefix-sum group width (≈ sqrt of bench corpus size; production
    * passes ≈ sqrt(N) so both prefix-sum levels stay ~sqrt(N)-sized).
    */
  val GroupWidth = 64L

  /** Add `tok_start` (global token offset in doc_id order) and `chunk_id`
    * (= floor(tok_start / seqLen)) to a per-document frame that already
    * has `doc_id` and `n_tokens`. All other columns pass through.
    */
  def packIndex(perDoc: DataFrame, seqLen: Int = SeqLen,
      groupWidth: Long = GroupWidth): DataFrame = {
    val grouped = perDoc.withColumn("__grp",
      floor(col("doc_id") / groupWidth).cast("long"))
    // level 1: token total per group — map-side combined, output is
    // ceil(N/groupWidth) rows
    val groupSums = grouped.groupBy(col("__grp"))
      .agg(sum(col("n_tokens")).as("__gtok"))
    // level 2: exclusive cumsum over the (small) group table. The
    // single-partition window here runs over group-count rows, never
    // corpus rows.
    val groupOffsets = groupSums.select(col("__grp"),
      coalesce(sum(col("__gtok")).over(Window.orderBy(col("__grp"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__goff"))
    // level 3: exclusive in-group cumsum, partitioned by group (parallel);
    // no broadcast hint — the group table is runtime-small, AQE decides
    val inGroup = coalesce(sum(col("n_tokens"))
      .over(Window.partitionBy(col("__grp")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    grouped.join(groupOffsets, Seq("__grp"))
      .withColumn("tok_start", col("__goff") + inGroup)
      .withColumn("chunk_id",
        floor(col("tok_start") / lit(seqLen.toDouble)).cast("long"))
      .drop("__grp", "__goff")
  }

  /** T13: packed-chunk statistics over the whole documents table — one row
    * per training sequence: how many docs start in it, their token mass,
    * and the doc_id span (what a loader needs to seek).
    */
  def chunks(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Bpe.tokenCountsKernel(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_tokens"))
    packIndex(perDoc)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  def chunksSql(seqLen: Int = SeqLen): String =
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
       |    AS t
       |  FROM documents
       |), ${Bpe.bpeCountCtes()}, t AS (
       |  SELECT tk.doc_id,
       |    CAST(coalesce(dt.n_tokens, 0) AS BIGINT) AS n_tokens
       |  FROM tk LEFT JOIN dt USING (doc_id)
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |  FROM t)
       |SELECT CAST(floor(tok_start / $seqLen.0) AS BIGINT) AS chunk_id,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  /** Minimum composite quality score (T2 formula) a document must reach to
    * enter the curated set.
    */
  val QualityMin = 0.5

  /** T14: the end-to-end curation manifest — the composed pipeline a
    * pretraining run actually executes, as ONE declarative plan Catalyst
    * optimizes end to end (gates push into the scan; each stage's shuffle
    * reuses the previous stage's output partitioning where keys line up):
    *
    *  1. quality gate: composite score ≥ [[QualityMin]] (T2's formula);
    *  2. language gate: `lang = 'en'`;
    *  3. exact dedup: keep the lowest doc_id per content hash (D1);
    *  4. decontamination: drop any doc sharing an 8-gram with the held-out
    *     benchmark slice (T8's hashed-gram join, benchmark = doc_id % 10);
    *  5. pack the survivors ([[packIndex]]).
    *
    * Output is the per-document training manifest: doc_id, token count,
    * quality, and the training chunk the document starts in.
    */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(pmod(col("doc_id"), lit(10L)) === 0L)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0L)
    val q = TextAnalysis.qualityExprs(col("text"))
    // quality scoring stays T2's whitespace formula; the manifest's
    // n_tokens (and the chunk budget) is the BPE count, joined below
    val kept = corpus.filter(col("lang") === "en")
      .select(col("doc_id"), col("text"), round(q.score, 6).as("quality"))
      .filter(col("quality") >= QualityMin)
    // D1 keep-min-doc_id per content hash, as a window so text rides along
    // for the decontamination stage without a second self-join
    val dedupW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = kept
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    val contaminated = Corpus.decontaminate(
      deduped.select(col("doc_id"), col("text")), bench)
    val clean = deduped
      .join(contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // BPE-count only the survivors (the kernel pass runs after every
    // gate, on the smallest frame)
    val withTok = Bpe.tokenCountsKernel(
      clean.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_tokens"))
    val manifest = clean.select(col("doc_id"), col("quality"))
      .join(withTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    packIndex(manifest)
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("chunk_id"))
  }

  def curateSql(seqLen: Int = SeqLen): String = {
    val stoplist = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    val n = Corpus.DecontamNgram
    val gram = (0 until n).map(j => s"t[i + $j]").mkString(" || ' ' || ")
    s"""WITH raw AS (
       |  SELECT doc_id, lang, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents WHERE doc_id % 10 <> 0
       |), m AS (
       |  SELECT doc_id, lang, text,
       |    len(toks)::DOUBLE AS n_tok,
       |    list_sum(list_transform(toks, x -> length(x)))::DOUBLE AS sum_len,
       |    len(list_filter(toks, x -> x IN ($stoplist)))::DOUBLE AS n_stop
       |  FROM raw
       |), q AS (
       |  SELECT doc_id, lang, text,
       |    round(least(n_tok / 100.0, 1.0) * 0.5 + (n_stop / n_tok) * 0.25
       |      + least((sum_len / n_tok) / 10.0, 1.0) * 0.25, 6) AS quality
       |  FROM m
       |), kept AS (
       |  SELECT doc_id, text, quality FROM q
       |  WHERE lang = 'en' AND quality >= $QualityMin
       |), dd AS (
       |  SELECT doc_id, text, quality FROM (
       |    SELECT *, row_number() OVER (PARTITION BY md5(text)
       |      ORDER BY doc_id) AS rn
       |    FROM kept) WHERE rn = 1
       |), bt AS (
       |  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE doc_id % 10 = 0
       |), bg AS (
       |  SELECT DISTINCT unnest(CASE WHEN len(t) >= $n
       |    THEN list_transform(range(1, len(t) - ${n - 2}), i -> $gram)
       |    ELSE []::VARCHAR[] END) AS gram
       |  FROM bt
       |), ct AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM dd
       |), cg AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= $n
       |    THEN list_transform(range(1, len(t) - ${n - 2}), i -> $gram)
       |    ELSE []::VARCHAR[] END)) AS gram
       |  FROM ct
       |), contam AS (
       |  SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)
       |), clean0 AS (
       |  SELECT doc_id, text, quality FROM dd
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)
       |), tk AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
       |    AS t
       |  FROM clean0
       |), ${Bpe.bpeCountCtes()}, clean AS (
       |  SELECT c0.doc_id,
       |    CAST(coalesce(dt.n_tokens, 0) AS BIGINT) AS n_tokens, c0.quality
       |  FROM clean0 c0 LEFT JOIN dt USING (doc_id)
       |), c AS (
       |  SELECT doc_id, n_tokens, quality,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |  FROM clean)
       |SELECT doc_id, n_tokens, quality,
       |  CAST(floor(tok_start / $seqLen.0) AS BIGINT) AS chunk_id
       |FROM c""".stripMargin
  }
}
