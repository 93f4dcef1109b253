package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Text-analysis operators over `documents` (SURVEY §2 T1–T4). All pure
  * Column expressions (whole-stage codegen; no UDFs), each mirrored exactly
  * by a DuckDB oracle.
  */
object TextAnalysis {

  private[graft] def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish piece pattern: letter runs, single digits, single symbols. */
  val PiecePattern = "[a-z]+|[A-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  /** T1: token counting — whitespace tokens and regex "pieces". */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      regexp_count(col("text"), lit(PiecePattern)).cast("long").as("n_pieces"))

  val tokenCountsSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '$PiecePattern')) AS BIGINT) AS n_pieces
       |FROM documents""".stripMargin

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  /** T2: quality scoring — length, average token length, stopword ratio,
    * and a composite score. A deterministic rational formula so the oracle
    * matches bit-for-bit (after rounding).
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityExprs(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      q.nTok.cast("long").as("n_tokens"),
      round(q.avgLen, 6).as("avg_token_len"),
      round(q.stopRatio, 6).as("stopword_ratio"),
      round(q.score, 6).as("quality"))
  }

  /** The T2 column bundle, shared with the curation pipeline (Pack.curate)
    * so both produce bit-identical scores.
    */
  case class QualityExprs(nTok: Column, avgLen: Column, stopRatio: Column,
      score: Column)

  def qualityExprs(text: Column): QualityExprs = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    val avgLen = sumLen / nTok
    val stopRatio = nStop / nTok
    val score = least(nTok / 100.0, lit(1.0)) * 0.5 +
      stopRatio * 0.25 + least(avgLen / lit(10.0), lit(1.0)) * 0.25
    QualityExprs(nTok, avgLen, stopRatio, score)
  }

  val qualitySql: String = {
    val stoplist = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, n_chars,
       |    len(toks)::DOUBLE AS n_tok,
       |    list_sum(list_transform(toks, x -> length(x)))::DOUBLE AS sum_len,
       |    len(list_filter(toks, x -> x IN ($stoplist)))::DOUBLE AS n_stop
       |  FROM t)
       |SELECT doc_id,
       |  CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(n_tok AS BIGINT) AS n_tokens,
       |  round(sum_len / n_tok, 6) AS avg_token_len,
       |  round(n_stop / n_tok, 6) AS stopword_ratio,
       |  round(least(n_tok / 100.0, 1.0) * 0.5 + (n_stop / n_tok) * 0.25
       |    + least((sum_len / n_tok) / 10.0, 1.0) * 0.25, 6) AS quality
       |FROM m""".stripMargin
  }

  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les", "des", "il"))

  /** T3: language-ID via stopword-hit argmax (n-gram-free heuristic;
    * deterministic tie-break: earlier list wins at equal score, 'und'
    * (unknown) when no list hits).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val hits = LangStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words))).cast("long")
    }
    val best = hits.tail.foldLeft(
      struct(hits.head._2.as("score"), lit(hits.head._1).as("lang"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"),
          struct(score.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    Tables.documents(spark, dir).select(
      (col("doc_id") +: hits.map { case (l, c) => c.as(s"hits_$l") }) :+
        when(best.getField("score") > 0L, best.getField("lang"))
          .otherwise(lit("und")).as("lang_pred"): _*)
  }

  val langIdSql: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val hitCols = LangStopwords.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN (${inList(ws)})))::BIGINT AS hits_$l"
    }.mkString(",\n    ")
    // same fold as the Spark side: strictly-greater replaces, so earlier
    // languages win ties
    val langs = LangStopwords.map(_._1)
    val bestExpr = langs.tail.foldLeft(
      s"{'a': hits_${langs.head}, 'b': '${langs.head}'}") {
      case (acc, l) =>
        s"CASE WHEN hits_$l > ($acc).a THEN {'a': hits_$l, 'b': '$l'} ELSE $acc END"
    }
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |), h AS (
       |  SELECT doc_id,
       |    $hitCols
       |  FROM t
       |), b AS (
       |  SELECT *, $bestExpr AS best FROM h)
       |SELECT doc_id, ${langs.map(l => s"hits_$l").mkString(", ")},
       |  CASE WHEN (best).a > 0 THEN (best).b ELSE 'und' END AS lang_pred
       |FROM b""".stripMargin
  }

  val FingerprintMod = 1000000007L

  /** T4: document fingerprint — rolling polynomial hash over characters,
    * `acc = (acc*31 + ascii(c)) mod 1e9+7`. Left-to-right fold in both
    * engines (Spark aggregate with zero seed ≡ DuckDB list_reduce whose
    * first element seeds: 0*31 + c1 = c1).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, c) => pmod(acc * 31L + c, lit(FingerprintMod))).as("fp"))

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN length(text) = 0 THEN 0
       |    ELSE list_reduce(
       |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
       |      (acc, c) -> (acc * 31 + c) % $FingerprintMod)
       |  END AS fp
       |FROM documents""".stripMargin

  /** T7: text normalization — the canonical pre-dedup cleanup: lowercase,
    * strip punctuation to spaces, collapse whitespace runs, trim. Pure
    * codegen'd Column expressions; emitted with the md5 of the normalized
    * form (what an exact-dedup stage would key on).
    */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "),
      "\\s+", " "))
    Tables.documents(spark, dir).select(
      col("doc_id"), norm.as("norm_text"),
      length(norm).cast("long").as("n_chars"),
      md5(norm).as("norm_hash"))
  }

  val normalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |       '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |       '\s+', ' ', 'g'))) AS BIGINT) AS n_chars,
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |       '\s+', ' ', 'g'))) AS norm_hash
      |FROM documents""".stripMargin

  /** Lower-cased whitespace terms, one row per occurrence. Widened to the
    * core count when the input arrives as one small file (no-op at scale).
    */
  private def termTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val p = spark.sparkContext.defaultParallelism
    val wide = if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
    wide.select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
  }

  /** T5: TF-IDF top-k terms per document —
    * tfidf = tf * ln((N+1)/(df+1)), deterministic tie-break on term.
    * Two shuffles (term stats, per-doc window). The df table gets no
    * broadcast hint: a web-scale corpus has a non-broadcastable vocabulary
    * — tf and df are both aggregates keyed on term, so the join co-locates
    * on the existing exchange, and AQE still broadcasts small vocabularies
    * at runtime.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = termTable(spark, dir)
    val n = Tables.documents(spark, dir).count().toDouble
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, "term")
      .withColumn("tfidf",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  def tfidfSql(k: Int = 5): String =
    s"""WITH terms AS (
       |  SELECT doc_id, t.term FROM documents,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(term)
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, tf.term, tf, df,
       |    round(tf * ln(((SELECT n FROM n) + 1.0) / (df + 1.0)), 6) AS tfidf
       |  FROM tf JOIN df ON tf.term = df.term
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= $k""".stripMargin

  /** T19: unigram LM cross-entropy — the CCNet/LLaMA-pipeline "perplexity
    * filter" signal: score each document by the mean negative log
    * likelihood of its tokens under the corpus's own unigram distribution
    * (nats/token). Templated/boilerplate text scores low, rare-token soup
    * scores high; production filters both tails.
    *
    * One term explode feeds both the vocabulary count and the token⋈vocab
    * join — tf and c are aggregates keyed on term, so the join co-locates
    * on the existing exchange and AQE broadcasts small vocabularies at
    * runtime (a web-scale vocabulary stays a shuffle join, correctly).
    * The per-doc aggregate is map-side combined; nothing driver-side but
    * the scalar token total.
    */
  def unigramXent(spark: SparkSession, dir: String): DataFrame = {
    val terms = termTable(spark, dir)
    val cnt = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum(col("c"))).head().getLong(0).toDouble
    terms.join(cnt, "term")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(log(col("c").cast("double") / lit(total))) /
          count(lit(1)), 4).as("xent_nats"))
  }

  val unigramXentSql: String =
    """WITH terms AS (
      |  SELECT doc_id, t.term FROM documents,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t(term)
      |), cnt AS (SELECT term, count(*) AS c FROM terms GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(-sum(ln(c / (SELECT t FROM tot))) / count(*), 4) AS xent_nats
      |FROM terms JOIN cnt USING (term)
      |GROUP BY doc_id""".stripMargin

  /** T6: corpus-level word n-gram counts, top-k — the "what does the corpus
    * repeat" profile. One explode + one count shuffle; top-k via a single
    * global sort of the (small) distinct-ngram aggregate.
    */
  def corpusNgrams(spark: SparkSession, dir: String, n: Int = 2,
      k: Int = 50): DataFrame = {
    val toks = tokens(lower(col("text")))
    // guard: Spark's sequence(1, 0) is the DESCENDING [1, 0], so short
    // documents need an explicit empty array, not an empty-range hope
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    val docs = Tables.documents(spark, dir)
    val p = spark.sparkContext.defaultParallelism
    val wide = if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
    wide.select(explode(grams).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  def corpusNgramsSql(n: Int = 2, k: Int = 50): String = {
    val parts = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    s"""WITH t AS (
       |  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents
       |), g AS (
       |  SELECT $parts AS ngram
       |  FROM t, unnest(range(1, greatest(len(toks) - ${n - 2}, 1))) AS u(i)
       |)
       |SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY 1
       |ORDER BY n_occurrences DESC, ngram ASC LIMIT $k""".stripMargin
  }

  /** T11: per-document repetition metrics — the Gopher/MassiveText quality
    * signals (Rae et al. 2021 §A.1.1: threshold on the most-common-n-gram
    * fraction and the duplicated-n-gram fraction to drop boilerplate and
    * spam), as count ratios over word tokens:
    *
    *   - `top_word_frac`  — most frequent token / token count
    *   - `top_2gram_frac` — most frequent adjacent pair / 2-gram count
    *   - `dup_3gram_frac` — instances of repeated 3-grams / 3-gram count
    *
    * One [[graft.functions.RepetitionStats]] codegen projection per row —
    * repetition is a per-document property, so unlike T5/T6 it costs no
    * explode and no shuffle (the corpus-gram groupBy formulation would
    * shuffle every gram in the corpus to compute a per-row stat).
    * Fractions over short docs are NULL, not a division error.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val r = graft.functions.RepetitionStatsFn.repetitionStats(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), r.as("r"))
      .select(col("doc_id"),
        col("r.n_words").as("n_words"),
        round(col("r.top_word_n").cast("double") / col("r.n_words"), 6)
          .as("top_word_frac"),
        when(col("r.n_words") > 1,
          round(col("r.top_2gram_n").cast("double") / (col("r.n_words") - 1), 6))
          .as("top_2gram_frac"),
        when(col("r.n_words") > 2,
          round(col("r.dup_3gram_n").cast("double") / (col("r.n_words") - 2), 6))
          .as("dup_3gram_frac"))
  }

  val repetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |  FROM documents
      |), base AS (
      |  SELECT doc_id, len(ws) AS n_words FROM t
      |), topw AS (
      |  SELECT doc_id, max(c) AS top_word_n FROM (
      |    SELECT doc_id, w, count(*) AS c
      |    FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w)
      |  GROUP BY doc_id
      |), top2 AS (
      |  SELECT doc_id, max(c) AS top_2gram_n FROM (
      |    SELECT doc_id, g, count(*) AS c
      |    FROM (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
      |          FROM t, unnest(range(1, len(ws))) AS u(i)) GROUP BY doc_id, g)
      |  GROUP BY doc_id
      |), dup3 AS (
      |  SELECT doc_id, coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS dup_3gram_n
      |  FROM (
      |    SELECT doc_id, g, count(*) AS c
      |    FROM (SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
      |          FROM t, unnest(range(1, len(ws) - 1)) AS u(i)) GROUP BY doc_id, g)
      |  GROUP BY doc_id
      |)
      |SELECT b.doc_id,
      |  CAST(b.n_words AS BIGINT) AS n_words,
      |  round(topw.top_word_n / b.n_words::DOUBLE, 6) AS top_word_frac,
      |  CASE WHEN b.n_words > 1
      |    THEN round(top2.top_2gram_n / (b.n_words - 1)::DOUBLE, 6) END
      |    AS top_2gram_frac,
      |  CASE WHEN b.n_words > 2
      |    THEN round(dup3.dup_3gram_n / (b.n_words - 2)::DOUBLE, 6) END
      |    AS dup_3gram_frac
      |FROM base b
      |LEFT JOIN topw USING (doc_id)
      |LEFT JOIN top2 USING (doc_id)
      |LEFT JOIN dup3 USING (doc_id)""".stripMargin

  // --- T15: PII detection + redaction -------------------------------------

  /** Simple-by-design patterns (no backrefs/lookaheads) so the Java-regex
    * (Spark) and RE2 (DuckDB) engines agree on every match.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** T15: PII detection + redaction. The synthetic corpus contains no PII,
    * so the query first plants it deterministically (emails on doc_id%3,
    * phones on %5, IPv4s on %7 — derived from doc_id identically in both
    * engines), then counts each category and redacts in a fixed
    * email→phone→ip order (the orders can't overlap by construction, but a
    * fixed order keeps the output well-defined on adversarial text too).
    *
    * Pure per-row Column work — regexp_count / regexp_replace are codegen'd
    * native expressions, zero exchanges, the shape that streams at 100 TB.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val planted = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), id, lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
          (col("doc_id") % 100).cast("string"))).otherwise(lit("")))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(planted, lit(EmailPattern), lit("<EMAIL>")),
        lit(PhonePattern), lit("<PHONE>")),
      lit(Ipv4Pattern), lit("<IP>"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      regexp_count(planted, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(planted, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(planted, lit(Ipv4Pattern)).cast("long").as("n_ips"),
      md5(redacted.cast("binary")).as("redacted_md5"))
  }

  val piiRedactSql: String = {
    // DuckDB single-quoted literals don't process backslashes — the Scala
    // pattern strings inline verbatim
    val (email, phone, ip) = (EmailPattern, PhonePattern, Ipv4Pattern)
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0
       |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       |              || CAST(doc_id % 100 AS VARCHAR)
       |         ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g')) AS redacted_md5
       |FROM planted""".stripMargin
  }

  // --- T16: inverted index ------------------------------------------------

  /** T16: corpus inverted index — per term: document frequency, total
    * occurrences, and a bounded posting list (first `cap` doc_ids ascending,
    * comma-joined).
    *
    * Scale shape: the per-(term, doc) counts aggregate map-side before the
    * term shuffle; the posting list is capped BEFORE collection via a
    * row_number window (never `collect_list` the full postings — a stopword
    * term's list is O(corpus) and would OOM a single aggregation buffer at
    * 100 TB; real systems shard postings exactly this way). Stats and
    * postings both shuffle on `term`, so AQE plans the final join
    * exchange-free.
    */
  def invertedIndex(spark: SparkSession, dir: String, cap: Int = 20): DataFrame = {
    val termDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val stats = termDoc.groupBy(col("term")).agg(
      count(lit(1)).as("df"),
      sum(col("n")).as("n_occurrences"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val postings = termDoc
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("term"))
      .agg(array_join(
        transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
        ",").as("postings"))
    stats.join(postings, "term")
      .select(col("term"), col("df"), col("n_occurrences"), col("postings"))
  }

  def invertedIndexSql(cap: Int = 20): String =
    s"""WITH td AS (
       |  SELECT term, doc_id, count(*) AS n
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |        FROM documents)
       |  GROUP BY 1, 2
       |), stats AS (
       |  SELECT term, count(*) AS df, CAST(sum(n) AS BIGINT) AS n_occurrences
       |  FROM td GROUP BY 1
       |), topd AS (
       |  SELECT term, doc_id FROM (
       |    SELECT term, doc_id,
       |      row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |    FROM td) WHERE rn <= $cap
       |), posting AS (
       |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
       |    AS postings
       |  FROM topd GROUP BY 1
       |)
       |SELECT term, df, n_occurrences, postings
       |FROM stats JOIN posting USING (term)""".stripMargin

  // --- T17: count-min-sketch heavy hitters --------------------------------

  /** CMS geometry: depth 4 × width 4096. The four hash functions are four
    * disjoint 3-hex-digit windows of ONE md5 per term (12 bits each ⇒ the
    * width needs no modulo), so the sketch is deterministic and the SAME
    * hashes are computable in DuckDB — even the approximate sketch is
    * hash-oracle-checkable, unlike seed-dependent sketch libraries.
    */
  val CmsDepth = 4
  val CmsWidth = 4096

  private[graft] def cmsBuckets(hx: Column): Column =
    array((0 until CmsDepth).map { s =>
      struct(lit(s).as("s"),
        conv(substring(hx, 3 * s + 1, 3), 16, 10).cast("long").as("bucket"))
    }: _*)

  /** T17: heavy hitters — the exact top-k terms with their count-min-sketch
    * estimates (Cormode & Muthukrishnan 2005) next to the exact counts.
    *
    * The sketch build is the 100 TB shape: token increments aggregate into
    * ≤ depth×width = 16k cells with map-side combine, so the shuffle is
    * O(sketch), not O(corpus) — on a cluster each executor folds its
    * partition into partial cells and only the 16k-cell table moves. The
    * exact top-k (one term-shuffle) is the ground truth the estimates are
    * judged against; CMS error is one-sided (n_cms ≥ n_exact always,
    * property-tested), which the oracle exposes by comparing both columns.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term"))
    val sketch = toks
      .select(explode(cmsBuckets(md5(col("term").cast("binary")))).as("sb"))
      .groupBy(col("sb.s").as("s"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term").asc).limit(k)
    val cand = exact
      .select(col("term"), col("n_exact"),
        explode(cmsBuckets(md5(col("term").cast("binary")))).as("sb"))
      .select(col("term"), col("n_exact"),
        col("sb.s").as("s"), col("sb.bucket").as("bucket"))
    broadcast(cand).join(sketch, Seq("s", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .select(col("term"), col("n_exact"), col("n_cms"))
  }

  /** Oracle for the raw sketch cells (X9's continuously-maintained state):
    * the md5-window hashes are deterministic, so even the *approximate*
    * sketch is hash-exact between engines — no tolerance band.
    */
  val cmsSketchSql: String = {
    def bucket(off: Int): String = (0 until 3).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${off + i}, 1)) - 1) * ${1 << (4 * (2 - i))}"
    }.mkString("(", " + ", ")")
    val incs = (0 until CmsDepth).map { s =>
      s"SELECT $s AS s, ${bucket(3 * s + 1)} AS bucket FROM h"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents
       |), h AS MATERIALIZED (SELECT md5(term) AS hx FROM toks),
       |inc AS (
       |  $incs
       |)
       |SELECT CAST(s AS BIGINT) AS s, CAST(bucket AS BIGINT) AS bucket,
       |  count(*) AS c
       |FROM inc GROUP BY 1, 2""".stripMargin
  }

  def heavyHittersSql(k: Int = 20): String = {
    // 3-hex-digit window at 1-based offset `off` as an integer (DuckDB has
    // no conv(); positional strpos digit sum, as in the sampling oracle)
    def bucket(off: Int): String = (0 until 3).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${off + i}, 1)) - 1) * ${1 << (4 * (2 - i))}"
    }.mkString("(", " + ", ")")
    val incs = (0 until CmsDepth).map { s =>
      s"SELECT $s AS s, ${bucket(3 * s + 1)} AS bucket FROM h"
    }.mkString("\n  UNION ALL ")
    val cbs = (0 until CmsDepth).map { s =>
      s"SELECT term, n_exact, $s AS s, ${bucket(3 * s + 1)} AS bucket FROM eh"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents
       |), h AS MATERIALIZED (SELECT md5(term) AS hx FROM toks),
       |inc AS (
       |  $incs
       |), sketch AS MATERIALIZED (
       |  SELECT s, bucket, count(*) AS c FROM inc GROUP BY 1, 2
       |), exact AS MATERIALIZED (
       |  SELECT term, n_exact FROM (
       |    SELECT term, count(*) AS n_exact,
       |      row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
       |    FROM toks GROUP BY term) WHERE rn <= $k
       |), eh AS (SELECT term, n_exact, md5(term) AS hx FROM exact),
       |cb AS (
       |  $cbs
       |)
       |SELECT term, n_exact, CAST(min(c) AS BIGINT) AS n_cms
       |FROM cb JOIN sketch USING (s, bucket)
       |GROUP BY term, n_exact""".stripMargin
  }
  // --- T20: HyperLogLog distinct-count sketch ------------------------------

  /** HLL geometry: 2^12 = 4096 registers (first 3 hex digits of the md5
    * route to a register; the next 15 hex digits = 60 bits feed the
    * leading-zero rank), standard error 1.04/√m ≈ 1.6%.
    */
  val HllM = 4096

  /** T20: distinct-token estimate via HyperLogLog (Flajolet et al. 2007).
    *
    * The register build is the 100 TB sketch shape (as T17's count-min):
    * token hashes fold map-side into ≤ 4096 (register, max-rank) cells, so
    * the shuffle is O(m), not O(corpus) — the exact-distinct alternative
    * shuffles every distinct token. Like T17, the hash is an md5 window
    * rather than a seed-dependent library hash, so the registers AND the
    * estimate are deterministic and the DuckDB oracle checks the sketch
    * itself, not just a tolerance band.
    *
    * The register sum Σ 2^(61−M_j) is accumulated in DECIMAL(38,0) —
    * integer-exact, so the one double division at the end is
    * order-independent (a double Σ 2^−M_j would round differently under
    * Spark's vs DuckDB's summation order). Small-range correction (linear
    * counting when E ≤ 2.5m with empty registers) matches the paper.
    */
  /** The (register, max-rank) table for a `term` column — shared by T20's
    * estimator and X11's streaming maintenance.
    */
  private[graft] def hllRegistersOf(terms: DataFrame): DataFrame = {
    val hx = md5(col("term").cast("binary"))
    val rest = substring(hx, 4, 15) // 60 bits after the 12 register bits
    val z = length(regexp_extract(rest, "^0*", 0)) // leading zero hex digits
    val d = rest.substr(z + lit(1), lit(1)) // first non-zero hex digit
    val dlz = when(d === "1", 3).when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1).otherwise(0)
    val rho = when(z === 15, lit(61)).otherwise(lit(4) * z + dlz + lit(1))
    terms
      .select(conv(substring(hx, 1, 3), 16, 10).cast("long").as("register"),
        rho.as("rho"))
      .groupBy(col("register")).agg(max(col("rho")).as("m_j"))
  }

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val regs = hllRegistersOf(Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term")))
    val twoPow61 = 2305843009213693952L // 2^61, exact in a double
    regs.agg(
        count(lit(1)).as("filled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 61 - m_j)")
          .cast(DecimalType(38, 0))).as("s_present"))
      .select(
        lit(HllM.toLong).as("m"),
        col("filled").cast("long").as("filled"),
        // alpha_m * m^2 / Σ 2^−M_j, empty registers contributing 2^0 each
        ((lit(0.7213 / (1.0 + 1.079 / HllM)) * HllM * HllM) /
          ((col("s_present").cast("double") +
            (lit(HllM.toLong) - col("filled")).cast("double") * twoPow61.toDouble) /
            twoPow61.toDouble)).as("raw"))
      .select(col("m"), col("filled"),
        round(when(col("raw") <= 2.5 * HllM && col("filled") < HllM,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) /
              (lit(HllM.toLong) - col("filled")).cast("double")))
          .otherwise(col("raw")), 3).as("est_distinct"))
  }

  /** Oracle for the raw register table (X11's continuously-maintained
    * state) — shares the exact hash/rank arithmetic with T20's oracle.
    */
  val hllRegistersSql: String = {
    val reg = (0 until 3).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1) * ${1 << (4 * (2 - i))}"
    }.mkString("(", " + ", ")")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents
       |), h AS (SELECT md5(term) AS hx FROM toks),
       |br AS (
       |  SELECT $reg AS register, substr(hx, 4, 15) AS rest FROM h
       |), rk AS (
       |  SELECT register,
       |    CASE WHEN length(regexp_extract(rest, '^0*')) = 15 THEN 61
       |         ELSE 4 * length(regexp_extract(rest, '^0*'))
       |           + CASE substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1)
       |               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |               WHEN '7' THEN 1 ELSE 0 END + 1
       |    END AS rho
       |  FROM br
       |)
       |SELECT register, CAST(max(rho) AS BIGINT) AS m_j
       |FROM rk GROUP BY 1""".stripMargin
  }

  val hllDistinctSql: String = {
    // 3-hex-digit register index (DuckDB has no conv(); positional digit sum)
    val reg = (0 until 3).map { i =>
      s"(strpos('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1) * ${1 << (4 * (2 - i))}"
    }.mkString("(", " + ", ")")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents
       |), h AS (SELECT md5(term) AS hx FROM toks),
       |br AS (
       |  SELECT $reg AS register, substr(hx, 4, 15) AS rest FROM h
       |), rk AS (
       |  SELECT register,
       |    CASE WHEN length(regexp_extract(rest, '^0*')) = 15 THEN 61
       |         ELSE 4 * length(regexp_extract(rest, '^0*'))
       |           + CASE substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1)
       |               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |               WHEN '7' THEN 1 ELSE 0 END + 1
       |    END AS rho
       |  FROM br
       |), regs AS (
       |  SELECT register, max(rho) AS m_j FROM rk GROUP BY 1
       |), s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS filled,
       |    sum(CAST((CAST(1 AS BIGINT) << (61 - m_j)) AS HUGEINT)) AS s_present
       |  FROM regs
       |), raw AS (
       |  SELECT filled,
       |    (CAST(${0.7213 / (1.0 + 1.079 / 4096)} AS DOUBLE) * 4096 * 4096) /
       |      ((CAST(s_present AS DOUBLE)
       |        + CAST(4096 - filled AS DOUBLE) * 2305843009213693952.0)
       |       / 2305843009213693952.0) AS raw
       |  FROM s
       |)
       |SELECT CAST(4096 AS BIGINT) AS m, filled,
       |  round(CASE WHEN raw <= ${2.5 * 4096} AND filled < 4096
       |    THEN 4096.0 * ln(4096.0 / CAST(4096 - filled AS DOUBLE))
       |    ELSE raw END, 3) AS est_distinct
       |FROM raw""".stripMargin
  }
}
