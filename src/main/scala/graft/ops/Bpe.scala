package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** T1b: REAL byte-pair-encoding token counting (r12 verdict item #5 —
  * T1/T13 count "BPE-ish regex" tokens; production budgets are measured
  * in learned-merge BPE tokens, Sennrich, Haddow & Birch 2016 /
  * Radford et al. 2019 GPT-2 tokenizer).
  *
  * Two halves, split the way production tokenizers split them:
  *
  *  - **Training** ([[train]]) is an offline, driver-side artifact — the
  *    classic BPE loop over a word-frequency dictionary (GPT-2's merges
  *    were trained once on WebText and shipped as a static file; the
  *    zero-egress environment means we learn the table from the corpus
  *    snapshot instead of downloading theirs). Deterministic recipe:
  *    pair counts weight every adjacent symbol pair by word frequency
  *    (overlaps counted), the winner is the max-count pair with
  *    lexicographically-smallest (a, b) tie-break, and each merge
  *    applies leftmost non-overlapping. [[PinnedMerges]] is the frozen
  *    table trained on the sf0.001 documents snapshot; the spec
  *    re-derives it from the same recipe so the constant can never
  *    drift from the trainer.
  *
  *  - **Application** is the distributed operator, and it is pure
  *    codegen — NO UDF, no mapPartitions: each word is wrapped into a
  *    sentinel-bounded symbol string (`␟c␟` per char via one
  *    regexp_replace) and the merge table becomes a CHAIN OF LITERAL
  *    `replace` CALLS, one per merge in learned order. Applying merges
  *    in rank order, each as one leftmost-non-overlapping replace-all
  *    pass, is exactly the standard BPE apply: a merge's pattern can
  *    only reference symbols created by earlier merges, and merging
  *    never deletes symbols, so an earlier pair adjacency can never
  *    reappear after its pass. The per-symbol sentinel wrapping makes a
  *    pair pattern `␟a␟␟b␟` match complete symbols only (a bare
  *    `a␟b` would also match inside longer symbols) and keeps
  *    consecutive matches from sharing boundary characters. Token count
  *    per word falls out arithmetically: every surviving symbol carries
  *    exactly two sentinels, so tokens = (len(sym) − len(sym without
  *    sentinels)) / 2.
  *
  * DuckDB replays the identical chain (same regexp wrap, same literal
  * replaces, same arithmetic), so the operator is hash-oracled — no
  * fixture table, no tolerance. At 100 TB the apply is a narrow
  * per-row projection inside whole-stage codegen over however many
  * merges the vocabulary carries (GPT-2's 50k merges would make the
  * expression chain impractical — there the same contract moves to a
  * broadcast-table mapPartitions kernel; the chain is the right shape
  * for the ≤hundreds-of-merges domain vocabularies this corpus models).
  *
  * The sentinel (U+001F) must not occur in the text — true of any
  * whitespace-tokenized natural-language corpus and asserted for this
  * one in the spec.
  */
object Bpe {
  val Sep = "\u001f"
  val NumMerges = 24

  /** Merge table trained by [[train]] on the sf0.001 documents snapshot
    * (31-word vocabulary) — frozen, like a shipped tokenizer file. The
    * spec re-trains and asserts equality.
    */
  val PinnedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"),
    ("colum", "n"), ("d", "ow"), ("in", "dow"), ("w", "indow"),
    ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"),
  )

  /** Deterministic BPE trainer (see object doc for the exact recipe).
    * Driver-side over a word-frequency dictionary — the dictionary is the
    * bounded artifact (vocabulary-sized, not corpus-sized); at 100 TB it
    * comes out of one distinct-word count aggregation.
    */
  def train(wordCounts: Seq[(String, Long)],
      nMerges: Int = NumMerges): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = wordCounts
      .groupMapReduce(_._1.map(_.toString).toVector)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val maxC = pairCounts.values.max
        val best = pairCounts.collect { case (p, c) if c == maxC => p }
          .minBy(identity)
        merges += best
        val (a, b) = best
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        } { case (_, c) => c }(_ + _)
        step += 1
      }
    }
    merges.result()
  }

  /** BPE token count of one word column — the codegen'd replace chain. */
  def tokenCount(word: Column,
      merges: Seq[(String, String)] = PinnedMerges): Column = {
    val wrapped = regexp_replace(word, "(.)", s"$Sep$$1$Sep")
    val merged = merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))
    }
    ((length(merged) - length(replace(merged, lit(Sep), lit("")))) / 2)
      .cast("long")
  }

  /** Per-document BPE token counts over the documents table:
    * (doc_id, n_words, n_tokens) — the whole apply is one narrow
    * projection (transform + aggregate over the word array), zero
    * shuffles, zero UDFs.
    */
  def textTokensBpe(spark: SparkSession, dir: String,
      merges: Seq[(String, String)] = PinnedMerges): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        aggregate(transform(col("w"), w => tokenCount(w, merges)),
          lit(0L), (acc, x) => acc + x).as("n_tokens"))

  /** DuckDB oracle: the identical wrap → replace chain → sentinel
    * arithmetic (sentinel spelled chr(31) — no control char in the SQL
    * text itself).
    */
  def textTokensBpeSql(
      merges: Seq[(String, String)] = PinnedMerges): String = {
    def s(body: String) = body.replace(Sep, "' || chr(31) || '")
    val chain = merges.foldLeft(
      "regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g')") {
      case (acc, (a, b)) =>
        s"replace($acc, '${s(s"$Sep$a$Sep$Sep$b$Sep")}', " +
          s"'${s(s"$Sep$a$b$Sep")}')"
    }
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
       |    AS t
       |  FROM documents
       |), w AS (SELECT doc_id, unnest(t) AS w FROM tk),
       |s AS (
       |  SELECT doc_id, $chain AS sym FROM w
       |)
       |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_words,
       |  CAST(coalesce(x.n_tokens, 0) AS BIGINT) AS n_tokens
       |FROM tk LEFT JOIN (
       |  SELECT doc_id,
       |    sum((length(sym) - length(replace(sym, chr(31), ''))) / 2)
       |      AS n_tokens
       |  FROM s GROUP BY 1) x USING (doc_id)""".stripMargin
  }
}
