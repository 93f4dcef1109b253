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

  /** Merge budget of the PRODUCTION vocabulary ([[PinnedMergesFull]]).
    * Production tokenizers train to a fixed budget far below corpus
    * saturation (GPT-2: 50k merges against ~10M+ distinct words); this
    * corpus' 31-word vocabulary saturates at 89 merges (every known word
    * one token — which would degenerate BPE counts back to word counts),
    * so the pinned budget sits at 64: the 20 most frequent words are
    * single tokens, the tail stays multi-token, and token budgets
    * measurably differ from whitespace word counts.
    */
  val NumMergesFull = 64

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

  /** Production merge table — [[train]] on the sf0.01 documents snapshot
    * at budget [[NumMergesFull]], frozen like a shipped tokenizer file
    * (the spec re-trains from the same snapshot and asserts equality, so
    * the constant can never drift from the recipe). This is the table
    * the kernel path ([[tokenCountsKernel]]) and the packing/curation
    * token budgets ([[Pack]]) apply.
    */
  val PinnedMergesFull: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"),
    ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"),
    ("in", "e"), ("l", "ine"), ("a", "b"), ("ab", "l"),
    ("abl", "e"), ("at", "a"), ("d", "ata"), ("t", "able"),
    ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"),
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

  // ---------------------------------------------------------------------
  // Production-vocabulary path (r13 verdict item #1): the replace chain
  // above is the right shape for ≤hundreds of merges (one codegen'd
  // projection), but its expression tree grows WITH the table — at a
  // GPT-2-class 10k-50k merges it breaks codegen and pays O(merges)
  // replace scans per word. The production contract its scaladoc
  // specifies is this kernel: the merge table is BROADCAST once, each
  // word is greedily merged by rank, and per-word work is
  // O(symbols × merges-APPLIED) — independent of table size
  // (tools/BpeAb receipts the flatness at 10k entries).
  // ---------------------------------------------------------------------

  /** Train the merge table from the corpus itself: the word-frequency
    * dictionary is one distinct-word count aggregation (map-side
    * combined; the result is vocabulary-sized, not corpus-sized — the
    * bounded artifact the 100 TB path collects), then the driver-side
    * [[train]] loop.
    */
  def trainFromCorpus(spark: SparkSession, dir: String,
      nMerges: Int = NumMergesFull): Seq[(String, String)] = {
    val wordCounts = Tables.documents(spark, dir)
      .select(explode(filter(split(col("text"), " "), t => t =!= ""))
        .as("w"))
      .groupBy(col("w")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(wordCounts, nMerges)
  }

  /** Greedy rank-order BPE encode of one word against a rank table keyed
    * `"a b"` (symbols never contain spaces — words are space-split).
    * Each pass merges every leftmost-non-overlapping
    * occurrence of the lowest-ranked pair present — identical output to
    * applying the merge list in order (a merge's pattern only references
    * symbols built by earlier merges, and merging two symbols never
    * creates an adjacency between pre-existing symbols, so a pair absent
    * now is absent forever; the spec asserts equality against the chain
    * on the whole corpus). Work is O(symbols × merges-applied): the
    * table is only ever probed by present pairs, never scanned.
    */
  def encodeWord(w: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (w.isEmpty) return Array.empty[String]
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val a = syms(bi)
        val b = syms(bi + 1)
        val out = Array.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  private def rankTable(ms: Array[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val ranks = new java.util.HashMap[String, Integer](ms.length * 2)
    var r = 0
    while (r < ms.length) {
      // first-rank-wins like a real tokenizer file (a duplicate pair in a
      // padded A/B table must not shadow its real rank)
      ranks.putIfAbsent(ms(r)._1 + " " + ms(r)._2, r)
      r += 1
    }
    ranks
  }

  /** Per-partition memo ceiling for the word→count cache (the cache is
    * vocabulary-bounded on any natural corpus; the cap only guards a
    * pathological all-distinct-words partition from growing the map
    * unboundedly).
    */
  val KernelMemoMax = 1 << 20

  /** Per-document BPE token counts via the broadcast-merge-table kernel —
    * same output contract as [[textTokensBpe]] ((doc_id, n_words,
    * n_tokens)) but table-size-independent per-word work: one broadcast
    * of the merge table, one mapPartitions pass, a per-partition
    * word→count memo (tokenization is word-local, so each distinct word
    * is encoded once per partition). This is the production apply for
    * ≥10k-merge vocabularies; no shuffle, no UDF registration, the
    * narrow projection shape of the chain with the table out of the
    * expression tree.
    */
  def tokenCountsKernel(docs: DataFrame,
      merges: Seq[(String, String)] = PinnedMergesFull): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = rankTable(bc.value)
        val memo = new java.util.HashMap[String, java.lang.Long]()
        it.map { case (id, ws) =>
          var tot = 0L
          val n = ws.length
          var i = 0
          while (i < n) {
            val w = ws(i)
            var c = memo.get(w)
            if (c == null) {
              c = java.lang.Long.valueOf(encodeWord(w, ranks).length.toLong)
              if (memo.size < KernelMemoMax) memo.put(w, c)
            }
            tot += c.longValue()
            i += 1
          }
          (id, n.toLong, tot)
        }
      }.toDF("doc_id", "n_words", "n_tokens")
  }

  /** Per-document BPE token SEQUENCES (doc_id, toks) — the composition
    * surface: D12's span excision at Lee et al.'s production n=50 runs
    * over these sequences (symbols never contain spaces, so a
    * space-joined sequence round-trips through the word-window
    * operators).
    */
  def encodeDocs(docs: DataFrame,
      merges: Seq[(String, String)] = PinnedMergesFull): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = rankTable(bc.value)
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, ws) =>
          val out = Seq.newBuilder[String]
          ws.foreach { w =>
            var t = memo.get(w)
            if (t == null) {
              t = encodeWord(w, ranks)
              if (memo.size < KernelMemoMax) memo.put(w, t)
            }
            out ++= t
          }
          (id, out.result())
        }
      }.toDF("doc_id", "toks")
  }

  /** T1c: production-vocabulary token counting over the documents table —
    * the kernel apply of [[PinnedMergesFull]].
    */
  def textTokensBpeFull(spark: SparkSession, dir: String): DataFrame =
    tokenCountsKernel(Tables.documents(spark, dir), PinnedMergesFull)

  /** The merge table as a DuckDB list literal: each element is
    * `pattern, chr(1), replacement` concatenated, with the sentinel
    * spelled chr(31) (no control chars in the SQL text).
    */
  private def mergeListSql(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) =>
      def s(x: String) = "'" + x.replace("'", "''") + "'"
      s"chr(31)||${s(a)}||chr(31)||chr(31)||${s(b)}||chr(31)||chr(1)||" +
        s"chr(31)||${s(a + b)}||chr(31)"
    }.mkString("[", ", ", "]")

  /** DuckDB oracle for [[textTokensBpeFull]] — and the reusable per-doc
    * BPE-count CTE block for consumers ([[Pack]]): tokenization is
    * word-local, so the oracle replays the sentinel replace chain over
    * the DISTINCT-word vocabulary only (31 words × merges, not corpus ×
    * merges — `list_reduce` folds the merge list in rank order, exactly
    * the chain) and joins counts back per document.
    */
  def bpeCountCtes(merges: Seq[(String, String)] = PinnedMergesFull,
      corpus: String = "tk"): String =
    s"""vocabulary AS (SELECT DISTINCT unnest(t) AS w FROM $corpus),
       |wtok AS (
       |  SELECT w, CAST((length(sym) - length(replace(sym, chr(31), '')))
       |    / 2 AS BIGINT) AS wt
       |  FROM (SELECT w, list_reduce(
       |      list_prepend(
       |        regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g'),
       |        ${mergeListSql(merges)}),
       |      (acc, x) -> replace(acc, string_split(x, chr(1))[1],
       |                          string_split(x, chr(1))[2])) AS sym
       |    FROM vocabulary)
       |), dt AS (
       |  SELECT d.doc_id, sum(wt) AS n_tokens
       |  FROM (SELECT doc_id, unnest(t) AS w FROM $corpus) d
       |  JOIN wtok USING (w) GROUP BY 1
       |)""".stripMargin

  def textTokensBpeFullSql(
      merges: Seq[(String, String)] = PinnedMergesFull): String =
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
       |    AS t
       |  FROM documents
       |), ${bpeCountCtes(merges)}
       |SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_words,
       |  CAST(coalesce(dt.n_tokens, 0) AS BIGINT) AS n_tokens
       |FROM tk LEFT JOIN dt USING (doc_id)""".stripMargin
}
