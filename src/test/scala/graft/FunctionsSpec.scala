package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayDot, MinHashSigFn}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("array_dot matches the HOF formulation and handles nulls") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0))).toDF("a", "b")
    val got = df.select(ArrayDot.dot(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(32.0, -2.0))
    val withNull = df.limit(1).select(ArrayDot.dot(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("GraftExtensions registers the functions for SQL users") {
    // TestSpark sets spark.sql.extensions=graft.GraftExtensions — the
    // standard production config path
    val dot = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql("SELECT minhash_sig('hello world hello', 5, 16) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 16)
  }

  test("simhash64 matches an independent hex-digit derivation") {
    import spark.implicits._
    // recompute via the hex-string digit formula (the DuckDB oracle's
    // path), independent of the expression's byte-wise loop
    def expected(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](64)
      // SQL trim semantics: strip spaces only (tabs/newlines stay, exactly
      // as the DuckDB oracle's trim() leaves them for the tokenizer)
      val trimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      trimmed.split("\\s+", -1).foreach { tok =>
        md.reset()
        val hx = md.digest(tok.getBytes("UTF-8"))
          .map(b => f"${b & 0xFF}%02x").mkString
        (0 until 64).foreach { k =>
          val digit = Integer.parseInt(hx.charAt(15 - k / 4).toString, 16)
          if (((digit >> (k % 4)) & 1) == 1) counts(k) += 1 else counts(k) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, k) =>
        if (counts(k) > 0) acc | (1L << k) else acc)
    }
    val texts = Seq("the quick brown fox", "a a a b", "", "  spaced   out  ",
      "unicode tökens über ällés",
      // leading/trailing NON-SPACE whitespace: SQL trim leaves it, so the
      // tokenizer sees a leading/trailing empty token — the kernel must too
      "\tleading tab", "trailing newline\n", " \n mixed \t ")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.SimHash64Fn.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"mismatch on '$t'")
    }
    // SQL registration
    val viaSql = spark.sql("SELECT simhash64('the quick brown fox') AS s")
      .head().getLong(0)
    assert(viaSql == expected("the quick brown fox"))
  }

  test("minhash_sig: identical strings share signatures, estimate tracks jaccard") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val near = base.replace("quick", "quack")
    val far = "completely different content with no shared five grams at all " * 6
    val df = Seq((0L, base), (1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
        MinHashSigFn.minhashSig(col("text"), 5, 126).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(0L), sigs(2L)) > 0.5, "near-dup estimate too low")
    assert(est(sigs(0L), sigs(3L)) < 0.3, "unrelated estimate too high")
    // signature length and short-string handling
    val short = Seq((0L, "ab")).toDF("doc_id", "text")
      .select(MinHashSigFn.minhashSig(col("text"), 5, 126)).head().getSeq[Long](0)
    assert(short.length == 126)
  }

  test("repetition_stats: hand-computed counters and SQL registration") {
    import spark.implicits._
    val df = Seq(
      (0L, "a a a b"),           // top word a×3; 2-grams: "a a"×2, "a b"; no dup 3-gram
      (1L, "x y z x y z"),       // 3-grams: "x y z"×2 of 4 → dup3 = 2
      (2L, "w"),                 // single word: 0 2-grams, 0 3-grams
      (3L, "  p  q  "))          // SQL-trim + multi-space split → p q
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.RepetitionStatsFn.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.top_word_n"),
        col("r.top_2gram_n"), col("r.dup_3gram_n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((4L, 3L, 2L, 0L)))
    assert(got(1L) == ((6L, 2L, 2L, 2L)))
    assert(got(2L) == ((1L, 1L, 0L, 0L)))
    assert(got(3L) == ((2L, 1L, 1L, 0L)))
    val viaSql = spark.sql(
      "SELECT repetition_stats('a a a b').top_word_n AS t").head().getLong(0)
    assert(viaSql == 3L)
  }

  test("repetition_stats matches an explode+groupBy formulation on real docs") {
    // independent derivation: corpus-gram shuffle version of the same
    // counters over the sf0.001 documents (the kernel exists precisely to
    // avoid this plan; here it serves as the cross-check)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = split(trim(col("text")), "\\s+")
    def gram(n: Int) = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    def counts(n: Int) = docs.select(col("doc_id"), explode(gram(n)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val expTop = counts(1).groupBy("doc_id").agg(max(col("c")).as("top_word_n"))
    val expTop2 = counts(2).groupBy("doc_id").agg(max(col("c")).as("top_2gram_n"))
    val expDup3 = counts(3).groupBy("doc_id")
      .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_3gram_n"))
    val expected = expTop.join(expTop2, Seq("doc_id"), "left")
      .join(expDup3, Seq("doc_id"), "left")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = docs.select(col("doc_id"),
        graft.functions.RepetitionStatsFn.repetitionStats(col("text")).as("r"))
      .collect().map { r =>
        val s = r.getStruct(1)
        r.getLong(0) -> ((s.getLong(1), s.getLong(2), s.getLong(3)))
      }.toMap
    assert(got.size == expected.size && got.nonEmpty)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: kernel ${got(id)} != explode $e")
    }
  }
}
