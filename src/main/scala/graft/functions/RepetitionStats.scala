package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document repetition counters (the Gopher/MassiveText
  * quality-filter signals — Rae et al. 2021 §A.1.1: repetitious documents
  * are low-quality; filters threshold on "fraction of characters in the
  * most common n-gram" and "fraction of characters in duplicated n-grams").
  * Re-expressed over whitespace word tokens as count ratios so the DuckDB
  * oracle can mirror them exactly.
  *
  * Tokenization is identical to the other text kernels: SQL `trim`
  * semantics (spaces only) then `split("\\s+", -1)`.
  *
  * Returns integer counters only — the fractions are derived in Column
  * space so the float handling (round(x/y, 6)) is written once, in the
  * query, exactly as in the oracle SQL:
  *   - `n_words`     — token count
  *   - `top_word_n`  — occurrences of the most frequent token
  *   - `top_2gram_n` — occurrences of the most frequent adjacent pair
  *   - `dup_3gram_n` — total instances of 3-grams that occur ≥ 2 times
  *
  * Scale shape: repetition is a per-document property, so it must NOT cost
  * a shuffle — this kernel is one projection inside whole-stage codegen
  * (the explode + groupBy(doc_id, gram) formulation would shuffle the
  * whole corpus' grams to compute a per-row stat).
  */
object RepetitionStatsImpl {

  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    // SQL trim: strip SPACES only (Java String.trim would also strip
    // tabs/newlines and diverge from the oracle)
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    val toks = str.substring(lo, hi).split("\\s+", -1)
    val n = toks.length
    val words = new java.util.HashMap[String, Integer](n * 2)
    var topWord = 0
    var i = 0
    while (i < n) {
      val c = words.merge(toks(i), 1, (a, b) => a + b)
      if (c > topWord) topWord = c
      i += 1
    }
    val g2 = new java.util.HashMap[String, Integer](n * 2)
    var top2 = 0
    i = 0
    while (i < n - 1) {
      val c = g2.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
      if (c > top2) top2 = c
      i += 1
    }
    val g3 = new java.util.HashMap[String, Integer](n * 2)
    i = 0
    while (i < n - 2) {
      g3.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, (a, b) => a + b)
      i += 1
    }
    var dup3 = 0
    val it = g3.values().iterator()
    while (it.hasNext) {
      val c: Int = it.next()
      if (c >= 2) dup3 += c
    }
    new GenericInternalRow(
      Array[Any](n.toLong, topWord.toLong, top2.toLong, dup3.toLong))
  }
}

/** `repetition_stats(text)` — struct of per-document repetition counters. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsImpl.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("top_2gram_n", LongType, nullable = false),
    StructField("dup_3gram_n", LongType, nullable = false)))
}

object RepetitionStatsFn {
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
}
