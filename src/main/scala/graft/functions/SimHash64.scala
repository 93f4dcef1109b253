package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash kernel shared by interpreted eval and generated code.
  *
  * Exactly the semantics of the Column-expression pipeline it replaces
  * (and of the DuckDB oracle): whitespace tokens of the trimmed text —
  * SQL `trim` semantics, stripping SPACES only (Java `String.trim` would
  * also strip tabs/newlines and silently diverge from the oracle on text
  * with leading/trailing non-space whitespace) — then `split("\\s+", -1)`,
  * per-token 64-bit hash = the big-endian first 8 bytes of md5(token)
  * (bit k = bit (k mod 4) of hex digit (15 − k/4) — the same bits the
  * SQL oracle derives from the hex string), ±1 bit-counters weighted by
  * token frequency, fingerprint bit k set iff counter k > 0.
  *
  * One projection per document: no token explode, no 64-column
  * aggregation, no shuffle before the band table.
  */
object SimHash64Impl {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def simhash(s: UTF8String): Long = {
    val str = s.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    val toks = str.substring(lo, hi).split("\\s+", -1)
    val counts = new Array[Int](64)
    val md = digests.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      // big-endian u64 of md5 bytes 0..7
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
      var k = 0
      while (k < 64) {
        if (((v >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      t += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) fp |= 1L << k
      k += 1
    }
    fp
  }
}

/** `simhash64(text)` — 64-bit frequency-weighted SimHash fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.simhash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Impl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64Fn {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
