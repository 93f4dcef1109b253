package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** R-MAT draw kernels, bit-identical to the Column formulation they
  * replace (and therefore to the XXH64-emulating DuckDB oracles —
  * `RMat.unrolledSql` / `actionsUnrolledSql` verify them hash-exactly):
  * every uniform is `pmod(xxhash64(seed, id, salt), 2^40) / 2^40` with
  * Spark's exact fold (`hashLong(salt, hashLong(id, hashLong(seed, 42)))`),
  * and the quadrant thresholds are the same Scala-double sums the Column
  * version folded into literals.
  *
  * Why an expression and not Columns: one R-MAT pair is `scale` chained
  * draws, and the action-insert cascade is 9 pairs — at SCALE 20 that is
  * ~360 inlined hash chains in a single projection, which overflows
  * Janino's 64 KB generated-method limit and silently drops the whole
  * stage to interpreted eval (observed: "Code grows beyond 64 KB" at
  * SCALE 20 generation). The kernel is one method call in the generated
  * code; the loop is plain JIT-compiled Scala. At SCALE 30 on a cluster
  * this is the difference between a codegen'd scan and an interpreted one.
  */
object RmatImpl {

  /** hashLong-fold prefix shared by every draw of one (seed) stream. */
  private def base(id: Long, seed: Long): Long =
    XXH64.hashLong(id, XXH64.hashLong(seed, 42L))

  private val M40 = (1L << 40) - 1L
  private val D40 = (1L << 40).toDouble

  /** The uniform draw `u01(seed, id, salt)` — bit-identical to
    * `pmod(xxhash64(lit(seed), id, lit(salt)), 2^40) / 2^40`.
    */
  def u01(idBase: Long, salt: Long): Double =
    (XXH64.hashLong(salt, idBase) & M40).toDouble / D40

  /** One R-MAT (src, dst) pair for edge id `id` at `saltBase`. */
  def pair(id: Long, scale: Int, saltBase: Long, seed: Long,
      a: Double, ab: Double, abc: Double): Array[Long] = {
    val b = base(id, seed)
    var src = 0L
    var dst = 0L
    var k = 0
    while (k < scale) {
      val r = u01(b, saltBase + k)
      if (r >= ab) src += 1L << k
      if ((r >= a && r < ab) || r >= abc) dst += 1L << k
      k += 1
    }
    Array(src, dst)
  }

  /** The action-insert edge: first non-self-loop among `attempts`
    * independent pairs at salts `insertSalt + a*scale`; the
    * vanishing-probability fallback flips the low dst bit of attempt 0.
    */
  def insertPair(id: Long, scale: Int, seed: Long, a: Double, ab: Double,
      abc: Double, insertSalt: Long, attempts: Int): Array[Long] = {
    var att = 0
    while (att < attempts) {
      val p = pair(id, scale, insertSalt + att.toLong * scale, seed, a, ab, abc)
      if (p(0) != p(1)) return p
      att += 1
    }
    val p0 = pair(id, scale, insertSalt, seed, a, ab, abc)
    Array(p0(0), p0(1) ^ 1L)
  }

  /** The delete-target pick for action `id`: first accepted
    * `floor(u01 * (ne + id))` among `attempts` draws (accepted = a base
    * edge, or an earlier action that was an insert), else the uniform
    * fallback `pmod(hash, max(ne, 1))`.
    */
  def deletePick(id: Long, ne: Long, seed: Long, deleteSalt: Long,
      isDelSalt: Long, pDelete: Double, attempts: Int): Long = {
    val b = base(id, seed)
    var att = 0
    while (att < attempts) {
      val pick = math.floor(u01(b, deleteSalt + att) *
        (ne.toDouble + id.toDouble)).toLong
      if (pick < ne ||
          u01(base(pick - ne, seed), isDelSalt) >= pDelete) return pick
      att += 1
    }
    val m = math.max(ne, 1L)
    val h = XXH64.hashLong(deleteSalt + 99L, b)
    ((h % m) + m) % m // Spark pmod semantics for a non-power-of-2 modulus
  }
}

/** `rmat_pair(id)` → array(src, dst) — one R-MAT draw per row. */
case class RmatPair(child: Expression, scale: Int, saltBase: Long,
    seed: Long, a: Double, b: Double, c: Double) extends UnaryExpression {
  private val ab = a + b
  private val abc = a + b + c
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rmat_pair"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RmatImpl.pair(input.asInstanceOf[Long], scale,
      saltBase, seed, a, ab, abc))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c0 =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.RmatImpl.pair($c0, $scale, ${saltBase}L, ${seed}L, $a, $ab, $abc))")
  override protected def withNewChildInternal(newChild: Expression): RmatPair =
    copy(child = newChild)
}

/** `rmat_insert_pair(id)` → array(src, dst) — the non-self-loop insert
  * cascade of the action generator.
  */
case class RmatInsertPair(child: Expression, scale: Int, seed: Long,
    a: Double, b: Double, c: Double, insertSalt: Long, attempts: Int)
    extends UnaryExpression {
  private val ab = a + b
  private val abc = a + b + c
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rmat_insert_pair"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RmatImpl.insertPair(input.asInstanceOf[Long], scale,
      seed, a, ab, abc, insertSalt, attempts))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c0 =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.RmatImpl.insertPair($c0, $scale, ${seed}L, $a, $ab, $abc, ${insertSalt}L, $attempts))")
  override protected def withNewChildInternal(newChild: Expression): RmatInsertPair =
    copy(child = newChild)
}

/** `rmat_delete_pick(id)` → long — the delete-target index draw. */
case class RmatDeletePick(child: Expression, ne: Long, seed: Long,
    deleteSalt: Long, isDelSalt: Long, pDelete: Double, attempts: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rmat_delete_pick"
  override def nullSafeEval(input: Any): Any =
    RmatImpl.deletePick(input.asInstanceOf[Long], ne, seed, deleteSalt,
      isDelSalt, pDelete, attempts)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c0 =>
      s"graft.functions.RmatImpl.deletePick($c0, ${ne}L, ${seed}L, ${deleteSalt}L, ${isDelSalt}L, $pDelete, $attempts)")
  override protected def withNewChildInternal(newChild: Expression): RmatDeletePick =
    copy(child = newChild)
}

object RmatKernels {
  def rmatPair(id: Column, scale: Int, saltBase: Long, seed: Long,
      a: Double, b: Double, c: Double): Column =
    ColumnBridge.column(RmatPair(ColumnBridge.expression(id), scale,
      saltBase, seed, a, b, c))
  def rmatInsertPair(id: Column, scale: Int, seed: Long, a: Double,
      b: Double, c: Double, insertSalt: Long, attempts: Int): Column =
    ColumnBridge.column(RmatInsertPair(ColumnBridge.expression(id), scale,
      seed, a, b, c, insertSalt, attempts))
  def rmatDeletePick(id: Column, ne: Long, seed: Long, deleteSalt: Long,
      isDelSalt: Long, pDelete: Double, attempts: Int): Column =
    ColumnBridge.column(RmatDeletePick(ColumnBridge.expression(id), ne,
      seed, deleteSalt, isDelSalt, pDelete, attempts))
}
