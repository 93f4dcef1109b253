package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, deterministic R-MAT graph generator — the Spark re-expression
  * of the reference's `rmatter` (ref: rmatter/src/rmatter.c; README.md:
  * A=0.55 B=0.1 C=0.1 D=0.25, nv = 2^SCALE, ne = nv * edgeFactor).
  *
  * The reference generates edges sequentially from a seeded RNG. Here each
  * edge id gets its bits from `xxhash64(seed, edge_id, bit_level)`, so
  * generation is embarrassingly parallel (`spark.range` partitions across
  * the cluster), reproducible independent of partitioning, and entirely
  * whole-stage-codegen'd Column arithmetic — no RNG state, no UDF. A
  * 2^30-vertex, 2^33-edge graph is a one-liner on a real cluster.
  */
object RMat {

  final case class Params(
      scale: Int,
      edgeFactor: Int = 8,
      a: Double = 0.55, b: Double = 0.1, c: Double = 0.1, d: Double = 0.25,
      seed: Long = 42L)

  /** Uniform double in [0,1) from a 64-bit hash of (seed, id, salt). */
  private def u01(p: Params, idc: Column, salt: Long): Column =
    (pmod(xxhash64(lit(p.seed), idc, lit(salt)), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  /** (src, dst) edge table with nv*edgeFactor rows. The draw chain runs in
    * the [[graft.functions.RmatImpl]] codegen kernel: as one inlined
    * Column expression it is `scale` chained hashes per edge, which
    * overflows Janino's 64 KB method limit past SCALE ~19 and drops the
    * scan to interpreted eval; the kernel is one call in the generated
    * code at any SCALE. Bit-identical to the Column formulation the
    * DuckDB oracle emulates.
    */
  def edges(spark: SparkSession, p: Params): DataFrame = {
    val ne = (1L << p.scale) * p.edgeFactor
    val pr = graft.functions.RmatKernels.rmatPair(
      col("id"), p.scale, 0L, p.seed, p.a, p.b, p.c)
    spark.range(ne).select(pr.as("p"))
      .select(col("p").getItem(0).as("src"), col("p").getItem(1).as("dst"))
  }

  /** Weighted graph: multiplicities collapsed, like the CSR the reference
    * writes (duplicate R-MAT edges accumulate weight).
    */
  def graph(spark: SparkSession, p: Params): Graph =
    Graph(edges(spark, p).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight")))

  /** DuckDB oracle for the R-MAT edge generator: the per-edge xxhash64
    * draws are emulated exactly — Spark's XXH64.hashLong (seed chaining
    * `xxhash64(seed, id, salt)` = hashLong(salt, hashLong(id,
    * hashLong(seed, 42)))) is unrolled into nested-subquery steps doing
    * 64-bit wraparound arithmetic on HUGEINT (32-bit split multiplies mod
    * 2^64; DuckDB integer ops trap on overflow, and lateral aliases
    * re-inline exponentially, hence one subquery per step). The constant
    * prefix hashLong(seed, 42) is folded here with the very same
    * XXH64.hashLong Spark executes.
    */
  /** XXH64-in-SQL machinery shared by the generator oracles: 64-bit
    * wraparound arithmetic on HUGEINT (DuckDB integer ops trap on
    * overflow), one nested subquery per step (DuckDB re-inlines lateral
    * aliases exponentially).
    */
  private object XxhSql {
    val U = "18446744073709551616" // 2^64
    def wmul(x: String, y: String): String = {
      val xl = s"(($x) % 4294967296)"; val xh = s"(($x) // 4294967296)"
      val yl = s"(($y) % 4294967296)"; val yh = s"(($y) // 4294967296)"
      // lo + (carry-half mod 2^32) << 32, all mod 2^64 — parenthesized so
      // the final modulus covers the whole sum
      s"((($xl * $yl) + ((($xh * $yl) + ($xl * $yh)) % 4294967296) * 4294967296) % $U)"
    }
    def rotl(x: String, r: Int): String =
      s"((($x) * ${1L << r} + ($x) // ${BigInt(1) << (64 - r)}) % $U)"
    // XXH64 primes as unsigned decimals (DuckDB HUGEINT literals)
    val p1: String = java.lang.Long.toUnsignedString(0x9E3779B185EBCA87L)
    val p2: String = java.lang.Long.toUnsignedString(-4417276706812531889L) // 0xC2B2AE3D27D4EB4F
    val p3 = "1609587929392839161"  // 0x165667B19E3779F9
    val p4: String = java.lang.Long.toUnsignedString(0x85EBCA77C2B2AE63L)
    val p5 = "2870177450012600261"  // 0x27D4EB2F165667C5
    def u(s: String) = s"(($s::HUGEINT % $U + $U) % $U)" // signed → [0, 2^64)
    /** 7 steps computing hashLong(vExpr, seedExpr) into column `pfx`. */
    def hashSteps(pfx: String, vExpr: String, seedExpr: String): Seq[(String, String)] = Seq(
      s"${pfx}a" -> wmul(vExpr, p2),
      s"${pfx}b" -> wmul(rotl(s"${pfx}a", 31), p1),
      s"${pfx}c" -> s"xor(((($seedExpr) + $p5 + 8) % $U)::HUGEINT, ${pfx}b::HUGEINT)",
      s"${pfx}d" -> s"(${wmul(rotl(s"${pfx}c", 27), p1)} + $p4) % $U",
      s"${pfx}e" -> wmul(s"xor(${pfx}d::HUGEINT, (${pfx}d // 8589934592)::HUGEINT)", p2),
      s"${pfx}f" -> wmul(s"xor(${pfx}e::HUGEINT, (${pfx}e // 536870912)::HUGEINT)", p3),
      pfx -> s"xor(${pfx}f::HUGEINT, (${pfx}f // 4294967296)::HUGEINT)")
    /** hashLong(salt, prevCol) followed by the 40-bit uniform draw. */
    def drawSteps(pfx: String, salt: Long, seedCol: String): Seq[(String, String)] =
      hashSteps(s"_$pfx", u(salt.toString), seedCol) :+
        (pfx -> s"((_$pfx % 1099511627776)::DOUBLE / 1099511627776.0)")
    /** Fold steps into a nested-subquery chain over `base`. */
    def nest(base: String, steps: Seq[(String, String)]): String =
      steps.foldLeft(base) { case (q, (name, expr)) =>
        s"SELECT *, ($expr) AS $name FROM ($q)"
      }
    /** A materialized CTE applying `steps` to `from`, keeping only `keep`. */
    def phase(name: String, from: String, steps: Seq[(String, String)],
        keep: Seq[String]): String =
      s"$name AS MATERIALIZED (SELECT ${keep.mkString(", ")} FROM " +
        s"(${nest(s"SELECT * FROM $from", steps)}) q)"
  }

  /** Spark's literal folding happens in Scala — format double constants
    * with the same arithmetic so the SQL parses to the identical double.
    */
  private def quadrantSums(p: Params, r: Int => String): (String, String) = {
    val ab = (p.a + p.b).toString
    val a = p.a.toString
    val abc = (p.a + p.b + p.c).toString
    val src = (0 until p.scale).map(k =>
      s"CASE WHEN ${r(k)} >= $ab THEN ${1L << k} ELSE 0 END").mkString(" + ")
    val dst = (0 until p.scale).map(k =>
      s"CASE WHEN (${r(k)} >= $a AND ${r(k)} < $ab) OR ${r(k)} >= $abc THEN ${1L << k} ELSE 0 END")
      .mkString(" + ")
    (src, dst)
  }

  /** DuckDB oracle for the R-MAT edge generator: the per-edge xxhash64
    * draws are emulated exactly — Spark's XXH64.hashLong (seed chaining
    * `xxhash64(seed, id, salt)` = hashLong(salt, hashLong(id,
    * hashLong(seed, 42)))) is unrolled into [[XxhSql]] steps; the constant
    * prefix hashLong(seed, 42) is folded here with the very same
    * XXH64.hashLong Spark executes.
    */
  def unrolledSql(p: Params): String = {
    import XxhSql._
    val ne = (1L << p.scale) * p.edgeFactor
    val c0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(p.seed, 42L)
    val steps = scala.collection.mutable.Buffer[(String, String)]()
    steps ++= hashSteps("hid", "id", u(c0.toString))
    (0 until p.scale).foreach { k => steps ++= drawSteps(s"r$k", k.toLong, "hid") }
    val (srcSum, dstSum) = quadrantSums(p, k => s"r$k")
    val chain = nest(s"SELECT range::HUGEINT AS id FROM range($ne)", steps.toSeq)
    s"""SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       |  count(*) AS weight
       |FROM (SELECT ($srcSum) AS src, ($dstSum) AS dst FROM ($chain) t)
       |GROUP BY 1, 2""".stripMargin
  }

  // hash-stream salts: edge bits use [0, scale); these stay disjoint
  private val InsertSalt = 1000000L  // action-insert attempt a, level k → +a*scale+k
  private val DeleteSalt = 2000000L  // delete-target draw attempts
  private val IsDelSalt = 3000000L   // insert-vs-delete coin per action
  private val InsertAttempts = 8     // residual self-loop prob ≈ (a+d)^(scale·8)

  /** The insert-vs-delete coin for action id `idc` — a pure function of the
    * action id, so "was earlier action t an insert" needs no join.
    */
  private def isDeleteCoin(p: Params, pDelete: Double, idc: Column): Column =
    u01(p, idc, IsDelSalt) < pDelete

  /** The edge inserted by action `idc` (pure function of the id): up to
    * [[InsertAttempts]] independent R-MAT draws, first non-self-loop wins
    * (the reference redraws until src ≠ dst, rmatter.c:350-353); the
    * vanishing-probability fallback flips the low dst bit.
    */
  private def insertEdge(p: Params, idc: Column): (Column, Column) = {
    val pr = graft.functions.RmatKernels.rmatInsertPair(
      idc, p.scale, p.seed, p.a, p.b, p.c, InsertSalt, InsertAttempts)
    (pr.getItem(0), pr.getItem(1))
  }

  /** R-MAT action stream — the Spark re-expression of the reference's
    * action generator (ref: rmatter/src/rmatter.c:334-373): each action is,
    * with probability 1 − pDelete, an insert of a fresh non-self-loop R-MAT
    * edge; otherwise a delete of a uniformly random choice among (base
    * graph edge ∪ edges inserted by earlier actions), redrawing while the
    * choice lands on an earlier *delete* action (rmatter.c:354-371).
    *
    * The reference walks a sequential seeded RNG; here every draw is a
    * hash of the action id, so the stream is embarrassingly parallel and
    * reproducible, "the edge inserted by action t" is recomputable without
    * a join, and only deletes of *base* edges join against the indexed
    * edge table (shuffle on the uniform index — no skew). Returns
    * (action_id, src, dst, is_del) — the same shape
    * [[graft.sources.StingerFiles.readActions]] decodes, composable with
    * [[EdgeUpdates]] and `StingerFiles.writeActions`.
    */
  def actions(spark: SparkSession, p: Params, na: Long = 100000L,
      pDelete: Double = 0.0625): DataFrame = {
    val base = graph(spark, p).edges
    val ne = base.count()
    // deterministic contiguous edge index: parallel range-partitioned sort
    // + zipWithIndex (no single-partition window)
    import spark.implicits._
    val indexed = base.select(col("src"), col("dst")).orderBy("src", "dst")
      .map(r => (r.getLong(0), r.getLong(1)))
      .rdd.zipWithIndex()
      .map { case ((s, t), i) => (i, s, t) }
      .toDF("idx", "esrc", "edst")
    val id = col("id")
    val isDel = isDeleteCoin(p, pDelete, id)
    val (insSrc, insDst) = insertEdge(p, id)
    // delete target: first accepted draw among InsertAttempts tries —
    // accepted = a base-graph edge, or an earlier action that inserted
    // (codegen kernel: inlined, the attempt cascade re-expands every draw
    // per branch and overflows the 64 KB generated-method limit)
    val pick = graft.functions.RmatKernels.rmatDeletePick(
      id, ne, p.seed, DeleteSalt, IsDelSalt, pDelete, InsertAttempts)
    val acts = spark.range(na).select(id.as("action_id"), isDel.as("is_del"),
      insSrc.as("ins_src"), insDst.as("ins_dst"), pick.as("pick"))
    val inserts = acts.filter(!col("is_del"))
      .select(col("action_id"), col("ins_src").as("src"),
        col("ins_dst").as("dst"), col("is_del"))
    val (priorSrc, priorDst) = insertEdge(p, col("pick") - ne)
    val delPrior = acts.filter(col("is_del") && col("pick") >= ne)
      .select(col("action_id"), priorSrc.as("src"), priorDst.as("dst"),
        col("is_del"))
    val delBase = acts.filter(col("is_del") && col("pick") < ne)
      .join(indexed, col("pick") === col("idx"))
      .select(col("action_id"), col("esrc").as("src"), col("edst").as("dst"),
        col("is_del"))
    inserts.union(delPrior).union(delBase)
      .select(col("action_id"), col("src"), col("dst"), col("is_del"))
  }

  /** DuckDB oracle for [[actions]] — the full generator emulated bit-exactly:
    * the base graph comes from [[unrolledSql]], every uniform draw from the
    * [[XxhSql]] XXH64 chain, the insert-attempt cascade and delete-target
    * acceptance as CASE cascades, "earlier action t was an insert" and "the
    * edge action t inserted" via self-joins on the per-action table (the
    * Spark side recomputes them hash-functionally; identical results), and
    * base-edge deletes via a row_number index in the same (src, dst) order
    * as the Spark zipWithIndex. Phased into materialized CTEs so no single
    * query block nests more than ~90 subqueries.
    */
  def actionsUnrolledSql(p: Params, na: Long = 100000L,
      pDelete: Double = 0.0625): String = {
    import XxhSql._
    val c0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(p.seed, 42L)
    val half = "9223372036854775808" // 2^63
    val ctes = scala.collection.mutable.Buffer[String]()
    ctes += s"b0 AS MATERIALIZED (\n${unrolledSql(p).linesIterator.map("  " + _).mkString("\n")}\n)"
    ctes += ("bidx AS MATERIALIZED (SELECT src, dst, " +
      "row_number() OVER (ORDER BY src, dst) - 1 AS idx FROM b0)")
    ctes += "nes AS MATERIALIZED (SELECT count(*)::HUGEINT AS ne FROM b0)"
    // per-action hash prefix + insert/delete coin
    ctes += phase("ph0",
      s"(SELECT range::HUGEINT AS id, ne FROM range($na), nes) b",
      hashSteps("hid", "id", u(c0.toString)) ++
        drawSteps("rdel", IsDelSalt, "hid"),
      Seq("id", "ne", "hid", "rdel"))
    // insert attempts: one phase per attempt (scale×7 steps each)
    var carry = Seq("id", "ne", "hid", "rdel")
    var prev = "ph0"
    (0 until InsertAttempts).foreach { a =>
      val steps = (0 until p.scale).flatMap(k =>
        drawSteps(s"ra${a}_$k", InsertSalt + a.toLong * p.scale + k, "hid"))
      val (srcSum, dstSum) = quadrantSums(p, k => s"ra${a}_$k")
      carry = carry ++ Seq(s"src_$a", s"dst_$a")
      ctes += phase(s"pi$a", prev,
        steps ++ Seq(s"src_$a" -> srcSum, s"dst_$a" -> dstSum), carry)
      prev = s"pi$a"
    }
    // first non-self-loop attempt wins; fallback flips the low dst bit
    val insSrc = "COALESCE(" + (0 until InsertAttempts).map(a =>
      s"CASE WHEN src_$a <> dst_$a THEN src_$a END").mkString(", ") + ", src_0)"
    val insDst = "COALESCE(" + (0 until InsertAttempts).map(a =>
      s"CASE WHEN src_$a <> dst_$a THEN dst_$a END").mkString(", ") +
      ", xor(dst_0::HUGEINT, 1::HUGEINT))"
    ctes += (s"sel AS MATERIALIZED (SELECT id, ne, hid, (rdel < $pDelete) AS isdel, " +
      s"($insSrc) AS ins_src, ($insDst) AS ins_dst FROM $prev)")
    // delete-target draws p0..p7 and the modular fallback
    val pickSteps = (0 until InsertAttempts).flatMap { a =>
      drawSteps(s"rp$a", DeleteSalt + a, "hid") :+
        (s"p$a" -> s"floor(rp$a * (ne::DOUBLE + id::DOUBLE))::HUGEINT")
    } ++ hashSteps("hfb", u((DeleteSalt + 99L).toString), "hid") :+
      ("fb" -> ("(((CASE WHEN hfb >= " + half + " THEN hfb - " + U +
        " ELSE hfb END) % greatest(ne, 1) + greatest(ne, 1)) % greatest(ne, 1))"))
    ctes += phase("pk", "sel", pickSteps,
      Seq("id", "ne", "isdel", "ins_src", "ins_dst") ++
        (0 until InsertAttempts).map(a => s"p$a") :+ "fb")
    // acceptance: a draw is taken if it names a base edge or an earlier
    // *insert* action (three-valued OR: p<ne short-circuits the null join)
    val joins = (0 until InsertAttempts).map(a =>
      s"LEFT JOIN sel t$a ON t$a.id = c.p$a - c.ne").mkString("\n  ")
    val pickExpr = "COALESCE(" + (0 until InsertAttempts).map(a =>
      s"CASE WHEN c.p$a < c.ne OR NOT t$a.isdel THEN c.p$a END").mkString(", ") +
      ", c.fb)"
    ctes += (s"acc AS MATERIALIZED (SELECT c.id, c.ne, c.isdel, c.ins_src, " +
      s"c.ins_dst, ($pickExpr) AS pick FROM pk c\n  $joins)")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT CAST(id AS BIGINT) AS action_id, CAST(ins_src AS BIGINT) AS src,
       |  CAST(ins_dst AS BIGINT) AS dst, isdel AS is_del
       |FROM acc WHERE NOT isdel
       |UNION ALL
       |SELECT CAST(c.id AS BIGINT), CAST(t.ins_src AS BIGINT),
       |  CAST(t.ins_dst AS BIGINT), c.isdel
       |FROM acc c JOIN sel t ON t.id = c.pick - c.ne
       |WHERE c.isdel AND c.pick >= c.ne
       |UNION ALL
       |SELECT CAST(c.id AS BIGINT), CAST(b.src AS BIGINT),
       |  CAST(b.dst AS BIGINT), c.isdel
       |FROM acc c JOIN bidx b ON b.idx = c.pick
       |WHERE c.isdel AND c.pick < c.ne""".stripMargin
  }
}
