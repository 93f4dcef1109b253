package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayDot, MinHashSig, RepetitionStats, SimHash64}

/** SparkSessionExtensions entry point: registers graft's codegen
  * expressions as SQL functions, so a pure-SQL user gets the same kernels:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT array_dot(a, b), minhash_sig(text, 5, 126) FROM t
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot(a, b) takes two arguments")
        ArrayDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "minhash_sig(text, shingleSize, numHashes) takes three arguments")
        MinHashSig(args.head, intLit(args(1), "shingleSize"),
          intLit(args(2), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text) takes one argument")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "repetition_stats(text) takes one argument")
        RepetitionStats(args.head)
      }))
  }
}
