package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's custom Catalyst expressions: makes
  * `dot_f32(a, b)` and `minhash_sig(words, perms)` callable from
  * `spark.sql(...)` exactly like built-ins, so the library's users are
  * not limited to the Column API.
  *
  * Two wiring paths, same builders:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *    `builder.withExtensions`) for sessions the user creates —
  *    the standard extension-point mechanism;
  *  - [[GraftFunctions.registerSql]] for an ALREADY-RUNNING session
  *    (e.g. a notebook), which injects into that session's function
  *    registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    // whole-operator extension: plans graft.plans.LogicalPartialTopK
    // into its map-side pruning physical operator
    ext.injectPlannerStrategy(_ => graft.plans.PartialTopKStrategy)
    // optimizer extension: demotes rn<=k window filters to the prune
    // in the mixed rank+running-agg shape native InferWindowGroupLimit
    // declines (see TopKDemotion scaladoc for the safety argument)
    ext.injectOptimizerRule(_ => graft.plans.TopKDemotion)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_f32"),
      info("dot_f32",
        "dot_f32(a, b) - double-precision dot product of two float/double arrays"),
      args => {
        require(args.length == 2, s"dot_f32 expects 2 arguments, got ${args.length}")
        DotProductF32(args(0), args(1))
      }),
    (FunctionIdentifier("dot_i64"),
      info("dot_i64",
        "dot_i64(a, b) - integer dot product of two bigint arrays"),
      args => {
        require(args.length == 2, s"dot_i64 expects 2 arguments, got ${args.length}")
        DotProductI64(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(words, perms) - MinHash signature (perms 64-bit minima) over 3-word shingles"),
      args => {
        require(args.length == 2, s"minhash_sig expects 2 arguments, got ${args.length}")
        MinHashSig(args(0), args(1) match {
        case Literal(p: Int, _) => p
        case other => throw new IllegalArgumentException(
          s"minhash_sig perms must be an integer literal, got $other")
        })
      }),
    (FunctionIdentifier("winnow_stats"),
      info("winnow_stats",
        "winnow_stats(text, k, w) - winnowing fingerprint stats struct " +
          "(n_fp, min_fp, max_fp, fp_sum) over md5 k-gram hashes, w-window minima"),
      args => {
        require(args.length == 3, s"winnow_stats expects 3 arguments, got ${args.length}")
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_stats $name must be an integer literal, got $other")
        }
        WinnowStats(args(0), intLit(args(1), "k"), intLit(args(2), "w"))
      }),
    (FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - repetition quality signals struct " +
          "(n_words, top_word_n, n_3grams, dup3_pos) over the split-on-space words"),
      args => {
        require(args.length == 1, s"repetition_stats expects 1 argument, got ${args.length}")
        RepetitionStats(args(0))
      }),
    (FunctionIdentifier("entropy_stats"),
      info("entropy_stats",
        "entropy_stats(text) - character-distribution quality signals struct " +
          "(n_chars, distinct_chars, top_char_n, distinct_bigrams)"),
      args => {
        require(args.length == 1, s"entropy_stats expects 1 argument, got ${args.length}")
        EntropyStats(args(0))
      }))

  /** Injects the same functions into an existing session's registry. */
  def registerSql(spark: SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
