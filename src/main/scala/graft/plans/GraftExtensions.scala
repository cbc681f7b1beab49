package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so the engine surface is reachable from
  * pure SQL (and from any JDBC/thrift front-end) exactly like built-ins:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)  // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * This is the idiomatic packaging for a Spark-native library — the same
  * mechanism Iceberg/Delta use to inject their surface — and it keeps the
  * functions codegen'd: the registry hands Catalyst the Expression nodes
  * directly, no UDF wrapping.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => FuseCosine)
  }
}

object GraftExtensions {

  /** Register on an already-built session (REPL, tests, notebook) — same
    * registry entries as the extensions path, no session rebuild. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, (info, builder)) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }

  private def f(name: String, usage: String, arity: Int,
      build: Seq[Expression] => Expression): (String, (ExpressionInfo, FunctionBuilder)) = {
    val builder: FunctionBuilder = { args =>
      require(args.length == arity,
        s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    }
    name -> (new ExpressionInfo("graft", name, usage) -> builder)
  }

  /** name → (info, builder) for every SQL-exposed graft function. */
  val functions: Map[String, (ExpressionInfo, FunctionBuilder)] = Map(
    f("graft_dot",
      "graft_dot(a, b) - codegen'd dot product of two numeric arrays", 2,
      args => DotProduct(args(0), args(1))),
    f("graft_l2sq",
      "graft_l2sq(a, b) - codegen'd squared L2 distance of two numeric arrays", 2,
      args => L2SquaredDistance(args(0), args(1))),
    f("graft_cosine",
      "graft_cosine(a, b) - fused single-pass cosine similarity of two numeric arrays", 2,
      args => CosineSimilarity(args(0), args(1))),
    f("graft_byte_entropy",
      "graft_byte_entropy(bin) - Shannon entropy (bits) of a binary column's byte histogram", 1,
      args => ByteEntropy(args(0))))
}
