package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-time entry point: makes the library's native function surface
  * available to pure-SQL deployments with nothing but
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * (e.g. Thrift server / SQL gateway clusters where no Scala code runs).
  * Injects the same builders the programmatic `register` paths use —
  * `word_shingles`, `minhash_sig`, `simhash_signs`, `jaro_winkler`
  * ([[graft.functions.TextExpressions]]) and `cosine_similarity`,
  * `dot_product` ([[graft.functions.VectorExpressions]]) — so SQL-only
  * callers get the identical codegen'd expressions, not UDF fallbacks.
  *
  * No optimizer rules or strategies are injected: the engine's relational
  * surface deliberately lowers onto Catalyst built-ins (see
  * [[graft.plans]]), so there is nothing plan-level to add — functions
  * are the one surface that needs config-time registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    (functions.TextExpressions.builders ++ functions.VectorExpressions.builders)
      .foreach { case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft.GraftExtensions", name),
          builder))
      }
}
