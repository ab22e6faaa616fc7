package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.plans.{CosineSimilarity, CountMinSketchAgg, DotProductLong, MvRewrite, RewriteRankFilterToTopK, TopKStrategy, UnicodeFold, WordNgrams}

/** Canonical extension registration: start a session with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) and
  * every custom piece of this engine is installed session-wide:
  * `cosine_sim` as a SQL function and the [[graft.plans.TopKPerGroupPlan]]
  * planner strategy. The operator entry points also self-register at first
  * use (`CosineSimilarity.register`, `experimental.extraStrategies`), so
  * the extension class is the deployment-grade path, not a prerequisite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_i64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductLong(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordNgrams.fromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "cms_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountMinSketchAgg(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("unicode_fold"),
      new ExpressionInfo(classOf[UnicodeFold].getName, "unicode_fold"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UnicodeFold(exprs.head)))
    // SQL TVF surface over the catalog change feed:
    // SELECT * FROM table_changes('cat.ns.t', start[, end])
    e.injectTableFunction(graft.sources.v2.TableChanges.functionDescription)
    e.injectPlannerStrategy(_ => TopKStrategy)
    // user-written `row_number().over(...) <= k` + drop(rn) windows are
    // silently upgraded to the bounded-heap TopKPerGroup operator
    e.injectOptimizerRule(_ => RewriteRankFilterToTopK)
    // aggregates over a registered base table transparently answer from
    // the materialized view when it is fresh (no-op with no registrations)
    e.injectOptimizerRule(_ => MvRewrite)
  }
}
