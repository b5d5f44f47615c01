package graft

import graft.plans.ExpandApproxHammingJoin
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's custom expressions for SQL
  * and injects the [[graft.plans.ExpandApproxHammingJoin]] optimizer
  * rule. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    def fn(name: String, builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    fn("purl_parse", es => functions.PurlParse(es.head))
    fn("natver_key", es => functions.NatVersionKey(es.head))
    fn("hamming_bin", es => functions.HammingBin(es.head, es(1)))
    fn("hamming_bytes", es => functions.HammingBytes(es.head, es(1)))
    fn("simhash64", es => functions.SimHash64(es.head))
    fn("minhash_sig", es => functions.MinHashSig(es.head, es(1)))
    fn("dot_long", es => functions.DotLong(es.head, es(1)))
    fn("rollhash_fps",
      es => functions.RollingFingerprints(es.head, es(1), es(2)))
    fn("halo1", es => matching.Halo1(es.head))
    fn("name_similarity", es => matching.NameSimilarity(es.head, es(1)))
    fn("merge_spans", es => matching.MergeSpans(es.head, es(1)))
    fn("canonical_url", es => functions.CanonicalUrlExpr(es.head))
    fn("vers_contains", es => functions.VersContains(es.head, es(1)))
    fn("vers_cmp", es => functions.VersCmp(es.head, es(1), es(2)))
    fn("langid", es => functions.LangIdExpr(es.head))
    e.injectOptimizerRule(_ => ExpandApproxHammingJoin)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.GraftBridge

  /** Dataset-API entry for the approximate hamming join: joins rows of
    * `left` and `right` whose binary fingerprint columns differ in
    * fewer than `threshold` bits, planned as banded equi-join probes
    * (exact when bands >= threshold). Requires the optimizer rule; if
    * the extension isn't installed the rule is applied eagerly here. */
  def approxHammingJoin(left: DataFrame, right: DataFrame,
      leftFp: String, rightFp: String, threshold: Int,
      bands: Int = 0): DataFrame = {
    val b = if (bands > 0) bands else threshold
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val node = plans.ApproxHammingJoin(
      lPlan, rPlan, attr(lPlan, leftFp), attr(rPlan, rightFp),
      threshold, b)
    val spark = left.sparkSession
    val expanded =
      if (spark.sessionState.optimizer.batches.exists(
        _.rules.contains(ExpandApproxHammingJoin))) node
      else ExpandApproxHammingJoin(node)
    GraftBridge.ofRows(spark, expanded)
  }
}
