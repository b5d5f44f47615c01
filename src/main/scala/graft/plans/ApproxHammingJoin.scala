package graft.plans

import graft.functions.HammingBin
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** A custom logical operator for approximate joins on binary
  * fingerprints: `ApproxHammingJoin(l, r, lfp, rfp, k, bands)` joins
  * rows whose fingerprints differ in fewer than `k` bits.
  *
  * The naive plan is a cross join + hamming filter — O(|l|·|r|).
  * [[ExpandApproxHammingJoin]] rewrites the node into a union of
  * `bands` *equi-join probes* on fingerprint chunks: probe i joins on
  * chunk_i equality and keeps only pairs whose first matching chunk is
  * i (so the union is exactly duplicate-free), then verifies the full
  * Hamming predicate.
  *
  * With `bands >= k`, pigeonhole guarantees a pair under the threshold
  * has at least one equal chunk, so the rewrite is EXACT — same rows
  * as the cross join, but every probe is hash-partitionable. With
  * `bands < k` (e.g. the reference's 4 chunks for threshold 10,
  * `matchcode/models.py:149-188`) it is the reference's banded
  * approximation. This is the SURVEY §4 "optional rule fusing the
  * band probes" made real.
  */
case class ApproxHammingJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftFp: Expression, rightFp: Expression,
    threshold: Int, bands: Int)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): ApproxHammingJoin = copy(l, r)
}

object ExpandApproxHammingJoin extends Rule[LogicalPlan] {

  /** chunk i of a binary fingerprint, width ceil(len/bands). */
  private def chunk(fp: Expression, i: Int, bands: Int): Expression = {
    val len = Length(fp)
    val w = Cast(IntegralDivide(
      Cast(Add(len, Literal(bands - 1)), LongType),
      Cast(Literal(bands), LongType)), IntegerType)
    Substring(fp, Add(Multiply(Literal(i), w), Literal(1)), w)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case ApproxHammingJoin(l, r, lfp, rfp, k, bands) =>
      val probes = (0 until bands).map { i =>
        // fresh attribute ids per branch so the Union is well-formed;
        // probe 0 keeps the original ids (Union adopts them as output)
        val (lc, rc, remap) =
          if (i == 0) (l, r, Map.empty[ExprId, Attribute])
          else {
            val lAliases = l.output.map(a => Alias(a, a.name)())
            val rAliases = r.output.map(a => Alias(a, a.name)())
            val lp = Project(lAliases, l)
            val rp = Project(rAliases, r)
            val m = (l.output.zip(lAliases) ++ r.output.zip(rAliases))
              .map { case (a, al) => a.exprId -> al.toAttribute }.toMap
            (lp: LogicalPlan, rp: LogicalPlan, m)
          }
        def rm(e: Expression): Expression = e.transform {
          case a: Attribute if remap.contains(a.exprId) => remap(a.exprId)
        }
        val lFp = rm(lfp)
        val rFp = rm(rfp)
        val bandEq = EqualTo(chunk(lFp, i, bands), chunk(rFp, i, bands))
        // first-matching-chunk disjointness: earlier chunks must differ
        val firstMatch = (0 until i)
          .map(j => Not(EqualTo(chunk(lFp, j, bands), chunk(rFp, j, bands))))
          .foldLeft(bandEq: Expression)(And)
        val verify = LessThan(HammingBin(lFp, rFp), Literal(k))
        Join(lc, rc, Inner, Some(And(firstMatch, verify)), JoinHint.NONE)
      }
      probes.reduceLeft[LogicalPlan]((a, b) => Union(Seq(a, b)))
  }
}
