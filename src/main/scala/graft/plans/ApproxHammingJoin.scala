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
  * Chunks are balanced-width (floor boundaries), so a bands count that
  * does not divide the fingerprint length still partitions it with no
  * empty chunks; probes whose chunk would be empty (bands > byte
  * length) are statically guarded out. With `min(bands, byteLen) >= k`,
  * pigeonhole guarantees a pair under the threshold has at least one
  * equal chunk, so the rewrite is EXACT — same rows as the cross join,
  * but every probe is hash-partitionable. With `bands < k` (e.g. the
  * reference's 4 chunks for threshold 10,
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

  /** 1-based boundary of chunk i under balanced chunking:
    * floor(i * len / bands). Balanced widths (floor((i+1)·len/b) −
    * floor(i·len/b)) partition the fingerprint with no empty trailing
    * chunks whenever bands <= len — unlike fixed ceil(len/bands)
    * widths, where a non-dividing bands count (e.g. 10 bands over 16
    * bytes) leaves trailing chunks as empty substrings that equi-join
    * on a constant empty key (an effectively-cartesian probe). */
  private def boundary(len: Expression, i: Int, bands: Int): Expression =
    Cast(IntegralDivide(
      Multiply(Cast(len, LongType), Literal(i.toLong)),
      Literal(bands.toLong)), IntegerType)

  /** chunk i of a binary fingerprint plus its width expression. */
  private def chunk(fp: Expression, i: Int, bands: Int)
      : (Expression, Expression) = {
    val len = Length(fp)
    val lo = boundary(len, i, bands)
    val w = Subtract(boundary(len, i + 1, bands), lo)
    (Substring(fp, Add(lo, Literal(1)), w), w)
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
        val (lChunk, lW) = chunk(lFp, i, bands)
        val (rChunk, _) = chunk(rFp, i, bands)
        val bandEq = EqualTo(lChunk, rChunk)
        // Degeneracy guard for bands > len: a zero-width chunk would
        // equi-join on the constant empty key (single-partition,
        // effectively cartesian). `width > 0` is a left-only predicate
        // so it pushes below the join; degenerate probes emit nothing.
        // Widths are judged on the left fingerprint only — pairs with
        // differing lengths never pass the Hamming verify (NULL < k).
        // Exception: an empty left fingerprint (length 0) has NO
        // non-degenerate chunk, yet empty-vs-empty pairs have Hamming
        // distance 0 < k under the cross-join semantics — probe 0 lets
        // them through (band key "" only equals another empty chunk,
        // so the probe stays selective; later probes still drop them,
        // keeping the union duplicate-free).
        val nonDegenerate =
          if (i == 0) Or(GreaterThan(lW, Literal(0)),
            EqualTo(Length(lFp), Literal(0)))
          else GreaterThan(lW, Literal(0))
        // first-matching-chunk disjointness: earlier chunks must differ
        // (degenerate earlier chunks are always "equal" — skip them, or
        // every pair would be dropped from all later probes)
        val firstMatch = (0 until i)
          .map { j =>
            val (lj, ljW) = chunk(lFp, j, bands)
            val (rj, _) = chunk(rFp, j, bands)
            Or(Not(EqualTo(lj, rj)), LessThanOrEqual(ljW, Literal(0)))
          }
          .foldLeft(And(bandEq, nonDegenerate): Expression)(And)
        val verify = LessThan(HammingBin(lFp, rFp), Literal(k))
        Join(lc, rc, Inner, Some(And(firstMatch, verify)), JoinHint.NONE)
      }
      probes.reduceLeft[LogicalPlan]((a, b) => Union(Seq(a, b)))
  }
}
