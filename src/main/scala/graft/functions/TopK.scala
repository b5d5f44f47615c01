package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One candidate row for the top-k aggregate: sort key `c`
  * (descending), tiebreaks `ok`/`ln` (ascending). */
final case class TopItem(c: Long, ok: Long, ln: Int)

/** Bounded top-k as a MERGEABLE typed [[Aggregator]] — the
  * partial-aggregation alternative to "window row_number ≤ k":
  * a rank window must shuffle EVERY row of every group to the
  * group's reducer and sort there; this aggregator keeps at most k
  * rows of state per partition and merges map-side, so the shuffle
  * carries ≤ k·groups·tasks rows no matter how large the groups
  * grow — the same state-vs-stream trade as the Misra-Gries gate,
  * but exact (top-k of a total order needs only k state by the
  * mergeability of order statistics' prefixes).
  *
  * Total order: (c DESC, ok ASC, ln ASC) — total because (ok, ln)
  * is unique per input row, so results are deterministic and the
  * oracle's ROW_NUMBER mirror is exact.
  */
final class TopKAgg(k: Int)
    extends Aggregator[TopItem, Seq[TopItem], Seq[TopItem]] {

  private val ord: Ordering[TopItem] =
    Ordering.by((t: TopItem) => (-t.c, t.ok, t.ln))

  override def zero: Seq[TopItem] = Seq.empty

  override def reduce(b: Seq[TopItem], t: TopItem): Seq[TopItem] =
    if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, t)) b
    else ((b :+ t).sorted(ord)).take(k)

  override def merge(a: Seq[TopItem], b: Seq[TopItem]): Seq[TopItem] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[TopItem]): Seq[TopItem] = b

  override def bufferEncoder: Encoder[Seq[TopItem]] =
    ExpressionEncoder[Seq[TopItem]]()
  override def outputEncoder: Encoder[Seq[TopItem]] =
    ExpressionEncoder[Seq[TopItem]]()
}

object TopKAgg {
  /** top_k(c, ok, ln) → array<struct<c,ok,ln>> sorted by the
    * aggregator's total order (the case-class input encoder flattens
    * to one argument per field). */
  def top_k(c: Column, ok: Column, ln: Column, k: Int): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[TopItem]()).apply(c, ok, ln)
}
