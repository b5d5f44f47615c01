package graft.matching

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff-Obershelp similarity, the algorithm behind Python's
  * difflib.SequenceMatcher.ratio() used for match-ranking name
  * comparison in the reference (`matchcode/models.py:347-348`, F12):
  * ratio = 2*M/(|a|+|b|) where M sums the lengths of recursively
  * found longest matching blocks (earliest-in-a, then earliest-in-b
  * tie-break, matching difflib). Implemented from the published
  * algorithm description, not ported code.
  */
object RatcliffObershelp {
  /** Catalyst-typed entry shared by interpreted eval and codegen. */
  def compute(a: UTF8String, b: UTF8String): Double =
    ratio(a.toString, b.toString)

  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    2.0 * matchedChars(a, 0, a.length, b, 0, b.length) / (a.length + b.length)
  }

  /** Longest matching block in a[alo,ahi) x b[blo,bhi); ties resolved
    * to smallest i, then smallest j (difflib.find_longest_match). */
  private def longestMatch(a: String, alo: Int, ahi: Int,
      b: String, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo; var bestj = blo; var bestsize = 0
    // j2len(j) = length of longest match ending at a[i-1], b[j-1]
    var j2len = Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      var newj2len = Map.empty[Int, Int]
      var j = blo
      while (j < bhi) {
        if (a.charAt(i) == b.charAt(j)) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len += (j -> k)
          if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
        }
        j += 1
      }
      j2len = newj2len
      i += 1
    }
    (besti, bestj, bestsize)
  }

  private def matchedChars(a: String, alo: Int, ahi: Int,
      b: String, blo: Int, bhi: Int): Int = {
    if (alo >= ahi || blo >= bhi) return 0
    val (i, j, size) = longestMatch(a, alo, ahi, b, blo, bhi)
    if (size == 0) 0
    else size +
      matchedChars(a, alo, i, b, blo, j) +
      matchedChars(a, i + size, ahi, b, j + size, bhi)
  }
}

/** name_similarity(a, b) -> double in [0,1] (Ratcliff-Obershelp). */
case class NameSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "name_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    RatcliffObershelp.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.matching.RatcliffObershelp.compute($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NameSimilarity = copy(l, r)
}

/** merge_spans(array<struct<start:int,end:int>>, maxDist) — sort by
  * start and merge overlapping / near (gap <= maxDist) spans into
  * maximal spans, the reference's `merge_matches` span arithmetic
  * (`matchcode/match.py:290-348`, max_dist=16 = snippet window, X4).
  */
case class MergeSpans(left: Expression, right: Expression)
    extends BinaryExpression {
  private val spanType = StructType(Seq(
    StructField("start", IntegerType), StructField("end", IntegerType)))
  override def dataType: DataType = ArrayType(spanType, containsNull = false)
  override def prettyName: String = "merge_spans"
  override protected def nullSafeEval(spansAny: Any, distAny: Any): Any =
    MergeSpans.compute(spansAny.asInstanceOf[ArrayData],
      distAny.asInstanceOf[Int])
  // static-forwarder codegen (CanonicalUrlExpr pattern): merge logic
  // stays one JVM call, the expression joins whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) => s"""
      ${ev.value} = graft.matching.MergeSpans.compute($s, $d);
    """)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MergeSpans = copy(l, r)
}

object MergeSpans {
  /** Static forwarder shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, maxDist: Int): ArrayData = {
    val n = arr.numElements()
    val spans = (0 until n).flatMap { i =>
      if (arr.isNullAt(i)) None
      else {
        val row = arr.getStruct(i, 2)
        Some((row.getInt(0), row.getInt(1)))
      }
    }.sortBy(identity)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    spans.foreach { case (s, e) =>
      if (merged.nonEmpty && s <= merged.last._2 + maxDist) {
        val (ps, pe) = merged.last
        merged(merged.size - 1) = (ps, math.max(pe, e))
      } else merged += ((s, e))
    }
    new GenericArrayData(merged.map { case (s, e) =>
      InternalRow(s, e)
    }.toArray[Any])
  }
}

object MatchFunctions {
  import org.apache.spark.sql.functions.lit
  def name_similarity(a: Column, b: Column): Column =
    GraftBridge.column(NameSimilarity(GraftBridge.expression(a),
      GraftBridge.expression(b)))
  def merge_spans(spans: Column, maxDist: Int): Column =
    GraftBridge.column(MergeSpans(GraftBridge.expression(spans),
      GraftBridge.expression(lit(maxDist))))
}
