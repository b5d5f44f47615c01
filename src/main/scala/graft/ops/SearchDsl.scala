package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the reference's search mini-DSL
  * (`packagedb/filters.py:20-93`): whitespace-separated terms ANDed
  * together; `field:value` with an operator suffix on the value —
  * `=` iexact, `^` istartswith, `$` iendswith, `~` icontains,
  * `>` gt, `<` lt, no suffix = icontains; a leading `-` negates the
  * term; a bare term (no `:`) is an OR of icontains over the default
  * field list; double quotes group values containing spaces.
  *
  * Compiles straight to a Catalyst `Column` predicate tree so the
  * resulting filter is pushed into the scan like any hand-written one.
  */
object SearchDsl {

  def compile(dsl: String, fields: Map[String, Column],
      bareFields: Seq[Column]): Column =
    tokenize(dsl).map(termPredicate(_, fields, bareFields)) match {
      case Nil => lit(true)
      case ps  => ps.reduce(_ && _)
    }

  /** shlex-ish tokenizer: split on whitespace, double quotes group. */
  private[graft] def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach {
      case '"' => inQ = !inQ
      case c if c.isWhitespace && !inQ =>
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def termPredicate(term: String, fields: Map[String, Column],
      bareFields: Seq[Column]): Column = {
    val (neg, body) =
      if (term.startsWith("-")) (true, term.drop(1)) else (false, term)
    val colonIdx = body.indexOf(':')
    val pred =
      if (colonIdx <= 0) {
        bareFields.map(c => lower(c).contains(body.toLowerCase))
          .reduce(_ || _)
      } else {
        val fieldName = body.substring(0, colonIdx)
        val rawValue = body.substring(colonIdx + 1)
        val c = fields.getOrElse(fieldName,
          throw new IllegalArgumentException(s"unknown field: $fieldName"))
        val (value, op) = rawValue.lastOption match {
          case Some(ch) if "=^$~><".contains(ch) && rawValue.length > 1 =>
            (rawValue.dropRight(1), ch)
          case _ => (rawValue, '~')
        }
        op match {
          case '=' => lower(c) === value.toLowerCase
          case '^' => lower(c).startsWith(value.toLowerCase)
          case '$' => lower(c).endsWith(value.toLowerCase)
          case '~' => lower(c).contains(value.toLowerCase)
          case '>' => numericOrString(c, value, gt = true)
          case '<' => numericOrString(c, value, gt = false)
        }
      }
    if (neg) !pred else pred
  }

  private def numericOrString(c: Column, v: String, gt: Boolean): Column =
    v.toDoubleOption match {
      case Some(d) => if (gt) c > lit(d) else c < lit(d)
      case None    => if (gt) c > lit(v) else c < lit(v)
    }
}
