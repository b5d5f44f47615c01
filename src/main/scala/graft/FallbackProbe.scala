package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A/B probe for the round-9 static-forwarder codegen conversion of
  * the last three CodegenFallback expressions (PurlParse,
  * RollingFingerprints, MergeSpans — the merge/snippet hot paths).
  * Each pair runs the SAME static compute method; the only difference
  * is fallback eval(InternalRow) dispatch vs a generated call inside
  * whole-stage codegen — so the measured delta is exactly the
  * fallback tax. Outputs are checksum-compared in-run (the DotProbe
  * convention). Results recorded in BASELINE.md.
  */
object FallbackProbe {

  // fallback twins: identical compute, CodegenFallback dispatch
  case class PurlParseFb(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = graft.functions.PurlParse.schema
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      graft.functions.PurlParse.evalUtf8(input.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): PurlParseFb =
      copy(c)
  }
  case class RollFpFb(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any, w: Any, k: Any): Any =
      graft.functions.RollingFingerprints.compute(t.asInstanceOf[ArrayData],
        w.asInstanceOf[Int], k.asInstanceOf[Int])
    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): RollFpFb = copy(a, b, c)
  }
  case class MergeSpansFb(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("start", IntegerType), StructField("end", IntegerType))),
      containsNull = false)
    override protected def nullSafeEval(s: Any, d: Any): Any =
      graft.matching.MergeSpans.compute(s.asInstanceOf[ArrayData],
        d.asInstanceOf[Int])
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): MergeSpansFb = copy(l, r)
  }

  private def c(e: Expression): Column = GraftBridge.column(e)
  private def x(col: Column): Expression = GraftBridge.expression(col)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-fallback-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(what: String, rows: Long)(body: => Long): Long = {
      body // warm-up (codegen + JIT)
      def pass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = body
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val (s1, o1) = pass()
      val (s2, o2) = pass()
      require(o1 == o2)
      val secs = math.min(s1, s2)
      println(f"FALLBACK_PROBE $what n=$rows secs=$secs%.3f " +
        f"rows_per_s=${rows / secs}%.0f checksum=$o1")
      o1
    }

    // --- purl_parse: realistic maven/npm purl mix
    val purls = spark.range(n).repartition(cpus.toInt)
      .select(concat(lit("pkg:maven/org.example"), col("id") % 50,
        lit("/artifact"), col("id") % 1000, lit("@1."), col("id") % 20,
        lit(".") , col("id") % 10,
        lit("?classifier=sources&repository_url=repo.maven.org"))
        .as("purl"))
      .cache()
    purls.count()
    val pNew = time("purl_parse(codegen)", n) {
      purls.select(c(graft.functions.PurlParse(x(col("purl")))).as("p"))
        .agg(sum(length(col("p.name")) + length(col("p.version"))))
        .head().getLong(0)
    }
    val pOld = time("purl_parse(fallback)", n) {
      purls.select(c(PurlParseFb(x(col("purl")))).as("p"))
        .agg(sum(length(col("p.name")) + length(col("p.version"))))
        .head().getLong(0)
    }
    require(pNew == pOld, "purl_parse variants disagree")
    purls.unpersist()

    // --- rollhash_fps: 64-token docs, window 16, keep 16 (the
    // snippet-fingerprint shape)
    val toks = spark.range(n / 4).repartition(cpus.toInt)
      .select(expr(
        "transform(sequence(0, 63), i -> concat('tok', (id + i) % 5000))")
        .as("toks"))
      .cache()
    toks.count()
    val rNew = time("rollhash_fps(codegen)", n / 4) {
      toks.select(c(graft.functions.RollingFingerprints(x(col("toks")),
          x(lit(16)), x(lit(16)))).as("f"))
        .agg(sum(expr("aggregate(f, 0L, (a, v) -> a + v % 1000003)")))
        .head().getLong(0)
    }
    val rOld = time("rollhash_fps(fallback)", n / 4) {
      toks.select(c(RollFpFb(x(col("toks")),
          x(lit(16)), x(lit(16)))).as("f"))
        .agg(sum(expr("aggregate(f, 0L, (a, v) -> a + v % 1000003)")))
        .head().getLong(0)
    }
    require(rNew == rOld, "rollhash variants disagree")
    toks.unpersist()

    // --- merge_spans: 32 unsorted overlapping spans per row, gap 16
    val spans = spark.range(n / 2).repartition(cpus.toInt)
      .select(expr("""transform(sequence(0, 31),
          i -> named_struct(
            'start', CAST((id + i * 37) % 1000 AS INT),
            'end',   CAST((id + i * 37) % 1000 + 8 AS INT)))""")
        .as("spans"))
      .cache()
    spans.count()
    val mNew = time("merge_spans(codegen)", n / 2) {
      spans.select(c(graft.matching.MergeSpans(x(col("spans")),
          x(lit(16)))).as("m"))
        .agg(sum(expr("aggregate(m, 0L, (a, s) -> a + s.end - s.start)")))
        .head().getLong(0)
    }
    val mOld = time("merge_spans(fallback)", n / 2) {
      spans.select(c(MergeSpansFb(x(col("spans")),
          x(lit(16)))).as("m"))
        .agg(sum(expr("aggregate(m, 0L, (a, s) -> a + s.end - s.start)")))
        .head().getLong(0)
    }
    require(mNew == mOld, "merge_spans variants disagree")
    spark.stop()
  }
}
