package graft

import java.nio.file.Files

/** Span math of `d_substring_dedup` (cross-document k-token-window
  * dedup, k=8) on a crafted corpus with known duplicated runs:
  * a shared m-token run (m ≥ k) yields m-k+1 duplicated windows that
  * merge to one span of exactly m tokens; disjoint runs stay separate
  * spans; touching runs merge; runs shorter than k are invisible at
  * this granularity (that is `d_line_dedup` / segment territory).
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def uniq(tag: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$tag$i")

  private lazy val dir: String = {
    val s1 = uniq("s", 10)    // 10-token run shared by docs 0 and 1
    val s2 = uniq("t", 8)     // 8-token run, twice in doc 5, once in doc 6
    val s3 = uniq("u", 8)     // adjacent runs in doc 7...
    val s4 = uniq("v", 8)     // ...matched separately by docs 8 and 9
    val docs = Seq(
      (0L, (uniq("a", 5) ++ s1 ++ uniq("b", 5)).mkString(" ")),
      (1L, (s1 ++ uniq("c", 12)).mkString(" ")),
      (2L, uniq("d", 9).mkString(" ")),
      (3L, uniq("z", 8).mkString(" ")),
      (4L, uniq("z", 8).mkString(" ")),
      (5L, (uniq("e", 2) ++ s2 ++ uniq("f", 4) ++ s2 ++ uniq("g", 2))
        .mkString(" ")),
      (6L, (uniq("h", 3) ++ s2 ++ uniq("i", 3)).mkString(" ")),
      (7L, (s3 ++ s4).mkString(" ")),
      (8L, (uniq("j", 4) ++ s3 ++ uniq("k", 4)).mkString(" ")),
      (9L, (uniq("l", 4) ++ s4 ++ uniq("m", 4)).mkString(" ")),
      (10L, uniq("w", 5).mkString(" ")),
      (11L, uniq("w", 5).mkString(" ")))
    val tmp = Files.createTempDirectory("substring-dedup").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  private lazy val rows: Map[Long, (Int, Int, Int, Double)] =
    Registry.byName("d_substring_dedup").run(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_spans"),
          r.getAs[Int]("dup_tokens"), r.getAs[Double]("kept_frac")))
    }.toMap

  test("a shared 10-token run merges its 3 windows into one 10-token span") {
    assert(rows(0L) == ((20, 1, 10, 0.5)))
    assert(rows(1L) == ((22, 1, 10, 1.0 - 10.0 / 22.0)))
  }

  test("a fully unique doc keeps everything") {
    assert(rows(2L) == ((9, 0, 0, 1.0)))
  }

  test("identical k-token docs are fully covered (kept_frac 0)") {
    assert(rows(3L) == ((8, 1, 8, 0.0)))
    assert(rows(4L) == ((8, 1, 8, 0.0)))
  }

  test("disjoint duplicated runs stay separate spans") {
    // doc 5: s2 at token 2 and at token 14 → spans [2,10) and [14,22)
    assert(rows(5L) == ((24, 2, 16, 1.0 - 16.0 / 24.0)))
    assert(rows(6L) == ((14, 1, 8, 1.0 - 8.0 / 14.0)))
  }

  test("touching duplicated runs merge into one span") {
    // doc 7: [0,8) from s3 and [8,16) from s4 touch → [0,16)
    assert(rows(7L) == ((16, 1, 16, 0.0)))
    assert(rows(8L)._2 == 1 && rows(8L)._3 == 8)
    assert(rows(9L)._2 == 1 && rows(9L)._3 == 8)
  }

  test("duplicate runs shorter than k are invisible at this granularity") {
    assert(rows(10L) == ((5, 0, 0, 1.0)))
    assert(rows(11L) == ((5, 0, 0, 1.0)))
  }

  test("every document appears exactly once in the output") {
    assert(rows.keySet == (0L to 11L).toSet)
  }

  private lazy val cut: Map[Long, (String, Int)] =
    Registry.byName("d_substring_cut").run(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_kept")))
    }.toMap

  test("cut removes exactly the merged spans and rejoins the rest") {
    assert(cut(0L) == (((uniq("a", 5) ++ uniq("b", 5)).mkString(" "), 10)))
    assert(cut(1L) == ((uniq("c", 12).mkString(" "), 12)))
    assert(cut(2L) == ((uniq("d", 9).mkString(" "), 9)))
  }

  test("fully duplicated docs cut to empty text") {
    assert(cut(3L) == (("", 0)))
    assert(cut(4L) == (("", 0)))
    assert(cut(7L) == (("", 0)))
  }

  test("cut keeps docs without duplicated windows verbatim") {
    assert(cut(10L) == ((uniq("w", 5).mkString(" "), 5)))
    assert(cut(11L) == ((uniq("w", 5).mkString(" "), 5)))
  }

  test("cut token counts agree with the span stats") {
    for ((id, (nTok, _, dupTok, _)) <- rows)
      assert(cut(id)._2 == nTok - dupTok,
        s"doc $id: n_kept ${cut(id)._2} != $nTok - $dupTok")
  }

  test("hashed-gram configuration produces identical span stats") {
    val hashed = Registry.byName("d_substring_dedup_hashed")
      .run(spark, dir).collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_spans"),
            r.getAs[Int]("dup_tokens"), r.getAs[Double]("kept_frac")))
      }.toMap
    assert(hashed == rows)
  }
}
