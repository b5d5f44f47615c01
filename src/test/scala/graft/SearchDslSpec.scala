package graft

import graft.ops.SearchDsl
import org.apache.spark.sql.functions._

class SearchDslSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("alpha widget", "Brand#1", 10),
    ("beta widget", "Brand#2", 30),
    ("gamma rod", "Brand#1", 50)).toDF("name", "brand", "size")

  private val fields = Map("name" -> col("name"), "brand" -> col("brand"),
    "size" -> col("size"))
  private val bare = Seq(col("name"), col("brand"))

  private def run(dsl: String): Seq[String] =
    df.filter(SearchDsl.compile(dsl, fields, bare))
      .select("name").as[String].collect().toSeq.sorted

  test("tokenizer honors quotes") {
    assert(SearchDsl.tokenize("""a "b c" d""") == List("a", "b c", "d"))
  }

  test("default operator is icontains") {
    assert(run("name:widget") == Seq("alpha widget", "beta widget"))
  }

  test("iexact / istartswith / iendswith") {
    assert(run("""name:"ALPHA WIDGET"=""") == Seq("alpha widget"))
    assert(run("name:be^") == Seq("beta widget"))
    assert(run("name:rod$") == Seq("gamma rod"))
  }

  test("numeric gt/lt and negation") {
    assert(run("size:20>") == Seq("beta widget", "gamma rod"))
    assert(run("size:20> -brand:Brand#2=") == Seq("gamma rod"))
  }

  test("bare term ORs over default fields, terms AND together") {
    assert(run("widget") == Seq("alpha widget", "beta widget"))
    assert(run("widget size:20>") == Seq("beta widget"))
  }

  test("unknown field raises") {
    intercept[IllegalArgumentException](run("bogus:x"))
  }
}
