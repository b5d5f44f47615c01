package graft

import graft.clearindex.CdItems
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay of the clearcode CDitem queryset corpus
  * (`clearcode/tests/test_models.py`, `test_sync.py`): every scenario
  * the reference asserts, over the same paths.
  */
class CdItemsSpec extends SparkTestBase {
  import spark.implicits._

  private val TS = java.sql.Timestamp.valueOf("2026-08-12 00:00:00")

  private def items(rows: (String, Option[String], Option[String])*)
      : DataFrame =
    rows.toSeq.toDF("path", "last_map_date_s", "map_error")
      .select(col("path"),
        lit("x").as("content"),
        lit(TS).as("last_modified_date"),
        col("last_map_date_s").cast("timestamp").as("last_map_date"),
        col("map_error"))

  private def paths(df: DataFrame): Set[String] =
    df.select("path").as[String].collect().toSet

  test("modified_after windows around the item timestamp") {
    val df = items(("npm/name/version", None, None))
    assert(CdItems.modifiedAfter(df,
      java.sql.Timestamp.valueOf("2026-08-11 00:00:00")).count() == 1)
    assert(CdItems.modifiedAfter(df,
      java.sql.Timestamp.valueOf("2026-08-05 00:00:00")).count() == 1)
    assert(CdItems.modifiedAfter(df,
      java.sql.Timestamp.valueOf("2026-08-13 00:00:00")).count() == 0)
    assert(CdItems.modifiedAfter(df,
      java.sql.Timestamp.valueOf("2026-08-19 00:00:00")).count() == 0)
  }

  test("known_package_types keeps npm, drops asdf") {
    val df = items(("npm/name/version", None, None),
      ("asdf/name/version", None, None))
    assert(paths(df.filter(CdItems.isKnownPackageType)) ==
      Set("npm/name/version"))
  }

  test("definitions excludes tool harvests") {
    val df = items(
      ("composer/packagist/yoast/wordpress-seo/revision/9.5-RC3.json", None, None),
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/scancode/3.2.2.json",
        None, None))
    assert(paths(CdItems.definitions(df)) ==
      Set("composer/packagist/yoast/wordpress-seo/revision/9.5-RC3.json"))
  }

  test("scancode_harvests keeps only tool/scancode paths") {
    val df = items(
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/scancode/3.2.2.json",
        None, None),
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/licensee/9.13.0.json",
        None, None))
    assert(paths(CdItems.scancodeHarvests(df)).forall(_.contains("scancode")))
    assert(CdItems.scancodeHarvests(df).count() == 1)
  }

  test("mappable drops mapped/errored items") {
    val df = items(
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6.json", None, None),
      ("sourcearchive/mavencentral/io.quarkus/quarkus-jsonb/revision/0.26.1.json",
        Some("2026-08-12 00:00:00"), Some("error")),
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/scancode/3.2.2.json",
        None, None))
    assert(CdItems.mappable(df).count() == 2)
    assert(paths(CdItems.mappableDefinitions(df)) ==
      Set("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6.json"))
  }

  test("mappable_scancode_harvests keeps only unmapped scancode harvests") {
    val df = items(
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/scancode/3.2.2.json",
        None, None),
      ("sourcearchive/mavencentral/io.cucumber/cucumber-core/revision/5.0.0-RC1/tool/scancode/3.2.2.json",
        Some("2026-08-12 00:00:00"), Some("error")),
      ("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6.json", None, None))
    assert(paths(CdItems.mappableScancodeHarvests(df)) ==
      Set("sourcearchive/mavencentral/io.nats/jnats/revision/2.6.6/tool/scancode/3.2.2.json"))
  }

  test("db_saver upsert: identical path updates in place, new path inserts") {
    val path = "composer/packagist/yoast/wordpress-seo/revision/9.5-RC3.json"
    val existing = Seq((path, "old", TS))
      .toDF("path", "content", "last_modified_date")
    val now = java.sql.Timestamp.valueOf("2026-08-13 00:00:00")
    // same path, changed content → still 1 row, content updated
    val updated = CdItems.upsert(existing,
      Seq((path, "new")).toDF("path", "content"), now)
    assert(updated.count() == 1)
    assert(updated.select("content").as[String].collect().head == "new")
    assert(updated.select("last_modified_date")
      .as[java.sql.Timestamp].collect().head == now)
    // same path, same content → untouched timestamp
    val same = CdItems.upsert(existing,
      Seq((path, "old")).toDF("path", "content"), now)
    assert(same.select("last_modified_date")
      .as[java.sql.Timestamp].collect().head == TS)
    // different path → 2 rows
    val inserted = CdItems.upsert(existing,
      Seq(("new/blob/path.json", "x")).toDF("path", "content"), now)
    assert(inserted.count() == 2)
  }
}
