package graft

import graft.catalog._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral port of the reference's merge semantics
  * (minecode/model_utils.py:70-330, tests in
  * minecode/tests/test_model_utils.py): level-based replace rules,
  * empty-wins filling, checksum conflicts, history provenance,
  * child-set replacement, resource upsert.
  */
class MergeEngineSpec extends SparkTestBase {
  import spark.implicits._

  private val NOW = "2026-08-12T00:00:00Z"

  private def existingDf: DataFrame = Seq(
    PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.0"),
      miningLevel = 50)
      .copy(description = Some("old desc"), sha1 = Some("aaaa"),
        homepage_url = None),
    PackageRow.minimal("http://x/b.jar", "maven", "b", Some("2.0"),
      miningLevel = 50)).toDF()

  private def incoming(rows: PackageRow*)(level: Int): DataFrame =
    rows.toDF().withColumn("visit_level", lit(level))

  test("creates a package when none exists") {
    val in = incoming(PackageRow.minimal("http://x/new.jar", "npm", "n",
      Some("3.0")))(40)
    val out = MergeEngine.mergePackages(existingDf, in, NOW)
    val created = out.packages.filter($"download_url" === "http://x/new.jar")
      .collect().head
    assert(created.getAs[String]("ptype") == "npm")
    assert(created.getAs[Int]("mining_level") == 40)
    assert(out.errors.count() == 0)
    assert(out.packages.count() == 3)
  }

  test("lower visit level only fills empty fields, keeps mining_level") {
    val in = incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.0"))
        .copy(description = Some("NEW desc"), homepage_url = Some("http://home")))(
      level = 10)
    val row = MergeEngine.mergePackages(existingDf, in, NOW)
      .packages.filter($"download_url" === "http://x/a.jar").collect().head
    // non-empty existing wins at lower level
    assert(row.getAs[String]("description") == "old desc")
    // empty existing filled from new
    assert(row.getAs[String]("homepage_url") == "http://home")
    assert(row.getAs[Int]("mining_level") == 50)
    val hist = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("history"))
    assert(hist.size == 1 && hist.head.getAs[String]("message") ==
      "Package field values have been updated.")
    val updated = row.getSeq[org.apache.spark.sql.Row](
      row.fieldIndex("updated_fields"))
    assert(updated.map(_.getAs[String]("field")) == Seq("homepage_url"))
    assert(updated.head.getAs[String]("new_value") == "http://home")
  }

  test("higher/equal visit level replaces non-empty values and bumps level") {
    val in = incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.1"))
        .copy(description = Some("NEW desc")))(level = 60)
    val row = MergeEngine.mergePackages(existingDf, in, NOW)
      .packages.filter($"download_url" === "http://x/a.jar").collect().head
    assert(row.getAs[String]("description") == "NEW desc")
    assert(row.getAs[String]("version") == "1.1")
    assert(row.getAs[Int]("mining_level") == 60)
  }

  test("empty new values never overwrite existing values") {
    val in = incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", version = None))(60)
    val row = MergeEngine.mergePackages(existingDf, in, NOW)
      .packages.filter($"download_url" === "http://x/a.jar").collect().head
    assert(row.getAs[String]("version") == "1.0")
    assert(row.getAs[String]("description") == "old desc")
  }

  test("checksum conflict routes to errors and leaves the package untouched") {
    val in = incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("9.9"))
        .copy(sha1 = Some("bbbb")))(60)
    val out = MergeEngine.mergePackages(existingDf, in, NOW)
    val row = out.packages.filter($"download_url" === "http://x/a.jar")
      .collect().head
    assert(row.getAs[String]("version") == "1.0") // untouched
    assert(row.getAs[String]("sha1") == "aaaa")
    val err = out.errors.collect()
    assert(err.length == 1)
    assert(err.head.getSeq[String](err.head.fieldIndex("fields")).toSeq ==
      Seq("sha1"))
  }

  test("no history entry when nothing fills or replaces") {
    // lower level + no empty existing fields fillable → no entries.
    // (In replace mode the reference DOES record no-op entries for
    // equal values — see the run_map goldens replayed in
    // MapUriCorpusSpec.)
    val in = incoming(
      PackageRow.minimal("http://x/b.jar", "maven", "b", Some("2.0")))(10)
    val row = MergeEngine.mergePackages(existingDf, in, NOW)
      .packages.filter($"download_url" === "http://x/b.jar").collect().head
    assert(row.getSeq[Any](row.fieldIndex("history")).isEmpty)
    assert(row.getSeq[Any](row.fieldIndex("updated_fields")).isEmpty)
  }

  test("child sets replace in replace-mode, else kept unless empty") {
    val existingParties = Seq(
      PartyRow("http://x/a.jar", "person", Some("owner"), Some("Old"), None, None))
      .toDF()
    val newParties = Seq(
      PartyRow("http://x/a.jar", "person", Some("owner"), Some("New"), None, None),
      PartyRow("http://x/b.jar", "org", Some("maint"), Some("OrgB"), None, None))
      .toDF()
    // level 10 < 50 → keep old for a (non-empty), take new for b (empty)
    val decisions = MergeEngine.childDecisions(existingDf,
      newParties.select($"download_url").distinct()
        .withColumn("visit_level", lit(10)),
      existingParties)
    val merged = MergeEngine.mergeChildSet(existingParties, newParties, decisions)
    val names = merged.select("name").as[String].collect().toSet
    assert(names == Set("Old", "OrgB"))
    // level 60 ≥ 50 → replace for both
    val decisions2 = MergeEngine.childDecisions(existingDf,
      newParties.select($"download_url").distinct()
        .withColumn("visit_level", lit(60)),
      existingParties)
    val merged2 = MergeEngine.mergeChildSet(existingParties, newParties, decisions2)
    assert(merged2.select("name").as[String].collect().toSet == Set("New", "OrgB"))
  }

  test("resource upsert replaces on (download_url, path), keeps others") {
    val existing = Seq(
      ResourceRow("u", "a/x.txt", true, Some("x.txt"), None, Some(1L), None,
        Some("s1"), None, None, None),
      ResourceRow("u", "a/y.txt", true, Some("y.txt"), None, Some(2L), None,
        None, None, None, None)).toDF()
    val incoming = Seq(
      ResourceRow("u", "a/x.txt", true, Some("x.txt"), None, Some(99L), None,
        Some("s1-new"), None, None, None)).toDF()
    val out = MergeEngine.upsertResources(existing, incoming)
    assert(out.count() == 2)
    val x = out.filter($"path" === "a/x.txt").collect().head
    assert(x.getAs[Long]("size") == 99L)
    assert(x.getAs[String]("sha1") == "s1-new")
  }

  test("scan-field upsert: base fields kept, scan fields truthy-gated") {
    // (model_utils.py:452-497 + set_scan_results): matched rows keep
    // base fields; a scan field only takes a TRUTHY incoming value
    val existing = Seq(
      ("u", "a/x.txt", "x.txt", 1L, "lic-old", "c-old", 3.0),
      ("u", "a/y.txt", "y.txt", 2L, "", "c-old-y", 0.0)
    ).toDF("download_url", "path", "name", "size",
      "detected_license_expression", "copyrights",
      "percentage_of_license_text")
    val incoming = Seq(
      // truthy lic overwrites; empty copyrights + zero pct keep old
      ("u", "a/x.txt", "x-new", 99L, "lic-new", "", 0.0),
      // new key inserts as-is, even with empty scan fields
      ("u", "a/z.txt", "z.txt", 5L, "", "c-z", 1.0)
    ).toDF("download_url", "path", "name", "size",
      "detected_license_expression", "copyrights",
      "percentage_of_license_text")
    val out = MergeEngine.upsertResourcesScanFields(existing, incoming,
      Seq("detected_license_expression", "copyrights",
        "percentage_of_license_text"))
    assert(out.count() == 3)
    val x = out.filter($"path" === "a/x.txt").collect().head
    assert(x.getAs[String]("name") == "x.txt") // base field never updated
    assert(x.getAs[Long]("size") == 1L)
    assert(x.getAs[String]("detected_license_expression") == "lic-new")
    assert(x.getAs[String]("copyrights") == "c-old") // "" keeps old
    assert(x.getAs[Double]("percentage_of_license_text") == 3.0) // 0 keeps old
    val y = out.filter($"path" === "a/y.txt").collect().head
    assert(y.getAs[String]("copyrights") == "c-old-y") // untouched row
    val z = out.filter($"path" === "a/z.txt").collect().head
    assert(z.getAs[String]("name") == "z.txt") // new key inserts wholesale
    assert(z.getAs[String]("detected_license_expression") == "")
  }
}
