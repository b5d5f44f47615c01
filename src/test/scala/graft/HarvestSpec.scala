package graft

import graft.catalog.PackageRow
import graft.clearindex.Harvest

class HarvestSpec extends SparkTestBase {
  import spark.implicits._

  private val item = """{
    "content": {
      "summary": {"packages": [
        {"type": "npm", "name": "lodash", "version": "4.17.21",
         "download_url": "https://registry.npmjs.org/lodash/-/lodash-4.17.21.tgz",
         "license_expression": "mit", "description": "utility"},
        {"purl": "pkg:npm/broken"}
      ]},
      "files": [
        {"path": "package/index.js", "type": "file", "size": 100,
         "sha1": "abc",
         "license_expressions": ["mit", "mit", "apache-2.0"],
         "copyrights": [{"value": "(c) JS Foundation"},
                        {"value": "(c) JS Foundation"}]},
        {"path": "package", "type": "directory"}
      ]
    }
  }"""

  test("parseItem: packages, dedup'd file statements, url-less errors") {
    val r = Harvest.parseItem("npm/lodash/4.17.21", item)
    assert(r.packages.size == 1)
    val p = r.packages.head
    assert(p.ptype == "npm" && p.name == "lodash")
    assert(p.declared_license_expression.contains("mit"))
    // second package has no download_url → map error, not a row
    assert(r.errors ==
      Seq("CDitemError: empty download_url for package: pkg:npm/broken"))
    // resources: license/copyright statements deduped + newline-joined
    val file = r.resources.find(_.path == "package/index.js").get
    assert(file.is_file)
    assert(file.license_expression.contains("apache-2.0\nmit"))
    assert(file.copyright.contains("(c) JS Foundation"))
    val dir = r.resources.find(_.path == "package").get
    assert(!dir.is_file && dir.license_expression.isEmpty)
  }

  test("parseItem: unparseable payload becomes an item-level error") {
    val r = Harvest.parseItem("cd/bad", "{not json")
    assert(r.packages.isEmpty && r.resources.isEmpty)
    assert(r.errors.head.contains("empty content field"))
    assert(r.errors.head.contains("cd/bad"))
  }

  test("mapHarvests merges fill-empty and dedups resource paths") {
    val catalog = Seq(
      PackageRow.minimal(
        "https://registry.npmjs.org/lodash/-/lodash-4.17.21.tgz",
        "npm", "lodash", Some("4.17.21"), miningLevel = 10)
        .copy(description = Some("existing desc"))).toDF()
    val harvests = Seq(
      ("npm/lodash/4.17.21", item),
      ("npm/lodash/4.17.21-dup", item), // same package+files again
      ("cd/bad", "{not json")).toDF("path", "data")
    val out = Harvest.mapHarvests(spark, catalog, harvests,
      "2026-08-12T00:00:00Z")
    val pkgs = out.packages.collect()
    assert(pkgs.length == 1)
    // fill-empty: existing description NOT replaced (visit_level 0 < 10)
    assert(pkgs.head.getAs[String]("description") == "existing desc")
    // resources deduped on (package, path)
    assert(out.resources.count() == 2)
    val errs = out.errors.as[(String, String)].collect()
    assert(errs.exists(_._2.contains("empty download_url")))
    assert(errs.exists(_._2.contains("empty content field")))
  }
}
