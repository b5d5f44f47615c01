package graft

import graft.miners.RouteRegistry
import graft.streaming.Frontier
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** X3 — the generated route registries against the python-re dispatch
  * fixture (tools/route_fixture.json, emitted by tools/gen_routes.py
  * alongside RouteRegistry.scala): every template URI must dispatch
  * identically under java.util.regex as under Python's re with the
  * reference's `^pat$` full-match semantics (`minecode/route.py:55-66`,
  * `:161-185`). The third engine (DuckDB RE2) is cross-checked by the
  * x3_route_dispatch oracle.
  */
class RouteSpec extends SparkTestBase {

  private lazy val fixture: List[(String, Map[String, (Int, Option[String], String)])] = {
    val src = scala.io.Source.fromFile("tools/route_fixture.json")
    val root = try JsonMethods.parse(src.mkString) finally src.close()
    root.asInstanceOf[JArray].arr.map { e =>
      val uri = (e \ "uri").asInstanceOf[JString].s
      val dispatch = (e \ "dispatch").asInstanceOf[JObject].obj.map {
        case (router, d) =>
          val n = (d \ "n_matches").asInstanceOf[JInt].num.toInt
          val h = d \ "handler" match {
            case JString(s) => Some(s)
            case _          => None
          }
          val st = (d \ "status").asInstanceOf[JString].s
          router -> ((n, h, st))
      }.toMap
      uri -> dispatch
    }
  }

  test("registry sizes match the reference's active registrations") {
    // 95 visit + 44 map + 56 priority patterns — the priority count
    // includes the 29 fetchcode purls resolved through the generic.py
    // splat; pinned so a reference re-read that drops or grows a
    // registration fails loudly here
    assert(RouteRegistry.visit.size == 95)
    assert(RouteRegistry.map.size == 44)
    assert(RouteRegistry.priority.size == 56)
    // route.py:112-117 RouteAlreadyDefined: patterns unique per router
    for (reg <- Seq(RouteRegistry.visit, RouteRegistry.map,
        RouteRegistry.priority))
      assert(reg.map(_._1).distinct.size == reg.size)
  }

  test("java-regex dispatch reproduces the python-re fixture exactly") {
    assert(fixture.nonEmpty)
    var checked = 0
    for ((uri, expected) <- fixture; (routerName, (n, h, st)) <- expected) {
      val r = RouteRegistry.router(routerName)
      assert(r.matchCount(uri) == n,
        s"$routerName matchCount($uri): got ${r.matchCount(uri)}, want $n")
      r.resolveEither(uri) match {
        case Right(handler) =>
          assert(st == "ok" && h.contains(handler),
            s"$routerName resolve($uri): got $handler, want $h/$st")
        case Left(e) if e.startsWith("no route") =>
          assert(st == "no_route", s"$routerName resolve($uri): $e vs $st")
        case Left(e) =>
          assert(st == "ambiguous", s"$routerName resolve($uri): $e vs $st")
      }
      assert(r.isRoutable(uri) == (n > 0))
      checked += 1
    }
    // every fixture row checks all three routers
    assert(checked == fixture.size * 3)
    // the corpus genuinely exercises all branches in every router
    for (router <- Seq("visit", "map", "priority")) {
      val sts = fixture.map(_._2(router)._3).toSet
      assert(sts == Set("ok", "no_route", "ambiguous"),
        s"$router branch coverage: $sts")
    }
  }

  test("withRoutability computes models.py save-time flags via rlike") {
    import spark.implicits._
    val uris = Seq(
      // visitable + mappable (pom: MavenPOMVisitor / MavenPomMapper)
      "https://repo1.maven.org/maven2/junit/junit/4.13/junit-4.13.pom",
      // visitable only (bitbucket index visit pattern, no map route)
      "https://api.bitbucket.org/2.0/repositories?pagelen=50",
      // mappable only (maven-index:// has no visit route)
      "maven-index://repo1.maven.org/part7",
      // neither
      "https://example.org/nothing/1")
    val out = Frontier.withRoutability(uris.toDF("uri"))
      .select("uri", "is_visitable", "is_mappable")
      .as[(String, Boolean, Boolean)].collect()
      .map { case (u, v, m) => u -> ((v, m)) }.toMap
    assert(out(uris(0)) == ((true, true)))
    assert(out(uris(1)) == ((true, false)))
    assert(out(uris(2)) == ((false, true)))
    assert(out(uris(3)) == ((false, false)))
    // the rlike flags agree with the Router's alternation fast path
    for (u <- uris) {
      assert(out(u)._1 == RouteRegistry.visitRouter.isRoutable(u))
      assert(out(u)._2 == RouteRegistry.mapRouter.isRoutable(u))
    }
  }

  test("literal-prefix pruning is sound on every registry pattern") {
    import graft.miners.Router
    // tricky shapes: optional literal stops the scan BEFORE the unit,
    // + keeps one copy, escapes split literal vs class
    assert(Router.literalPrefix("""https?://apache.org/x""") == "http")
    assert(Router.literalPrefix("""http?s://x""") == "htt")
    assert(Router.literalPrefix("""https*://x""") == "http")
    assert(Router.literalPrefix("""ab+c""") == "ab")
    assert(Router.literalPrefix("""pkg:generic/.*?download_url=.*""") ==
      "pkg:generic/")
    assert(Router.literalPrefix("""\.meta""") == ".meta")
    assert(Router.literalPrefix("""\w+/x""") == "")
    assert(Router.literalPrefix(""".+/repomd.xml""") == "")
    assert(Router.literalPrefix("""a\-b\.c""") == "a-b.c")
    // conservative: {n,m} could be {0,..}, so the scan stops before
    assert(Router.literalPrefix("""a{2}b""") == "")
    // top-level alternation voids any prefix ("a|b" matches "b");
    // grouped or class-contained pipes do not
    assert(Router.literalPrefix("""abc|def""") == "")
    assert(Router.literalPrefix("""ab(c|d)e""") == "ab")
    assert(Router.literalPrefix("""ab[c|d]e""") == "ab")
    assert(Router.literalPrefix("""ab\|c""") == "ab|c")
    // soundness over the whole registry: every regex full-match in the
    // fixture corpus starts with the pattern's computed prefix
    val allPats = (RouteRegistry.visit ++ RouteRegistry.map ++
      RouteRegistry.priority).map(_._1).distinct
    var matchedPairs = 0
    for (pat <- allPats) {
      val p = java.util.regex.Pattern.compile(pat)
      val prefix = Router.literalPrefix(pat)
      for ((uri, _) <- fixture if p.matcher(uri).matches()) {
        assert(uri.startsWith(prefix),
          s"unsound prefix '$prefix' for pattern '$pat' on $uri")
        matchedPairs += 1
      }
    }
    assert(matchedPairs > 250) // the corpus really exercises the prune
  }

  test("index-request routability gate diverts unroutable purls") {
    import spark.implicits._
    // packagedb/api.py:1021-1027: routable purls queue (insert-if-
    // absent), unroutable ones land in unsupported_packages
    val pending = Seq(("pkg:npm/lodash@4.17.21", null.asInstanceOf[String]))
      .toDF("uri", "processed_date")
    val reqs = Seq(
      "pkg:npm/lodash@4.17.21",   // already pending — not duplicated
      "pkg:pypi/requests@2.31.0", // routable — queued
      "pkg:brew/wget@1.24",       // no collector route — unsupported
      "pkg:nix/other/hello@2.12"  // nix requires the nixpkgs namespace
    ).map((_, null.asInstanceOf[String])).toDF("uri", "processed_date")
    val (queue, unsupported) =
      graft.streaming.Queues.insertRoutableRequests(pending, reqs)
    assert(queue.select("uri").as[String].collect().sorted.toSeq ==
      Seq("pkg:npm/lodash@4.17.21", "pkg:pypi/requests@2.31.0"))
    assert(unsupported.select("uri").as[String].collect().sorted.toSeq ==
      Seq("pkg:brew/wget@1.24", "pkg:nix/other/hello@2.12"))
  }

  test("pruned dispatch equals naive all-patterns dispatch on mutants") {
    // the fixture pins agreement on well-formed URIs; mutants probe
    // the prune gate off the happy path (truncations, case flips,
    // injected chars) where an unsound literalPrefix would diverge
    // from running every regex
    val base = RouteRegistry.templates.map(_.replace("#K#", "7"))
    val mutants = base.flatMap { u =>
      Seq(u.dropRight(1), u + "x", u.toUpperCase, "x" + u,
        u.replace("/", "//"), u.take(u.length / 2), u.reverse)
    }.distinct
    val regs = Seq(RouteRegistry.visit, RouteRegistry.map,
      RouteRegistry.priority)
    val routers = Seq("visit", "map", "priority").map(RouteRegistry.router)
    val compiled = regs.map(_.map { case (p, _) =>
      java.util.regex.Pattern.compile(p) })
    var divergent = 0
    for (u <- mutants; i <- regs.indices) {
      val naive = compiled(i).count(_.matcher(u).matches())
      if (routers(i).matchCount(u) != naive) divergent += 1
      assert(routers(i).matchCount(u) == naive,
        s"prune diverges on router $i for: $u")
      assert(routers(i).isRoutable(u) == (naive > 0))
    }
    assert(divergent == 0 && mutants.size > 500)
  }

  test("getVisitables consumes registry-derived flags end-to-end") {
    import spark.implicits._
    import java.sql.Timestamp
    // the reference computes is_visitable/is_mappable at save time
    // from the routers (models.py:478-483) and get_visitables then
    // filters on them (models.py:241-273) — compose both here with
    // REAL route outcomes instead of synthetic flags
    val now = Timestamp.valueOf("2026-08-13 00:00:00")
    val stale = Timestamp.valueOf("2026-07-01 00:00:00") // > 240h ago
    val rows = Seq(
      // visitable + mappable (pom routes in both registries): stale
      // visit but never mapped -> EXCLUDED (mappable-pending rule)
      ("https://repo1.maven.org/maven2/a/b/1/b-1.pom", Some(stale)),
      // visitable, NOT mappable (metadata has no map route): stale
      // visit -> revisitable
      ("https://repo.maven.apache.org/x/maven-metadata.xml", Some(stale)),
      // unroutable: never visited -> excluded (not visitable)
      ("https://example.org/opaque.bin", None),
      // visitable, never visited -> visitable now
      ("https://registry.bower.io/packages", None))
      .map { case (u, d) => (u, d.orNull) }
      .toDF("uri", "last_visit_date")
      .withColumn("priority", lit(0))
      .withColumn("last_map_date", lit(null).cast("timestamp"))
      .withColumn("wip_date", lit(null).cast("timestamp"))
    val out = Frontier.getVisitables(Frontier.withRoutability(rows), now)
      .select("uri").as[String].collect().toSet
    assert(out == Set(
      "https://repo.maven.apache.org/x/maven-metadata.xml",
      "https://registry.bower.io/packages"))
  }

  test("seed insert honors pattern, pending block, and revisit gate") {
    import spark.implicits._
    import java.sql.Timestamp
    // seed.py:42-89 + models.py:204-217 — absent seeds insert at
    // priority 100; a pending row blocks; a stale visited row
    // re-seeds as a NEW pending row; a fresh visited row does not;
    // the pattern is a prefix match like python's re.match
    val now = Timestamp.valueOf("2026-08-13 00:00:00")
    val stale = Timestamp.valueOf("2026-07-01 00:00:00")
    val fresh = Timestamp.valueOf("2026-08-12 00:00:00")
    val nullT = null.asInstanceOf[Timestamp]
    val f0 = graft.streaming.Frontier.withRoutability(Seq(
      // pending — blocks its seed
      ("https://registry.bower.io/packages", nullT, nullT),
      // stale visited, visit-only route -> revisitable
      ("https://repo.maven.apache.org/x/maven-metadata.xml", stale, nullT),
      // fresh visited -> not revisitable
      ("https://pypi.python.org/pypi/", fresh, nullT))
      .toDF("uri", "last_visit_date", "wip_date")
      .withColumn("priority", lit(0))
      .withColumn("last_map_date", lit(null).cast("timestamp")))
    val seeds = Seq(
      "https://registry.bower.io/packages",
      "https://repo.maven.apache.org/x/maven-metadata.xml",
      "https://pypi.python.org/pypi/",
      "https://lib.haxe.org/all",     // absent -> inserted
      "rsync://yum.postgresql.org")   // filtered out by the pattern
    val f1 = graft.streaming.Frontier.insertSeedUris(
      f0, seeds, now, pattern = Some("https://"))
    val added = f1.join(f0.select("uri", "last_visit_date")
        .withColumnRenamed("last_visit_date", "old"),
      Seq("uri"), "left")
      .filter(col("last_visit_date").isNull)
      .select("uri", "priority").distinct()
      .as[(String, Int)].collect().toSet
    // pending rows: the blocked original (priority 0) + the two seeds
    assert(added == Set(
      ("https://registry.bower.io/packages", 0),
      ("https://repo.maven.apache.org/x/maven-metadata.xml", 100),
      ("https://lib.haxe.org/all", 100)))
    // the revisit seed coexists with its visited row (duplicate uri,
    // distinct (canonical, last_visit_date) identity)
    assert(f1.filter(col("uri") ===
      "https://repo.maven.apache.org/x/maven-metadata.xml").count() == 2)
    assert(f1.count() == 5)
  }

  test("checkUri annotates recent prefix rows with route resolutions") {
    import spark.implicits._
    // check_uri.py:58-118 — recent rows under the prefix, visit/map
    // resolution with the No-Route fallback, eligibility flags
    val f = Seq(
      "https://repo1.maven.org/maven2/a/b/1/b-1.pom",   // visit+map ok
      "https://repo1.maven.org/maven2/zzz/maven-metadata.xml", // visit ok
      "https://repo1.maven.org/maven2/unroutable.bin",  // neither
      "https://other.example/x")                        // outside prefix
      .toDF("uri")
    val out = Frontier.checkUri(f, "https://repo1.maven.org/", limit = 2)
      .select("uri", "visit_route", "map_route", "is_visitable",
        "is_mappable")
      .as[(String, String, String, Boolean, Boolean)].collect()
    // descending uri recency: zzz row first, then unroutable.bin
    assert(out.length == 2)
    assert(out(0) == (("https://repo1.maven.org/maven2/zzz/maven-metadata.xml",
      "maven.MavenMetaDataVisitor", "No Route Available", true, false)))
    assert(out(1) == (("https://repo1.maven.org/maven2/unroutable.bin",
      "No Route Available", "No Route Available", false, false)))
  }

  test("loadPriorityQueue creates one maven request per sha1 hit") {
    import spark.implicits._
    // load_priority_queue.py:33-60 — injected index lookup, empty
    // coordinates skipped, null sha1 skipped, direct create
    val resources = Seq(("a" * 40, "f1"), ("b" * 40, "f2"),
      (null.asInstanceOf[String], "f3")).toDF("sha1", "path")
    val lookup: String => Seq[(String, String, String)] = {
      case s if s.startsWith("aa") =>
        Seq(("org.apache", "commons-io", "2.16"), ("", "skipme", "1.0"))
      case _ => Seq.empty
    }
    val out = graft.streaming.Queues
      .loadPriorityQueue(spark, resources, lookup)
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(("pkg:maven/org.apache/commons-io@2.16",
      "pkg:maven/org.apache/commons-io@2.16", "a" * 40)))
  }

  test("ambiguous reference registrations are faithfully ambiguous") {
    // minecode/miners/debian.py:500 vs :571 — a dists/.../Packages.gz
    // URI full-matches both the Packages mapper and the .gz archive
    // mapper; the reference's resolve raises MultipleRoutesDefined
    // (route.py:175-183), so ours must refuse too
    val uri = "http://ftp.debian.org/debian/dists/sid/main/binary-amd64/Packages.gz"
    assert(RouteRegistry.mapRouter.matchCount(uri) == 2)
    assert(RouteRegistry.mapRouter.resolveEither(uri).isLeft)
    // while the visit router resolves the same URI uniquely
    assert(RouteRegistry.visitRouter.resolveEither(uri) ==
      Right("debian.DebianPackagesVisitor"))
  }
}
