package graft.api

import graft.functions.GraftFunctions.{natver_key, purl_parse}
import graft.ops.SearchDsl
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The catalog query surface — §3.1's request lifecycle compiled to a
  * single DataFrame plan: filter binding (PackageFilterSet,
  * `packagedb/api.py:318-370`), search DSL (P5), multi-PURL
  * disjunctions (P4), validated multi-field sort (O1,
  * `packagedb/api.py:303-315`), stable pagination (O4), the
  * checksum batch lookup with earliest-release preference (J9/W1,
  * `packagedb/api.py:474-492`), and latest-version resolution (A7).
  *
  * The REST layer itself is out of Spark scope (SURVEY §2.1 S16); this
  * is the part that must scale — every request compiles to one lazy
  * plan with filters pushed to the scan.
  */
object CatalogApi {

  /** Whitelisted sort fields (reference allows 11; `-` prefix = desc). */
  val sortableFields: Set[String] = Set("ptype", "namespace", "name",
    "version", "download_url", "release_date", "mining_level", "size",
    "sha1", "md5", "package_content")

  final case class Query(
      purls: Seq[String] = Seq.empty,          // P1/P4 OR-of-lookups
      search: Option[String] = None,           // P5 mini-DSL
      filters: Map[String, Seq[String]] = Map.empty, // P2/P3 iexact/IN
      sort: Seq[String] = Seq.empty,           // O1, "-field" for desc
      page: Int = 1,
      pageSize: Int = 20)

  /** P1 — one PURL string → conjunctive equality predicate over the
    * parsed components (null components are omitted, reference
    * purl_to_lookups). */
  def purlPredicate(packages: DataFrame, purl: String): Column = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) lit(false)
    else {
      val fields = Seq("ptype", "namespace", "name", "version",
        "qualifiers", "subpath")
      fields.zip(parsed).collect {
        case (f, v) if v != null => col(f) === v
      }.reduceOption(_ && _).getOrElse(lit(false))
    }
  }

  /** Compile a [[Query]] into a DataFrame plan over the packages
    * table. */
  def compile(packages: DataFrame, q: Query): DataFrame = {
    var df = packages

    if (q.purls.nonEmpty)
      df = df.filter(q.purls.map(purlPredicate(packages, _))
        .reduce(_ || _)).dropDuplicates("download_url")

    q.search.foreach { dsl =>
      val searchable = Map(
        "type" -> col("ptype"), "namespace" -> col("namespace"),
        "name" -> col("name"), "version" -> col("version"),
        "download_url" -> col("download_url"))
      df = df.filter(SearchDsl.compile(dsl, searchable,
        bareFields = Seq(col("ptype"), col("namespace"), col("name"),
          col("version"), col("download_url"))))
    }

    q.filters.foreach { case (field, values) =>
      require(df.columns.contains(field), s"unknown filter field: $field")
      df = values match {
        case Seq(one) => df.filter(lower(col(field)) === one.toLowerCase)
        case many     => df.filter(col(field).isin(many: _*))
      }
    }

    val sortCols = q.sort.map { s =>
      val (desc0, f) =
        if (s.startsWith("-")) (true, s.drop(1)) else (false, s)
      require(sortableFields.contains(f), s"unsortable field: $f")
      val c = if (f == "version") natver_key(col("version")) else col(f)
      if (desc0) c.desc_nulls_last else c.asc_nulls_last
    } :+ col("download_url").asc // unique tiebreak → stable pages
    val sorted = df.orderBy(sortCols: _*)

    // stable offset pagination (O4): orderBy + limit plans as a
    // distributed top-k (TakeOrderedAndProject) — never a global
    // single-partition window over the full filtered table. The
    // row_number tail-filter below runs over at most page*pageSize
    // rows, a driver-bounded set. page/pageSize are user-controlled:
    // clamp in Long math so a huge page can neither overflow Int (a
    // negative limit throws) nor turn the "driver-bounded" top-k into
    // an unbounded full-table sort.
    val MaxResultWindow = 100000L
    val pageSize = math.max(1, math.min(q.pageSize, 1000))
    val page = math.max(1L, q.page.toLong)
    val window = math.min(page * pageSize, MaxResultWindow)
    val topK = sorted.limit(window.toInt)
    val w = Window.orderBy(sortCols: _*)
    topK.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > math.min((page - 1L) * pageSize,
        MaxResultWindow))
      .drop("__rn")
  }

  /** J9/W1 — checksum batch lookup: for each requested sha1 keep only
    * the earliest-released package (`packagedb/api.py:474-492`). With
    * `setMembers` (set_id, download_url) supplied, each hit is
    * additionally enhanced from its package-set peers before being
    * returned — the reference's `enhance_package_data=true` path
    * (`packagedb/api.py:493-499` → `get_enhanced_package`). */
  def filterByChecksums(packages: DataFrame, sha1s: Seq[String],
      setMembers: Option[DataFrame] = None): DataFrame = {
    val hits = packages.filter(col("sha1").isin(sha1s: _*))
    val w = Window.partitionBy(col("sha1"))
      .orderBy(col("release_date").asc_nulls_last, col("download_url"))
    val base = hits.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    setMembers match {
      case None => base
      case Some(sets) =>
        // only sets containing a hit matter; the hit list is a small
        // request batch, so the set restriction broadcasts
        val hitSets = sets
          .join(broadcast(base.select(col("download_url"))), "download_url")
          .select("set_id").distinct()
        val members = sets.join(broadcast(hitSets), "set_id")
          .join(packages.select(col("download_url"),
            col("package_content"), col("description"),
            col("homepage_url"), col("declared_license_expression"),
            col("copyright")), "download_url")
          .select("set_id", "download_url", "package_content",
            "description", "homepage_url",
            "declared_license_expression", "copyright")
        val enhanced = graft.catalog.Enhance
          .enhance(packages.sparkSession, members)
          .select(col("download_url"),
            col("description").as("__e_desc"),
            col("homepage_url").as("__e_home"),
            col("declared_license_expression").as("__e_lic"),
            col("copyright").as("__e_cop"),
            col("enhanced_by"))
        base.join(enhanced, Seq("download_url"), "left")
          .withColumn("description",
            coalesce(col("__e_desc"), col("description")))
          .withColumn("homepage_url",
            coalesce(col("__e_home"), col("homepage_url")))
          .withColumn("declared_license_expression",
            coalesce(col("__e_lic"), col("declared_license_expression")))
          .withColumn("copyright",
            coalesce(col("__e_cop"), col("copyright")))
          .drop("__e_desc", "__e_home", "__e_lic", "__e_cop")
    }
  }

  /** A7 — latest version of a (type, namespace, name) group by
    * natural-version order. */
  def latestVersion(packages: DataFrame, ptype: String,
      namespace: Option[String], name: String): DataFrame = {
    val nsPred = namespace
      .map(ns => col("namespace") === ns)
      .getOrElse(col("namespace").isNull)
    packages
      .filter(col("ptype") === ptype && nsPred && col("name") === name)
      .orderBy(natver_key(col("version")).desc, col("download_url"))
      .limit(1)
  }

  final case class ResolvedPackages(
      resolved: Seq[(String, Int)], // (purl, priority)
      unsupportedPurls: Seq[String],
      unsupportedVers: Seq[String])

  /** `get_resolved_packages` (`packagedb/api.py:1238-1290`): each
    * request is a purl with an optional vers range. Versioned purls
    * pass through at priority 100; versionless purls resolve against
    * the upstream version list (all versions, or the vers-range
    * subset via the VERSION-RANGE-SPEC containment); malformed or
    * unsupported inputs are reported, not dropped silently. */
  def resolvePackages(requests: Seq[(String, Option[String])],
      fetchVersions: String => Option[Seq[String]],
      supportedEcosystems: Seq[String] =
        graft.streaming.Queues.FetchSupportedEcosystems)
      : ResolvedPackages = {
    val resolved = scala.collection.mutable.LinkedHashMap
      .empty[String, Int]
    val badPurls = scala.collection.mutable.LinkedHashSet.empty[String]
    val badVers = scala.collection.mutable.LinkedHashSet.empty[String]
    for ((purl, vers) <- requests if purl != null && purl.nonEmpty) {
      val parsed = graft.functions.PurlParse.parse(purl)
      if (parsed == null) badPurls += purl
      else if (!supportedEcosystems.contains(parsed(0))) badPurls += purl
      else if (parsed(3) != null) resolved(purl) = 100
      else {
        val versionless = s"pkg:${parsed(0)}" +
          Option(parsed(1)).map("/" + _).getOrElse("") + s"/${parsed(2)}"
        val all = fetchVersions(versionless).getOrElse(Seq.empty)
        val matching = vers match {
          case None => all
          case Some(v) =>
            val hits = all.filter(ver =>
              graft.functions.VersRange.contains(v, ver).contains(true))
            if (hits.isEmpty) { badVers += v; Seq.empty }
            else hits
        }
        matching.foreach(ver => resolved(s"$versionless@$ver") = 0)
      }
    }
    ResolvedPackages(resolved.toSeq, badPurls.toSeq, badVers.toSeq)
  }

  final case class PurlValidation(purl: String, valid: Boolean,
      exists: Option[Boolean], message: String)

  /** GET /api/validate/ (`packagedb/api.py:1124-1238`): syntax check,
    * then optional existence — first against the catalog, then against
    * the upstream registry via the injected `fetchVersions` (the
    * collect flow; returns None on fetch failure). Messages are the
    * reference's verbatim strings. */
  /** The `update_packages` endpoint (`packagedb/api.py:520-586`):
    * each (purl, content_type) request reports "Already Exists" when
    * the purl matches a catalog row, otherwise a bare row is created
    * (the reference stores a single-space download_url and the
    * content-type code) and reported "Updated". An unparseable purl
    * reports "Invalid PURL" — the reference's purl_to_lookups raises
    * there (the whole request errors); a per-row error status is the
    * batch-friendly equivalent. Returns the per-purl statuses and the
    * created rows — set assignment is the caller's
    * [[graft.catalog.PackageSets]] pass over the created frame.
    *
    * Existence for ALL requested purls is resolved in ONE catalog
    * pass: a single aggregation with one conditional-max flag per
    * request (requests are API-bounded), not a per-purl isEmpty
    * action. */
  final case class UpdateResult(
      statuses: Seq[(String, String)],
      created: Seq[graft.catalog.PackageRow])

  def updatePackages(packages: DataFrame,
      requests: Seq[(String, Int)]): UpdateResult = {
    val parsedReqs = requests.map { case (purl, ct) =>
      (purl, ct, Option(graft.functions.PurlParse.parse(purl)))
    }
    val flagged = parsedReqs.zipWithIndex.collect {
      case ((purl, _, Some(_)), i) =>
        i -> max(when(purlPredicate(packages, purl), 1).otherwise(0))
          .as(s"m$i")
    }
    val existsByIdx: Map[Int, Boolean] = flagged match {
      case Seq() => Map.empty
      case (_, h) +: rest =>
        val row = packages.agg(h, rest.map(_._2): _*).head()
        flagged.zipWithIndex.map { case ((reqIdx, _), c) =>
          reqIdx -> (!row.isNullAt(c) && row.getInt(c) == 1)
        }.toMap
    }
    val statuses = Seq.newBuilder[(String, String)]
    val created = Seq.newBuilder[graft.catalog.PackageRow]
    parsedReqs.zipWithIndex.foreach {
      case ((purl, _, None), _) => statuses += purl -> "Invalid PURL"
      case ((purl, _, Some(_)), i) if existsByIdx(i) =>
        statuses += purl -> "Already Exists"
      case ((purl, contentType, Some(parsed)), _) =>
        val Array(ptype, namespace, name, version, qualifiers, subpath) =
          parsed
        created += graft.catalog.PackageRow.minimal(
          " ", Option(ptype).getOrElse(""), Option(name).getOrElse(""),
          Option(version))
          .copy(namespace = Option(namespace),
            qualifiers = Option(qualifiers),
            subpath = Option(subpath),
            package_content = Some(contentType))
        statuses += purl -> "Updated"
    }
    UpdateResult(statuses.result(), created.result())
  }

  def validatePurl(packages: DataFrame, purl: String,
      checkExistence: Boolean = false,
      fetchVersions: String => Option[Seq[String]] = _ => None)
      : PurlValidation = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null)
      return PurlValidation(purl, valid = false, exists = None,
        "The provided PackageURL is not valid.")
    if (!checkExistence)
      return PurlValidation(purl, valid = true, exists = None,
        "The provided PackageURL is valid.")

    val inCatalog = !packages.filter(purlPredicate(packages, purl))
      .isEmpty
    if (inCatalog)
      return PurlValidation(purl, valid = true, exists = Some(true),
        "The provided Package URL is valid, and the package exists " +
          "in the upstream repo.")

    val ptype = parsed(0)
    val supported = graft.streaming.Queues.FetchSupportedEcosystems
      .contains(ptype) &&
      graft.streaming.Queues.VersionComparatorEcosystems.contains(ptype)
    if (!supported)
      return PurlValidation(purl, valid = true, exists = None,
        "The provided PackageURL is valid, but `check_existence` is " +
          "not supported for this package type.")

    val versionless = s"pkg:$ptype" +
      Option(parsed(1)).map("/" + _).getOrElse("") + s"/${parsed(2)}"
    val upstream = fetchVersions(versionless).getOrElse(Seq.empty)
    val version = Option(parsed(3))
    if (upstream.nonEmpty && version.forall(upstream.contains))
      PurlValidation(purl, valid = true, exists = Some(true),
        "The provided Package URL is valid, and the package exists " +
          "in the upstream repo.")
    else
      PurlValidation(purl, valid = true, exists = Some(false),
        "The provided PackageURL is valid, but does not exist in the " +
          "upstream repo.")
  }
}
