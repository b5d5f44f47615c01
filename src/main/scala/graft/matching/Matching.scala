package graft.matching

import graft.functions.GraftFunctions.hamming_bin
import graft.matching.MatchFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The matching engine — Spark re-expression of the reference's
  * codebase→package matching pipeline (`matchcode/pipes/matching.py`,
  * `matchcode/models.py`, SURVEY §3.3).
  *
  * Every stage is a join of the (small) query codebase against a
  * (huge) index table, so the query side is broadcast and the index
  * side is only touched through hash-partitioned equi-joins — the
  * LSH banding exists precisely so no stage ever scans the index
  * row-by-row.
  *
  * Expected frames:
  *  - query resources: (path, name, is_file, size, sha1,
  *    dir_fingerprint, file_fingerprint) — one row per file/dir of the
  *    scanned codebase
  *  - exact index: (sha1, download_url, path)
  *  - approx index: (fingerprint, indexed_elements_count implied by
  *    the fingerprint, download_url, path, name, size, is_file)
  *  - snippet index: (fingerprint16, download_url, path, position)
  */
object Matching {

  val HammingThreshold = 10 // matchcode/models.py:274
  val BandRatio = 0.05      // matchcode/models.py:129-141
  val SnippetWindow = 16    // matchcode/models.py:548

  /** J4 — exact sha1 batch lookup; the query side is the small one and
    * is broadcast (reference chunks 1000 sha1s per query,
    * `matchcode/pipes/matching.py:261-269`; one broadcast join
    * subsumes the batching). */
  def exactMatch(queries: DataFrame, index: DataFrame): DataFrame =
    index.join(broadcast(queries.select(col("path").as("q_path"),
        col("sha1")).filter(col("sha1").isNotNull)),
      Seq("sha1"))
      .select(col("q_path"), col("sha1"), col("download_url"),
        col("path").as("matched_path"))

  /** J5 — banded approximate match with Hamming verify and
    * (hd, size_diff, name_diff) best-group ranking
    * (`matchcode/models.py:228-373`). `queries` rows carry
    * (q_path, q_name, q_size, q_is_file, fingerprint).
    *
    * The band-probe join is emitted as the custom
    * [[graft.plans.ApproxHammingJoin]] logical node: the
    * [[graft.plans.ExpandApproxHammingJoin]] optimizer rule expands it
    * into 4 first-matching-chunk equi-join probes over the bah128
    * bytes — the same duplicate-free banded plan the reference builds
    * by hand (`matchcode/models.py:149-188`), with the query side
    * broadcast. Callers needing EXACT Hamming-join semantics can use
    * [[graft.GraftExtensions.approxHammingJoin]] directly with
    * `bands >= threshold` (pigeonhole). */
  def approximateMatch(queries: DataFrame, index: DataFrame,
      threshold: Int = HammingThreshold): DataFrame = {
    val q = queries
      .withColumn("q_cnt", Fingerprints.elementsCount(col("fingerprint")))
      .withColumn("q_bah", Fingerprints.bah128(col("fingerprint")))
      .select(col("q_path"), col("q_name"), col("q_size"),
        col("q_is_file"), col("q_cnt"), col("q_bah"))
    val ib = index
      .withColumn("i_cnt", Fingerprints.elementsCount(col("fingerprint")))
      .withColumn("i_bah", Fingerprints.bah128(col("fingerprint")))
      .select(col("download_url"), col("path"), col("name"), col("size"),
        col("is_file"), col("i_cnt"), col("i_bah"))

    val candidates = graft.GraftExtensions.approxHammingJoin(
        broadcast(q), ib, "q_bah", "i_bah", threshold, bands = 4)
      // ±5% element-count candidate band (matchcode/models.py:129-141)
      .filter(col("i_cnt") >= Fingerprints.bandLow(col("q_cnt"), BandRatio) &&
        col("i_cnt") <= Fingerprints.bandHigh(col("q_cnt"), BandRatio))

    val verified = candidates
      // bit-popcount distance (the node already verified < threshold;
      // recomputed here as an output column for the rank stage).
      // `hamming_bytes` (differing-byte count, another reading of
      // samecode's byte_hamming_distance) is registered for callers
      // that want slice semantics — every reference fixture matches
      // identically under either metric
      .withColumn("hamming", hamming_bin(col("q_bah"), col("i_bah")))

    // rank: (hamming, size_diff, name_diff); dirs ignore size
    // (matchcode/models.py:336-348); rank()=1 keeps ties (W3)
    val ranked = verified
      .withColumn("size_diff",
        when(col("is_file"), abs(col("q_size") - col("size")))
          .otherwise(lit(0L)))
      .withColumn("name_diff",
        lit(1.0) - name_similarity(col("q_name"), col("name")))
    val w = Window.partitionBy(col("q_path"))
      .orderBy(col("hamming"), col("size_diff"), col("name_diff"))
    ranked.withColumn("rk", rank().over(w)).filter(col("rk") === 1)
      .select("q_path", "download_url", "path", "hamming", "size_diff",
        "name_diff")
  }

  /** J11 — JS source-map key widening
    * (`matchcode/pipes/matching.py:306-308`): `.map` resources carry
    * the sha1s of their referenced sources in `source_map_sha1s`;
    * those explode into additional exact-match join keys attributed
    * back to the carrying resource. */
  def exactMatchWithSourceMaps(queries: DataFrame,
      index: DataFrame): DataFrame = {
    val direct = queries.select(col("path"), col("sha1"))
    val fromMaps = queries
      .filter(col("source_map_sha1s").isNotNull)
      .select(col("path"), explode(col("source_map_sha1s")).as("sha1"))
    val widened = direct.unionByName(fromMaps)
      .filter(col("sha1").isNotNull).dropDuplicates("path", "sha1")
    exactMatch(widened.select(col("path"), col("sha1")), index)
  }

  /** J6 + A3/A4 + W4/X4 — snippet inverted-index match: join query
    * 16-byte snippet fingerprints against the index, score each
    * (q_path, package resource) by Jaccard over distinct fingerprints
    * (`matchcode/models.py:566-588`), and merge matched query
    * positions into maximal spans with gap ≤ window
    * (`matchcode/match.py:290-348`). */
  def snippetMatch(querySnippets: DataFrame, index: DataFrame,
      window: Int = SnippetWindow): DataFrame = {
    val qCounts = querySnippets.groupBy("q_path")
      .agg(countDistinct("fingerprint").as("q_fps"))
    val iCounts = index.groupBy("download_url", "path")
      .agg(countDistinct("fingerprint").as("i_fps"))
    // spans are over QUERY token positions (matchcode/models.py:546-549)
    val q = querySnippets.withColumnRenamed("position", "q_position")
    val joined = index.drop("position").join(broadcast(q), Seq("fingerprint"))
    val scored = joined
      .groupBy(col("q_path"), col("download_url"), col("path"))
      .agg(
        countDistinct("fingerprint").as("matched_fps"),
        merge_spans(collect_list(struct(
          col("q_position").cast("int").as("start"),
          (col("q_position") + window - 1).cast("int").as("end"))), window)
          .as("matched_spans"))
    scored
      .join(broadcast(qCounts), Seq("q_path"))
      .join(iCounts, Seq("download_url", "path"))
      .withColumn("jaccard",
        col("matched_fps").cast("double") /
          (col("q_fps") + col("i_fps") - col("matched_fps")).cast("double"))
      .select("q_path", "download_url", "path", "matched_fps", "jaccard",
        "matched_spans")
  }

  /** §3.3 staged pipeline with sequential gating: archive-level exact
    * → file-level exact → directory approximate → file approximate.
    * A resource matched by an earlier stage (or living under a matched
    * directory) is excluded from later stages
    * (`matchcode/match.py:244-287`). Returns
    * (path, download_url, match_type).
    */
  def pipeline(resources: DataFrame, exactIndex: DataFrame,
      dirIndex: DataFrame, fileIndex: DataFrame): DataFrame = {
    val files = resources.filter(col("is_file"))
    val dirs = resources.filter(!col("is_file"))

    // stage 1: archive/file exact sha1
    val exact = exactMatch(files, exactIndex)
      .select(col("q_path").as("path"), col("download_url"),
        lit("exact_file").as("match_type"))

    def unmatched(df: DataFrame, matchedSoFar: DataFrame) =
      df.join(matchedSoFar.select(col("path")).distinct(), Seq("path"),
        "left_anti")

    // stage 2: directory approximate (top-down: a matched dir gates its
    // whole subtree below)
    val dirQ = unmatched(dirs, exact)
      .select(col("path").as("q_path"), col("name").as("q_name"),
        col("size").as("q_size"), lit(false).as("q_is_file"),
        col("dir_fingerprint").as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
    val dirMatches = approximateMatch(dirQ, dirIndex)
      .select(col("q_path").as("path"), col("download_url"),
        lit("approx_directory").as("match_type"))

    // descendants of matched dirs are gated out (P7 trailing-/ guard)
    val gatedPrefixes = dirMatches.select(
      concat(col("path"), lit("/")).as("prefix")).distinct()
    val stillUnmatched = unmatched(files, exact)
      .join(broadcast(gatedPrefixes),
        col("path").startsWith(col("prefix")), "left_anti")

    // stage 3: file approximate
    val fileQ = stillUnmatched
      .select(col("path").as("q_path"), col("name").as("q_name"),
        col("size").as("q_size"), lit(true).as("q_is_file"),
        col("file_fingerprint").as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
    val fileMatches = approximateMatch(fileQ, fileIndex)
      .select(col("q_path").as("path"), col("download_url"),
        lit("approx_file").as("match_type"))

    exact.unionByName(dirMatches).unionByName(fileMatches)
  }

  /** §3.3 complete flow: gated stages (exact → dir approx → file
    * approx) then the snippet stage over still-unmatched files with a
    * Jaccard floor, then the STEMMED snippet stage over what the plain
    * snippet stage still left unmatched
    * (`matchcode/pipes/matching.py:370-429`: the stemmed pass excludes
    * every earlier status including snippet-matched), finished by the
    * greedy per-resource package reassignment (A5, `:469-529`).
    * `querySnippets`/`stemmedQuerySnippets` carry
    * (q_path, fingerprint, position) for codebase files; pass
    * `None` to skip the stemmed stage.
    */
  def matchCodebase(resources: DataFrame, exactIndex: DataFrame,
      dirIndex: DataFrame, fileIndex: DataFrame,
      querySnippets: DataFrame, snippetIndex: DataFrame,
      minJaccard: Double = 0.5,
      stemmedQuerySnippets: Option[DataFrame] = None,
      stemmedIndex: Option[DataFrame] = None): DataFrame = {
    val staged = pipeline(resources, exactIndex, dirIndex, fileIndex)
    val matchedPaths = staged.select(col("path")).distinct()
    val unmatchedSnippets = querySnippets
      .join(matchedPaths, querySnippets("q_path") === matchedPaths("path"),
        "left_anti")
    val snippetMatches = snippetMatch(unmatchedSnippets, snippetIndex)
      .filter(col("jaccard") >= minJaccard)
      .select(col("q_path").as("path"), col("download_url"),
        lit("snippet").as("match_type"))
    val withSnippets = staged.unionByName(snippetMatches)
    val all = (stemmedQuerySnippets, stemmedIndex) match {
      case (Some(stemmedQ), Some(stemmedIdx)) =>
        // stemmed stage excludes everything matched so far — the
        // reference's no_status(...) chain ends with snippet-matched
        val matchedSoFar = withSnippets.select(col("path")).distinct()
        val stemmedUnmatched = stemmedQ
          .join(matchedSoFar, stemmedQ("q_path") === matchedSoFar("path"),
            "left_anti")
        val stemmedMatches = snippetMatch(stemmedUnmatched, stemmedIdx)
          .filter(col("jaccard") >= minJaccard)
          .select(col("q_path").as("path"), col("download_url"),
            lit("stemmed_snippet").as("match_type"))
        withSnippets.unionByName(stemmedMatches)
      case _ => withSnippets
    }
    rankPackages(all)
  }

  /** Stem a token column for the stemmed snippet index: lowercase and
    * strip trailing digits/underscores — a deterministic
    * identifier-stemming proxy for the reference's stemmed-snippet
    * fingerprints (`matchcode/pipes/matching.py:399-429`; the actual
    * stemmer lives in its out-of-tree toolkit). */
  def stemToken(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(lower(c), "[0-9_]+$", "")

  /** A5 — rank candidate packages by matched-resource count and
    * greedily keep, per resource, only its top package
    * (`matchcode/pipes/matching.py:494-529`). */
  def rankPackages(matches: DataFrame): DataFrame = {
    val counts = matches.groupBy("download_url")
      .agg(countDistinct("path").as("n_matched"))
    val w = Window.partitionBy(col("path"))
      .orderBy(desc("n_matched"), col("download_url"))
    matches.join(counts, Seq("download_url"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("path", "download_url", "match_type", "n_matched")
  }
}
