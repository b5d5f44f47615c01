package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Source-side readers and parsers (SURVEY §2.1) — executor-safe pure
  * Scala used inside `mapPartitions`/`flatMap`. Network transports are
  * injected (zero-egress environment); the parsing/dedup/batching
  * logic is the real engine surface.
  */

/** S6 — gzip reader tolerant of trailing garbage / truncated streams
  * (`minecode/miners/maven.py:65-89`): reads what can be read and
  * stops at the first decoding error instead of throwing.
  */
object GzipTolerant {
  def readAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = try in.read(buf) catch { case _: java.io.IOException => -1 }
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }
}

/** S5 — the REAL Maven nexus full-index stream reader
  * (`minecode/miners/maven.py:708-845`, header `:749-770`; stream
  * primitives per `minecode/java_stream.py`): a gzip stream holding a
  * 1-byte format version (must be 1) and an 8-byte Java epoch-millis
  * timestamp, followed by entries until EOF. Each entry is an int32
  * field count, then per field: a 1-byte Lucene indexing flag
  * (ignored), a Java `readUTF` field name (2-byte length + modified
  * UTF-8), and a value encoded with the Nexus variant of `readUTF`
  * that uses a FULL int32 byte length (bypassing the 64 KiB limit),
  * decoded as Java modified UTF-8 (null = C0 80, supplementary chars
  * as surrogate triplets).
  *
  * Consumed as a lazy iterator inside `mapPartitions`, so the real
  * ~600 MB central index never materializes; a torn trailing entry
  * ends the stream cleanly (tolerant reference reader behavior).
  */
object NexusIndexReader {

  /** Standard entry field names (`minecode/miners/maven.py:471-478`):
    * u = groupId|artifactId|version|classifier[|extension],
    * i = packaging|lastModified|size|is_sources|is_javadoc|is_signature|extension,
    * 1 = sha1, m = record modified millis, n = name, d = description. */
  val EntryFields: Set[String] = Set("u", "i", "1", "m", "n", "d")

  final case class Header(version: Int, timestampMillis: Long)

  /** Decode Java "modified UTF-8" bytes to a String: 1/2/3-byte
    * sequences, embedded nulls as C0 80, supplementary characters as
    * two 3-byte surrogate code units (which Java chars carry as-is). */
  def decodeModifiedUtf8(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < bytes.length) {
        val b1 = bytes(i + 1) & 0x3f
        sb.append((((b0 & 0x1f) << 6) | b1).toChar); i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < bytes.length) {
        val b1 = bytes(i + 1) & 0x3f
        val b2 = bytes(i + 2) & 0x3f
        sb.append((((b0 & 0x0f) << 12) | (b1 << 6) | b2).toChar); i += 3
      } else { // malformed byte: emit replacement, keep going
        sb.append('�'); i += 1
      }
    }
    sb.toString
  }

  /** Read the 9-byte header: version byte (must be 1) + epoch millis
    * (−1 = absent). */
  def readHeader(d: DataInputStream): Header = {
    val version = d.readByte() & 0xff
    require(version == 1, s"unsupported nexus index format version: $version")
    Header(version, d.readLong())
  }

  /** Lazy entries from an ALREADY-DECOMPRESSED stream; `fields`
    * restricts which names are kept (like the reference's
    * `get_entries(fields=...)`). */
  def readEntries(in: InputStream, fields: Set[String] = Set.empty)
      : Iterator[Map[String, String]] = {
    val d = new DataInputStream(in)
    readHeader(d)
    new Iterator[Map[String, String]] {
      private var nextRec: Map[String, String] = _
      private var done = false
      private def advance(): Unit =
        try {
          // records whose filtered field map is empty are skipped, not
          // yielded (the reference's get_entries: `if entry: yield`)
          var rec = Map.empty[String, String]
          do {
            rec = Map.empty[String, String]
            val n = d.readInt()
            var i = 0
            while (i < n) {
              d.readByte() // Lucene indexing flags: ignored
              val name = d.readUTF() // 2-byte len, modified UTF-8
              val valueLen = d.readInt() // nexus variant: int32 len
              val valueBytes = new Array[Byte](valueLen)
              d.readFully(valueBytes)
              if (fields.isEmpty || fields.contains(name))
                rec += name -> decodeModifiedUtf8(valueBytes)
              i += 1
            }
          } while (rec.isEmpty)
          nextRec = rec
        } catch {
          // EOF (clean or torn trailing entry) ends the stream
          case _: EOFException => done = true; nextRec = null
        }
      advance()
      def hasNext: Boolean = !done
      def next(): Map[String, String] = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Entries straight from the gzipped index bytes (tolerant of
    * trailing garbage, like the reference's GzipFileWithTrailing). */
  def readGzippedEntries(gzBytes: Array[Byte],
      fields: Set[String] = Set.empty): Iterator[Map[String, String]] =
    readEntries(new ByteArrayInputStream(GzipTolerant.readAll(gzBytes)),
      fields)

  /** Expand an entry's packed `u`/`i` fields into the flat artifact
    * record consumed by [[graft.miners.ArtifactBuilder]]
    * (`minecode/miners/maven.py:569-707`): u =
    * groupId|artifactId|version|classifier[|extension], "NA"
    * classifier means none; i = packaging|lastModified|size|... with
    * the extension in the last position. */
  def toArtifactRecord(entry: Map[String, String])
      : Option[Map[String, String]] =
    entry.get("u").flatMap { u =>
      val parts = u.split("\\|")
      if (parts.length < 3) None
      else {
        val iParts = entry.get("i").map(_.split("\\|")).getOrElse(Array.empty)
        val classifier =
          if (parts.length > 3 && parts(3) != "NA") Some(parts(3)) else None
        val extension =
          if (parts.length > 4) Some(parts(4))
          else iParts.lastOption.filter(_.nonEmpty)
        val base = Map(
          "groupId" -> parts(0),
          "artifactId" -> parts(1),
          "version" -> parts(2))
        val opt = Seq(
          classifier.map("classifier" -> _),
          extension.map("extension" -> _),
          entry.get("1").map("sha1" -> _),
          entry.get("n").map("name" -> _),
          entry.get("d").map("description" -> _),
          iParts.headOption.filter(_.nonEmpty).map("packaging" -> _),
          iParts.lift(2).map("size" -> _)).flatten
        Some(base ++ opt)
      }
    }

  /** Writer for tests / synthetic index construction — produces the
    * exact on-disk format (uncompressed; gzip with
    * [[GzipTolerant.gzip]]). */
  def writeEntries(entries: Seq[Map[String, String]],
      timestampMillis: Long = -1L): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeByte(1)
    d.writeLong(timestampMillis)
    entries.foreach { e =>
      d.writeInt(e.size)
      e.foreach { case (k, v) =>
        d.writeByte(0)
        d.writeUTF(k)
        // nexus value encoding: int32 byte length + modified UTF-8
        val tmp = new ByteArrayOutputStream()
        val td = new DataOutputStream(tmp)
        td.writeUTF(v) // 2-byte len + modified UTF-8 bytes
        val utfBytes = tmp.toByteArray.drop(2)
        d.writeInt(utfBytes.length)
        d.write(utfBytes)
      }
    }
    d.flush()
    bos.toByteArray
  }
}

/** S11 — registry version-list parsers for the priority/watch paths
  * (`packagedb/package_managers.py:100-530`): response payloads in,
  * (version, releaseDate) rows out. Transport is injected; JSON via
  * json4s (ships with Spark), XML via JDK StAX.
  */
object RegistryParsers {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  final case class PackageVersion(value: String, releaseDate: Option[String])

  /** PyPI JSON API: releases{version: [files{upload_time}]}. */
  def pypiVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    (root \ "releases") match {
      case JObject(fields) => fields.map { case (version, files) =>
        val date = files match {
          case JArray(fs) => fs.headOption.flatMap(f =>
            (f \ "upload_time") match {
              case JString(s) => Some(s); case _ => None
            })
          case _ => None
        }
        PackageVersion(version, date)
      }
      case _ => Seq.empty
    }
  }

  /** npm registry JSON: versions{} keys + time{} dates. */
  def npmVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    val times = (root \ "time") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _           => Map.empty[String, String]
    }
    (root \ "versions") match {
      case JObject(fields) =>
        fields.map { case (v, _) => PackageVersion(v, times.get(v)) }
      case _ => Seq.empty
    }
  }

  /** crates.io API (`packagedb/package_managers.py:229-242`):
    * versions[].num + updated_at. */
  def cargoVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    (root \ "versions") match {
      case JArray(vs) => vs.flatMap { v =>
        (v \ "num") match {
          case JString(num) =>
            val date = (v \ "updated_at") match {
              case JString(d) => Some(d); case _ => None
            }
            Some(PackageVersion(num, date))
          case _ => None
        }
      }
      case _ => Seq.empty
    }
  }

  /** rubygems api/v1/versions/{name}.json
    * (`packagedb/package_managers.py:244-264`): [].number with
    * published_at falling back to created_at; entries without a
    * number are skipped. */
  def gemVersions(json: String): Seq[PackageVersion] = {
    JsonMethods.parse(json) match {
      case JArray(releases) => releases.flatMap { r =>
        val date = (r \ "published_at") match {
          case JString(d) => Some(d)
          case _ => (r \ "created_at") match {
            case JString(d) => Some(d); case _ => None
          }
        }
        (r \ "number") match {
          case JString(n) if n.nonEmpty => Some(PackageVersion(n, date))
          case _                        => None
        }
      }
      case _ => Seq.empty
    }
  }

  /** NuGet registration index
    * (`packagedb/package_managers.py:346-375`):
    * items[].items[].catalogEntry.{version, published}; entries
    * without a version are skipped. */
  def nugetVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    (root \ "items") match {
      case JArray(pages) => pages.flatMap { page =>
        (page \ "items") match {
          case JArray(entries) => entries.flatMap { e =>
            val cat = e \ "catalogEntry"
            (cat \ "version") match {
              case JString(v) if v.nonEmpty =>
                val date = (cat \ "published") match {
                  case JString(d) => Some(d); case _ => None
                }
                Some(PackageVersion(v, date))
              case _ => None
            }
          }
          case _ => Seq.empty
        }
      }
      case _ => Seq.empty
    }
  }

  /** packagist p/{vendor/name}.json
    * (`packagedb/package_managers.py:383-410`): packages.{pkg} map of
    * version → {time}; versions containing "dev" are skipped and a
    * leading v/V is stripped. Returns (version, date, distUrl). */
  final case class ComposerRelease(version: String,
      releaseDate: Option[String], distUrl: Option[String])

  def composerVersions(json: String, pkg: String): Seq[ComposerRelease] = {
    val root = JsonMethods.parse(json)
    (root \ "packages" \ pkg) match {
      case JObject(fields) => fields.collect {
        case (version, meta) if !version.contains("dev") =>
          val time = (meta \ "time") match {
            case JString(t) => Some(t); case _ => None
          }
          val dist = (meta \ "dist" \ "url") match {
            case JString(u) => Some(u); case _ => None
          }
          ComposerRelease(version.dropWhile(c => c == 'v' || c == 'V'),
            time, dist)
      }
      case _ => Seq.empty
    }
  }

  /** hex.pm api/packages/{name}
    * (`packagedb/package_managers.py:413-427`): releases[].version +
    * inserted_at. */
  def hexVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    (root \ "releases") match {
      case JArray(rs) => rs.flatMap { r =>
        (r \ "version") match {
          case JString(v) =>
            val date = (r \ "inserted_at") match {
              case JString(d) => Some(d); case _ => None
            }
            Some(PackageVersion(v, date))
          case _ => None
        }
      }
      case _ => Seq.empty
    }
  }

  /** sources.debian.org api/src/{pkg}
    * (`packagedb/package_managers.py:286-305`): versions[].version
    * with the default "0:" epoch removed; error payloads yield
    * nothing. */
  def debianVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    (root \ "error") match {
      case JNothing | JNull =>
        (root \ "versions") match {
          case JArray(vs) => vs.flatMap { v =>
            (v \ "version") match {
              case JString(s) =>
                Some(PackageVersion(s.replace("0:", ""), None))
              case _ => None
            }
          }
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
  }

  /** Launchpad getPublishedSources page
    * (`packagedb/package_managers.py:139-175`, Ubuntu debian
    * packages): entries[].source_package_version with the default
    * "0:" epoch removed + date_published; returns the page's versions
    * and the next_collection_link when the collection is paginated.
    * Missing/empty entries yield nothing (and stop the walk). */
  def launchpadVersions(json: String)
      : (Seq[PackageVersion], Option[String]) = {
    val root = JsonMethods.parse(json)
    val entries = (root \ "entries") match {
      case JArray(es) if es.nonEmpty => es
      case _                         => return (Seq.empty, None)
    }
    val versions = entries.flatMap { e =>
      (e \ "source_package_version") match {
        case JString(v) if v.nonEmpty =>
          val date = (e \ "date_published") match {
            case JString(d) => Some(d)
            case _          => None
          }
          Some(PackageVersion(v.replace("0:", ""), date))
        case _ => None
      }
    }
    val next = (root \ "next_collection_link") match {
      case JString(u) if u.nonEmpty => Some(u)
      case _                        => None
    }
    (versions, next)
  }

  /** goproxy `@v/list` plain-text response
    * (`packagedb/package_managers.py:498-530`): one version per line,
    * optionally followed by a timestamp. */
  def goproxyList(text: String): Seq[PackageVersion] =
    text.linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val parts = line.split("\\s+", 2)
      PackageVersion(parts(0),
        if (parts.length > 1) Some(parts(1)) else None)
    }.toSeq

  /** goproxy case-encoding (golang.org/ref/mod#goproxy-protocol):
    * uppercase → `!` + lowercase. */
  def goEscapePath(path: String): String = {
    val sb = new StringBuilder(path.length + 4)
    path.foreach { c =>
      if (c >= 'A' && c <= 'Z') { sb += '!'; sb += (c + 32).toChar }
      else sb += c
    }
    sb.toString
  }

  /** Trim a Go package path to its module path — host + first two
    * path segments (`packagedb/package_managers.py:441-463`). */
  def trimGoUrlPath(urlPath: String): Option[String] = {
    val noPrefix = urlPath.stripPrefix("https://pkg.go.dev/")
    val uri = try new java.net.URI(noPrefix) catch {
      case _: Exception => return None
    }
    val (host, path) =
      if (uri.getHost != null) (uri.getHost, Option(uri.getPath).getOrElse(""))
      else {
        // bare "github.com/x/y" — no scheme, host is the first segment
        val segs = noPrefix.split("/", 2)
        (segs(0), if (segs.length > 1) "/" + segs(1) else "")
      }
    val parts = path.split("/")
    if (parts.length < 3) None
    else Some(host + parts.take(3).mkString("/"))
  }

  /** maven-metadata.xml: <versioning><versions><version> texts
    * (`minecode/miners/maven.py:287-349`), StAX streaming parse. */
  def mavenMetadataVersions(xml: String): Seq[PackageVersion] = {
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(
      new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[PackageVersion]
    var inVersion = false
    val sb = new StringBuilder
    while (reader.hasNext) {
      reader.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT
            if reader.getLocalName == "version" =>
          inVersion = true; sb.clear()
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inVersion =>
          sb.append(reader.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT
            if reader.getLocalName == "version" =>
          inVersion = false
          if (sb.nonEmpty) out += PackageVersion(sb.toString.trim, None)
        case _ => ()
      }
    }
    reader.close()
    out.toSeq
  }
}

/** ST1 politeness — robots.txt rules + per-host crawl delay
  * (`run_visit.py:192-211,385-405`): minimal parser for
  * User-agent/Disallow/Crawl-delay groups.
  */
object Robots {
  final case class Rules(disallow: Seq[String], crawlDelaySec: Option[Double])

  def parse(robotsTxt: String, userAgent: String = "*"): Rules = {
    var currentAgents = Set.empty[String]
    var matched = false
    // set once the matching group's rules are complete (a new group
    // begins after a matched group's rules) — no non-local return, so
    // the parser survives being inlined into a Spark closure
    var finished: Rules = null
    val disallow = scala.collection.mutable.ArrayBuffer.empty[String]
    var delay: Option[Double] = None
    val lines = robotsTxt.linesIterator.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("#"))
    while (finished == null && lines.hasNext) {
      val line = lines.next()
      val (key, value) = line.split(":", 2) match {
        case Array(k, v) => (k.trim.toLowerCase, v.trim)
        case _           => ("", "")
      }
      key match {
        case "user-agent" =>
          if (disallow.nonEmpty || delay.isDefined) {
            // new group begins after rules: done if we already matched
            if (matched) finished = Rules(disallow.toSeq, delay)
            else {
              currentAgents = Set.empty
              disallow.clear(); delay = None
            }
          }
          if (finished == null) {
            currentAgents += value.toLowerCase
            matched = currentAgents.contains("*") ||
              currentAgents.contains(userAgent.toLowerCase)
          }
        case "disallow" if matched && value.nonEmpty => disallow += value
        case "crawl-delay" if matched =>
          delay = value.toDoubleOption
        case _ => ()
      }
    }
    if (finished != null) finished else Rules(disallow.toSeq, delay)
  }

  def allowed(path: String, rules: Rules): Boolean =
    !rules.disallow.exists(path.startsWith)
}

/** S15 — publish batching (`minecode/pipelines/__init__.py:150-348`,
  * batch_size=100): deterministic batch splitter used by the
  * foreachBatch publisher. */
object Publisher {
  def batches[T](items: Seq[T], size: Int = 100): Seq[Seq[T]] =
    items.grouped(size).toSeq
}
