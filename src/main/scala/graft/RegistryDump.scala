package graft

import java.nio.file.{Files, Paths}

/** Dump the query registry as JSON — (name, §2 survey rows, doc,
  * has-oracle) per registered query — for `tools/gen_coverage.py`,
  * which joins it with the driver's CORRECTNESS_r{N}.json to emit the
  * generated status table in COVERAGE.md. No SparkSession needed: the
  * registry is pure metadata until a query's `run` is invoked. */
object RegistryDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("registry.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val json = Registry.all.map { d =>
      s"""{"name":${q(d.name)},"survey":${q(d.survey)},""" +
        s""""doc":${q(d.doc)},"oracle":${d.oracle.nonEmpty}}"""
    }.mkString("[\n", ",\n", "\n]\n")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${Registry.all.length} entries to $out")
  }
}
