package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2 (or an LLM-data-pipeline addition),
  * expressed Spark-first, with an optional DuckDB oracle.
  *
  * @param name   stable query name (keys `SparkEntry.queries`)
  * @param survey SURVEY.md §2 row id(s) this query covers, e.g. "P1"
  * @param doc    one-line description
  * @param run    (spark, sfDir) => result DataFrame; deterministic rows
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None for ops not expressible in portable SQL (these
  *               get a rows-only check from the driver plus ScalaTest
  *               coverage here)
  */
final case class QueryDef(
    name: String,
    survey: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  lazy val all: Seq[QueryDef] =
    ops.CoreQueries.defs ++
      ops.Filters.defs ++
      ops.Joins.defs ++
      ops.Aggregates.defs ++
      ops.Windows.defs ++
      ops.SortsSets.defs ++
      ops.Functions.defs ++
      ops.TextOps.defs ++
      ops.DedupOps.defs ++
      ops.SimilarityOps.defs ++
      ops.CatalogOps.defs ++
      ops.StreamOps.defs ++
      ops.SourceOps.defs ++
      ops.ScaleOps.defs ++
      ops.ContractOps.defs ++
      ops.GraphOps.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
