package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark-first DataFrame program plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB SQL text the driver
  * runs as the correctness oracle (`SURVEY.md §2.3`).
  *
  * Contract notes (hash-stability rules):
  *   - every query ends in a total-order `ORDER BY`;
  *   - floating aggregates are wrapped `ROUND(x, 6)`;
  *   - column names are identical between the DataFrame and the SQL;
  *   - integer aggregates are cast to BIGINT on both sides (DuckDB SUM of
  *     integers is HUGEINT, which would break the schema compare).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String)(oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** A query whose semantics DuckDB cannot express — driver records a weaker
    * rows-only check. */
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
