package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark build function plus (when the
  * semantics are SQL-expressible) an equivalent ANSI SQL text the
  * DuckDB oracle runs on the same parquet tables.
  *
  * Contract (builder prompt): column names of the Spark result and the
  * oracle SQL must be identical — the driver sorts columns by name
  * before hashing. Every aggregate / computed column is aliased on
  * both sides. Doubles that aggregate across rows are `round`ed so
  * summation-order ulp drift can't flip the hash.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def apply(doc: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle), doc)

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(doc: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None, doc)
}
