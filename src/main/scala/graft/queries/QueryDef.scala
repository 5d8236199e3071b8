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
  *
  * `oracleGen` covers the queries whose oracle SQL is data-DEPENDENT
  * but still DuckDB-replayable once a model-sized artifact is inlined
  * as literals (embedding_pca: the fitted axes). [[graft.Verify]]
  * resolves generators against the run's sfDir when dumping
  * oracle_sql.json — the driver sees ordinary static SQL. Generators
  * MUST memoize anything the paired build function also computes, so
  * both sides replay the identical model.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    oracleGen: Option[(SparkSession, String) => String] = None) {
  /** True when the driver gets an oracle (static or generated). */
  def hasOracle: Boolean = oracle.isDefined || oracleGen.isDefined
}

object QueryDef {
  def apply(doc: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle), doc)

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(doc: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None, doc)

  /** Data-dependent oracle: `gen` renders the SQL (with model literals
    * inlined) for the sfDir Verify is dumping.
    */
  def dynamicOracle(doc: String)(gen: (SparkSession, String) => String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None, doc, Some(gen))
}
