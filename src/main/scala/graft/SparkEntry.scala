package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{QueryDef, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.* grouped by the SURVEY §2 category
  * they cover; this object is the thin aggregation the driver calls.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("q8_star_join").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect {
      case (name, d) if d.oracle.isDefined => name -> d.oracle.get.trim
    }

  /** Static oracles plus the data-dependent ones rendered for `dir`
    * (QueryDef.oracleGen — model literals inlined). [[Verify]] dumps
    * this so the driver's oracle_sql.json is complete.
    */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    oracleSql ++ Registry.all.collect {
      case (name, d) if d.oracleGen.isDefined =>
        name -> d.oracleGen.get.apply(spark, dir).trim
    }
}
