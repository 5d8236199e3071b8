package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ReportDefinition

/** Named parameterized report execution — the reference's REST report
  * API re-expressed as a library call (reference README.md:277-328,
  * SURVEY §3 E3: `runReport(id, params): DataFrame`; the HTTP layer is
  * explicitly out of engine scope per SURVEY §2.1 S6).
  *
  * Definitions come from a reports.json document (reference
  * `omod/src/main/resources/_etl/config/reports.json`); parameter
  * binding uses Spark's named parameterized SQL (`spark.sql(text,
  * args)`) which substitutes typed literals into the analyzed plan —
  * injection-safe and still fully Catalyst-optimizable, matching the
  * reference's typed `query_params` contract (README.md:297-307).
  */
final class ReportRegistry(defs: Seq[ReportDefinition]) {
  private val byId: Map[String, ReportDefinition] =
    defs.map(d => d.reportId -> d).toMap

  def ids: Seq[String] = defs.map(_.reportId)

  def get(id: String): ReportDefinition =
    byId.getOrElse(id,
      throw new NoSuchElementException(s"unknown report_id: $id"))

  /** Execute a report over the temp views of the analysis store.
    * Reference report SQL is MySQL-flavored; the dialect shim rewrites
    * the handful of MySQL-isms first (SURVEY §2.6 F6).
    */
  def run(spark: SparkSession, id: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val d = get(id)
    val missing = d.params.map(_.name).filterNot(params.contains)
    require(missing.isEmpty,
      s"report $id missing params: ${missing.mkString(", ")}")
    spark.sql(MySqlDialect.translate(d.sqlQuery, d.params.map(_.name)), params)
  }
}

object ReportRegistry {
  def fromJson(json: String): ReportRegistry =
    new ReportRegistry(ReportDefinition.parseReports(json))
}
