package graft

import graft.reports.{MySqlDialect, ReportRegistry}
import graft.sources.Tables

/** Report layer (SURVEY §3 E3, §2.6 F6/F8): dialect shim, registry
  * lookup, typed param binding, and the MySQL-flavored reference
  * report running unchanged.
  */
class ReportsSpec extends SparkSpec {

  private lazy val registry: ReportRegistry = {
    val in = getClass.getResourceAsStream("/reports.json")
    ReportRegistry.fromJson(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
  }

  test("MySqlDialect translates NOW/CURDATE/%-tokens, only inside literals") {
    assert(MySqlDialect.translate("SELECT NOW(), CURDATE()")
      == "SELECT current_timestamp(), current_date()")
    assert(MySqlDialect.translate("DATE_FORMAT(NOW(), '%Y-%m-%d %H:%i:%s')")
      == "DATE_FORMAT(current_timestamp(), 'yyyy-MM-dd HH:mm:ss')")
    // % outside a string literal is untouched (modulo)
    assert(MySqlDialect.translate("SELECT 7 % 2") == "SELECT 7 % 2")
    // unknown token inside a literal is untouched
    assert(MySqlDialect.translate("'100%x'") == "'100%x'")
  }

  test("MySqlDialect rewrites bare param identifiers to :markers, nothing else") {
    val sql = "SELECT a.uuid FROM t a WHERE a.uuid = person_uuid " +
      "AND a.ptracker_id = ptracker_id AND note = 'person_uuid kept'"
    assert(MySqlDialect.translate(sql, Seq("person_uuid", "ptracker_id")) ==
      "SELECT a.uuid FROM t a WHERE a.uuid = :person_uuid " +
      "AND a.ptracker_id = :ptracker_id AND note = 'person_uuid kept'")
    // already-marked params and qualified columns are left alone
    assert(MySqlDialect.translate("WHERE x = :p AND t.p = 1", Seq("p")) ==
      "WHERE x = :p AND t.p = 1")
    // alias guard survives reformatted SQL (multiple spaces after AS)
    assert(MySqlDialect.translate("SELECT x AS  total FROM t", Seq("total")) ==
      "SELECT x AS  total FROM t")
    // …but a word merely ENDING in 'as' must not suppress the rewrite
    assert(MySqlDialect.translate("WHERE atlas = total", Seq("total")) ==
      "WHERE atlas = :total")
  }

  test("registry rejects unknown report ids and missing params") {
    intercept[NoSuchElementException](registry.get("nope"))
    Tables.registerAll(spark, sfDir)
    intercept[IllegalArgumentException](
      registry.run(spark, "client_lookup", Map.empty))
  }

  test("client_lookup binds a string param and filters") {
    Tables.registerAll(spark, sfDir)
    val df = registry.run(spark, "client_lookup", Map("mktsegment" -> "BUILDING"))
    assert(df.columns.toSeq == Seq("client_id", "client_name", "acctbal"))
    assert(df.count() > 0)
  }

  test("MySQL-dialect reference report (README.md:309-315 shape) runs unchanged") {
    Tables.registerAll(spark, sfDir)
    val df = registry.run(spark, "ytd_deliveries_mysql",
      Map("mktsegment" -> "BUILDING"))
    // data ends ~2001, NOW() is current year → YTD count is 0 rows-wise
    // the point is the MySQL SQL text parses + executes after the shim
    assert(df.columns.toSeq == Seq("total_deliveries"))
    assert(df.count() == 1)
  }

  test("int-typed params bind (exposed_infants report)") {
    Tables.registerAll(spark, sfDir)
    val df = registry.run(spark, "exposed_infants", Map(
      "date_from" -> "1998-01-01", "date_to" -> "2001-12-31",
      "bal_lo" -> 0, "bal_hi" -> 5000))
    assert(df.collect().head.getLong(0) > 0)
  }
}
