package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.reports.{ReportHttpServer, ReportRegistry}

/** The HTTP twin of the reference's report webservice: the documented
  * URL contract (`/ws/rest/v1/mamba/report?report_id=...&param=...`,
  * reference README.md:277-283,329) served over the JDK HttpServer
  * and checked end-to-end with a real HTTP client — the one E3
  * surface that previously only existed as the library call.
  */
class ReportHttpServerSpec extends SparkSpec {
  import spark.implicits._
  implicit private val formats: Formats = DefaultFormats

  private lazy val registry = ReportRegistry.fromJson(
    """{"report_definitions": [
         {"report_name": "Client lookup",
          "report_id": "client_lookup",
          "report_sql": {
            "sql_query": "SELECT name, total FROM http_clients WHERE region = :p_region AND total >= :min_total ORDER BY name",
            "query_params": [
              {"name": "p_region", "type": "VARCHAR(255)"},
              {"name": "min_total", "type": "INT"}]}},
         {"report_name": "Row count",
          "report_id": "row_count",
          "report_sql": {
            "sql_query": "SELECT COUNT(*) AS n FROM http_clients",
            "query_params": []}}]}""")

  private lazy val server: ReportHttpServer = {
    Seq(("acme", "east", 10L), ("bolt", "east", 3L), ("core", "west", 9L))
      .toDF("name", "region", "total")
      .createOrReplaceTempView("http_clients")
    new ReportHttpServer(spark, registry, port = 0).start()
  }

  private lazy val client = HttpClient.newHttpClient()

  private def get(pathAndQuery: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://localhost:${server.boundPort}$pathAndQuery"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("server binds loopback by default (no-auth surface must not face the network)") {
    val f = classOf[ReportHttpServer].getDeclaredField("server")
    f.setAccessible(true)
    val addr = f.get(server).asInstanceOf[com.sun.net.httpserver.HttpServer]
      .getAddress.getAddress
    assert(addr.isLoopbackAddress,
      s"default bind must be loopback, got $addr")
  }

  test("parameterized report over HTTP: typed URL params reach the plan") {
    val r = get("/ws/rest/v1/mamba/report?report_id=client_lookup" +
      "&p_region=east&min_total=5")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get == "application/json")
    val j = JsonMethods.parse(r.body())
    assert((j \ "report_id").extract[String] == "client_lookup")
    assert((j \ "row_count").extract[Int] == 1)
    assert((j \ "results").extract[Seq[JValue]].map(row =>
      ((row \ "name").extract[String], (row \ "total").extract[Long])) ==
      Seq(("acme", 10L)))
  }

  test("zero-param report; URL-encoded values decode before binding") {
    val r = get("/ws/rest/v1/mamba/report?report_id=row_count")
    val j = JsonMethods.parse(r.body())
    assert(r.statusCode() == 200)
    assert((j \ "results")(0) \ "n" == JInt(3))

    // %65ast = "east" percent-encoded; still matches the region
    val enc = get("/ws/rest/v1/mamba/report?report_id=client_lookup" +
      "&p_region=%65ast&min_total=0")
    assert((JsonMethods.parse(enc.body()) \ "row_count").extract[Int] == 2)
  }

  test("error contract: 400 missing id/params or bad type, 404 unknown") {
    assert(get("/ws/rest/v1/mamba/report").statusCode() == 400)

    val unknown = get("/ws/rest/v1/mamba/report?report_id=nope")
    assert(unknown.statusCode() == 404)
    assert(unknown.body().contains("nope"))

    val missing = get("/ws/rest/v1/mamba/report?report_id=client_lookup")
    assert(missing.statusCode() == 400)
    assert(missing.body().contains("p_region"))

    val badType = get("/ws/rest/v1/mamba/report?report_id=client_lookup" +
      "&p_region=east&min_total=abc")
    assert(badType.statusCode() == 400)
    assert(badType.body().contains("min_total"))
  }

  test("HTTP result matches the direct library call") {
    val direct = registry.run(spark, "client_lookup",
      Map("p_region" -> "east", "min_total" -> 0L))
      .as[(String, Long)].collect().toSeq
    val r = get("/ws/rest/v1/mamba/report?report_id=client_lookup" +
      "&p_region=east&min_total=0")
    val viaHttp = (JsonMethods.parse(r.body()) \ "results")
      .extract[Seq[JValue]].map(row =>
        ((row \ "name").extract[String], (row \ "total").extract[Long]))
    assert(viaHttp == direct)
  }
}
