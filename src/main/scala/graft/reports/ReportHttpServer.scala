package graft.reports

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.model.QueryParam

/** HTTP twin of the reference's report webservice (SURVEY §2.1 S6,
  * §3 E3) — `GET /ws/rest/v1/mamba/report?report_id=X&param=value`
  * exactly as documented at reference README.md:277-283 ("It is an
  * HTTP Rest webservice interface ... `<EMR_URL>/openmrs/ws/rest/v1/
  * mamba/report?report_id=total_deliveries`"; README.md:329 "the
  * `report_id` value ... is the same value passed to the URL
  * parameter"). The serving controller itself lives in the reference's
  * out-of-snapshot webservices dependency, so only the URL contract is
  * mirrored; the response body is this engine's own JSON shape:
  * `{"report_id": ..., "row_count": n, "results": [{col: value}...]}`.
  *
  * Built on the JDK's `com.sun.net.httpserver` (no extra
  * dependencies). Engine-scale posture: this is a DRIVER-side serving
  * shim over [[ReportRegistry.run]] — the query itself executes
  * distributed through Catalyst exactly as the library call does; the
  * shim only collects the (report-sized) result, capped at
  * `maxRows` so a mis-scoped report cannot pull a corpus through the
  * driver. Typed URL params are coerced per the report's declared
  * `query_params` types (README.md:297-306) and bound through Spark's
  * named parameterized SQL — injection-safe, never string-spliced.
  *
  * Error contract: 400 missing/mistyped `report_id` or params,
  * 404 unknown report, 405 non-GET, 500 execution failure; all error
  * bodies are JSON `{"error": msg}`.
  *
  * Exposure: the server carries NO authentication (the reference's
  * equivalent sits behind the EMR's authenticated webservice layer),
  * so it binds LOOPBACK by default — every registered report would
  * otherwise be readable by any network peer. Deployments that front
  * it with an authenticating proxy opt into a wider bind explicitly
  * via `host` (e.g. "0.0.0.0").
  */
final class ReportHttpServer(
    spark: SparkSession,
    registry: ReportRegistry,
    port: Int = 0,
    maxRows: Int = 10000,
    host: String = "127.0.0.1") {

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(host, port), 0)
    s.createContext("/ws/rest/v1/mamba/report", new ReportHandler)
    s.setExecutor(Executors.newFixedThreadPool(4))
    s
  }

  /** Bound port (useful when constructed with port=0 for ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  def start(): this.type = { server.start(); this }

  def stop(): Unit = server.stop(0)

  private final class ReportHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod != "GET")
          reply(ex, 405, errJson("method not allowed; use GET"))
        else {
          val q = parseQuery(Option(ex.getRequestURI.getRawQuery))
          q.get("report_id") match {
            case None =>
              reply(ex, 400, errJson("missing required parameter: report_id"))
            case Some(id) => runReport(ex, id, q - "report_id")
          }
        }
      } catch {
        case e: Exception => reply(ex, 500, errJson(e.getMessage))
      } finally ex.close()

    private def runReport(ex: HttpExchange, id: String,
        raw: Map[String, String]): Unit = {
      val defn =
        try registry.get(id)
        catch {
          case e: NoSuchElementException =>
            reply(ex, 404, errJson(e.getMessage)); return
        }
      val missing = defn.params.map(_.name).filterNot(raw.contains)
      if (missing.nonEmpty) {
        reply(ex, 400,
          errJson(s"report $id missing params: ${missing.mkString(", ")}"))
        return
      }
      val typed =
        try defn.params.map(p => p.name -> coerce(p, raw(p.name))).toMap
        catch {
          case e: IllegalArgumentException =>
            reply(ex, 400, errJson(e.getMessage)); return
        }
      val rows = registry.run(spark, id, typed).limit(maxRows)
        // collect-bound: limit(maxRows) — structurally capped payload
        .toJSON.collect()
      val body = s"""{"report_id":${jsonStr(id)},""" +
        s""""row_count":${rows.length},""" +
        s""""results":[${rows.mkString(",")}]}"""
      reply(ex, 200, body)
    }
  }

  /** URL-string → typed literal per the declared SQL param type, so a
    * report declaring INT gets an integer literal in the plan (same
    * typed contract as the reference's query_params).
    */
  private def coerce(p: QueryParam, v: String): Any = {
    val t = p.sqlType.takeWhile(_ != '(').trim.toUpperCase
    try t match {
      case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" => v.toLong
      case "DOUBLE" | "FLOAT" | "REAL" | "DECIMAL" | "NUMERIC" => v.toDouble
      case "BOOLEAN" | "BOOL" => v.toBoolean
      case _ => v // VARCHAR/CHAR/TEXT/DATE/DATETIME bind as strings
    } catch {
      case _: NumberFormatException | _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"param ${p.name} expects ${p.sqlType}, got: $v")
    }
  }

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.filter(_.nonEmpty).fold(Map.empty[String, String]) { s =>
      s.split('&').iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
        URLDecoder.decode(k, StandardCharsets.UTF_8) ->
          URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap
    }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  private def errJson(msg: String): String =
    s"""{"error":${jsonStr(Option(msg).getOrElse("internal error"))}}"""

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
