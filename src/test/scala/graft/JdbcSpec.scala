package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC production source against an embedded in-memory database —
  * mirroring the reference's own test shape (its only test runs
  * against in-memory H2, reference MambaTest.java:34). Derby ships in
  * /opt/spark/jars, so it is the zero-egress stand-in for the MySQL
  * OpenMRS source (reference pom.xml:279-280).
  *
  * What matters here is the SCALE plumbing, not the driver: the
  * partitioned range read must plan `numPartitions` parallel tasks
  * whose union is exactly the table, and filter predicates must push
  * into the generated SQL so a tick ships only changed rows.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val conn = Jdbc.Conn(url, user = "", password = "",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val fixture: Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute(
        """CREATE TABLE obs (
          |  obs_id INT NOT NULL,
          |  person_id INT,
          |  value_numeric DOUBLE,
          |  date_created TIMESTAMP
          |)""".stripMargin)
      val ps = c.prepareStatement("INSERT INTO obs VALUES (?, ?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i)
        ps.setInt(2, i % 7)
        ps.setDouble(3, i * 1.5)
        ps.setTimestamp(4,
          java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally c.close()
  }

  test("partitioned range read: numPartitions tasks, exact union") {
    fixture
    val df = Jdbc.table(spark, conn, "obs", "obs_id",
      lowerBound = 1, upperBound = 101, numPartitions = 4)
    // the read is genuinely parallel: one range-predicate query per
    // partition (this is the knob that stops a 100 TB source read from
    // being a single task on one executor)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // stride boundaries neither drop nor duplicate rows
    val ids = df.select("obs_id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (1 to 100))
  }

  test("predicate pushdown reaches the JDBC scan (bookmark shape)") {
    fixture
    val df = Jdbc.table(spark, conn, "obs", "obs_id", 1, 101, 4)
      .filter(col("obs_id") > 90)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(OBS_ID,90)"),
      s"expected obs_id > 90 pushed into the JDBC scan:\n$scan")
    assert(df.count() == 10)

    // the incremental tick's change-detection predicate pushes the
    // same way: the bookmark comparison runs IN the database
    val tick = graft.operators.Incremental.changedSince(
      Jdbc.table(spark, conn, "obs", "obs_id", 1, 101, 4),
      Some(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")),
      tsCols = Seq("date_created"))
    val tickScan = tick.queryExecution.executedPlan.toString
    assert(tickScan.contains("GreaterThan(DATE_CREATED,"),
      s"expected bookmark predicate pushed into the JDBC scan:\n$tickScan")
    assert(tick.count() ==
      (1 to 100).count(i => i % 28 + 1 > 20))
  }

  test("smallTable single-partition read round-trips types") {
    fixture
    val df = Jdbc.smallTable(spark, conn, "obs")
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 100)
    val row = df.filter(col("obs_id") === 42)
      .select("person_id", "value_numeric").collect().head
    assert(row.getInt(0) == 0 && row.getDouble(1) == 63.0)
  }

  test("writeTable: overwrite replaces, append adds, connections capped") {
    fixture
    import spark.implicits._
    val report = (1 to 50).map(i => (i.toLong, s"name_$i", i * 2.0))
      .toDF("id", "name", "score").repartition(16)
    Jdbc.writeTable(report, conn, "report_out", maxConnections = 4)
    val back = Jdbc.smallTable(spark, conn, "report_out")
    assert(back.count() == 50)
    assertSameRows(back.select("id", "name", "score"),
      report.select("id", "name", "score"))

    // full refresh: a second overwrite REPLACES, never accumulates
    Jdbc.writeTable(report.filter(col("id") <= 10), conn, "report_out")
    assert(Jdbc.smallTable(spark, conn, "report_out").count() == 10)

    // append mode adds rows on top
    Jdbc.writeTable(report.filter(col("id") > 40), conn, "report_out",
      mode = "append")
    assert(Jdbc.smallTable(spark, conn, "report_out").count() == 20)
  }
}
