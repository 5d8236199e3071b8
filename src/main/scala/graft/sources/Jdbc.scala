package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source reader — the production OpenMRS path for SURVEY §2.1
  * S1 (the reference reads `obs`/`encounter`/`person` from MySQL,
  * reference pom.xml:279-280, README.md:123). The engine only ever
  * sees DataFrames, so swapping [[Tables.load]] for [[Jdbc.table]]
  * changes nothing downstream.
  *
  * The scale knob is `partitionColumn`: without it a JDBC read is ONE
  * task on one executor regardless of cluster size; with bounds it
  * becomes `numPartitions` range-predicate queries in parallel.
  * Catalyst pushes filters into the generated SQL (`PushedFilters`
  * on the JDBC scan node), so `Incremental.changedSince`'s bookmark
  * predicate runs IN MySQL — a tick ships only changed rows, which is
  * the whole point of incremental mode over a remote source.
  *
  * Untested in this environment (no database in the container) by
  * construction: the method body is a direct pass-through to
  * `spark.read.jdbc`, with the option plumbing pinned here.
  */
object Jdbc {

  final case class Conn(
      url: String,                       // jdbc:mysql://host/openmrs
      user: String,
      password: String,
      driver: String = "com.mysql.cj.jdbc.Driver")

  /** Parallel partitioned read of one table (or subquery alias). */
  def table(
      spark: SparkSession,
      conn: Conn,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("user", conn.user)
    props.setProperty("password", conn.password)
    props.setProperty("driver", conn.driver)
    // cursor-stream rows instead of buffering whole result sets in the
    // executor (the MySQL connector default reads everything into RAM)
    props.setProperty("fetchsize", "10000")
    spark.read.jdbc(conn.url, table, partitionColumn,
      lowerBound, upperBound, numPartitions, props)
  }

  /** Single-partition read — only for genuinely small tables (dims). */
  def smallTable(spark: SparkSession, conn: Conn, table: String): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("user", conn.user)
    props.setProperty("password", conn.password)
    props.setProperty("driver", conn.driver)
    spark.read.jdbc(conn.url, table, props)
  }

  /** JDBC result sink — the reference's deployment writes its
    * analysis tables back into the database (reference README.md:123:
    * the `analysis_db` MySQL schema). `overwrite` is the full-refresh
    * family (S2), `append` serves incremental merges whose dedup
    * happened engine-side first.
    *
    * The scale knob here is `maxConnections`: a wide DataFrame write
    * opens one connection PER PARTITION — a 1000-executor write would
    * hammer the database with 1000 sessions. Coalesce (narrow, no
    * shuffle) caps the fan-in; rows stream in `batchSize` inserts per
    * round trip.
    */
  def writeTable(
      df: DataFrame, conn: Conn, table: String,
      mode: String = "overwrite",
      maxConnections: Int = 8, batchSize: Int = 10000): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", conn.user)
    props.setProperty("password", conn.password)
    props.setProperty("driver", conn.driver)
    props.setProperty("batchsize", batchSize.toString)
    // unconditional: coalesce never INCREASES partition count, and
    // probing df.rdd.getNumPartitions first would materialize the
    // whole upstream plan under AQE just to read a number — running
    // the pipeline twice per write
    df.coalesce(maxConnections).write.mode(mode).jdbc(conn.url, table, props)
  }
}
