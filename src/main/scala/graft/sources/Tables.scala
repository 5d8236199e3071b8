package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the analysis store (SURVEY §2.1 S1).
  *
  * The reference reads its source entities over JDBC from MySQL
  * (reference pom.xml:279-280, README.md:123); our analysis store is
  * columnar Parquet so filters and column pruning push into the scan
  * (check `.explain`: PushedFilters / ReadSchema). A real OpenMRS
  * deployment would swap [[Tables.load]] for `spark.read.jdbc` with
  * `partitionColumn` for parallel reads — the rest of the engine only
  * sees DataFrames, so the source is pluggable.
  *
  * At 100 TB the per-table Parquet file becomes a directory of files;
  * `spark.read.parquet(dir)` plans one task per split, so nothing here
  * changes. We deliberately never cache here: each query plans its own
  * pruned scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always safe to broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) (earlier
    // fixture generations — FIXTURES.md) and TIMESTAMP(MICROS). The
    // vectorized reader rejects NANOS outright, so nanosAsLong stays
    // set (a no-op for micros files) and the long→timestamp
    // conversion applies ONLY when the column actually read back as
    // raw nanos longs. Nanos truncate to micros via integer `div` —
    // exactly what DuckDB's reader does, so the oracle sees identical
    // values either way (a double round-trip would lose precision
    // above 2^53 ns).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table of a scale-factor dir as a temp view so that
    * `spark.sql` report queries (SURVEY §3 E3) resolve by name — same
    * names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
