package graft

import java.nio.file.Files

import graft.sources.AnalysisStore

/** Persisted analysis store: full-refresh idempotence and the
  * incremental read-merge-swap path, including first-write and
  * repeated ticks.
  */
class AnalysisStoreSpec extends SparkSpec {
  import spark.implicits._

  test("writeFull overwrites idempotently; partitioning lays out dirs") {
    val dir = Files.createTempDirectory("store").resolve("t").toString
    val v1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("k", "d", "v")
    AnalysisStore.writeFull(v1, dir, partitionBy = Seq("d"))
    AnalysisStore.writeFull(v1, dir, partitionBy = Seq("d")) // idempotent
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.columns.contains("d")) // partition column readable
  }

  test("writeIncremental: first write, then merge-by-key over ticks") {
    val dir = Files.createTempDirectory("store").resolve("inc").toString
    AnalysisStore.writeIncremental(spark,
      Seq((1L, "a1"), (2L, "b1")).toDF("k", "v"), dir, Seq("k"))
    AnalysisStore.writeIncremental(spark,
      Seq((2L, "b2"), (3L, "c2")).toDF("k", "v"), dir, Seq("k"))
    AnalysisStore.writeIncremental(spark,
      Seq((1L, "a3")).toDF("k", "v"), dir, Seq("k"))
    val rows = spark.read.parquet(dir).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a3"), (2L, "b2"), (3L, "c2")))
    // no staging/backup leftovers
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("inc"), s"leftovers: $parent")
  }
}
