package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): run every registered
  * query on SPARK_GRAFT_SF_DIR, print ONE JSON line.
  *
  * Each query is forced through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune the plan down to row counting, noop
  * materializes every output row, so the timing covers the real work.
  * First a warmup query JIT-compiles the read path so measured times
  * aren't dominated by first-touch classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table once (classload + parquet footer reads)
    graft.sources.Tables.all.foreach { n =>
      try graft.sources.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }

    // SPARK_GRAFT_ONLY=q1_pricing_summary,q8_star_join → bench a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate queries: drop persisted blocks an operator may have
      // left behind (e.g. minhash's shingle cache) so later timings
      // don't pay its memory pressure
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
