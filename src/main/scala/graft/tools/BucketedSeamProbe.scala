package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{AnalysisStore, Tables}

/** Dev probe hunting the store_bucketed_gate transient-empty scan
  * (commit ca8e932): twice in long-JVM 276-query sweeps, a managed
  * bucketed table's zero-exchange scan evaluated EMPTY inside the
  * pre-fix two-job exceptAll compare (b−p = ∅ AND p−b = ALL rows at
  * equal counts ⇒ the bucketed side read zero rows in both jobs)
  * even though the write had succeeded and the plan was correct.
  *
  * This reproduces the EXACT pre-fix shape — drop + writeBucketed +
  * `spark.table` resolution + merge-hinted zero-exchange join + two
  * SEPARATE exceptAll count jobs, NO checkpoints — in a loop inside
  * one JVM, with sweep-like neighbors (unrelated managed-table
  * create/overwrite/drop churn against the same warehouse, periodic
  * System.gc() to force any soft/weak cache eviction the long sweep's
  * memory pressure would cause). On any anomaly it dumps the full
  * resolution state: executed plan, every FileSourceScanExec's
  * FileIndex listing, the raw filesystem listing of the table
  * location, catalog metadata, a fresh re-resolved count, and whether
  * REFRESH TABLE repairs it — enough to pin the stale layer (FileIndex
  * vs relation cache vs filesystem) if it fires.
  *
  * Run: scripts/run.sh graft.tools.BucketedSeamProbe [iters] [sfDir]
  * Exit 0 = no anomaly in `iters` iterations; exit 2 = reproduced
  * (diagnostics on stderr).
  */
object BucketedSeamProbe {

  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 400
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._

    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val lines = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    def joined(a: DataFrame, b: DataFrame): DataFrame =
      a.hint("merge").join(b, Seq("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(max("o_custkey").as("cust"),
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty"))

    def scans(df: DataFrame): Seq[FileSourceScanExec] = {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect { case s: FileSourceScanExec => s }
    }

    def rawListing(table: String): String = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val loc = new org.apache.hadoop.fs.Path(meta.location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files =
        if (!fs.exists(loc)) Seq("<location missing>")
        else fs.listStatus(loc).toSeq.map(s =>
          s"${s.getPath.getName} len=${s.getLen}")
      s"$table @ ${meta.location} bucketSpec=${meta.bucketSpec}\n  " +
        files.mkString("\n  ")
    }

    def dump(iter: Int, why: String, frames: Map[String, DataFrame]): Unit = {
      System.err.println(s"[seam-probe] ANOMALY iter=$iter: $why")
      Seq("graft_probe_orders", "graft_probe_lines").foreach { t =>
        System.err.println("[seam-probe] raw FS " + rawListing(t))
        System.err.println(s"[seam-probe] fresh spark.table($t).count = " +
          spark.table(t).count())
      }
      frames.foreach { case (name, df) =>
        System.err.println(s"[seam-probe] $name FileIndex inputs:")
        scans(df).foreach { sc =>
          val files = sc.relation.location.inputFiles
          System.err.println(s"[seam-probe]   scan ${sc.tableIdentifier}" +
            s" files=${files.length}: ${files.take(4).mkString(", ")}")
        }
        System.err.println(s"[seam-probe] $name executed plan:\n" +
          df.queryExecution.executedPlan.toString.take(4000))
      }
      Seq("graft_probe_orders", "graft_probe_lines").foreach { t =>
        spark.sql(s"REFRESH TABLE $t")
        System.err.println(s"[seam-probe] after REFRESH TABLE $t: count = " +
          spark.table(t).count())
      }
    }

    var failed = false
    var iter = 0
    val t0 = System.nanoTime()
    while (iter < iters && !failed) {
      iter += 1
      // sweep-neighbor churn: another managed table living and dying
      // in the same warehouse (what the 90 queries before the gate do)
      spark.sql("DROP TABLE IF EXISTS graft_probe_neighbor")
      orders.limit(500).write.mode("overwrite")
        .saveAsTable("graft_probe_neighbor")
      if (iter % 3 == 0) spark.sql("DROP TABLE IF EXISTS graft_probe_neighbor")

      spark.sql("DROP TABLE IF EXISTS graft_probe_orders")
      spark.sql("DROP TABLE IF EXISTS graft_probe_lines")
      AnalysisStore.writeBucketed(orders, "graft_probe_orders",
        Seq("o_orderkey"), nBuckets = 8)
      AnalysisStore.writeBucketed(lines, "graft_probe_lines",
        Seq("o_orderkey"), nBuckets = 8)

      val bucketed = joined(spark.table("graft_probe_orders"),
        spark.table("graft_probe_lines"))
      val plain = joined(orders, lines)
      // the pre-fix shape: two separate count jobs, no checkpoint —
      // the bucketed scan is inlined and re-evaluated in BOTH
      val bMinusP = bucketed.exceptAll(plain).count()
      val pMinusB = plain.exceptAll(bucketed).count()
      if (bMinusP != 0 || pMinusB != 0) {
        failed = true
        dump(iter, s"bMinusP=$bMinusP pMinusB=$pMinusB " +
          s"(bucketed.count now=${bucketed.count()})",
          Map("bucketed" -> bucketed, "plain" -> plain))
      } else {
        val bc = bucketed.count()
        if (bc == 0) { failed = true; dump(iter, "bucketed count = 0",
          Map("bucketed" -> bucketed)) }
      }
      if (iter % 20 == 0) {
        // long-sweep memory pressure stand-in: force reference
        // processing so any soft/weak-valued cache actually evicts
        System.gc()
        println(f"[seam-probe] iter $iter%5d ok  " +
          f"${(System.nanoTime() - t0) / 1e9}%8.1fs")
      }
    }
    Seq("graft_probe_orders", "graft_probe_lines",
      "graft_probe_neighbor").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    if (failed) sys.exit(2)
    println(s"[seam-probe] no anomaly in $iter iterations")
  }
}
