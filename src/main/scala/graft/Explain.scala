package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: print the formatted physical plan of one or
  * all registered queries — the "iterate until it's the plan you'd
  * want" loop (pushdown visible as PushedFilters/ReadSchema, joins as
  * BroadcastHashJoin, codegen spans as WholeStageCodegen ids).
  *
  * Usage: Explain <sfDir> [queryName]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"error: ${e.getMessage}") }
      }
    spark.stop()
  }
}
