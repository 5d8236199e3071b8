package graft

/** Print one registered query's executed physical plan — the
  * debugging companion to [[PlanAudit]]'s aggregate table (that table
  * counts node names; this shows the actual tree, so exchange REUSE
  * vs recompute, pushed filters, and codegen spans can be read
  * directly).
  *
  * Usage: ExplainOne <queryName> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ExplainOne <queryName> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Registry.all(name).build(spark, sfDir)
    // materialize so AQE finalizes the plan (isFinalPlan=true)
    df.count()
    // scalastyle:off println
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
