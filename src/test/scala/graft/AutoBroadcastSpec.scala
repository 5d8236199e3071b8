package graft

import org.apache.spark.sql.functions._

import graft.plans.AutoBroadcastDims
import graft.sources.Tables

/** The dim auto-broadcast optimizer rule: with stats-based broadcast
  * disabled, a plain join against a declared dim table still plans as
  * BroadcastHashJoin once the rule is installed.
  */
class AutoBroadcastSpec extends SparkSpec {

  test("declared dim scans get broadcast despite threshold=-1") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.experimental.extraOptimizations =
      Seq(AutoBroadcastDims(Tables.smallDims))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = Tables.load(spark, sfDir, "customer")
      val n = Tables.load(spark, sfDir, "nation") // declared small dim
      val joined = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name")).count()
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"expected broadcast join, got:\n$physical")
      assert(joined.count() > 0)

      // control: without the rule the same join is sort-merge
      spark.experimental.extraOptimizations = Nil
      val control = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name")).count()
      assert(!control.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("a big frame aliased to a dim name is NOT force-broadcast") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.experimental.extraOptimizations =
      Seq(AutoBroadcastDims(Tables.smallDims))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // adversarial shape from the round-1 advice: lineitem wearing a
      // dim's name — matching by alias name alone would broadcast an
      // arbitrarily large relation (executor OOM at scale)
      val bigAsDim = Tables.load(spark, sfDir, "lineitem").alias("nation")
      val o = Tables.load(spark, sfDir, "orders")
      val joined = o.join(bigAsDim, o("o_orderkey") === col("l_orderkey"))
      assert(!joined.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "alias-only dim name must not trigger a forced broadcast")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("temp-view (SQL) joins against dims are covered too") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.experimental.extraOptimizations =
      Seq(AutoBroadcastDims(Tables.smallDims))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.registerAll(spark, sfDir)
      val df = spark.sql(
        "SELECT r.r_name, count(*) AS n FROM customer c " +
          "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
          "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name")
      val physical = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(physical).size >= 2, physical)
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
