package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates: sketch values are engine-specific, so the
  * driver check is rows-only — the accuracy contract is asserted here
  * against the exact answers.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem orderkeys") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_orderkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"HLL rel err $relErr > 5% (exact=$exact approx=$approx)")
  }

  test("percentile_approx brackets the exact median") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val approxP50 = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .as[Double].head()
    val exactP50 = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val relErr = math.abs(approxP50 - exactP50) / exactP50
    assert(relErr <= 0.02, s"p50 rel err $relErr > 2%")
  }
}
