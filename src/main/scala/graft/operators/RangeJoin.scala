package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point-in-time row to
  * every interval row containing it. Spark plans a bare
  * `p.ts BETWEEN i.start AND i.end` as BroadcastNestedLoopJoin —
  * O(|points|×|intervals|) with no partitioning.
  *
  * Bucketization makes it an equi-join: pick a bucket width w; every
  * point owns exactly one bucket (epoch ÷ w); every interval is
  * exploded to each bucket it overlaps (⌈len/w⌉+1 rows). The
  * equi-join on bucket distributes like any hash join, and the exact
  * BETWEEN predicate filters within buckets. Each (point, interval)
  * pair meets exactly once — in the point's bucket — so no dedup
  * pass is needed.
  *
  * At 100 TB: shuffle is by bucket (time-uniform → even); interval
  * blowup is bounded by len/w, so pick w near the median interval
  * length. Hot buckets (flash events) fall to AQE skew handling.
  */
object RangeJoin {

  /** @param points    rows with `tsCol` (timestamp)
    * @param intervals rows with `startCol`/`endCol` (timestamps,
    *                  inclusive bounds)
    * @param bucketSeconds bucket width — near the median interval
    *                  length is a good default
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val p = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(i, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
