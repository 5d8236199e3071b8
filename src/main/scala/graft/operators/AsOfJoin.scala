package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * timestamp is ≤ the left timestamp, per key — the temporal lookup
  * ("what was the state when this happened") that equi-joins can't
  * express.
  *
  * Spark-first plan (SURVEY §7.4 preference order (a): compose
  * existing ops): instead of a per-row range subquery or a theta
  * join (both quadratic per key), UNION the two sides tagged by
  * origin, sort within each key by (ts, origin), and carry the last
  * seen right row forward with `last(_, ignoreNulls)` over a running
  * window — ONE shuffle by key, one sort, linear scan. This is the
  * standard log-merge formulation; a right row sorts before a left
  * row at the same timestamp (inclusive ≤ semantics).
  *
  * At 100 TB: the single exchange is by join key; skewed keys
  * behave like any window (AQE) and the merge is streaming within a
  * partition — no state beyond the current right row per key.
  */
object AsOfJoin {

  /** @param left     probe side (keeps all rows)
    * @param right    reference side; its non-key columns are attached
    * @param keys     equi-key columns present on both sides
    * @param leftTs   left timestamp column
    * @param rightTs  right timestamp column
    */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    require(!keys.contains(rightTs) && !keys.contains(leftTs),
      "timestamp columns cannot be join keys")
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(rightVals.nonEmpty, "right side has no value columns to attach")
    require(rightVals.intersect(left.columns).isEmpty,
      s"right value columns ${rightVals.mkString(",")} collide with left columns — rename first")
    val leftNonKey = left.columns.filterNot(keys.contains)
    val outCols = (keys ++ leftNonKey ++ Seq("__rrow", "__ts", "__side")).map(col)

    // The entire right row rides in ONE struct so the window fill
    // below carries it atomically: per-column last(_, ignoreNulls)
    // would mix columns from different right rows whenever right
    // value columns contain legitimate NULLs (each column would grab
    // its own last non-null). The struct is null ⟺ the row came from
    // the left side, so ignoreNulls skips exactly the left rows.
    val rrowType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__rrow", lit(null).cast(rrowType))

    // capture __ts BEFORE dropping rightTs — the drop also makes room
    // for a left column of the same name (the leftTs == rightTs case).
    // NULL-key right rows are dropped first: equi-join semantics never
    // match on NULL, but the window partition would happily group a
    // null-key left row with null-key right rows and "match" them.
    // (Null-key LEFT rows survive with nothing to attach — same as a
    // left join.)
    // foldLeft over lit(true): keys = Nil (global as-of, one ordered
    // stream) stays legal — reduce would throw on the empty list
    var taggedRight = right
      .filter(keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__rrow", struct(rightVals.map(col): _*))
      .drop(rightTs)
    leftNonKey.foreach(c => taggedRight = taggedRight
      .withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = taggedLeft.select(outCols: _*)
      .unionByName(taggedRight.select(outCols: _*))

    // right rows (side=0) sort before left rows at equal ts → ≤ match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__rrow", last(col("__rrow"), ignoreNulls = true).over(w))
    val unpacked = rightVals.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"__rrow.$c"))
    }
    unpacked.filter(col("__side") === 1).drop("__rrow", "__ts", "__side")
  }
}
