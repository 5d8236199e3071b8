package graft.tools

/** Dev probe: does this Spark build execute recursive CTEs? */
object RecProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    try {
      spark.sql("""
        WITH RECURSIVE walk(k, depth) AS (
          SELECT 1, 0
          UNION ALL
          SELECT k * 2, depth + 1 FROM walk WHERE k * 2 <= 100)
        SELECT k, depth FROM walk ORDER BY k""").show()
    } finally spark.stop()
  }
}
