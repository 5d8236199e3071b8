package graft

/** SQL exposure of the native expressions (SparkSessionExtensions /
  * registry injection).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot and graft_shingles callable from SQL") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(dot == 11.0)
    val sh = spark.sql(
      "SELECT graft_shingles('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    // float arrays coerce through the cast wrapper path in SQL too
    val dotF = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>), CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d")
      .as[Double].head()
    assert(dotF == 11.0)
  }

  test("graft_l2_normalize and graft_int8_quantize callable from SQL") {
    GraftExtensions.register(spark)
    val n = spark.sql("SELECT graft_l2_normalize(array(3.0D, 4.0D)) AS v")
      .as[Seq[Double]].head()
    // contract: x * (1/norm) — reciprocal-multiply, not division
    assert(n == Seq(3.0 * (1.0 / 5.0), 4.0 * (1.0 / 5.0)))
    assert(math.abs(math.sqrt(n.map(x => x * x).sum) - 1.0) < 1e-12)
    val q = spark.sql("SELECT graft_int8_quantize(array(3, 4)) AS c")
      .as[Seq[Byte]].head()
    assert(q == Seq(math.round(0.6 * 127).toByte, math.round(0.8 * 127).toByte))
  }

  test("graft_dot: raw float/int arrays are cast, not read as garbage") {
    GraftExtensions.register(spark)
    // pre-fix, an uncast array<float> passed analysis and getDouble
    // read the wrong byte layout silently; the builder now casts
    val f = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(f == 11.0)
    val i = spark.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d")
      .as[Double].head()
    assert(i == 11.0)
    // and the expression itself rejects non-double arrays when built
    // directly (no cast wrapper), instead of returning garbage
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val rawDot = GraftSqlBridge.column(graft.functions.DotProduct(
      GraftSqlBridge.expression(col("a")),
      GraftSqlBridge.expression(col("b"))))
    val err = intercept[Exception](df.select(rawDot).collect())
    assert(err.getMessage.toLowerCase.contains("array<double>")
      || err.getMessage.contains("DATATYPE_MISMATCH"), err.getMessage)
  }

  test("graft_shingles accepts foldable k, rejects non-foldable k") {
    GraftExtensions.register(spark)
    // foldable-but-not-literal is fine (evaluated at analysis)
    val sh = spark.sql("SELECT graft_shingles('a b c', length('xx')) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c"))
    val err = intercept[Exception](
      spark.sql("SELECT graft_shingles('a b c', CAST(rand() * 2 AS INT))").collect())
    assert(err.getMessage.contains("literal"))
  }
}
