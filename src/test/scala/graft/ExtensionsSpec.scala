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
