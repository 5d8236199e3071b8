package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for every spec (one JVM-wide session —
  * ScalaTest suites run in one forked JVM, so getOrCreate dedupes).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir

  /** Order-insensitive comparison on fully-collected small results. */
  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    val a = actual.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val e = expected.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length == e.length,
      s"row count: got ${a.length}, want ${e.length}")
    a.zip(e).zipWithIndex.foreach { case ((ra, re), i) =>
      assert(ra == re, s"first differing row (#$i): got $ra, want $re")
    }
  }
}
