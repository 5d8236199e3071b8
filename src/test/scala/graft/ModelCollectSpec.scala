package graft

import org.apache.spark.sql.functions._

import graft.operators.ModelCollect

/** The enforced model-collect discipline: every driver-side
  * materialization of a "model-sized by construction" frame goes
  * through [[ModelCollect.bounded]], which fails loudly (and cheaply —
  * the limit ships at most bound+1 rows) when the construction
  * argument is wrong.
  */
class ModelCollectSpec extends SparkSpec {
  import spark.implicits._

  test("within-bound collect returns every row, order preserved under sort") {
    val df = Seq(3 -> "c", 1 -> "a", 2 -> "b").toDF("id", "v")
    val rows = ModelCollect.bounded(df.orderBy("id"), 10, "spec")
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("exceeding the bound fails with the site name, not an OOM") {
    val df = spark.range(100).toDF("id")
    val e = intercept[IllegalArgumentException] {
      ModelCollect.bounded(df, 50, "spec-site")
    }
    assert(e.getMessage.contains("spec-site"))
    assert(e.getMessage.contains("exceeded its 50-row bound"))
    assert(e.getMessage.contains("corpus-sized, not model-sized"))
  }

  test("a corpus-grain column passed to unimax trips the guard by name") {
    val docs = spark.range(200000)
      .select(concat(lit("doc"), col("id")).as("doc_id"),
        lit(10L).as("n"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.unimaxAllocation(docs, "doc_id", col("n"),
        budget = 1000, maxEpochs = 2.0)
    }
    assert(e.getMessage.contains("doc_id"))
    assert(e.getMessage.contains("exceeded its 100000-row bound"))
  }
}
