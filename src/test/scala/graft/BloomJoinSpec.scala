package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin
import graft.sources.Tables

/** Bloom-pruned join: exact result (sketch false positives die in the
  * real join) while the pruning step actually drops non-matching fact
  * rows before any exchange.
  */
class BloomJoinSpec extends SparkSpec {

  test("prunedJoin ≡ plain join; pruning strictly reduces the fact side") {
    val orders = Tables.load(spark, sfDir, "orders")
    val dim = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")

    val plain = orders.join(dim, orders("o_custkey") === dim("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val bloomed = BloomJoin.prunedJoin(orders, dim,
        factKey = "o_custkey", dimKey = "c_custkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("o_orderkey", "c_custkey")
    assertSameRows(bloomed, plain)

    val total = orders.count()
    val matched = plain.count()
    val pruned = BloomJoin.prunedFact(orders, dim,
      "o_custkey", "c_custkey", 10000L, 0.01).count()
    // every true match survives; false positives stay near fpp
    assert(pruned >= matched, s"pruning lost matches: $pruned < $matched")
    assert(pruned < total, s"pruning dropped nothing ($pruned of $total)")
    assert(pruned - matched <= (total * 0.05).toLong,
      s"false-positive volume implausibly high: $pruned vs $matched of $total")
  }

  test("string keys probe via mightContainString") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dim = docs.filter(col("doc_id") % 7 === 0)
      .select(col("lang").as("dim_lang")).distinct()
    val joined = BloomJoin.prunedJoin(docs, dim, "lang", "dim_lang",
        expectedItems = 100L, fpp = 0.01)
      .select("doc_id", "dim_lang")
    val plain = docs.join(dim, docs("lang") === dim("dim_lang"))
      .select("doc_id", "dim_lang")
    assertSameRows(joined, plain)
  }

  test("probe is a native expression fused into the scan stage, not a UDF") {
    val orders = Tables.load(spark, sfDir, "orders")
    val dim = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val plan = BloomJoin.prunedFact(orders, dim, "o_custkey", "c_custkey",
      10000L, 0.01).queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_probe"), s"native probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"UDF survived in the probe path:\n$plan")
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage — the UDF form ran the Filter outside any codegen span
    assert(plan.linesIterator.exists(l =>
      l.trim.matches("""\*\(\d+\) Filter graft_bloom_probe.*""")),
      s"probe Filter not inside a codegen stage:\n$plan")
  }

  test("unsupported key type is rejected eagerly") {
    val orders = Tables.load(spark, sfDir, "orders")
    intercept[IllegalArgumentException] {
      BloomJoin.prunedFact(
        orders.select(col("o_totalprice").as("k")),
        orders.select(col("o_custkey").as("d")), "k", "d")
    }
  }
}
