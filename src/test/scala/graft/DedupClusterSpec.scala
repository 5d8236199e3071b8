package graft

import graft.operators.DedupCluster

/** Connected-components clustering of near-dup pairs: chains collapse
  * to one cluster, singletons self-label, convergence on long paths.
  */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("chains merge into one component with min-id canonical") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // edges 2-3, 3-4 (a chain) — 1 and 5 are singletons
    val pairs = Seq((2L, 3L), (3L, 4L)).toDF("da", "db")
    val out = DedupCluster.connectedComponents(docs, pairs)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 2L, false),
      (4L, 2L, false), (5L, 5L, true)))
  }

  test("long path converges (label must traverse the diameter)") {
    val n = 17L
    val docs = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("da", "db")
    val out = DedupCluster.connectedComponents(docs, pairs)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._2 == 1L), s"all labels should be 1: ${out.toSeq}")
    assert(out.count(_._3) == 1)
  }

  test("two disjoint components keep separate labels") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("da", "db")
    val out = DedupCluster.connectedComponents(docs, pairs)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 3L, 3L))
  }
}
