package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: PQ recall@5 vs brute force across (m, ksub) settings on
  * the adversarial near-random embeddings table.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val corpus = e.filter(col("vec_id") >= 10)
      val queries = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", 5)
        .select("qid", "nid")
        .collect() // collect-bound: k x queries probe rows (diagnostic main)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((m, ksub) <- Seq((8, 16), (16, 16), (16, 32))) {
        val t0 = System.nanoTime()
        val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5,
            m = m, ksub = ksub)
          .select("qid", "nid")
        .collect() // collect-bound: k x queries probe rows (diagnostic main)
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact & pq).size.toDouble / exact.size
        println(f"m=$m%2d ksub=$ksub%3d recall=$recall%.3f  ${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    } finally spark.stop()
  }
}
