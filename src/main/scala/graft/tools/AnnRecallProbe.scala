package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Dev probe: measured recall@5 of each approximate ANN variant vs
  * brute force at the given scale factors — used to pick the
  * `ann_recall_*` driver-query thresholds with margin.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    try {
      for (dir <- args.toSeq) {
        val e = Tables.load(spark, dir, "embeddings")
        val corpus = e.filter(col("vec_id") >= 10)
        val queries = e.filter(col("vec_id") < 10)
        val brute = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", 5).select("qid", "nid")
        def recall(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
          val hits = brute.join(approx.select("qid", "nid"),
            Seq("qid", "nid"), "left_semi").count()
          val total = brute.count()
          println(f"[recall] $dir $name%-4s ${hits.toDouble / total}%.3f ($hits/$total)")
        }
        recall("lsh", Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5,
          bitsPerTable = 4, tables = 16))
        recall("ivf", Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5,
          nCentroids = 16, nProbe = 8))
        recall("sq", Similarity.sqTopK(corpus, queries, "vec_id", "embedding", 5))
      }
    } finally spark.stop()
  }
}
