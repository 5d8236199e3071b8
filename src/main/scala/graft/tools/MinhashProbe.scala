package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev probe: stage-level timings of the MinHash+LSH pipeline (the
  * heaviest dedup-family plan). Run:
  *   SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.MinhashProbe
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("warmup count")(docs.count())

    val prime = 2147483647L
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(prime)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSh = time("shingles materialize")(sh.count())
    println(s"[probe] shingle rows: $nSh")

    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(128)(
      (rnd.nextInt((prime - 1).toInt).toLong + 1L, rnd.nextInt(prime.toInt).toLong))
    val minCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(prime))).as(s"m$i")
    }
    val sig = sh.groupBy(col("doc")).agg(minCols.head, minCols.tail: _*)
    time("signature cols WARM1")(
      sig.write.format("noop").mode("overwrite").save())
    time("signature cols WARM2")(
      sig.write.format("noop").mode("overwrite").save())

    val mh = org.apache.spark.sql.functions.udaf(
      graft.functions.MinHashAggregator.minhash(
        coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, prime),
      org.apache.spark.sql.Encoders.scalaLong)
    val sigAgg = sh.groupBy(col("doc")).agg(mh(col("h")).as("sig"))
    time("signature udaf WARM1")(
      sigAgg.write.format("noop").mode("overwrite").save())
    time("signature udaf WARM2")(
      sigAgg.write.format("noop").mode("overwrite").save())

    val bandRows = sig.select(col("doc"), explode(array((0 until 32).map { bi =>
      val cols = (bi * 4 until (bi + 1) * 4).map(i => col(s"m$i"))
      struct(lit(bi).as("band"), xxhash64(cols: _*).as("bkey"))
    }: _*)).as("tb"))
      .select(col("doc"), col("tb.band"), col("tb.bkey"))
    val l = bandRows.select(col("doc").as("da"), col("band"), col("bkey"))
    val r = bandRows.select(col("doc").as("db"), col("band"), col("bkey"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
      .persist()
    val nCand = time("bands + candidate join")(candidates.count())
    println(s"[probe] candidate pairs: $nCand")

    time("full minHashLsh")(
      Dedup.minHashLsh(docs, "doc_id", "text", 3, 0.7)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
