package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scaffolding for the two-phase distributed prefix pattern
  * over seeded md5 shuffle keys ([[Sampling.tokenBudgetMix]],
  * [[Packing.lengthBucketBatches]]; [[Packing.packSequences]] uses
  * the same idea over contiguous ID ranges): split each group's key
  * space into [[Buckets]] hex-prefix buckets, aggregate per-(group,
  * bucket) totals (one small shuffle), prefix-scan the model-sized
  * grid on the driver, then window WITHIN each (group, bucket) —
  * never a single partition per group. One definition of the bucket
  * formula and the scan so the pattern's instances cannot drift.
  */
private[operators] object DistributedPrefix {

  /** Buckets per group: 2 hex chars of the key. */
  val Buckets = 256

  /** Key-prefix bucket in [0, [[Buckets]]): uniform because the md5
    * shuffle key's leading hex chars are.
    */
  def keyBucket(key: Column): Column =
    conv(substring(key, 1, 2), 16, 10).cast("int")

  /** For every (group, bucket) cell of the grid, the group's total
    * over strictly-smaller buckets — the per-group exclusive prefix
    * scan, driver-side over model-sized data only.
    */
  def bucketPrefixes[G](totals: Map[(G, Int), Long])(
      implicit ord: Ordering[G]): Seq[(G, Int, Long)] =
    totals.keys.map(_._1).toSeq.distinct.sorted.flatMap { g =>
      var acc = 0L
      (0 until Buckets).map { b =>
        val p = acc
        acc += totals.getOrElse((g, b), 0L)
        (g, b, p)
      }
    }

  /** A group's grand total over all buckets (driver-side). */
  def groupTotal[G](totals: Map[(G, Int), Long], g: G): Long =
    (0 until Buckets).map(b => totals.getOrElse((g, b), 0L)).sum

  /** Exclusive cumulative totals over integer-indexed groups
    * 0..nGroups — the global offset of each group's first row when
    * groups are laid out group-major (curriculum phases, length
    * bands). `perGroup` maps a group's size to its footprint (rows,
    * batches, …).
    */
  def groupOffsets(totals: Map[(Int, Int), Long], nGroups: Int,
      perGroup: Long => Long = identity): IndexedSeq[Long] =
    (0 to nGroups).map(g => perGroup(groupTotal(totals, g)))
      .scanLeft(0L)(_ + _)
}
