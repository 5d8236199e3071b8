package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}

import graft.operators.{Layout, ModelCollect}

/** SQL-transparent data skipping: a [[FileIndex]] that consults the
  * engine's persisted per-file min/max boxes INSIDE Spark's own scan
  * planning — the design Delta uses, and the step that turns
  * [[graft.operators.Layout.autoPrunedRead]] (an API a caller must
  * choose) into something every plain `spark.sql("… WHERE …")` over a
  * registered table gets for free. `FileSourceStrategy` hands
  * `listFiles` the RESOLVED data filters; extractable bounds
  * ([[graft.operators.Layout.boundsOf]] — the same extractor as the
  * API path, so the two can never disagree on semantics) drop whole
  * files whose box misses every bound.
  *
  * Soundness is load-bearing here in a way the API path's is not:
  * file-level listing is NOT re-checked downstream (Spark re-applies
  * the row filter to rows it reads, but a wrongly dropped FILE is
  * silent row loss). So the pruning keeps every file the index does
  * not cover, keeps everything on any type drift, and drops a file
  * only when a true min/max box provably misses a bound — the
  * prunedRead contract, now under the SQL surface. Asserted by
  * store_sql_skipping_gate: rows ≡ an unregistered scan, with the
  * scan's own numFiles metric strictly smaller.
  *
  * 100 TB shape: the box map lives on the driver (one entry per
  * file — ~1 per 128 MB, the same model-sized object Delta's
  * snapshot holds; the constructor bounds it loudly), and listing
  * does zero IO beyond the base index's.
  */
class GraftSkippingIndex(
    base: FileIndex,
    boxes: Map[String, Map[String, (Any, Any)]],
    strKey: Map[String, Boolean]) extends FileIndex {

  override def rootPaths: Seq[Path] = base.rootPaths
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = base.refresh()
  override def sizeInBytes: Long = base.sizeInBytes
  override def partitionSchema: StructType = base.partitionSchema

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pds = base.listFiles(partitionFilters, dataFilters)
    val bounds = Layout.boundsOf(dataFilters, strKey)
    if (bounds.isEmpty) pds
    else pds.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        boxes.get(Layout.normFile(f.getPath.toString)) match {
          case None => true // unindexed file: never skip
          case Some(box) => bounds.forall(b => box.get(b.column) match {
            case None => true
            case Some((mn, mx)) => Layout.boxIntersects(mn, mx, b)
          })
        }
      })
    }
  }
}

object GraftSkippingIndex {

  /** Build the skipping relation for one immutable table dir + its
    * persisted file index, and register it as a temp view so plain
    * SQL scans skip files. `maxFiles` bounds the driver-side box map
    * (loudly, through the engine's collect discipline).
    */
  def registerView(spark: SparkSession, path: String,
      index: DataFrame, viewName: String,
      maxFiles: Int = 65536): Unit = {
    val classic = spark.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession]
    val keyCols = index.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSeq
    val strKey = keyCols.map(c => c ->
      (index.schema(s"min_$c").dataType == StringType)).toMap
    val rows = ModelCollect.bounded(index, maxFiles,
      "file-index box map (too many files for driver-side " +
        "skipping — compact the table or raise maxFiles)")
    val boxes = rows.map { r =>
      Layout.normFile(r.getAs[String]("file")) -> keyCols.map { c =>
        c -> (r.getAs[Any](s"min_$c"), r.getAs[Any](s"max_$c"))
      }.toMap
    }.toMap
    val baseIdx = new InMemoryFileIndex(classic,
      Seq(new Path(path)), Map.empty, None)
    // hive-partitioned layouts: partition columns come from the DIR
    // structure, not the files — registering them as data columns
    // (or dropping them) silently loses the column from every read,
    // the same foot-gun prunedRead's basePath handling closes.
    // Partition-column predicates keep flowing through the BASE
    // index's native partition pruning (they arrive as
    // partitionFilters, not dataFilters).
    val partSchema = baseIdx.partitionSchema
    val fullSchema = classic.read.parquet(path).schema
    val dataSchema = StructType(fullSchema
      .filterNot(f => partSchema.fieldNames.contains(f.name)))
    val rel = HadoopFsRelation(
      new GraftSkippingIndex(baseIdx, boxes, strKey),
      partSchema, dataSchema, None,
      new ParquetFileFormat, Map.empty)(classic)
    org.apache.spark.sql.classic.Dataset
      .ofRows(classic, LogicalRelation(rel))
      .createOrReplaceTempView(viewName)
  }
}
