package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Line-oriented CSV ingest with corrupt-record quarantine — the
  * tabular sibling of [[JsonLines]] (metadata drops, label exports,
  * and vendor deliveries arrive as `*.csv` / `*.csv.gz` as often as
  * crawl text arrives as jsonl). Same contract: every non-blank line
  * lands in exactly one of (parsed rows, quarantine), the quarantine
  * keeps the raw line + source file for re-ingest after a parser fix,
  * and the schema is MANDATORY (inference would scan the corpus twice
  * and lock in the first sample's guess).
  *
  * Spark-first mechanics mirror [[JsonLines]]: `spark.read.text`
  * (splittable) + `from_csv` in PERMISSIVE mode with a corrupt-record
  * field — not the DataFrame CSV source, whose corrupt-column-only
  * projection hits the same `referenceColumns` analysis guard as the
  * JSON one. Scope: LINE-ORIENTED csv (one record per line, quoted
  * fields without embedded newlines). Records with embedded newlines
  * need the file-level reader's multiLine mode, which is not
  * splittable — at ingest scale that trade should be made explicitly
  * by the caller, not silently here; [[write]] therefore refuses
  * string columns carrying newlines instead of emitting records the
  * reader would mis-split.
  */
object CsvLines {

  val CorruptCol: String = JsonLines.CorruptCol

  private def parsed(schema: StructType): Column =
    from_csv(col("value"),
      schema.add(StructField(CorruptCol, StringType, nullable = true)),
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol))

  /** Raw lines with the parse attached: (value, src_file, data). */
  def readRaw(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), input_file_name().as("src_file"),
        parsed(schema).as("data"))
  }

  private def isClean: Column =
    col("data").isNotNull && col(s"data.$CorruptCol").isNull

  /** The clean rows of `path` (schema columns only, positional —
    * CSV has no field names, so the schema's field ORDER is the
    * column order of the file).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readRaw(spark, path, schema)
      .filter(isClean)
      .select(schema.fieldNames.map(f => col(s"data.$f").as(f)).toIndexedSeq: _*)

  /** The malformed lines of `path`: (raw, src_file). */
  def quarantine(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    readRaw(spark, path, schema)
      .filter(!isClean)
      .select(col("value").as("raw"), col("src_file"))

  /** Export as line-oriented CSV (no header; read back with the same
    * schema order). Refuses string columns containing newlines — such
    * a record would be quoted across lines by the csv writer and then
    * mis-split by every line-oriented reader, including [[read]].
    */
  def write(df: DataFrame, path: String): Unit = {
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq
    if (stringCols.nonEmpty) {
      // ONE pass, short-circuited by limit(1): per-column flags so the
      // failure names the offending columns without a rescan
      val flagged = df.filter(stringCols.map(c =>
          col(c).contains("\n") || col(c).contains("\r"))
        .reduce(_ || _)).limit(1)
        .select(stringCols.map(c =>
          coalesce(col(c).contains("\n") || col(c).contains("\r"),
            lit(false)).as(c)): _*)
        .collect() // collect-bound: limit(1) — structurally <= 1 row
      val offenders = flagged.headOption.toSeq.flatMap(r =>
        stringCols.filter(c => r.getAs[Boolean](c)))
      require(offenders.isEmpty,
        s"CsvLines.write: embedded newlines in ${offenders.mkString(", ")} — " +
          "line-oriented CSV cannot carry them; use parquet or jsonl")
    }
    df.write.mode("overwrite").option("header", "false").csv(path)
  }
}
