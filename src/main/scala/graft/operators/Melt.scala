package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unpivot: wide → EAV long format. Inverse of [[Flatten]].
  *
  * The reference's world is the already-long OpenMRS `obs` table
  * (reference README.md:10-12); melt exists so we can round-trip
  * (wide → melt → flatten = identity, SURVEY §5b) and so the DuckDB
  * oracle can verify the pivot on driver-generated data
  * (FIXTURES.md §A mapping note).
  *
  * Implementation: a single `stack(n, ...)` generator — narrow (no
  * shuffle), whole-stage codegen'd, output rows = n × input rows
  * produced partition-locally, so it scales linearly at 100 TB.
  */
object Melt {
  /** @param castTo common type every melted value column is cast to
    *               (`stack` requires homogeneous value types).
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      attrName: String = "attr",
      valueName: String = "val",
      castTo: String = "double"): DataFrame = {
    val stackArgs: Seq[Column] = valueCols.flatMap { c =>
      Seq(lit(c), col(c).cast(castTo))
    }
    val stacked = stack(
      (lit(valueCols.size) +: stackArgs): _*).as(Seq(attrName, valueName))
    df.select(idCols.map(col) :+ stacked: _*)
  }
}
