package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Int8Quantize, L2Normalize, WordShingles}

/** Catalyst integration: expose the native expressions to SQL.
  *
  *  - Cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point).
  *  - Existing session (tests, notebooks): `GraftExtensions.register(spark)`.
  *
  * SQL surface:
  *   graft_dot(array<double>, array<double>) → double  (codegen'd)
  *   graft_shingles(text, k)                → array<string>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ =>
      graft.plans.AutoBroadcastDims(graft.sources.Tables.smallDims))
    // materialized-view routing: distributive aggregations over a
    // registered base table are answered from its IVM-maintained
    // summary (AggViewCatalog, no-op while empty)
    ext.injectOptimizerRule(session => graft.plans.AggViewRewrite(session))
    // publish-time table statistics → join planning (ScanStatsCatalog,
    // no-op while empty): path-based scans of ANALYZEd tables carry
    // rowCount/sizeInBytes/column stats like metastore tables would
    ext.injectOptimizerRule(session => graft.plans.ScanStatsRule(session))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private[graft] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes 2 arguments")
        // cast to array<double> like DotProduct.column does, so SQL
        // callers can pass array<float>/array<int> and still hit the
        // packed-double fast path (DotProduct itself rejects
        // non-double arrays at analysis time)
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        DotProduct(Cast(args(0), ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)))
      }),
    ("graft_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles(text, k) takes 2 arguments")
        WordShingles(args(0), intArg(args(1), "k"))
      }),
    ("graft_l2_normalize",
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_l2_normalize(v) takes 1 argument")
        L2Normalize(castToDoubleArray(args(0)))
      }),
    ("graft_int8_quantize",
      new ExpressionInfo(classOf[Int8Quantize].getName, "graft_int8_quantize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_int8_quantize(v) takes 1 argument")
        Int8Quantize(castToDoubleArray(args(0)))
      }))

  private def castToDoubleArray(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    Cast(e, ArrayType(DoubleType))
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      GraftSqlBridge.registerFunction(spark, name, builder)
    }
}
