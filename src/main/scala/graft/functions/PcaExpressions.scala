package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Affine map of a vector: array<double> x → mat·x + offset, with the
  * k×d matrix and k-vector offset as plain reference objects (the
  * [[AdcTable]] pattern — generated source size independent of k·d).
  *
  * This is the PCA projection hot path: with mat = Vₖ (principal
  * axes as rows) and offset = −Vₖ·mean it computes Vₖ·(x − mean) in
  * one narrow codegen'd loop per row — no centering pre-pass ever
  * materializes. Also the reconstruction path (mat = Vₖᵀ as a d×k
  * matrix, offset = mean). Inner dots accumulate left-to-right over
  * min(d, len) elements, the [[DotProduct]] order.
  */
case class AffineTransform(child: Expression,
    mat: Array[Array[Double]], offset: Array[Double]) extends UnaryExpression {

  private val k = mat.length
  private val d = if (k == 0) 0 else mat(0).length
  require(offset.length == k,
    s"offset length ${offset.length} must equal matrix rows $k")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_affine"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val n = math.min(d, vec.numElements())
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      val row = mat(r)
      var s = offset(r)
      var i = 0
      while (i < n) { s += row(i) * vec.getDouble(i); i += 1 }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("affineMat", mat, "double[][]")
    val offRef = ctx.addReferenceObj("affineOffset", offset, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |int $n = java.lang.Math.min($d, $a.numElements());
         |double[] $out = new double[$k];
         |for (int $r = 0; $r < $k; $r++) {
         |  double[] $row = $matRef[$r];
         |  double $s = $offRef[$r];
         |  for (int $i = 0; $i < $n; $i++) { $s += $row[$i] * $a.getDouble($i); }
         |  $out[$r] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineTransform =
    copy(child = newChild)
}

object AffineTransform {
  def column(v: Column, mat: Array[Array[Double]], offset: Array[Double]): Column =
    GraftSqlBridge.column(AffineTransform(
      GraftSqlBridge.expression(v.cast("array<double>")), mat, offset))
}
