package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expressions for the product-quantization hot path.
  *
  * Why these exist: the original formulation unrolled one
  * [[DotProduct]] PER CODEBOOK ENTRY into the plan — m·ksub = 128
  * expression subtrees per projection (plus literal correction
  * tables for the IVF-PQ variant). Each one code-generates its own
  * loop, so janino got a multi-thousand-line method per PQ plan and
  * the COMPILE time (~4-6s) dwarfed the data time at every tested
  * scale (BASELINE.md round-4 notes). These expressions generate one
  * small triple loop over the codebooks referenced as plain
  * `double[][][]` objects (`ctx.addReferenceObj`) — the generated
  * source size is now independent of m/ksub, and the runtime loop is
  * the same multiply-accumulate the JIT was already compiling.
  *
  * Arithmetic contract: BIT-IDENTICAL to the unrolled form — inner
  * dots accumulate left-to-right over min(sub, len−off) elements
  * (the [[DotProduct]] order), half-norms/corrections are
  * precomputed host-side with the same left-to-right sums the old
  * plan folded at plan time, and argmax keeps the first maximum
  * (the `array_position(scores, array_max(scores))` tie rule). The
  * PQ indexes, ADC scores, and recall gates therefore reproduce the
  * previous results exactly.
  */
object PqArithmetic {
  /** ½‖cb‖² per (subspace, code), summed left-to-right like the
    * plan-time `0.5 * cb.map(x*x).sum` literals it replaces.
    */
  def halfNorms(codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebooks.map(_.map { cb =>
      var t = 0.0
      var i = 0
      while (i < cb.length) { t += cb(i) * cb(i); i += 1 }
      0.5 * t
    })

  /** IVF-PQ correction table corr(j)(cell)(c) = c_j·cb + ½‖cb‖² —
    * the (cell, code)-only part of the residual argmax, same loop
    * order as the former plan-time literal table.
    */
  def corrections(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]]): Array[Array[Array[Double]]] = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    Array.tabulate(m) { j =>
      centroids.map { cell =>
        codebooks(j).map { cb =>
          var d = 0.0
          var i = 0
          while (i < sub && j * sub + i < cell.length) {
            d += cell(j * sub + i) * cb(i); i += 1
          }
          var t = 0.0
          i = 0
          while (i < cb.length) { t += cb(i) * cb(i); i += 1 }
          d + 0.5 * t
        }
      }
    }
  }
}

/** PQ encode: array<double> unit vector → array<int> of m codes,
  * code j = argmax over codebook j of (v_j·cb − ½‖cb‖²) (≡ argmin
  * L2). One loop expression replacing m·ksub unrolled dots.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val sub = codebooks(0)(0).length
  @transient private lazy val hn = PqArithmetic.halfNorms(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.max(0, math.min(sub, len - off))
      var best = 0.0
      var bi = 0
      var c = 0
      while (c < ksub) {
        val cb = codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < n) { s += vec.getDouble(off + i) * cb(i); i += 1 }
        val sc = s - hn(j)(c)
        if (c == 0 || sc > best) { best = sc; bi = c }
        c += 1
      }
      codes(j) = bi
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val hns = ctx.addReferenceObj("pqHalfNorms", hn, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val len = ctx.freshName("len")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val s = ctx.freshName("s")
      val sc = ctx.freshName("sc")
      val cb = ctx.freshName("cb")
      s"""
         |int $len = $a.numElements();
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  int $n = java.lang.Math.max(0, java.lang.Math.min($sub, $len - $off));
         |  double $best = 0.0; int $bi = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cb = $cbs[$j][$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($off + $i) * $cb[$i]; }
         |    double $sc = $s - $hns[$j][$c];
         |    if ($c == 0 || $sc > $best) { $best = $sc; $bi = $c; }
         |  }
         |  $codes[$j] = $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def column(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(
      GraftSqlBridge.expression(v.cast("array<double>")), codebooks))
}

/** IVF-PQ residual encode: (unit vector, cell id) → array<int> of m
  * codes, code j = argmax(v_j·cb − corr(j, cid, cb)) with the
  * correction table from [[PqArithmetic.corrections]]. Replaces the
  * m·ksub unrolled dots PLUS the per-subspace literal corr tables.
  */
case class IvfPqEncode(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]],
    corr: Array[Array[Array[Double]]]) extends BinaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val sub = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivfpq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cid = b.asInstanceOf[Int]
    val len = vec.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.max(0, math.min(sub, len - off))
      var best = 0.0
      var bi = 0
      var c = 0
      while (c < ksub) {
        val cb = codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < n) { s += vec.getDouble(off + i) * cb(i); i += 1 }
        val sc = s - corr(j)(cid)(c)
        if (c == 0 || sc > best) { best = sc; bi = c }
        c += 1
      }
      codes(j) = bi
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("ivfpqCodebooks", codebooks, "double[][][]")
    val cors = ctx.addReferenceObj("ivfpqCorr", corr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val codes = ctx.freshName("codes")
      val len = ctx.freshName("len")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val s = ctx.freshName("s")
      val sc = ctx.freshName("sc")
      val cb = ctx.freshName("cb")
      s"""
         |int $len = $a.numElements();
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  int $n = java.lang.Math.max(0, java.lang.Math.min($sub, $len - $off));
         |  double $best = 0.0; int $bi = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cb = $cbs[$j][$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($off + $i) * $cb[$i]; }
         |    double $sc = $s - $cors[$j][$b][$c];
         |    if ($c == 0 || $sc > $best) { $best = $sc; $bi = $c; }
         |  }
         |  $codes[$j] = $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfPqEncode =
    copy(left = newLeft, right = newRight)
}

object IvfPqEncode {
  def column(v: Column, cid: Column,
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(IvfPqEncode(
      GraftSqlBridge.expression(v.cast("array<double>")),
      GraftSqlBridge.expression(cid.cast("int")),
      codebooks, PqArithmetic.corrections(codebooks, centroids)))
}

/** ADC table: array<double> unit query vector → array<double> of
  * m·ksub subspace dots (entry j·ksub+c = q_j·cb_jc), one row per
  * query. Replaces the m·ksub unrolled dots of the former `qtab`.
  */
case class AdcTable(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val sub = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_adc_table"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.max(0, math.min(sub, len - off))
      var c = 0
      while (c < ksub) {
        val cb = codebooks(j)(c)
        var s = 0.0
        var i = 0
        while (i < n) { s += vec.getDouble(off + i) * cb(i); i += 1 }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("adcCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val len = ctx.freshName("len")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val cb = ctx.freshName("cb")
      s"""
         |int $len = $a.numElements();
         |double[] $out = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  int $n = java.lang.Math.max(0, java.lang.Math.min($sub, $len - $off));
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cb = $cbs[$j][$c];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($off + $i) * $cb[$i]; }
         |    $out[$j * $ksub + $c] = $s;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)
}

object AdcTable {
  def column(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(AdcTable(
      GraftSqlBridge.expression(v.cast("array<double>")), codebooks))
}

/** Full-vector dots against a k×dim centroid matrix: array<double>
  * vector → array<double> of k dots (entry c = v·centroid_c, each
  * accumulated left-to-right over min(len) elements — the
  * [[DotProduct]] order). Replaces the k unrolled dots the IVF
  * family's nearest-centroid / probe-selection projections carried.
  */
case class CentroidDots(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  private val k = centroids.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val len = vec.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = centroids(c)
      val n = math.min(len, ct.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * ct(i); i += 1 }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cts = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val len = ctx.freshName("len")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ct = ctx.freshName("ct")
      s"""
         |int $len = $a.numElements();
         |double[] $out = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $ct = $cts[$c];
         |  int $n = java.lang.Math.min($len, $ct.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $ct[$i]; }
         |  $out[$c] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDots =
    copy(child = newChild)
}

object CentroidDots {
  def column(v: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(CentroidDots(
      GraftSqlBridge.expression(v.cast("array<double>")), centroids))
}

/** Sign-bit LSH bucket: array<double> vector → long whose bit b is
  * set iff v·plane_b > 0 (each dot accumulated left-to-right over
  * min(len) elements — the [[DotProduct]] order, so buckets equal
  * the former unrolled per-plane formulation bit-for-bit). One loop
  * over the plane matrix as a reference object, replacing nBits
  * unrolled dot subtrees per table in every LSH plan.
  */
case class SignBits(child: Expression,
    planes: Array[Array[Double]]) extends UnaryExpression {

  private val k = planes.length

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val len = vec.numElements()
    var bits = 0L
    var b = 0
    while (b < k) {
      val p = planes(b)
      val n = math.min(len, p.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * p(i); i += 1 }
      if (s > 0) bits |= (1L << b)
      b += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val bits = ctx.freshName("bits")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      s"""
         |int $len = $a.numElements();
         |long $bits = 0L;
         |for (int $b = 0; $b < $k; $b++) {
         |  double[] $p = $ps[$b];
         |  int $n = java.lang.Math.min($len, $p.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $p[$i]; }
         |  if ($s > 0) $bits |= (1L << $b);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {
  def column(v: Column, planes: Array[Array[Double]]): Column =
    GraftSqlBridge.column(SignBits(
      GraftSqlBridge.expression(v.cast("array<double>")), planes))
}
