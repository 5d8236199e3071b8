package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot path.
  *
  * Why not `zip_with`+`aggregate`: Spark's higher-order functions have
  * NO `doGenCode` — they evaluate interpreted, allocating a lambda
  * frame per element. Inside a join condition (the all-pairs cosine
  * and ANN rerank paths) that interpreted eval dominated the entire
  * benchmark. This expression generates a primitive `double` loop
  * inside whole-stage codegen / generated predicates, which is the
  * preference order the engine is built on: native Expression >
  * higher-order functions > UDF (SURVEY §7.4).
  *
  * Semantics: elementwise multiply-accumulate, sequential
  * left-to-right in `double` over min(len) elements — identical
  * summation order to DuckDB's `list_dot_product`, so oracle results
  * are bit-identical to the old higher-order implementation. Array
  * elements must be non-null (embedding vectors; enforced upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Reject anything but array<double> at analysis time: eval reads
  // the packed-double array layout directly, so e.g. array<float>
  // or array<int> would silently return garbage, not throw.
  // (ExpectsInputTypes would do this declaratively but its types are
  // private[sql]; the SQL builder in GraftExtensions additionally
  // casts its args so well-typed numeric arrays still work there.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Unit-length (L2) normalization of an array<double> vector, codegen'd.
  *
  * Exists for the same reason as [[DotProduct]]: the higher-order
  * formulation `transform(v, x => x / sqrt(aggregate(...)))`
  * re-evaluates an interpreted norm for every element — O(d²)
  * interpreted work per row, which made the IVF quantizer's assign
  * step effectively single-threaded-slow. This is two primitive
  * loops inside whole-stage codegen.
  *
  * A zero vector normalizes to itself (no NaNs downstream — dot with
  * anything stays 0, which ranks it last in cosine searches).
  */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i); s += d * d; i += 1 }
    val inv = if (s == 0.0) 1.0 else 1.0 / math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) * inv; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val inv = ctx.freshName("inv")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = $a.getDouble($i); $s += d * d;
         |}
         |double $inv = ($s == 0.0) ? 1.0 : 1.0 / java.lang.Math.sqrt($s);
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = $a.getDouble($i) * $inv;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  /** Input cast to array<double> here, mirroring [[DotProduct.column]]. */
  def column(v: Column): Column =
    GraftSqlBridge.column(L2Normalize(
      GraftSqlBridge.expression(v.cast("array<double>"))))
}

/** Symmetric int8 scalar quantization of a vector, codegen'd:
  * normalize to unit length, then code_i = round(127 · x_i) — each
  * dimension lands in [-127, 127] and the stored vector shrinks 8×
  * (array<byte> vs array<double>). Cosine is scale-invariant, so
  * cosine over the quantized codes approximates cosine over the
  * originals with per-dimension error ≤ 1/254.
  *
  * This is the storage/IO half of the 100 TB ANN story: the corpus
  * index scans 8× less data; scoring casts codes back to
  * array<double> (a codegen'd Cast) and reuses [[DotProduct]].
  * Zero vectors quantize to all-zero codes.
  */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_int8_quantize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i); s += d * d; i += 1 }
    val scale = if (s == 0.0) 0.0 else 127.0 / math.sqrt(s)
    val out = new Array[Byte](n)
    i = 0
    while (i < n) { out(i) = math.round(x.getDouble(i) * scale).toByte; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val scale = ctx.freshName("scale")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = $a.getDouble($i); $s += d * d;
         |}
         |double $scale = ($s == 0.0) ? 0.0 : 127.0 / java.lang.Math.sqrt($s);
         |byte[] $arr = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (byte) java.lang.Math.round($a.getDouble($i) * $scale);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  def column(v: Column): Column =
    GraftSqlBridge.column(Int8Quantize(
      GraftSqlBridge.expression(v.cast("array<double>"))))
}

object DotProduct {
  /** Inputs are cast to array<double> here (the expression itself
    * reads doubles — no ImplicitCastInputTypes, that trait's types
    * are private[sql]).
    */
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))
}

/** Scatter (index, weight) entries into a fixed-width dense vector,
  * codegen'd: out[idx_i] = w_i over a zero array of length `n` — the
  * hashing-trick long→dense step ([[graft.operators.TextAnalysis
  * .hashEmbedDense]]).
  *
  * Why not `transform(sequence(0, n-1), b => element_at(map, b))`:
  * that form is interpreted (no HOF codegen) and `element_at` on a
  * MapData is a linear key scan, so a corpus of d-entry docs paid
  * O(n·d) per document in lambda-frame allocations (the r13 bench
  * profile put the corpus_topics sample-collect at 11 s of stage
  * time, most of it this scatter). This expression fills a primitive
  * double[] in O(d + n). Entry indexes must be unique per row (they
  * come from a groupBy on the bucket); out-of-range indexes are
  * ignored rather than thrown so a miscomputed bucket cannot kill a
  * corpus pass.
  *
  * Input: array<struct<_1: int-castable, _2: double>> (the
  * collect_list(struct(bucket, weight)) layout). Output matches the
  * old transform form byte-for-byte: absent buckets are 0.0.
  */
case class ScatterDense(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_scatter_dense"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _)
          if f0.dataType == IntegerType && f1.dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<int, double>>, got " +
          t.catalogString)
    }
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < m) {
      val r = x.getStruct(i, 2)
      val b = r.getInt(0)
      if (b >= 0 && b < n) out(b) = r.getDouble(1)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val row = ctx.freshName("row")
      val arr = ctx.freshName("arr")
      s"""
         |int $m = $a.numElements();
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  InternalRow $row = $a.getStruct($i, 2);
         |  int $b = $row.getInt(0);
         |  if ($b >= 0 && $b < $n) $arr[$b] = $row.getDouble(1);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ScatterDense =
    copy(child = newChild)
}

object ScatterDense {
  /** `entries` must be array<struct<bucket, weight>>; bucket is cast
    * to int and weight to double here (the expression reads a packed
    * (int, double) struct layout directly).
    */
  def column(entries: Column, n: Int): Column =
    GraftSqlBridge.column(ScatterDense(
      GraftSqlBridge.expression(
        entries.cast("array<struct<_1: int, _2: double>>")), n))
}
