package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership probe: `filter.mightContain(child)` as a
  * codegen'd boolean expression.
  *
  * Replaces the Scala UDF probe that was the one non-codegen hop in
  * the engine's join family (Spark's own BloomFilterMightContain is
  * private to its runtime-filter rule). A UDF costs per-row boxing +
  * an interpreted call and, worse, BREAKS the whole-stage-codegen
  * span it sits in, forcing a row-format boundary around the scan it
  * filters; this expression stays inside the generated loop. The
  * sketch rides in the expression tree (task binaries are broadcast
  * once per stage, so executors receive it once, not per task).
  *
  * Accepts long/int (hashed as the long value, matching
  * `BloomFilter.putLong`) and string (UTF-8 bytes, matching
  * `putString`'s encoding) keys — the same key domain
  * [[graft.operators.BloomJoin]] builds sketches over.
  */
case class BloomProbe(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a long/int/string key, got ${t.catalogString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(input.asInstanceOf[Int].toLong)
    case StringType =>
      filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType | IntegerType =>
        s"${ev.value} = $ref.mightContainLong((long) $v);"
      case StringType =>
        s"${ev.value} = $ref.mightContainBinary($v.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  def column(key: Column, filter: BloomFilter): Column =
    GraftSqlBridge.column(BloomProbe(GraftSqlBridge.expression(key), filter))
}

/** [[BloomProbe]]'s inverse orientation: the SKETCH is column data
  * (one serialized bloom per row — the per-file bloom index shape,
  * [[graft.operators.Layout.bloomIndex]]) and the probe values are
  * the literal. True when ANY probe value might be contained.
  *
  * Deliberately interpreted (CodegenFallback): the input is an INDEX
  * table — one row per data FILE, never per data row — so the
  * per-row filter deserialization is file-count-sized work; codegen
  * would buy nothing and cost a generated-code path to maintain. One
  * deserialization per row probes ALL values.
  */
case class BloomContainsAny(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_any"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary bloom, array<bigint> probes), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  }

  override protected def nullSafeEval(bloom: Any, values: Any): Any = {
    val bf = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
    values.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().exists(bf.mightContainLong)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsAny =
    copy(left = newLeft, right = newRight)
}

object BloomContainsAny {
  def column(bloom: Column, values: Column): Column =
    GraftSqlBridge.column(BloomContainsAny(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(values)))
}
