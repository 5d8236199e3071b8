package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on MULTIPLE
  * dimensions at once so parquet min/max pruning serves predicates on
  * ANY of them — the locality tool Delta/Iceberg expose that plain
  * Spark lacks. Linear sort gives one dimension perfect locality and
  * the others none (a file's bounding box spans the full range of
  * every non-leading column); interleaving the bits of quantized
  * dimension ranks gives every file a tight multi-dimensional
  * bounding box, so a scan with a predicate on the SECOND dimension
  * still skips most files.
  *
  * 100 TB shape: one range exchange on the z-value (the same cost as
  * any sorted write) + a within-partition sort; the quantization
  * bounds are a single 2-scalar-per-dimension aggregate collected to
  * the driver and shipped as plan literals. Everything downstream is
  * codegen'd integer bit arithmetic — no UDFs.
  *
  * Engine-reproducible by construction: quantization is one fixed
  * IEEE expression shape (`(v − min) / (max − min) * cells`, floored,
  * clamped), so an external SQL oracle replaying the same formula on
  * the same doubles lands on the same bucket — asserted end-to-end by
  * the layout_zorder driver query.
  */
object Layout {

  /** Inclusive numeric bounds of one z-order dimension (driver-side
    * scalars, model-sized).
    */
  final case class Dim(name: String, min: Double, max: Double)

  /** One aggregate pass collecting min/max per dimension. An empty
    * table or all-NULL column yields the degenerate Dim (0, 0) —
    * [[quantize]] sends everything (but NULL) to bucket 0, so the
    * write still succeeds instead of crashing the maintenance op.
    */
  def stats(df: DataFrame, cols: Seq[String]): Seq[Dim] = {
    require(cols.nonEmpty, "need at least one z-order column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      if (r.isNullAt(2 * i)) Dim(c, 0.0, 0.0)
      else Dim(c, r.getDouble(2 * i), r.getDouble(2 * i + 1)) }
  }

  /** Bucket of `v` in [0, 2^bits): floor((v − min) / span * cells),
    * clamped (v = max lands in the top cell; out-of-bounds values
    * clamp rather than wrap). A zero-width dimension degenerates to
    * bucket 0. NULL stays NULL (sorts together under the range
    * partitioner).
    */
  def quantize(v: Column, dim: Dim, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    val cells = 1L << bits
    // greatest/least SKIP nulls (greatest(NULL, 0) = 0), so the
    // clamp must sit behind an explicit null gate or NULL would
    // silently land in the minimum cell
    if (dim.max <= dim.min) when(v.isNull, lit(null)).otherwise(lit(0L))
    else when(v.isNull, lit(null)).otherwise(least(greatest(
      floor((v.cast("double") - lit(dim.min)) / lit(dim.max - dim.min)
        * lit(cells.toDouble)).cast("long"),
      lit(0L)), lit(cells - 1)))
  }

  /** Morton interleave of pre-quantized bucket columns: bit `b` of
    * dimension `i` lands at position `b * n + i`. Disjoint bit
    * positions, so the combine is a pure OR chain — `n * bits`
    * codegen'd shift/mask terms, well under the 64-bit budget
    * (`require`d).
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1, "need at least one bucket column")
    require(n * bits <= 63, s"n*bits must fit a long, got ${n * bits}")
    val terms = for {
      (c, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** `df` plus a z-value column (default name `zval`) over `cols`
    * (driver collects the bounds; one extra aggregate job). Callers
    * whose data may carry a column of the same name pass their own
    * `zCol` — `withColumn` would silently REPLACE it.
    */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int,
      zCol: String = "zval"): DataFrame = {
    require(!df.columns.contains(zCol),
      s"z-value column name '$zCol' collides with a data column")
    val dims = stats(df, cols)
    df.withColumn(zCol,
      zValue(dims.map(d => quantize(col(d.name), d, bits)), bits))
  }

  /** Write `df` z-ordered on `cols` into `numFiles` range-partitioned,
    * internally sorted files: every file owns a contiguous z-range =
    * a tight multi-dim bounding box for min/max pruning. Partitioned
    * tables keep their directory layout: ranges run over (partition
    * cols, z), so each task writes whole dirs with a contiguous
    * z-range inside each. The internal z column name is
    * collision-proof against user data.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val zc = "__graft_zval"
    val keys = partitionBy.map(col) :+ col(zc)
    val w = zorder(df, cols, bits, zc)
      .repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop(zc)
      .write.mode("overwrite").format("parquet")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .save(path)
  }

  /** An inclusive range predicate `lo <= col <= hi` for
    * [[prunedRead]]. NULL rows never match a range, so files whose
    * indexed column is entirely NULL are safe to skip. [[Range]] is
    * the numeric form (bounds compare against the index's double
    * min/max); [[StrRange]] the lexicographic STRING form — date
    * strings (`yyyy-MM-dd`) and id prefixes order lexicographically
    * exactly as their values do, which is what makes string zone
    * maps pay at 100 TB.
    */
  sealed trait Band { def column: String }
  final case class Range(column: String, lo: Double, hi: Double)
      extends Band
  final case class StrRange(column: String, lo: String, hi: String)
      extends Band

  /** Per-file min/max index over `cols` — the read-side half of the
    * layout story: [[zorderWrite]] gives every file a tight
    * multi-dimensional bounding box, and this table records the boxes
    * so [[prunedRead]] can skip whole files WITHOUT opening them
    * (parquet's own footer pruning still opens every footer; at
    * ~800k footer reads per 100 TB, an external index is the
    * difference between a metadata storm and one small-table filter —
    * the same design as Delta/Iceberg file statistics).
    *
    * One distributed scan of the indexed columns only (schema
    * pruning keeps it narrow); output is one row per file
    * (`file`, `n_rows`, `min_<c>`/`max_<c>` per dimension) — ~1 row
    * per 128 MB of data, which a caller persists next to the table
    * and maintains incrementally on append (new files ⇒ new rows:
    * an append-only index; rewrites re-scan the rewritten files
    * only). min/max skip NULLs, so an all-NULL file indexes as
    * (NULL, NULL) and is pruned by every range — correct, because
    * NULL never satisfies a range predicate.
    */
  def fileIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one indexed column")
    val schema = spark.read.parquet(path).schema
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(boxAggs(schema, cols).head, boxAggs(schema, cols).tail: _*)
  }

  /** The per-file bounding-box aggregates [[fileIndex]] and
    * [[fileIndexDelta]] share (delta ≡ rebuild needs ONE definition):
    * numeric/temporal columns keep the historical double box; STRING
    * columns index natively — lexicographic min/max is the sound box
    * for a string range, and a double cast would null it.
    */
  private def boxAggs(schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val native = schema(c).dataType ==
        org.apache.spark.sql.types.StringType
      val keyed = if (native) col(c) else col(c).cast("double")
      Seq(min(keyed).as(s"min_$c"), max(keyed).as(s"max_$c"))
    }

  /** Read only the files whose bounding box intersects EVERY range —
    * file-level data skipping driven by a [[fileIndex]] table. The
    * survival filter runs distributed over the index; only the
    * surviving paths come to the driver, through
    * [[ModelCollect.bounded]] with a caller-set ceiling (`maxFiles`).
    * A selective predicate over a [[zorderWrite]] layout survives a
    * handful of files even on a second or third z-dimension — that is
    * the point of the curve; if more than `maxFiles` survive, the
    * predicate was not selective enough for skipping to pay, and the
    * caller should fall back to the plain filtered scan (the failure
    * message says exactly that) rather than ship a giant file list
    * into one scan node.
    *
    * Correctness does not depend on the index being tight — only on
    * it being SOUND (true min/max per file): the residual range
    * filter is re-applied to the surviving rows, so the result is
    * row-identical to the full filtered scan. Asserted end-to-end by
    * the layout_skip driver query (hash vs a full-scan oracle) and
    * the layout_skip_gate non-vacuity/superiority gate.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      index: DataFrame, ranges: Seq[Band],
      maxFiles: Int = 65536): DataFrame = {
    require(ranges.nonEmpty, "need at least one range predicate")
    def bounds(b: Band): (Column, Column) = b match {
      case Range(_, lo, hi)    => (lit(lo), lit(hi))
      case StrRange(_, lo, hi) => (lit(lo), lit(hi))
    }
    val survive = ranges.map { r =>
      val (lo, hi) = bounds(r)
      col(s"max_${r.column}") >= lo && col(s"min_${r.column}") <= hi
    }.reduce(_ && _)
    val files = ModelCollect.bounded(
        index.filter(survive).select(col("file")), maxFiles,
        "surviving file list (predicate too broad for file skipping — " +
          "fall back to the plain filtered scan)")
      .map(_.getString(0))
    val residual = ranges.map { r =>
      val (lo, hi) = bounds(r)
      col(r.column) >= lo && col(r.column) <= hi
    }.reduce(_ && _)
    val base = spark.read.parquet(path)
    if (files.isEmpty) base.filter(lit(false))
    // basePath keeps partition-directory columns alive when reading
    // an explicit file list — without it a partitioned table's
    // partition values silently vanish from the pruned read
    else spark.read.option("basePath", path).schema(base.schema)
      .parquet(files: _*).filter(residual)
  }

  /** One extracted skipping bound: an inclusive lo/hi pair (either
    * side open) against one indexed column, in the index's own key
    * space (double for numeric dimensions, native for strings).
    */
  /** Bound values are driver-side scalars in the index's keyspace —
    * java.lang.Double for numeric dimensions, String for native
    * string dimensions — so the same extraction serves both the
    * DataFrame pruning path ([[autoPruneFiles]] lifts them to
    * literals) and the FileIndex listing path (driver-side box
    * evaluation with no Spark job at all).
    */
  final case class Bound(column: String,
      lo: Option[Any], hi: Option[Any])

  /** Does a file's [mn, mx] box (nullable — an all-NULL file indexes
    * as (null, null) and never satisfies a range) intersect `b`?
    * Mixed-type boxes never match a wrong-typed bound — conservative
    * would be WRONG here (a dropped check would widen, fine, but a
    * mistyped comparison could exclude) so the types must line up by
    * construction: bounds were built against this index's keyspace.
    */
  def boxIntersects(mn: Any, mx: Any,
      b: Bound): Boolean = {
    if (mn == null || mx == null) return false
    // these driver-side comparisons MUST mirror Spark's executor
    // ordering — in the FileIndex listing path a wrong exclusion is
    // silent row loss:
    //  - doubles: NaN is GREATEST and -0.0 == 0.0 (Spark's
    //    nanSafeCompareDoubles); raw Java >= gets NaN wrong (a file
    //    whose max is NaN because it HOLDS NaN rows would fail every
    //    lo-bound), raw Double.compare gets +-0 wrong;
    //  - strings: UTF8String binary order; Java UTF-16 code-unit
    //    order disagrees above the surrogate range (supplementary
    //    chars sort below U+E000..U+FFFF in UTF-16 but above
    //    everything in UTF-8).
    def dge(a: Double, x: Double): Boolean =
      if (a.isNaN) true
      else if (x.isNaN) false
      else a >= x
    def u8(s: String) =
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def ge(a: Any, x: Any): Boolean = (a, x) match {
      case (a: java.lang.Double, x: java.lang.Double) =>
        dge(a.doubleValue, x.doubleValue)
      case (a: String, x: String) => u8(a).compareTo(u8(x)) >= 0
      case _ => true // type drift: no exclusion without a sound compare
    }
    b.lo.forall(x => ge(mx, x)) && b.hi.forall(x => ge(x, mn))
  }

  /** Derive sound file-skipping bounds from an ARBITRARY predicate —
    * the step that turns the explicit [[prunedRead]] band API into
    * what Delta's data skipping does: the caller writes a normal
    * `WHERE`, and the engine extracts whatever min/max bounds the
    * predicate implies. Extraction rules, all CONSERVATIVE:
    *
    *  - the predicate splits on top-level AND only; each conjunct
    *    that is `col <op> literal` (or flipped) with op ∈
    *    {=, <, <=, >, >=} over an INDEXED column contributes a bound
    *    (strict ops widen to inclusive — file min/max cannot witness
    *    strictness);
    *  - everything else (OR trees, function calls, IN, columns not
    *    in the index, non-numeric/non-string literals, NULL
    *    literals) contributes NOTHING — dropping a conjunct only
    *    enlarges the surviving file set, never shrinks it;
    *  - numeric bounds compare in the index's double key space
    *    (the literal casts the way [[boxAggs]] cast the data);
    *    string bounds compare natively.
    *
    * Correctness therefore never depends on extraction coverage: the
    * FULL original predicate re-applies to surviving rows in
    * [[autoPrunedRead]], so a predicate the extractor understands
    * nothing of degrades to the plain filtered scan — row-identical,
    * just unpruned. Pinned end-to-end by layout_autoskip (hash vs a
    * full-scan oracle) and layout_autoskip_gate (residual-correct
    * with an unextractable conjunct, one-sided bounds prune,
    * extraction-free predicates skip nothing falsely).
    */
  private[graft] def extractBounds(index: DataFrame,
      data: DataFrame, predicate: Column): Seq[Bound] = {
    import org.apache.spark.sql.catalyst.plans.logical
    // Spark 4's Column builds UNRESOLVED nodes (`fn(">=")`), so the
    // extractor matches the ANALYZED filter condition instead: real
    // comparison classes, names resolved, type coercion applied.
    // Coercion wraps literals in foldable casts (folded here by
    // eval) and may wrap the ATTRIBUTE side instead — which simply
    // yields no bound, the conservative direction.
    val cond = data.filter(predicate).queryExecution.analyzed
      .collectFirst { case f: logical.Filter => f.condition }
      .getOrElse(return Seq.empty)
    val strKey = index.columns.filter(_.startsWith("min_"))
      .map(c => c.stripPrefix("min_") ->
        (index.schema(c).dataType ==
          org.apache.spark.sql.types.StringType)).toMap
    boundsOf(Seq(cond), strKey)
  }

  /** The shared bound extractor over RESOLVED conjuncts — also the
    * entry point for the FileIndex listing path, whose `dataFilters`
    * arrive exactly in this form. `strKey` maps each indexed column
    * to its keyspace (true = native string, false = double).
    */
  def boundsOf(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      strKey: Map[String, Boolean]): Seq[Bound] = {
    import org.apache.spark.sql.catalyst.expressions._
    def attr(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def keyLit(c: String, e: Expression): Option[Any] = {
      if (!e.foldable) return None
      // ANSI can make a coercion cast THROW at fold time (e.g.
      // 'x' cast to bigint inside an IN list) — an unconvertible
      // literal is "no bound", never a crash
      val v = try e.eval(
        org.apache.spark.sql.catalyst.InternalRow.empty)
      catch { case _: Exception => return None }
      if (v == null) return None
      (v, e.dataType) match {
        case (u: org.apache.spark.unsafe.types.UTF8String, _)
          if strKey(c) => Some(u.toString)
        case (_, _: org.apache.spark.sql.types.NumericType)
          if !strKey(c) =>
          // widen the way boxAggs' cast does, NOT via decimal string
          // parsing: "1.1f".toString.toDouble = 1.1000000000000001d
          // while cast(1.1f as double) = 1.100000023841858d — a bound
          // built from the former EXCLUDES the file holding exactly
          // the latter (silent row loss on float equality)
          v match {
            case dec: org.apache.spark.sql.types.Decimal =>
              Some(Double.box(dec.toDouble))
            case n: java.lang.Number =>
              Some(Double.box(n.doubleValue))
            case _ => None
          }
        case _ => None // type/keyspace mismatch: no bound, sound
      }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // envelope order must match the executor's (UTF8 binary for
    // strings — see boxIntersects) or a driver-picked envelope could
    // exclude a listed value on supplementary characters
    def u8le(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(
          org.apache.spark.unsafe.types.UTF8String.fromString(b)) <= 0
    // NaN is GREATEST in Spark's ordering — math.min would pick NaN
    // as the envelope's LOW bound for `f IN (5.0, double('NaN'))`
    // and exclude the files holding 5.0
    def vMin(a: Any, b: Any): Any = (a, b) match {
      case (a: java.lang.Double, b: java.lang.Double) =>
        if (a.isNaN) b else if (b.isNaN) a
        else Double.box(math.min(a, b))
      case (a: String, b: String) => if (u8le(a, b)) a else b
      case _ => a
    }
    def vMax(a: Any, b: Any): Any = (a, b) match {
      case (a: java.lang.Double, b: java.lang.Double) =>
        if (a.isNaN) a else if (b.isNaN) b
        else Double.box(math.max(a, b))
      case (a: String, b: String) => if (u8le(b, a)) a else b
      case _ => a
    }
    exprs.flatMap(conjuncts).flatMap {
      case cmp: BinaryComparison if !cmp.isInstanceOf[EqualNullSafe] =>
        val (c, v, flip) = (attr(cmp.left), attr(cmp.right)) match {
          case (Some(a), None) if strKey.contains(a) =>
            (Some(a), keyLit(a, cmp.right), false)
          case (None, Some(a)) if strKey.contains(a) =>
            (Some(a), keyLit(a, cmp.left), true)
          case _ => (None, None, false)
        }
        (c, v) match {
          case (Some(a), Some(k)) => cmp match {
            case _: EqualTo => Some(Bound(a, Some(k), Some(k)))
            case _: GreaterThan | _: GreaterThanOrEqual =>
              if (!flip) Some(Bound(a, Some(k), None))
              else Some(Bound(a, None, Some(k)))
            case _: LessThan | _: LessThanOrEqual =>
              if (!flip) Some(Bound(a, None, Some(k)))
              else Some(Bound(a, Some(k), None))
            case _ => None
          }
          case _ => None
        }
      // IN-list: sound as the [min, max] envelope of the list — a
      // file whose box misses the envelope can hold no listed value.
      // Every element must convert in the index's keyspace, else the
      // conjunct contributes nothing (one unconvertible element could
      // lie outside the partial envelope).
      case In(a, list) if attr(a).exists(strKey.contains) &&
          list.nonEmpty =>
        val c = attr(a).get
        val ks = list.map(keyLit(c, _))
        if (ks.exists(_.isEmpty)) None
        else Some(Bound(c,
          Some(ks.flatten.reduce(vMin)),
          Some(ks.flatten.reduce(vMax))))
      // prefix LIKE over a native-string dimension — THE report
      // predicate over date strings (`d LIKE '2024-07%'`). Sound as
      // [prefix, successor(prefix)): every prefix-matching string is
      // >= the prefix and < the prefix with its last char incremented
      // (U+FFFF tails drop the hi side rather than guess). The
      // analyzed plan carries Like; the optimized plan (the
      // FileIndex's dataFilters) rewrites it to StartsWith — match
      // both so the API and SQL paths prune identically.
      // a custom ESCAPE char changes what the pattern body MEANS
      // ('ab##cd%' ESCAPE '#' matches literal 'ab#cd…') — extracting
      // the raw body as a prefix would prune files holding matching
      // rows, so only the default escape is understood
      case like: Like if attr(like.left).exists(c =>
          strKey.get(c).contains(true)) && like.right.foldable &&
          like.escapeChar == '\\' =>
        val c = attr(like.left).get
        Option(like.right.eval(
          org.apache.spark.sql.catalyst.InternalRow.empty))
          .map(_.toString)
          .filter(p => p.endsWith("%") &&
            !p.dropRight(1).exists("%_\\".contains(_)))
          .map(_.dropRight(1))
          .flatMap(prefixBound(c, _))
      case sw: StartsWith if attr(sw.left).exists(c =>
          strKey.get(c).contains(true)) && sw.right.foldable =>
        val c = attr(sw.left).get
        Option(sw.right.eval(
          org.apache.spark.sql.catalyst.InternalRow.empty))
          .map(_.toString).flatMap(prefixBound(c, _))
      case _ => None
    }
  }

  /** [prefix, successor(prefix)] bound for prefix-matching strings:
    * lo = the prefix itself, hi = the prefix truncated after its last
    * char below the surrogate range with that char incremented (an
    * EXCLUSIVE successor used inclusively — wider, so sound). A
    * prefix with no such char keeps only the lo side; an empty
    * prefix yields nothing.
    */
  private def prefixBound(c: String, p: String): Option[Bound] = {
    if (p.isEmpty) return None
    // increment only a char BELOW the surrogate range: down there
    // UTF-16 code-unit, code-point, and UTF-8 byte order all agree,
    // so the successor upper-bounds every p-prefixed string under
    // BOTH the driver's comparison and the executor's UTF8String
    // order; incrementing into/past a surrogate could build a string
    // whose UTF-8 order disagrees (or isn't valid UTF-16) \u2014 drop the
    // hi side there instead (wider, sound)
    val cut = p.lastIndexWhere(ch => ch < 0xD7FF.toChar)
    val hi = if (cut < 0) None
    else Some(p.substring(0, cut) + (p.charAt(cut) + 1).toChar)
    Some(Bound(c, Some(p), hi))
  }

  /** The surviving file list for [[autoPrunedRead]]'s predicate —
    * exposed separately (like [[bloomProbeFiles]]) so callers and
    * gates can SEE the skipping. Returns None when the predicate
    * yields no usable bounds (nothing extractable over indexed
    * columns): the caller must fall back to the plain filtered scan
    * rather than mistake "no extraction" for "no surviving files".
    */
  def autoPruneFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, predicate: Column,
      maxFiles: Int = 65536): Option[Seq[String]] =
    autoPruneFilesOf(spark.read.parquet(path), index, predicate,
      maxFiles)

  private[graft] def autoPruneFilesOf(base: DataFrame,
      index: DataFrame, predicate: Column,
      maxFiles: Int): Option[Seq[String]] = {
    val bounds = extractBounds(index, base, predicate)
    if (bounds.isEmpty) None
    else {
      val survive = bounds.map { b =>
        val loOk = b.lo.map(col(s"max_${b.column}") >= _)
          .getOrElse(lit(true))
        val hiOk = b.hi.map(col(s"min_${b.column}") <= _)
          .getOrElse(lit(true))
        loOk && hiOk
      }.reduce(_ && _)
      Some(ModelCollect.bounded(
          index.filter(survive).select(col("file")), maxFiles,
          "surviving file list (predicate too broad for file " +
            "skipping — fall back to the plain filtered scan)")
        .map(_.getString(0)))
    }
  }

  /** Predicate-driven data skipping: a plain `WHERE`-shaped Column
    * answers through the file index with no band plumbing — bounds
    * are extracted by [[extractBounds]], files pruned, and the FULL
    * original predicate re-applied to the survivors, so the result
    * is row-identical to `spark.read.parquet(path).filter(predicate)`
    * whatever the extractor managed to understand. The 100 TB story
    * is [[prunedRead]]'s (the index replaces ~800k footer reads with
    * one small-table filter); this entry point makes it the DEFAULT
    * read path for filtered scans instead of an expert API.
    */
  def autoPrunedRead(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, predicate: Column,
      maxFiles: Int = 65536): DataFrame = {
    // one schema inference for the whole call: the base frame feeds
    // predicate resolution, the fallback read, and the survivors'
    // explicit schema — at ~800k files a second listing is real money
    val base = spark.read.parquet(path)
    autoPruneFilesOf(base, index, predicate, maxFiles) match {
      case None => base.filter(predicate)
      case Some(Seq()) => base.filter(lit(false))
      case Some(files) =>
        spark.read.option("basePath", path).schema(base.schema)
          .parquet(files: _*).filter(predicate)
    }
  }

  /** Hilbert-curve index over two pre-quantized bucket columns — the
    * stronger sibling of [[zValue]] for 2-dimensional clustering
    * (the same trade Delta's liquid clustering makes): the Hilbert
    * curve visits every cell of the 2^bits × 2^bits grid through
    * ADJACENT cells only, so consecutive index ranges are compact
    * blobs rather than Morton's corner-jumping Z shapes — file
    * bounding boxes come out tighter on both dimensions for the same
    * file count. Morton stays the choice for 3+ dimensions (cheap
    * interleave at any d); Hilbert's advantage is greatest exactly at
    * d = 2, where most layout keys live (time × entity).
    *
    * Implementation: the classic per-level rotate-and-accumulate
    * (Hamilton's xy2d as popularized, e.g., in Wikipedia's
    * pseudocode), unrolled over `bits` levels as a CHAINED PROJECTION
    * (one withColumn stage per level) — expression growth stays
    * linear and whole-stage codegen fuses the chain into one pass of
    * integer arithmetic; a single nested Column would grow ~3^bits
    * nodes and blow past codegen limits. Pure integer ops ⇒ the SQL
    * oracle replays the identical per-level chain as CTEs
    * (layout_hilbert, hash-verified), and the map is a BIJECTION on
    * the grid (gate-pinned) — no two cells share an index, so range
    * partitioning on it is lossless.
    */
  def withHilbert(df: DataFrame, xBucket: String, yBucket: String,
      bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    require(!df.columns.contains(out),
      s"hilbert column name '$out' collides with a data column")
    val (hx, hy, hd) = ("__h_x", "__h_y", "__h_d")
    var cur = df.withColumn(hx, col(xBucket).cast("long"))
      .withColumn(hy, col(yBucket).cast("long"))
      .withColumn(hd, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col(hx).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col(hy).bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("__h_rx", rx).withColumn("__h_ry", ry)
        .withColumn(hd, col(hd) +
          lit(s * s) * (lit(3L) * col("__h_rx")).bitwiseXOR(col("__h_ry")))
        // rotate the frame: when ry = 0, (flip when rx = 1, then swap)
        .withColumn("__h_nx",
          when(col("__h_ry") === 0,
            when(col("__h_rx") === 1, lit(s - 1) - col(hy))
              .otherwise(col(hy)))
            .otherwise(col(hx)))
        .withColumn("__h_ny",
          when(col("__h_ry") === 0,
            when(col("__h_rx") === 1, lit(s - 1) - col(hx))
              .otherwise(col(hx)))
            .otherwise(col(hy)))
        .withColumn(hx, col("__h_nx")).withColumn(hy, col("__h_ny"))
        .drop("__h_rx", "__h_ry", "__h_nx", "__h_ny")
    }
    cur.withColumn(out, col(hd)).drop(hx, hy, hd)
  }

  /** [[zorderWrite]] with the Hilbert index as the clustering key —
    * two dimensions, quantized like z-order, range-partitioned into
    * internally sorted files with tighter boxes than Morton.
    */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, path: String): Unit = {
    val dims = stats(df, Seq(xCol, yCol))
    val hc = "__graft_hval"
    val withBuckets = df
      .withColumn("__h_bx", quantize(col(xCol), dims(0), bits))
      .withColumn("__h_by", quantize(col(yCol), dims(1), bits))
    withHilbert(withBuckets, "__h_bx", "__h_by", bits, hc)
      .drop("__h_bx", "__h_by")
      .repartitionByRange(numFiles, col(hc))
      .sortWithinPartitions(col(hc))
      .drop(hc)
      .write.mode("overwrite").parquet(path)
  }

  /** The DuckDB CTE chain replaying [[withHilbert]] level-for-level —
    * generated from the same loop so the two engines cannot drift.
    * `src` must expose integer columns `hx`, `hy` (the quantized
    * buckets) plus pass-through columns `carry`; yields a relation
    * `h$bits` with (carry, d).
    */
  def hilbertOracleCtes(src: String, carry: Seq[String], bits: Int): String = {
    val cols = carry.mkString(", ")
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, lvl) =>
      val s = 1L << i
      val prev = if (lvl == 0) src else s"h$lvl"
      s"""h${lvl + 1} AS (
        SELECT $cols,
               d + ${s * s} * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
                                  (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS d,
               CASE WHEN (hy & $s) = 0 THEN
                 CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END
               ELSE hx END AS hx,
               CASE WHEN (hy & $s) = 0 THEN
                 CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END
               ELSE hy END AS hy
        FROM $prev)"""
    }
    steps.mkString(",\n        ")
  }

  /** Scheme-normalized file URI — `_metadata.file_path`,
    * `input_file_name()` and Hadoop listings disagree on the number
    * of slashes after `file:`; index joins must not.
    */
  def normFile(f: String): String = f.replaceFirst("^file:/+", "/")

  /** Incremental [[fileIndex]] maintenance — the merge ≡ rebuild
    * twin for the layout family: stat rows for ONLY the files not yet
    * in `existing`, so a daily append of new files costs one narrow
    * scan of the new data, never a rescan of the table. The file
    * listing and the existing file set are both index-sized (one
    * entry per file — bounded via [[ModelCollect]] like the index
    * itself); `existing UNION delta` equals a full [[fileIndex]]
    * rebuild exactly, because per-file stats are independent —
    * spec-pinned, and driven by layout_index_delta_gate.
    */
  def fileIndexDelta(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String], existing: DataFrame,
      maxFiles: Int = 1 << 20): DataFrame = {
    val have = ModelCollect.bounded(existing.select(col("file")),
        maxFiles, "existing file-index entries")
      .map(r => normFile(r.getString(0))).toSet
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned tables nest their files under
    // key=value dirs — a flat listStatus would see no parquet files
    // and return a silently-empty delta (caught by spec)
    val it = fs.listFiles(hp, true)
    val listed = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    val fresh = listed
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .filterNot(f => have.contains(normFile(f)))
    require(fresh.size <= maxFiles,
      s"fileIndexDelta: ${fresh.size} new files exceed the $maxFiles cap")
    val base = spark.read.parquet(path)
    if (fresh.isEmpty)
      fileIndex(spark, path, cols).filter(lit(false))
    else {
      val aggs = boxAggs(base.schema, cols)
      spark.read.option("basePath", path).schema(base.schema)
        .parquet(fresh: _*)
        .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
        .groupBy(col("file"))
        .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Record-level point index: key → the sorted set of files holding
    * that key — the lookup structure min/max skipping CANNOT be for a
    * high-cardinality key scattered across files (every file's
    * [min, max] spans every probe, so [[fileIndex]] prunes nothing;
    * the layout_pointindex_gate measures exactly that). The Hudi
    * record-index / database secondary-index design recovered as a
    * derived TABLE: |distinct keys| rows, built by one distributed
    * scan of (key, file) pairs and maintained like any other table —
    * it is never collected; only a probe's surviving file list
    * (≤ |probe| × files-per-key) ever reaches the driver, bounded.
    *
    * At 100 TB this is the needle-in-haystack answer: a point lookup
    * opens the handful of files that CONTAIN the key instead of
    * scanning (or even footer-reading) the table. File paths are
    * [[normFile]]-normalized and the array sorted, so
    * [[mergeKeyIndex]] over [[keyIndexDelta]] equals a rebuild
    * exactly.
    */
  def keyIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      key: String): DataFrame =
    spark.read.parquet(path)
      .select(col(key), normFileCol(col("_metadata.file_path")).as("f"))
      .groupBy(col(key))
      .agg(sort_array(collect_set(col("f"))).as("files"))

  /** Index rows for ONLY the files `existing` has not seen — the
    * append-maintenance twin of [[keyIndex]] (same contract as
    * [[fileIndexDelta]]: a daily append costs one narrow scan of the
    * new files). Fold with [[mergeKeyIndex]]; merge ≡ rebuild is
    * gate-pinned by layout_pointindex_gate.
    */
  def keyIndexDelta(spark: org.apache.spark.sql.SparkSession,
      path: String, key: String, existing: DataFrame,
      maxFiles: Int = 1 << 20): DataFrame = {
    val have = ModelCollect.bounded(
        existing.select(explode(col("files")).as("f")).distinct(),
        maxFiles, "existing key-index file entries")
      .map(r => normFile(r.getString(0))).toSet
    val fresh = listFresh(spark, path, have, maxFiles, "keyIndexDelta")
    val base = spark.read.parquet(path)
    if (fresh.isEmpty) keyIndex(spark, path, key).filter(lit(false))
    else spark.read.option("basePath", path).schema(base.schema)
      .parquet(fresh: _*)
      .select(col(key), normFileCol(col("_metadata.file_path")).as("f"))
      .groupBy(col(key))
      .agg(sort_array(collect_set(col("f"))).as("files"))
  }

  /** Data files under `path` the caller has not indexed yet —
    * the shared discovery step of every append-maintenance delta
    * (file listing is dir-tree-sized; the cap guards the driver).
    */
  private def listFresh(spark: org.apache.spark.sql.SparkSession,
      path: String, have: Set[String], maxFiles: Int,
      what: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hp, true)
    val listed = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    val fresh = listed
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .filterNot(f => have.contains(normFile(f)))
    require(fresh.size <= maxFiles,
      s"$what: ${fresh.size} new files exceed the $maxFiles cap")
    fresh
  }

  /** Fold a [[keyIndexDelta]] into an existing [[keyIndex]]: one
    * key-hash exchange over index-sized inputs; re-sorting the
    * distinct union keeps the array canonical, so the fold is
    * associative, idempotent per file, and bit-equal to a rebuild.
    */
  def mergeKeyIndex(existing: DataFrame, delta: DataFrame): DataFrame = {
    val keyCols = existing.columns.filterNot(_ == "files").map(col)
    existing.unionByName(delta)
      .groupBy(keyCols: _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("files")))))
        .as("files"))
  }

  /** Repair a [[keyIndex]] after a FILE-LEVEL rewrite (compaction,
    * [[materializeDv]], erasure): entries for vanished files DROP,
    * entries for surviving files are kept verbatim, and only the NEW
    * files are scanned ([[keyIndexDelta]]) — the full-rescan a naive
    * rebuild would pay is avoided for exactly the files the rewrite
    * byte-copied, which selective compaction makes the vast majority.
    * Correctness argument: a (key, file) pair belongs in the index
    * iff the file exists and contains the key; present∩old pairs are
    * unchanged (files are immutable), vanished files can contribute
    * nothing, new files are delta-scanned ⇒ repair ≡ rebuild exactly
    * (gate-pinned by store_erasure_gate). The file listing is
    * dir-tree-sized and joins DISTRIBUTED against the exploded index
    * — no index-sized literal ever builds on the driver.
    */
  def repairKeyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, key: String, existing: DataFrame,
      maxFiles: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val present = listFresh(spark, path, Set.empty, maxFiles,
      "repairKeyIndex").map(normFile)
    val presentDf = present.toDF("f")
    val kept = existing
      .select(col(key), explode(col("files")).as("f"))
      .join(presentDf, Seq("f"), "left_semi")
      .groupBy(col(key))
      .agg(sort_array(collect_set(col("f"))).as("files"))
    mergeKeyIndex(kept, keyIndexDelta(spark, path, key, existing,
      maxFiles))
  }

  /** Answer `key IN values` by opening ONLY the files the index names
    * for those keys. The index filter runs distributed; the surviving
    * file list comes to the driver through [[ModelCollect.bounded]]
    * (its size is probe-bounded, not table-bounded). The residual
    * IN-filter re-applies to the opened rows, so the result is
    * row-identical to a full filtered scan even against a stale-
    * superset index — soundness carries correctness, the index only
    * carries IO. Driven end-to-end by layout_pointindex (hash vs the
    * full-scan oracle).
    */
  def pointLookup(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, key: String, values: Seq[Any],
      maxFiles: Int = 65536): DataFrame = {
    require(values.nonEmpty, "point lookup needs at least one probe")
    val files = ModelCollect.bounded(
        index.filter(col(key).isin(values: _*))
          .select(explode(col("files")).as("f")).distinct(),
        maxFiles,
        "point-lookup file list (probe too broad for a point index — " +
          "fall back to the plain filtered scan)")
      .map(_.getString(0))
    val base = spark.read.parquet(path)
    if (files.isEmpty) base.filter(lit(false))
    else spark.read.option("basePath", path).schema(base.schema)
      .parquet(files: _*).filter(col(key).isin(values: _*))
  }

  /** Per-file bloom index — the probabilistic middle rung of the
    * skipping ladder: min/max ([[fileIndex]]) is free but useless for
    * a high-cardinality key scattered across files (every range spans
    * every probe), the record index ([[keyIndex]]) is exact but
    * key-cardinality-sized; a per-FILE bloom is file-count rows of
    * ~1.2 bytes/key at 1% fpp — the Parquet/Delta bloom-skipping
    * design as a derived TABLE: (file, serialized sketch). Built in
    * one distributed pass — each file's keys stream through its own
    * group's sketch (mapGroups: a single-pass fold, nothing buffers).
    *
    * False positives only ever ADD files to a lookup's read set —
    * [[bloomLookup]] re-applies the exact residual filter, so
    * correctness never depends on the sketch (the BloomJoin rule).
    * Key canonicalization: integral keys feed the sketch as longs
    * directly; any OTHER type (the reference's point probes are UUID
    * strings — reference README.md:296 `person_uuid`) goes through
    * xxhash64 on BOTH the build and probe sides, so the ladder's
    * middle rung covers string keys at the same ~1.2 bytes/key (a
    * 64-bit-hash collision only ever adds a false-positive file, and
    * the residual filter already absorbs those). Per-file sketches
    * are DETERMINISTIC (seeded murmur + seeded xxhash64, no RNG), so
    * an append delta ([[bloomIndexDelta]]) unions with the old index
    * to exactly a rebuild.
    */
  def bloomIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      key: String, expectedPerFile: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val base = spark.read.parquet(path)
    bloomIndexOver(spark,
      base
        .select(normFileCol(col("_metadata.file_path")).as("f"),
          canonKey(col(key), base.schema(key).dataType).as("k")),
      expectedPerFile, fpp)
  }

  /** The bloom sketch's long form of a key column: integral types
    * cast (value-preserving, back-compatible with existing indexes);
    * everything else hashes through xxhash64 — the same expression
    * MUST canonicalize build and probe, which [[bloomLookup]]
    * guarantees by evaluating probes through this very function.
    */
  private def canonKey(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case _: org.apache.spark.sql.types.ByteType |
         _: org.apache.spark.sql.types.ShortType |
         _: org.apache.spark.sql.types.IntegerType |
         _: org.apache.spark.sql.types.LongType => c.cast("long")
    case _ => xxhash64(c)
  }

  private def bloomIndexOver(spark: org.apache.spark.sql.SparkSession,
      fileKeys: DataFrame, expectedPerFile: Long,
      fpp: Double): DataFrame = {
    import spark.implicits._
    fileKeys.as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val bf = org.apache.spark.util.sketch.BloomFilter
          .create(expectedPerFile, fpp)
        it.foreach(r => bf.putLong(r._2))
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (file, bos.toByteArray)
      }.toDF("file", "bloom")
  }

  /** Bloom rows for ONLY the files `existing` has not seen — same
    * append contract as [[keyIndexDelta]]/[[fileIndexDelta]]; fold is
    * a plain union (per-file rows are independent) and equals a
    * rebuild exactly because the sketches are deterministic.
    */
  def bloomIndexDelta(spark: org.apache.spark.sql.SparkSession,
      path: String, key: String, existing: DataFrame,
      expectedPerFile: Long = 1L << 20, fpp: Double = 0.01,
      maxFiles: Int = 1 << 20): DataFrame = {
    val have = ModelCollect.bounded(existing.select("file"),
        maxFiles, "existing bloom-index file entries")
      .map(r => normFile(r.getString(0))).toSet
    val fresh = listFresh(spark, path, have, maxFiles, "bloomIndexDelta")
    val base = spark.read.parquet(path)
    if (fresh.isEmpty)
      bloomIndex(spark, path, key, expectedPerFile, fpp).filter(lit(false))
    else bloomIndexOver(spark,
      spark.read.option("basePath", path).schema(base.schema)
        .parquet(fresh: _*)
        .select(normFileCol(col("_metadata.file_path")).as("f"),
          canonKey(col(key), base.schema(key).dataType).as("k")),
      expectedPerFile, fpp)
  }

  /** [[repairKeyIndex]]'s sibling for the bloom index — simpler
    * because rows are PER FILE: keep rows whose file still exists
    * (distributed semi-join against the listing), delta-scan only
    * the new files. Repair ≡ rebuild for the same immutability
    * reason, deterministic sketches included.
    */
  def repairBloomIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, key: String, existing: DataFrame,
      expectedPerFile: Long = 1L << 20, fpp: Double = 0.01,
      maxFiles: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val present = listFresh(spark, path, Set.empty, maxFiles,
      "repairBloomIndex").map(normFile)
    val kept = existing.join(present.toDF("file"), Seq("file"),
      "left_semi")
    kept.unionByName(bloomIndexDelta(spark, path, key, existing,
      expectedPerFile, fpp, maxFiles))
  }

  /** Answer `key IN values` through the bloom index: the sketch
    * filter runs DISTRIBUTED over the index table (one
    * deserialization per FILE row probes every value —
    * [[graft.functions.BloomContainsAny]]); only surviving paths
    * reach the driver, probe- and fpp-bounded. The residual IN-filter
    * re-applies to the opened rows, so false positives cost IO,
    * never correctness.
    */
  def bloomLookup(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, key: String, values: Seq[Any],
      maxFiles: Int = 65536): DataFrame = {
    val files = bloomProbeFiles(spark, path, index, key, values, maxFiles)
    val base = spark.read.parquet(path)
    if (files.isEmpty) base.filter(lit(false))
    else spark.read.option("basePath", path).schema(base.schema)
      .parquet(files: _*).filter(col(key).isin(values: _*))
  }

  /** The files a probe set would open — [[bloomLookup]]'s IO half,
    * exposed so the skipping gates can assert on file counts
    * directly. Probes canonicalize through the SAME [[canonKey]]
    * expression the build used (one 1-row job — probe-count-sized,
    * never a scan). Each probe literal is first CAST to the column's
    * type: the build side hashes typed column values, so a probe
    * whose Scala literal type differs (Int against a string key,
    * Double against Float) would otherwise feed xxhash64 different
    * bytes and silently SKIP matching files — a false negative,
    * where the bloom contract only ever allows false positives.
    */
  def bloomProbeFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, index: DataFrame, key: String, values: Seq[Any],
      maxFiles: Int = 65536): Seq[String] = {
    require(values.nonEmpty, "bloom lookup needs at least one probe")
    require(values.forall(_ != null), "bloom probes must be non-null")
    val dt = spark.read.parquet(path).schema(key).dataType
    val probeRow = spark.range(1).select(values.zipWithIndex.map {
      case (v, i) => canonKey(lit(v).cast(dt), dt).as(s"p$i")
    }: _*).head()
    val unrep = values.indices.filter(probeRow.isNullAt)
    require(unrep.isEmpty, "bloom probes not representable as the " +
      s"key's type $dt: ${unrep.map(values).take(3).mkString(", ")}")
    val probes = (0 until values.size).map(probeRow.getLong).toArray
    ModelCollect.bounded(
        index.filter(graft.functions.BloomContainsAny.column(
          col("bloom"), lit(probes))).select("file"),
        maxFiles,
        "bloom-lookup file list (probe too broad for a bloom index — " +
          "fall back to the plain filtered scan)")
      .map(_.getString(0))
  }

  /** What [[compactTo]] did: input file count, well-sized files kept
    * (byte-copied), small files packed, and the number of packed
    * output bins.
    */
  final case class Compaction(nIn: Int, kept: Int, packed: Int, bins: Int)

  /** Small-file compaction — the lakehouse maintenance op that keeps
    * a 100 TB table readable after months of streaming appends
    * (thousands of KB-sized tick files turn every scan into a task-
    * scheduling storm and every footer pass into a metadata storm).
    * Files at or above `targetBytes / 2` are KEPT — byte-identical
    * copies, never re-encoded (at scale this is a storage-layer
    * rename/copy, not a compute job; rewriting the 90% of a table
    * that is already well-sized is the classic compaction mistake).
    * Smaller files are read once and re-packed into
    * `ceil(smallBytes / targetBytes)` bins.
    *
    * Row-level content is preserved exactly (kept files are
    * byte-identical, packed files hold the same rows re-grouped) —
    * hash-asserted end-to-end by layout_compact; the file-count
    * arithmetic and kept-file byte-identity are layout_compact_gate's
    * contract. Compaction invalidates nothing: a [[fileIndex]] over
    * the destination is rebuilt by [[fileIndexDelta]] against an
    * empty index at exactly the per-file scan cost.
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, targetBytes: Long,
      maxFiles: Int = 1 << 20): Compaction = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val fs = src.getFileSystem(conf)
    val entries = fs.listStatus(src).toSeq
    val files = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // a partitioned layout must be compacted PER PARTITION DIR (how
    // real table formats do it too — bins must not mix partitions).
    // ANY non-hidden subdirectory is rejected, even alongside
    // top-level files: a mixed layout would silently drop the
    // subdirectories' rows from dst (row loss if a caller swaps dst
    // for src). Hidden entries (_SUCCESS-style markers, .crc dirs)
    // are layout metadata, not data.
    val dataDirs = entries.filter(e => e.isDirectory && {
      val n = e.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
    require(dataDirs.isEmpty,
      s"compactTo: $srcPath holds partition directories " +
        s"(${dataDirs.map(_.getPath.getName).take(3).mkString(", ")}…) — " +
        "compact each partition dir separately")
    require(files.size <= maxFiles,
      s"compactTo: ${files.size} input files exceed the $maxFiles cap")
    val (ok, small) = files.partition(_.getLen >= targetBytes / 2)
    fs.mkdirs(dst)
    ok.foreach(f => org.apache.hadoop.fs.FileUtil.copy(
      fs, f.getPath, fs, new org.apache.hadoop.fs.Path(dst, f.getPath.getName),
      false, conf))
    val bins =
      if (small.isEmpty) 0
      else {
        val n = math.max(1, math.ceil(
          small.map(_.getLen).sum.toDouble / targetBytes).toInt)
        spark.read.parquet(small.map(_.getPath.toString): _*)
          .repartition(n)
          .write.mode("append").parquet(dstPath)
        n
      }
    Compaction(files.size, ok.size, small.size, bins)
  }

  /** What [[compactPartitioned]] did across a partitioned layout:
    * leaf partition dirs visited, dirs compacted (had enough small
    * files to pack), dirs skipped (byte-copied whole — the selective-
    * maintenance rule applied at partition granularity), and the
    * summed per-file [[Compaction]] stats.
    */
  final case class PartCompaction(partitions: Int, compacted: Int,
      skippedDirs: Int, files: Compaction)

  /** [[compactTo]] for hive-partitioned layouts — compaction recurses
    * per PARTITION DIR (bins must never mix partitions: a packed file
    * carries its partition values in the DIRECTORY name, so a
    * cross-partition bin would corrupt reads). Each leaf dir gets the
    * selective-compaction treatment at two granularities: a dir with
    * fewer than `minSmallFiles` small files is byte-copied whole
    * (nothing worth packing — the months-old cold partitions that
    * dominate a 100 TB table cost a storage copy, never a compute
    * job), and inside a compacted dir well-sized files are still
    * byte-copied by [[compactTo]]'s own rule.
    *
    * Layout contract: every data file must live under `k=v` partition
    * dirs — mixed layouts (top-level parquet next to partition dirs,
    * or non-hive subdirs) are rejected loudly, the same row-loss
    * guard [[compactTo]] applies to the flat case. Multi-level
    * partitioning recurses; dir names are preserved verbatim so the
    * destination reads with identical partition values.
    *
    * Driver loop is partition-count-sized (the table's dir tree, not
    * its rows); at scale a maintenance tick bounds it by compacting
    * only the partitions a [[fileIndexDelta]]-style listing flags as
    * fragmented — `minSmallFiles` is that knob's local form.
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, targetBytes: Long,
      minSmallFiles: Int = 2, maxFiles: Int = 1 << 20): PartCompaction = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(srcPath).getFileSystem(conf)
    def walk(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): PartCompaction = {
      val entries = fs.listStatus(src).toSeq
        .filterNot { e =>
          val n = e.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
      val (dirs, files) = entries.partition(_.isDirectory)
      if (dirs.isEmpty) {
        // leaf partition: selective — byte-copy cold dirs whole
        val parquet = files.filter(_.getPath.getName.endsWith(".parquet"))
        val small = parquet.count(_.getLen < targetBytes / 2)
        if (small < minSmallFiles) {
          fs.mkdirs(dst)
          parquet.foreach(f => org.apache.hadoop.fs.FileUtil.copy(
            fs, f.getPath, fs,
            new org.apache.hadoop.fs.Path(dst, f.getPath.getName),
            false, conf))
          PartCompaction(1, 0, 1,
            Compaction(parquet.size, parquet.size, 0, 0))
        } else PartCompaction(1, 1, 0,
          compactTo(spark, src.toString, dst.toString, targetBytes,
            maxFiles))
      } else {
        require(files.forall(!_.getPath.getName.endsWith(".parquet")),
          s"compactPartitioned: $src mixes top-level parquet files " +
            "with partition directories — a compacted copy would " +
            "lose rows on swap")
        require(dirs.forall(_.getPath.getName.contains("=")),
          s"compactPartitioned: $src holds non-hive subdirectories " +
            s"(${dirs.map(_.getPath.getName).filterNot(_.contains("="))
              .take(3).mkString(", ")}…)")
        dirs.map(d => walk(d.getPath,
            new org.apache.hadoop.fs.Path(dst, d.getPath.getName)))
          .foldLeft(PartCompaction(0, 0, 0, Compaction(0, 0, 0, 0))) {
            (a, b) => PartCompaction(
              a.partitions + b.partitions, a.compacted + b.compacted,
              a.skippedDirs + b.skippedDirs,
              Compaction(a.files.nIn + b.files.nIn,
                a.files.kept + b.files.kept,
                a.files.packed + b.files.packed,
                a.files.bins + b.files.bins))
          }
      }
    }
    walk(new org.apache.hadoop.fs.Path(srcPath),
      new org.apache.hadoop.fs.Path(dstPath))
  }

  /** Column form of [[normFile]] — deletion-vector joins normalize
    * the file URI on BOTH sides with this one expression, so
    * `_metadata.file_path`'s slash count can never unmatch a listing.
    */
  private def normFileCol(c: Column): Column =
    regexp_replace(c, "^file:/+", "/")

  /** Deletion vector for `predicate` over the table at `path` — the
    * Delta/Iceberg row-level-delete design: instead of rewriting
    * every file that holds a matching row (a point delete in a 1 GB
    * file rewrites 1 GB — the write-amplification that makes GDPR
    * erasure expensive), record the matching rows' PHYSICAL addresses
    * `(file, pos)` via the parquet scan's `_metadata.file_path` /
    * `_metadata.row_index` columns. The delete then costs one
    * filtered scan plus a |deleted-rows| write; data files stay
    * immutable (so [[fileIndex]] stats, compaction copies, and
    * running scans are all undisturbed).
    *
    * Contract: addresses bind to IMMUTABLE files — rewriting a file
    * invalidates its vector rows ([[materializeDv]] does exactly
    * that, atomically swapping both sides). DVs are the point-delete
    * tool; a delete that hits most rows should rewrite files instead
    * (the vector itself would approach table size).
    */
  def deletionVector(spark: org.apache.spark.sql.SparkSession,
      path: String, predicate: Column): DataFrame =
    spark.read.parquet(path)
      .select(normFileCol(col("_metadata.file_path")).as("file"),
        col("_metadata.row_index").as("pos"),
        col("*"))
      .filter(predicate)
      .select("file", "pos")

  /** Union of deletion vectors (successive delete operations
    * accumulate; re-deleting an already-vectored row is a no-op) —
    * vector-sized work.
    */
  def mergeDv(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.select("file", "pos")
      .unionByName(delta.select("file", "pos")).distinct()

  /** Read the table MINUS its deletion vector: rows whose physical
    * address appears in `dv` are filtered by one broadcast anti-join
    * on `(file, pos)` — the DV is point-delete-sized by contract, so
    * the big side never shuffles and the scan itself stays pruned /
    * pushed-down as usual. Row-identical to a table that had the
    * deleted rows rewritten away ([[materializeDv]] ≡, gate-pinned by
    * layout_dv_gate).
    *
    * STALE-VECTOR GUARD: DV addresses bind to IMMUTABLE files, so a
    * vector naming files absent from `path`'s listing means the table
    * was rewritten (compaction / materialization) after the vector
    * was taken — the anti-join would then match NOTHING and silently
    * resurrect every "deleted" row, which on the GDPR-erasure path is
    * a compliance failure, not a perf bug. The same vector-sized
    * alien-file check [[materializeDv]] runs at write time therefore
    * also guards the READ path: it fails loudly instead. Cost is one
    * vector-bounded collect plus a driver file listing — DV-sized by
    * the point-delete contract, never a scan.
    */
  def readWithDv(spark: org.apache.spark.sql.SparkSession,
      path: String, dv: DataFrame, maxFiles: Int = 1 << 20): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hp, true)
    val known = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => normFile(f.getPath.toString)).toSet
    val dirty = ModelCollect.bounded(dv.select(col("file")).distinct(),
        maxFiles, "deletion-vector file entries")
      .map(r => normFile(r.getString(0))).toSet
    val alien = dirty.filterNot(known.contains)
    require(alien.isEmpty,
      s"readWithDv: vector names files absent from $path " +
        s"(${alien.take(3).mkString(", ")}…) — stale vector? A " +
        "rewritten table needs a fresh deletionVector, not the old one")
    val table = spark.read.parquet(path)
    val cols = table.columns.toSeq
    table
      .select(normFileCol(col("_metadata.file_path")).as("__dv_file"),
        col("_metadata.row_index").as("__dv_pos"), col("*"))
      .join(broadcast(dv.select(col("file").as("__dv_file"),
        col("pos").as("__dv_pos"))), Seq("__dv_file", "__dv_pos"),
        "left_anti")
      .select(cols.map(col): _*)
  }

  /** What [[materializeDv]] did: input files, files kept byte-
    * identical (no vectored rows), files rewritten, and vectored
    * rows dropped.
    */
  final case class DvMaterialize(
      nIn: Int, kept: Int, rewritten: Int, dropped: Long)

  /** Fold a deletion vector back into the data — the maintenance op
    * that keeps the read-side anti-join small: files with NO vectored
    * rows are byte-identical copies (the [[compactTo]] rule — never
    * re-encode the clean majority), files with vectored rows are
    * rewritten without their deleted positions, and the destination
    * needs no vector at all. Flat layouts only —
    * [[materializeDvPartitioned]] is the hive-partitioned form.
    */
  def materializeDv(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dv: DataFrame, dstPath: String,
      maxFiles: Int = 1 << 20): DvMaterialize = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val fs = src.getFileSystem(conf)
    val entries = fs.listStatus(src).toSeq
    val dataDirs = entries.filter(e => e.isDirectory && {
      val n = e.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
    require(dataDirs.isEmpty,
      s"materializeDv: $srcPath holds partition directories — " +
        "materialize each partition dir separately")
    val files = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.size <= maxFiles,
      s"materializeDv: ${files.size} input files exceed the $maxFiles cap")
    // dirty-file set is DV-sized → vector-bounded driver materialization
    val dirty = ModelCollect.bounded(dv.select(col("file")).distinct(),
        maxFiles, "deletion-vector file entries")
      .map(r => normFile(r.getString(0))).toSet
    val known = files.map(f => normFile(f.getPath.toString)).toSet
    val alien = dirty.filterNot(known.contains)
    require(alien.isEmpty,
      s"materializeDv: vector names files absent from $srcPath " +
        s"(${alien.take(3).mkString(", ")}…) — stale vector?")
    val (hit, clean) = files.partition(f =>
      dirty.contains(normFile(f.getPath.toString)))
    fs.mkdirs(dst)
    clean.foreach(f => org.apache.hadoop.fs.FileUtil.copy(
      fs, f.getPath, fs, new org.apache.hadoop.fs.Path(dst, f.getPath.getName),
      false, conf))
    if (hit.nonEmpty) {
      val schema = spark.read.parquet(srcPath).schema
      val hitDf = spark.read.schema(schema)
        .parquet(hit.map(_.getPath.toString): _*)
      val survivors = hitDf
        .select(normFileCol(col("_metadata.file_path")).as("__dv_file"),
          col("_metadata.row_index").as("__dv_pos"), col("*"))
        .join(broadcast(dv.select(col("file").as("__dv_file"),
          col("pos").as("__dv_pos"))), Seq("__dv_file", "__dv_pos"),
          "left_anti")
        .select(schema.fieldNames.toSeq.map(col): _*)
      survivors.write.mode("append").parquet(dstPath)
    }
    // every (distinct) vector row addresses a real row of a hit file
    // (alien-file vectors rejected above; honest vectors come from a
    // scan of the same immutable files)
    val dropped = dv.select("file", "pos").distinct().count()
    DvMaterialize(files.size, clean.size, hit.size, dropped)
  }

  /** What [[materializeDvPartitioned]] did: leaf partitions seen,
    * partitions holding vectored rows (selectively rewritten), and
    * the aggregated file-level stats — untouched partitions count
    * whole into `files.kept`.
    */
  final case class DvPartMaterialize(partitions: Int, touched: Int,
      files: DvMaterialize)

  /** [[materializeDv]] for hive-partitioned layouts — the layout a
    * 100 TB table actually HAS ([[graft.sources.AnalysisStore]]'s
    * `partitionBy` posture), so the erasure flow must run here, not
    * just on flat dirs. The partition-dir tree recurses exactly like
    * [[compactPartitioned]]; which partitions are dirty is known
    * from the VECTOR'S OWN file list (vector-sized, never a table
    * scan), so COLD partitions byte-copy whole without a Spark job
    * and only dirty partitions run the flat selective
    * materialization against their prefix-sliced piece of the
    * vector. Dir names are preserved verbatim, so the destination
    * reads with identical partition values; repair-not-rebuild index
    * maintenance composes unchanged ([[repairKeyIndex]] lists
    * recursively). Gate-pinned by store_erasure_part_gate with the
    * same four-leg contract as the flat flow.
    */
  def materializeDvPartitioned(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dv: DataFrame, dstPath: String,
      maxFiles: Int = 1 << 20): DvPartMaterialize = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = new org.apache.hadoop.fs.Path(srcPath)
    val fs = srcRoot.getFileSystem(conf)
    val dirtyFiles = ModelCollect.bounded(
        dv.select(col("file")).distinct(), maxFiles,
        "deletion-vector file entries")
      .map(r => normFile(r.getString(0)))
    val srcNorm = normFile(fs.makeQualified(srcRoot).toString)
    val alien = dirtyFiles.filterNot(_.startsWith(srcNorm + "/"))
    require(alien.isEmpty,
      s"materializeDvPartitioned: vector names files outside $srcPath " +
        s"(${alien.take(3).mkString(", ")}…) — stale vector?")
    val dirtyDirs = dirtyFiles.map(f => f.substring(0, f.lastIndexOf('/')))
      .toSet
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): DvPartMaterialize = {
      val entries = fs.listStatus(src).toSeq
        .filterNot(e => hidden(e.getPath.getName))
      val (dirs, files) = entries.partition(_.isDirectory)
      if (dirs.isEmpty) {
        val leafNorm = normFile(fs.makeQualified(src).toString)
        if (dirtyDirs.contains(leafNorm)) {
          val slice = dv.filter(col("file").startsWith(leafNorm + "/"))
          DvPartMaterialize(1, 1,
            materializeDv(spark, src.toString, slice, dst.toString,
              maxFiles))
        } else {
          // cold partition: whole-dir byte copy, no Spark job
          val parquet = files.filter(_.getPath.getName.endsWith(".parquet"))
          fs.mkdirs(dst)
          parquet.foreach(f => org.apache.hadoop.fs.FileUtil.copy(
            fs, f.getPath, fs,
            new org.apache.hadoop.fs.Path(dst, f.getPath.getName),
            false, conf))
          DvPartMaterialize(1, 0,
            DvMaterialize(parquet.size, parquet.size, 0, 0L))
        }
      } else {
        require(files.forall(!_.getPath.getName.endsWith(".parquet")),
          s"materializeDvPartitioned: $src mixes top-level parquet " +
            "files with partition directories — a materialized copy " +
            "would lose rows on swap")
        require(dirs.forall(_.getPath.getName.contains("=")),
          s"materializeDvPartitioned: $src holds non-hive " +
            s"subdirectories (${dirs.map(_.getPath.getName)
              .filterNot(_.contains("=")).take(3).mkString(", ")}…)")
        dirs.map(d => walk(d.getPath,
            new org.apache.hadoop.fs.Path(dst, d.getPath.getName)))
          .foldLeft(DvPartMaterialize(0, 0,
            DvMaterialize(0, 0, 0, 0L))) { (a, b) =>
            DvPartMaterialize(a.partitions + b.partitions,
              a.touched + b.touched,
              DvMaterialize(a.files.nIn + b.files.nIn,
                a.files.kept + b.files.kept,
                a.files.rewritten + b.files.rewritten,
                a.files.dropped + b.files.dropped))
          }
      }
    }
    val top = fs.listStatus(srcRoot).toSeq
      .filterNot(e => hidden(e.getPath.getName))
    if (!top.exists(_.isDirectory))
      // flat layout after all — delegate, same stats shape
      DvPartMaterialize(1, if (dirtyFiles.nonEmpty) 1 else 0,
        materializeDv(spark, srcPath, dv, dstPath, maxFiles))
    else walk(srcRoot, new org.apache.hadoop.fs.Path(dstPath))
  }
}
