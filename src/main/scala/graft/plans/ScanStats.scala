package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Qualified-path equality — the one way paths are compared across
  * the optimizer rules ([[AggViewRewrite]], [[ScanStatsRule]]):
  * `/tmp/t` and `file:/tmp/t` spell the same location while
  * `…/backup/t` never matches `…/t` (the suffix foot-gun), and a null
  * vs empty URI authority (`file:/x` vs `file:///x`) normalizes to
  * the same tuple.
  */
object PathEq {
  def qualify(session: SparkSession,
      p: String): (String, String, String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val u = hp.getFileSystem(session.sparkContext.hadoopConfiguration)
      .makeQualified(hp).toUri
    (Option(u.getScheme).getOrElse(""),
      Option(u.getAuthority).getOrElse(""), u.getPath)
  }
}

/** One equi-height histogram bin: [lo, hi] value range holding
  * ~height rows with `ndv` distinct values (sketched).
  */
final case class HistBin(lo: Double, hi: Double, ndv: Long)

/** Equi-height histogram over a numeric column — what separates
  * "min/max + uniformity" selectivity from the truth on SKEWED
  * columns (a hot value holding 90% of rows makes the uniform
  * interpolation off by ~10x in either direction). `height` = rows
  * per bin; bins carry their own NDV so equality estimates inside a
  * bin divide by local, not global, distinctness — the same shape
  * Spark's own ANALYZE … FOR COLUMNS persists.
  */
final case class Hist(height: Double, bins: Seq[HistBin])

/** Per-column statistics a publish-time ANALYZE records: exact or
  * sketched distinct count, null count, min/max in external string
  * form, and an optional equi-height histogram (numeric columns only
  * feed the optimizer's min/max/histogram — see [[ScanStatsRule]]).
  */
final case class ColStats(ndv: Long, nulls: Long,
    min: Option[String], max: Option[String],
    hist: Option[Hist] = None,
    avgLen: Option[Long] = None, maxLen: Option[Long] = None)

/** Table-level statistics: row count, on-disk bytes, per-column
  * detail. The sizeInBytes is what flips join build/broadcast sides
  * even with CBO off; rowCount + column stats engage Spark's
  * cost-based optimizer (join reordering, filter selectivity) when
  * `spark.sql.cbo.enabled` is set — the cluster posture for
  * multi-join report shapes.
  */
final case class TableStats(rowCount: Long, sizeInBytes: Long,
    cols: Map[String, ColStats])

/** The registry [[ScanStatsRule]] consults — session-global and
  * mutable like [[AggViewCatalog]], keyed by table path. Register at
  * publish/ANALYZE time, clear when the table is republished without
  * fresh stats; the rule is a no-op while empty.
  */
object ScanStatsCatalog {
  @volatile private var entries: Map[String, TableStats] = Map.empty
  def register(path: String, stats: TableStats): Unit = synchronized {
    entries = entries + (path -> stats)
  }
  def clear(): Unit = synchronized { entries = Map.empty }
  def all: Map[String, TableStats] = entries
}

/** Optimizer rule: attach publish-time table statistics to bare
  * path-based parquet scans — the missing CBO feed for a lakehouse
  * that reads by path instead of by catalog table. Spark's join
  * planning reads `LogicalPlan.stats`, and a path-based
  * [[LogicalRelation]] estimates ONLY `sizeInBytes = file bytes`:
  * row counts, NDVs and min/max — which the engine already computes
  * at publish time ([[graft.operators.Profile]],
  * `Layout.fileIndex`) — never reach the planner, so multi-join
  * report shapes lean entirely on AQE's runtime re-plan and the
  * dim-name heuristic ([[AutoBroadcastDims]]). This rule closes the
  * loop: a scan whose every root path equals a registered table path
  * (qualified equality, never suffix) gets a synthetic
  * `CatalogTable` carrying [[CatalogStatistics]], exactly what a
  * metastore-backed table would have after ANALYZE TABLE:
  *
  *  - `sizeInBytes`/`rowCount` steer broadcast/build-side selection
  *    immediately (CBO on or off);
  *  - per-column NDV/nulls/min-max engage under
  *    `spark.sql.cbo.enabled` for selectivity and join reordering.
  *
  * min/max attach only for numeric columns (the external-string form
  * `CatalogColumnStat.fromExternalString` parses unambiguously);
  * NDV/null counts attach for every profiled column. Scans that
  * already carry a real catalog table are left alone, and the rule
  * is idempotent (the attached table short-circuits the match).
  */
case class ScanStatsRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def numeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def toCatalog(name: String, schema: StructType,
      uri: java.net.URI, ts: TableStats): CatalogTable = {
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val colStats = ts.cols.flatMap { case (c, cs) =>
      byName.get(c).map { dt =>
        val mm = if (numeric(dt)) (cs.min, cs.max) else (None, None)
        val hist = if (numeric(dt)) cs.hist.map(h =>
          org.apache.spark.sql.catalyst.plans.logical.Histogram(
            h.height, h.bins.map(b =>
              org.apache.spark.sql.catalyst.plans.logical
                .HistogramBin(b.lo, b.hi, b.ndv)).toArray))
        else None
        c -> CatalogColumnStat(
          distinctCount = Some(BigInt(cs.ndv)),
          min = mm._1, max = mm._2,
          nullCount = Some(BigInt(cs.nulls)),
          // var-width byte lengths (string/binary): the row-width
          // feed for CBO's intermediate-size estimates; fixed-width
          // types default from the type itself
          avgLen = cs.avgLen, maxLen = cs.maxLen,
          histogram = hist)
      }
    }
    CatalogTable(
      identifier = TableIdentifier(name),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(locationUri = Some(uri)),
      schema = schema,
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(ts.sizeInBytes),
        rowCount = Some(BigInt(ts.rowCount)),
        colStats = colStats)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val reg = ScanStatsCatalog.all
    if (reg.isEmpty) plan
    else {
      lazy val qualified = reg.map { case (p, ts) =>
        PathEq.qualify(session, p) -> (p, ts)
      }
      plan.transformUp {
        case lr: LogicalRelation if lr.catalogTable.isEmpty =>
          lr.relation match {
            case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty =>
              val keys = fs.location.rootPaths
                .map(rp => PathEq.qualify(session, rp.toString)).distinct
              keys match {
                case Seq(one) if qualified.contains(one) =>
                  val (path, ts) = qualified(one)
                  val name = new org.apache.hadoop.fs.Path(path).getName
                  lr.copy(catalogTable = Some(toCatalog(
                    name, lr.schema,
                    new org.apache.hadoop.fs.Path(path).toUri, ts)))
                case _ => lr
              }
            case _ => lr
          }
      }
    }
  }
}
