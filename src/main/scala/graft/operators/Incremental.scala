package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ("only add/modify what has changed") vs full-refresh
  * ETL semantics (reference README.md:133-134,146; SURVEY §2.1 S2/S3,
  * §2.7 T3).
  *
  * The reference's mode 1 upserts into MySQL tables; the Spark-native
  * equivalent is a MERGE emulated as anti-join + union — no Delta
  * dependency (SURVEY §7.4). The semantic contract we test: N
  * incremental ticks ≡ one full refresh (SURVEY §5d).
  */
object Incremental {

  /** Upsert: rows of `incoming` replace same-key rows of `existing`;
    * all other existing rows survive.
    *
    * Scale shape: a tick's delta is small relative to the store, so
    * the anti-join's build side (the incoming key set) is broadcast —
    * no shuffle of the big `existing` side at all. If a delta ever
    * outgrows the broadcast threshold AQE falls back to a shuffled
    * join on its own.
    *
    * Schema evolution: `allowMissingColumns` — the reference
    * auto-generates flat configs from metadata (README.md:246-247),
    * so a tick can legitimately carry a column the stored table
    * predates (a newly-answered concept) or drop one; either side's
    * missing columns fill with null instead of failing the tick.
    */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val incomingKeys = broadcast(incoming.select(keys.map(col): _*).distinct())
    existing
      .join(incomingKeys, keys, "left_anti")
      .unionByName(incoming, allowMissingColumns = true)
  }

  /** Snapshot diff — what changed between two corpus versions, by id
    * and content hash: (id, status ∈ added | removed | modified |
    * unchanged). The audit surface for corpus releases ("what moved
    * between v3 and v4") and the input a delta pipeline derives its
    * additions/retractions from when the upstream ships full
    * snapshots instead of deltas.
    *
    * Scale shape: one id-keyed full-outer hash join of (id, md5)
    * projections — each side is scanned once and reduced to two
    * narrow columns before the exchange; uniform keys, no skew.
    */
  def snapshotDiff(
      old: DataFrame, current: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val o = old.select(col(idCol), md5(col(contentCol)).as("__oh"))
    val c = current.select(col(idCol), md5(col(contentCol)).as("__ch"))
    o.join(c, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__oh").isNull, lit("added"))
          .when(col("__ch").isNull, lit("removed"))
          .when(col("__oh") =!= col("__ch"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Change detection between ticks: rows whose latest audit timestamp
    * is past the bookmark (reference's date_created/date_changed
    * columns, SURVEY §2.7 T3 [inferred]). The predicate is a plain
    * column comparison so it pushes into the parquet/JDBC scan.
    */
  def changedSince(
      df: DataFrame,
      bookmark: Option[java.sql.Timestamp],
      tsCols: Seq[String] = Seq("date_created", "date_changed")): DataFrame =
    bookmark match {
      case None => df
      case Some(ts) =>
        val latest =
          if (tsCols.size == 1) col(tsCols.head)
          else greatest(tsCols.map(c => coalesce(col(c), lit(null))): _*)
        df.filter(latest > lit(ts))
    }

  /** Max audit timestamp of a batch — the next bookmark. */
  def nextBookmark(
      df: DataFrame,
      tsCols: Seq[String] = Seq("date_created", "date_changed")): Option[java.sql.Timestamp] = {
    // greatest() requires ≥2 args — single-column bookmarks are legal
    val latest =
      if (tsCols.size == 1) col(tsCols.head) else greatest(tsCols.map(col): _*)
    df.agg(max(latest)).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[java.sql.Timestamp]))
  }
}

/** Driver-side persisted high-water mark between scheduled runs —
  * the Spark equivalent of the reference's "only add/modify what has
  * changed" state (SURVEY §2.7 T3: "max-timestamp bookmark persisted
  * between runs").
  */
final class BookmarkStore(path: String) {
  private val p = Paths.get(path)

  def read(): Option[java.sql.Timestamp] =
    if (Files.exists(p)) {
      val s = new String(Files.readAllBytes(p), "UTF-8").trim
      if (s.isEmpty) None else Some(java.sql.Timestamp.valueOf(s))
    } else None

  def write(ts: java.sql.Timestamp): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, ts.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
