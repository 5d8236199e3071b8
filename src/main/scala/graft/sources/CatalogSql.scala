package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text command surface over the transactional catalog — the DDL/DML
  * grammar a reports.json-style deployment drives the store with (the
  * reference's whole operational surface is SQL text and JSON config;
  * an engine tier only reachable from Scala would be a regression for
  * that user). One statement per call, deliberately SMALL and
  * regular-grammar: each command maps 1:1 onto a [[CatalogStore]]
  * API, so the parser adds a surface, never semantics — every
  * guarantee (claims, CAS refs, constraints, rename mapping,
  * derived-CAS DML) is the underlying call's, already gated and
  * spec'd. Spark SQL expressions inside DELETE/CHECK pass through to
  * the engine's own parser.
  *
  * Grammar (case-insensitive keywords, `--` comments stripped):
  * {{{
  * CREATE BRANCH b [AT v]           DROP BRANCH b
  * CREATE TAG t [AT v]              DROP TAG t
  * MERGE BRANCH b [FORCE] [EVOLVE]
  * MERGE INTO t USING <view | (query)> ON (k1, k2, ...) [EVOLVE]
  * INSERT INTO t <query>                 -- append (derived-CAS)
  * INSERT OVERWRITE t <query>            -- full-table publish
  * OPTIMIZE t [TARGET <mb> MB] [ZORDER BY (c1, c2, ...)]
  * DELETE FROM t WHERE <spark-sql boolean expr>
  * ALTER TABLE t RENAME COLUMN a TO b
  * ALTER TABLE t ADD CONSTRAINT n CHECK (<expr>)
  * ALTER TABLE t ADD CONSTRAINT n UNIQUE (c1, c2, ...)
  * ALTER TABLE t DROP CONSTRAINT n
  * RESTORE TO <catalog version>
  * VACUUM [KEEP n]
  * SHOW REFS | SHOW HISTORY | SHOW CONSTRAINTS
  * }}}
  * Statements that change state return a one-row status frame;
  * SHOW commands return their listing. `ref` scopes every command
  * the way the Scala APIs do (SHOW REFS/HISTORY are store-wide).
  */
object CatalogSql {

  private val createRef =
    """(?is)\s*CREATE\s+(BRANCH|TAG)\s+([A-Za-z0-9._-]+)\s*(?:AT\s+(\d+))?\s*""".r
  private val dropRef =
    """(?is)\s*DROP\s+(BRANCH|TAG)\s+([A-Za-z0-9._-]+)\s*""".r
  private val mergeRe =
    """(?is)\s*MERGE\s+BRANCH\s+([A-Za-z0-9._-]+)((?:\s+(?:FORCE|EVOLVE))*)\s*""".r
  // source matched GREEDILY so the LAST `ON (…)` binds as the key
  // clause — a lazy match would split at a JOIN's own ON inside a
  // parenthesized USING query
  private val mergeIntoRe =
    """(?is)\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(.+)\s+ON\s*\(([^)]+)\)(\s+EVOLVE)?\s*""".r
  private val insertRe =
    """(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+((?:SELECT|VALUES|TABLE|WITH|FROM)\b.+)\s*""".r
  private val optimizeRe =
    """(?is)\s*OPTIMIZE\s+(\w+)\s*(?:TARGET\s+(\d+)\s*MB)?\s*(?:ZORDER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val deleteRe =
    """(?is)\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*""".r
  private val renameRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val addCheckRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val addUniqueRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+UNIQUE\s*\(([^)]+)\)\s*""".r
  private val dropConsRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r
  private val vacuumRe =
    """(?is)\s*VACUUM\s*(?:KEEP\s+(\d+))?\s*""".r
  private val restoreRe =
    """(?is)\s*RESTORE\s+TO\s+(\d+)\s*""".r
  private val showRe =
    """(?is)\s*SHOW\s+(REFS|HISTORY|CONSTRAINTS)\s*""".r

  private def status(spark: SparkSession, op: String,
      detail: String): DataFrame = {
    import spark.implicits._
    Seq((op, detail)).toDF("op", "result")
  }

  /** Execute one statement against the store at `root`, on `ref`. */
  def exec(spark: SparkSession, root: String, statement: String,
      ref: String = "main"): DataFrame = {
    import spark.implicits._
    // strip -- comments QUOTE-AWARE: DELETE/CHECK payloads are full
    // Spark SQL where '--' can sit inside a string literal
    // (name = 'a--b', url NOT LIKE '%--%') — a line-anchored regex
    // would corrupt exactly the part of the grammar that passes
    // through verbatim
    def stripComment(line: String): String = {
      var inQuote = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '\'') inQuote = !inQuote
        else if (!inQuote && c == '-' && i + 1 < line.length &&
            line.charAt(i + 1) == '-')
          return line.substring(0, i)
        i += 1
      }
      line
    }
    val text = statement.split("\n").map(stripComment)
      .mkString(" ").trim.stripSuffix(";").trim
    text match {
      case createRef(kind, name, at) =>
        val v = Option(at).map(_.toInt)
        val landed =
          if (kind.equalsIgnoreCase("BRANCH"))
            CatalogStore.createBranch(spark, root, name, v)
          else CatalogStore.createTag(spark, root, name, v)
        status(spark, s"CREATE ${kind.toUpperCase}", s"$name at v$landed")
      case dropRef(kind, name) =>
        val existed = if (kind.equalsIgnoreCase("BRANCH"))
          CatalogStore.dropBranch(spark, root, name)
        else CatalogStore.dropTag(spark, root, name)
        require(existed, s"no ${kind.toLowerCase} named $name")
        status(spark, s"DROP ${kind.toUpperCase}", name)
      case mergeIntoRe(table, source, keyList, evolve) =>
        val keys = keyList.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val tx = CatalogStore.upsertTable(spark, root, table,
          resolveSource(spark, source), keys,
          ref = ref, evolve = evolve != null)
        status(spark, "MERGE INTO",
          s"$table on (${keys.mkString(",")}) -> v${tx.version.get}")
      case insertRe(mode, table, query) =>
        val rows0 = spark.sql(query)
        // SQL INSERT binds columns by POSITION: a VALUES source names
        // its columns col1/col2/… and a SELECT may alias differently —
        // when the target exists, map positionally onto its logical
        // schema (first publish keeps the source names)
        val rows = currentColumns(spark, root, table, ref) match {
          case Some(cols) =>
            require(rows0.columns.length == cols.length,
              s"INSERT arity ${rows0.columns.length} does not match " +
                s"table $table's ${cols.length} columns")
            rows0.toDF(cols: _*)
          case None => rows0
        }
        val tx =
          if (mode.equalsIgnoreCase("OVERWRITE"))
            CatalogStore.commit(spark, root, Map(table -> rows), ref = ref)
          else CatalogStore.appendTable(spark, root, table, rows, ref = ref)
        status(spark, s"INSERT ${mode.toUpperCase}",
          s"$table -> v${tx.version.get}")
      case mergeRe(name, flags) =>
        val f = flags.toUpperCase
        val m = CatalogStore.mergeBranch(spark, root, name,
          force = f.contains("FORCE"), evolve = f.contains("EVOLVE"))
        status(spark, "MERGE BRANCH",
          s"v${m.version} tables=${m.tables.mkString(",")}" +
            (if (m.fastForward) " (fast-forward shape)" else ""))
      case optimizeRe(table, target, zcols) =>
        val tx = CatalogStore.optimizeTable(spark, root, table,
          targetMb = Option(target).map(_.toInt).getOrElse(128),
          zorderCols = Option(zcols).map(_.split(",").toSeq
            .map(_.trim).filter(_.nonEmpty)).getOrElse(Nil),
          ref = ref)
        status(spark, "OPTIMIZE", s"$table -> v${tx.version.get}")
      case deleteRe(table, predicate) =>
        val tx = CatalogStore.deleteWhere(spark, root, table,
          org.apache.spark.sql.functions.expr(predicate), ref = ref)
        status(spark, "DELETE", s"$table -> v${tx.version.get}")
      case renameRe(table, from, to) =>
        val tx = CatalogStore.renameColumn(spark, root, table, from,
          to, ref = ref)
        status(spark, "RENAME COLUMN",
          s"$table.$from -> $to at v${tx.version.get}")
      case addCheckRe(table, name, expr) =>
        val tx = CatalogStore.addConstraints(spark, root,
          Seq(CatalogStore.Constraint.check(table, name, expr.trim)),
          ref = ref)
        status(spark, "ADD CONSTRAINT",
          s"$table.$name at v${tx.version.get}")
      case addUniqueRe(table, name, colList) =>
        val cols = colList.split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty)
        val tx = CatalogStore.addConstraints(spark, root,
          Seq(CatalogStore.Constraint(table, name, "unique",
            cols.mkString(","))), ref = ref)
        status(spark, "ADD CONSTRAINT",
          s"$table.$name at v${tx.version.get}")
      case dropConsRe(table, name) =>
        val tx = CatalogStore.dropConstraint(spark, root, table, name,
          ref = ref)
        status(spark, "DROP CONSTRAINT",
          s"$table.$name at v${tx.version.get}")
      case restoreRe(v) =>
        val tx = CatalogStore.restore(spark, root, v.toInt, ref = ref)
        status(spark, "RESTORE",
          s"catalog v$v republished as v${tx.version.get}")
      case vacuumRe(keep) =>
        val vac = CatalogStore.vacuum(spark, root,
          Option(keep).map(_.toInt).getOrElse(3))
        status(spark, "VACUUM",
          s"catalogs=${vac.catalogs.mkString(",")} tables=" +
            vac.tableVersions.map { case (t, vs) =>
              s"$t:${vs.mkString("+")}" }.toSeq.sorted.mkString(","))
      case showRe(what) => what.toUpperCase match {
        case "REFS"    => CatalogStore.refs(spark, root)
        case "HISTORY" => CatalogStore.history(spark, root)
        case _ =>
          // snapshotRef, not snapshot(refVersion): a typo'd ref must
          // fail loudly, never silently serve MAIN's constraint list
          // as the branch's
          val snap = CatalogStore.snapshotRef(spark, root, ref)
          CatalogStore.constraintsOf(spark, root, snap)
            .map(c => (c.table, c.name, c.kind, c.expr))
            .toDF("table_name", "constraint_name", "kind", "expr")
      }
      case other => throw new IllegalArgumentException(
        "unrecognized catalog statement: '" + other.take(120) +
          "' — supported: CREATE/DROP BRANCH|TAG, MERGE BRANCH, " +
          "MERGE INTO..USING..ON (keys), INSERT INTO|OVERWRITE t " +
          "<query>, OPTIMIZE, DELETE FROM..WHERE, ALTER TABLE RENAME " +
          "COLUMN/ADD|DROP CONSTRAINT, RESTORE TO v, VACUUM [KEEP n], " +
          "SHOW REFS|HISTORY|CONSTRAINTS")
    }
  }

  /** MERGE INTO's USING operand: a parenthesized Spark SQL query runs
    * through the session's parser; a bare name resolves as a view or
    * table in the session catalog. Either way the DATA semantics stay
    * the engine's — this only picks where the frame comes from.
    */
  /** The target table's current LOGICAL column names on `ref`, None
    * when the table (or the whole store) does not exist yet.
    */
  private def currentColumns(spark: SparkSession, root: String,
      table: String, ref: String): Option[Seq[String]] =
    try {
      val snap = CatalogStore.snapshotRef(spark, root, ref)
      if (snap.tables.contains(table))
        Some(CatalogStore.read(spark, root, table, snap).columns.toSeq)
      else None
    } catch {
      // ONLY the definitive not-exists signals (unknown ref / version-0
      // unpublished store — both IllegalArgument by contract) mean
      // "first publish". A transient store/FS read failure on an
      // EXISTING table must propagate: swallowing it here would route
      // INSERT INTO down the first-publish naming path and fail later
      // with a misleading unionByName error instead of the real cause.
      case _: IllegalArgumentException => None
    }

  private def resolveSource(spark: SparkSession, source: String): DataFrame = {
    val s = source.trim
    if (s.startsWith("(") && s.endsWith(")"))
      spark.sql(s.substring(1, s.length - 1))
    else spark.table(s)
  }
}
