package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlConfig, FlatTableConfig}
import graft.operators.Flatten
import graft.pipeline.{EtlPipeline, Stage}

/** The reference's complete ETL wired end-to-end on this engine — what
  * a MambaETL user's deployment becomes (reference README.md:7-12,
  * 244-255; SURVEY §3 E1-E3). Given OpenMRS-shaped source frames
  * (person, encounter_type, encounter, concept, obs), builds:
  *
  *  - `mamba_dim_person`, `mamba_dim_encounter` — cleaned conformed
  *    dims (reference README.md:296,313);
  *  - one `mamba_flat_encounter_<type>` per requested encounter type,
  *    via config or metadata auto-config (README.md:244-253);
  *  - `mamba_fact_encounter_counts` — a derived fact off the dims
  *    (the `derived/` folder mechanism, sp_makefile:6-9);
  *
  * in base→derived order via the stage DAG, every output registered
  * as a temp view so `ReportRegistry` SQL (E3) runs against them.
  */
object MambaEtlJob {

  final case class Sources(
      person: DataFrame, encounterType: DataFrame, encounter: DataFrame,
      concept: DataFrame, obs: DataFrame)

  /** Build the pipeline; flat-table configs may be supplied
    * (README.md:246 "not mandatory") — any encounter type without one
    * gets auto-config from metadata (README.md:247). With
    * `config.automatedFlattening = 1` and an EMPTY id list, every
    * encounter type with non-voided encounters is discovered and
    * flattened (README.md:136-137's one-flag mode) — the discovery is
    * one model-sized distinct over the encounter table.
    */
  def pipeline(
      config: EtlConfig,
      src: Sources,
      encounterTypeIds: Seq[Int],
      flatConfigs: Map[Int, FlatTableConfig] = Map.empty): EtlPipeline = {
    val p = new EtlPipeline(config)
    val effectiveIds =
      if (config.automatedFlattening == 1 && encounterTypeIds.isEmpty)
        graft.operators.ModelCollect.bounded(
          src.encounter.filter(col("voided") === 0 &&
              col("encounter_type").isNotNull)
            .select(col("encounter_type").cast("int")).distinct()
            .orderBy("encounter_type"),
          graft.operators.ModelCollect.MaxModelRows,
          "automated_flattening encounter types")
          .map(_.getInt(0)).toSeq
      else encounterTypeIds

    p.register(Stage("mamba_dim_person", Nil) { (_, _) =>
      src.person.filter(col("voided") === 0)
        .select("person_id", "uuid", "gender", "birthdate")
    })

    p.register(Stage("mamba_dim_encounter", Nil) { (_, _) =>
      src.encounter.filter(col("voided") === 0)
        .join(broadcast(src.encounterType
          .select(col("encounter_type_id").as("encounter_type"),
            col("uuid").as("encounter_type_uuid"),
            col("name").as("encounter_type_name"))),
          Seq("encounter_type"))
        .select("encounter_id", "uuid", "encounter_type",
          "encounter_type_uuid", "encounter_type_name",
          "patient_id", "encounter_datetime")
    })

    effectiveIds.foreach { et =>
      // config resolved at pipeline-construction (one metadata scan,
      // not one per run) because the WIDTH decides the stage list:
      // a >cap encounter type emits continuation-table stages
      // `…_<et>`, `…_<et>_1`, … (EtlConfig.columns, reference
      // README.md:130-131), each an independent chunked pivot
      // (Flatten.flattenObsSplit's shuffle argument)
      val cfg = flatConfigs.getOrElse(et,
        Flatten.autoConfig(src.obs, src.encounter, src.concept, et,
          locale = Some(config.locale)))
      Flatten.flattenObsSplit(src.obs,
          cfg.copy(tableName = s"mamba_flat_encounter_$et"), config.columns)
        .foreach { case (tableName, flat) =>
          p.register(Stage(tableName, Seq("mamba_dim_encounter")) {
            (_, deps) =>
              val encIds = deps("mamba_dim_encounter")
                .filter(col("encounter_type") === et)
                .select("encounter_id", "patient_id", "encounter_datetime")
              flat.join(encIds, Seq("encounter_id"), "inner")
          })
        }
    }

    p.register(Stage("mamba_fact_encounter_counts",
      Seq("mamba_dim_encounter", "mamba_dim_person")) { (_, deps) =>
      deps("mamba_dim_encounter")
        .join(deps("mamba_dim_person")
          .select(col("person_id").as("patient_id"), col("gender")),
          Seq("patient_id"))
        .groupBy("encounter_type_name", "gender")
        .agg(count(lit(1)).as("n_encounters"),
          countDistinct(col("patient_id")).as("n_patients"))
    })

    p
  }

  def run(spark: SparkSession, config: EtlConfig, src: Sources,
      encounterTypeIds: Seq[Int],
      flatConfigs: Map[Int, FlatTableConfig] = Map.empty): Map[String, DataFrame] =
    pipeline(config, src, encounterTypeIds, flatConfigs).run(spark)

  /** Source-contract pre-flight — the [[graft.operators.DataQuality]]
    * battery over exactly the assumptions the ETL silently leans on:
    * obs rows must carry their keys (a null encounter_id obs would
    * vanish from every flat table without a trace), voided must be a
    * 0/1 flag (the soft-delete filters test `=== 0`), encounter ids
    * must be unique (a dup would double its wide row after the pivot
    * join), and every obs must point at a real encounter (orphans
    * never surface in any output — silent data loss). One narrow agg
    * pass + the two dataset checks; report rows share the uniform
    * quality schema so they persist next to any other dq report.
    */
  def preflight(src: Sources): DataFrame = {
    import graft.operators.DataQuality
    DataQuality.check(src.obs, Seq(
        DataQuality.notNull("obs_id"),
        DataQuality.notNull("encounter_id"),
        DataQuality.notNull("concept_id"),
        DataQuality.inRange("voided", 0, 1)))
      .unionByName(DataQuality.unique(src.encounter, Seq("encounter_id")))
      .unionByName(DataQuality.referential(src.obs, src.encounter,
        "encounter_id", "encounter_id"))
  }

  /** [[run]] behind the pre-flight gate: a failed contract rule stops
    * the deployment loudly (listing the failing rules and their
    * violation counts) BEFORE any store table is touched — the
    * failure mode this buys out of is a bad drop flowing silently
    * into reports.
    */
  def runChecked(spark: SparkSession, config: EtlConfig, src: Sources,
      encounterTypeIds: Seq[Int],
      flatConfigs: Map[Int, FlatTableConfig] = Map.empty): Map[String, DataFrame] = {
    val failed = preflight(src).filter(!col("passed"))
      .select("rule", "n_violations")
      .collect() // collect-bound: one row per configured audit rule
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "source contract violated: " + failed.map(r =>
          s"${r.getString(0)} (${r.getLong(1)} violations)").mkString("; "))
    run(spark, config, src, encounterTypeIds, flatConfigs)
  }

  /** Month partition column for a flat store table — coarse enough
    * that partition counts stay bounded, fine enough that a tick's
    * rewrite is a sliver of the table (SURVEY §9.1).
    */
  private def withVisitMonth(df: DataFrame): DataFrame =
    df.withColumn("visit_month",
      date_format(col("encounter_datetime"), "yyyy-MM"))

  /** The install path persisted (reference mode 0, README.md:133-134
    * "delete and recreate"): dims and facts full-refresh (domain-
    * bounded), flat encounter tables written partitioned by visit
    * month so later ticks and report date filters prune directories.
    */
  def runPersisted(spark: SparkSession, config: EtlConfig, src: Sources,
      encounterTypeIds: Seq[Int], storeRoot: String,
      flatConfigs: Map[Int, FlatTableConfig] = Map.empty): Map[String, DataFrame] = {
    val results = run(spark, config, src, encounterTypeIds, flatConfigs)
    results.foreach { case (name, df) =>
      if (name.startsWith("mamba_flat_encounter_"))
        graft.sources.AnalysisStore.writeFull(
          withVisitMonth(df), s"$storeRoot/$name", Seq("visit_month"))
      else
        graft.sources.AnalysisStore.writeFull(df, s"$storeRoot/$name")
    }
    results
  }

  /** A scheduled tick persisted (reference mode 1, "only add/modify
    * what has changed"): obs changed since the bookmark identify the
    * stale encounters; ONLY their wide rows are re-pivoted and merged,
    * and the store write rewrites ONLY the month partitions those
    * encounters live in (dynamic partition overwrite + explicit
    * removeKeys, so a fully-voided encounter's row disappears from
    * its old month). Write amplification per tick tracks the delta.
    */
  def tickPersisted(spark: SparkSession, config: EtlConfig, src: Sources,
      encounterTypeId: Int, storeRoot: String,
      changedSince: Option[java.sql.Timestamp],
      flatConfigs: Map[Int, FlatTableConfig] = Map.empty): Unit = {
    val cfg = flatConfigs.getOrElse(encounterTypeId,
      Flatten.autoConfig(src.obs, src.encounter, src.concept,
        encounterTypeId, locale = Some(config.locale)))
    val changed = graft.operators.Incremental
      .changedSince(src.obs, changedSince, Seq("obs_datetime"))
      .select("encounter_id").distinct()
    val affected = src.obs.join(broadcast(changed), Seq("encounter_id"), "left_semi")
    val encIds = src.encounter.filter(col("voided") === 0)
      .filter(col("encounter_type") === encounterTypeId)
      .select("encounter_id", "patient_id", "encounter_datetime")
    val flatDelta = withVisitMonth(
      Flatten.flattenObs(affected, cfg).join(encIds, Seq("encounter_id")))
    graft.sources.AnalysisStore.writeIncrementalPartitioned(spark, flatDelta,
      s"$storeRoot/mamba_flat_encounter_$encounterTypeId",
      keys = Seq("encounter_id"), partitionBy = Seq("visit_month"),
      removeKeys = Some(changed))
  }
}
