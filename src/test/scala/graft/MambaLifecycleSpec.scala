package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.examples.MambaEtlJob
import graft.model.EtlConfig
import graft.reports.ReportRegistry

/** The reference's full lifecycle end-to-end on an OpenMRS-shaped
  * fixture (SURVEY §3 E1-E3): sources → dims → per-type flat tables
  * (auto-config) → derived fact → parameterized report SQL over the
  * registered views. This is the "a MambaETL user switches engines"
  * test.
  */
class MambaLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)

  private def sources: MambaEtlJob.Sources = MambaEtlJob.Sources(
    person = Seq(
      (1L, "p-uuid-1", "F", d("1990-03-04"), 0),
      (2L, "p-uuid-2", "M", d("1985-07-21"), 0),
      (3L, "p-uuid-3", "F", d("2001-11-30"), 1) // voided
    ).toDF("person_id", "uuid", "gender", "birthdate", "voided"),
    encounterType = Seq(
      (7, "et-uuid-anc", "ANC"), (8, "et-uuid-hts", "HTS")
    ).toDF("encounter_type_id", "uuid", "name"),
    encounter = Seq(
      (10L, "e-10", 7, 1L, ts("2024-02-01 09:00:00"), 0),
      (11L, "e-11", 7, 2L, ts("2024-02-02 10:00:00"), 0),
      (12L, "e-12", 8, 1L, ts("2024-02-03 11:00:00"), 0),
      (13L, "e-13", 7, 1L, ts("2024-02-04 12:00:00"), 1) // voided
    ).toDF("encounter_id", "uuid", "encounter_type", "patient_id",
      "encounter_datetime", "voided"),
    concept = Seq(
      (100L, "Weight (kg)", "Numeric"),
      (200L, "HIV Result", "Coded"),
      (300L, "Counselor Notes", "Text")
    ).toDF("concept_id", "name", "datatype"),
    obs = Seq(
      (1L, 10L, 100L, Some(61.5), None: Option[String], None: Option[String], ts("2024-02-01 09:05:00"), 0),
      (2L, 10L, 200L, None, None, Some("NEGATIVE"), ts("2024-02-01 09:06:00"), 0),
      (3L, 11L, 100L, Some(82.0), None, None, ts("2024-02-02 10:05:00"), 0),
      (4L, 12L, 200L, None, None, Some("POSITIVE"), ts("2024-02-03 11:05:00"), 0),
      (5L, 12L, 300L, None, Some("follow up"), None, ts("2024-02-03 11:06:00"), 0),
      (6L, 13L, 100L, Some(90.0), None, None, ts("2024-02-04 12:05:00"), 0)
    ).toDF("obs_id", "encounter_id", "concept_id", "value_numeric",
      "value_text", "value_coded", "obs_datetime", "voided"))

  private lazy val outputs: Map[String, DataFrame] =
    MambaEtlJob.run(spark, EtlConfig("/src", "/out"), sources, Seq(7, 8))

  test("dims are cleaned projections (voided rows dropped)") {
    assert(outputs("mamba_dim_person").count() == 2)
    val enc = outputs("mamba_dim_encounter")
    assert(enc.count() == 3) // encounter 13 voided
    assert(enc.filter($"encounter_type_name" === "ANC").count() == 2)
  }

  test("per-type flat tables auto-configure from metadata") {
    val anc = outputs("mamba_flat_encounter_7")
    // ANC obs only reference Weight → one auto column + enc metadata
    assert(anc.columns.contains("weight_kg_"))
    val byEnc = anc.orderBy("encounter_id").collect()
    assert(byEnc.length == 2)
    assert(byEnc(0).getAs[Double]("weight_kg_") == 61.5)
    val hts = outputs("mamba_flat_encounter_8")
    assert(hts.columns.contains("hiv_result") && hts.columns.contains("counselor_notes"))
    val h = hts.collect().head
    assert(h.getAs[String]("hiv_result") == "POSITIVE")
    assert(h.getAs[String]("counselor_notes") == "follow up")
  }

  test("automated_flattening=1 with zero configs flattens every type " +
      "with live encounters, identically to the explicit-id run") {
    // the reference's one-flag mode (README.md:136-137): no id list,
    // no per-type config — types {7, 8} come from the encounter
    // table's live rows (13 is voided and type-7 anyway)
    val auto = MambaEtlJob.run(spark,
      EtlConfig("/src", "/out", automatedFlattening = 1), sources, Seq())
    assert(auto.keySet == outputs.keySet)
    Seq("mamba_flat_encounter_7", "mamba_flat_encounter_8",
      "mamba_fact_encounter_counts").foreach { t =>
      assertSameRows(auto(t), outputs(t))
    }
    // flag OFF + empty ids = just the dims and the fact, no flats —
    // the explicit contract the flag exists to change
    val off = MambaEtlJob.run(spark,
      EtlConfig("/src", "/out"), sources, Seq())
    assert(!off.keySet.exists(_.startsWith("mamba_flat_encounter_")))
    // explicit ids win over discovery when both are given
    val explicit = MambaEtlJob.run(spark,
      EtlConfig("/src", "/out", automatedFlattening = 1), sources, Seq(8))
    assert(explicit.keySet.filter(_.startsWith("mamba_flat_encounter_"))
      == Set("mamba_flat_encounter_8"))
  }

  test("derived fact aggregates over dims in base→derived order") {
    val fact = outputs("mamba_fact_encounter_counts")
      .orderBy("encounter_type_name", "gender")
      .as[(String, String, Long, Long)].collect()
    assert(fact.toSeq == Seq(
      ("ANC", "F", 1L, 1L), ("ANC", "M", 1L, 1L), ("HTS", "F", 1L, 1L)))
  }

  test("persisted lifecycle: install partitions by month; a tick rewrites only touched months") {
    import org.apache.spark.sql.functions.col
    // widen the fixture across two months so partition pruning is visible
    val extraEnc = Seq((14L, "e-14", 7, 2L, ts("2024-03-05 09:00:00"), 0))
      .toDF("encounter_id", "uuid", "encounter_type", "patient_id",
        "encounter_datetime", "voided")
    val extraObs = Seq((7L, 14L, 100L, Some(70.0), None: Option[String],
      None: Option[String], ts("2024-03-05 09:10:00"), 0))
      .toDF("obs_id", "encounter_id", "concept_id", "value_numeric",
        "value_text", "value_coded", "obs_datetime", "voided")
    val src = sources.copy(
      encounter = sources.encounter.unionByName(extraEnc),
      obs = sources.obs.unionByName(extraObs))
    val cfgE = EtlConfig("/src", "/out")
    val root = java.nio.file.Files.createTempDirectory("mambastore").toString
    MambaEtlJob.runPersisted(spark, cfgE, src, Seq(7, 8), root)
    val flat7 = s"$root/mamba_flat_encounter_7"
    def snapMarch(): Seq[(String, Long, Long)] =
      new java.io.File(s"$flat7/visit_month=2024-03").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSeq.sortBy(_._1)
    val marchBefore = snapMarch()
    assert(marchBefore.nonEmpty, "install must lay out month partitions")
    Thread.sleep(10)

    // tick: a late-arriving obs updates encounter 10 (February); the
    // bookmark admits only the new row
    val tickObs = Seq((8L, 10L, 100L, Some(63.0), None: Option[String],
      None: Option[String], ts("2024-03-10 08:00:00"), 0))
      .toDF("obs_id", "encounter_id", "concept_id", "value_numeric",
        "value_text", "value_coded", "obs_datetime", "voided")
    val src2 = src.copy(obs = src.obs.unionByName(tickObs))
    MambaEtlJob.tickPersisted(spark, cfgE, src2, 7, root,
      changedSince = Some(ts("2024-03-06 00:00:00")))

    assert(snapMarch() == marchBefore,
      "a February-only tick must not rewrite the March partition")
    val stored = spark.read.parquet(flat7)
    assert(stored.filter(col("encounter_id") === 10)
      .collect().head.getAs[Double]("weight_kg_") == 63.0)

    // N-ticks ≡ full: the ticked store equals a fresh install from the
    // final obs state
    val root2 = java.nio.file.Files.createTempDirectory("mambastore2").toString
    MambaEtlJob.runPersisted(spark, cfgE, src2, Seq(7), root2)
    val cols = stored.columns.sorted.map(col).toSeq
    assertSameRows(stored.select(cols: _*),
      spark.read.parquet(s"$root2/mamba_flat_encounter_7").select(cols: _*))
  }

  test("report SQL runs over the registered views with typed params") {
    outputs // force pipeline run (registers temp views)
    val registry = ReportRegistry.fromJson(
      """{"report_definitions": [{
           "report_name": "ANC clients in window",
           "report_id": "anc_clients",
           "report_sql": {
             "sql_query": "SELECT COUNT(DISTINCT e.patient_id) AS total_clients FROM mamba_dim_encounter e WHERE e.encounter_type_name = :etype AND e.encounter_datetime >= CAST(:date_from AS TIMESTAMP)",
             "query_params": [
               {"name": "etype", "type": "VARCHAR(255)"},
               {"name": "date_from", "type": "VARCHAR(255)"}]}}]}""")
    val r = registry.run(spark, "anc_clients",
      Map("etype" -> "ANC", "date_from" -> "2024-01-01"))
    assert(r.as[Long].head() == 2L)
  }

  test("the three VERBATIM reference reports.json entries run end-to-end") {
    // the reports.json block exactly as the reference README publishes
    // it (reference README.md:289-330) — MySQL dialect, bare
    // stored-procedure-style param identifiers and all. This is the
    // "a MambaETL user pastes their reports.json unchanged" test.
    val verbatim = """
    {
      "report_definitions": [
        {
          "report_name": "MCH Mother HIV Status",
          "report_id": "mother_hiv_status",
          "report_sql": {
            "sql_query": "SELECT pm.hiv_test_result AS hiv_test_result FROM mamba_flat_encounter_pmtct_anc pm INNER JOIN mamba_dim_person p ON pm.client_id = p.person_id WHERE p.uuid = person_uuid AND pm.ptracker_id = ptracker_id",
            "query_params": [
              { "name": "ptracker_id", "type": "VARCHAR(255)" },
              { "name": "person_uuid", "type": "VARCHAR(255)" }
            ]
          }
        },
        {
          "report_name": "MCH Total Deliveries",
          "report_id": "total_deliveries",
          "report_sql": {
            "sql_query": "SELECT COUNT(*) AS total_deliveries FROM mamba_dim_encounter e inner join mamba_dim_encounter_type et on e.encounter_type = et.encounter_type_id WHERE et.uuid = '6dc5308d-27c9-4d49-b16f-2c5e3c759757' AND DATE(e.encounter_datetime) > CONCAT(YEAR(CURDATE()), '-01-01 00:00:00')",
            "query_params": []
          }
        },
        {
          "report_name": "MCH HIV-Exposed Infants",
          "report_id": "total_hiv_exposed_infants",
          "report_sql": {
            "sql_query": "SELECT COUNT(DISTINCT ei.infant_client_id) AS total_hiv_exposed_infants FROM mamba_fact_pmtct_exposedinfants ei INNER JOIN mamba_dim_person p ON ei.infant_client_id = p.person_id WHERE ei.encounter_datetime BETWEEN DATE_FORMAT(NOW(), '%Y-01-01') AND NOW() AND birthdate BETWEEN DATE_FORMAT(NOW(), '%Y-01-01') AND NOW()",
            "query_params": []
          }
        }
      ]
    }"""
    val registry = ReportRegistry.fromJson(verbatim)

    // reference-shaped fixture views with exactly the columns the
    // verbatim SQL touches. The SQL anchors on CURDATE()/NOW(), so
    // date-sensitive rows must hold on ANY run date: report 2 is
    // unbounded above and strictly > Jan 1, so Jan 2 of the current
    // year qualifies year-round; report 3 is [Jan 1, NOW()], so
    // "today at midnight" qualifies year-round (a fixed Feb date
    // would fail every January run)
    val year = java.time.Year.now.getValue
    val today = java.time.LocalDate.now.toString
    Seq((1L, "p-uuid-1", d(s"${year - 30}-03-04")),
        (2L, "p-uuid-2", d(s"${year - 25}-07-21")),
        (10L, "i-uuid-10", d(today)),              // infant born this year
        (11L, "i-uuid-11", d(s"${year - 2}-05-05")))
      .toDF("person_id", "uuid", "birthdate")
      .createOrReplaceTempView("mamba_dim_person")
    Seq((1L, "PT-001", "NEGATIVE"), (2L, "PT-002", "POSITIVE"))
      .toDF("client_id", "ptracker_id", "hiv_test_result")
      .createOrReplaceTempView("mamba_flat_encounter_pmtct_anc")
    Seq((7, "6dc5308d-27c9-4d49-b16f-2c5e3c759757"), (8, "other-uuid"))
      .toDF("encounter_type_id", "uuid")
      .createOrReplaceTempView("mamba_dim_encounter_type")
    Seq((100L, 7, ts(s"$year-01-02 09:00:00")),    // delivery, this year
        (101L, 7, ts(s"${year - 1}-12-31 09:00:00")), // last year → excluded
        (102L, 8, ts(s"$year-01-02 09:00:00")))    // other type → excluded
      .toDF("encounter_id", "encounter_type", "encounter_datetime")
      .createOrReplaceTempView("mamba_dim_encounter")
    Seq((10L, ts(s"$today 00:00:00")),             // infant seen this year
        (11L, ts(s"$today 00:00:00")),             // born earlier → excluded
        (10L, ts(s"$today 00:30:00")))             // same infant → DISTINCT
      .toDF("infant_client_id", "encounter_datetime")
      .createOrReplaceTempView("mamba_fact_pmtct_exposedinfants")

    // report 1: bare-identifier params bind through the dialect shim
    val hiv = registry.run(spark, "mother_hiv_status",
      Map("ptracker_id" -> "PT-002", "person_uuid" -> "p-uuid-2"))
    assert(hiv.columns.toSeq == Seq("hiv_test_result"))
    assert(hiv.as[String].collect().toSeq == Seq("POSITIVE"))

    // report 2: CURDATE()/YEAR()/DATE()/CONCAT through the shim
    assert(registry.run(spark, "total_deliveries").as[Long].head() == 1L)

    // report 3: DATE_FORMAT(NOW(), '%Y-01-01') %-token rewrite + the
    // doubly-BETWEEN join, COUNT(DISTINCT) collapsing the repeat visit
    assert(registry.run(spark, "total_hiv_exposed_infants")
      .as[Long].head() == 1L)
  }

  test("pre-flight gate: clean sources deploy; a corrupt drop stops loudly") {
    // the fixture satisfies the source contract
    val checked = MambaEtlJob.runChecked(
      spark, EtlConfig("/src", "/out"), sources, Seq(7))
    assert(checked("mamba_flat_encounter_7").count() == 2)

    // corrupt drop: an orphan obs (encounter 99 doesn't exist) and a
    // duplicated encounter id — both must be named in the failure
    val bad = sources.copy(
      encounter = sources.encounter.unionByName(
        Seq((10L, "e-10b", 7, 2L, ts("2024-02-05 09:00:00"), 0))
          .toDF("encounter_id", "uuid", "encounter_type", "patient_id",
            "encounter_datetime", "voided")),
      obs = sources.obs.unionByName(
        Seq((7L, 99L, 100L, Some(50.0), None: Option[String],
          None: Option[String], ts("2024-02-05 09:05:00"), 0))
          .toDF("obs_id", "encounter_id", "concept_id", "value_numeric",
            "value_text", "value_coded", "obs_datetime", "voided")))
    val e = intercept[IllegalStateException] {
      MambaEtlJob.runChecked(spark, EtlConfig("/src", "/out"), bad, Seq(7))
    }
    assert(e.getMessage.contains("unique(encounter_id)"), e.getMessage)
    assert(e.getMessage.contains("referential(encounter_id->encounter_id)"),
      e.getMessage)
  }
}
