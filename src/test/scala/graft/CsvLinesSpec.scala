package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{CsvLines, Tables}

/** Line-oriented CSV ingest: every-line-lands-somewhere, corrupt
  * quarantine with raw preservation, positional schema, the parquet
  * round-trip, and the embedded-newline write refusal.
  */
class CsvLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType)))

  private def writeLines(lines: Seq[String], name: String): String = {
    val dir = Files.createTempDirectory("csvl")
    val f = dir.resolve(name)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("clean + corrupt + blank lines land in exactly one place each") {
    val path = writeLines(Seq(
      "1,alpha",
      "not-a-number,beta", // type mismatch on id: corrupt
      "",
      "3,\"gamma, quoted\"", // quoted comma: fine
      "4,",                  // missing value: null, drift not corruption
      "   ",
      "5,delta,extra"        // extra field: corrupt (malformed record)
    ), "drop.csv")

    val good = CsvLines.read(spark, path, schema)
      .as[(Option[Long], Option[String])].collect().toSet
    assert(good == Set(
      (Some(1L), Some("alpha")), (Some(3L), Some("gamma, quoted")),
      (Some(4L), None)))

    val bad = CsvLines.quarantine(spark, path, schema)
      .select("raw").as[String].collect().toSet
    assert(bad == Set("not-a-number,beta", "5,delta,extra"),
      s"quarantine keeps raw lines verbatim, got $bad")
    assert(good.size + bad.size == 5, "5 non-blank lines conserved")
  }

  test("documents round-trips parquet -> csv -> engine unchanged") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = Files.createTempDirectory("csvrt").resolve("docs").toString
    CsvLines.write(docs, dir)
    val docSchema = StructType(docs.schema.fields.toSeq)
    val back = CsvLines.read(spark, dir, docSchema)
    assert(CsvLines.quarantine(spark, dir, docSchema).count() == 0)
    assert(docs.orderBy("doc_id").collect().toSeq ==
      back.orderBy("doc_id").collect().toSeq, "round-trip must be lossless")
  }

  test("write refuses string columns with embedded newlines, naming them") {
    val bad = Seq((1L, "ok", "line\nbreak")).toDF("id", "a", "b")
    val e = intercept[IllegalArgumentException] {
      CsvLines.write(bad,
        Files.createTempDirectory("csvbad").resolve("x").toString)
    }
    assert(e.getMessage.contains("b") && !e.getMessage.contains(" a,"),
      e.getMessage)
  }

  test("a schema already claiming the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      CsvLines.read(spark, "/tmp/nope.csv",
        StructType(Seq(StructField(CsvLines.CorruptCol, StringType))))
    }
  }
}
