package graft

import graft.sources.Export
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl round-trip (gzip) preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
      .toFile.getAbsolutePath
    val docs = Seq(
      (1L, "hello world", "en"),
      (2L, "hola \"mundo\"", "es"), // embedded quotes must survive
      (3L, null, "und")             // null field round-trips as absent
    ).toDF("doc_id", "text", "lang")
    Export.jsonl(docs, s"$dir/out")
    assert(new java.io.File(s"$dir/out").listFiles()
      .exists(_.getName.endsWith(".json.gz")), "expected gzip parts")
    val back = Export.readJsonl(spark, s"$dir/out", schema)
    assert(back.schema.fieldNames.toSeq === Seq("doc_id", "text", "lang"))
    val got = back.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .toSet
    assert(got === Set((1L, Some("hello world"), "en"),
      (2L, Some("hola \"mundo\""), "es"), (3L, None, "und")))
  }

  test("corrupt lines surface in _corrupt_record, FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl2")
      .toFile.getAbsolutePath
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en"}
        |not json at all
        |""".stripMargin)
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val rows = Export.readJsonl(spark, s"$dir/part.json", withCorrupt)
      .cache() // PERMISSIVE + corrupt-column reads need a materialized frame
    assert(rows.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(rows.filter(col("doc_id") === 1L).count() === 1)
    rows.unpersist()
    intercept[org.apache.spark.SparkException] {
      Export.readJsonl(spark, s"$dir/part.json", schema, mode = "FAILFAST")
        .collect()
    }
  }
}
