package graft

import graft.operators.Retention
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("retention")
      .resolve("t").toString
    Seq(
      (1L, 10L, "a"), (2L, 20L, "a"), (3L, 10L, "a"),
      (4L, 30L, "b"), (5L, 40L, "b"),
      (6L, 50L, "c"), (7L, 50L, "c"))
      .toDF("row_id", "uid", "part")
      .write.partitionBy("part").parquet(dir)
    dir
  }

  private def rows(dir: String): Set[(Long, Long, String)] =
    spark.read.parquet(dir).select("row_id", "uid", "part")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet

  private def files(dir: String, part: String): Map[String, Long] = {
    val d = new java.io.File(s"$dir/part=$part")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("deletes exactly the victim rows, rewriting only hit partitions") {
    val dir = freshTable()
    val untouchedBefore = files(dir, "b")
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(10L).toDF("uid"), "uid")
    assert(parts === 1L)   // uid 10 lives only in partition a
    assert(deleted === 2L) // rows 1 and 3
    assert(rows(dir) === Set(
      (2L, 20L, "a"),
      (4L, 30L, "b"), (5L, 40L, "b"),
      (6L, 50L, "c"), (7L, 50L, "c")))
    // partition-level IO contract: partitions without victims keep
    // their files byte-for-byte (same names, same mtimes)
    assert(files(dir, "b") === untouchedBefore)
  }

  test("a fully-victimized partition's directory is removed") {
    val dir = freshTable()
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(50L).toDF("uid"), "uid")
    assert(parts === 1L && deleted === 2L)
    assert(!new java.io.File(s"$dir/part=c").exists())
    assert(rows(dir).map(_._3) === Set("a", "b"))
  }

  test("idempotent: a second call finds nothing and touches nothing") {
    val dir = freshTable()
    Retention.targetedDelete(spark, dir, "part", Seq(10L).toDF("uid"), "uid")
    val snapshot = rows(dir)
    val aFiles = files(dir, "a")
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(10L).toDF("uid"), "uid")
    assert(parts === 0L && deleted === 0L)
    assert(rows(dir) === snapshot)
    assert(files(dir, "a") === aFiles)
  }

  test("hive-escaped and null partition values delete correctly") {
    // Spark escapes special chars in partition dirs (US:east ->
    // US%3Aeast) and routes null to __HIVE_DEFAULT_PARTITION__; a raw
    // path interpolation (or an IN filter, which never matches null)
    // would silently resurrect victims in exactly these partitions
    val dir = java.nio.file.Files.createTempDirectory("retention-esc")
      .resolve("t").toString
    Seq(
      (1L, 10L, "US:east"), (2L, 10L, "US:east"),
      (3L, 20L, null.asInstanceOf[String]),
      (4L, 30L, null.asInstanceOf[String]),
      (5L, 40L, "plain"))
      .toDF("row_id", "uid", "part")
      .write.partitionBy("part").parquet(dir)
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(10L, 20L).toDF("uid"), "uid")
    assert(parts === 2L, "US:east and the null partition")
    assert(deleted === 3L)
    val left = spark.read.parquet(dir).select("row_id", "uid", "part")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(left === Set(
      (4L, 30L, None), (5L, 40L, Some("plain"))))
    assert(!new java.io.File(s"$dir/part=US%3Aeast").exists(),
      "fully-victimized escaped partition dir must be removed")
  }

  test("victims spanning several partitions rewrite each of them") {
    val dir = freshTable()
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(20L, 30L).toDF("uid"), "uid")
    assert(parts === 2L && deleted === 2L)
    assert(rows(dir) === Set(
      (1L, 10L, "a"), (3L, 10L, "a"),
      (5L, 40L, "b"),
      (6L, 50L, "c"), (7L, 50L, "c")))
  }
}
