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

  test("crash between overwrite and victim-dir delete: the token replay " +
    "removes the resurrected partition") {
    // simulate the r12-ADVICE crash: survivors landed, the
    // fully-victimized dir delete never ran, the token is still present
    val dir = freshTable()
    val scratch = s"${dir}_gc_scratch"
    spark.read.parquet(dir).filter(col("part") === "a")
      .join(Seq(10L).toDF("uid"), Seq("uid"), "left_anti")
      .select("row_id", "uid", "part") // scratch column order is free
      .write.mode("overwrite").parquet(scratch)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_graft_delete_token"),
      s"scratch\t$scratch\npartcol\tpart\nvictimdir\tpart=c\n")
    // partition c plays the resurrected fully-victimized dir
    assert(new java.io.File(s"$dir/part=c").exists())
    assert(Retention.recoverDelete(spark, dir))
    assert(!new java.io.File(s"$dir/part=c").exists(),
      "recovery must re-delete the victim dir")
    assert(!new java.io.File(s"$dir/_graft_delete_token").exists())
    assert(!new java.io.File(scratch).exists(), "scratch swept")
    assert(rows(dir) === Set(
      (2L, 20L, "a"), (4L, 30L, "b"), (5L, 40L, "b")))
    // and a clean table recovers as a no-op
    assert(!Retention.recoverDelete(spark, dir))
  }

  test("crash mid-commit leaving duplicated survivors: recovery rewrites " +
    "the partition to exactly the staged content") {
    val dir = freshTable()
    val scratch = s"${dir}_gc_scratch"
    spark.read.parquet(dir).filter(col("part") === "a")
      .join(Seq(10L).toDF("uid"), Seq("uid"), "left_anti")
      .select("row_id", "uid", "part")
      .write.mode("overwrite").parquet(scratch)
    // simulate a mixed commit: partition a holds BOTH its old files and
    // a landed survivor file — survivor row 2 is now duplicated
    val aDir = new java.io.File(s"$dir/part=a")
    val extra = spark.read.parquet(scratch).filter(col("part") === "a")
      .drop("part")
    extra.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.mixed_scratch")
    val part = new java.io.File(s"$dir/.mixed_scratch").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      aDir.toPath.resolve("part-mixed-dup.parquet"))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$dir/.mixed_scratch"))
    assert(spark.read.parquet(dir)
      .filter(col("row_id") === 2L).count() === 2L, "dup staged")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_graft_delete_token"),
      s"scratch\t$scratch\npartcol\tpart\n")
    assert(Retention.recoverDelete(spark, dir))
    // dynamic overwrite REPLACED partition a wholesale: the duplicate
    // and the victim rows are both gone, untouched partitions intact
    assert(rows(dir) === Set(
      (2L, 20L, "a"),
      (4L, 30L, "b"), (5L, 40L, "b"),
      (6L, 50L, "c"), (7L, 50L, "c")))
  }

  test("targetedDelete heals a crashed prior delete before running") {
    val dir = freshTable()
    val scratch = s"${dir}_gc_scratch"
    spark.read.parquet(dir).filter(col("part") === "a")
      .join(Seq(10L).toDF("uid"), Seq("uid"), "left_anti")
      .select("row_id", "uid", "part")
      .write.mode("overwrite").parquet(scratch)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_graft_delete_token"),
      s"scratch\t$scratch\npartcol\tpart\nvictimdir\tpart=c\n")
    // a NEW delete (different victim) first replays the token commit,
    // then runs its own delete on the healed table
    val (parts, deleted) = Retention.targetedDelete(
      spark, dir, "part", Seq(30L).toDF("uid"), "uid")
    assert(parts === 1L && deleted === 1L)
    assert(rows(dir) === Set((2L, 20L, "a"), (5L, 40L, "b")))
    assert(!new java.io.File(s"$dir/part=c").exists())
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
