package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Targeted hard delete over a hive-partitioned parquet table — the
  * right-to-be-forgotten primitive every production lake needs (beyond
  * the reference's surface — first-class per the build brief).
  *
  * At 100 TB the naive shape (rewrite the whole table minus the
  * victims) is a full-table read AND write for a deletion list that
  * typically touches a sliver of partitions. This does the
  * partition-bounded version:
  *
  *  1. a victim-location scan reads ONLY (partCol, idCol) — column
  *     pruning at the parquet footer — semi-joined against the
  *     broadcast deletion list to find the AFFECTED partitions (a
  *     partition-count-bounded collect, never data-sized);
  *  2. the survivors of just those partitions are staged to a scratch
  *     dir (Spark refuses to overwrite a path it is reading — the
  *     scratch breaks the cycle, and its IO is affected-partition
  *     bounded, not table bounded);
  *  3. the staged survivors land back via DYNAMIC partition overwrite
  *     (`spark.sql.sources.partitionOverwriteMode=dynamic`): only the
  *     partitions present in the written data are replaced, untouched
  *     partitions keep their files byte-identical (spec-pinned by
  *     mtime);
  *  4. a partition whose EVERY row was a victim produces no output
  *     under dynamic overwrite and would silently keep its old files —
  *     those directories are deleted explicitly through the Hadoop
  *     FileSystem of the table path.
  *
  * Idempotent: a second call with the same deletion list finds zero
  * affected partitions and touches nothing.
  *
  * ==Crash recovery (the run token)==
  * The commit (step 3 + step 4) is per-partition, not transactional: a
  * crash between the dynamic overwrite and the explicit
  * fully-victimized-dir deletes would RESURRECT those victims, and a
  * crash mid-commit of the overwrite itself can leave an affected
  * partition partially committed (ADVICE r12). A plain rerun repairs
  * the resurrection case (the victims are found again) but NOT a
  * duplicated-survivor partition — the rewrite keeps every non-victim
  * row, duplicates included.
  *
  * So the commit rides a RUN TOKEN (`_graft_delete_token` in the table
  * dir, underscore-prefixed = invisible to parquet readers), written
  * atomically AFTER the survivor staging and removed only after both
  * commit halves land and the scratch is swept. The token names the
  * scratch dir and the affected/fully-victimized partition segments;
  * [[targetedDelete]] starts by [[recoverDelete]]-ing any token it
  * finds: re-land every surviving partition from the still-present
  * scratch (dynamic overwrite REPLACES whole partitions, so
  * mixed/duplicated states rewrite to exactly the staged content) and
  * re-delete the fully-victimized dirs (best-effort existence — a
  * half-committed run may have deleted some already). Every recovery
  * step is idempotent, so a crash during recovery re-enters the same
  * path on the next run.
  */
object Retention {

  /** A partition value's on-disk directory segment — Spark hive-escapes
    * special characters on write (`:`, `%`, `=`, control chars → `%XX`)
    * and routes null values to `__HIVE_DEFAULT_PARTITION__`; a raw
    * string interpolation would miss both and silently leave victim
    * files in place.
    */
  private def partDirName(partCol: String, value: Any): String = {
    val ec = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val v = if (value == null) ec.DEFAULT_PARTITION_NAME
      else ec.escapePathName(value.toString)
    s"${ec.escapePathName(partCol)}=$v"
  }

  private def tokenPath(tableDir: String) =
    new org.apache.hadoop.fs.Path(
      s"${tableDir.stripSuffix("/")}/_graft_delete_token")

  /** Land the staged survivors over the table via dynamic partition
    * overwrite, drop the fully-victimized partition dirs, then clear
    * the token + scratch — the shared commit tail of a fresh delete and
    * a recovery replay. `requireVictimDirs` is strict on the fresh path
    * (a missing dir there means the write layout lied — fail loud) and
    * lenient on recovery (the crashed run may have deleted some).
    */
  private def commitStaged(spark: SparkSession, tableDir: String,
                           partCol: String, scratch: String,
                           victimDirSegments: Seq[String],
                           requireVictimDirs: Boolean): Unit = {
    val staged = spark.read.parquet(scratch)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      // an all-victim delete stages ZERO survivors; dynamic overwrite of
      // an empty frame writes nothing (and Spark rejects empty-schema
      // writes), so only land when there is something to land
      if (!staged.isEmpty)
        staged.write.mode("overwrite").partitionBy(partCol)
          .parquet(tableDir)
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    val hconf = spark.sessionState.newHadoopConf()
    for (seg <- victimDirSegments) {
      val dir = new org.apache.hadoop.fs.Path(
        s"${tableDir.stripSuffix("/")}/$seg")
      val hfs = dir.getFileSystem(hconf)
      if (requireVictimDirs) {
        require(hfs.exists(dir),
          s"targetedDelete: fully-victimized partition dir not found " +
            s"where the write layout says it must be: $dir")
        require(hfs.delete(dir, true),
          s"targetedDelete: could not remove victim partition $dir")
      } else if (hfs.exists(dir)) {
        require(hfs.delete(dir, true),
          s"targetedDelete: could not remove victim partition $dir")
      }
    }
    // commit complete: clear the token FIRST (after this point a crash
    // loses only the scratch sweep, which the next token-free run
    // cannot misread), then the scratch
    val tok = tokenPath(tableDir)
    tok.getFileSystem(hconf).delete(tok, false)
    val sp = new org.apache.hadoop.fs.Path(scratch)
    sp.getFileSystem(hconf).delete(sp, true)
  }

  /** Replay an interrupted delete's commit from its run token, if one
    * exists. Safe to call on a clean table (no token → no-op, returns
    * false). [[targetedDelete]] calls this first, so a crashed delete
    * heals on the next delete against the same table; call it directly
    * to heal without scheduling new deletions.
    */
  def recoverDelete(spark: SparkSession, tableDir: String): Boolean = {
    val tok = tokenPath(tableDir)
    val hfs = tok.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(tok)) return false
    val in = hfs.open(tok)
    val content =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val fields = content.linesIterator.filter(_.nonEmpty)
      .map(_.split("\t", 2)).collect { case Array(k, v) => (k, v) }.toSeq
    val scratch = fields.collectFirst { case ("scratch", v) => v }
      .getOrElse(throw new IllegalStateException(
        s"targetedDelete: run token $tok has no scratch line"))
    val partCol = fields.collectFirst { case ("partcol", v) => v }
      .getOrElse(throw new IllegalStateException(
        s"targetedDelete: run token $tok has no partcol line"))
    val victimSegs = fields.collect { case ("victimdir", v) => v }
    commitStaged(spark, tableDir, partCol, scratch, victimSegs,
      requireVictimDirs = false)
    true
  }

  /** Delete every row of `tableDir` whose `idCol` appears in `victims`,
    * rewriting only affected partitions. Returns
    * (affected partitions, rows deleted). Begins by replaying any
    * interrupted prior delete's token (see the object scaladoc).
    */
  def targetedDelete(spark: SparkSession, tableDir: String,
                     partCol: String, victims: DataFrame,
                     idCol: String): (Long, Long) = {
    recoverDelete(spark, tableDir)
    val v = broadcast(victims.select(idCol).distinct())
    val table = spark.read.parquet(tableDir)
    // bounded by the table's partition count, never by rows
    val affected = table.select(partCol, idCol)
      .join(v, Seq(idCol), "left_semi")
      .select(partCol).distinct()
      .collect().map(_.get(0))
    if (affected.isEmpty) return (0L, 0L)
    // SQL IN never matches null, so a null partition value (the
    // __HIVE_DEFAULT_PARTITION__ rows) needs its own disjunct or its
    // victims would be counted affected yet never rewritten
    val nonNull = affected.filter(_ != null)
    val hitPart =
      if (nonNull.length == affected.length)
        col(partCol).isInCollection(nonNull)
      else if (nonNull.isEmpty) col(partCol).isNull
      else col(partCol).isInCollection(nonNull) || col(partCol).isNull
    val hit = table.filter(hitPart)
    val before = hit.count()
    val keep = hit.join(v, Seq(idCol), "left_anti")
    val scratch = s"${tableDir.stripSuffix("/")}_gc_scratch"
    keep.write.mode("overwrite").parquet(scratch)
    val staged = spark.read.parquet(scratch)
    // one scratch scan: survivor count + surviving-partition set
    val perPart = staged.groupBy(partCol).count().collect()
    val after = perPart.map(_.getLong(1)).sum
    val surviving = perPart.map(_.get(0)).toSet
    val victimSegs = affected.filterNot(surviving)
      .map(p => partDirName(partCol, p)).toSeq
    // the run token is the commit's crash guard: written atomically
    // (create-truncate of a tiny file) after staging, removed by
    // commitStaged after both commit halves land
    val hconf = spark.sessionState.newHadoopConf()
    val tok = tokenPath(tableDir)
    val out = tok.getFileSystem(hconf).create(tok, true)
    try out.write(
      (Seq(s"scratch\t$scratch", s"partcol\t$partCol") ++
        victimSegs.map(s => s"victimdir\t$s"))
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    commitStaged(spark, tableDir, partCol, scratch, victimSegs,
      requireVictimDirs = true)
    (affected.length.toLong, before - after)
  }
}
