package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Sources, sinks and table maintenance: roundtrips,
  * hive partitioning, MERGE/SCD2/CDC, compaction, z-order.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object TableQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order (Morton) layout key per ping over the MX-quadrant bounding
    // box — the spatial-layout sort key (LayoutSpec pins the
    // partition-tightness property; here the key is oracle-checked
    // bit-for-bit against a 16-round interleave in SQL)
    "q63_zorder" -> ((s, d) =>
      Tables.pings(s, d).select(col("uid"), col("event_id"),
        graft.sources.Layout.zValue(col("latitude"), col("longitude"),
          19.0, 0.05, -99.0, 0.05, 16).as("z"))),

    // S3/K3/K1 roundtrip gate (reference read_localize_write.py:50-68):
    // events -> parquet copy (K1 sink) -> headerless gz CSV dump (K3) ->
    // CSV scan (S3, codec inferred from .gz) -> positional rename ->
    // casts -> accuracy filter -> uid anonymization -> per-bucket
    // aggregate. Every staged value is integer-derived (the doubles are
    // integer-valued and Java doubles round-trip via toString), so the
    // DuckDB oracle reproduces the whole pipeline from the ORIGINAL
    // parquet exactly — a value lost or mangled anywhere in the
    // write/read chain breaks the hash.
    "q95_csv_roundtrip" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q95:$d") { out =>
        val raw = Tables.events(s, d).select(
          concat(lit("u"), col("user_id").cast("string")).as("_c0"),
          col("event_type").as("_c1"),
          (col("user_id") % 90).cast("double").as("_c2"),
          (col("event_id") % 180).cast("double").as("_c3"),
          (col("event_id") % 50).cast("double").as("_c4"),
          expr("ts div 1000000").as("_c5"))
        graft.sources.Export.parquet(raw, s"$out/pq")
        graft.sources.Export.csvGz(
          s.read.parquet(s"$out/pq").repartition(4), s"$out/csv")
      }
      val raw = graft.sources.Ingest.readCsv(s, s"$dir/csv")
      val renamed = graft.sources.Ingest.renameRaw(raw, Map(
        "_c0" -> "uid", "_c2" -> "latitude", "_c3" -> "longitude",
        "_c5" -> "timestamp", "_c4" -> "error"))
        .select(col("uid"),
          col("latitude").cast("double").as("latitude"),
          col("longitude").cast("double").as("longitude"),
          col("error").cast("double").as("error"),
          col("timestamp").cast("long").as("timestamp"))
      graft.sources.Ingest.filterAccuracy(renamed, 30.0)
        .withColumn("uid_hash", graft.sources.Ingest.uidHash(col("uid")))
        .groupBy(pmod(col("uid_hash"), lit(8)).as("bucket"))
        .agg(count(lit(1)).as("n_pings"),
          countDistinct(col("uid_hash")).as("n_uid"),
          sum(col("latitude")).cast("long").as("sum_lat"),
          sum(col("longitude")).cast("long").as("sum_lon"),
          max(col("timestamp")).as("max_ts_ms"))
    }),

    // K2/S2 roundtrip gate (reference read_localize_write.py:29-33):
    // events keyed by UTC day -> hive-partitioned parquet write (K2) ->
    // partition-pruned read-back (S2: the dayofmonth predicate lands in
    // PartitionFilters, the scan never lists the pruned day directories
    // — PlanAuditSpec pins it) -> per-day aggregate vs the original
    // parquet in DuckDB.
    "q96_partitioned_roundtrip" -> ((s, d) => {
      val dir = stagedDailyEvents(s, d)
      Tables.tune(s).read.parquet(dir)
        .filter(dayofmonth(col("date_trunc")) <= 15)
        .groupBy(col("date_trunc").cast("date").as("dt"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id")).as("sum_eid"),
          max(col("ts_s")).as("max_ts_s"))
    }),

    // JSONL roundtrip gate (corpus-interchange sink/source, beyond the
    // reference's surface): documents -> gzip JSONL dump -> explicit-
    // schema FAILFAST scan -> per-source aggregate. The summed portable
    // md5 text hash pins byte-exact string fidelity through the JSON
    // escape/unescape cycle — one mangled character anywhere in the
    // corpus flips the hash.
    "q99_jsonl_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.sources.Staging.once(s"q99:$d") { out =>
        graft.sources.Export.jsonl(
          Tables.documents(s, d).select(
            col("doc_id").cast("long").as("doc_id"), col("text"),
            col("lang"), col("source"),
            col("n_chars").cast("long").as("n_chars")), out)
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      graft.sources.Export.readJsonl(s, dir, schema, mode = "FAILFAST")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"),
          sum(graft.functions.TextFunctions.portableHash32(col("text")))
            .as("sum_text_hash"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    }),

    // ORC roundtrip gate: the second columnar production format (beyond
    // parquet). lineitem -> ORC write -> ORC scan with filter/projection
    // pushdown -> aggregate vs the original parquet in DuckDB. Proves
    // the format seam, not new operator logic — a user switching sinks
    // keeps identical results.
    "q103_orc_roundtrip" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q103:$d") { out =>
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag",
            "l_extendedprice")
          .write.mode("overwrite").orc(out)
      }
      s.read.orc(dir)
        .filter(col("l_quantity") > 25.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("sum_price_cents"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // Bucketed co-located join gate: both join sides written
    // bucketed+sorted on the order key (Bucketing.writeBucketed), so the
    // join runs with NO exchange on either side — the shuffle-once-at-
    // ingest layout a 100 TB fact table needs (PlanAuditSpec pins the
    // single remaining exchange to the final aggregate). Result parity
    // vs the plain parquet join oracle.
    "q105_bucketed_join" -> ((s, d) => {
      val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
      val (ordersT, liT) = (s"graft_q105_orders$tag", s"graft_q105_li$tag")
      // A catalog entry alone does not prove the data still exists: the
      // derby metastore persists in the working dir across sessions,
      // but the staged temp dirs it points at are removed by Staging's
      // shutdown hook at JVM exit — a table registered by a PREVIOUS
      // session lists as existing here and scans as empty (r13: q105
      // returned 0 rows to a fresh Verify after a bench session's hook
      // cleaned its staging). Trust a table only if it still has rows;
      // otherwise drop the pair and rebuild into THIS session's staging.
      def live(t: String): Boolean =
        s.catalog.tableExists(t) &&
          scala.util.Try(!s.table(t).isEmpty).getOrElse(false)
      if (!(live(ordersT) && live(liT))) {
        s.sql(s"DROP TABLE IF EXISTS $ordersT")
        s.sql(s"DROP TABLE IF EXISTS $liT")
        val dir = graft.sources.Staging.once(s"q105:$d") { _ => () }
        graft.sources.Bucketing.writeBucketed(
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          ordersT, s"$dir/orders", "o_orderkey", 8)
        graft.sources.Bucketing.writeBucketed(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
          liT, s"$dir/lineitem", "l_orderkey", 8)
      }
      s.table(liT)
        .join(s.table(ordersT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),

    // Token-balanced sharded sink gate: documents packed into ~100k-char
    // shards (contiguous in doc_id order, one parquet file per shard) and
    // read back; per-shard membership is pinned by the same prefix-sum
    // arithmetic as the q70 packing oracle.
    "q106_sharded_export" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q106:$d") { out =>
        graft.sources.Export.parquetShardedByTokens(
          Tables.documents(s, d).select(col("doc_id"),
            col("n_chars").cast("long").as("n_chars")),
          "n_chars", 100000L, out, col("doc_id"))
      }
      s.read.parquet(dir)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    }),

    // Versioned snapshot upsert gate: v1 = full corpus labeled 'old',
    // then an upsert replaces every doc_id % 3 == 0 row with 'new'; the
    // latest (_SUCCESS-gated) snapshot must show exactly the merged
    // keyed state — the plain-parquet MERGE pattern of the daily flow.
    "q107_snapshot_upsert" -> ((s, d) => {
      val root = graft.sources.Staging.once(s"q107:$d") { out =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        graft.sources.DailyBatch.upsertSnapshot(s, out,
          docs.withColumn("label", lit("old")), Seq("doc_id"))
        graft.sources.DailyBatch.upsertSnapshot(s, out,
          docs.filter(col("doc_id") % 3 === 0)
            .withColumn("label", lit("new")), Seq("doc_id"))
        ()
      }
      s.read.parquet(
        graft.sources.DailyBatch.latestSnapshot(s, root).get)
        .groupBy("source", "label")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"))
    }),

    // Per-day batch driver gate: forEachDay runs a per-user count over
    // each date partition in isolation (partition-pruned reads, one
    // output dir per day); the union of the per-day outputs must equal
    // the single-job whole-history aggregate — the reference's
    // operational day loop, result-identical to the Spark-first form.
    "q108_daily_batch" -> ((s, d) => {
      val src = stagedDailyEvents(s, d)
      val out = graft.sources.Staging.once(s"q108:$d") { o =>
        val errs = graft.sources.DailyBatch.forEachDay(s, src, o) {
          (day, _) => day.groupBy("user_id").agg(count(lit(1)).as("n_events"))
        }
        require(errs.isEmpty, s"per-day failures: $errs")
      }
      s.read.parquet(out)
        .groupBy(col("date_trunc").cast("date").as("dt"))
        .agg(count(lit(1)).as("n_users"), sum("n_events").as("n_events"))
    }),

    // S5 gate: a driver-built in-memory dim (toDF -> LocalTableScan)
    // broadcast-joined against a fact scan — the "attach a small config
    // frame to big data" ingest shape. Oracle = an inline VALUES list.
    "q98_inline_dim" -> ((s, d) => {
      import s.implicits._
      val dim = Seq(
        ("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
        ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
        .toDF("o_orderpriority", "tier")
      Tables.orders(s, d)
        .join(broadcast(dim), Seq("o_orderpriority"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("sum_cents"))
    }),

    // Schema-evolution roundtrip: v1 written without o_orderpriority,
    // v2 with it; a mergeSchema read unifies both (v1 rows surface the
    // new column as null) and the aggregate must equal the UNION-ALL
    // oracle — the "historical partitions predate the new column"
    // contract every long-lived 100 TB dataset needs.
    "q112_schema_evolution" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q112:$d") { out =>
        val o = Tables.orders(s, d)
        o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$out/v1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").parquet(s"$out/v2")
      }
      s.read.option("mergeSchema", "true")
        .parquet(s"$dir/v1", s"$dir/v2")
        .groupBy(coalesce(col("o_orderpriority"), lit("UNKNOWN"))
          .as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("sum_cents"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // Small-file compaction gate: events deliberately shattered into 40
    // files, compacted to byte-sized-target balanced files
    // (Export.compactParquet), read back and aggregated against the
    // SOURCE table's oracle — content-exact through the rewrite, file
    // count collapsed (asserted in SourcesSpec; the oracle pins content).
    "q118_compact" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q118:$d") { out =>
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .repartition(40)
          .write.mode("overwrite").parquet(s"$out/small")
        graft.sources.Export.compactParquet(s, s"$out/small",
          s"$out/compact", targetBytes = 1L << 20): Unit
      }
      s.read.parquet(s"$dir/compact")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
          countDistinct(col("user_id")).as("n_users"),
          min("event_id").as("min_ev"), max("event_id").as("max_ev"))
    }),

    // Targeted hard delete (the right-to-be-forgotten primitive):
    // events land partitioned by user-bucket, then
    // Retention.targetedDelete removes every user_id % 13 == 0 row by
    // rewriting ONLY the victim-bearing partitions (dynamic partition
    // overwrite; untouched partitions keep their files byte-identical —
    // RetentionSpec pins names+mtimes, plus emptied-partition drop and
    // idempotency). The read-back must equal the oracle's anti-filter
    // exactly. The delete runs once inside the staging block, so bench
    // passes and verify retries read the same post-delete table (and
    // the operation itself is idempotent anyway).
    "q250_targeted_delete" -> ((s, d) => {
      val dir = graft.sources.Staging.once(s"q250:$d") { out =>
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents"),
            pmod(col("user_id"), lit(7L)).as("bucket"))
          .write.partitionBy("bucket").parquet(out)
        val victims = s.read.parquet(out).select("user_id")
          .filter(pmod(col("user_id"), lit(13L)) === 0).distinct()
        graft.operators.Retention.targetedDelete(
          s, out, "bucket", victims, "user_id"): Unit
      }
      s.read.parquet(dir)
        .select(col("event_id"), col("user_id"), col("cents"),
          col("bucket").cast("long").as("bucket"))
    }),

    // Incremental aggregate maintenance (the materialized-view pattern):
    // per-user purchase state folded over two day-parity batches must
    // hash-equal the single-pass recompute — the algebraic-merge
    // contract that lets a 100 TB rollup absorb a day's increment
    // without re-scanning history. avg/variance assemble from the
    // integer state in one-shot double expressions (q131 contract).
    "q132_incremental_agg" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.IncrementalAgg.present(
        graft.operators.IncrementalAgg.foldBatches(
          Seq(p.filter(col("day") % 2 === 0), p.filter(col("day") % 2 === 1)),
          Seq("user_id"), "cents"))
    }),

    // MERGE INTO semantics over a keyed per-(user, weekday) purchase
    // rollup: first-half state is the target, second-half state the
    // source — update on overlap, insert source-only keys, keep
    // target-only keys, and delete merged rows whose combined count
    // falls under 3. All four arms are live at both scales.
    "q135_merge" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      def stateOf(df: DataFrame) = df
        .groupBy(col("user_id"), (col("day") % 7).as("dow"))
        .agg(count(lit(1)).as("n"), sum("cents").as("total"))
      graft.operators.MergeOps.mergeInto(
        stateOf(p.filter(col("day") < 19738)),
        stateOf(p.filter(col("day") >= 19738)),
        Seq("user_id", "dow"),
        updateSet = Seq("n" -> (col("n") + col("src_n")),
          "total" -> (col("total") + col("src_total"))),
        insertSet = Seq("n" -> col("src_n"), "total" -> col("src_total")),
        deleteWhen = Some(col("n") < 3))
    }),

    // SCD type 2: each user's daily activity tier collapsed into
    // versioned validity rows — a version opens at every tier CHANGE
    // (null-safe lag compare), valid_to = next version's start, open
    // version flagged is_current. One user exchange serves both window
    // passes. (Dimension builder shared with the q144 point-in-time
    // join — userTierScd2.)
    "q139_scd2" -> ((s, d) => userTierScd2(s, d)),

    // Point-in-time join over the SCD2 dimension (the SAME builder as
    // q139 — userTierScd2): each purchase is enriched with the user's
    // activity tier AS OF the purchase day — open versions bound by
    // +infinity via coalesce. The feature-store join that prevents
    // temporal leakage: a row may only see dimension state valid AT
    // its own time. The dimension is PER-USER sized (grows with the
    // data), so the join strategy is left to Catalyst/AQE — broadcast
    // under the threshold, shuffle on the equi-key above it; the range
    // predicate rides the user equi-join either way.
    "q144_pit_join" -> ((s, d) => {
      val dim = userTierScd2(s, d)
        .select(col("user_id"), col("tier"), col("valid_from"),
          coalesce(col("valid_to"), lit(Long.MaxValue)).as("valid_until"))
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      p.join(dim,
        p("user_id") === dim("user_id") &&
          col("day") >= col("valid_from") && col("day") < col("valid_until"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_purchases"),
          sum("cents").as("cents_total"),
          countDistinct(p("user_id")).as("n_users"))
    }),

    // CDC change-feed application (MergeOps.applyChanges): base = each
    // user's purchase rollup over the first 15 days; feed = one change
    // per (user, later day) — op 'D' on day%7==1, else 'U' with that
    // day's rollup; only the LATEST change per user applies (the
    // multi-change-per-key ordering q135's single-image MERGE cannot
    // express). The split day derives from the data via a broadcast
    // scalar (the J5 idiom), so both engines cut identically.
    "q146_cdc_apply" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val split = p.agg((min("day") + 15L).as("split"))
      val pp = p.crossJoin(broadcast(split))
      // cohort carves keep the insert/keep arms live: users 0 mod 5
      // exist only in the feed (insert), users 1 mod 5 only in the base
      // (keep) — without them every user appears on both sides and the
      // gate would never exercise half the operator
      val base = pp.filter(col("day") < col("split") &&
          pmod(col("user_id"), lit(5)) =!= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("cents").as("total"))
      val feed = pp.filter(col("day") >= col("split") &&
          pmod(col("user_id"), lit(5)) =!= 1)
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"), sum("cents").as("total"))
        .select(col("user_id"), col("day").as("seq"),
          when(pmod(col("day"), lit(7)) === 1, lit("D"))
            .otherwise(lit("U")).as("op"),
          col("n"), col("total"))
      graft.operators.MergeOps.applyChanges(
        base, feed, Seq("user_id"), "seq", "op")
    }),

    // Z-order layout (Layout.zOrderBuckets over InterleaveBits): both
    // lineitem key dims scaled linearly into the full 16-bit range
    // (locality-preserving, deterministic at every sf), bucketed by
    // the top 3 bit-pairs of the 32-bit Morton key = a fixed 8x8
    // curve grid — stateless per-row bucketing, no sampled range
    // boundaries, one aggregate for the per-file min/max stats the
    // write path would put in parquet footers.
    "q170_zorder" -> ((s, d) =>
      graft.sources.Layout.zOrderBuckets(
        Tables.lineitem(s, d),
        (col("l_partkey") % 2000) * 32,
        (col("l_suppkey") % 100) * 640,
        bucketBits = 3)),

    // Portable table checksum (Expectations.contentChecksum): order-
    // free md5-half sums mod 2^61 over the canonical row string — the
    // cross-engine reconciliation triple; DuckDB recomputes it from
    // the same parquet and must agree exactly.
    "q209_table_checksum" -> ((s, d) =>
      graft.operators.Expectations.contentChecksum(
        Tables.lineitem(s, d),
        Seq(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"),
          round(col("l_quantity"), 0).cast("long"),
          round(col("l_extendedprice") * 100, 0).cast("long"),
          col("l_returnflag"), col("l_linestatus")))),

    // Snapshot content diff (MergeOps.snapshotDiff): two deterministic
    // recrawl states carved from documents (old drops id%17=3, new
    // drops id%19=5 and rewrites id%13=2), diffed by md5 fingerprint
    // into delta-sized added/removed/changed rows — the inverse of
    // q146's cdcApply (derive the feed, don't apply one). All three
    // arms live at every sf by construction.
    "q238_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldS = docs.filter(pmod(col("doc_id"), lit(17)) =!= 3)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      val newS = docs.filter(pmod(col("doc_id"), lit(19)) =!= 5)
        .select(col("doc_id"),
          md5(when(pmod(col("doc_id"), lit(13)) === 2,
            concat(col("text"), lit(" v2")))
            .otherwise(col("text")).cast("binary")).as("fp"))
      graft.operators.MergeOps.snapshotDiff(oldS, newS, "doc_id", "fp")
    }),
  )

  val oracles: Map[String, String] = Map(

    "q63_zorder" -> {
      val terms = (0 until 16).map(k =>
        s"((((qx >> $k) & 1) << ${2 * k}) | (((qy >> $k) & 1) << ${2 * k + 1}))")
        .mkString(" | ")
      s"WITH ${Tables.pingsSql},\n" +
        s"""q AS (
           |  SELECT uid, event_id,
           |    CAST(least(greatest(floor((latitude - 19.0) / 0.05 * 65536.0), 0.0), 65535.0) AS BIGINT) AS qx,
           |    CAST(least(greatest(floor((longitude - (-99.0)) / 0.05 * 65536.0), 0.0), 65535.0) AS BIGINT) AS qy
           |  FROM pings)
           |SELECT uid, event_id, $terms AS z FROM q""".stripMargin
    },

    // q95/q96 oracles run against the ORIGINAL events parquet — the Spark
    // side's staged sink->scan roundtrip must be value-lossless for the
    // hashes to agree (see the query scaladocs)
    "q95_csv_roundtrip" ->
      """WITH raw AS (
        |  SELECT 'u' || CAST(user_id AS VARCHAR) AS uid,
        |    CAST(user_id % 90 AS DOUBLE) AS latitude,
        |    CAST(event_id % 180 AS DOUBLE) AS longitude,
        |    CAST(event_id % 50 AS DOUBLE) AS error,
        |    epoch_us(ts) // 1000 AS ts_ms
        |  FROM events
        |), cleaned AS (
        |  SELECT CAST(('0x'
        |      || translate(substr(sha256(uid), 49, 1), '89abcdef', '01234567')
        |      || substr(sha256(uid), 50, 15)) AS BIGINT)
        |      AS uid_hash,
        |    latitude, longitude, ts_ms
        |  FROM raw WHERE error < 30
        |)
        |SELECT uid_hash % 8 AS bucket, count(*) AS n_pings,
        |  count(DISTINCT uid_hash) AS n_uid,
        |  CAST(sum(latitude) AS BIGINT) AS sum_lat,
        |  CAST(sum(longitude) AS BIGINT) AS sum_lon,
        |  max(ts_ms) AS max_ts_ms
        |FROM cleaned GROUP BY 1""".stripMargin,

    "q96_partitioned_roundtrip" ->
      """WITH base AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s,
        |    DATE '1970-01-01'
        |      + CAST((epoch_us(ts) // 1000000) // 86400 AS INT) AS dt
        |  FROM events)
        |SELECT dt, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS sum_eid, max(ts_s) AS max_ts_s
        |FROM base WHERE day(dt) <= 15 GROUP BY dt""".stripMargin,

    "q106_sharded_export" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_chars AS st
        |  FROM documents)
        |SELECT st // 100000 AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM c GROUP BY 1""".stripMargin,

    "q107_snapshot_upsert" ->
      """SELECT source,
        |  CASE WHEN doc_id % 3 = 0 THEN 'new' ELSE 'old' END AS label,
        |  count(*) AS n, min(doc_id) AS min_doc
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q108_daily_batch" ->
      """WITH base AS (
        |  SELECT user_id, DATE '1970-01-01'
        |      + CAST((epoch_us(ts) // 1000000) // 86400 AS INT) AS dt
        |  FROM events)
        |SELECT dt, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM base GROUP BY dt""".stripMargin,

    "q105_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q103_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS sum_price_cents,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_quantity > 25.0
        |GROUP BY l_returnflag""".stripMargin,

    "q99_jsonl_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT))
        |    AS BIGINT) AS sum_text_hash,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY source""".stripMargin,

    "q98_inline_dim" ->
      """SELECT tier, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders
        |JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
        |  ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
        |  ('5-LOW', 'cold')) AS dim(o_orderpriority, tier)
        |USING (o_orderpriority)
        |GROUP BY tier""".stripMargin,

    "q112_schema_evolution" ->
      """WITH merged AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(o_orderpriority, 'UNKNOWN') AS priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM merged GROUP BY 1""".stripMargin,

    // Single-pass recompute of the same integer state + the same
    // one-shot double expressions — batch folding must land exactly here.
    "q132_incremental_agg" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total,
        |  min(cents) AS mn, max(cents) AS mx,
        |  CAST(sum(cents * cents) AS BIGINT) AS sumsq,
        |  round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS avg6,
        |  round((CAST(count(*) AS DOUBLE) * CAST(sum(cents * cents) AS DOUBLE)
        |      - CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |    / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6)
        |    AS var6
        |FROM p GROUP BY user_id""".stripMargin,

    // The four MERGE arms as one full-outer CASE: update adds the
    // states, insert takes source, target-only passes through, and the
    // matched-image delete drops combined n < 3.
    "q135_merge" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, d % 7 AS dow, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS total
        |  FROM p WHERE d < 19738 GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id, d % 7 AS dow, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS total
        |  FROM p WHERE d >= 19738 GROUP BY 1, 2)
        |SELECT coalesce(t.user_id, s.user_id) AS user_id,
        |  coalesce(t.dow, s.dow) AS dow,
        |  CASE WHEN t.n IS NOT NULL AND s.n IS NOT NULL THEN t.n + s.n
        |       WHEN t.n IS NULL THEN s.n ELSE t.n END AS n,
        |  CASE WHEN t.n IS NOT NULL AND s.n IS NOT NULL
        |         THEN t.total + s.total
        |       WHEN t.n IS NULL THEN s.total ELSE t.total END AS total
        |FROM t FULL OUTER JOIN s
        |  ON t.user_id = s.user_id AND t.dow = s.dow
        |WHERE NOT (t.n IS NOT NULL AND s.n IS NOT NULL
        |  AND t.n + s.n < 3)""".stripMargin,

    // Same null-safe change flags (IS DISTINCT FROM) and close-out lead.
    "q139_scd2" ->
      """WITH snap AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tiers AS (
        |  SELECT user_id, day,
        |    CASE WHEN n >= 6 THEN 'high' WHEN n >= 3 THEN 'mid'
        |      ELSE 'low' END AS tier
        |  FROM snap),
        |c AS (
        |  SELECT user_id, day, tier,
        |    lag(day) OVER w AS pd, lag(tier) OVER w AS pt
        |  FROM tiers WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |s AS (
        |  SELECT user_id, tier, day AS valid_from FROM c
        |  WHERE pd IS NULL OR tier IS DISTINCT FROM pt)
        |SELECT user_id, tier, valid_from,
        |  lead(valid_from) OVER w2 AS valid_to,
        |  CAST(CASE WHEN lead(valid_from) OVER w2 IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM s WINDOW w2 AS (PARTITION BY user_id
        |  ORDER BY valid_from)""".stripMargin,

    // The same SCD2 build + validity-range join, with open versions
    // bounded by a sentinel upper day.
    "q144_pit_join" ->
      """WITH snap AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tiers AS (
        |  SELECT user_id, day,
        |    CASE WHEN n >= 6 THEN 'high' WHEN n >= 3 THEN 'mid'
        |      ELSE 'low' END AS tier
        |  FROM snap),
        |c AS (
        |  SELECT user_id, day, tier,
        |    lag(day) OVER w AS pd, lag(tier) OVER w AS pt
        |  FROM tiers WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |s AS (
        |  SELECT user_id, tier, day AS valid_from FROM c
        |  WHERE pd IS NULL OR tier IS DISTINCT FROM pt),
        |dim AS (
        |  SELECT user_id, tier, valid_from,
        |    coalesce(lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from), 9223372036854775807) AS valid_until
        |  FROM s),
        |p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT dim.tier, count(*) AS n_purchases,
        |  CAST(sum(p.cents) AS BIGINT) AS cents_total,
        |  count(DISTINCT p.user_id) AS n_users
        |FROM p JOIN dim ON p.user_id = dim.user_id
        |  AND p.day >= dim.valid_from AND p.day < dim.valid_until
        |GROUP BY dim.tier""".stripMargin,

    // The identical magic-number bit-spread ladder on BIGINTs
    // (0x00FF00FF/0x0F0F0F0F/0x33333333/0x55555555 in decimal), then
    // the same top-6-bit bucket aggregate.
    "q170_zorder" ->
      """WITH pts AS (
        |  SELECT (l_partkey % 2000) * 32 AS qx,
        |    (l_suppkey % 100) * 640 AS qy FROM lineitem),
        |s1 AS (SELECT qx, qy, (qx | (qx << 8)) & 16711935 AS x1,
        |  (qy | (qy << 8)) & 16711935 AS y1 FROM pts),
        |s2 AS (SELECT qx, qy, (x1 | (x1 << 4)) & 252645135 AS x2,
        |  (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT qx, qy, (x2 | (x2 << 2)) & 858993459 AS x3,
        |  (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT qx, qy, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |  (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
        |z AS (SELECT qx, qy, x4 | (y4 << 1) AS zval FROM s4)
        |SELECT zval >> 26 AS bucket, count(*) AS cnt,
        |  min(qx) AS x_min, max(qx) AS x_max,
        |  min(qy) AS y_min, max(qy) AS y_max,
        |  min(zval) AS z_min, max(zval) AS z_max
        |FROM z GROUP BY 1""".stripMargin,

    // Latest-change collapse (window twin of the struct max) + the same
    // full-outer apply with D-drop.
    "q146_cdc_apply" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |sp AS (SELECT min(day) + 15 AS split FROM p),
        |base AS (
        |  SELECT user_id, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total
        |  FROM p, sp WHERE day < split AND user_id % 5 <> 0
        |  GROUP BY user_id),
        |feed AS (
        |  SELECT user_id, day AS seq,
        |    CASE WHEN day % 7 = 1 THEN 'D' ELSE 'U' END AS op,
        |    count(*) AS n, CAST(sum(cents) AS BIGINT) AS total
        |  FROM p, sp WHERE day >= split AND user_id % 5 <> 1
        |  GROUP BY user_id, day),
        |latest AS (
        |  SELECT user_id, op, n, total FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY seq DESC) AS rn FROM feed) WHERE rn = 1)
        |SELECT user_id,
        |  CASE WHEN l.user_id IS NOT NULL THEN l.n ELSE b.n END AS n,
        |  CASE WHEN l.user_id IS NOT NULL THEN l.total ELSE b.total
        |    END AS total
        |FROM base b FULL OUTER JOIN latest l USING (user_id)
        |WHERE l.user_id IS NULL OR l.op <> 'D'""".stripMargin,

    // The identical row-md5 half sums mod 2^61.
    "q209_table_checksum" ->
      """WITH r AS (
        |  SELECT md5(CAST(l_orderkey AS VARCHAR) || '|'
        |    || CAST(l_partkey AS VARCHAR) || '|'
        |    || CAST(l_suppkey AS VARCHAR) || '|'
        |    || CAST(l_linenumber AS VARCHAR) || '|'
        |    || CAST(CAST(round(l_quantity, 0) AS BIGINT) AS VARCHAR) || '|'
        |    || CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |         AS VARCHAR) || '|'
        |    || l_returnflag || '|' || l_linestatus) AS h
        |  FROM lineitem)
        |SELECT count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(('0x' || substr(h, 1, 8)) AS BIGINT))
        |    AS HUGEINT) % 2305843009213693952 AS BIGINT) AS sum_h1,
        |  CAST(CAST(sum(CAST(('0x' || substr(h, 9, 8)) AS BIGINT))
        |    AS HUGEINT) % 2305843009213693952 AS BIGINT) AS sum_h2
        |FROM r""".stripMargin,

    "q118_compact" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  count(DISTINCT user_id) AS n_users,
        |  min(event_id) AS min_ev, max(event_id) AS max_ev
        |FROM events GROUP BY event_type""".stripMargin,

    // q250: the anti-filter the partition-bounded delete must land on
    "q250_targeted_delete" ->
      """SELECT event_id, user_id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |  user_id % 7 AS bucket
        |FROM events WHERE user_id % 13 <> 0""".stripMargin,

    // q238: same carved snapshots, FULL JOIN with presence markers (a
    // null fingerprint can never alias absence), delta rows only
    "q238_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp, TRUE AS in_old
        |  FROM documents WHERE doc_id % 17 <> 3),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 2 THEN text || ' v2'
        |      ELSE text END) AS fp, TRUE AS in_new
        |  FROM documents WHERE doc_id % 19 <> 5),
        |j AS (SELECT doc_id,
        |    CASE WHEN in_old IS NULL THEN 'added'
        |      WHEN in_new IS NULL THEN 'removed'
        |      WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
        |      ELSE 'same' END AS status
        |  FROM o FULL JOIN n USING (doc_id))
        |SELECT doc_id, status FROM j WHERE status <> 'same'""".stripMargin,
  )
}
