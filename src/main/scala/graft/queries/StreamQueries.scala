package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Structured Streaming gates: watermarked stops,
  * dedup, joins, sliding windows, ingest gates, mat-view folds.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object StreamQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.9 streaming surface as a GATE query: the q64 sessionization run
    // as a real Structured Streaming job — parquet file source,
    // Trigger.AvailableNow, memory sink — and hash-compared against the
    // same gap-islands SQL oracle as the batch form. Complete output
    // mode for exact batch parity on a finite file set (see
    // StreamSessions.runToCompletion); the bounded-state append+watermark
    // forms stay spec-covered in streaming/*.
    "q89_stream_sessions" -> ((s, d) => {
      val path = s"$d/events.parquet"
      // Schema probe through Tables.table: it tunes the session
      // (nanosAsLong) first, so a filtered run where q89 is the FIRST
      // query still reads a TIMESTAMP(NANOS) fixture. The file-stream
      // source needs a DIRECTORY (single-file fixtures are staged into a
      // temp dir — see stageFileAsDir).
      val fileSchema = Tables.table(s, d, "events").schema
      val srcDir = graft.streaming.StreamSessions.stageFileAsDir(path)
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      // same ts-contract normalization as Tables.events, applied to the
      // stream: epoch seconds from either a ns-Long or a µs-timestamp ts
      val tsec = fileSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("ts div 1000000000")
        case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
      }
      val agg = raw
        .select(col("user_id"), tsec.as("tsec"))
        .groupBy(col("user_id"),
          session_window(timestamp_seconds(col("tsec")), "1800 seconds"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("s_start"),
          unix_timestamp(col("session_window.end")).as("s_end"),
          col("n_events"))
      graft.streaming.StreamSessions.runToCompletion(agg,
        "q89_stream_sessions")
    }),

    // Second streaming gate: STATEFUL dedup (dropDuplicatesWithinWatermark)
    // as a real stream over the same file source. Append mode: the first
    // arrival per key is emitted immediately, so over a finite AvailableNow
    // run the emitted set IS the distinct key set — which row of a key
    // arrives first is task-order dependent, so only the KEY columns are
    // emitted (deterministic); value columns of the surviving row are not.
    // Batch twin: q44's distinct; state is watermark-bounded at scale.
    "q90_stream_dedup" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val fileSchema = Tables.table(s, d, "events").schema
      val srcDir = graft.streaming.StreamSessions.stageFileAsDir(path)
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      val tsCol = fileSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_seconds(expr("ts div 1000000000"))
        case _ => col("ts").cast("timestamp")
      }
      val keyed = raw
        .select(col("user_id"), col("event_type"), tsCol.as("ts"))
      // multi-column key directly (a concat key would collide on
      // separator content and drop NULL parts); watermark far beyond the
      // fixture's time span so the backfill equals exact DISTINCT even
      // if the source ever splits into multiple micro-batches — with a
      // short horizon, a key recurring later than the horizon in a LATER
      // batch would be re-emitted. Production streams choose a real
      // horizon to bound state; a finite backfill gate wants exactness.
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.streaming.StreamSessions.dedupStream(keyed,
          Seq("user_id", "event_type"), "3650 days")
          .select(col("user_id"), col("event_type")),
        "q90_stream_dedup")
    }),

    // Fourth streaming gate: the continuous INGEST gate — arriving docs'
    // per-row Column-form minhash signatures band-joined against the
    // static history index, flagged pairs deduped in stream state. The
    // incoming side is a 1/30 slice: an ingest micro-batch is small by
    // nature, and the per-row signature is priced for ingest rates (the
    // corpus-scale path is the relational q83 pipeline). Oracle = the
    // q83 candidate CTE without the hot-bucket cap or agree-verify
    // (the gate is the cheap early filter in front of both).
    "q94_stream_ingest_gate" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val docs = Tables.documents(s, d)
      val index = graft.streaming.StreamIngestGate.bandIndex(
        docs.filter(col("doc_id") % 3 =!= 0), "text", "doc_id")
      val dir = graft.streaming.StreamSessions.stageFrameAsDir(s"q94:$d") {
        docs.filter(col("doc_id") % 30 === 0)
          .select(col("doc_id"), col("text"),
            timestamp_seconds(col("doc_id")).as("ts"))
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType)))
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, dir, schema)
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.streaming.StreamIngestGate.flagStream(
          raw, index, "text", "doc_id", "3650 days"),
        "q94_stream_ingest_gate")
        .select("in_id", "hist_id")
    }),

    // Third streaming gate: the MOBILITY pipeline's streaming form —
    // incremental stop detection (flatMapGroupsWithState automaton) over
    // a real file stream, hash-compared against the BATCH stop-event
    // oracle (same SQL as q12). A ping classifies when its successor
    // arrives, so each user's trajectory tail would stay pending; one
    // per-user SENTINEL ping at global-max-ts + maxStayingTime + 1 is
    // appended to the staged input — always non-stationary, so it
    // flushes every real ping with exactly the batch tail semantics
    // (batch's NULL forward gap -> -1, automaton's non-stationary
    // successor -> -1) while the sentinel itself never classifies (no
    // successor) and so never appears in the output.
    "q93_stream_stops" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions.stageFrameAsDir(s"q93:$d") {
        val pings = Tables.pings(s, d)
          .select("uid", "latitude", "longitude", "timestamp")
        val maxTs = pings.agg(max("timestamp")).collect()(0).getLong(0)
        val sentinels = pings.select("uid").distinct()
          .select(col("uid"), lit(0.0).as("latitude"),
            lit(0.0).as("longitude"),
            lit(maxTs + stopParams.maxStayingTime + 1L).as("timestamp"))
        pings.union(sentinels)
      }
      val schema = StructType(Seq(
        StructField("uid", StringType), StructField("latitude", DoubleType),
        StructField("longitude", DoubleType),
        StructField("timestamp", LongType)))
      import s.implicits._
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, dir, schema)
        .as[graft.streaming.StreamingStopDetect.Ping]
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.streaming.StreamingStopDetect.stopEvents(raw, stopParams),
        "q93_stream_stops")
        .select("uid", "timestamp", "stop_events", "latitude", "longitude")
    }),

    // Out-of-order streaming stop detection: the same batch-oracle
    // contract as q93, but the pings arrive SHUFFLED — each ping's
    // arrival slot is its timestamp plus a deterministic ±120 s jitter
    // (hash-derived), the fixture is staged as 2 rank-ordered files
    // replayed one per micro-batch (4 micro-batches total with the two
    // pushers), and the automaton runs behind a 300 s watermark buffer
    // (stopEventsUnordered). Displacement bound D=120 < lateness L=300
    // guarantees no ping is ever dropped as too-late (worst-case
    // watermark when a ping arrives is T + 2D - L = T - 60); the
    // guarantee and the out-of-order semantics are
    // batch-count-independent — pings still shuffle within files and
    // across the file boundary, the buffer+timeout machinery still
    // drains behind the watermark — so 4 total batches carry the same
    // contract as the previous 10 at ~0.45 s of fixed micro-batch cost
    // each (r12 verdict #6: the gate's wall was scheduler/commit
    // overhead, not automaton work — measured 4.1 s at 6 batches,
    // 2.4 s at 4; ScaleTime still pins its own cadence via
    // spark.graft.streamFiles). Per-user sentinels
    // flush trajectory tails
    // exactly as in q93; two trailing "pusher" rows at S + L + 2 push
    // the final watermark past the sentinels so the last drain happens
    // inside a DATA batch (no reliance on no-data batch semantics).
    // Sentinels classify every real ping but never emit; pushers never
    // even reach the automaton (they stay buffered above the final
    // watermark).
    "q97_stream_stops_unordered" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val lateness = 300L
      val jitterBound = 120L
      // file count = watermark-advance cadence; the time-extended scale
      // harness (ScaleTime) raises it in proportion to the horizon so
      // per-batch event-time width stays constant across fixture shapes
      val nFiles = s.conf.getOption("spark.graft.streamFiles")
        .map(_.toInt).getOrElse(2)
      val dir = graft.streaming.StreamSessions.stageOrderedFrames(s"q97:$d") {
        val pings = Tables.pings(s, d)
          .select("uid", "latitude", "longitude", "timestamp")
        val maxTs = pings.agg(max("timestamp")).collect()(0).getLong(0)
        val sentinelTs = maxTs + stopParams.maxStayingTime + 1L
        val pusherTs = sentinelTs + lateness + 2L
        val jitter =
          pmod(xxhash64(col("uid"), col("timestamp")),
            lit(2 * jitterBound + 1)) - lit(jitterBound)
        val sentinels = pings.select("uid").distinct()
          .select(col("uid"), lit(0.0).as("latitude"),
            lit(0.0).as("longitude"), lit(sentinelTs).as("timestamp"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__rank"), col("uid"), col("timestamp"))
        // persisted for the nFiles filtered writes (each would otherwise
        // recompute the global rank window); CacheScope-tracked so the
        // harness releases it after the query — the cache must not
        // outlive the once-per-JVM staging it serves
        val filed = graft.CacheScope.track(pings
          .withColumn("__rank", (col("timestamp") + jitter).cast("long"))
          .unionByName(sentinels.withColumn("__rank", lit(sentinelTs)))
          .withColumn("__file", ntile(nFiles).over(w) - 1)
          .persist())
        val data = (0 until nFiles).map(i =>
          filed.filter(col("__file") === i)
            .select("uid", "latitude", "longitude", "timestamp"))
        val pusher = s.range(1).select(lit("__pusher").as("uid"),
          lit(0.0).as("latitude"), lit(0.0).as("longitude"),
          lit(pusherTs).as("timestamp"))
        data ++ Seq(pusher, pusher)
      }
      val schema = StructType(Seq(
        StructField("uid", StringType), StructField("latitude", DoubleType),
        StructField("longitude", DoubleType),
        StructField("timestamp", LongType)))
      import s.implicits._
      val raw = graft.streaming.StreamSessions
        .readParquetStreamThrottled(s, dir, schema)
        .as[graft.streaming.StreamingStopDetect.Ping]
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.streaming.StreamingStopDetect.stopEventsUnordered(
          raw, stopParams, lateness),
        "q97_stream_stops_unordered")
        .filter(col("uid") =!= "__pusher") // defensive: pushers never emit
        .select("uid", "timestamp", "stop_events", "latitude", "longitude")
    }),

    // Tumbling-window streaming aggregation gate: windowedCounts over
    // the events file stream vs the batch hour-bucket oracle. Values
    // ride as integer cents (exact, order-free sums) so the streaming
    // and batch aggregates agree bit-for-bit.
    // Streaming Benford gate (9th gate): the q239 first-digit audit fed
    // by the events FILE STREAM — a complete-mode global digit aggregate
    // whose state is the 9-row digit domain no matter the input volume
    // (the bounded-state shape in its purest form); the Benford
    // expectation/chi2 projection runs batch-side on the streamed
    // counts. Oracle = q239's SQL verbatim: the streamed path must be
    // hash-identical to the batch audit.
    "q244_stream_benford" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val fileSchema = Tables.table(s, d, "events").schema
      val srcDir = graft.streaming.StreamSessions.stageFileAsDir(path)
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      val digits = raw
        .filter(col("event_type") === "purchase")
        .select(round(col("value") * 100, 0).cast("long").as("cents"))
        .filter(col("cents") > 0) // same quantized predicate as batch q239
        .select(substring(col("cents").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("obs"))
      val counts = graft.streaming.StreamSessions
        .runToCompletion(digits, "q244_stream_benford")
      val tot = counts.agg(sum("obs").as("n"))
      val e = log10(lit(1) + lit(1.0) / col("digit"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("obs"),
          round(e, 6).as("exp_share"),
          round((col("obs") - col("n") * e) * (col("obs") - col("n") * e)
            / (col("n") * e), 6).as("chi2_term"))
    }),

    "q104_stream_window" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val fileSchema = Tables.table(s, d, "events").schema
      val srcDir = graft.streaming.StreamSessions.stageFileAsDir(path)
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      val tsec = fileSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("ts div 1000000000")
        case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
      }
      val ev = raw.select(col("user_id"),
        timestamp_seconds(tsec).as("ts"),
        round(col("value") * 100, 0).as("value"))
      val agg = graft.streaming.StreamSessions
        .windowedCounts(ev, "3600 seconds", "3650 days")
        .select(col("user_id"),
          unix_timestamp(col("w_start")).as("w_start"),
          unix_timestamp(col("w_end")).as("w_end"),
          col("n_events"), col("sum_value").cast("long").as("sum_cents"))
      graft.streaming.StreamSessions.runToCompletion(agg,
        "q104_stream_window")
    }),

    // Stream-stream watermarked interval join gate: the view stream
    // enriched with same-user purchases from the preceding 6 hours —
    // both sides real file streams with event-time watermarks, state
    // bounded by the join's time-range condition
    // (StreamSessions.intervalJoin). Inner join => matches emit when both
    // sides have arrived, so the AvailableNow run equals the batch join
    // bit-for-bit: the oracle is the plain range-bounded SQL join.
    //
    // Both sides stage as 16 time-ordered chunks (timeChunks) replayed
    // one file per trigger: the watermark advances 16 times mid-run and
    // state actually EVICTS — a single-file staging never advances the
    // watermark, so any measured state peak is input-sized by harness
    // construction, not by operator design. Eviction cannot drop a
    // matchable pair: a purchase evicts only once the VIEW watermark
    // passes pts + 6h, and any later view chunk's matches have
    // pts >= chunkStart - 6h > that bound (the 1-day delay covers the
    // chunk-boundary overlap; chunks are time-aligned across sides, so
    // per-batch skew is ~zero).
    "q110_stream_join" -> ((s, d) => {
      val base = Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(expr("ts div 1000000000")).as("ts"))
      val vDir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q110v:$d") {
          graft.streaming.StreamSessions.timeChunks(
            base.filter(col("event_type") === "view")
              .select("user_id", "event_id", "ts"), "ts", 16)
        }
      val pDir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q110p:$d") {
          graft.streaming.StreamSessions.timeChunks(
            base.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("event_id").as("purchase_id"),
                col("ts").as("pts")), "pts", 16)
        }
      val v = graft.streaming.StreamSessions.readParquetStreamThrottled(
        s, vDir, s.read.parquet(vDir).schema)
      val p = graft.streaming.StreamSessions.readParquetStreamThrottled(
        s, pDir, s.read.parquet(pDir).schema)
      val joined = graft.streaming.StreamSessions.intervalJoin(
        v, p, "user_id", "ts", "pts", "6 HOURS", "1 day")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("purchase_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("pts")))
            .as("gap_s"))
      graft.streaming.StreamSessions.runToCompletionAppend(joined,
        "q110_stream_join")
    }),

    // Streaming materialized view: events replayed as four week-sliced
    // micro-batches; foreachBatch folds each batch's partial aggregate
    // into a versioned per-key state snapshot (version = batchId — the
    // idempotent-replay exactly-once contract, see StreamMatView). The
    // final snapshot must hash-equal the whole-history batch recompute.
    "q143_stream_matview" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q143:$d") {
          val e = Tables.events(s, d)
            .select(col("user_id"), col("event_type"),
              expr("ts div 86400000000000").as("day"),
              round(col("value") * 100, 0).cast("long").as("cents"))
          Seq(e.filter(col("day") < 19731),
            e.filter(col("day") >= 19731 && col("day") < 19738),
            e.filter(col("day") >= 19738 && col("day") < 19745),
            e.filter(col("day") >= 19745))
        }
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("day", LongType), StructField("cents", LongType)))
      val stateDir = graft.sources.Staging.once(s"q143state:$d") { _ => () }
      graft.streaming.StreamMatView.runFold(
        graft.streaming.StreamSessions
          .readParquetStreamThrottled(s, dir, schema),
        Seq("user_id"), "cents", stateDir,
        prep = b => b.filter(col("event_type") === "purchase")
          .select("user_id", "cents"))
    }),

    // Stream-stream LEFT OUTER interval join gate
    // (StreamSessions.intervalJoinLeftOuter): q110's enrichment where
    // views with NO preceding purchase still emit (null match) — the
    // null results are withheld until the watermark proves no match can
    // arrive, so the replay stages two trailing pusher files per side
    // (the q97 trick): pusher #1 advances the watermark past the real
    // data, pusher #2's batch performs the flush. Pusher rows use the
    // reserved user -1 and are filtered from the output.
    "q151_stream_outer_join" -> ((s, d) => {
      val base = Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(expr("ts div 1000000000")).as("ts"))
      def pusherTs(off: Long) = {
        val maxTs = base.agg(max(unix_timestamp(col("ts"))))
          .collect()(0).getLong(0)
        maxTs + off
      }
      // real data as 16 time-ordered chunks (see q110: single-file
      // staging makes any state-peak measurement input-sized by harness
      // construction), then the two pushers that flush the outer tail
      val vDir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q151v:$d") {
          val v = base.filter(col("event_type") === "view")
            .select("user_id", "event_id", "ts")
          def pusher(off: Long) = s.range(1).select(
            lit(-1L).as("user_id"), lit(-1L).as("event_id"),
            timestamp_seconds(lit(pusherTs(off))).as("ts"))
          graft.streaming.StreamSessions.timeChunks(v, "ts", 16) ++
            Seq(pusher(86400L * 30), pusher(86400L * 60))
        }
      val pDir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q151p:$d") {
          val p = base.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("pts"))
          def pusher(off: Long) = s.range(1).select(
            lit(-1L).as("user_id"), lit(-1L).as("purchase_id"),
            timestamp_seconds(lit(pusherTs(off))).as("pts"))
          graft.streaming.StreamSessions.timeChunks(p, "pts", 16) ++
            Seq(pusher(86400L * 30), pusher(86400L * 60))
        }
      val v = graft.streaming.StreamSessions.readParquetStreamThrottled(
        s, vDir, s.read.parquet(vDir).schema)
      val p = graft.streaming.StreamSessions.readParquetStreamThrottled(
        s, pDir, s.read.parquet(pDir).schema)
      // NOTE: the pusher filter must NOT live inside the streaming
      // frame — Catalyst pushes it below the EventTimeWatermark node
      // (user_id is a join key), so the pusher rows would be pruned at
      // the scan and never advance the watermark, and the outer-null
      // tail would never flush (found the hard way; the batch-side
      // filter below is the correct place).
      val joined = graft.streaming.StreamSessions.intervalJoinLeftOuter(
        v, p, "user_id", "ts", "pts", "6 HOURS", "60 seconds")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("purchase_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("pts")))
            .as("gap_s"))
      graft.streaming.StreamSessions.runToCompletionAppend(joined,
        "q151_stream_outer_join")
        .filter(col("user_id") =!= -1L)
    }),

    // Sliding-window streaming aggregate (q104's tumbling twin): 2 h
    // windows sliding 1 h, so every event belongs to exactly two windows
    // — the overlap is what the batch oracle unrolls (event × k∈{0,1}).
    "q158_stream_sliding" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val fileSchema = Tables.table(s, d, "events").schema
      val srcDir = graft.streaming.StreamSessions.stageFileAsDir(path)
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      val tsec = fileSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("ts div 1000000000")
        case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
      }
      val ev = raw.select(col("user_id"),
        timestamp_seconds(tsec).as("ts"),
        round(col("value") * 100, 0).as("value"))
      val agg = graft.streaming.StreamSessions
        .slidingCounts(ev, "7200 seconds", "3600 seconds", "3650 days")
        .select(col("user_id"),
          unix_timestamp(col("w_start")).as("w_start"),
          unix_timestamp(col("w_end")).as("w_end"),
          col("n_events"), col("sum_value").cast("long").as("sum_cents"))
      graft.streaming.StreamSessions.runToCompletion(agg,
        "q158_stream_sliding")
    }),

    // Streaming model scoring (Clustering.lloydCentroids +
    // assignWithModel): train the q145 Lloyd trajectory on the BATCH
    // table, then score the same vectors arriving as a STREAM — pure
    // per-row expressions (quantize + fused argmin), stateless, no
    // watermark; the model rides inside the codegen'd expression. The
    // oracle is q145's: stream scoring must equal the batch assignment
    // bit for bit.
    "q162_stream_score" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.Clustering.lloydCentroids(
        emb, "vec_id", "embedding", k = 8, dim = 64, rounds = 4)
      val fileSchema = Tables.table(s, d, "embeddings").schema
      val srcDir = graft.streaming.StreamSessions
        .stageFileAsDir(s"$d/embeddings.parquet")
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, srcDir, fileSchema)
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.operators.Clustering.assignWithModel(
          raw, "vec_id", "embedding", cents),
        "q162_stream_score")
    }),

    // Streaming image-ingest dedup gate (q94's multimodal twin): even
    // doc_ids form the historical hash index (distinct-hash reps —
    // identical-hash groups of 400+ collapse before banding); odd
    // doc_ids arrive as a PAYLOAD stream, hash statelessly per row
    // (perceptualHashStream through the real codec), and flag via the
    // banded stream-static join + exact popcount at Hamming <= 3.
    // 2384 of 2500 incoming images flag at sf0.1 — both arms live.
    "q166_stream_image_gate" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val docs = Tables.documents(s, d).select("doc_id")
      val index = graft.streaming.StreamIngestGate.imageHashIndex(
        graft.operators.Multimodal.perceptualHashes(
          graft.operators.Multimodal.synthImages(
            docs.filter(col("doc_id") % 2 === 0), "doc_id")))
      val dir = graft.streaming.StreamSessions.stageFrameAsDir(s"q166:$d") {
        graft.operators.Multimodal.synthImages(
          docs.filter(col("doc_id") % 2 === 1), "doc_id")
          .toDF()
          .select(col("media_id"), col("payload"),
            timestamp_seconds(col("media_id")).as("ts"))
      }
      val schema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("payload", BinaryType),
        StructField("ts", TimestampType)))
      val raw = graft.streaming.StreamSessions
        .readParquetStream(s, dir, schema)
      graft.streaming.StreamSessions.runToCompletionAppend(
        graft.streaming.StreamIngestGate.imageFlagStream(
          graft.operators.Multimodal.perceptualHashStream(
            raw, "media_id", "payload", "ts"),
          index, "3650 days"),
        "q166_stream_image_gate")
        .select("in_id", "hist_id")
    }),

    // Streaming row-level quarantine gate (Expectations.rowGate): the
    // streaming-safe complement of q141's batch report — pure per-row
    // verdicts, failing rows tagged with every failed check name, so
    // the sink splits clean rows from the dead-letter stream with one
    // filter. Stateless projection: no watermark, no state store;
    // oracle = the identical predicates in batch SQL. Both arms live
    // (cents_range and type_domain each quarantine rows).
    "q174_stream_quarantine" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions.stageFrameAsDir(s"q174:$d") {
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
      }
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val raw = graft.streaming.StreamSessions.readParquetStream(s, dir, schema)
      val gated = graft.operators.Expectations.rowGate(
        raw.withColumn("cents", round(col("value") * 100, 0).cast("long")),
        Seq(
          ("value_nonnull", col("value").isNotNull),
          ("cents_range", col("cents").between(100, 20000)),
          ("type_domain",
            col("event_type").isin("click", "view", "purchase", "signup"))))
        .select(col("event_id"), col("reasons"), col("quarantined"))
      graft.streaming.StreamSessions.runToCompletionAppend(
        gated, "q174_stream_quarantine")
    }),

    // Streaming engagement-bitmap materialized view
    // (StreamMatView.runFoldBitmapDelta over IncrementalAgg's bitmap
    // algebra): day-sliced micro-batches OR-fold each user's activity
    // bitmap under the changed-bucket manifest layout — idempotent
    // merge state, 8 bytes per user, per-batch IO proportional to the
    // touched key-hash buckets (never a full-snapshot rewrite). The
    // final manifest-assembled state must equal the batch q199 fold
    // exactly.
    "q203_stream_bitmap" -> ((s, d) => {
      val day0 = Tables.events(s, d)
        .agg(min(expr("ts div 86400000000000"))).head().getLong(0)
      val dir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q203:$d") {
          val e = Tables.events(s, d)
            .select(col("user_id"),
              (expr("ts div 86400000000000") - lit(day0)).as("day"))
          Seq(e.filter(col("day") < 10),
            e.filter(col("day") >= 10 && col("day") < 20),
            e.filter(col("day") >= 20))
        }
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("day", LongType)))
      val stateDir = graft.sources.Staging.once(s"q203state:$d") { _ => () }
      graft.streaming.StreamMatView.runFoldBitmapDelta(
        graft.streaming.StreamSessions
          .readParquetStreamThrottled(s, dir, schema),
        Seq("user_id"), "day", stateDir, prep = identity)
        .select(col("user_id"), col("bmp"),
          expr("bit_count(bmp)").cast("long").as("n_active_days"))
    }),

    // Changed-bucket delta materialized view (StreamMatView.runFoldDelta):
    // q143's fold, but each micro-batch rewrites only the key-hash state
    // buckets it touches and carries the rest forward by manifest
    // pointer — per-batch IO proportional to touched-bucket state, not
    // to key cardinality. The final manifest-assembled state must
    // hash-equal the same whole-history recompute as q143.
    "q247_stream_matview_delta" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q247:$d") {
          val e = Tables.events(s, d)
            .select(col("user_id"), col("event_type"),
              expr("ts div 86400000000000").as("day"),
              round(col("value") * 100, 0).cast("long").as("cents"))
          Seq(e.filter(col("day") < 19731),
            e.filter(col("day") >= 19731 && col("day") < 19738),
            e.filter(col("day") >= 19738 && col("day") < 19745),
            e.filter(col("day") >= 19745))
        }
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("day", LongType), StructField("cents", LongType)))
      val stateDir = graft.sources.Staging.once(s"q247state:$d") { _ => () }
      graft.streaming.StreamMatView.runFoldDelta(
        graft.streaming.StreamSessions
          .readParquetStreamThrottled(s, dir, schema),
        Seq("user_id"), "cents", stateDir,
        prep = b => b.filter(col("event_type") === "purchase")
          .select("user_id", "cents"))
    }),

    // Time-travel read of the delta mat-view: the manifest at version k
    // IS the rollup as of batch k, so reading version 2 after the full
    // four-slice fold must equal the prefix recompute over slices 0-2
    // (day < 19745) — the audit/debug contract the versioned manifests
    // exist for (what did the rollup say BEFORE the last refresh).
    "q248_matview_time_travel" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q248:$d") {
          val e = Tables.events(s, d)
            .select(col("user_id"), col("event_type"),
              expr("ts div 86400000000000").as("day"),
              round(col("value") * 100, 0).cast("long").as("cents"))
          Seq(e.filter(col("day") < 19731),
            e.filter(col("day") >= 19731 && col("day") < 19738),
            e.filter(col("day") >= 19738 && col("day") < 19745),
            e.filter(col("day") >= 19745))
        }
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("day", LongType), StructField("cents", LongType)))
      val stateDir = graft.sources.Staging.once(s"q248state:$d") { _ => () }
      // the fold materializes every version; the QUERY is the read of
      // the non-final version 2 (batches 0-2 = the first three slices).
      // keepHistory: a session-wide stateGcOnComplete=true would
      // otherwise collect to version 3 and delete manifest_v2 before
      // the time-travel read (ADVICE r12).
      graft.streaming.StreamMatView.runFoldDelta(
        graft.streaming.StreamSessions
          .readParquetStreamThrottled(s, dir, schema),
        Seq("user_id"), "cents", stateDir,
        prep = b => b.filter(col("event_type") === "purchase")
          .select("user_id", "cents"),
        keepHistory = true)
      graft.streaming.StreamMatView.readStateDelta(s, stateDir, 2L)
    }),

    // Exact streaming quantiles from a mergeable bounded-domain
    // histogram: the state is (event_type, cents) counts maintained
    // under the changed-bucket delta layout (the first MULTI-column
    // delta key on the board), and p50/p90/p99 derive from the final
    // histogram by explicit inverse CDF — smallest cents whose
    // cumulative count reaches ceil(q*n). At 100 TB this is how exact
    // percentile dashboards ship over append-only facts when the value
    // domain is bounded (cents): kilobyte-scale mergeable state, no
    // t-digest approximation, no history re-scan. The oracle spells the
    // identical formula in identical operand order (repo FP convention).
    "q249_stream_quantile_matview" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = graft.streaming.StreamSessions
        .stageOrderedFrames(s"q249:$d") {
          val e = Tables.events(s, d)
            .select(col("event_type"),
              expr("ts div 86400000000000").as("day"),
              round(col("value") * 100, 0).cast("long").as("cents"))
          Seq(e.filter(col("day") < 19731),
            e.filter(col("day") >= 19731 && col("day") < 19738),
            e.filter(col("day") >= 19738 && col("day") < 19745),
            e.filter(col("day") >= 19745))
        }
      val schema = StructType(Seq(
        StructField("event_type", StringType),
        StructField("day", LongType), StructField("cents", LongType)))
      val stateDir = graft.sources.Staging.once(s"q249state:$d") { _ => () }
      val hist = graft.streaming.StreamMatView.runFoldDelta(
        graft.streaming.StreamSessions
          .readParquetStreamThrottled(s, dir, schema),
        Seq("event_type", "cents"), "cents", stateDir,
        prep = _.select("event_type", "cents"))
        .select(col("event_type"), col("cents"), col("n"))
      val byType = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val cum = hist
        .withColumn("cum", sum("n").over(byType.orderBy("cents")))
        .withColumn("tot", sum("n").over(byType))
      def qAt(p: Double, name: String) =
        min(when(col("cum") >=
          ceil(lit(p) * col("tot")).cast("long"), col("cents"))).as(name)
      cum.groupBy("event_type")
        .agg(qAt(0.5, "p50"), qAt(0.9, "p90"), qAt(0.99, "p99"),
          max(col("tot")).as("n_rows"))
    }),
  )

  val oracles: Map[String, String] = Map(

    // streaming form, sentinel-flushed: equals the batch segmentation
    "q93_stream_stops" -> (s"WITH ${Tables.pingsSql},\n" + stopEventsSql +
      """SELECT uid, "timestamp", stop_events, latitude, longitude
        |FROM stop_events""".stripMargin),

    // out-of-order streaming form: SAME batch oracle — the watermark
    // buffer must make the shuffled arrival invisible
    "q97_stream_stops_unordered" ->
      (s"WITH ${Tables.pingsSql},\n" + stopEventsSql +
        """SELECT uid, "timestamp", stop_events, latitude, longitude
          |FROM stop_events""".stripMargin),

    // the streaming form must produce the identical session set
    "q89_stream_sessions" -> sqlQ64Sessions,

    // Streaming stateful dedup over a finite file set = the distinct key
    // set (see the q90 query comment for why only keys are emitted).
    "q90_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q94_stream_ingest_gate" -> sqlQ94StreamGate,

    "q104_stream_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS tsec,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id, (tsec // 3600) * 3600 AS w_start,
        |  (tsec // 3600) * 3600 + 3600 AS w_end,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    "q110_stream_join" ->
      """WITH base AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS ts_s
        |  FROM events),
        |v AS (SELECT user_id, event_id, ts_s FROM base
        |      WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_s AS pts_s
        |      FROM base WHERE event_type = 'purchase')
        |SELECT v.user_id, v.event_id AS view_id, p.purchase_id,
        |  v.ts_s - p.pts_s AS gap_s
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND p.pts_s BETWEEN v.ts_s - 21600 AND v.ts_s""".stripMargin,

    // Each event contributes to both covering windows (k = 0 shares the
    // event's own hour-start; k = 1 the hour before).
    "q158_stream_sliding" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS tsec,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |k AS (SELECT unnest([0, 1]) AS k)
        |SELECT user_id,
        |  (tsec // 3600 - k) * 3600 AS w_start,
        |  (tsec // 3600 - k) * 3600 + 7200 AS w_end,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM e, k GROUP BY 1, 2, 3""".stripMargin,

    // Stream scoring against the batch-trained model must equal the
    // batch assignment bit for bit — the oracle IS q145's.
    "q162_stream_score" -> sqlQ145KMeans,

    // Stream hashing = batch hashing bit for bit, so the gate's flagged
    // set is the plain batch join: odd-half images vs the even-half
    // distinct-hash representative index at Hamming <= 3 (the banded
    // candidates are recall-lossless there by pigeonhole).
    "q166_stream_image_gate" -> (sqlPhashCtes +
      """,
        |idx AS (
        |  SELECT hi, lo, min(doc_id) AS hist_id FROM hh
        |  WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |inc AS (
        |  SELECT doc_id AS in_id, hi, lo FROM hh WHERE doc_id % 2 = 1)
        |SELECT i.in_id, x.hist_id
        |FROM inc i JOIN idx x
        |ON bit_count(xor(CAST(i.hi AS BIT), CAST(x.hi AS BIT)))
        |  + bit_count(xor(CAST(i.lo AS BIT), CAST(x.lo AS BIT))) <= 3"""
        .stripMargin),

    // The identical per-row verdicts in batch: NULL verdicts count as
    // failed (NOT coalesce(valid, FALSE)), concat_ws skips passing
    // checks' null slots.
    "q174_stream_quarantine" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT event_id, concat_ws(',',
        |    CASE WHEN NOT coalesce(value IS NOT NULL, FALSE)
        |      THEN 'value_nonnull' END,
        |    CASE WHEN NOT coalesce(cents BETWEEN 100 AND 20000, FALSE)
        |      THEN 'cents_range' END,
        |    CASE WHEN NOT coalesce(event_type IN
        |        ('click', 'view', 'purchase', 'signup'), FALSE)
        |      THEN 'type_domain' END) AS reasons
        |  FROM e)
        |SELECT event_id, reasons, reasons <> '' AS quarantined
        |FROM r""".stripMargin,

    // Plain batch left range join — the contract the watermarked
    // streaming replay must land on exactly.
    "q151_stream_outer_join" ->
      """WITH base AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS ts_s
        |  FROM events),
        |v AS (SELECT user_id, event_id, ts_s FROM base
        |      WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_s AS pts_s
        |      FROM base WHERE event_type = 'purchase')
        |SELECT v.user_id, v.event_id AS view_id, p.purchase_id,
        |  v.ts_s - p.pts_s AS gap_s
        |FROM v LEFT JOIN p ON v.user_id = p.user_id
        |  AND p.pts_s BETWEEN v.ts_s - 21600 AND v.ts_s""".stripMargin,

    // The whole-history recompute the four folded micro-batch
    // snapshots must land on exactly.
    "q143_stream_matview" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total,
        |  min(cents) AS mn, max(cents) AS mx,
        |  CAST(sum(cents * cents) AS BIGINT) AS sumsq
        |FROM p GROUP BY user_id""".stripMargin,

    // The q199 fold (same day0 derivation) — the stream's versioned
    // OR-merge must land exactly on the batch bitmap.
    "q203_stream_bitmap" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM e),
        |idx AS (
        |  SELECT user_id, day - d0.day0 AS day FROM e, d0
        |  WHERE day - d0.day0 >= 0 AND day - d0.day0 < 60),
        |b AS (
        |  SELECT user_id,
        |    bit_or(CAST(1 AS BIGINT) << CAST(day AS INT)) AS bmp
        |  FROM idx GROUP BY 1)
        |SELECT user_id, bmp,
        |  CAST(bit_count(bmp) AS BIGINT) AS n_active_days
        |FROM b""".stripMargin,

    // q244: the q239 batch twin verbatim — the streaming digit counts
    // must be indistinguishable from the batch audit
    "q244_stream_benford" ->
      """WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit, CAST(count(*) AS BIGINT) AS obs
        |  FROM v WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM d)
        |SELECT digit, obs, round(log10(1 + 1.0 / digit), 6) AS exp_share,
        |  round((obs - t.n * log10(1 + 1.0 / digit))
        |      * (obs - t.n * log10(1 + 1.0 / digit))
        |    / (t.n * log10(1 + 1.0 / digit)), 6) AS chi2_term
        |FROM d, t""".stripMargin,

    // q247: the q143 recompute verbatim — the manifest-assembled
    // changed-bucket state must be indistinguishable from the
    // full-snapshot fold
    "q247_stream_matview_delta" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total,
        |  min(cents) AS mn, max(cents) AS mx,
        |  CAST(sum(cents * cents) AS BIGINT) AS sumsq
        |FROM p GROUP BY user_id""".stripMargin,

    // q248: the version-2 read must equal the PREFIX recompute — the
    // first three week slices only (day < 19745)
    "q248_matview_time_travel" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |    AND epoch_ns(ts) // 86400000000000 < 19745)
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total,
        |  min(cents) AS mn, max(cents) AS mx,
        |  CAST(sum(cents * cents) AS BIGINT) AS sumsq
        |FROM p GROUP BY user_id""".stripMargin,

    // q249: the SAME inverse-CDF formula over the raw rows — smallest
    // cents whose cumulative count reaches ceil(q*n), identical operand
    // order on both sides
    "q249_stream_quantile_matview" ->
      """WITH p AS (
        |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT)
        |    AS cents FROM events),
        |h AS (
        |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, cents,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY cents)
        |      AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM h)
        |SELECT event_type,
        |  min(CASE WHEN cum >= CAST(ceil(0.5 * tot) AS BIGINT)
        |    THEN cents END) AS p50,
        |  min(CASE WHEN cum >= CAST(ceil(0.9 * tot) AS BIGINT)
        |    THEN cents END) AS p90,
        |  min(CASE WHEN cum >= CAST(ceil(0.99 * tot) AS BIGINT)
        |    THEN cents END) AS p99,
        |  max(tot) AS n_rows
        |FROM c GROUP BY event_type""".stripMargin,
  )
}
