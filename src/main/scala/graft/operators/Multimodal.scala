package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The image path is a REAL codec: [[decodeImage]] reads PNG/JPEG/BMP/GIF
  * payloads with javax.imageio (pure JVM, no native deps) and emits
  * dimensions + per-channel statistics; [[synthImages]] builds
  * deterministic PNG payloads so environments without media files can
  * still exercise the full encode → decode → feature path end to end
  * (and, because the synthetic pixels are integer functions of the row
  * id, a SQL oracle can predict the decoded statistics exactly — q31).
  * Payload kinds imageio can't parse (audio/video containers) fall back
  * to [[byteHistogram]], the generic opaque-payload featurizer; swap in a
  * real codec (e.g. javacv) behind the same mapPartitions seam.
  */
object Multimodal {

  /** media(media_id, kind, payload binary, meta...) row. */
  final case class MediaItem(media_id: Long, kind: String,
                             payload: Array[Byte])

  /** Fixed-length feature vector + basic stats per item. */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, checksum: Long,
                                 features: Array[Float])

  /** Decoded-image features: exact dimensions and per-channel means (the
    * SQL-checkable subset), plus the fixed-length vector for ANN.
    */
  final case class ImageFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, width: Long, height: Long,
                                 mean_r: Double, mean_g: Double,
                                 mean_b: Double, features: Array[Float])

  /** Generic opaque-payload featurizer: byte histogram folded into `dim`
    * buckets, L1-normalized. The fallback for payload kinds without a JVM
    * decoder (audio/video) — deterministic, so pipelines stay testable.
    */
  def byteHistogram(payload: Array[Byte], dim: Int): Array[Float] =
    decodeStub(payload, dim)

  /** ImageIO's convenience `read(InputStream)`/`write(..., OutputStream)`
    * wrap the stream in a FILE-backed cache by default
    * (`FileCacheImageInputStream`): one temp-file create+write+delete in
    * `java.io.tmpdir` PER PAYLOAD — pure fixed cost for in-memory byte
    * payloads, disk-bound at high task counts, and it serializes on the
    * filesystem rather than scaling with cores. Memory-cached streams are
    * the right mode for byte-array payloads; the toggle is a plain static
    * boolean on the JVM, idempotent and race-free to set repeatedly.
    * Called once per partition by every ImageIO-touching kernel.
    */
  private def imageIoMemCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private[graft] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val total = math.max(1f, payload.length.toFloat)
    var j = 0
    while (j < dim) { acc(j) /= total; j += 1 }
    acc
  }

  /** Batch feature extraction over the binary column — mapPartitions so a
    * real decoder can amortize per-batch model/codec setup exactly like a
    * pandas-batch UDF would. Uses [[byteHistogram]]: content-agnostic,
    * works for any payload kind.
    */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 16)
  : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val feats = byteHistogram(m.payload, dim)
        var ck = 0L
        var i = 0
        while (i < m.payload.length) { ck = ck * 31 + (m.payload(i) & 0xff); i += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, ck, feats)
      }
    }
  }

  /** Real image decode via javax.imageio: parses the payload (PNG, JPEG,
    * BMP, GIF — whatever ImageIO has readers for), extracts exact
    * dimensions and per-channel means, and packs a fixed feature vector
    * [width, height, mean_r, mean_g, mean_b, 0, ...] of length `dim` that
    * feeds the ANN path unchanged (q67). Channel sums are exact integer
    * arithmetic (8-bit channels in a long), divided once — so the means
    * are reproducible by any engine that can enumerate the pixels.
    *
    * Unparseable payloads are dropped (the production behavior for a
    * corrupt image in a curation pipeline is to quarantine, not crash);
    * use [[extractFeatures]] when every payload must produce a row.
    *
    * mapPartitions, like [[extractFeatures]]: ImageIO reader lookup is
    * per-JVM-cached, and a heavier codec would init here once per batch.
    */
  def decodeImages(media: Dataset[MediaItem], dim: Int = 8)
  : Dataset[ImageFeatures] = {
    require(dim >= 5, s"dim must hold [w, h, mean_r, mean_g, mean_b]: $dim")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoMemCache()
      it.flatMap { m =>
        // NonFatal, not just IOException: several ImageIO readers throw
        // RuntimeExceptions (IllegalArgumentException, CMMException,
        // IndexOutOfBoundsException) on truncated/malformed payloads —
        // all of them are "quarantine", never a task failure.
        val img = try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload)))
        } catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val w = im.getWidth; val h = im.getHeight
          // one bulk pixel grab per row of the image: per-pixel getRGB
          // goes through the ColorModel on every call and dominates the
          // decode cost at fixture scale
          val rowBuf = new Array[Int](w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            im.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val mr = sr.toDouble / n
          val mg = sg.toDouble / n
          val mb = sb.toDouble / n
          val feats = new Array[Float](dim)
          feats(0) = w.toFloat; feats(1) = h.toFloat
          feats(2) = mr.toFloat; feats(3) = mg.toFloat; feats(4) = mb.toFloat
          ImageFeatures(m.media_id, m.kind, m.payload.length.toLong,
            w.toLong, h.toLong, mr, mg, mb, feats)
        }
      }
    }
  }

  /** Deterministic PNG fixture: one small image per input row, dimensions
    * and pixel channels integer functions of the id —
    *   w = 4 + id % 13, h = 3 + id % 7,
    *   r(x,y) = (id + 3x + 7y) % 256, g = (2id + 5x + y) % 256,
    *   b = (3id + x + 2y) % 256
    * — encoded through the REAL ImageIO PNG writer (lossless), so
    * [[decodeImages]] downstream exercises a genuine byte-level decode
    * whose output an oracle can still predict in closed form.
    */
  def synthImages(df: DataFrame, idCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      imageIoMemCache()
      // floorMod: a negative id under Scala's signed % would yield a
      // non-positive width and BufferedImage throws; floorMod keeps the
      // same values for the non-negative fixture ids and stays total
      val w = (4 + java.lang.Math.floorMod(id, 13L)).toInt
      val h = (3 + java.lang.Math.floorMod(id, 7L)).toInt
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val buf = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = java.lang.Math.floorMod(id + 3L * x + 7L * y, 256L).toInt
          val g = java.lang.Math.floorMod(2L * id + 5L * x + y, 256L).toInt
          val b = java.lang.Math.floorMod(3L * id + x + 2L * y, 256L).toInt
          buf(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      im.setRGB(0, 0, w, h, buf, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      MediaItem(id, "image/png", bos.toByteArray)
    }
  }

  /** Nearest-neighbor image resize: decode the payload, resample to
    * (dstW x dstH), re-encode PNG (lossless) — the thumbnail/normalize
    * stage of a multimodal curation pipeline, in front of feature
    * extraction so every downstream vector has a uniform receptive size.
    *
    * The source index is the EXPLICIT floor map `sx = x * srcW / dstW`
    * (integer division; likewise sy) rather than Java2D's
    * getScaledInstance, whose interpolation is implementation-defined —
    * this map is deterministic and reproducible in closed form by any
    * engine, which is what lets the q91 gate oracle-check the full
    * decode -> resample -> encode -> decode byte path.
    *
    * Unparseable payloads are dropped (same quarantine contract as
    * [[decodeImages]]). mapPartitions for per-batch codec amortization.
    */
  def resizeImages(media: Dataset[MediaItem], dstW: Int, dstH: Int)
  : Dataset[MediaItem] = {
    require(dstW > 0 && dstH > 0, s"dst dims must be positive: $dstW x $dstH")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoMemCache()
      it.flatMap { m =>
        val img = try {
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload)))
        } catch { case scala.util.control.NonFatal(_) => None }
        img.map { im =>
          val sw = im.getWidth; val sh = im.getHeight
          val src = new Array[Int](sw * sh)
          im.getRGB(0, 0, sw, sh, src, 0, sw)
          val buf = new Array[Int](dstW * dstH)
          var y = 0
          while (y < dstH) {
            val sy = y * sh / dstH
            var x = 0
            while (x < dstW) {
              buf(y * dstW + x) = src(sy * sw + x * sw / dstW)
              x += 1
            }
            y += 1
          }
          val out = new java.awt.image.BufferedImage(
            dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          out.setRGB(0, 0, dstW, dstH, buf, 0, dstW)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          // the bytes ARE png now regardless of the input container —
          // a propagated source kind would misroute downstream dispatch
          MediaItem(m.media_id, "image/png", bos.toByteArray)
        }
      }
    }
  }

  /** Frame sampling for chunked payloads (video stand-in): keep every
    * k-th fixed-size chunk as its own row.
    */
  def sampleChunks(media: Dataset[MediaItem], chunkBytes: Int,
                   everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (m.media_id, idx, chunk) }
    }.toDF("media_id", "chunk_idx", "chunk")
  }

  /** Construct a media dataset from any table, payload synthesized from a
    * string column — the ingest shape for environments without real media
    * files.
    */
  def fromStrings(df: DataFrame, idCol: String, strCol: String,
                  kind: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(strCol))
      .as[(Long, String)]
      .map { case (id, s) =>
        MediaItem(id, kind, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** Perceptual hash (aHash) per image: decode, sample an 8×8 grid of
    * source pixels by the floor map (x·w div 8, y·h div 8) — the q91
    * resize map at fixed 8×8 — take the integer ITU-R 601 luma
    * 299r + 587g + 114b per sample, and set bit p (p = y·8 + x) iff
    * luma_p · 64 > Σ lumas (strictly above the mean, integer
    * cross-multiplied — no division). The 64 bits pack into two longs
    * (hash_lo = bits 0–31, hash_hi = 32–63), the [[graft.functions
    * .TextFunctions.portableHash64]] halves convention so the oracle
    * never touches the sign bit.
    *
    * Deterministic end to end: integer pixel reads, integer luma,
    * integer mean compare — the oracle re-derives every bit from the
    * synthetic channel formulas in closed form. Undecodable payloads are
    * quarantined (dropped), the [[decodeImages]] contract.
    */
  def perceptualHashes(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoMemCache()
      it.flatMap(m => aHash(m.payload).map { case (hi, lo) =>
        (m.media_id, hi, lo)
      })
    }.toDF("media_id", "hash_hi", "hash_lo")
  }

  /** Streaming-compatible twin of [[perceptualHashes]] that carries the
    * event-time column through (mapPartitions drops non-selected
    * columns, and a stream cannot re-join its own hashes without state):
    * (media_id, ts, hash_hi, hash_lo). Stateless — legal in a streaming
    * plan with no watermark of its own.
    */
  def perceptualHashStream(df: DataFrame, idCol: String,
                           payloadCol: String, tsCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol),
        col(tsCol).cast("timestamp"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions { it =>
        imageIoMemCache()
        it.flatMap { case (id, payload, ts) =>
          aHash(payload).map { case (hi, lo) => (id, ts, hi, lo) }
        }
      }.toDF("media_id", "ts", "hash_hi", "hash_lo")
  }

  /** The shared aHash kernel: decode, 8×8 floor-map sample, integer
    * luma, strict-mean bits, two-long packing. None = quarantine.
    */
  private def aHash(payload: Array[Byte]): Option[(Long, Long)] = {
    val img = try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      val w = im.getWidth; val h = im.getHeight
      val lum = new Array[Long](64)
      var sum = 0L
      var p = 0
      while (p < 64) {
        val rgb = im.getRGB((p % 8) * w / 8, (p / 8) * h / 8)
        val l = 299L * ((rgb >> 16) & 0xFF) +
          587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
        lum(p) = l; sum += l; p += 1
      }
      var hi = 0L; var lo = 0L
      p = 0
      while (p < 64) {
        if (lum(p) * 64L > sum) {
          if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
        }
        p += 1
      }
      (hi, lo)
    }
  }

  /** Per-frame band energies decoded from a WAV payload — the audio
    * analog of [[ImageFeatures]]: the SQL-checkable integer subset.
    */
  final case class AudioFrame(media_id: Long, frame_idx: Long,
                              e0: Long, e1: Long, e2: Long, e3: Long,
                              peak_band: Long)

  /** Deterministic synthetic WAV payloads (16-bit mono PCM, 8 kHz):
    * sample i of id is `floorMod(id·31 + i²·7, 4096) − 2048`, length
    * `1024 + (id mod 7)·256` samples — a full RIFF/WAVE container, so
    * [[audioFrames]]' chunk walker exercises the real byte path, and a
    * SQL oracle re-derives every decoded sample in closed form (the
    * audio twin of [[synthImages]]' pixel formulas).
    */
  def synthAudio(df: DataFrame, idCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = (1024 + java.lang.Math.floorMod(id, 7L) * 256).toInt
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)       // PCM, mono
        .putInt(8000).putInt(16000)    // sample rate, byte rate
        .putShort(2).putShort(16)      // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0L
      while (i < n) {
        bb.putShort(
          (java.lang.Math.floorMod(id * 31L + i * i * 7L, 4096L) - 2048L)
            .toShort)
        i += 1
      }
      MediaItem(id, "audio/wav", bb.array())
    }
  }

  /** Decode WAV payloads and emit one row per non-overlapping
    * `frameLen`-sample frame with 4 integer band energies (sum |s| over
    * each quarter — the codec-honest stand-in for spectral bands) and
    * the peak band (ties to the lowest index). A real RIFF chunk walker
    * — fmt parsed wherever it sits, unknown chunks skipped — restricted
    * to 16-bit mono PCM; unparseable payloads quarantine to zero rows
    * (the [[perceptualHashes]] contract). Trailing partial frames drop.
    *
    * Scale shape: mapPartitions decode (per-batch codec seam), output
    * is frames not samples — ~1/256 of the decoded volume crosses into
    * the relational stage.
    */
  def audioFrames(media: Dataset[MediaItem],
                  frameLen: Int = 256): Dataset[AudioFrame] = {
    require(frameLen >= 4 && frameLen % 4 == 0,
      s"frameLen must be a positive multiple of 4, got $frameLen")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeWavPcm16Mono(m.payload).toSeq.flatMap { samples =>
          val nFrames = samples.length / frameLen
          val quarter = frameLen / 4
          (0 until nFrames).map { f =>
            val e = new Array[Long](4)
            var i = 0
            while (i < frameLen) {
              e(i / quarter) += math.abs(samples(f * frameLen + i).toLong)
              i += 1
            }
            // >= chain = lowest index wins ties (oracle mirrors it)
            val peak =
              if (e(0) >= e(1) && e(0) >= e(2) && e(0) >= e(3)) 0L
              else if (e(1) >= e(2) && e(1) >= e(3)) 1L
              else if (e(2) >= e(3)) 2L
              else 3L
            AudioFrame(m.media_id, f.toLong, e(0), e(1), e(2), e(3), peak)
          }
        }
      }
    }
  }

  /** Deterministic synthetic query CLIPS of the [[synthAudio]] signal:
    * each input row (id, offsetSamples, nSamples) becomes a WAV whose
    * sample i is the SOURCE track's sample offsetSamples + i — a
    * time-shifted excerpt through the same real RIFF container, so a
    * fingerprint matcher must recover (source id, shift) from audio
    * bytes alone. Columns are read by NAME: `id`, `off`, `n`.
    */
  def synthAudioClips(df: DataFrame): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col("id").cast("long"), col("off").cast("long"),
        col("n").cast("long"))
      .as[(Long, Long, Long)].map { case (id, off, n) =>
        val len = n.toInt
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * len)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * len)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(8000).putInt(16000)
          .putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(2 * len)
        var i = 0L
        while (i < len) {
          val j = off + i
          bb.putShort(
            (java.lang.Math.floorMod(id * 31L + j * j * 7L, 4096L) - 2048L)
              .toShort)
          i += 1
        }
        MediaItem(id, "audio/wav", bb.array())
      }
  }

  /** Shazam-style offset-coherent fingerprint matching: join query
    * fingerprints to track fingerprints by VALUE, histogram the frame
    * offset `dt = track_frame − query_frame` per (query, track), and
    * keep each query's best (n_matches desc, track asc, dt asc) — a
    * time-INCOHERENT fingerprint collision scatters across dt values
    * and never outvotes the true source, whose matches all land on one
    * dt. Inputs need (media_id, frame_idx, fp); `dt` and the vote are
    * exact integers, so the winner is engine-deterministic.
    *
    * Scale shape: one equi-join on fp (the index side is the track
    * fingerprint table — precomputed once, the retrieval artifact), one
    * (query, track, dt) hash aggregate, one per-query top-1 window over
    * the candidate histogram (query-keyed — candidate counts per query
    * are bounded by clip length × bucket collisions, not the corpus).
    */
  def fingerprintMatch(queryFps: DataFrame, trackFps: DataFrame)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queryFps.select(col("media_id").as("query_id"),
      col("frame_idx").as("qf"), col("fp"))
    val t = trackFps.select(col("media_id").as("track_id"),
      col("frame_idx").as("tf"), col("fp"))
    val hist = q.join(t, "fp")
      .groupBy(col("query_id"), col("track_id"),
        (col("tf") - col("qf")).as("dt"))
      .agg(count(lit(1)).as("n_matches"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_matches").desc, col("track_id").asc, col("dt").asc)
    hist.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Scene-change detection over a sampled frame stream — the video
    * curation pass that splits long footage into shots before per-shot
    * dedup/captioning: per media, frame ENERGY (sum of byte values, an
    * exact integer; the codec-honest stand-in for pixel luminance
    * volume), a boundary wherever the relative energy jump
    * `|e_t − e_{t−1}| · tDen >= tNum · (e_t + e_{t−1})` fires
    * (cross-multiplied integers — no float threshold), and the scene
    * id as the running boundary count (the W5 run-id idiom applied to
    * media). Frame 0 opens scene 0 with no boundary flag.
    *
    * Scale shape: energies come from one posexplode + (media, frame)
    * hash aggregate (byte-linear, the q176 codes pattern); the
    * lag/cumsum windows share one media-keyed exchange. Frames, not
    * payloads, cross the shuffle.
    */
  def sceneChanges(frames: DataFrame, tNum: Long, tDen: Long)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tNum > 0 && tDen > 0, "sceneChanges: threshold must be > 0")
    val codes = frames
      .select(col("media_id"), col("chunk_idx").cast("long").as("frame_idx"),
        posexplode(split(col("chunk").cast("string"), "")))
      .filter(length(col("col")) > 0)
      .groupBy("media_id", "frame_idx")
      .agg(sum(ascii(col("col"))).as("energy"))
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    codes
      .withColumn("prev", lag(col("energy"), 1).over(w))
      .withColumn("is_boundary",
        col("prev").isNotNull &&
          abs(col("energy") - col("prev")) * tDen >=
            lit(tNum) * (col("energy") + col("prev")))
      .withColumn("scene_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev")
  }

  /** RIFF walker: returns the PCM16-mono sample array, or None for
    * anything it cannot strictly parse (truncated, compressed, stereo,
    * non-16-bit, missing chunks).
    */
  private[graft] def decodeWavPcm16Mono(
      payload: Array[Byte]): Option[Array[Short]] = {
    try {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.remaining() < 12) return None
      val riff = new Array[Byte](4); bb.get(riff)
      if (!java.util.Arrays.equals(riff, "RIFF".getBytes("US-ASCII")))
        return None
      bb.getInt // declared riff size; chunk walk below is authoritative
      val wave = new Array[Byte](4); bb.get(wave)
      if (!java.util.Arrays.equals(wave, "WAVE".getBytes("US-ASCII")))
        return None
      var fmtOk = false
      var samples: Option[Array[Short]] = None
      while (bb.remaining() >= 8 && samples.isEmpty) {
        val tag = new Array[Byte](4); bb.get(tag)
        val len = bb.getInt
        if (len < 0 || len > bb.remaining()) return None
        val name = new String(tag, "US-ASCII")
        if (name == "fmt ") {
          if (len < 16) return None
          val p0 = bb.position()
          val fmt = bb.getShort; val ch = bb.getShort
          bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return None
          fmtOk = true
          bb.position(p0 + len + (len & 1)) // chunks are word-aligned
        } else if (name == "data") {
          if (!fmtOk) return None
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort; i += 1 }
          samples = Some(out)
        } else {
          bb.position(bb.position() + len + (len & 1))
        }
      }
      samples
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
