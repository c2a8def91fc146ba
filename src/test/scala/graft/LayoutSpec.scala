package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed Morton codes") {
    // x=0b1010, y=0b0110 -> even bits from x (bits 2,6), odd from y
    // (bits 3,5): 4 + 8 + 32 + 64 = 108
    val got = Seq((10L, 6L)).toDF("x", "y")
      .select(Layout.interleave($"x", $"y", 4).as("z"))
      .as[Long].head()
    assert(got === 108L)
    // identity cases
    val z0 = Seq((0L, 0L)).toDF("x", "y")
      .select(Layout.interleave($"x", $"y", 4).as("z")).as[Long].head()
    assert(z0 === 0L)
    // all-ones interleave of 4-bit values = 0xFF
    val z1 = Seq((15L, 15L)).toDF("x", "y")
      .select(Layout.interleave($"x", $"y", 4).as("z")).as[Long].head()
    assert(z1 === 255L)
  }

  test("fused InterleaveBits = composed per-bit interleave = JDK reference") {
    // Layout.interleave delegates to the fused expression for bits <= 16;
    // pin it against the pre-fusion composed Column tree AND a
    // straightforward per-bit JDK loop, across bit widths and the mask
    // boundary (values >= 2^bits must truncate identically).
    def composed(x: org.apache.spark.sql.Column,
                 y: org.apache.spark.sql.Column, bits: Int) =
      (0 until bits).map { k =>
        shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
          .bitwiseOR(
            shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
      }.reduce(_ bitwiseOR _)
    def jdk(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { k =>
        (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    val xs = Seq(0L, 1L, 15L, 16L, 255L, 4097L, 65535L, 65536L, 99999L)
    val rows = for (x <- xs; y <- xs) yield (x, y)
    for (bits <- Seq(4, 7, 16)) {
      val mask = (1L << bits) - 1L
      val got = rows.toDF("x", "y")
        .select($"x", $"y",
          graft.plans.InterleaveBits($"x", $"y", bits).as("fused"),
          composed($"x".bitwiseAND(lit(mask)),
            $"y".bitwiseAND(lit(mask)), bits).as("comp"))
        .as[(Long, Long, Long, Long)].collect()
      got.foreach { case (x, y, fused, comp) =>
        assert(fused === comp, s"bits=$bits x=$x y=$y")
        assert(fused === jdk(x & mask, y & mask, bits),
          s"bits=$bits x=$x y=$y vs JDK")
        assert(fused ===
          graft.plans.InterleaveBits.compute(x, y, bits),
          s"bits=$bits x=$x y=$y interpreted eval")
      }
    }
    // null propagates (BinaryExpression default)
    val n = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(graft.plans.InterleaveBits($"x", $"y", 16).as("z"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("zOrderBuckets: every curve cell's bbox is 1/8 of each dimension") {
    // 256x256 uniform grid scaled into the 16-bit range: with
    // bucketBits = 3 each bucket is a fixed top-3-bit cell of both
    // dims, so per-bucket spans are < 8192 — the footer-stats proof
    // that a 2-D range predicate prunes.
    val pts = spark.range(256L * 256L)
      .select(((col("id") % 256) * 256).as("x"),
        ((col("id") / 256) * 256).as("y"))
    val got = Layout.zOrderBuckets(pts, col("x"), col("y"), bucketBits = 3)
      .collect()
    assert(got.length === 64)
    got.foreach { r =>
      val (cnt, xMin, xMax, yMin, yMax) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(cnt === 1024L) // uniform grid: 65536 points / 64 cells
      assert(xMax - xMin < 8192, s"bucket ${r.getLong(0)} x span")
      assert(yMax - yMin < 8192, s"bucket ${r.getLong(0)} y span")
    }
    // cells tile the plane: bucket ids are exactly 0..63
    assert(got.map(_.getLong(0)).sorted.toSeq === (0L until 64L))
  }

  test("quantize clamps and bins") {
    val got = Seq(0.0, 0.49, 0.99, -5.0, 5.0).toDF("v")
      .select(Layout.quantize($"v", 0.0, 1.0, 2).as("q"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 3L, 0L, 3L))
  }

  test("z-order layout keeps every partition spatially tight") {
    // 64x64 uniform grid over the unit square
    val pts = spark.range(64L * 64L)
      .select((col("id") % 64).cast("double").as("gx"),
        (col("id") / 64).cast("long").cast("double").as("gy"))
      .select(($"gx" / 64.0).as("lat"), ($"gy" / 64.0).as("lon"))
    val z = Layout.zValue($"lat", $"lon", 0.0, 1.0, 0.0, 1.0, 6)
    val spans = Layout.zorderByRange(pts, z, 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(((max($"lat") - min($"lat")) * (max($"lon") - min($"lon")))
        .as("area"), count(lit(1)).as("n"))
      .collect()
    assert(spans.length === 16)
    // each partition holds 1/16 of the points; its bounding box must be
    // far below the full unit square (a (lat, lon) lexicographic sort
    // gives lon-span 1.0 for every partition -> area ~ 1/16 only in lat;
    // z-order bounds BOTH dimensions)
    spans.foreach { r =>
      assert(r.getDouble(1) < 0.3,
        s"partition ${r.getInt(0)} area ${r.getDouble(1)} too wide")
    }
  }
}
