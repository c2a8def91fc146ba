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
