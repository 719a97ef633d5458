package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ZOrder

/** Z-order layout: the bit-interleave must match its plain-Scala
  * reference exactly, and the layout must earn its keep — far fewer
  * files intersect a selective predicate's bounding box than under a
  * single-column sort, on BOTH dimensions.
  */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16 Column matches the Scala reference bit-for-bit") {
    val xs = Seq(0L, 1L, 2L, 255L, 256L, 4095L, 65535L, 12345L, 54321L)
    val rows = for (x <- xs; y <- xs) yield (x, y)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave16($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === ZOrder.interleave16Ref(x, y),
        s"z($x, $y)")
    }
    // axis sanity: interleaving (v, 0) spreads v to even bits only
    assert(ZOrder.interleave16Ref(0xFFFFL, 0L) === 0x55555555L)
    assert(ZOrder.interleave16Ref(0L, 0xFFFFL) === 0xAAAAAAAAL)
  }

  // per-file (min, max) bounding boxes of both dimensions, as a
  // file-stats index would hold them
  private def fileBoxes(path: String): Array[(Long, Long, Long, Long)] = {
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"))
      .select($"x0", $"x1", $"y0", $"y1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def touched(boxes: Array[(Long, Long, Long, Long)],
      x: Option[(Long, Long)], y: Option[(Long, Long)]): Int =
    boxes.count { case (x0, x1, y0, y1) =>
      x.forall { case (lo, hi) => x1 >= lo && x0 <= hi } &&
        y.forall { case (lo, hi) => y1 >= lo && y0 <= hi }
    }

  test("z-order layout skips files on both dimensions; x-sort only on x") {
    // a full 256×256 grid — every (x, y) cell exactly once
    val grid = spark.range(0, 65536L)
      .select(($"id" / 256).cast("long").as("x"), ($"id" % 256).as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString

    // layout A: range-partitioned by x alone (the single-column sort)
    grid.repartitionByRange(64, $"x")
      .write.mode("overwrite").parquet(s"$base/by_x")
    // layout B: range-partitioned by the z-value
    grid.withColumn("z", ZOrder.interleave16($"x", $"y"))
      .repartitionByRange(64, $"z")
      .drop("z")
      .write.mode("overwrite").parquet(s"$base/by_z")

    val boxA = fileBoxes(s"$base/by_x")
    val boxB = fileBoxes(s"$base/by_z")
    val nA = boxA.length
    val nB = boxB.length
    assert(nA >= 32 && nB >= 32, s"want ~64 files, got $nA / $nB")

    val xRange = Some((100L, 115L))
    val yRange = Some((100L, 115L))

    // x-filter: both layouts prune (x-sort perfectly, z-order well)
    assert(touched(boxA, xRange, None) <= nA / 4)
    assert(touched(boxB, xRange, None) <= nB / 2)

    // y-filter: the x-sorted layout reads EVERYTHING; z-order prunes
    assert(touched(boxA, None, yRange) === nA,
      "x-sorted files all span full y — no skipping possible")
    assert(touched(boxB, None, yRange) <= nB / 2,
      s"z-order must skip on y too: ${touched(boxB, None, yRange)}/$nB")

    // 2-D box: z-order touches a small corner; x-sort is x-bound only
    val boxTouchZ = touched(boxB, xRange, yRange)
    assert(boxTouchZ <= nB / 8,
      s"16×16 box of a 256×256 grid: $boxTouchZ/$nB files touched")

    // and the data survives the round-trip intact under both layouts
    assert(spark.read.parquet(s"$base/by_z").count() === 65536L)
    assert(spark.read.parquet(s"$base/by_x")
      .filter($"x".between(100, 115) && $"y".between(100, 115))
      .count() === 256L)
  }
}
