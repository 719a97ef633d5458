package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EpochRangeJoin must be pair-for-pair identical to the naive
  * inequality join, including epoch-boundary points, intervals spanning
  * many epochs, intervals shorter than one epoch, and duplicate matches
  * across keys. */
class EpochRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("epochRangeJoin equals the naive containment join, boundaries included") {
    // deterministic pseudo-random fixture: keys 0-4, points and
    // intervals derived from hash-free arithmetic so the test is stable
    val points = (0 until 400).map { i =>
      (i.toLong % 5, i.toLong, (i.toLong * 37) % 1000)
    }.toDF("k", "pid", "p")
    val intervals = (0 until 120).map { i =>
      val lo = (i.toLong * 53) % 900
      // mix of sub-epoch, exact-epoch and multi-epoch spans (epoch=100)
      val hi = lo + Seq(0L, 7L, 100L, 340L)(i % 4)
      (i.toLong % 5, i.toLong + 1000L, lo, hi)
    }.toDF("k", "iid", "lo", "hi")

    val fast = EpochRangeJoin.epochRangeJoin(
        points, "p", intervals, "lo", "hi", Seq("k"), epoch = 100L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.p" >= $"i.lo" && $"p.p" <= $"i.hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(fast === naive)
    assert(naive.nonEmpty, "fixture must actually produce matches")
    // boundary containment is inclusive on both ends
    val edge = EpochRangeJoin.epochRangeJoin(
        Seq((1L, 1L, 200L), (1L, 2L, 299L), (1L, 3L, 300L)).toDF("k", "pid", "p"),
        "p",
        Seq((1L, 9L, 200L, 299L)).toDF("k", "iid", "lo", "hi"),
        "lo", "hi", Seq("k"), epoch = 100L)
      .select($"pid").as[Long].collect().toSet
    assert(edge === Set(1L, 2L))
  }
}
