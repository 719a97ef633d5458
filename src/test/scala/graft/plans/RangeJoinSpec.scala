package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("broadcast range join equals the expressed-predicate join") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val windows = ev.groupBy($"user_id".as("r_user"))
      .agg(min($"ts").as("lo"), (min($"ts") + expr("INTERVAL 72 HOURS")).as("hi"))
    val custom = RangeJoin.broadcastRange(ev, windows,
        "user_id", "r_user", "ts", "lo", "hi")
      .select($"event_id", $"r_user")
    val builtin = ev.join(windows,
        $"user_id" === $"r_user" && $"ts" >= $"lo" && $"ts" <= $"hi")
      .select($"event_id", $"r_user")
    assert(custom.exceptAll(builtin).count() === 0)
    assert(builtin.exceptAll(custom).count() === 0)
    assert(custom.count() > 0)
  }

  test("physical plan uses BroadcastRangeJoinExec, no exchange on probe side") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val windows = ev.groupBy($"user_id".as("r_user"))
      .agg(min($"ts").as("lo"), (min($"ts") + expr("INTERVAL 1 DAY")).as("hi"))
    val df = RangeJoin.broadcastRange(ev, windows,
      "user_id", "r_user", "ts", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), s"plan:\n$plan")
  }

  test("interval boundaries are inclusive; keys without intervals drop") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // == lo: match
      (1L, 11L, ts("2024-01-01 11:00:00")),  // inside
      (1L, 12L, ts("2024-01-01 12:00:00")),  // == hi: match
      (1L, 13L, ts("2024-01-01 12:00:01")),  // past hi: drop
      (2L, 20L, ts("2024-01-01 10:30:00"))   // key without window: drop
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("rk", "lo", "hi")
    val got = RangeJoin.broadcastRange(left, right, "k", "rk", "t", "lo", "hi")
      .select($"id").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 12L))
  }

  test("overlapping intervals all match (m:n semantics)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 100L, ts("2024-01-01 11:00:00")))
      .toDF("k", "id", "t")
    val right = Seq(
      (1L, "w1", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (1L, "w2", ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")),
      (1L, "w3", ts("2024-01-01 11:30:00"), ts("2024-01-01 13:00:00"))
    ).toDF("rk", "w", "lo", "hi")
    val got = RangeJoin.broadcastRange(left, right, "k", "rk", "t", "lo", "hi")
      .select($"w").as[String].collect().toSet
    assert(got === Set("w1", "w2"))
  }
}
