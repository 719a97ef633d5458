package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucket join plans with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = graft.Tables.events(spark, sf("sf0.001"))
        .select($"event_id", $"user_id", $"value")
      val users = ev.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"))
      BucketedLayout.writeBucketed(ev, "ev_bucketed", "user_id", 8,
        sortCol = Some("user_id"))
      BucketedLayout.writeBucketed(users, "users_bucketed", "user_id", 8,
        sortCol = Some("user_id"))

      val joined = BucketedLayout.table(spark, "ev_bucketed")
        .join(BucketedLayout.table(spark, "users_bucketed"), "user_id")
      assert(BucketedLayout.isShuffleFree(joined),
        s"bucketed join must not exchange:\n${joined.queryExecution.executedPlan}")
      // and it is still CORRECT:
      assert(joined.count() === ev.count())

      // control: the same join over non-bucketed data DOES shuffle
      val unbucketed = ev.join(users, "user_id")
      assert(!BucketedLayout.isShuffleFree(unbucketed),
        "control join should shuffle without bucketing")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS users_bucketed")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = graft.Tables.events(spark, sf("sf0.001"))
        .select($"event_id", $"user_id", $"value")
      BucketedLayout.writeBucketed(ev, "ev_bucketed2", "user_id", 8)
      val agg = BucketedLayout.table(spark, "ev_bucketed2")
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
      assert(BucketedLayout.isShuffleFree(agg),
        s"groupBy on bucket key must not exchange:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() ===
        ev.select($"user_id").distinct().count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed2")
    }
  }
}
