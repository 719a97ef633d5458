package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics pins for the [[Analytics]] additions, on planted inputs
  * (the value-level gate is the DuckDB oracle at all SFs).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q55 islands: 30-day gaps split, <=30-day gaps merge, per customer") {
    // Customer 1: days 0, 10, 45 -> two islands ([0,10], [45]).
    // Customer 2: days 0, 30 (exactly 30 apart -> merged), 200 -> two.
    val orders = Seq(
      (1L, 101L, "2024-01-01"), (1L, 102L, "2024-01-11"),
      (1L, 103L, "2024-02-15"),
      (2L, 201L, "2024-01-01"), (2L, 202L, "2024-01-31"),
      (2L, 203L, "2024-07-19")
    ).toDF("o_custkey", "o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp($"d"))
      .drop("d")

    val dir = java.nio.file.Files.createTempDirectory("islands").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Analytics.queries("q55_order_islands")(spark, dir)
      .orderBy($"o_custkey", $"island")
      .select($"o_custkey", $"start_date".cast("string"),
        $"end_date".cast("string"), $"n_orders")
      .collect()
    assert(out.toSeq === Seq(
      Row(1L, "2024-01-01", "2024-01-11", 2L),
      Row(1L, "2024-02-15", "2024-02-15", 1L),
      Row(2L, "2024-01-01", "2024-01-31", 2L),
      Row(2L, "2024-07-19", "2024-07-19", 1L)))
  }

  test("t31 trace assembly: event order inside the trace is by event_id " +
    "and 30-minute gaps split sessions") {
    // user 1: a@00:00, b@00:10 (same session), c@01:30 (gap > 1800s ->
    // new session). event_ids planted OUT of ts order within a session
    // would be wrong data (ids are assigned in arrival order), so the
    // pin is: trace = event_type sequence in event_id order.
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:10:00", "click"),
      (3L, 1L, "2024-01-01 01:30:00", "purchase"),
      (4L, 2L, "2024-01-01 00:00:00", "error")
    ).toDF("event_id", "user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val dir = java.nio.file.Files.createTempDirectory("trace").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Extended.queries("t31_session_trace")(spark, dir)
      .orderBy($"user_id", $"session_seq")
      .select($"user_id", $"session_seq", $"n_events", $"trace")
      .collect()
    assert(out.toSeq === Seq(
      Row(1L, 1L, 2L, "view click"),
      Row(1L, 2L, 1L, "purchase"),
      Row(2L, 1L, 1L, "error")))
  }

  test("q70 incremental merge: base+delta re-aggregation equals the " +
    "full recompute and the shipped cutoff is non-vacuous") {
    // user 1 spans the 2024-01-21 cutoff; user 2 exists only in the
    // delta; user 3 has a NULL ts — the full recompute counts it, so
    // the merge must route it somewhere instead of dropping it from
    // both sides
    val ev = Seq(
      (1L, 1L, Some("2024-01-10 12:00:00"), 1.5),
      (2L, 1L, Some("2024-01-25 12:00:00"), 2.25),
      (3L, 2L, Some("2024-01-22 09:00:00"), 4.0),
      (4L, 3L, None, 8.0)
    ).toDF("event_id", "user_id", "t", "value")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.queries("q70_incremental_agg")(spark, dir)
      .orderBy($"user_id")
      .select($"user_id", $"n_events", $"sum_value", $"avg_value")
      .collect()
    assert(out.toSeq === Seq(
      Row(1L, 2L, 3.75, 1.875), Row(2L, 1L, 4.0, 4.0),
      Row(3L, 1L, 8.0, 8.0)))
    // the shipped cutoff must split the real corpus, or the merge path
    // degenerates to a rename of the full recompute
    val real = graft.Tables.events(spark, sf("sf0.001"))
    val cutoff = to_timestamp(lit("2024-01-21"))
    assert(real.filter($"ts" < cutoff).limit(1).count() === 1L)
    assert(real.filter($"ts" >= cutoff).limit(1).count() === 1L)
  }

  test("sql05: month spine is dense and zero-fills empty months") {
    // Orders in Jan and Apr only -> spine Jan..Apr with Feb/Mar at 0.
    val orders = Seq(
      (1L, "2024-01-05"), (2L, "2024-01-20"), (3L, "2024-04-02")
    ).toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
    val dir = java.nio.file.Files.createTempDirectory("spine").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = SqlSurface.queries("sql05_recursive_cte")(spark, dir)
      .orderBy($"month_start")
      .select($"month_start".cast("string"), $"n_orders")
      .collect()
    assert(out.toSeq === Seq(
      Row("2024-01-01", 2L), Row("2024-02-01", 0L),
      Row("2024-03-01", 0L), Row("2024-04-01", 1L)))
  }

  test("q54 quantiles: interpolation and discrete pick on a known group") {
    // Values 1..4: median 2.5, q25_cont 1.75, q75_disc = smallest v with
    // cume_dist >= 0.75 -> 3.
    val li = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0))
      .toDF("l_returnflag", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("osa").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Analytics.queries("q54_ordered_set_agg")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Double]("med_qty") === 2.5)
    assert(row.getAs[Double]("q25_cont") === 1.75)
    assert(row.getAs[Double]("q75_disc") === 3.0)
  }

  test("q57 LOCF: masked values fill from the last good reading per user") {
    // user 1: v=10, error, error, v=20, error -> fills 10,10,10,20,20
    // user 2: leading error stays NULL, then 5 fills forward
    val ev = Seq(
      (1L, 1L, "click", 10.0, "2024-01-01 00:00:01"),
      (1L, 2L, "error", 99.0, "2024-01-01 00:00:02"),
      (1L, 3L, "error", 98.0, "2024-01-01 00:00:03"),
      (1L, 4L, "view", 20.0, "2024-01-01 00:00:04"),
      (1L, 5L, "error", 97.0, "2024-01-01 00:00:05"),
      (2L, 6L, "error", 96.0, "2024-01-01 00:00:01"),
      (2L, 7L, "click", 5.0, "2024-01-01 00:00:02")
    ).toDF("user_id", "event_id", "event_type", "value", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val dir = java.nio.file.Files.createTempDirectory("locf").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.queries("q57_locf")(spark, dir)
      .orderBy($"event_id")
      .select($"event_id", $"v_filled")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq === Seq(
      (1L, Some(10.0)), (2L, Some(10.0)), (3L, Some(10.0)),
      (4L, Some(20.0)), (5L, Some(20.0)),
      (6L, None), (7L, Some(5.0))))
  }

  test("q58 winsorize: interior values pass through, tails clip to the exact bounds") {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = sf("sf0.001")
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val out = Analytics.queries("q58_winsorize")(spark, dir)
    val bounds = ev.groupBy(col("event_type")).agg(
      expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
      expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val rows = out.join(ev, Seq("event_id", "event_type")).collect()
    assert(rows.nonEmpty)
    var clippedN = 0
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("event_type"))
      val v = r.getAs[Double]("value")
      val c = r.getAs[Double]("clipped")
      val was = r.getAs[Boolean]("was_clipped")
      if (was) clippedN += 1
      val expected = math.min(math.max(v, lo), hi)
      assert(math.abs(c - expected) <= 5e-7, s"clip($v) -> $c vs $expected")
      assert(was === (v < lo || v > hi))
    }
    // p05/p95 clipping trims ~10% of each type
    val frac = clippedN.toDouble / rows.length
    assert(frac >= 0.05 && frac <= 0.12, s"clipped fraction $frac")
  }

  test("q60 z-score: per-type standardized mean ~0 and sd ~1") {
    val out = Analytics.queries("q60_zscore")(spark, sf("sf0.001"))
    val stats = out.groupBy(col("event_type"))
      .agg(avg(col("z")).as("m"), stddev_samp(col("z")).as("s")).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-3, r.toString)
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-3, r.toString)
    }
  }

  test("q59 funnel: stage times strictly increase and stages are consistent") {
    val rows = Analytics.queries("q59_funnel")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    // dense synthetic activity converts everyone at small SF — require
    // only that conversions exist and stages are in range
    val stages = rows.map(_.getAs[Int]("stage")).toSet
    assert(stages.contains(3) && stages.subsetOf(Set(0, 1, 2, 3)))
    rows.foreach { r =>
      val tv = Option(r.getAs[Timestamp]("t_view"))
      val tc = Option(r.getAs[Timestamp]("t_click"))
      val tp = Option(r.getAs[Timestamp]("t_purchase"))
      val stage = r.getAs[Int]("stage")
      // strictly-after ordering holds wherever defined
      for (a <- tv; b <- tc) assert(a.before(b))
      for (a <- tc; b <- tp) assert(a.before(b))
      // a later stage implies all earlier ones
      assert(tc.isEmpty || tv.nonEmpty)
      assert(tp.isEmpty || tc.nonEmpty)
      assert(stage === (if (tp.nonEmpty) 3 else if (tc.nonEmpty) 2
        else if (tv.nonEmpty) 1 else 0))
    }
  }

  test("q53 regression recovers a planted exact linear relationship") {
    // y = 3x + 7 exactly -> slope 3, intercept 7, r2 1.
    val li = (1 to 50).map(i => ("A", i.toDouble, 3.0 * i + 7.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("regr").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val row = Analytics.queries("q53_regression")(spark, dir).collect().head
    assert(row.getAs[Double]("slope") === 3.0)
    assert(row.getAs[Double]("intercept") === 7.0)
    assert(row.getAs[Double]("r2") === 1.0)
  }

  test("q67 mode: majority wins, count ties break to the smallest value") {
    val df = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),          // clear majority: b
      (2L, "z"), (2L, "a"),                     // 1-1 tie -> a (smallest)
      (3L, "only")                              // singleton
    ).toDF("k", "v")
    val got = Analytics.modePerKey(df, "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "b", 2L), (2L, "a", 1L), (3L, "only", 1L)))
    // partitioning-invariant: same result from a skewed repartition
    val again = Analytics.modePerKey(df.repartition(7), "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again === got)
  }

  test("q71 interpolate: hourly grid spans first-to-last, gaps fill " +
    "linearly, each hour keeps its LAST event") {
    // user 1: hour 0 has two events (later one wins: v=10, not 99),
    // hour 3 has v=40 -> grid 0..3, hours 1,2 interpolate to 20, 30.
    // user 2: a single observed hour -> one un-interpolated row.
    val ev = Seq(
      (1L, 1L, 99.0, "2024-01-01 00:10:00"),
      (1L, 2L, 10.0, "2024-01-01 00:50:00"),
      (1L, 3L, 40.0, "2024-01-01 03:20:00"),
      (2L, 4L, 7.0, "2024-01-01 05:00:00")
    ).toDF("user_id", "event_id", "value", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("view"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q71").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.queries("q71_interpolate")(spark, dir)
      .orderBy($"user_id", $"hour_bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 1L, 1L, 1L, 2L))
    // the grid is contiguous per user
    val hours = out.filter(_._1 == 1L).map(_._2)
    assert(hours === (hours.head to hours.head + 3))
    assert(out.map(r => (r._3, r._4)) === Seq(
      (10.0, false), (20.0, true), (30.0, true), (40.0, false),
      (7.0, false)))
  }

  test("q72 cohort retention: first-active day cohorts, weekly offsets, " +
    "exact shares") {
    // cohort 01-01 = {1, 2}: both active week 0, only user 1 in week 1
    // (day 8). cohort 01-02 = {3}: week 0 only. Duplicate same-day
    // events must not double-count.
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (1L, 2L, "2024-01-01 11:00:00"),
      (1L, 3L, "2024-01-09 10:00:00"),
      (2L, 4L, "2024-01-01 12:00:00"),
      (3L, 5L, "2024-01-02 12:00:00")
    ).toDF("user_id", "event_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q72").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.queries("q72_cohort_retention")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out === Set(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0)))
  }

  test("q75 interval coalesce: chained overlaps merge transitively, a " +
    "gap opens a new span, customers never mix") {
    // customer 1: orders on day 1 and 3 chain (1+%7 keeps all spans
    // multi-day) into one span, then a far order opens a second.
    // orderkey % 7 + 1 days: key 7 -> 1d span, key 9 -> 3d, key 21 -> 1d.
    val orders = Seq(
      (7L, 1L, "2024-01-01"),  // [01-01, 01-02]
      (9L, 1L, "2024-01-02"),  // [01-02, 01-05] touches -> merges
      (21L, 1L, "2024-02-01"), // far -> new span
      (14L, 2L, "2024-01-01")  // other customer, own span
    ).toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val dir = java.nio.file.Files.createTempDirectory("q75").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.queries("q75_interval_coalesce")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      (1L, "2024-01-01", "2024-01-05", 2L, 4L),
      (1L, "2024-02-01", "2024-02-02", 1L, 1L),
      (2L, "2024-01-01", "2024-01-02", 1L, 1L)))
  }

  test("q76 rolling median: frame widens to 7 rows, even frames " +
    "interpolate, a spike moves the mean but not the median") {
    // one event type, daily counts 10,10,10,10,1000,10,10,10: the
    // 7-row trailing median stays 10 THROUGH the spike; day 2's 2-row
    // frame interpolates (10+10)/2 = 10 anyway, day 5's frame of
    // {10,10,10,10,1000} medians 10.
    val rows = Seq(10, 10, 10, 10, 1000, 10, 10, 10).zipWithIndex.flatMap {
      case (n, i) => (1 to n).map(k =>
        (i.toLong * 1000 + k, f"2024-01-${i + 1}%02d 06:00:${k % 60}%02d"))
    }
    val ev = rows.toDF("event_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", $"event_id" % 7)
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q76").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val med = Analytics.queries("q76_rolling_median")(spark, dir)
      .orderBy($"day").select($"n_events", $"med7")
      .as[(Long, Double)].collect().toSeq
    assert(med.map(_._1) === Seq(10L, 10L, 10L, 10L, 1000L, 10L, 10L, 10L))
    assert(med.map(_._2) === Seq.fill(8)(10.0),
      s"median must ignore the planted spike: $med")
  }

  test("q77 event pattern: trace order is event-time order, the funnel " +
    "regex requires IN-ORDER stages, a lone view is a bounce") {
    // user 1 day 1: V→C→P in order (funnel). user 1 day 2: P→C→V — same
    // multiset, wrong order (no funnel). user 2: single V (bounce).
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (1L, 2L, "click", "2024-01-01 11:00:00"),
      (1L, 3L, "purchase", "2024-01-01 12:00:00"),
      (1L, 4L, "purchase", "2024-01-02 10:00:00"),
      (1L, 5L, "click", "2024-01-02 11:00:00"),
      (1L, 6L, "view", "2024-01-02 12:00:00"),
      (2L, 7L, "view", "2024-01-01 10:00:00")
    ).toDF("user_id", "event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q77").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q77_event_pattern")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getString(3), r.getBoolean(4), r.getBoolean(5)))
      .toSet
    assert(got === Set(
      (1L, "2024-01-01", 3L, "VCP", true, false),
      (1L, "2024-01-02", 3L, "PCV", false, false),
      (2L, "2024-01-01", 1L, "V", false, true)))
  }

  test("q78 markov transitions: per-user sequences, no cross-user edges, " +
    "rows normalize to 1") {
    // user 1: V->C, C->V, V->C (so V->C has n=2); user 2's single V
    // contributes NO transition, and 2's V must not chain onto 1's tail
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (1L, 2L, "click", "2024-01-01 10:01:00"),
      (1L, 3L, "view", "2024-01-01 10:02:00"),
      (1L, 4L, "click", "2024-01-01 10:03:00"),
      (2L, 5L, "view", "2024-01-01 10:04:00")
    ).toDF("user_id", "event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q78").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q78_markov_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got === Set(
      ("view", "click", 2L, 2L, 1.0),
      ("click", "view", 1L, 1L, 1.0)))
    // probability rows per from_type sum to 1 on the real corpus
    val rows = Analytics.queries("q78_markov_transitions")(
        spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getDouble(4)))
    rows.groupBy(_._1).values.foreach { g =>
      val tot = g.map(_._2).sum
      assert(math.abs(tot - 1.0) < 1e-6, s"rows must normalize, got $tot")
    }
  }

  test("q79 ewma: dyadic scaling reproduces the α=1/2 recursion exactly; " +
    "series are per-type; a single-day type is its own baseline") {
    // type A daily counts 4, 8, 2 → ewma 4, 6, 4 (exact halvings):
    //   t1: 4; t2: (8+4)/2 = 6; t3: 2/2 + 6/2 = 4
    val ev = Seq(
      ("click", "2024-01-01", 4), ("click", "2024-01-02", 8),
      ("click", "2024-01-03", 2), ("view", "2024-01-02", 1)
    ).flatMap { case (ty, day, n) =>
      (1 to n).map(i => (ty, day, i))
    }.zipWithIndex.map { case ((ty, day, i), id) =>
      (id.toLong, ty, s"$day 0${i % 10}:0${i / 10}:00")
    }.toDF("event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q79").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q79_ewma")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    // exact == on doubles is deliberate: every value is a dyadic rational
    assert(got === Set(
      ("click", "2024-01-01", 4L, 4.0, 0.0),
      ("click", "2024-01-02", 8L, 6.0, 2.0),
      ("click", "2024-01-03", 2L, 4.0, -2.0),
      ("view", "2024-01-02", 1L, 1.0, 0.0)))
  }

  test("q80 cusum: peak day marks the level shift; single-day series " +
    "peak at zero; exact values") {
    // type A counts 10,10,4,4 → μ=7, cusum 3,6,3,0 → peak day 2
    val ev = Seq(
      ("click", "2024-01-01", 10), ("click", "2024-01-02", 10),
      ("click", "2024-01-03", 4), ("click", "2024-01-04", 4),
      ("view", "2024-01-02", 5)
    ).flatMap { case (ty, day, n) =>
      (1 to n).map(i => (ty, day, i))
    }.zipWithIndex.map { case ((ty, day, i), id) =>
      (id.toLong, ty, s"$day 0${i % 10}:0${i / 10}:00")
    }.toDF("event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q80").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q80_cusum")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSet
    assert(got === Set(
      ("click", "2024-01-01", 10L, 3.0, false),
      ("click", "2024-01-02", 10L, 6.0, true),
      ("click", "2024-01-03", 4L, 3.0, false),
      ("click", "2024-01-04", 4L, 0.0, false),
      ("view", "2024-01-02", 5L, 0.0, true)))
  }

  test("q81 time to convert: per-transition gap statistics over " +
    "qualifying users only; non-converters contribute nothing") {
    // user 1: view +0s, click +10s, purchase +40s; user 2: view +0s,
    // click +50s, never purchases; user 3: click with no prior view
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (1L, 2L, "click", "2024-01-01 10:00:10"),
      (1L, 3L, "purchase", "2024-01-01 10:00:40"),
      (2L, 4L, "view", "2024-01-01 11:00:00"),
      (2L, 5L, "click", "2024-01-01 11:00:50"),
      (3L, 6L, "click", "2024-01-01 12:00:00")
    ).toDF("user_id", "event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q81").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q81_time_to_convert")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    // view_to_click gaps {10, 50}: median 30, p90 = 10 + 0.9*40 = 46
    assert(got === Set(
      ("view_to_click", 2L, 10L, 30.0, 46.0, 30.0),
      ("click_to_purchase", 1L, 30L, 30.0, 30.0, 30.0)))
  }

  test("q82 seasonal dow: z-scores against the type's own weekday " +
    "history; constant and single-day slots yield NULL, never 0-div") {
    // Mondays (dow 2): counts 4,4,4,4,4,14 → c=6, S1=34, S2=276,
    // var = 6·276−34² = 500; z(14) = 50/sqrt(500) = 2.236067977 →
    // anomaly; z(4) = −10/sqrt(500) = −0.447213595 → not.
    // Tuesdays 3,3 → var 0 → NULL; a single Wednesday → var 0 → NULL.
    val days = Seq(
      ("2024-01-01", 4), ("2024-01-08", 4), ("2024-01-15", 4),
      ("2024-01-22", 4), ("2024-01-29", 4), ("2024-02-05", 14),
      ("2024-01-02", 3), ("2024-01-09", 3),
      ("2024-01-03", 5))
    val ev = days.flatMap { case (day, n) =>
      (1 to n).map(i => (day, i))
    }.zipWithIndex.map { case ((day, i), id) =>
      (id.toLong, s"$day 0${i % 10}:0${i / 10}:00")
    }.toDF("event_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("click"))
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q82").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q82_seasonal_dow")(spark, dir)
      .collect().map(r => (r.getDate(1).toString, r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.toString), r.getBoolean(5)))
      .toSet
    assert(got === Set(
      ("2024-01-01", 4L, 2L, Some("-0.447213595"), false),
      ("2024-01-08", 4L, 2L, Some("-0.447213595"), false),
      ("2024-01-15", 4L, 2L, Some("-0.447213595"), false),
      ("2024-01-22", 4L, 2L, Some("-0.447213595"), false),
      ("2024-01-29", 4L, 2L, Some("-0.447213595"), false),
      ("2024-02-05", 14L, 2L, Some("2.236067977"), true),
      ("2024-01-02", 3L, 3L, None, false),
      ("2024-01-09", 3L, 3L, None, false),
      ("2024-01-03", 5L, 4L, None, false)))
  }

  test("q83 overlap join: bucket-ownership emission equals the naive " +
    "predicate join, including multi-bucket and zero-overlap pairs") {
    // All intervals on one day; W = 21600 s (6 h). click is active
    // every 10 min over [0 s, 24000 s] (crosses the bucket-0/1
    // boundary), view over [1800 s, 25200 s] (also crosses): their
    // overlap [1800, 24000] lies in BOTH shared buckets, so a plain
    // bucket equi-join would emit the pair twice — the ownership
    // filter (bucket of greatest start) must emit it once. purchase
    // covers [21600, 25200] (bucket 1 only); error is a single minute
    // at exactly 24000 s, touching all three (overlap 0 = same-minute
    // co-activity, counted by contract).
    def minutes(ty: String, fromS: Long, toS: Long, stepS: Long) =
      (fromS to toS by stepS).map(sec => (ty, sec))
    val ev = (minutes("click", 0L, 24000L, 600L) ++
      minutes("view", 1800L, 25200L, 600L) ++
      minutes("purchase", 21600L, 25200L, 600L) ++
      minutes("error", 24000L, 24000L, 600L))
      .zipWithIndex.map { case ((ty, sec), id) => (id.toLong, ty, sec) }
      .toDF("event_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + $"sec"))
      .drop("sec")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q83").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // premise: the double-emission hazard is real — both click and view
    // span two buckets
    assert(24000L / 21600L > 0L && 25200L / 21600L > 0L)
    val got = Analytics.queries("q83_overlap_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // expected = the naive predicate join, derived by hand
    assert(got === Set(
      ("click", "view", 1L, 22200L, 22200L),
      ("click", "purchase", 1L, 2400L, 2400L),
      ("purchase", "view", 1L, 3600L, 3600L),
      ("click", "error", 1L, 0L, 0L),
      ("error", "purchase", 1L, 0L, 0L),
      ("error", "view", 1L, 0L, 0L)))
  }

  test("q84 rfm: quintile scores over planted metrics; recency " +
    "inverted; as-of is the corpus max date, never a clock") {
    // customer i: i orders of 1000.00 all on 2024-01-0i → recency 5−i,
    // frequency i, monetary i·1000; quintile thresholds over
    // {0..4}/{1..5} are 0.8/1.6/2.4/3.2 etc → every score = i,
    // rfm_code = 111·i
    val orders = (1 to 5).flatMap { i =>
      (1 to i).map(k =>
        (i * 10L + k, i.toLong, 1000.0, s"2024-01-0$i 00:00:00"))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "t")
      .withColumn("o_orderdate", to_timestamp($"t")).drop("t")
    val dir = java.nio.file.Files.createTempDirectory("q84").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.queries("q84_rfm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSet
    assert(got === (1 to 5).map { i =>
      (i.toLong, (5 - i).toLong, i.toLong, i * 1000.0,
        i.toLong, i.toLong, i.toLong, 111L * i)
    }.toSet)
  }

  test("q85 gini: uniform activity scores 0, a planted 1-vs-3 split " +
    "scores exactly 0.25; rank ties cannot move the statistic") {
    // type eq: 4 users × 1 event (all ranks tied — any permutation of
    // equal x leaves Σ i·x unchanged) → G = 0, max_user_frac = 0.25.
    // type sk: counts [1, 3] ascending → W = 1·1 + 2·3 = 7, n = 2,
    // S = 4 → G = (2·7 − 3·4)/(2·4) = 0.25; max_user_frac = 0.75.
    val rows = (1 to 4).map(u => ("eq", u.toLong, 1)) ++
      Seq(("sk", 1L, 1), ("sk", 2L, 3))
    val ev = rows.flatMap { case (t, u, n) => (1 to n).map(_ => (t, u)) }
      .zipWithIndex.map { case ((t, u), id) => (id.toLong, t, u) }
      .toDF("event_id", "event_type", "user_id")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q85").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q85_gini")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === Set(
      ("eq", 4L, 4L, 0.0, 0.25),
      ("sk", 2L, 4L, 0.25, 0.75)))
  }

  test("q86 benford: digits come from integer cents, zero-count digits " +
    "contribute n·p, chi2 is the decimal sum of 9-dp contributions, " +
    "zero values are excluded") {
    // type t: 1.00 ×3 (digit 1), 2.00 ×1 (digit 2), 0.0 ×1 (dropped:
    // cents = 0) → n_tot = 4; digits 3..9 appear with n_obs = 0 and a
    // contribution of exactly n·p
    val vals = Seq(1.0, 1.0, 1.0, 2.0, 0.0)
    val ev = vals.zipWithIndex.map { case (v, id) => (id.toLong, v) }
      .toDF("event_id", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("event_type", lit("t"))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q86").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q86_benford")(spark, dir).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet === (1 to 9).toSet)
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 4.0
    val refContrib = Analytics.benfordP.map { case (dd, p) =>
      val o = if (dd == 1) 3.0 else if (dd == 2) 1.0 else 0.0
      dd -> r9((o - n * p) * (o - n * p) / (n * p))
    }.toMap
    val refChi2 = refContrib.values
      .map(BigDecimal(_)).sum.toDouble
    for (dd <- 1 to 9) {
      val (nObs, obsFrac, contrib, chi2) = got(dd)
      assert(nObs === (if (dd == 1) 3L else if (dd == 2) 1L else 0L))
      assert(obsFrac === (if (dd == 1) 0.75 else if (dd == 2) 0.25
        else 0.0))
      assert(math.abs(contrib - refContrib(dd)) < 1e-12,
        s"digit $dd contrib")
      assert(math.abs(chi2 - refChi2) < 1e-9, s"digit $dd chi2")
    }
  }

  test("q87 stickiness: DAU averages over active days only, MAU dedups " +
    "across the month, repeat events never inflate either") {
    // Jan 't': day 1 users {1,2} (user 1 twice — dedup), day 2 user {1}
    // → n_days 2, Σdaily 3, mau 2, avg_dau 1.5, stickiness 0.75.
    // Feb 't': one day, one user → stickiness 1.0.
    val rows = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 1L),
      ("2024-02-10", 7L))
    val ev = rows.zipWithIndex.map { case ((day, u), id) =>
      (id.toLong, s"$day 09:00:00", u)
    }.toDF("event_id", "t", "user_id")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q87").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q87_stickiness")(spark, dir)
      .collect().map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L, 3L, 1.5, 0.75)),
      "2024-02-01" -> ((1L, 1L, 1L, 1.0, 1.0))))
  }

  test("q88 rolling corr: proportional series score 1, reversed score -1, " +
    "constants NULL; missing days are REAL zeros in the dense grid") {
    // 8 days; type a = 1..8, b = 2·a (corr 1), c = 9−a (corr −1),
    // d constant 3 (NULL), e active only on days 1 and 8 (the dense
    // grid zero-fills the gap, so every pair still has 2 full windows)
    val days = (1 to 8).map(i => f"2024-01-0$i")
    val ev = days.zipWithIndex.flatMap { case (day, idx) =>
      val i = idx + 1
      Seq("a" -> i, "b" -> (2 * i), "c" -> (9 - i), "d" -> 3,
        "e" -> (if (i == 1 || i == 8) 2 else 0)).flatMap {
        case (t, n) => (1 to n).map(k => (t, day, k))
      }
    }.zipWithIndex.map { case ((t, day, _), id) =>
      (id.toLong, t, s"$day 12:00:00")
    }.toDF("event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q88").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q88_rolling_corr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDate(2).toString) -> Option(r.get(3)).map(_.toString)).toMap
    // 10 type pairs × 2 full windows (days 7 and 8)
    assert(got.size === 20)
    for (day <- Seq("2024-01-07", "2024-01-08")) {
      assert(got(("a", "b", day)) === Some("1.0"))
      assert(got(("a", "c", day)) === Some("-1.0"))
      assert(got(("a", "d", day)) === None)
      assert(got(("b", "c", day)) === Some("-1.0"))
      // e exists in the grid even on its silent days
      assert(got.contains(("a", "e", day)))
    }
  }

  test("q89 pareto: one whale reaches 80% alone; a uniform split needs " +
    "4 of 5 users; the boundary is the exact integer cross-multiply") {
    // type wh: user 1 has 8 events, users 2..3 one each → total 10,
    // cum(1) = 8, 5·8 = 40 ≥ 4·10 = 40 → rank80 = 1, frac 1/3.
    // type un: 5 users × 2 events → cum hits 8 of 10 at rank 4 → 0.8.
    val rows = Seq(("wh", 1L, 8), ("wh", 2L, 1), ("wh", 3L, 1)) ++
      (1 to 5).map(u => ("un", u.toLong, 2))
    val ev = rows.flatMap { case (t, u, n) => (1 to n).map(_ => (t, u)) }
      .zipWithIndex.map { case ((t, u), id) => (id.toLong, t, u) }
      .toDF("event_id", "event_type", "user_id")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q89").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q89_pareto")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "wh" -> ((3L, 10L, 1L, 0.333333333)),
      "un" -> ((5L, 10L, 4L, 0.8))))
  }

  test("q91 event trigrams: sequences never cross users, occurrences " +
    "overlap within a stream, user counts dedup") {
    // user 1: v c p v c p → trigrams v>c>p, c>p>v, p>v>c, v>c>p
    // user 2: v c p → one v>c>p. No cross-user trigram can appear.
    val rows = Seq(
      (1L, Seq("view", "click", "purchase", "view", "click", "purchase")),
      (2L, Seq("view", "click", "purchase")))
    val ev = rows.flatMap { case (u, ts) => ts.zipWithIndex.map {
      case (t, i) => (u, t, i) } }
      .zipWithIndex.map { case ((u, t, i), id) =>
        (id.toLong, u, t, f"2024-01-01 00:${i}%02d:00")
      }.toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q91").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q91_event_trigrams")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "view>click>purchase" -> ((3L, 2L)),
      "click>purchase>view" -> ((1L, 1L)),
      "purchase>view>click" -> ((1L, 1L))))
  }

  test("q92 inter-event time: gaps stay within (type, user), first " +
    "events contribute none, quantiles integer-exact") {
    // type t, user 1 at 0s/10s/30s → gaps 10, 20; user 2 at 5s only →
    // no gap. median of {10,20} = 15.0, mean 15.0, p90 = 19.0.
    val rows = Seq((1L, 0), (1L, 10), (1L, 30), (2L, 5))
    val ev = rows.zipWithIndex.map { case ((u, sec), id) =>
      (id.toLong, u, f"2024-01-01 00:00:${sec}%02d")
    }.toDF("event_id", "user_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q92").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q92_inter_event_time")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === Seq((2L, 10L, 15.0, 19.0, 20L, 15.0)))
  }

  test("q95 mad: one wild day cannot hide itself (median/MAD ignore " +
    "it where a z-score wouldn't); a spread series flags nothing; " +
    "MAD 0 degrades to any-deviation-flags") {
    // type sp: daily counts [1,2,3,4,5] → median 3, MAD 1, no |dev|>5.
    // type wd: [10,10,10,10,100] → median 10, MAD 0 → the wild day
    // flags (a mean/stddev screen would have absorbed it).
    val days = (1 to 5).map(i => f"2024-01-0$i")
    val counts = Map("sp" -> Seq(1, 2, 3, 4, 5),
      "wd" -> Seq(10, 10, 10, 10, 100))
    val ev = counts.toSeq.flatMap { case (t, cs) =>
      cs.zip(days).flatMap { case (n, day) =>
        (1 to n).map(k => (t, day, k)) }
    }.zipWithIndex.map { case ((t, day, _), id) =>
      (id.toLong, t, s"$day 09:00:00")
    }.toDF("event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q95").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q95_mad")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got === Map(
      "sp" -> ((5L, 3.0, 1.0, 0L)),
      "wd" -> ((5L, 10.0, 0.0, 1L))))
  }

  test("q94 autocorr: a period-7 series scores ACF(7) = 1 exactly, its " +
    "ACF(1) matches the exact co-moment reference, constants are NULL") {
    // type per: [5,1,1,1,1,1,1] × 4 weeks; type cst: 2 every day
    val pattern = Seq(5, 1, 1, 1, 1, 1, 1)
    val perDay = (0 until 28).map(i => pattern(i % 7))
    val rows = (0 until 28).flatMap { i =>
      (1 to perDay(i)).map(_ => ("per", i)) ++
        (1 to 2).map(_ => ("cst", i))
    }
    val ev = rows.zipWithIndex.map { case ((t, i), id) =>
      (id.toLong, t, f"2024-01-${i + 1}%02d 12:00:00")
    }.toDF("event_id", "event_type", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("user_id", lit(1L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q94").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // exact co-moment reference for ("per", lag 1)
    def acfRef(xs: Seq[Int], k: Int): Double = {
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      val n = pairs.size.toLong
      val sx = pairs.map(_._1.toLong).sum; val sy = pairs.map(_._2.toLong).sum
      val sxy = pairs.map(p => p._1.toLong * p._2).sum
      val sxx = pairs.map(p => p._1.toLong * p._1).sum
      val syy = pairs.map(p => p._2.toLong * p._2).sum
      val num = n * sxy - sx * sy
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      BigDecimal(num.toDouble / (math.sqrt(vx.toDouble) *
        math.sqrt(vy.toDouble)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Analytics.queries("q94_autocorr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.toString)))).toMap
    assert(got(("per", 7L)) === ((21L, Some("1.0"))))
    assert(got(("per", 1L)) ===
      ((27L, Some(acfRef(perDay, 1).toString))))
    assert(got(("cst", 1L))._2 === None)
    assert(got(("cst", 7L))._2 === None)
  }

  test("q90 user lifetime: cohort is the FIRST-activity month, span is " +
    "inclusive, repeat same-day events never inflate active days") {
    // cohort Jan: user 1 active 01-05 and 01-07 (inclusive span 3,
    //             active 2), user 2 active 01-20 twice (span 1,
    //             active 1 — a one-day wonder whose repeats dedup)
    //             → avg span (3+1)/2 = 2.0, median of {1,3} = 2.0
    // cohort Feb: user 3 active 02-01..02-03 daily (span 3, active 3)
    val rows = Seq(
      (1L, "2024-01-05"), (1L, "2024-01-07"),
      (2L, "2024-01-20"), (2L, "2024-01-20"),
      (3L, "2024-02-01"), (3L, "2024-02-02"), (3L, "2024-02-03"))
    val ev = rows.zipWithIndex.map { case ((u, day), id) =>
      (id.toLong, u, s"$day 08:00:00")
    }.toDF("event_id", "user_id", "t")
      .withColumn("ts", to_timestamp($"t")).drop("t")
      .withColumn("event_type", lit("t"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("q90").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.queries("q90_user_lifetime")(spark, dir)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 1.5, 2.0, 2.0, 0.5)),
      "2024-02-01" -> ((1L, 3.0, 3.0, 3.0, 0.0))))
  }
}
