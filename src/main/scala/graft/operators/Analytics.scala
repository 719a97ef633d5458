package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Analytic surface round-out beyond [[Extended]]: the SQL:2003 linear
  * regression aggregate family, ordered-set quantile aggregates
  * (PERCENTILE_CONT / PERCENTILE_DISC / MEDIAN), gaps-and-islands
  * interval merging, and the array higher-order-function surface.
  *
  * Determinism conventions follow [[Extended]]: moment-style statistics
  * are rounded (parallel float accumulation differs in low-order bits
  * across partitionings and engines), orderings always carry a unique
  * tiebreak key, and array results are surfaced as csv strings because
  * the driver's row-checker cannot sort raw array columns (q33/m03
  * precedent).
  */
object Analytics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQL:2003 regression aggregates: OLS fit of extended price on
    // quantity per return flag. Single partial-aggregable pass (the
    // regr_* family reduces to co-moment sums) — map-side combine, one
    // 3-row exchange; identical shape at any scale.
    "q53_regression" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6)
            .as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6)
            .as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          round(expr("regr_avgx(l_extendedprice, l_quantity)"), 6)
            .as("avg_x"),
          round(expr("regr_avgy(l_extendedprice, l_quantity)"), 6)
            .as("avg_y"))
    },

    // Ordered-set aggregates: exact interpolated and discrete quantiles.
    // l_quantity holds integral doubles, so the 0.25/0.5/0.75
    // interpolation fractions are exactly representable and the results
    // are bit-identical across engines — no rounding needed, kept
    // anyway for uniformity with q29/q30.
    "q54_ordered_set_agg" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(expr("median(l_quantity)"), 6).as("med_qty"),
          round(expr(
            "percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)"), 6)
            .as("q25_cont"),
          round(expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)"), 6)
            .as("q75_disc"))
    },

    // Gaps-and-islands: merge each customer's order dates into maximal
    // streaks where consecutive orders are <= 30 days apart. The windows
    // partition by o_custkey (high cardinality — bounded per-customer
    // partitions at any scale, unlike a bare low-cardinality stratum;
    // see the q41 rework), and the island id is a running sum of
    // gap-break flags, so one sort per customer produces the merge.
    "q55_order_islands" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          to_date($"o_orderdate").as("o_date"), $"o_orderdate")
        .withColumn("gap_break",
          when(datediff($"o_date",
            lag($"o_date", 1).over(w)) > 30 ||
            lag($"o_date", 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("island",
          sum($"gap_break")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"o_custkey", $"island")
        .agg(
          min($"o_date").as("start_date"),
          max($"o_date").as("end_date"),
          count(lit(1)).as("n_orders"))
    },

    // Last-observation-carried-forward gap fill: error events mask their
    // reading to NULL, and each user's stream fills forward from the
    // last good value — the time-series repair every sensor/metrics
    // pipeline runs. One window per user (high-cardinality partition),
    // unique (ts, event_id) ordering; leading NULLs (a user whose first
    // events all errored) stay NULL by contract. Values pass through
    // untouched (no float arithmetic), so no rounding is needed.
    "q57_locf" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("v_masked",
          when($"event_type" === "error", lit(null).cast("double"))
            .otherwise($"value"))
        .withColumn("v_filled", last($"v_masked", ignoreNulls = true).over(w))
        .select($"user_id", $"event_id",
          ($"event_type" === "error").as("is_masked"), $"v_filled")
    },

    // Per-group z-score standardization: the feature-normalization pass
    // before any distance/gradient work. Stats are ROUNDED to 6dp
    // before use (q30 proves rounded-stat parity across engines), so
    // the per-row z is a deterministic function of identical inputs on
    // both sides. Broadcast stats, map-only stream — the q58 shape.
    "q60_zscore" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val stats = ev.groupBy($"event_type").agg(
        round(avg($"value"), 6).as("__mu"),
        round(stddev_samp($"value"), 6).as("__sd"))
      // Zero-sd guard: a constant group (or one whose stddev rounds to 0
      // at 6dp) gets z = NULL on both engines — double-by-zero division
      // semantics (Inf/NaN) are NOT pinned across Spark and DuckDB.
      ev.join(broadcast(stats), "event_type")
        .select($"event_type", $"event_id",
          round(($"value" - $"__mu") /
            when($"__sd" =!= 0d, $"__sd"), 6).as("z"))
    },

    // Funnel analysis: the classic staged-conversion query — per user,
    // the first 'view', the first 'click' STRICTLY AFTER it, the first
    // 'purchase' strictly after that. Three aggregates + joins all keyed
    // on high-cardinality user_id: the event stream shuffles on one key
    // throughout and the per-stage relations shrink monotonically —
    // no window over the raw stream, no per-user sort. EVERY join is
    // hinted shuffle_hash with the per-user aggregate as build side
    // (the aggregates are ≤1 row per user and already partitioned by
    // user_id, so per-partition hash builds stay bounded at any SF and
    // no join pays a sort); AQE may still upgrade a small build side to
    // broadcast. PlanShapeSpec gates the resulting zero-SMJ shape —
    // round 4 shipped the hints only on the two inner joins and the
    // final left joins silently sort-merged.
    "q59_funnel" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      val t1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val t2 = ev.join(t1.hint("shuffle_hash"), "user_id")
        .filter($"event_type" === "click" && $"ts" > $"t_view")
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val t3 = ev.join(t2.hint("shuffle_hash"), "user_id")
        .filter($"event_type" === "purchase" && $"ts" > $"t_click")
        .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
      ev.select($"user_id").distinct()
        .join(t1.hint("shuffle_hash"), Seq("user_id"), "left")
        .join(t2.hint("shuffle_hash"), Seq("user_id"), "left")
        .join(t3.hint("shuffle_hash"), Seq("user_id"), "left")
        .select($"user_id", $"t_view", $"t_click", $"t_purchase",
          when($"t_purchase".isNotNull, 3)
            .when($"t_click".isNotNull, 2)
            .when($"t_view".isNotNull, 1)
            .otherwise(0).as("stage"))
    },

    // Winsorization: clip each event's value to its type's exact
    // [p05, p95] — the outlier treatment before any mean-based feature
    // or loss. Exact per-group percentiles (group count is bounded, so
    // the sort-based aggregate is too), broadcast back: two passes and
    // the corpus streams map-only through the clipping join — never a
    // per-row percentile window. Comparisons against the interpolated
    // bounds are engine-stable: an observed value can only EQUAL a
    // bound when the bound is that observed value (no interpolation).
    "q58_winsorize" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val bounds = ev.groupBy($"event_type").agg(
        expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY value)")
          .as("__lo"),
        expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)")
          .as("__hi"))
      ev.join(broadcast(bounds), "event_type")
        .select($"event_type", $"event_id",
          round(least(greatest($"value", $"__lo"), $"__hi"), 6).as("clipped"),
          ($"value" < $"__lo" || $"value" > $"__hi").as("was_clipped"))
    },

    // Array higher-order surface: split/distinct/sort/slice/reverse over
    // token arrays, surfaced as csv strings (driver row-checker cannot
    // sort array columns — m03 precedent). All codegen'd collection
    // expressions; per-row work, no shuffle beyond the scan.
    "q56_array_funcs" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", split($"text", " ").as("toks"))
        .select(
          $"doc_id",
          size($"toks").as("n_tokens"),
          size(array_distinct($"toks")).as("n_distinct"),
          concat_ws(",", slice(sort_array(array_distinct($"toks")), 1, 5))
            .as("first5_asc"),
          concat_ws(",", slice(reverse(sort_array($"toks")), 1, 3))
            .as("top3_desc"))
    },

    // Modal value per group (most frequent event_type per user, ties to
    // the smallest type) WITHOUT a window: counts partial-aggregate,
    // then ONE more partial-aggregating groupBy picks the mode as a
    // lexicographic struct-min over (-n, event_type) — ≤ |type| pairs
    // per user per map task. The rank-window formulation would shuffle
    // and sort every (user, type) row; this never materializes a rank.
    // user_id is high-cardinality, so both aggregations hash-partition
    // cleanly at any corpus size.
    "q67_mode_per_key" -> { (s, d) =>
      import s.implicits._
      modePerKey(Tables.events(s, d), "user_id", "event_type")
        .toDF("user_id", "mode_event_type", "n_events")
    },

    // Exact trailing-7-day distinct active users per day. COUNT(DISTINCT)
    // has no subtractable sliding-window form, and the naive shape — a
    // range join of the raw event stream against the day spine — scans
    // the corpus once per window day. This dedupes FIRST to (day, user)
    // (one corpus-scale shuffle, the relation is then bounded by
    // days × users), replicates each deduped row to the ≤ 7 target days
    // it contributes to (map-side explode — replicate-then-aggregate,
    // the standard exact form), and partial-aggregates the distinct
    // count per day. The day spine rides as a broadcast semi-join so
    // trailing days beyond the stream's last day never materialize.
    "q69_rolling_distinct" -> { (s, d) =>
      import s.implicits._
      val du = Tables.events(s, d)
        .select(to_date($"ts").as("day"), $"user_id").distinct()
      val days = du.select($"day").distinct()
      du.select($"user_id",
          explode(sequence(lit(0), lit(6))).as("__off"), $"day")
        .withColumn("day7", date_add($"day", $"__off"))
        .join(broadcast(days.withColumnRenamed("day", "day7")),
          Seq("day7"), "left_semi")
        .groupBy($"day7")
        .agg(countDistinct($"user_id").as("users_7d"))
        .select($"day7".as("day"), $"users_7d")
    },

    // Incremental aggregate maintenance: per-user stats computed as
    // BASE (events before the cutoff — in production, a stored
    // aggregate snapshot) merged with DELTA (the new batch), by
    // re-aggregating the mergeable state (count, decimal sum), with the
    // non-mergeable avg derived AFTER the merge. The oracle is the full
    // single-scan recompute, so a green row proves base+delta merge ≡
    // recompute exactly. At 100 TB this is THE corpus-stats shape:
    // the daily job aggregates only the delta (O(batch)) and merges
    // with |keys| stored rows — the corpus is never rescanned; shuffle
    // volume is O(delta + keys) forever.
    "q70_incremental_agg" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", $"ts", $"value")
      val cutoff = lit("2024-01-21").cast("timestamp")
      def partial(df: DataFrame): DataFrame =
        df.groupBy($"user_id")
          .agg(count(lit(1)).as("__n"),
            sum($"value".cast("decimal(18,2)")).as("__sv"))
      // null-ts rows route to the base deterministically — a bare
      // `ts < cutoff` / `ts >= cutoff` pair silently DROPS them from
      // both sides while the full recompute (the oracle, and the
      // production semantics) counts them
      val base = partial(ev.filter($"ts" < cutoff || $"ts".isNull))
      val delta = partial(ev.filter($"ts" >= cutoff))
      base.unionByName(delta)
        .groupBy($"user_id")
        .agg(sum($"__n").as("n_events"), sum($"__sv").as("__svm"))
        .select($"user_id", $"n_events",
          $"__svm".cast("double").as("sum_value"),
          round($"__svm".cast("double") / $"n_events", 6).as("avg_value"))
    },

    // Time-series resampling with LINEAR interpolation — q57's LOCF
    // upgraded to the other classic gap repair: per user, an hourly grid
    // spans first-to-last observation, each grid hour carries the last
    // event of that hour (unique (ts, event_id) selection — no float
    // arithmetic on observed values), and empty hours interpolate
    // linearly between the bracketing observations. Hours are epoch-hour
    // longs (the `$"ts".cast("long")` ↔ `epoch(ts)` convention), the
    // grid is sequence+explode (NEVER a driver loop), and the fill is
    // two frames of one per-user window over the grid. The interpolation
    // expression is the same IEEE tree on both engines, rounded to 9 dp.
    // Scale: the grid is users × a wall-clock-bounded span (720 h here)
    // — row count grows linearly with users, never quadratically; the
    // windows sort bounded per-user grids, not the raw event stream.
    "q71_interpolate" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", expr("cast(ts as long) div 3600").as("h"),
          $"ts", $"event_id", $"value")
      val pick = Window.partitionBy($"user_id", $"h")
        .orderBy($"ts".desc, $"event_id".desc)
      val known = ev.withColumn("__rn", row_number().over(pick))
        .filter($"__rn" === 1)
        .select($"user_id", $"h", $"value".as("v"))
      val grid = known.groupBy($"user_id")
        .agg(min($"h").as("__h0"), max($"h").as("__h1"))
        .select($"user_id", explode(sequence($"__h0", $"__h1")).as("h"))
      val asc = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val desc = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(known.hint("shuffle_hash"), Seq("user_id", "h"), "left")
        .select($"user_id", $"h", $"v",
          last($"v", ignoreNulls = true).over(asc).as("__pv"),
          last(when($"v".isNotNull, $"h"), ignoreNulls = true).over(asc)
            .as("__ph"),
          first($"v", ignoreNulls = true).over(desc).as("__nv"),
          first(when($"v".isNotNull, $"h"), ignoreNulls = true).over(desc)
            .as("__nh"))
        .select($"user_id", $"h".as("hour_bucket"),
          when($"v".isNotNull, $"v")
            .otherwise(round($"__pv" + ($"__nv" - $"__pv") *
              (($"h" - $"__ph") / ($"__nh" - $"__ph")), 9)).as("value"),
          $"v".isNull.as("interpolated"))
    },

    // Cohort retention: users cohorted by first-active day; per cohort
    // and week offset, the share of the cohort active that week — the
    // standard product-analytics retention matrix, and (for a corpus)
    // the "contributor stickiness" profile. Shape: one distinct
    // (user, day) pass, a per-user min, one shuffle-hash join back on
    // user_id, a distinct + count per (cohort, offset), and the ≤31-row
    // cohort-size table broadcast into the final projection. Counts are
    // exact longs; retention is one 9 dp-rounded division. The matrix
    // size is cohort-days × offsets — bounded by the calendar, not the
    // data, at any SF.
    "q72_cohort_retention" -> { (s, d) =>
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val firsts = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      val sizes = firsts.groupBy($"cohort_day")
        .agg(count(lit(1)).as("cohort_size"))
      days.join(firsts.hint("shuffle_hash"), Seq("user_id"))
        .select($"cohort_day",
          expr("datediff(day, cohort_day) div 7").cast("long")
            .as("offset_week"),
          $"user_id")
        .distinct()
        .groupBy($"cohort_day", $"offset_week")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), Seq("cohort_day"))
        .select($"cohort_day", $"offset_week", $"n_active", $"cohort_size",
          round($"n_active" / $"cohort_size", 9).as("retention"))
    },

    // Interval coalescing — the OTHER gaps-and-islands (q55 merges
    // points by gap; this merges SPANS by overlap): each order opens a
    // service window [orderdate, orderdate + 1..7 days], and per
    // customer, transitively overlapping windows collapse to one
    // coverage span. The classic plan: running max(end) over everything
    // STRICTLY BEFORE the current row (a span starting past that max
    // opens a new island), then a running sum of the new-island flags
    // numbers the islands, then one group-by. Two frames of one per-key
    // window + a keyed aggregation — no self-join, no recursion; the
    // (start, orderkey) order key is unique so both engines walk
    // identical frames. All dates and counts are exact.
    "q75_interval_coalesce" -> { (s, d) =>
      import s.implicits._
      val iv = Tables.orders(s, d).select($"o_custkey",
        $"o_orderdate".cast("date").as("start_d"),
        date_add($"o_orderdate".cast("date"),
          ($"o_orderkey" % 7 + 1).cast("int")).as("end_d"),
        $"o_orderkey")
      val before = Window.partitionBy($"o_custkey")
        .orderBy($"start_d", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
      val upto = Window.partitionBy($"o_custkey")
        .orderBy($"start_d", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("__maxe", max($"end_d").over(before))
        .withColumn("__new",
          ($"__maxe".isNull || $"start_d" > $"__maxe").cast("int"))
        .withColumn("__island", sum($"__new").over(upto))
        .groupBy($"o_custkey", $"__island")
        .agg(min($"start_d").as("span_start"), max($"end_d").as("span_end"),
          count(lit(1)).as("n_orders"))
        .select($"o_custkey".as("c_custkey"), $"span_start", $"span_end",
          $"n_orders",
          datediff($"span_end", $"span_start").cast("long").as("span_days"))
    },

    // Rolling 7-row median of each event type's daily volume — the
    // robust trend line an o05-style monitor baselines against (median
    // shrugs off the single hot day that drags a rolling mean). The
    // window aggregates a ≤7-row frame over the ≤31-row daily series
    // per type, so the sort and the exact interpolated percentile both
    // work on calendar-bounded inputs at any SF; daily counts are exact
    // longs, and percentile(x, 0.5) ↔ quantile_cont(x, 0.5) over
    // integer inputs is engine-parity (the q29 precedent, unrounded).
    "q76_rolling_median" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
        .selectExpr("event_type", "day", "n_events",
          """percentile(n_events, 0.5) OVER (PARTITION BY event_type
            |ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            |AS med7""".stripMargin.replace('\n', ' '))
    },

    // Behavioral pattern mining: each user-day compressed to an ordered
    // event-initial string (V/C/P/S/E — the five types have distinct
    // initials), then regex-classified — did the day contain the full
    // view→click→purchase funnel IN ORDER (q59 asks this with three
    // joins; the trace form answers any such pattern with one regex),
    // and was it a single-view bounce. The t31 determinism recipe:
    // collect (ts, event_id, init) structs, array_sort (unique struct
    // order), project, join — one keyed aggregation, trace length
    // bounded by a user-DAY's activity at any SF. Oracled against
    // DuckDB's ORDER BY string_agg + regexp_matches.
    "q77_event_pattern" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id",
          upper(substring($"event_type", 1, 1)).as("init"))
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_events"),
          array_join(
            transform(
              array_sort(collect_list(struct($"ts", $"event_id", $"init"))),
              x => x.getField("init")),
            "").as("pattern"))
        .select($"user_id", $"day", $"n_events", $"pattern",
          $"pattern".rlike("V.*C.*P").as("has_funnel"),
          ($"pattern" === "V").as("is_bounce"))
    },

    // q78: first-order Markov transition matrix over each user's event
    // sequence — the behavior-model / synthetic-session-generator
    // primitive (q77 classifies whole traces; this gives the generative
    // step model). One keyed lag window (shuffles by user — the same
    // partitioning every sequence op here reuses), one grouped count,
    // row-count totals joined back broadcast (|types|² rows at most);
    // the probability is a single division rounded 9 dp (IEEE tree).
    "q78_markov_transitions" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val seq = Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNotNull)
      val counts = seq
        .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy($"from_type")
        .agg(sum($"n").as("n_from"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select($"from_type", $"to_type", $"n", $"n_from",
          round($"n".cast("double") / $"n_from".cast("double"), 9).as("p"))
    },

    // q79: EWMA (α = 1/2) of each event type's daily volume, EXACT —
    // the smoothed baseline behind spike alerts (q76's rolling median is
    // robust but laggy; EWMA reacts geometrically). The float recursion
    // ewma_t = α·x_t + (1−α)·ewma_{t−1} is order-sensitive and never
    // bit-stable across engines, so it is rescaled into integers:
    // with α = 1/2, 2^(t−1)·ewma_t = x_1 + Σ_{j=2..t} x_j·2^(j−2) — a
    // RUNNING SUM of per-row dyadic terms. Terms sum in DECIMAL(38,0)
    // (order-free, exact; a 30-day span times 10^15-row days still fits
    // 38 digits), and the final scale-back multiplies by 2^-(t−1) —
    // a pure exponent shift, exact in IEEE — so the ewma column is
    // bit-identical cross-engine with NO rounding anywhere. The daily
    // aggregation is the only corpus-scale stage; the window runs over
    // calendar-bounded per-type series (≤ span rows per type at any SF).
    "q79_ewma" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val daily = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
      daily
        .withColumn("t", row_number().over(w))
        .withColumn("term",
          expr("shiftleft(n_events, cast(greatest(t - 2, 0) as int))")
            .cast("decimal(38,0)"))
        .withColumn("scaled", sum($"term").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"event_type", $"day", $"n_events",
          ($"scaled".cast("double") * pow(lit(2.0), -($"t" - 1)))
            .as("ewma"))
        .withColumn("dev", $"n_events" - $"ewma")
    },

    // q80: CUSUM changepoint scan per event type — cumulative sum of
    // deviations from the type's own mean daily volume; the day where
    // |CUSUM| peaks is the level-shift estimate (Page's classic test;
    // o05 flags single outlier days, THIS finds sustained regime
    // changes a per-day z-score never sees). Exact: the running count
    // sum and day index are integers, the mean is one division of exact
    // integers, and S_t = run_sum_t − t·μ is a two-op IEEE tree
    // evaluated in the same order by both engines — bit-equal with no
    // rounding. Peak flag compares those identical doubles against the
    // type's window max. Same scale shape as q79: one corpus-scale
    // daily aggregation, then calendar-bounded windows.
    "q80_cusum" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val wAll = Window.partitionBy($"event_type")
      val daily = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
      daily
        .withColumn("t", row_number().over(w))
        .withColumn("run_sum", sum($"n_events").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("mu",
          sum($"n_events").over(wAll).cast("double") /
            count(lit(1)).over(wAll).cast("double"))
        .withColumn("cusum",
          $"run_sum".cast("double") - $"t".cast("double") * $"mu")
        .withColumn("is_peak",
          abs($"cusum") === max(abs($"cusum")).over(wAll))
        .select($"event_type", $"day", $"n_events", $"cusum", $"is_peak")
    },

    // q81: funnel TIMING — q59 counts who converts, this measures how
    // fast: per stage transition (first view→first qualifying click,
    // that click→first qualifying purchase), the population min /
    // median / p90 / mean of the gap in whole seconds. Reuses q59's
    // per-user stage times verbatim (one keyed-shuffle pipeline, ≤1 row
    // per user), then aggregates two bounded transition groups —
    // the reporting step costs one 2-group sort-aggregate over ≤2 rows
    // per converting user at any SF. Gaps are floored epoch-second
    // differences (exact integers; the q71 convention), quantiles ride
    // the q29/q76 percentile↔quantile_cont integer parity, the mean is
    // one exact-integer division: every statistic is engine-exact,
    // unrounded.
    "q81_time_to_convert" -> { (s, d) =>
      import s.implicits._
      val f = queries("q59_funnel")(s, d)
        .select($"user_id", $"t_view", $"t_click", $"t_purchase")
      val gaps = f.select(lit("view_to_click").as("transition"),
          (expr("cast(t_click as long)") - expr("cast(t_view as long)"))
            .as("gap_s"))
        .unionByName(f.select(lit("click_to_purchase").as("transition"),
          (expr("cast(t_purchase as long)") -
            expr("cast(t_click as long)")).as("gap_s")))
        .filter($"gap_s".isNotNull)
      gaps.groupBy($"transition").agg(
        count(lit(1)).as("n_users"),
        min($"gap_s").as("min_s"),
        expr("percentile(gap_s, 0.5)").as("median_s"),
        expr("percentile(gap_s, 0.9)").as("p90_s"),
        (sum($"gap_s").cast("double") / count(lit(1)).cast("double"))
          .as("mean_s"))
    },

    // q82: day-of-week seasonal anomaly baseline — each (type, day)
    // count z-scored against that TYPE's OWN WEEKDAY history, the
    // seasonal adjustment o05's global z-score lacks (Monday traffic is
    // not anomalous for being bigger than Sunday's; a quiet MONDAY is).
    // Exactness: the baseline never uses streaming moments (stddev's
    // M2 accumulation is order-dependent) — per-slot count c, Σn and
    // Σn² are exact integers (Σn² in DECIMAL(38,0): a 10^10-row day
    // squares past 63 bits long before the corpus is exotic), and
    // z = (n·c − Σn) / sqrt(c·Σn² − (Σn)²) puts every subtraction in
    // exact integer space, leaving ONE int64→double conversion (exactly
    // specified round-to-nearest in both engines), one sqrt and one
    // divide — a mirrored IEEE tree, rounded 9 dp. Constant slots
    // (variance 0) yield NULL, not a 0-division; a variance term past
    // 62 bits raises loudly (exact ops fail, never wrap — chunk the
    // horizon per epoch as q79 prescribes). Scale shape: one
    // corpus-scale daily aggregation; the baseline windows run over
    // calendar-bounded (type × dow) slots.
    "q82_seasonal_dow" -> { (s, d) =>
      import s.implicits._
      val slot = Window.partitionBy($"event_type", $"dow")
      val daily = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("dow", dayofweek($"day").cast("long"))
      val stats = daily
        .withColumn("c", count(lit(1)).over(slot))
        .withColumn("s1", sum($"n_events").over(slot))
        .withColumn("s2",
          sum(($"n_events".cast("decimal(38,0)") * $"n_events")
            .cast("decimal(38,0)")).over(slot))
        .withColumn("var_num",
          ($"c".cast("decimal(38,0)") * $"s2" -
            $"s1".cast("decimal(38,0)") * $"s1").cast("decimal(38,0)"))
      stats
        .withColumn("z_dow",
          when($"var_num" > lit(Long.MaxValue / 2),
            raise_error(lit("q82_seasonal_dow: variance term exceeds " +
              "62 bits; chunk the horizon per epoch")).cast("double"))
            .when($"var_num" === 0, lit(null).cast("double"))
            .otherwise(round(
              ($"n_events" * $"c" - $"s1").cast("double") /
                sqrt($"var_num".cast("long").cast("double")), 9)))
        .select($"event_type", $"day", $"n_events", $"dow", $"z_dow",
          (abs(coalesce($"z_dow", lit(0.0))) > 2.0).as("is_anomaly"))
    },

    // q83: interval×interval overlap join — which activity REGIMES
    // co-occur: per-type activity bursts (runs of active minutes with
    // gaps ≤ 15 min) overlap-joined across types. The scale pattern is
    // the point: interval overlap is a non-equi predicate Spark would
    // nest-loop, so both sides explode into fixed 6-hour epoch buckets
    // and equi-join ON BUCKET, with the OWNERSHIP filter (the bucket
    // containing the overlap's start, floor(greatest(s_a,s_b)/W))
    // emitting each overlapping pair EXACTLY once — no post-hoc
    // distinct, no double counting, no cross join (the capless oracle
    // joins on the raw predicate, proving the bucket cover complete).
    // The corpus is touched once (the minute-grid aggregation); burst
    // detection windows run over calendar-bounded minute series (q79
    // convention: ≤ span-minutes rows per type at ANY corpus size), so
    // the join inputs are calendar-bounded too. Minute-aligned closed
    // intervals: overlap_s = 0 means same-minute co-activity (counted —
    // the types were both live inside that minute).
    "q83_overlap_join" -> { (s, d) =>
      import s.implicits._
      val W = 21600L // 6h bucket width in seconds
      val w = Window.partitionBy($"event_type").orderBy($"minute")
      val grid = Tables.events(s, d)
        .groupBy($"event_type",
          date_trunc("minute", $"ts").as("minute"))
        .agg(count(lit(1)).as("n"))
      val bursts = grid
        .withColumn("gap_break",
          when(lag($"minute", 1).over(w).isNull ||
            $"minute".cast("long") -
              lag($"minute", 1).over(w).cast("long") > 900L,
            1L).otherwise(0L))
        .withColumn("burst",
          sum($"gap_break").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"event_type", $"burst")
        .agg(min($"minute".cast("long")).as("start_s"),
          max($"minute".cast("long")).as("end_s"),
          sum($"n").as("n_events"))
      val exploded = bursts.withColumn("bkt",
        explode(sequence(floor($"start_s" / W), floor($"end_s" / W))))
      val a = exploded.select($"event_type".as("type_a"),
        $"start_s".as("sa"), $"end_s".as("ea"), $"bkt")
      val b = exploded.select($"event_type".as("type_b"),
        $"start_s".as("sb"), $"end_s".as("eb"), $"bkt")
      a.join(b, Seq("bkt"))
        .filter($"type_a" < $"type_b" &&
          $"sa" <= $"eb" && $"sb" <= $"ea" &&
          $"bkt" === floor(greatest($"sa", $"sb") / W))
        .withColumn("overlap_s",
          least($"ea", $"eb") - greatest($"sa", $"sb"))
        .groupBy($"type_a", $"type_b")
        .agg(count(lit(1)).as("n_overlaps"),
          sum($"overlap_s").as("sum_overlap_s"),
          max($"overlap_s").as("max_overlap_s"))
    },

    // q84: RFM segmentation — recency / frequency / monetary quintile
    // scores per customer, the classic marketing-analytics cohorting.
    // Exactness choices: the as-of date is the corpus max order date
    // (no wall clock — replays score identically); monetary lives in
    // integer CENTS from an exact DECIMAL(18,2) sum, so all three
    // metrics are integers and the quintile thresholds ride the
    // q29/q76 percentile↔quantile_cont integer parity (rounded 6 dp
    // before comparison); scores are sums of exact boolean
    // comparisons, 1..5 with recency inverted (recent = high). Scale
    // shape: one keyed corpus aggregation; thresholds are a 1-row
    // broadcast (the t23/x07 convention — never an ntile sort over
    // customers); staging is map-only after the broadcast, so equal
    // metrics get equal scores under any partitioning.
    "q84_rfm" -> { (s, d) =>
      import s.implicits._
      val cust = Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(max(to_date($"o_orderdate")).as("last_day"),
          count(lit(1)).as("frequency"),
          (sum($"o_totalprice".cast("decimal(18,2)")) * 100)
            .cast("long").as("__cents"))
      val asOf = cust.agg(max($"last_day").as("__as_of"))
      val base = cust.crossJoin(broadcast(asOf))
        .select($"o_custkey".as("custkey"),
          datediff($"__as_of", $"last_day").cast("long")
            .as("recency_days"),
          $"frequency", $"__cents")
      def q(c: String, p: Double, as: String) =
        round(expr(s"percentile($c, cast($p as double))"), 6).as(as)
      val thr = base.agg(
        q("recency_days", 0.2, "r20"), q("recency_days", 0.4, "r40"),
        q("recency_days", 0.6, "r60"), q("recency_days", 0.8, "r80"),
        q("frequency", 0.2, "f20"), q("frequency", 0.4, "f40"),
        q("frequency", 0.6, "f60"), q("frequency", 0.8, "f80"),
        q("__cents", 0.2, "m20"), q("__cents", 0.4, "m40"),
        q("__cents", 0.6, "m60"), q("__cents", 0.8, "m80"))
      def steps(c: Column, t: Seq[String]): Column =
        t.map(n => (c > col(n)).cast("long")).reduce(_ + _)
      base.crossJoin(broadcast(thr))
        .withColumn("r_score", lit(5L) -
          steps($"recency_days", Seq("r20", "r40", "r60", "r80")))
        .withColumn("f_score", lit(1L) +
          steps($"frequency", Seq("f20", "f40", "f60", "f80")))
        .withColumn("m_score", lit(1L) +
          steps($"__cents", Seq("m20", "m40", "m60", "m80")))
        .select($"custkey", $"recency_days", $"frequency",
          ($"__cents".cast("double") / 100.0).as("monetary"),
          $"r_score", $"f_score", $"m_score",
          ($"r_score" * 100 + $"f_score" * 10 + $"m_score")
            .as("rfm_code"))
    },

    // q85: Gini concentration of per-user activity per event type —
    // the inequality audit behind mixture decisions (a type whose
    // traffic is one whale is a different signal than the same count
    // spread across a fleet). Exactness: with x(1..n) the per-user
    // counts ascending, G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) — every
    // term an exact integer in DECIMAL(38,0) (rank·count products
    // outgrow int64 at ~10^10-user types), ONE int64→double conversion
    // per side of the final division (q82 convention: a term past 62
    // bits raises loudly, never wraps). Tie order can't leak: equal
    // counts swap ranks within a tie block and Σ i·x_i is invariant
    // under any permutation of equal x. Scale shape: the corpus-scale
    // pass is ONE groupBy (events → per-user counts); the ranking
    // window runs over the user-bounded relation, never events.
    "q85_gini" -> { (s, d) =>
      import s.implicits._
      val u = Tables.events(s, d)
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("x"))
      val r = u.withColumn("i",
        row_number().over(Window.partitionBy($"event_type")
          .orderBy($"x", $"user_id")).cast("long"))
      r.groupBy($"event_type")
        .agg(count(lit(1)).as("n_users"),
          sum($"x").as("total_events"),
          sum(($"i".cast("decimal(38,0)") * $"x")
            .cast("decimal(38,0)")).as("__w"),
          max($"x").as("__mx"))
        .withColumn("__num",
          (lit(2).cast("decimal(38,0)") * $"__w" -
            ($"n_users".cast("decimal(38,0)") + 1) * $"total_events")
            .cast("decimal(38,0)"))
        .withColumn("__den",
          ($"n_users".cast("decimal(38,0)") * $"total_events")
            .cast("decimal(38,0)"))
        .withColumn("gini",
          when($"__den" > lit(Long.MaxValue / 2),
            raise_error(lit("q85_gini: rank-sum term exceeds 62 bits; " +
              "chunk the horizon per epoch")).cast("double"))
            .otherwise(round($"__num".cast("long").cast("double") /
              $"__den".cast("long").cast("double"), 9)))
        .select($"event_type", $"n_users", $"total_events", $"gini",
          round($"__mx".cast("double") /
            $"total_events".cast("double"), 9).as("max_user_frac"))
    },

    // q86: Benford first-digit audit per event type — the fraud/
    // instrumentation-drift screen: organically-sized values follow
    // log10(1+1/d), synthetic or clamped feeds don't. Cross-engine
    // exactness without cross-engine transcendentals: the expected
    // fractions are literals computed ONCE in [[benfordP]] and
    // interpolated into BOTH plans (the LangMarkers single-source
    // convention — shortest-round-trip doubles parse back bit-equal);
    // the first digit comes from integer-cents string heads (never a
    // log10 of the value); χ² sums per-digit contributions rounded
    // 9 dp through DECIMAL (the t13 convention — float sums are
    // order-dependent, decimal sums aren't). Map-only over the corpus
    // + a 9-row-per-type spine join; zero-observation digits
    // contribute n·p (the correct χ² term), not silence.
    "q86_benford" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("__cents", round($"value" * 100).cast("long"))
        .filter($"__cents" > 0)
        .withColumn("digit",
          substring($"__cents".cast("string"), 1, 1).cast("int"))
      val obs = ev.groupBy($"event_type", $"digit")
        .agg(count(lit(1)).as("n_obs"))
      val spine = ev.select($"event_type").distinct()
        .crossJoin(broadcast(benfordP.toDF("digit", "p")))
      val wt = Window.partitionBy($"event_type")
      spine.join(obs, Seq("event_type", "digit"), "left")
        .withColumn("n_obs", coalesce($"n_obs", lit(0L)))
        .withColumn("__n_tot", sum($"n_obs").over(wt))
        .withColumn("__contrib", round(
          ($"n_obs".cast("double") - $"__n_tot".cast("double") * $"p") *
            ($"n_obs".cast("double") - $"__n_tot".cast("double") * $"p") /
            ($"__n_tot".cast("double") * $"p"), 9))
        .select($"event_type", $"digit", $"n_obs",
          round($"n_obs".cast("double") /
            $"__n_tot".cast("double"), 9).as("obs_frac"),
          round($"p", 9).as("exp_frac"),
          $"__contrib".as("contrib"),
          sum($"__contrib".cast("decimal(18,9)")).over(wt)
            .cast("double").as("chi2"))
    },

    // q87: DAU/MAU stickiness — the engagement-concentration companion
    // to q85's Gini (how much of a month's audience shows up on an
    // average day). Distinct-user days ride ONE deduped relation; see
    // [[q87Stickiness]].
    "q87_stickiness" -> (q87Stickiness(_, _)),

    // q88: rolling 7-day Pearson correlation between event-type daily
    // volumes — the co-movement monitor (a click/error correlation
    // spike is an incident signature; view/purchase decoupling is a
    // funnel break). Exactness is the q82 recipe at window scale: the
    // series is the DENSE calendar grid (missing days are REAL zeros,
    // not skipped rows — a sparse inner join would correlate "the last
    // 7 days each type happened to be active", a different statistic),
    // co-moments Σx, Σy, Σxy, Σx², Σy² are exact integers in
    // DECIMAL(38,0) over the 7-row frame, numerator/variances stay in
    // integer space through the subtractions, then ONE int64→double
    // conversion each side, sqrt·sqrt, divide, round 9. Zero variance
    // → NULL; a term past 62 bits raises loudly. Scale shape: the
    // corpus-scale pass is the daily aggregation; grids, pair joins,
    // and windows are calendar × type² bounded.
    "q88_rolling_corr" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val daily = ev.groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev.agg(to_date(min($"ts")).as("__d0"),
        to_date(max($"ts")).as("__d1"))
      val days = bounds.select(explode(sequence(lit(0),
        datediff($"__d1", $"__d0"))).as("__i"), $"__d0")
        .select(date_add($"__d0", $"__i").as("day"))
      val types = ev.select($"event_type").distinct()
      val grid = days.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
      val a = grid.select($"event_type".as("type_a"), $"day",
        $"n".as("x"))
      val b = grid.select($"event_type".as("type_b"), $"day",
        $"n".as("y"))
      val w = Window.partitionBy($"type_a", $"type_b").orderBy($"day")
      val fr = w.rowsBetween(-6, 0)
      def dsum(c: Column) = sum(c.cast("decimal(38,0)")).over(fr)
      val paired = a.join(b, Seq("day")).filter($"type_a" < $"type_b")
        .withColumn("__rn", row_number().over(w))
        .withColumn("__sx", dsum($"x")).withColumn("__sy", dsum($"y"))
        .withColumn("__sxy", dsum(($"x".cast("decimal(38,0)") * $"y")
          .cast("decimal(38,0)")))
        .withColumn("__sxx", dsum(($"x".cast("decimal(38,0)") * $"x")
          .cast("decimal(38,0)")))
        .withColumn("__syy", dsum(($"y".cast("decimal(38,0)") * $"y")
          .cast("decimal(38,0)")))
        .filter($"__rn" >= 7)
      def toL(c: Column, what: String) =
        when(abs(c) > lit(Long.MaxValue / 2),
          raise_error(lit(s"q88_rolling_corr: $what exceeds 62 bits; " +
            "chunk the horizon per epoch")).cast("long"))
          .otherwise(c.cast("long"))
      paired
        .withColumn("__num", toL((lit(7).cast("decimal(38,0)") * $"__sxy" -
          $"__sx" * $"__sy").cast("decimal(38,0)"), "covariance term"))
        .withColumn("__vx", toL((lit(7).cast("decimal(38,0)") * $"__sxx" -
          $"__sx" * $"__sx").cast("decimal(38,0)"), "variance term"))
        .withColumn("__vy", toL((lit(7).cast("decimal(38,0)") * $"__syy" -
          $"__sy" * $"__sy").cast("decimal(38,0)"), "variance term"))
        .select($"type_a", $"type_b", $"day",
          when($"__vx" === 0 || $"__vy" === 0, lit(null).cast("double"))
            .otherwise(round($"__num".cast("double") /
              (sqrt($"__vx".cast("double")) * sqrt($"__vy".cast("double"))),
              9)).as("corr7"))
    },

    // q90: user-lifetime cohort summary — per signup-month cohort (month
    // of first activity), how long users actually stay: active days,
    // first-to-last span, the one-day-wonder fraction, and the median
    // span (percentile ↔ quantile_cont at the q29/q84 integer-parity
    // convention). The corpus-scale pass is one groupBy to per-user
    // (first, last, active-day) facts; every aggregate after runs on
    // the user-bounded relation. Exact divisions, one per lane, round 9.
    "q90_user_lifetime" -> { (s, d) =>
      import s.implicits._
      val u = Tables.events(s, d)
        .groupBy($"user_id")
        .agg(to_date(min($"ts")).as("__first"),
          to_date(max($"ts")).as("__last"),
          countDistinct(to_date($"ts")).as("__active"))
        .withColumn("__span",
          (datediff($"__last", $"__first") + 1).cast("long"))
        .withColumn("cohort", to_date(date_trunc("month", $"__first")))
      u.groupBy($"cohort")
        .agg(count(lit(1)).as("n_users"),
          sum($"__active").as("__sa"),
          sum($"__span").as("__ss"),
          sum(when($"__span" === 1, 1L).otherwise(0L)).as("__one"),
          round(expr("percentile(__span, cast(0.5 as double))"), 6)
            .as("median_span_days"))
        .select($"cohort", $"n_users",
          round($"__sa".cast("double") / $"n_users".cast("double"), 9)
            .as("avg_active_days"),
          round($"__ss".cast("double") / $"n_users".cast("double"), 9)
            .as("avg_span_days"),
          $"median_span_days",
          round($"__one".cast("double") / $"n_users".cast("double"), 9)
            .as("one_day_frac"))
    },

    // q91: behavioral trigram mining — which 3-event sequences users
    // actually run (q78's Markov matrix is order-1; funnels live at
    // order ≥ 2: view→click→purchase vs view→click→view are different
    // products). Consecutive per-user triples via two leads over the
    // (ts, event_id) order — windows run user-bounded — then one
    // aggregation counts occurrences AND distinct users per sequence;
    // top-20 by (count desc, sequence asc) is a deterministic
    // TakeOrdered. Never a self-join: a join-based trigram build would
    // shuffle the event relation three times.
    "q91_event_trigrams" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("t2", lead($"event_type", 1).over(w))
        .withColumn("t3", lead($"event_type", 2).over(w))
        .filter($"t3".isNotNull)
        .select(concat_ws(">", $"event_type", $"t2", $"t3")
          .as("sequence"), $"user_id")
        .groupBy($"sequence")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"n_occurrences".desc, $"sequence".asc)
        .limit(20)
    },

    // q92: inter-event cadence — per event type, the distribution of
    // same-type same-user gaps (how often does a user click?): exact
    // integer-second gaps via one lag over the user-bounded window
    // (q81's epoch-seconds convention), integer-parity quantiles, one
    // exact mean division. The retention-model input and the
    // bot-detection baseline (sub-second p50 cadence is not a human).
    "q92_inter_event_time" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type", $"user_id")
        .orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .select($"event_type", $"user_id", $"event_id", $"ts")
        .withColumn("gap_s", $"ts".cast("long") -
          lag($"ts", 1).over(w).cast("long"))
        .filter($"gap_s".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_gaps"),
          min($"gap_s").as("min_s"),
          round(expr("percentile(gap_s, cast(0.5 as double))"), 6)
            .as("median_s"),
          round(expr("percentile(gap_s, cast(0.9 as double))"), 6)
            .as("p90_s"),
          max($"gap_s").as("max_s"),
          sum($"gap_s").as("__sum"))
        .withColumn("mean_s",
          round($"__sum".cast("double") / $"n_gaps".cast("double"), 9))
        .drop("__sum")
    },

    // q94: autocorrelation of the daily volume series at lags 1 and 7
    // — the seasonality detector (ACF(7) ≫ ACF(1) is a weekly cycle;
    // both near zero is white noise; q82 assumes the weekly structure,
    // q94 MEASURES it). Defined as the lagged-pairs Pearson over the
    // DENSE calendar grid (q88's zero-fill argument); the lag is a
    // window lead over the grid — never a self-join — and the
    // co-moments follow the exact-integer q88 recipe with the pair
    // count n' in place of the fixed frame width.
    "q94_autocorr" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val daily = ev.groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev.agg(to_date(min($"ts")).as("__d0"),
        to_date(max($"ts")).as("__d1"))
      val days = bounds.select(explode(sequence(lit(0),
        datediff($"__d1", $"__d0"))).as("__i"), $"__d0")
        .select(date_add($"__d0", $"__i").as("day"))
      val grid = days.crossJoin(broadcast(ev.select($"event_type").distinct()))
        .join(daily, Seq("event_type", "day"), "left")
        .withColumn("x", coalesce($"n", lit(0L)))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      def lagBranch(k: Int) = grid
        .withColumn("y", lead($"x", k).over(w))
        .filter($"y".isNotNull)
        .withColumn("lag_days", lit(k.toLong))
      def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
      def toL(c: Column) =
        when(abs(c) > lit(Long.MaxValue / 2),
          raise_error(lit("q94_autocorr: co-moment exceeds 62 bits; " +
            "chunk the horizon per epoch")).cast("long"))
          .otherwise(c.cast("long"))
      lagBranch(1).unionByName(lagBranch(7))
        .groupBy($"event_type", $"lag_days")
        .agg(count(lit(1)).as("n_pairs"),
          dsum($"x").as("__sx"), dsum($"y").as("__sy"),
          dsum(($"x".cast("decimal(38,0)") * $"y")
            .cast("decimal(38,0)")).as("__sxy"),
          dsum(($"x".cast("decimal(38,0)") * $"x")
            .cast("decimal(38,0)")).as("__sxx"),
          dsum(($"y".cast("decimal(38,0)") * $"y")
            .cast("decimal(38,0)")).as("__syy"))
        .withColumn("__num", toL(($"n_pairs".cast("decimal(38,0)") *
          $"__sxy" - $"__sx" * $"__sy").cast("decimal(38,0)")))
        .withColumn("__vx", toL(($"n_pairs".cast("decimal(38,0)") *
          $"__sxx" - $"__sx" * $"__sx").cast("decimal(38,0)")))
        .withColumn("__vy", toL(($"n_pairs".cast("decimal(38,0)") *
          $"__syy" - $"__sy" * $"__sy").cast("decimal(38,0)")))
        .select($"event_type", $"lag_days", $"n_pairs",
          when($"__vx" === 0 || $"__vy" === 0, lit(null).cast("double"))
            .otherwise(round($"__num".cast("double") /
              (sqrt($"__vx".cast("double")) *
                sqrt($"__vy".cast("double"))), 9)).as("acf"))
    },

    // q95: median-absolute-deviation outlier screen — the ROBUST
    // counterpart to q82/o05's z-scores (one wild day drags a mean and
    // inflates a stddev, so classical z-scores hide exactly the
    // anomalies they should flag; median and MAD don't move). Two
    // quantile passes over calendar-bounded daily counts + one
    // broadcast join back; the outlier gate |n − median| > 5·MAD
    // compares doubles both engines computed identically (medians
    // round-6 first, the q84 parity convention). MAD = 0 (a majority
    // of days exactly at the median) degrades to "any deviation
    // flags", which is the correct robust reading of a constant
    // baseline.
    "q95_mad" -> { (s, d) =>
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          round(expr("percentile(n, cast(0.5 as double))"), 6)
            .as("median_n"))
      val dev = daily.join(broadcast(med), "event_type")
        .withColumn("__ad", abs($"n".cast("double") - $"median_n"))
      val stats = dev.groupBy($"event_type", $"n_days", $"median_n")
        .agg(round(expr("percentile(__ad, cast(0.5 as double))"), 6)
          .as("mad"))
      daily.join(broadcast(stats), "event_type")
        .groupBy($"event_type", $"n_days", $"median_n", $"mad")
        .agg(sum(when(abs($"n".cast("double") - $"median_n") >
          lit(5.0) * $"mad", 1L).otherwise(0L)).as("n_outliers"))
    },

    // q89: Pareto concentration — the "how few users are 80% of the
    // traffic" cut q85's Gini summarizes as one number. rank80 is the
    // SMALLEST desc-rank whose cumulative share reaches 80%, found by
    // the exact integer cross-multiply 5·cum ≥ 4·total (never a float
    // threshold). The corpus-scale pass is one groupBy; ranking windows
    // run over the user-bounded relation (q85 convention).
    "q89_pareto" -> { (s, d) =>
      import s.implicits._
      val u = Tables.events(s, d)
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy($"event_type")
        .orderBy($"x".desc, $"user_id".asc)
      val r = u.withColumn("__rnk", row_number().over(w).cast("long"))
        .withColumn("__cum", sum($"x").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = u.groupBy($"event_type")
        .agg(count(lit(1)).as("n_users"), sum($"x").as("total_events"))
      r.join(tot, "event_type")
        .filter($"__cum" * 5 >= $"total_events" * 4)
        .groupBy($"event_type", $"n_users", $"total_events")
        .agg(min($"__rnk").as("rank80"))
        .select($"event_type", $"n_users", $"total_events", $"rank80",
          round($"rank80".cast("double") / $"n_users".cast("double"), 9)
            .as("top_user_frac"))
    }
  )

  /** DAU/MAU stickiness per event type per month — registered under
    * [[queries]] as q87. Lives outside the map literal only to keep the
    * literal under Scala's method-size comfort zone. */
  private def q87Stickiness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // One distinct pass feeds both granularities: the (type, month,
    // day, user) relation is the corpus-scale shuffle; everything after
    // is calendar × type bounded. Exact integers to the last step, one
    // mirrored double division (round 9).
    val mu = Tables.events(s, d).select($"event_type",
      to_date(date_trunc("month", $"ts")).as("month"),
      to_date($"ts").as("day"), $"user_id").distinct()
    val daily = mu.groupBy($"event_type", $"month", $"day")
      .agg(count(lit(1)).as("__du"))
    val monthly = mu.select($"event_type", $"month", $"user_id").distinct()
      .groupBy($"event_type", $"month").agg(count(lit(1)).as("mau"))
    daily.groupBy($"event_type", $"month")
      .agg(count(lit(1)).as("n_days"), sum($"__du").as("sum_daily_users"))
      .join(monthly, Seq("event_type", "month"))
      .select($"event_type", $"month", $"n_days", $"mau",
        $"sum_daily_users",
        round($"sum_daily_users".cast("double") /
          $"n_days".cast("double"), 9).as("avg_dau"),
        round($"sum_daily_users".cast("double") /
          ($"n_days".cast("double") * $"mau".cast("double")), 9)
          .as("stickiness"))
  }

  /** Benford expected first-digit probabilities, the ONE definition
    * both q86's Spark plan and its oracle SQL interpolate (Java's
    * shortest-round-trip double rendering parses back to the same bits
    * in any correct reader, so no cross-engine log10 is ever taken). */
  private[operators] val benfordP: Seq[(Int, Double)] =
    (1 to 9).map(dd => dd -> math.log10(1.0 + 1.0 / dd))

  private def benfordValuesSql: String =
    benfordP.map { case (dd, p) => s"($dd, $p)" }.mkString(", ")

  /** Mode of `valCol` per `keyCol` with smallest-value tie-break, as two
    * partial-aggregating hash aggregations (see q67 scaladoc in
    * [[queries]]). Output columns: (key, mode value, its count). */
  def modePerKey(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(min(struct((-col("__n")).as("nn"), col(valCol).as("v"))).as("__m"))
      .select(col(keyCol), col("__m.v"), (-col("__m.nn")).as("__cnt"))

  val oracleSql: Map[String, String] = Map(
    "q81_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |t1 AS (SELECT user_id, MIN(ts) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM ev e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > t1.t_view GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM ev e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
        |  GROUP BY 1),
        |w AS (SELECT t1.user_id, t_view, t_click, t_purchase
        |  FROM t1 LEFT JOIN t2 USING (user_id)
        |    LEFT JOIN t3 USING (user_id)),
        |g AS (SELECT 'view_to_click' AS transition,
        |    CAST(floor(epoch(t_click)) AS BIGINT)
        |      - CAST(floor(epoch(t_view)) AS BIGINT) AS gap_s FROM w
        |  UNION ALL SELECT 'click_to_purchase',
        |    CAST(floor(epoch(t_purchase)) AS BIGINT)
        |      - CAST(floor(epoch(t_click)) AS BIGINT) FROM w)
        |SELECT transition, COUNT(*) AS n_users,
        |  MIN(gap_s) AS min_s,
        |  quantile_cont(gap_s, 0.5) AS median_s,
        |  quantile_cont(gap_s, 0.9) AS p90_s,
        |  CAST(CAST(SUM(gap_s) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_s
        |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin,

    "q79_ewma" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY day) AS t FROM daily),
        |s AS (SELECT *, SUM(CAST(n_events
        |      * (CAST(1 AS BIGINT) << GREATEST(t - 2, 0)) AS
        |      DECIMAL(38,0)))
        |    OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS scaled FROM r)
        |SELECT event_type, day, n_events,
        |  CAST(scaled AS DOUBLE) * power(2.0, -(t - 1)) AS ewma,
        |  n_events - CAST(scaled AS DOUBLE) * power(2.0, -(t - 1))
        |    AS dev
        |FROM s""".stripMargin,

    "q80_cusum" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS t,
        |    SUM(n_events) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS run_sum,
        |    CAST(SUM(n_events) OVER (PARTITION BY event_type)
        |        AS DOUBLE)
        |      / CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE)
        |      AS mu
        |  FROM daily),
        |c AS (SELECT *, CAST(run_sum AS DOUBLE)
        |    - CAST(t AS DOUBLE) * mu AS cusum FROM r)
        |SELECT event_type, day, n_events, cusum,
        |  abs(cusum) = MAX(abs(cusum))
        |    OVER (PARTITION BY event_type) AS is_peak
        |FROM c""".stripMargin,

    // DuckDB dayofweek is 0=Sunday..6; Spark is 1=Sunday..7 — hence +1.
    // Exact-integer moments ride HUGEINT here (the oracle's int128
    // stands in for the engine's DECIMAL(38,0) lane).
    "q82_seasonal_dow" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT *, CAST(dayofweek(day) + 1 AS BIGINT) AS dow
        |  FROM daily),
        |st AS (SELECT *,
        |    COUNT(*) OVER w AS c,
        |    CAST(SUM(n_events) OVER w AS BIGINT) AS s1,
        |    SUM(CAST(n_events AS HUGEINT) * n_events) OVER w AS s2
        |  FROM b WINDOW w AS (PARTITION BY event_type, dow)),
        |v AS (SELECT *,
        |    CAST(c AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1
        |      AS var_num FROM st),
        |z AS (SELECT event_type, day, n_events, dow,
        |    CASE WHEN var_num = 0 THEN NULL
        |      ELSE round(CAST(n_events * c - s1 AS DOUBLE)
        |        / sqrt(CAST(CAST(var_num AS BIGINT) AS DOUBLE)), 9)
        |    END AS z_dow
        |  FROM v)
        |SELECT *, abs(COALESCE(z_dow, 0.0)) > 2.0 AS is_anomaly
        |FROM z""".stripMargin,

    "q84_rfm" ->
      """WITH cust AS (SELECT o_custkey AS custkey,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_day,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |a AS (SELECT MAX(last_day) AS as_of FROM cust),
        |b AS (SELECT custkey,
        |    CAST(as_of - last_day AS BIGINT) AS recency_days,
        |    frequency, cents FROM cust, a),
        |t AS (SELECT
        |    round(quantile_cont(recency_days, 0.2), 6) AS r20,
        |    round(quantile_cont(recency_days, 0.4), 6) AS r40,
        |    round(quantile_cont(recency_days, 0.6), 6) AS r60,
        |    round(quantile_cont(recency_days, 0.8), 6) AS r80,
        |    round(quantile_cont(frequency, 0.2), 6) AS f20,
        |    round(quantile_cont(frequency, 0.4), 6) AS f40,
        |    round(quantile_cont(frequency, 0.6), 6) AS f60,
        |    round(quantile_cont(frequency, 0.8), 6) AS f80,
        |    round(quantile_cont(cents, 0.2), 6) AS m20,
        |    round(quantile_cont(cents, 0.4), 6) AS m40,
        |    round(quantile_cont(cents, 0.6), 6) AS m60,
        |    round(quantile_cont(cents, 0.8), 6) AS m80
        |  FROM b),
        |sc AS (SELECT b.*,
        |    5 - (CAST(recency_days > r20 AS BIGINT)
        |      + CAST(recency_days > r40 AS BIGINT)
        |      + CAST(recency_days > r60 AS BIGINT)
        |      + CAST(recency_days > r80 AS BIGINT)) AS r_score,
        |    1 + (CAST(frequency > f20 AS BIGINT)
        |      + CAST(frequency > f40 AS BIGINT)
        |      + CAST(frequency > f60 AS BIGINT)
        |      + CAST(frequency > f80 AS BIGINT)) AS f_score,
        |    1 + (CAST(cents > m20 AS BIGINT)
        |      + CAST(cents > m40 AS BIGINT)
        |      + CAST(cents > m60 AS BIGINT)
        |      + CAST(cents > m80 AS BIGINT)) AS m_score
        |  FROM b, t)
        |SELECT custkey, recency_days, frequency,
        |  CAST(cents AS DOUBLE) / 100.0 AS monetary,
        |  r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS rfm_code
        |FROM sc""".stripMargin,

    // Capless: the raw overlap predicate over the burst relation — the
    // engine's bucket-explode + ownership-filter equi-join must produce
    // exactly this (each overlapping pair once).
    "q83_overlap_join" ->
      """WITH grid AS (SELECT event_type,
        |    date_trunc('minute', ts) AS minute, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CASE WHEN LAG(minute) OVER w IS NULL
        |      OR CAST(epoch(minute) AS BIGINT)
        |        - CAST(epoch(LAG(minute) OVER w) AS BIGINT) > 900
        |      THEN 1 ELSE 0 END AS gap_break
        |  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY minute)),
        |i AS (SELECT *, SUM(gap_break) OVER (PARTITION BY event_type
        |    ORDER BY minute
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
        |  FROM r),
        |bursts AS (SELECT event_type, burst,
        |    MIN(CAST(epoch(minute) AS BIGINT)) AS start_s,
        |    MAX(CAST(epoch(minute) AS BIGINT)) AS end_s
        |  FROM i GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    least(a.end_s, b.end_s) - greatest(a.start_s, b.start_s)
        |      AS overlap_s
        |  FROM bursts a JOIN bursts b
        |    ON a.event_type < b.event_type
        |    AND a.start_s <= b.end_s AND b.start_s <= a.end_s)
        |SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
        |  CAST(SUM(overlap_s) AS BIGINT) AS sum_overlap_s,
        |  MAX(overlap_s) AS max_overlap_s
        |FROM p GROUP BY 1, 2""".stripMargin,

    "q78_markov_transitions" ->
      """WITH seqd AS (SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev AS from_type, event_type AS to_type,
        |    COUNT(*) AS n
        |  FROM seqd WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        |  FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.n_from,
        |  round(CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 9) AS p
        |FROM c JOIN t USING (from_type)""".stripMargin,

    "q77_event_pattern" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts,
        |    event_id, upper(substr(event_type, 1, 1)) AS init
        |  FROM events),
        |p AS (SELECT user_id, day, COUNT(*) AS n_events,
        |    string_agg(init, '' ORDER BY ts, event_id) AS pattern
        |  FROM ev GROUP BY 1, 2)
        |SELECT user_id, day, n_events, pattern,
        |  regexp_matches(pattern, 'V.*C.*P') AS has_funnel,
        |  pattern = 'V' AS is_bounce
        |FROM p""".stripMargin,

    "q76_rolling_median" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |  quantile_cont(n_events, 0.5) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |    AS med7
        |FROM daily""".stripMargin,

    "q75_interval_coalesce" ->
      """WITH iv AS (SELECT o_custkey,
        |    CAST(o_orderdate AS DATE) AS start_d,
        |    CAST(o_orderdate AS DATE)
        |      + CAST(o_orderkey % 7 + 1 AS INTEGER) AS end_d,
        |    o_orderkey
        |  FROM orders),
        |f AS (SELECT *, MAX(end_d) OVER (PARTITION BY o_custkey
        |    ORDER BY start_d, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM iv),
        |g AS (SELECT *, CASE WHEN maxe IS NULL OR start_d > maxe
        |    THEN 1 ELSE 0 END AS nw FROM f),
        |h AS (SELECT *, SUM(nw) OVER (PARTITION BY o_custkey
        |    ORDER BY start_d, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g)
        |SELECT o_custkey AS c_custkey, MIN(start_d) AS span_start,
        |  MAX(end_d) AS span_end, COUNT(*) AS n_orders,
        |  (MAX(end_d) - MIN(start_d))::BIGINT AS span_days
        |FROM h GROUP BY o_custkey, island""".stripMargin,

    // DATE subtraction is integer days in DuckDB; // 7 mirrors
    // `datediff(...) div 7`
    "q72_cohort_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1),
        |sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM f
        |  GROUP BY 1),
        |act AS (SELECT DISTINCT f.cohort_day,
        |    ((d.day - f.cohort_day) // 7)::BIGINT AS offset_week,
        |    d.user_id
        |  FROM days d JOIN f USING (user_id)),
        |a AS (SELECT cohort_day, offset_week, COUNT(*) AS n_active
        |  FROM act GROUP BY 1, 2)
        |SELECT a.cohort_day, a.offset_week, a.n_active, sz.cohort_size,
        |  round(a.n_active / sz.cohort_size, 9) AS retention
        |FROM a JOIN sz USING (cohort_day)""".stripMargin,

    // same grid, same windows, same IEEE interpolation tree — the
    // floor-div epoch-hour mirrors `cast(ts as long) div 3600`
    "q71_interpolate" ->
      """WITH ev AS (SELECT user_id,
        |    (floor(epoch(ts))::BIGINT) // 3600 AS h, ts, event_id, value
        |  FROM events),
        |k AS (SELECT user_id, h, value AS v FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, h
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |s AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM k
        |  GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM s),
        |j AS (SELECT g.user_id, g.h, k.v FROM g LEFT JOIN k
        |  ON k.user_id = g.user_id AND k.h = g.h),
        |w AS (SELECT user_id, h, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY h
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY h
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT user_id, h AS hour_bucket,
        |  CASE WHEN v IS NOT NULL THEN v
        |    ELSE round(pv + (nv - pv) * ((h - ph) / (nh - ph)), 9) END
        |    AS value,
        |  v IS NULL AS interpolated
        |FROM w""".stripMargin,

    // full recompute — proving the engine's base+delta merge exact
    "q70_incremental_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q69_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day, COUNT(DISTINCT u.user_id) AS users_7d
        |FROM days d JOIN du u
        |  ON u.day <= d.day AND u.day > d.day - 7
        |GROUP BY d.day""".stripMargin,

    "q67_mode_per_key" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS mode_event_type, n AS n_events
        |FROM r WHERE rn = 1""".stripMargin,

    "q60_zscore" ->
      """WITH s AS (SELECT event_type, round(avg(value), 6) AS mu,
        |    round(stddev_samp(value), 6) AS sd
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, e.event_id,
        |  round((e.value - s.mu) / nullif(s.sd, 0), 6) AS z
        |FROM events e JOIN s USING (event_type)""".stripMargin,

    "q59_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |t1 AS (SELECT user_id, MIN(ts) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM ev e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > t1.t_view GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM ev e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id, t_view, t_click, t_purchase,
        |  CASE WHEN t_purchase IS NOT NULL THEN 3
        |       WHEN t_click IS NOT NULL THEN 2
        |       WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |  LEFT JOIN t3 USING (user_id)""".stripMargin,

    "q58_winsorize" ->
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, e.event_id,
        |  round(least(greatest(e.value, b.lo), b.hi), 6) AS clipped,
        |  (e.value < b.lo OR e.value > b.hi) AS was_clipped
        |FROM events e JOIN b USING (event_type)""".stripMargin,

    "q53_regression" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
        |  round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q54_ordered_set_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  round(median(l_quantity), 6) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q25_cont,
        |  round(quantile_disc(l_quantity, 0.75), 6) AS q75_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q55_order_islands" ->
      """WITH dated AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |    o_orderdate
        |  FROM orders),
        |flagged AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_date,
        |    CASE WHEN LAG(o_date) OVER w IS NULL
        |           OR date_diff('day', LAG(o_date) OVER w, o_date) > 30
        |         THEN 1 ELSE 0 END AS gap_break
        |  FROM dated
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |islanded AS (
        |  SELECT o_custkey, o_date,
        |    CAST(SUM(gap_break) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM flagged)
        |SELECT o_custkey, island,
        |  MIN(o_date) AS start_date, MAX(o_date) AS end_date,
        |  COUNT(*) AS n_orders
        |FROM islanded GROUP BY o_custkey, island""".stripMargin,

    "q57_locf" ->
      """SELECT user_id, event_id,
        |  event_type = 'error' AS is_masked,
        |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_filled
        |FROM events""".stripMargin,

    "q56_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  array_to_string(
        |    list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
        |    AS first5_asc,
        |  array_to_string(
        |    list_reverse_sort(string_split(text, ' '))[1:3], ',')
        |    AS top3_desc
        |FROM documents""".stripMargin,

    // Exact-integer Gini through HUGEINT (the oracle's int128 stands in
    // for the engine's DECIMAL(38,0) lane, the q82 convention).
    "q85_gini" ->
      """WITH u AS (SELECT event_type, user_id, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY x ASC, user_id ASC) AS BIGINT) AS i FROM u),
        |a AS (SELECT event_type, COUNT(*) AS n_users,
        |    CAST(SUM(x) AS BIGINT) AS total_events,
        |    SUM(CAST(i AS HUGEINT) * x) AS w, MAX(x) AS mx
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |  round(CAST(CAST(2 * w - (CAST(n_users AS HUGEINT) + 1)
        |        * total_events AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(CAST(n_users AS HUGEINT) * total_events
        |        AS BIGINT) AS DOUBLE), 9) AS gini,
        |  round(CAST(mx AS DOUBLE) / CAST(total_events AS DOUBLE), 9)
        |    AS max_user_frac
        |FROM a""".stripMargin,

    // The expected-fraction literals are interpolated from the SAME
    // benfordP constant the Spark plan embeds — no cross-engine log10.
    "q86_benford" -> s"""
      |WITH ev AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events
      |  WHERE CAST(round(value * 100) AS BIGINT) > 0),
      |dg AS (SELECT event_type,
      |    CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
      |      AS digit FROM ev),
      |obs AS (SELECT event_type, digit, COUNT(*) AS n_obs
      |  FROM dg GROUP BY 1, 2),
      |p(digit, p) AS (VALUES $benfordValuesSql),
      |ty AS (SELECT DISTINCT event_type FROM dg),
      |sp AS (SELECT ty.event_type, p.digit, p.p,
      |    COALESCE(n_obs, 0) AS n_obs
      |  FROM ty CROSS JOIN p LEFT JOIN obs
      |    ON obs.event_type = ty.event_type AND obs.digit = p.digit),
      |t AS (SELECT *, SUM(n_obs) OVER (PARTITION BY event_type)
      |    AS n_tot FROM sp),
      |c AS (SELECT *, round(
      |    (CAST(n_obs AS DOUBLE) - CAST(n_tot AS DOUBLE) * p)
      |      * (CAST(n_obs AS DOUBLE) - CAST(n_tot AS DOUBLE) * p)
      |      / (CAST(n_tot AS DOUBLE) * p), 9) AS contrib FROM t)
      |SELECT event_type, digit, n_obs,
      |  round(CAST(n_obs AS DOUBLE) / CAST(n_tot AS DOUBLE), 9)
      |    AS obs_frac,
      |  round(p, 9) AS exp_frac, contrib,
      |  CAST(SUM(CAST(contrib AS DECIMAL(18,9)))
      |    OVER (PARTITION BY event_type) AS DOUBLE) AS chi2
      |FROM c""".stripMargin.trim,

    "q87_stickiness" ->
      """WITH mu AS (SELECT DISTINCT event_type,
        |    CAST(date_trunc('month', ts) AS DATE) AS month,
        |    CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |daily AS (SELECT event_type, month, day, COUNT(*) AS du
        |  FROM mu GROUP BY 1, 2, 3),
        |monthly AS (SELECT event_type, month, COUNT(*) AS mau
        |  FROM (SELECT DISTINCT event_type, month, user_id FROM mu)
        |  GROUP BY 1, 2),
        |agg AS (SELECT event_type, month,
        |    COUNT(*) AS n_days, CAST(SUM(du) AS BIGINT) AS sum_daily_users
        |  FROM daily GROUP BY 1, 2)
        |SELECT a.event_type, a.month, n_days, mau, sum_daily_users,
        |  round(CAST(sum_daily_users AS DOUBLE)
        |    / CAST(n_days AS DOUBLE), 9) AS avg_dau,
        |  round(CAST(sum_daily_users AS DOUBLE)
        |    / (CAST(n_days AS DOUBLE) * CAST(mau AS DOUBLE)), 9)
        |    AS stickiness
        |FROM agg a JOIN monthly m
        |  ON a.event_type = m.event_type AND a.month = m.month""".stripMargin,

    // Exact co-moments through HUGEINT (the q82 convention); the day
    // spine is the same inclusive 0..datediff grid the engine explodes.
    "q88_rolling_corr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |bounds AS (SELECT CAST(MIN(ts) AS DATE) AS d0,
        |    CAST(MAX(ts) AS DATE) AS d1 FROM events),
        |days AS (SELECT d0 + CAST(i AS INTEGER) AS day
        |  FROM bounds, LATERAL (SELECT unnest(
        |    range(0, datediff('day', d0, d1) + 1)) AS i)),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT t.event_type, d.day, COALESCE(n, 0) AS n
        |  FROM days d CROSS JOIN types t LEFT JOIN daily x
        |    ON x.event_type = t.event_type AND x.day = d.day),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.day, a.n AS x, b.n AS y
        |  FROM grid a JOIN grid b
        |    ON a.day = b.day AND a.event_type < b.event_type),
        |wnd AS (SELECT *, ROW_NUMBER() OVER w AS rn,
        |    SUM(CAST(x AS HUGEINT)) OVER w7 AS sx,
        |    SUM(CAST(y AS HUGEINT)) OVER w7 AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) OVER w7 AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) OVER w7 AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) OVER w7 AS syy
        |  FROM p WINDOW
        |    w AS (PARTITION BY type_a, type_b ORDER BY day),
        |    w7 AS (PARTITION BY type_a, type_b ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |v AS (SELECT type_a, type_b, day,
        |    CAST(7 * sxy - sx * sy AS BIGINT) AS num,
        |    CAST(7 * sxx - sx * sx AS BIGINT) AS vx,
        |    CAST(7 * syy - sy * sy AS BIGINT) AS vy
        |  FROM wnd WHERE rn >= 7)
        |SELECT type_a, type_b, day,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |    ELSE round(CAST(num AS DOUBLE)
        |      / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))), 9)
        |  END AS corr7
        |FROM v""".stripMargin,

    // q88's dense grid + a window lead per lag; co-moments HUGEINT
    "q94_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |bounds AS (SELECT CAST(MIN(ts) AS DATE) AS d0,
        |    CAST(MAX(ts) AS DATE) AS d1 FROM events),
        |days AS (SELECT d0 + CAST(i AS INTEGER) AS day
        |  FROM bounds, LATERAL (SELECT unnest(
        |    range(0, datediff('day', d0, d1) + 1)) AS i)),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT t.event_type, d.day, COALESCE(n, 0) AS x
        |  FROM days d CROSS JOIN types t LEFT JOIN daily dl
        |    ON dl.event_type = t.event_type AND dl.day = d.day),
        |lagged AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag_days, x,
        |    LEAD(x, 1) OVER w AS y FROM grid
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |  UNION ALL
        |  SELECT event_type, CAST(7 AS BIGINT), x,
        |    LEAD(x, 7) OVER w2 FROM grid
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY day)),
        |p AS (SELECT * FROM lagged WHERE y IS NOT NULL),
        |a AS (SELECT event_type, lag_days, COUNT(*) AS n_pairs,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM p GROUP BY 1, 2),
        |v AS (SELECT event_type, lag_days, n_pairs,
        |    CAST(CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS BIGINT)
        |      AS num,
        |    CAST(CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS BIGINT)
        |      AS vx,
        |    CAST(CAST(n_pairs AS HUGEINT) * syy - sy * sy AS BIGINT)
        |      AS vy
        |  FROM a)
        |SELECT event_type, lag_days, n_pairs,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |    ELSE round(CAST(num AS DOUBLE)
        |      / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))), 9)
        |  END AS acf
        |FROM v""".stripMargin,

    "q95_mad" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n_days,
        |    round(quantile_cont(n, 0.5), 6) AS median_n
        |  FROM daily GROUP BY 1),
        |d2 AS (SELECT daily.event_type, n, n_days, median_n,
        |    abs(CAST(n AS DOUBLE) - median_n) AS ad
        |  FROM daily JOIN m USING (event_type)),
        |s AS (SELECT event_type, n_days, median_n,
        |    round(quantile_cont(ad, 0.5), 6) AS mad
        |  FROM d2 GROUP BY 1, 2, 3)
        |SELECT s.event_type, s.n_days, s.median_n, s.mad,
        |  CAST(SUM(CASE WHEN abs(CAST(n AS DOUBLE) - s.median_n)
        |    > 5.0 * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM daily JOIN s ON daily.event_type = s.event_type
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q89_pareto" ->
      """WITH u AS (SELECT event_type, user_id, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
        |    CAST(SUM(x) OVER (PARTITION BY event_type
        |      ORDER BY x DESC, user_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM u WINDOW w AS (PARTITION BY event_type
        |    ORDER BY x DESC, user_id ASC)),
        |t AS (SELECT event_type, COUNT(*) AS n_users,
        |    CAST(SUM(x) AS BIGINT) AS total_events FROM u GROUP BY 1)
        |SELECT r.event_type, n_users, total_events,
        |  MIN(rnk) AS rank80,
        |  round(CAST(MIN(rnk) AS DOUBLE) / CAST(n_users AS DOUBLE), 9)
        |    AS top_user_frac
        |FROM r JOIN t ON r.event_type = t.event_type
        |WHERE cum * 5 >= total_events * 4
        |GROUP BY 1, 2, 3""".stripMargin,

    "q91_event_trigrams" ->
      """WITH s AS (SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER w AS t2,
        |    LEAD(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT event_type || '>' || t2 || '>' || t3 AS sequence,
        |    user_id FROM s WHERE t3 IS NOT NULL)
        |SELECT sequence, COUNT(*) AS n_occurrences,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM g GROUP BY 1
        |ORDER BY n_occurrences DESC, sequence ASC LIMIT 20""".stripMargin,

    "q92_inter_event_time" ->
      """WITH g AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(LAG(ts, 1) OVER w)) AS BIGINT) AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type, user_id
        |    ORDER BY ts, event_id))
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  MIN(gap_s) AS min_s,
        |  round(quantile_cont(gap_s, 0.5), 6) AS median_s,
        |  round(quantile_cont(gap_s, 0.9), 6) AS p90_s,
        |  MAX(gap_s) AS max_s,
        |  round(CAST(CAST(SUM(gap_s) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 9) AS mean_s
        |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin,

    "q90_user_lifetime" ->
      """WITH u AS (SELECT user_id,
        |    CAST(MIN(ts) AS DATE) AS first_d,
        |    CAST(MAX(ts) AS DATE) AS last_d,
        |    CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active
        |  FROM events GROUP BY 1),
        |s AS (SELECT *,
        |    CAST(datediff('day', first_d, last_d) + 1 AS BIGINT) AS span,
        |    CAST(date_trunc('month', first_d) AS DATE) AS cohort
        |  FROM u)
        |SELECT cohort, COUNT(*) AS n_users,
        |  round(CAST(CAST(SUM(active) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 9) AS avg_active_days,
        |  round(CAST(CAST(SUM(span) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 9) AS avg_span_days,
        |  round(quantile_cont(span, 0.5), 6) AS median_span_days,
        |  round(CAST(CAST(SUM(CASE WHEN span = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 9) AS one_day_frac
        |FROM s GROUP BY 1""".stripMargin
  )
}
