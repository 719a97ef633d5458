package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch error contracts, asserted against exact computations. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.Tables.events(spark, sf("sf0.01"))

  test("count-min estimates within eps*N of exact, never under") {
    val exact = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = ev.count()
    val est = Sketches.estimateCounts(ev, "event_type",
      exact.keys.toSeq, eps = 0.001)
    est.foreach { case (k, e) =>
      val x = exact(k.asInstanceOf[String])
      assert(e >= x, s"CMS must never underestimate: $k est=$e exact=$x")
      assert(e <= x + (0.001 * n).toLong + 1,
        s"CMS overestimate beyond bound: $k est=$e exact=$x")
    }
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    val keys = ev.filter($"event_type" === "purchase").select($"user_id").distinct()
    val bf = Sketches.bloom(keys, "user_id", expectedItems = 1000, fpp = 0.01)
    val members = keys.as[Long].collect()
    members.foreach(k => assert(bf.mightContainLong(k),
      s"false negative for $k"))
    // false-positive rate over definitely-absent keys
    val absent = (1000000L until 1010000L)
    val fp = absent.count(bf.mightContainLong)
    assert(fp.toDouble / absent.size <= 0.03,
      s"false-positive rate too high: $fp/10000")
  }

  test("bloom pre-filter passes every true match through") {
    val purchasers = ev.filter($"event_type" === "purchase")
      .select($"user_id").distinct()
    val filtered = Sketches.bloomPreFilter(ev, "user_id", purchasers,
      "user_id", expectedItems = 1000)
    val trueMatches = ev.join(purchasers, "user_id")
    // no false negatives → the pre-filter retains at least all true rows
    assert(filtered.count() >= trueMatches.count())
    assert(filtered.join(purchasers, "user_id").count() === trueMatches.count())
    // the probe is the NATIVE codegen'd expression, inside whole-stage
    // codegen — no scalar UDF splitting the scan pipeline
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      "probe must be the native BloomMightContain expression")
    assert(!plan.contains("UDF"), "probe must not be a scalar UDF")
  }

  test("bloom pre-filter: string keys probe UTF-8 bytes (parity with " +
    "mightContainString), nulls never pass, codegen and interpreted agree") {
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val probe = Seq(Some("alpha"), Some("beta"), Some("zeta"), None)
      .toDF("k")
    val bf = Sketches.bloom(keys, "k", expectedItems = 100, fpp = 0.001)
    val got = Sketches.bloomPreFilter(probe, "k", keys, "k",
      expectedItems = 100, fpp = 0.001)
      .as[String].collect().toSet
    // members always pass (no false negatives); null NEVER passes
    assert(Set("alpha", "beta").subsetOf(got))
    assert(!got.contains(null))
    // parity with the filter's own string hashing for every probe value
    Seq("alpha", "beta", "zeta").foreach { v =>
      assert(got.contains(v) === bf.mightContainString(v),
        s"probe('$v') must equal mightContainString")
    }
  }

  test("approx quantiles within rank-error bound of exact") {
    val exactSorted = ev.select($"value").as[Double].collect().sorted
    val n = exactSorted.length
    val probs = Seq(0.1, 0.5, 0.9)
    val approx = Sketches.approxQuantiles(ev, "value", probs, relErr = 0.01)
    probs.zip(approx).foreach { case (p, a) =>
      // the approximate quantile must sit within rank p*n ± 0.01*n
      val lo = exactSorted(math.max(0, (p * n - 0.011 * n).toInt))
      val hi = exactSorted(math.min(n - 1, (p * n + 0.011 * n).toInt))
      assert(a >= lo && a <= hi, s"p=$p approx=$a outside [$lo, $hi]")
    }
  }
}
