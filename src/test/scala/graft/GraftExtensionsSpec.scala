package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the custom expressions must be callable from
  * plain `spark.sql` when the extension is installed. Extensions bind at
  * session BUILD time, so this suite must not inherit another suite's
  * session from getOrCreate — it stops any active session and builds its
  * own, releasing it afterwards. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit =
    if (spark != null) { spark.stop(); SparkSession.clearDefaultSession() }

  test("py_to_json is callable from SQL") {
    val sp = spark; import sp.implicits._
    Seq("[{'a': 1, 'b': None}]").toDF("s").createOrReplaceTempView("raw")
    val out = spark.sql("SELECT py_to_json(s) AS j FROM raw")
      .as[String].head()
    assert(out === """[{"a":1,"b":null}]""")
  }

  test("top_k aggregate is callable from SQL") {
    val sp = spark; import sp.implicits._
    Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("b", 2.0))
      .toDF("k", "v").createOrReplaceTempView("t")
    val out = spark.sql("SELECT k, top_k(v, 2) AS top FROM t GROUP BY k")
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") === Seq(5.0, 3.0))
    assert(out("b") === Seq(2.0))
  }

  test("round-2 native expressions are callable from SQL") {
    val sp = spark; import sp.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT dot_double(a, b) AS d, sq_dist_double(a, b) AS s,
        |  search_sorted(array(1.0d, 5.0d), 3.0d) AS bkt,
        |  rolling_hash('ab') AS fp
        |FROM vecs""".stripMargin).head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 27.0)
    assert(r.getInt(2) === 1)
    assert(r.getLong(3) === (97L * 31 + 98) % 1000000007L)

    val pairs = spark.sql(
      "SELECT array_pairs(array(1L, 2L, 3L)) AS (x, y)")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    Seq(("a", 1.0, 10L), ("a", 5.0, 11L), ("a", 3.0, 12L))
      .toDF("k", "score", "id").createOrReplaceTempView("scored")
    val top = spark.sql(
      "SELECT k, top_k_pairs(score, id, 2) AS t FROM scored GROUP BY k")
      .selectExpr("t[0].score", "t[0].id", "t[1].score", "t[1].id").head()
    assert((top.getDouble(0), top.getLong(1)) === ((5.0, 11L)))
    assert((top.getDouble(2), top.getLong(3)) === ((3.0, 12L)))
  }

  test("round-3 native expressions are callable from SQL") {
    val sp = spark; import sp.implicits._
    // token_shingles: distinct default + explicit occurrence form
    val sh = spark.sql(
      """SELECT token_shingles('a b a b', 2) AS d,
        |  token_shingles('a b a b', 2, false) AS all""".stripMargin).head()
    assert(sh.getSeq[String](0) === Seq("a b", "b a"))
    assert(sh.getSeq[String](1) === Seq("a b", "b a", "a b"))
    // window_hashes: 2-arg (stride defaults to 1) and 3-arg forms; the
    // w=2 hash of "ab" equals rolling_hash('ab')
    val rows = spark.sql(
      "SELECT window_hashes('abc', 2) AS (pos, h)")
      .as[(Int, Long)].collect().toSeq
    assert(rows === Seq(
      (0, (97L * 31 + 98) % 1000000007L),
      (1, (98L * 31 + 99) % 1000000007L)))
    val strided = spark.sql(
      "SELECT window_hashes('abcd', 2, 2) AS (pos, h)")
      .as[(Int, Long)].collect().map(_._1).toSeq
    assert(strided === Seq(0, 2))
    // vector_mean aggregate
    Seq((1, Array(1.0, 3.0)), (1, Array(3.0, 5.0)))
      .toDF("g", "v").createOrReplaceTempView("vm")
    val m = spark.sql("SELECT vector_mean(v) AS m FROM vm GROUP BY g")
      .as[Seq[Double]].head()
    assert(m === Seq(2.0, 4.0))
    // the fused rounded variant: round(v[i]*0.5, 1) -> (0.5,1.5)+(1.5,2.5)
    val mr = spark.sql(
      "SELECT vector_mean_rounded(v, 0.5, 1) AS m FROM vm GROUP BY g")
      .as[Seq[Double]].head()
    assert(mr === Seq(1.0, 2.0))
    // a non-literal stride must fail fast with the right position named
    val err = intercept[Exception] {
      spark.sql("SELECT window_hashes('ab', 2, length('x')) AS (p, h)")
        .collect()
    }
    assert(err.getMessage.contains("third argument"), err.getMessage)
  }

  test("bpe_encode is callable from SQL with a foldable merge table") {
    val toks = spark.sql(
      """SELECT bpe_encode('hugs',
        |  array(array('u','g'), array('h','ug'))) AS t""".stripMargin)
      .head().getSeq[String](0)
    assert(toks === Seq("hug", "s"))
    // a non-foldable merge table must fail fast
    val err = intercept[Exception] {
      spark.sql("""SELECT bpe_encode(s, array(array(s, s))) AS t
                  |FROM (SELECT 'x' AS s)""".stripMargin).collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("py_to_json of a literal is constant-folded by Catalyst") {
    val df = spark.sql("SELECT py_to_json(\"{'x': None}\") AS j")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("""{"x":null}"""),
      s"literal should fold at optimization time:\n$optimized")
  }
}
