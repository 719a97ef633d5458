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

  test("py_to_json of a literal is constant-folded by Catalyst") {
    val df = spark.sql("SELECT py_to_json(\"{'x': None}\") AS j")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("""{"x":null}"""),
      s"literal should fold at optimization time:\n$optimized")
  }
}
