package graft.etl

import org.apache.spark.sql.functions.{col, from_json}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.etl.expressions.{PyEventsArray, PyLiteralToJson}

/** The fused literal→struct parser must be indistinguishable from the
  * two-pass `from_json(py_to_json(col))` pipeline it replaced — on
  * corpus-shaped input, on every edge shape, and on garbage. */
class PyEventsArraySpec extends SparkSpec {
  import spark.implicits._

  private def compare(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("s")
    val both = df.select(
      PyEventsArray.pyEvents($"s").as("fused"),
      from_json(PyLiteralToJson.pyToJson($"s"), Schemas.eventArray)
        .as("twoPass"))
    val diff = both.filter(
      !($"fused" <=> $"twoPass")) // null-safe struct-array compare
    val bad = diff.collect()
    assert(bad.isEmpty,
      s"fused/two-pass divergence on:\n${bad.take(5).mkString("\n")}")
  }

  test("corpus-shaped events, edge shapes, and garbage all agree") {
    compare(Seq(
      // the real shape
      "[{'createdAt': {'$date': 1689856037000}, 'trackingCode': 'abc', " +
        "'status': '01', 'description': 'Objeto postado', " +
        "'trackerType': 'correios', 'from': 'SP', 'to': 'RJ'}]",
      // several elements, missing fields, extra fields, None values
      "[{'trackingCode': 'x'}, {'status': None, 'unknown_field': 7}]",
      "[]",
      "[None]",
      "[{'createdAt': None, 'from': 'a'}]",
      "[{'createdAt': {}}]",
      // escapes + unicode + quotes
      "[{'description': 'it\\'s \"quoted\" and está à caminho'}]",
      "[{'description': 'tab\\there'}]",
      // scalar coercions into string fields (Jackson re-renders numbers)
      "[{'status': 123, 'description': True, 'from': 1e-3, 'to': -4.5}]",
      "[{'status': 1e400, 'from': -1e400}]", // overflow → quoted Infinity
      "[{'status': 99999999999999999999999}]", // BigInteger rendering
      // nested containers into string fields (Jackson re-rendered JSON)
      "[{'description': {'a': [1, 2]}, 'to': ['x', None]}]",
      "[{'description': {'a': 1.50, 'b': 1e-3, 'c': -0}}]",
      "[{'description': {'a': 1, 'a': 2}}]", // duplicate keys preserved
      "[{'description': ['line\\nbreak', 'tab\\there']}]",
      // duplicate keys at the event level (last occurrence wins)
      "[{'status': 'first', 'status': 'second'}]",
      "[{'status': 'first', 'status': None}]",
      // duplicate keys where the LATER occurrence fails conversion — the
      // earlier value survives (Jackson writes per occurrence); an object
      // occurrence always replaces, even with a failed inner $date
      "[{'createdAt': {'$date': 5}, 'createdAt': 'oops'}]",
      "[{'createdAt': {'$date': 5}, 'createdAt': {'$date': 'x'}}]",
      "[{'createdAt': {'$date': 5, '$date': 'x'}}]",
      "[{'createdAt': {'$date': 'x', '$date': 5}}]",
      "[{'createdAt': 'oops', 'createdAt': {'$date': 5}}]",
      "[{'createdAt': {'$date': 5}, 'createdAt': None}]",
      // dict at root (object-as-array compatibility)
      "{'trackingCode': 'solo'}",
      // field-level mismatches (null the field, keep the row)
      "[{'createdAt': {'$date': 'not-a-number'}}]",
      "[{'createdAt': {'$date': 3.5}}]",
      "[{'createdAt': {'$date': True}}]",
      "[{'createdAt': {'$date': {'x': 1}}}]",
      "[{'createdAt': {'$date': 99999999999999999999999}}]",
      "[{'createdAt': 'scalar'}]",
      "[{'createdAt': 42}]",
      "[{'createdAt': True}]",
      "[{'createdAt': [1]}]",
      "[{'status': 99999999999999999999999}]",
      // cell-level mismatches (whole result null)
      "[1, 2, 3]",
      "'just a string'",
      "42",
      // JSON-invalid numbers anywhere nullify the cell (Jackson would
      // reject the two-pass intermediate)
      "[{'status': 0123}]",
      "[{'createdAt': {'$date': 0123}}]",
      "[{'unknown': 01}]",
      "[{'status': 1.}]",
      // malformed
      "", "[", "{'a'}", "[{]", "nope", "[1] trailing"))
  }

  test("property: random corpus-shaped literals agree between the two parsers") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(10)),
      Gen.const("está à caminho"),
      Gen.const("with 'quote'"))
    val fieldGen: Gen[(String, String)] = for {
      name <- Gen.oneOf("trackingCode", "status", "description",
        "trackerType", "from", "to", "extra")
      value <- Gen.oneOf(
        strGen.map(s => s"'${s.replace("\\", "").replace("'", "")}'"),
        Gen.const("None"),
        Gen.choose(-999999L, 999999L).map(_.toString),
        // floats (incl. exponent spellings Jackson re-renders)
        Gen.oneOf("3.25", "-0.5", "1e-3", "2.5e2", "123.456"),
        // nested containers (coerced to Jackson-rendered JSON text)
        Gen.oneOf("{'k': 1.5}", "[1, 2.5, None]", "{'a': {'b': 'c'}}"))
    } yield (name, value)
    val eventGen: Gen[String] = for {
      fields <- Gen.listOfN(4, fieldGen)
      date <- Gen.option(Gen.choose(0L, 1999999999999L))
    } yield {
      val uniq = fields.distinctBy(_._1)
      val datePart = date.map(d => s"'createdAt': {'$$date': $d}").toList
      (datePart ++ uniq.map { case (k, v) => s"'$k': $v" })
        .mkString("{", ", ", "}")
    }
    val cellGen: Gen[String] =
      Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, eventGen).map(_.mkString("[", ", ", "]")))
    val samples = Gen.listOfN(120, cellGen).sample.getOrElse(Seq.empty)
    assert(samples.nonEmpty)
    compare(samples)
    // also run through scalacheck shrinking for single cells
    val prop = Prop.forAll(cellGen) { cell =>
      val df = Seq(cell).toDF("s")
      df.select(
        (PyEventsArray.pyEvents(col("s")) <=>
          from_json(PyLiteralToJson.pyToJson(col("s")), Schemas.eventArray))
          .as("eq")).head().getBoolean(0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
