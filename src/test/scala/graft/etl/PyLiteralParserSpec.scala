package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PyLiteralParserSpec extends AnyFunSuite {

  test("corpus-shaped event array") {
    val in = "[{'createdAt': {'$date': 1689856037000}, 'trackingCode': 'abc', " +
      "'status': None, 'description': 'EMISSAO', 'from': 'x', 'to': 'y'}]"
    val out = PyLiteralParser.toJson(in)
    assert(out ===
      """[{"createdAt":{"$date":1689856037000},"trackingCode":"abc",""" +
        """"status":null,"description":"EMISSAO","from":"x","to":"y"}]""")
  }

  test("empty list, empty dict, nested") {
    assert(PyLiteralParser.toJson("[]") === "[]")
    assert(PyLiteralParser.toJson("{}") === "{}")
    assert(PyLiteralParser.toJson("[[1, 2], {'a': []}]") === """[[1,2],{"a":[]}]""")
  }

  test("scalars") {
    assert(PyLiteralParser.toJson("None") === "null")
    assert(PyLiteralParser.toJson("True") === "true")
    assert(PyLiteralParser.toJson("False") === "false")
    assert(PyLiteralParser.toJson("-42") === "-42")
    assert(PyLiteralParser.toJson("3.14") === "3.14")
    assert(PyLiteralParser.toJson("1e-3") === "1e-3")
  }

  test("quotes and escapes") {
    assert(PyLiteralParser.toJson("'it\\'s'") === "\"it's\"")
    assert(PyLiteralParser.toJson("\"double\"") === "\"double\"")
    assert(PyLiteralParser.toJson("'has \"json\" quote'") === "\"has \\\"json\\\" quote\"")
    assert(PyLiteralParser.toJson("'tab\\there'") === "\"tab\\there\"")
  }

  test("unicode passthrough") {
    assert(PyLiteralParser.toJson("'Objeto está à caminho'") === "\"Objeto está à caminho\"")
  }

  test("malformed input returns null, never throws") {
    for (bad <- Seq("", "[", "{'a'}", "{'a': }", "[1,]", "nope", "[1] trailing", "'unterminated"))
      assert(PyLiteralParser.toJson(bad) === null, s"input: $bad")
  }

  test("round-trip property: generated literals parse to valid JSON") {
    val strGen = Gen.alphaNumStr.map(s => s.take(12))
    def valueGen(depth: Int): Gen[(String, String)] =
      if (depth == 0) Gen.oneOf(
        Gen.choose(-1000000L, 1000000L).map(n => (n.toString, n.toString)),
        strGen.map(s => (s"'$s'", s""""$s"""")),
        Gen.const(("None", "null")))
      else Gen.oneOf(
        valueGen(0),
        Gen.listOfN(3, valueGen(depth - 1)).map { xs =>
          (xs.map(_._1).mkString("[", ", ", "]"), xs.map(_._2).mkString("[", ",", "]"))
        },
        Gen.listOfN(3, Gen.zip(strGen, valueGen(depth - 1))).map { kvs =>
          val uniq = kvs.distinctBy(_._1)
          (uniq.map { case (k, (p, _)) => s"'$k': $p" }.mkString("{", ", ", "}"),
            uniq.map { case (k, (_, j)) => s""""$k":$j""" }.mkString("{", ",", "}"))
        })
    val prop = Prop.forAll(valueGen(3)) { case (py, json) =>
      PyLiteralParser.toJson(py) == json
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
