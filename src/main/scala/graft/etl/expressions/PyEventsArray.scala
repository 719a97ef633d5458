package graft.etl.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{PyLiteralParser, Schemas}
import graft.etl.PyLiteralParser.{Malformed, PyDict, PyNum}

/** Fused Python-literal → typed event array: parses the CDC cell straight
  * into `Schemas.eventArray` rows, replacing the two-pass
  * `from_json(py_to_json(col))` pipeline which materializes an
  * intermediate JSON string per cell and re-tokenizes it with Jackson.
  * One recursive-descent pass builds the `InternalRow`s directly.
  *
  * Coercion contract (PERMISSIVE-equivalent, spec-asserted cell-by-cell
  * against the two-pass form in PyEventsArraySpec — every rule below was
  * MEASURED against from_json, not assumed):
  *   - malformed literal (incl. JSON-invalid numbers like `0123`/`1.`),
  *     a scalar root, or a scalar array ELEMENT → the WHOLE cell is null;
  *   - a bare dict at the root parses as a one-element array (Jackson's
  *     object-as-array compatibility);
  *   - FIELD-level type mismatches null the field, not the cell: a
  *     scalar `createdAt`, a non-integral or out-of-range `$date`;
  *   - `None` element → null element; missing fields → null fields;
  *     unknown fields ignored;
  *   - string fields coerce: integers via parsed-long text, floats via
  *     parsed-double rendering (`1e-3` → "0.001", as Jackson re-renders),
  *     booleans to true/false, nested dicts/lists to canonical JSON text.
  */
case class PyEventsArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Schemas.eventArray
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"py_events expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PyEventsArray.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("evArr")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.etl.expressions.PyEventsArray.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PyEventsArray =
    copy(child = newChild)
}

object PyEventsArray {

  private val fieldNames: Array[String] =
    Schemas.eventElement.fields.map(_.name)

  /** Static so generated code calls it directly. Returns null (cell-level)
    * on malformed input or any schema mismatch. */
  def parse(u: UTF8String): ArrayData = {
    PyLiteralParser.parseTree(u.toString) match {
      case Malformed => null
      case l: java.util.ArrayList[_] => rows(l.asInstanceOf[java.util.ArrayList[AnyRef]])
      case m: PyDict =>
        val one = new java.util.ArrayList[AnyRef](1)
        one.add(m)
        rows(one)
      case _ => null // scalar root is not an event array
    }
  }

  private def rows(l: java.util.ArrayList[AnyRef]): ArrayData = {
    val out = new Array[Any](l.size)
    var i = 0
    while (i < l.size) {
      l.get(i) match {
        case null => out(i) = null
        case m: PyDict => out(i) = element(m)
        case _ => return null // scalar array element nullifies the cell
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One event struct; field-level mismatches null the FIELD. */
  private def element(m: PyDict): GenericInternalRow = {
    val vals = new Array[Any](fieldNames.length)
    var i = 0
    while (i < fieldNames.length) {
      val name = fieldNames(i)
      if (i == 0) {
        // createdAt: struct<$date: long>, occurrence-wise like Jackson's
        // per-occurrence writes (MEASURED): a null or object occurrence
        // REPLACES the field (an object's failed inner $date yields
        // struct(null)), a scalar occurrence FAILS and keeps the prior
        // value; inside the object, '$date' follows the same rule.
        var created: Any = null
        val occ = m.occurrences(name)
        var j = 0
        while (j < occ.size) {
          occ.get(j) match {
            case null => created = null
            case inner: PyDict =>
              var date: Any = null
              val dOcc = inner.occurrences("$date")
              var k = 0
              while (k < dOcc.size) {
                dOcc.get(k) match {
                  case null => date = null
                  case n @ PyNum(t) if n.isIntegral =>
                    try date = java.lang.Long.parseLong(t)
                    catch { case _: NumberFormatException => () } // keep prior
                  case _ => () // failed conversion keeps the prior value
                }
                k += 1
              }
              created = new GenericInternalRow(Array[Any](date))
            case _ => () // scalar occurrence fails; prior value survives
          }
          j += 1
        }
        vals(0) = created
      } else {
        // string fields: scalars → Jackson-rendered text, containers →
        // Jackson-rendered JSON text (shared helper — see
        // PyLiteralParser.jacksonNumberText for the float/Infinity rules).
        // Every coercion succeeds, so plain last-occurrence lookup works.
        vals(i) = m.get(name) match {
          case null => null
          case s: String => UTF8String.fromString(s)
          case n: PyNum =>
            UTF8String.fromString(PyLiteralParser.jacksonNumberText(n))
          case b: java.lang.Boolean =>
            UTF8String.fromString(if (b) "true" else "false")
          case other =>
            UTF8String.fromString(PyLiteralParser.treeToJson(other))
        }
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Column API: `py_events($"array_trackingEvents")`. */
  def pyEvents(c: Column): Column =
    ColumnBridge.column(PyEventsArray(ColumnBridge.expression(c)))
}
