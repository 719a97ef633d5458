package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col)` against a BROADCAST
  * `org.apache.spark.util.sketch.BloomFilter` — the codegen'd
  * replacement for the scalar-UDF probe `Sketches.bloomPreFilter` used
  * to carry. Spark's built-in `might_contain` expression only accepts
  * the `bloom_filter_agg` sketch binary, so a filter built through
  * `DataFrameStatFunctions.bloomFilter` (which hashes integral columns
  * via putLong and strings via their UTF-8 bytes) needs its own probe;
  * the UDF form paid per-row boxing AND fell out of whole-stage codegen,
  * splitting the scan pipeline at exactly the operator whose point is
  * to be a free map-side pre-filter.
  *
  * Semantics (identical to the UDF): NULL input → false (a null is
  * never "maybe present"); strings probe `mightContainBinary` on their
  * UTF-8 bytes — bit-for-bit what `mightContainString` hashes, without
  * materializing a java.lang.String per row; longs probe
  * `mightContainLong` unboxed. The broadcast VALUE is fetched once per
  * task in codegen (a mutable-state init), never per row. */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string or bigint probe (the two key " +
        s"families DataFrameStatFunctions.bloomFilter hashes), got " +
        s"${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && (child.dataType match {
      case StringType =>
        bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case _ => bloom.value.mightContainLong(v.asInstanceOf[Long])
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBcast", bloom,
      classOf[Broadcast[_]].getName)
    // broadcast value resolved ONCE per task (mutable-state init), so the
    // per-row code is a single virtual call on a local field
    val bf = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    val c = child.genCode(ctx)
    val probe = child.dataType match {
      case StringType => s"$bf.mightContainBinary(${c.value}.getBytes())"
      case _ => s"$bf.mightContainLong(${c.value})"
    }
    ev.copy(
      code = code"""
        |${c.code}
        |boolean ${ev.value} = false;
        |if (!${c.isNull}) { ${ev.value} = $probe; }""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  /** Column API: `bloom_might_contain($"k", bcastFilter)`. */
  def bloom_might_contain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}
