package graft.operators

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared machinery for the size-gated driver-local iteration lanes
  * (the [[Graph]] powerIterate / kCore pattern, round 14): a bounded
  * edge/feature relation is collected once and the per-round loop runs
  * as plain JVM code instead of ~8 Spark jobs per round. Every lane
  * SIMULATES its distributed twin round for round — same per-round
  * values, same convergence checks, same loud non-convergence throws —
  * so the two lanes are observationally identical (spec-gated per
  * lane); `graft.localIterate = false` is the A/B kill-switch.
  *
  * [[cmp]] mirrors Spark's ordering for the vertex-id types the lanes
  * admit: integral types by numeric value, strings by UTF8 binary
  * comparison (Spark's `least`/`min` on StringType compares UTF8String
  * bytes unsigned — Java String.compareTo differs outside ASCII, so the
  * lane goes through UTF8String). A type without a mirrored ordering
  * returns null and the caller stays on the distributed path.
  */
private[operators] object LocalIter {

  /** Spark-identical comparator for lane-admissible key types, or null
    * (caller must fall back to the distributed lane). */
  def cmp(dt: DataType): (Any, Any) => Int = dt match {
    case LongType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => (a, b) =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => (a, b) =>
      java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case ByteType => (a, b) =>
      java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case StringType => (a, b) =>
      UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case _ => null
  }

  /** Dense int index over collected vertex ids (insertion order). */
  final class VertexIndex {
    private val idx = new java.util.HashMap[Any, Integer]()
    val ids = new scala.collection.mutable.ArrayBuffer[Any]()
    def apply(a: Any): Int = {
      var i = idx.get(a)
      if (i == null) {
        i = Integer.valueOf(ids.length); idx.put(a, i); ids += a
      }
      i.intValue()
    }
    def get(a: Any): Int = { // -1 when absent (no insertion)
      val i = idx.get(a); if (i == null) -1 else i.intValue()
    }
    def size: Int = ids.length
  }
}
