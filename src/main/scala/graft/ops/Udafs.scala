package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface (SURVEY.md §2.11): the one custom-UDAF
  * shape the engine needs that no builtin covers deterministically.
  *
  * `min_by`/`first(over window)` both pick a representative row, but
  * the builtin `min_by` is nondeterministic under ties and the window
  * form pays a per-group SORT for what is really a single running
  * minimum. [[argMinBy]] is the partial-aggregable form: O(1) state,
  * map-side combined before the shuffle (the same plan shape as any
  * sum), ties impossible when the id is unique and broken toward the
  * smaller id regardless. */
object Udafs {

  /** (best id so far, its value, whether any row was seen). The
    * explicit flag — NOT an id sentinel — means a genuine row with
    * id == Long.MaxValue is still representable and never dropped. */
  case class ArgMinBuf(id: Long, v: String, seen: Boolean)

  /** Value of the row with the SMALLEST id — deterministic arg-min. */
  object ArgMinAgg extends Aggregator[(Long, String), ArgMinBuf, String] {
    override def zero: ArgMinBuf = ArgMinBuf(0L, null, seen = false)
    override def reduce(b: ArgMinBuf, a: (Long, String)): ArgMinBuf =
      if (!b.seen || a._1 < b.id) ArgMinBuf(a._1, a._2, seen = true) else b
    override def merge(x: ArgMinBuf, y: ArgMinBuf): ArgMinBuf =
      if (!y.seen) x
      else if (!x.seen) y
      else if (x.id <= y.id) x else y
    override def finish(r: ArgMinBuf): String = r.v
    override def bufferEncoder: Encoder[ArgMinBuf] = Encoders.product
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  private lazy val argMinUdaf = udaf(ArgMinAgg)

  /** Column form: `argMinBy(idCol, valueCol)` — usable in any agg. */
  def argMinBy(id: Column, value: Column): Column = argMinUdaf(id, value)
}
