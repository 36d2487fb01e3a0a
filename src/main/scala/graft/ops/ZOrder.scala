package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering —
  * the layout technique behind "OPTIMIZE ZORDER BY" in lakehouse engines:
  * sort (or range-partition) a table by the bit-interleave of two
  * bucketed dimensions and every file's min/max footer stats become
  * NARROW in BOTH dimensions, so a two-column box predicate prunes row
  * groups/files that a single-column sort could only prune on its lead
  * column. At 100 TB this is the difference between scanning one
  * dimension's stripe and scanning a small rectangle.
  *
  * The interleave is pure integer shift/or arithmetic (codegen-friendly,
  * engine-portable — the DuckDB oracle derives the same value with
  * division/modulo) and monotone in each dimension holding the other
  * fixed. Inputs MUST be non-negative and clamped below 2^bits by the
  * caller: on negative inputs the shift form and the div/mod form
  * DISAGREE (arithmetic shift yields 1-bits where `%` yields −1), so
  * every call site buckets through greatest/least/pmod first — see
  * `RelationalQueries.zorderBucketed`. */
object ZOrder {

  /** Interleave the low `bits` of two non-negative int columns:
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y. */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The same interleave as SQL over column names — generated from the
    * identical loop so the two sides cannot drift. Division/modulo/
    * multiplication only (no bit operators); the integer-division
    * spelling differs per engine (`DIV` in Spark SQL, `//` in DuckDB),
    * so it is a parameter. A spec pins `zvalueSql(…, "DIV")` evaluated
    * by Spark equal to [[zvalue]]. */
  def zvalueSql(x: String, y: String, bits: Int, divOp: String): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Test-side inverse: recover (x, y) from a z-value. */
  def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    for (i <- 0 until bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }
}
