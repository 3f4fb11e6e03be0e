package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-frequency statistics in ONE pass over the
  * text: `struct(coll = Σ_c cnt_c·(cnt_c−1), n = code-point count,
  * dchars = distinct code points)`. `coll / (n·(n−1))` is the
  * character collision probability (the Rényi-2 / Simpson diversity
  * index) — a quality gate that flags low-entropy junk (aaaaa…,
  * base64 walls, template spam) without the cross-engine float-log
  * hazards of Shannon entropy: every component here is an exact
  * integer, so per-language pooled ratios are bit-reproducible against
  * the DuckDB oracle under any partitioning.
  *
  * A native Catalyst expression (codegen'd single pass, no shuffle):
  * the explode→groupBy(doc, char) formulation shuffles every character
  * of the corpus — at 100 TB that is a full-corpus exchange for a
  * per-row scalar. Counts use a 128-slot ASCII array with a map
  * fallback for higher code points.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("coll", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("dchars", IntegerType, nullable = false)))

  override def prettyName: String = "char_stats"

  override def nullSafeEval(input: Any): Any =
    CharStatsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharStatsImpl$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStatsImpl {
  /** Single pass over Unicode code points (not UTF-16 units), so the
    * DuckDB oracle's character-indexed substr() mirrors exactly even
    * for supplementary-plane text. */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val ascii = new Array[Long](128)
    var other: scala.collection.mutable.LongMap[Long] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new scala.collection.mutable.LongMap[Long]()
        other(cp.toLong) = other.getOrElse(cp.toLong, 0L) + 1L
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var coll = 0L
    var d = 0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0L) { d += 1; coll += c * (c - 1L) }
      j += 1
    }
    if (other != null) other.foreachValue { c => d += 1; coll += c * (c - 1L) }
    InternalRow(coll, n, d)
  }
}

object CharStatsExpr {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  def charStats(c: Column): Column = column(CharStats(expression(c)))
}
