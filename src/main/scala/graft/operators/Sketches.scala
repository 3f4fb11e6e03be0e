package graft.operators

import graft.{QDef, Tables => T}
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY §2.3 L15): mergeable small-state summaries —
  * the 100 TB answer to COUNT(DISTINCT): k longs per group cross the
  * shuffle instead of every key. Rows-only (the estimate is ours, not
  * SQL-standard); KmvSpec bounds the error against exact counts.
  */
object Sketches {
  val defs: Seq[QDef] = Seq(
    QDef(
      "q_sketch_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            KmvSketch.kmvDistinct(xxhash64(col("l_partkey")), 1024).as("approx_parts"),
            KmvSketch.kmvDistinct(xxhash64(col("l_suppkey")), 1024).as("approx_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      None)
  )
}
