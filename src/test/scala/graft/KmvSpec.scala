package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom distributed sketch aggregate (SURVEY §2.3 L15). */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("L15: KMV estimate within 10% of exact distinct; exact below k") {
    val li = Tables.lineitem(spark, dir)
    val r = li.agg(
      KmvSketch.kmvDistinct(xxhash64(col("l_partkey")), 1024).as("est"),
      countDistinct(col("l_partkey")).as("exact")).first()
    val (est, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(est - exact).toDouble / exact < 0.10, s"est=$est exact=$exact")
    // below k the sketch is exact
    val small = li.filter(col("l_suppkey") <= 10).agg(
      KmvSketch.kmvDistinct(xxhash64(col("l_suppkey")), 1024).as("est"),
      countDistinct(col("l_suppkey")).as("exact")).first()
    assert(small.getLong(0) == small.getLong(1))
  }

  test("L15b: sketch merges across groups and partitions consistently") {
    val li = Tables.lineitem(spark, dir).repartition(16)
    val grouped = li.groupBy("l_returnflag")
      .agg(KmvSketch.kmvDistinct(xxhash64(col("l_partkey")), 1024).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact)
      assert(math.abs(grouped(k) - e).toDouble / e < 0.12, s"$k: ${grouped(k)} vs $e")
  }
}
