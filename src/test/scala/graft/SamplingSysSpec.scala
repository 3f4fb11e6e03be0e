package graft

import graft.functions.PolyHash64Impl
import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S69: TABLESAMPLE SYSTEM (ref TestPrestoITCase :109/:1114)
  * — file/partition-granular deterministic sampling served from the
  * MANIFEST. q_sample_system oracle-gates the partition-keyed rule; this
  * spec pins the faces the oracle can't: the 0%/100% boundaries, the
  * file-path-keyed mode's exact kept set and determinism, composition
  * with partition pruning, and the aggregate-pushdown decline. */
class SamplingSysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // replicated (not called) so the spec doubles as a drift guard on the
  // published rule: poly fold, Fibonacci mix, top-bits bucket
  private def keep(key: String, bps: Int): Boolean = {
    val h = PolyHash64Impl.hash(UTF8String.fromString(key), 31L, 1000000007L)
    ((h * 2654435761L) % 4294967296L) * 10000L / 4294967296L < bps
  }

  private def mkTable(prefix: String): GraftTable = {
    val df = (0 until 4000).map(i => (i.toLong, s"g${i % 20}", i * 1.5))
      .toDF("id", "g", "v").repartition(16)
    // this spec DELIBERATELY builds a 16-file layout (file-granular
    // sampling needs many files) — opt out of the r19 small-append
    // coalesce, which would fold the tiny frame into one file
    val t = GraftTable.create(spark, TestSpark.tmpDir(prefix), df.schema,
      options = Map("write.small-file-coalesce" -> "false"))
    t.append(df)
    t
  }

  private def sampled(t: GraftTable, pct: String, more: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft").option("sample-system", pct)
    more.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(t.root)
  }

  test("S69a: boundary faces — 0% scans nothing, 100% is the identity") {
    val t = mkTable("samp-bound")
    assert(sampled(t, "0").count() == 0L)
    assert(sampled(t, "100").count() == 4000L)
    assert(sampled(t, "100").agg(sum("id")).head.getLong(0) ==
      t.read().agg(sum("id")).head.getLong(0))
  }

  test("S69b: path-keyed sampling keeps EXACTLY the files whose path-hash clears the rule, deterministically") {
    val t = mkTable("samp-path")
    val files = t.system("files").select("file_path").as[String].collect().toSeq
    assert(files.size == 16, s"expected 16 files, got ${files.size}")
    val expectedKept = files.filter(keep(_, 5000)).toSet
    // at least one kept and one dropped, or the assertion is vacuous
    assert(expectedKept.nonEmpty && expectedKept.size < files.size)
    // the sampled scan reads exactly the expected files (observed via
    // the _file metadata column), twice — deterministic, not a coin flip
    def readKept(): Set[String] =
      sampled(t, "50").select(col("_file")).distinct().as[String].collect().toSet
    val got = readKept()
    assert(got == expectedKept,
      "kept files must be the manifest-hash rule's subset")
    assert(readKept() == got)
    // row content = union of kept files' rows (_file is a V2 metadata
    // column — resolve it through the format("graft") relation)
    val wantRows = spark.read.format("graft").load(t.root)
      .select(col("id"), col("_file").as("f"))
      .filter(col("f").isin(got.toSeq: _*)).count()
    assert(sampled(t, "50").count() == wantRows)
  }

  test("S69c: partition-keyed sampling composes with partition pruning") {
    val df = (0 until 2000).map(i => (i.toLong, s"p${i % 10}", i * 2.0))
      .toDF("id", "p", "v").repartition(8)
    val t = GraftTable.create(spark, TestSpark.tmpDir("samp-part"), df.schema,
      partitionKeys = Seq("p"))
    t.append(df)
    val evenParts = (0 until 10 by 2).map(i => s"p$i")
    val got = spark.read.format("graft")
      .option("sample-system", "40").option("sample-key", "partition")
      .load(t.root)
      .filter(col("p").isin(evenParts: _*)) // partition pruning first
      .select("p").distinct().as[String].collect().toSet
    val want = evenParts.filter(p => keep(s"p=$p", 4000)).toSet
    assert(got == want, "sample must thin exactly the pruned survivor partitions")
    assert(want.nonEmpty && want.size < evenParts.size, "vacuous-face guard")
  }

  test("S69d: sampling declines manifest aggregate pushdown (counts reflect the sample)") {
    val t = mkTable("samp-agg")
    val plan = sampled(t, "50").groupBy().count().queryExecution.executedPlan.toString
    assert(!plan.contains("GraftManifestAgg"),
      s"sampled scan must not answer aggregates from full manifests:\n$plan")
    val files = t.system("files").select("file_path").as[String].collect().toSeq
    val keptNames = files.filter(keep(_, 5000)).toSet
    val want = spark.read.format("graft").load(t.root)
      .select(col("id"), col("_file").as("f"))
      .filter(col("f").isin(keptNames.toSeq: _*)).count()
    assert(sampled(t, "50").count() == want)
  }

  test("S69e: an out-of-range percent and an unknown key mode fail loudly") {
    val t = mkTable("samp-err")
    intercept[IllegalArgumentException] { sampled(t, "101").collect() }
    intercept[Exception] {
      sampled(t, "50", Map("sample-key" -> "bogus")).collect()
    }
    // partition mode on an unpartitioned table is a contract violation
    intercept[Exception] {
      sampled(t, "50", Map("sample-key" -> "partition")).collect()
    }
  }
}
