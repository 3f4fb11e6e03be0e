package graft

import graft.sources.GraftTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 S6 (time travel), S7 (PK merge-on-read), audit log.
  * Semantics mirror the reference's PK tables with the deduplicate merge
  * engine + sequence fields (ref: TestPrestoITCase.java:91-96 — insert
  * then RowKind.DELETE row drops it from the read).
  */
class MergeOnReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("v", StringType),
    StructField("seq", LongType)))

  private def pkTable(name: String, opts: Map[String, String] = Map.empty) =
    GraftTable.create(spark, TestSpark.tmpDir(name), schema,
      primaryKeys = Seq("k"), options = opts)

  test("S7: upsert keeps the latest version per key; delete removes") {
    val t = pkTable("mor")
    t.upsert(Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "seq"))
    t.upsert(Seq((1, "a2", 2L), (3, "c", 2L)).toDF("k", "v", "seq"))
    t.delete(Seq((2, "b", 3L)).toDF("k", "v", "seq"))
    val rows = t.read().orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a2"), (3, "c")))
  }

  test("S7b: within-batch dedup honors sequence.field, not arrival order") {
    val t = pkTable("seqf", Map("sequence.field" -> "seq"))
    // same key twice in one batch, larger seq first in the df
    t.upsert(Seq((1, "new", 10L), (1, "old", 5L)).toDF("k", "v", "seq"))
    assert(t.read().collect().map(_.getString(1)).toSeq == Seq("new"))
    // a later commit with a SMALLER sequence.field must NOT win
    t.upsert(Seq((1, "stale", 3L)).toDF("k", "v", "seq"))
    assert(t.read().collect().map(_.getString(1)).toSeq == Seq("new"))
  }

  test("S6: time travel reads the table as of an older snapshot (scan_version)") {
    val t = pkTable("tt")
    val s1 = t.upsert(Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "seq"))
    val s2 = t.upsert(Seq((1, "a2", 2L)).toDF("k", "v", "seq"))
    assert(t.read(snapshotId = Some(s1)).orderBy("k").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(t.read(snapshotId = Some(s2)).orderBy("k").collect().map(_.getString(1)).toSeq == Seq("a2", "b"))
  }

  test("audit_log exposes rowkind + sequence for every version") {
    val t = pkTable("audit")
    t.upsert(Seq((1, "a", 1L)).toDF("k", "v", "seq"))
    t.delete(Seq((1, "a", 2L)).toDF("k", "v", "seq"))
    val log = t.system("audit_log").orderBy("seq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(log.toSeq == Seq(("+I", 1L), ("-D", 2L)))
    assert(t.read().count() == 0)
  }

  test("audit_log with lookup changelog-producer shows the full RowKind lattice") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("auditfull"),
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType),
        StructField("seq", LongType))),
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "changelog-producer" -> "lookup"))
    t.upsert(Seq((1, "a", 1L)).toDF("k", "v", "seq"))
    t.upsert(Seq((1, "a2", 2L)).toDF("k", "v", "seq"))
    val log = t.system("audit_log").orderBy("commit_seq", "rowkind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3)))
    assert(log.toSeq == Seq(("+I", 1L, "a"), ("+U", 2L, "a2"), ("-U", 2L, "a")))
    assert(t.read().collect().map(_.getString(1)).toSeq == Seq("a2"))
  }

  test("lookup producer: a losing (stale) upsert emits NO changelog and leaves state unchanged") {
    val t = GraftTable.create(spark, TestSpark.tmpDir("auditstale"),
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType),
        StructField("seq", LongType))),
      primaryKeys = Seq("k"),
      options = Map("sequence.field" -> "seq", "changelog-producer" -> "lookup"))
    t.upsert(Seq((1, "new", 5L)).toDF("k", "v", "seq"))
    t.upsert(Seq((1, "stale", 3L)).toDF("k", "v", "seq")) // loses the merge
    // no -U/+U pair for the no-op commit: a CDC consumer applying the
    // log must end at the same state the table reads
    val log = t.system("audit_log").collect().map(r => (r.getString(0), r.getString(3)))
    assert(log.toSeq == Seq(("+I", "new")))
    assert(t.read().collect().map(_.getString(1)).toSeq == Seq("new"))
    // and a WINNING second update still emits the pair
    t.upsert(Seq((1, "newer", 7L)).toDF("k", "v", "seq"))
    val log2 = t.system("audit_log").orderBy("commit_seq", "rowkind").collect()
      .map(r => (r.getString(0), r.getString(3)))
    assert(log2.toSeq == Seq(("+I", "new"), ("+U", "newer"), ("-U", "new")))
  }

  test("compact materializes the merge and preserves the merged result") {
    val t = pkTable("compact")
    t.upsert(Seq((1, "a", 1L), (2, "b", 1L)).toDF("k", "v", "seq"))
    t.upsert(Seq((1, "a2", 2L)).toDF("k", "v", "seq"))
    t.delete(Seq((2, "b", 3L)).toDF("k", "v", "seq"))
    val before = t.read().orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    t.compact()
    assert(t.snapshots.last.commitKind == "COMPACT")
    val after = t.read().orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(after == before && after == Seq((1, "a2")))
    // compaction shrank the live file set to the merged state
    assert(t.system("audit_log").count() == 1)
  }
}
