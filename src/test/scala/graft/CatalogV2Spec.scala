package graft

import org.scalatest.funsuite.AnyFunSuite

/** V2 catalog plugin: the `graft.db.t` SQL surface (DDL + DML + time
  * travel) mirroring the reference connector's Presto catalog
  * (ref: TestPrestoITCase.java's `paimon.default.t1` queries). */
class CatalogV2Spec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft2", "graft.sources.GraftSparkCatalog")
    s.conf.set("spark.sql.catalog.graft2.warehouse", TestSpark.tmpDir("catv2-wh"))
    s
  }

  private def sql(q: String) = spark.sql(q)

  test("C1: namespace + table DDL, INSERT, SELECT, SHOW") {
    sql("CREATE NAMESPACE graft2.db1")
    sql("CREATE TABLE graft2.db1.t (k INT, v STRING) PARTITIONED BY (v)")
    sql("INSERT INTO graft2.db1.t VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft2.db1.t VALUES (3, 'a')")
    assert(sql("SELECT sum(k) FROM graft2.db1.t WHERE v = 'a'").first().getLong(0) == 4L)
    assert(sql("SHOW TABLES IN graft2.db1").collect().map(_.getString(1)).toSeq == Seq("t"))
    assert(sql("SHOW NAMESPACES IN graft2").collect().map(_.getString(0)).contains("db1"))
  }

  test("C18: avro-format tables work end-to-end through the SQL catalog (S54)") {
    sql("CREATE NAMESPACE graft2.db18")
    sql("""CREATE TABLE graft2.db18.av (k INT, v STRING)
          |TBLPROPERTIES ('file.format'='avro')""".stripMargin)
    sql("INSERT INTO graft2.db18.av VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft2.db18.av VALUES (3, 'c')")
    assert(sql("SELECT count(*) FROM graft2.db18.av").first().getLong(0) == 3L)
    assert(sql("SELECT v FROM graft2.db18.av WHERE k = 2").first().getString(0) == "b")
    // files on disk really are avro containers
    val t = graft.sources.GraftTable.load(spark,
      sql("SHOW TBLPROPERTIES graft2.db18.av").collect()
        .find(_.getString(0) == "path").map(_.getString(1))
        .getOrElse(spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/db18.db/av"))
    assert(t.currentFiles(None).forall(_.path.endsWith(".avro")))
    // avro PK table: SQL upsert + MOR read
    sql("""CREATE TABLE graft2.db18.avpk (k INT, v STRING)
          |TBLPROPERTIES ('primary-key'='k', 'file.format'='avro')""".stripMargin)
    sql("INSERT INTO graft2.db18.avpk VALUES (1, 'x'), (2, 'y')")
    sql("INSERT INTO graft2.db18.avpk VALUES (2, 'y2')")
    assert(sql("SELECT v FROM graft2.db18.avpk ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("x", "y2"))
  }

  test("C2: PK table INSERT dedups within batch and upserts across commits") {
    sql("CREATE NAMESPACE graft2.db2")
    sql("""CREATE TABLE graft2.db2.pk (k INT, v STRING, seq BIGINT)
          |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq')""".stripMargin)
    // within-batch duplicates: greatest seq wins
    sql("INSERT INTO graft2.db2.pk VALUES (1, 'old', 1), (1, 'new', 2), (2, 'b', 1)")
    val r1 = sql("SELECT k, v FROM graft2.db2.pk ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(r1.toSeq == Seq((1, "new"), (2, "b")))
    // cross-commit upsert via merge-on-read
    sql("INSERT INTO graft2.db2.pk VALUES (2, 'b2', 5)")
    val r2 = sql("SELECT k, v FROM graft2.db2.pk ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(r2.toSeq == Seq((1, "new"), (2, "b2")))
  }

  test("C3: VERSION AS OF / TIMESTAMP AS OF time travel") {
    sql("CREATE NAMESPACE graft2.db3")
    sql("CREATE TABLE graft2.db3.t (k INT)")
    sql("INSERT INTO graft2.db3.t VALUES (1)")
    sql("INSERT INTO graft2.db3.t VALUES (2)")
    assert(sql("SELECT count(*) FROM graft2.db3.t VERSION AS OF 1").first().getLong(0) == 1L)
    assert(sql("SELECT count(*) FROM graft2.db3.t").first().getLong(0) == 2L)
    // a timestamp far in the future resolves to the latest snapshot
    assert(sql("SELECT count(*) FROM graft2.db3.t TIMESTAMP AS OF '2099-01-01'")
      .first().getLong(0) == 2L)
  }

  test("C4: INSERT OVERWRITE static truncates, dynamic replaces partitions") {
    sql("CREATE NAMESPACE graft2.db4")
    sql("CREATE TABLE graft2.db4.t (k INT, pt STRING) PARTITIONED BY (pt)")
    sql("INSERT INTO graft2.db4.t VALUES (1, 'a'), (2, 'b')")
    withConf("spark.sql.sources.partitionOverwriteMode", "dynamic") {
      sql("INSERT OVERWRITE graft2.db4.t VALUES (9, 'a')")
    }
    val dyn = sql("SELECT k, pt FROM graft2.db4.t ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(dyn.toSeq == Seq((2, "b"), (9, "a")))
    withConf("spark.sql.sources.partitionOverwriteMode", "static") {
      sql("INSERT OVERWRITE graft2.db4.t VALUES (7, 'c')")
    }
    val stat = sql("SELECT k, pt FROM graft2.db4.t").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(stat.toSeq == Seq((7, "c")))
  }

  test("C5: CTAS, ALTER TABLE ADD COLUMN, RENAME, DROP") {
    sql("CREATE NAMESPACE graft2.db5")
    sql("CREATE TABLE graft2.db5.src AS SELECT 1 AS k, 'a' AS v")
    assert(sql("SELECT * FROM graft2.db5.src").count() == 1)
    sql("ALTER TABLE graft2.db5.src ADD COLUMN score DOUBLE")
    sql("INSERT INTO graft2.db5.src VALUES (2, 'b', 0.5)")
    val rows = sql("SELECT k, score FROM graft2.db5.src ORDER BY k").collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) == 0.5)
    sql("ALTER TABLE graft2.db5.src RENAME TO graft2.db5.dst")
    assert(sql("SELECT count(*) FROM graft2.db5.dst").first().getLong(0) == 2L)
    sql("DROP TABLE graft2.db5.dst")
    assert(sql("SHOW TABLES IN graft2.db5").count() == 0)
  }

  test("C6: bucketed DDL via bucket transform lands in table options") {
    sql("CREATE NAMESPACE graft2.db6")
    sql("CREATE TABLE graft2.db6.b (k INT, v STRING) PARTITIONED BY (bucket(4, k))")
    sql("INSERT INTO graft2.db6.b VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val props = sql("SHOW TBLPROPERTIES graft2.db6.b").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("bucket").contains("4") && props.get("bucket-key").contains("k"))
    assert(sql("SELECT count(*) FROM graft2.db6.b").first().getLong(0) == 3L)
  }

  test("C7: ALTER TABLE RENAME/DROP COLUMN (ref testRenameColumn/testDropColumn)") {
    sql("CREATE NAMESPACE graft2.db7")
    sql("""CREATE TABLE graft2.db7.t5 (
          |  order_key BIGINT, order_status STRING, total_price DOUBLE, order_date DATE
          |)""".stripMargin)
    sql("INSERT INTO graft2.db7.t5 VALUES (1, 'OPEN', 10.0, DATE'2024-01-01')")
    // ref: ALTER TABLE paimon.default.t5 RENAME COLUMN order_status TO g
    sql("ALTER TABLE graft2.db7.t5 RENAME COLUMN order_status TO g")
    assert(spark.table("graft2.db7.t5").columns.toSeq ==
      Seq("order_key", "g", "total_price", "order_date"))
    // data written under the old name reads through the new one
    assert(sql("SELECT g FROM graft2.db7.t5").first().getString(0) == "OPEN")
    // ref: ALTER TABLE paimon.default.t5 DROP COLUMN order_status
    sql("ALTER TABLE graft2.db7.t5 DROP COLUMN g")
    assert(spark.table("graft2.db7.t5").columns.toSeq ==
      Seq("order_key", "total_price", "order_date"))
    assert(sql("SELECT count(*) FROM graft2.db7.t5").first().getLong(0) == 1L)
  }

  test("C8: SHOW CREATE TABLE round-trips schema, partitioning, bucket, PK and options " +
    "(ref TestPrestoITCase testShowCreateTable)") {
    sql("CREATE NAMESPACE graft2.db8")
    sql("""CREATE TABLE graft2.db8.sc (
          |  k BIGINT, pt STRING, v DOUBLE, seq BIGINT
          |) PARTITIONED BY (pt, bucket(4, k))
          |TBLPROPERTIES ('primary-key'='k,pt', 'sequence.field'='seq',
          |  'manifest.merge-min-count'='7')""".stripMargin)
    val ddl = sql("SHOW CREATE TABLE graft2.db8.sc").first().getString(0)
    // the emitted DDL carries every layout-defining piece
    assert(ddl.contains("PARTITIONED BY"), ddl)
    assert(ddl.contains("bucket(4, k)"), ddl)
    assert(ddl.contains("'primary-key'") && ddl.contains("'k,pt'"), ddl)
    assert(ddl.contains("'sequence.field'"), ddl)
    // re-create from the emitted DDL under a new name: identical table
    val ddl2 = ddl.replace("graft2.db8.sc", "graft2.db8.sc2")
    sql(ddl2)
    assert(spark.table("graft2.db8.sc2").schema == spark.table("graft2.db8.sc").schema)
    val props = sql("SHOW TBLPROPERTIES graft2.db8.sc2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("primary-key").contains("k,pt"))
    assert(props.get("sequence.field").contains("seq"))
    assert(props.get("bucket").contains("4") && props.get("bucket-key").contains("k"))
    assert(props.get("manifest.merge-min-count").contains("7"))
    // and it behaves like one: PK upsert semantics survive the round-trip
    sql("INSERT INTO graft2.db8.sc2 VALUES (1, 'a', 1.0, 1), (1, 'a', 2.0, 2)")
    val r = sql("SELECT v FROM graft2.db8.sc2").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(2.0))
  }

  test("C9: NOT NULL and column comments survive create → write → read " +
    "(ref PrestoTypeUtils nullability mapping)") {
    sql("CREATE NAMESPACE graft2.db9")
    sql("CREATE TABLE graft2.db9.nn (k INT NOT NULL, v STRING COMMENT 'payload')")
    def check(): Unit = {
      val sch = spark.table("graft2.db9.nn").schema
      assert(!sch("k").nullable, "NOT NULL lost")
      assert(sch("v").nullable)
      assert(sch("v").getComment().contains("payload"), "column comment lost")
    }
    check()
    sql("INSERT INTO graft2.db9.nn VALUES (1, 'a')")
    check() // still intact after the write re-loads table metadata
    assert(sql("SELECT k FROM graft2.db9.nn").first().getInt(0) == 1)
  }

  test("C10: SQL DELETE FROM — metadata delete on partitions, tombstones on PK tables, TRUNCATE") {
    sql("CREATE NAMESPACE graft2.db10")
    // partitioned append table: partition predicate = metadata delete
    sql("CREATE TABLE graft2.db10.p (k INT, pt STRING) PARTITIONED BY (pt)")
    sql("INSERT INTO graft2.db10.p VALUES (1, 'a'), (2, 'b'), (3, 'b')")
    sql("DELETE FROM graft2.db10.p WHERE pt = 'b'")
    assert(sql("SELECT k FROM graft2.db10.p").collect().map(_.getInt(0)).toSeq == Seq(1))
    // a non-partition predicate on an append table takes the group-based
    // copy-on-write rewrite (no metadata shortcut applies)
    sql("INSERT INTO graft2.db10.p VALUES (7, 'a'), (8, 'a')")
    sql("DELETE FROM graft2.db10.p WHERE k = 7")
    assert(sql("SELECT k FROM graft2.db10.p ORDER BY k").collect().map(_.getInt(0)).toSeq
      == Seq(1, 8))

    // PK table: arbitrary row predicate deletes via -D tombstones
    sql("""CREATE TABLE graft2.db10.pk (k INT, v STRING, seq BIGINT)
          |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq')""".stripMargin)
    sql("INSERT INTO graft2.db10.pk VALUES (1, 'keep', 1), (2, 'drop', 1), (3, 'drop', 1)")
    sql("DELETE FROM graft2.db10.pk WHERE v = 'drop'")
    assert(sql("SELECT k FROM graft2.db10.pk ORDER BY k").collect().map(_.getInt(0)).toSeq == Seq(1))
    // the delete is a tombstone commit, not a rewrite: audit log keeps history
    sql("DELETE FROM graft2.db10.pk WHERE k = 1")
    assert(sql("SELECT count(*) FROM graft2.db10.pk").first().getLong(0) == 0L)

    // TRUNCATE TABLE drops everything in one metadata commit
    sql("CREATE TABLE graft2.db10.tr (k INT)")
    sql("INSERT INTO graft2.db10.tr VALUES (1), (2)")
    sql("TRUNCATE TABLE graft2.db10.tr")
    assert(sql("SELECT count(*) FROM graft2.db10.tr").first().getLong(0) == 0L)
  }

  test("C11: SQL UPDATE and MERGE INTO — group-based copy-on-write") {
    sql("CREATE NAMESPACE graft2.db11")
    // append table UPDATE: affected files rewritten, others untouched
    sql("CREATE TABLE graft2.db11.a (k INT, v STRING, pt STRING) PARTITIONED BY (pt)")
    sql("INSERT INTO graft2.db11.a VALUES (1, 'x', 'p1'), (2, 'y', 'p1'), (3, 'z', 'p2')")
    sql("UPDATE graft2.db11.a SET v = 'updated' WHERE k = 2")
    val a = sql("SELECT k, v FROM graft2.db11.a ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(a.toSeq == Seq((1, "x"), (2, "updated"), (3, "z")))

    // PK table UPDATE folds through the merge and keeps upsert semantics
    sql("""CREATE TABLE graft2.db11.pk (k INT, v STRING, seq BIGINT)
          |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq')""".stripMargin)
    sql("INSERT INTO graft2.db11.pk VALUES (1, 'a', 1), (2, 'b', 1)")
    sql("INSERT INTO graft2.db11.pk VALUES (1, 'a2', 2)")
    sql("UPDATE graft2.db11.pk SET v = 'bumped', seq = 9 WHERE k = 1")
    val pk = sql("SELECT k, v FROM graft2.db11.pk ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(pk.toSeq == Seq((1, "bumped"), (2, "b")))
    // a later upsert with a LOWER sequence still loses to the update
    sql("INSERT INTO graft2.db11.pk VALUES (1, 'stale', 3)")
    assert(sql("SELECT v FROM graft2.db11.pk WHERE k = 1").first().getString(0) == "bumped")

    // MERGE INTO: matched update + not-matched insert in one statement
    sql("""CREATE TABLE graft2.db11.src (k INT, v STRING, seq BIGINT)""")
    sql("INSERT INTO graft2.db11.src VALUES (2, 'merged', 10), (5, 'fresh', 10)")
    sql("""MERGE INTO graft2.db11.pk t USING graft2.db11.src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.seq = s.seq
          |WHEN NOT MATCHED THEN INSERT (k, v, seq) VALUES (s.k, s.v, s.seq)""".stripMargin)
    val m = sql("SELECT k, v FROM graft2.db11.pk ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(m.toSeq == Seq((1, "bumped"), (2, "merged"), (5, "fresh")))
  }

  test("C12: UPDATE is rejected on changelog-producer=lookup tables (CDC integrity)") {
    sql("CREATE NAMESPACE graft2.db12")
    sql("""CREATE TABLE graft2.db12.cdc (k INT, v STRING, seq BIGINT)
          |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq',
          |  'changelog-producer'='lookup')""".stripMargin)
    // lookup tables write through the V1 upsert path (the classification
    // is a query) — seed via the library at the catalog's table path
    val wh = spark.conf.get("spark.sql.catalog.graft2.warehouse")
    import spark.implicits._
    graft.sources.GraftTable.load(spark, s"$wh/db12.db/cdc")
      .upsert(Seq((1, "a", 1L)).toDF("k", "v", "seq"))
    val e = intercept[Exception](
      sql("UPDATE graft2.db12.cdc SET v = 'b', seq = 2 WHERE k = 1"))
    assert(e.getMessage.contains("changelog-producer=lookup"), e.getMessage)
    // DELETE still works: the tombstone path emits true pre-images
    sql("DELETE FROM graft2.db12.cdc WHERE k = 1")
    assert(sql("SELECT count(*) FROM graft2.db12.cdc").first().getLong(0) == 0L)
  }

  test("C13: PK rewrite folds complete key histories — file pruning cannot " +
    "resurrect a stale version (default __seq ordering, no sequence.field)") {
    sql("CREATE NAMESPACE graft2.db13")
    sql("""CREATE TABLE graft2.db13.pk (k INT, v STRING)
          |TBLPROPERTIES ('primary-key'='k')""".stripMargin)
    // file1 holds k∈[1,2] (incl. the STALE version of k=2); file2 holds
    // only the NEWEST k=2. UPDATE WHERE k=1 stats-prunes file2 from the
    // scan — without group completion the fold reads only file1, carries
    // stale (2,'old') forward with a fresh __seq, and k=2 silently
    // reverts. The replace set must expand to the whole (partition,
    // bucket) group so the fold is history-complete.
    sql("INSERT INTO graft2.db13.pk VALUES (1, 'a'), (2, 'old')")
    sql("INSERT INTO graft2.db13.pk VALUES (2, 'new')")
    sql("UPDATE graft2.db13.pk SET v = 'A' WHERE k = 1")
    val r = sql("SELECT k, v FROM graft2.db13.pk ORDER BY k").collect()
      .map(x => (x.getInt(0), x.getString(1)))
    assert(r.toSeq == Seq((1, "A"), (2, "new")))

    // same hazard through MERGE INTO
    sql("INSERT INTO graft2.db13.pk VALUES (3, 'stale3')")
    sql("INSERT INTO graft2.db13.pk VALUES (3, 'new3')")
    sql("CREATE TABLE graft2.db13.src (k INT, v STRING)")
    sql("INSERT INTO graft2.db13.src VALUES (1, 'merged')")
    sql("""MERGE INTO graft2.db13.pk t USING graft2.db13.src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    val m = sql("SELECT k, v FROM graft2.db13.pk ORDER BY k").collect()
      .map(x => (x.getInt(0), x.getString(1)))
    assert(m.toSeq == Seq((1, "merged"), (2, "new"), (3, "new3")))

    // group completion must NOT defeat partition pruning: with partition
    // keys ⊆ primary key a key's versions never span partitions, so an
    // update targeting p1 leaves p2's files byte-identical.
    sql("""CREATE TABLE graft2.db13.ppk (k INT, pt STRING, v STRING)
          |PARTITIONED BY (pt)
          |TBLPROPERTIES ('primary-key'='pt,k')""".stripMargin)
    sql("INSERT INTO graft2.db13.ppk VALUES (1, 'p1', 'a'), (1, 'p2', 'b')")
    val wh = spark.conf.get("spark.sql.catalog.graft2.warehouse")
    def p2Files() = graft.sources.GraftTable.load(spark, s"$wh/db13.db/ppk")
      .system("files").where("partition = 'pt=p2'")
      .collect().map(_.getString(0)).sorted.toSeq
    val before = p2Files()
    sql("UPDATE graft2.db13.ppk SET v = 'A' WHERE pt = 'p1' AND k = 1")
    assert(p2Files() == before, "untouched partition was rewritten")
    val pr = sql("SELECT pt, v FROM graft2.db13.ppk ORDER BY pt").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(pr.toSeq == Seq(("p1", "A"), ("p2", "b")))
  }

  test("C19 (S30+S40): CALL sys.compact with a partition-filter `where` rewrites " +
    "ONLY the matching partitions") {
    sql("CREATE NAMESPACE graft2.db19")
    sql("CREATE TABLE graft2.db19.t (k INT, v INT, pt STRING) PARTITIONED BY (pt)")
    for (i <- 1 to 3) // 3 commits x 2 partitions = 3 files per partition
      sql(s"INSERT INTO graft2.db19.t VALUES ($i, ${i * 10}, 'a'), (${i + 100}, ${i * 10}, 'b')")
    val path = spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/db19.db/t"
    val t = graft.sources.GraftTable.load(spark, path)
    val before = sql("SELECT k, v, pt FROM graft2.db19.t").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val bFilesBefore = t.system("files").collect()
      .map(_.getString(0)).filter(_.contains("pt=b")).sorted.toSeq
    assert(bFilesBefore.size == 3)
    val snap = sql("CALL graft2.sys.compact('db19.t', \"pt = 'a'\")").first().getLong(0)
    val t2 = graft.sources.GraftTable.load(spark, path)
    assert(t2.snapshots.last.id == snap && t2.snapshots.last.commitKind == "COMPACT")
    // results identical; partition a folded to one compacted file;
    // partition b's files byte-identical (same paths, untouched)
    val after = sql("SELECT k, v, pt FROM graft2.db19.t").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(after == before)
    val filesAfter = t2.system("files").collect()
    val aAfter = filesAfter.filter(_.getString(0).contains("pt=a"))
    assert(aAfter.length == 1,
      s"partition a should fold to one target-file-size bin: ${aAfter.map(_.getString(0)).toSeq}")
    assert(aAfter.forall(_.getBoolean(8)), "folded files must carry the compacted flag")
    assert(filesAfter.map(_.getString(0)).filter(_.contains("pt=b")).sorted.toSeq == bFilesBefore,
      "partition b must be untouched by a targeted compact")
    // a data-column (non-partition) where must be refused
    intercept[Exception] { sql("CALL graft2.sys.compact('db19.t', 'k = 1')").collect() }
    // a where matching nothing must be refused (not silently no-op)
    intercept[Exception] { sql("CALL graft2.sys.compact('db19.t', \"pt = 'zz'\")").collect() }
  }

  test("C14 (S40): CALL sys.* procedures — tag, rollback, branch, expire, compact") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft2.procs")
    sql("DROP TABLE IF EXISTS graft2.procs.t")
    sql("CREATE TABLE graft2.procs.t (k INT, v STRING)")
    sql("INSERT INTO graft2.procs.t VALUES (1, 'a')")
    sql("INSERT INTO graft2.procs.t VALUES (2, 'b')")
    // tag snapshot 1 and roll back to it
    assert(sql("CALL graft2.sys.create_tag('procs.t', 'v1', 1)").first().getBoolean(0))
    val rb = sql("CALL graft2.sys.rollback('procs.t', 1)").first().getLong(0)
    assert(rb == 3L) // rollback commits a NEW snapshot
    assert(sql("SELECT k FROM graft2.procs.t").collect().map(_.getInt(0)).toSeq == Seq(1))
    // branch lifecycle through procedures
    assert(sql("CALL graft2.sys.create_branch('procs.t', 'work')").first().getBoolean(0))
    sql("INSERT INTO graft2.procs.t VALUES (9, 'main')")
    val head = sql("CALL graft2.sys.fast_forward('procs.t', 'work')").first().getLong(0)
    assert(head == 3L) // branch had no commits: main returns to the cut
    assert(sql("SELECT k FROM graft2.procs.t").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(sql("CALL graft2.sys.delete_branch('procs.t', 'work')").first().getBoolean(0))
    // compact + expire + orphan sweep chain
    sql("INSERT INTO graft2.procs.t VALUES (5, 'e')")
    val compacted = sql("CALL graft2.sys.compact('procs.t')").first().getLong(0)
    assert(compacted >= 4L)
    assert(sql("CALL graft2.sys.delete_tag('procs.t', 'v1')").first().getBoolean(0))
    val expired = sql("CALL graft2.sys.expire_snapshots('procs.t', 1)").first().getString(0)
    assert(expired.nonEmpty)
    val removed = sql("CALL graft2.sys.remove_orphan_files('procs.t', 0)").first().getLong(0)
    assert(removed >= 0L)
    assert(sql("SELECT k FROM graft2.procs.t").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 5))
    // rollback_to_timestamp: resolve by commit time, then roll back
    val tProc = graft.sources.GraftTable.load(spark,
      spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/procs.db/t")
    val lastSnap = tProc.snapshots.last
    val rbts = sql(s"CALL graft2.sys.rollback_to_timestamp('procs.t', ${lastSnap.timestampMs})")
      .first().getLong(0)
    assert(rbts > lastSnap.id) // commits a NEW snapshot at the resolved state
    // a bound before the first commit resolves nothing → loud error
    intercept[Exception] { sql("CALL graft2.sys.rollback_to_timestamp('procs.t', 0)") }
    // unknown procedure: a clear error
    intercept[Exception] { sql("CALL graft2.sys.nope('procs.t')") }
    // reset_consumer: reposition the retention pin, then delete it
    assert(sql("CALL graft2.sys.reset_consumer('procs.t', 'job', 2)").first().getBoolean(0))
    val t = graft.sources.GraftTable.load(spark,
      spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/procs.db/t")
    assert(t.consumers.map(c => (c.consumerId, c.nextSnapshot)) == Seq(("job", 2L)))
    assert(sql("CALL graft2.sys.reset_consumer('procs.t', 'job')").first().getBoolean(0))
    assert(t.consumers.isEmpty)
    // rescale (S42): bucketed table re-hashes under the new count via CALL
    sql("DROP TABLE IF EXISTS graft2.procs.b")
    sql("""CREATE TABLE graft2.procs.b (k INT, v STRING)
          |PARTITIONED BY (bucket(2, k))""".stripMargin)
    sql("INSERT INTO graft2.procs.b VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e'),(6,'f'),(7,'g'),(8,'h')")
    val resc = sql("CALL graft2.sys.rescale('procs.b', 4)").first().getLong(0)
    assert(resc >= 2L)
    val tb = graft.sources.GraftTable.load(spark,
      spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/procs.db/b")
    assert(tb.options.get("bucket").contains("4"))
    val bks = tb.system("files").select("bucket").collect().map(_.getInt(0)).toSeq
    assert(bks.forall(_ < 4) && bks.exists(_ >= 2), s"buckets $bks")
    assert(sql("SELECT count(*) FROM graft2.procs.b").first().getLong(0) == 8L)
  }

  test("C15 (S43): ALTER TABLE SET/UNSET TBLPROPERTIES — versioned options, layout guarded") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft2.procs")
    sql("DROP TABLE IF EXISTS graft2.procs.props")
    sql("CREATE TABLE graft2.procs.props (k INT, v STRING)")
    sql("INSERT INTO graft2.procs.props VALUES (1, 'a')")
    sql("""ALTER TABLE graft2.procs.props SET TBLPROPERTIES
          |('num-sorted-run.compaction-trigger'='5', 'snapshot.time-retained'='3600000')""".stripMargin)
    val tableDir =
      spark.conf.get("spark.sql.catalog.graft2.warehouse") + "/procs.db/props"
    def t = graft.sources.GraftTable.load(spark, tableDir)
    assert(t.options.get("num-sorted-run.compaction-trigger").contains("5"))
    assert(t.options.get("snapshot.time-retained").contains("3600000"))
    // one ALTER = ONE schema version, however many properties it sets
    // (per-property versions would expose a half-applied ALTER on crash)
    def schemaVersions: Int =
      new java.io.File(tableDir, "schema").listFiles()
        .count(_.getName.matches("schema-\\d+\\.json"))
    assert(schemaVersions == 2, s"expected schema-0 + one ALTER version, got $schemaVersions")
    sql("ALTER TABLE graft2.procs.props UNSET TBLPROPERTIES ('snapshot.time-retained')")
    assert(!t.options.contains("snapshot.time-retained"))
    assert(t.options.get("num-sorted-run.compaction-trigger").contains("5"))
    // layout/semantics-critical options are immutable through this path
    // (row-tracking.enabled included: toggling it ON mid-history would
    // let pre-tracking compacted files read NULL _row_id silently)
    for (bad <- Seq("bucket", "file.format", "merge-engine", "sequence.field",
        "row-tracking.enabled"))
      intercept[Exception] {
        sql(s"ALTER TABLE graft2.procs.props SET TBLPROPERTIES ('$bad'='x')")
      }
    // data untouched by the metadata-only versioning
    assert(sql("SELECT k FROM graft2.procs.props").first().getInt(0) == 1)
    // drop_partition: whole partitions leave in one metadata commit
    sql("DROP TABLE IF EXISTS graft2.procs.pt")
    sql("CREATE TABLE graft2.procs.pt (k INT, dt STRING) PARTITIONED BY (dt)")
    sql("INSERT INTO graft2.procs.pt VALUES (1,'d1'),(2,'d1'),(3,'d2'),(4,NULL)")
    val dropped = sql("CALL graft2.sys.drop_partition('procs.pt', 'dt=d1')")
      .first().getLong(0)
    assert(dropped >= 2L)
    assert(sql("SELECT k FROM graft2.procs.pt").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(3, 4))
    // the NULL partition drops via the hive sentinel (null-safe equality)
    sql("CALL graft2.sys.drop_partition('procs.pt', 'dt=__HIVE_DEFAULT_PARTITION__')")
    assert(sql("SELECT k FROM graft2.procs.pt").collect().map(_.getInt(0)).toSeq == Seq(3))
    // a spec matching nothing fails loudly instead of committing churn
    intercept[Exception] {
      sql("CALL graft2.sys.drop_partition('procs.pt', 'dt=absent')")
    }
    // non-partition column in the spec fails loudly
    intercept[Exception] {
      sql("CALL graft2.sys.drop_partition('procs.pt', 'k=1')")
    }
    // PK table whose partition keys are outside the primary key: refused
    // (file removal could resurrect stale row versions)
    sql("DROP TABLE IF EXISTS graft2.procs.ptpk")
    sql("""CREATE TABLE graft2.procs.ptpk (id INT, dt STRING, v STRING)
          |PARTITIONED BY (dt) TBLPROPERTIES ('primary-key'='id')""".stripMargin)
    sql("INSERT INTO graft2.procs.ptpk VALUES (1,'a','x')")
    intercept[Exception] {
      sql("CALL graft2.sys.drop_partition('procs.ptpk', 'dt=a')")
    }
  }

  test("C17 (S46): CALL sys.expire_partitions — value-based calendar retention") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft2.ret")
    sql("DROP TABLE IF EXISTS graft2.ret.ev")
    sql("CREATE TABLE graft2.ret.ev (k INT, dt STRING) PARTITIONED BY (dt)")
    sql("""INSERT INTO graft2.ret.ev VALUES
          |(1, '2026-01-01'), (2, '2026-02-01'), (3, '2026-03-01'),
          |(4, '2026-03-15'), (5, NULL)""".stripMargin)

    val row = sql(
      "CALL graft2.sys.expire_partitions('ret.ev', 'dt', '2026-03-01')").first()
    assert(row.getLong(0) == 2L) // one metadata commit on top of the insert
    assert(row.getString(1) == "2026-01-01,2026-02-01")
    // strictly-below dropped; the boundary, later days and the NULL
    // partition (never value-comparable) all retained
    assert(sql("SELECT k FROM graft2.ret.ev").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(3, 4, 5))
    // time travel still sees the pre-retention state (no purge)
    assert(sql("SELECT count(*) FROM graft2.ret.ev VERSION AS OF 1").first().getLong(0) == 5)

    // idempotent: nothing below the bound left — unchanged base, no churn
    val again = sql(
      "CALL graft2.sys.expire_partitions('ret.ev', 'dt', '2026-03-01')").first()
    assert(again.getLong(0) == 2L && again.getString(1).isEmpty)

    // non-partition key refused
    intercept[Exception] {
      sql("CALL graft2.sys.expire_partitions('ret.ev', 'k', '3')")
    }
    // PK table with partition keys outside the primary key: refused
    sql("DROP TABLE IF EXISTS graft2.ret.evpk")
    sql("""CREATE TABLE graft2.ret.evpk (id INT, dt STRING, v STRING)
          |PARTITIONED BY (dt) TBLPROPERTIES ('primary-key'='id')""".stripMargin)
    sql("INSERT INTO graft2.ret.evpk VALUES (1, 'a', 'x')")
    intercept[Exception] {
      sql("CALL graft2.sys.expire_partitions('ret.evpk', 'dt', 'z')")
    }
  }

  test("C19/S57: SHOW PARTITIONS and ALTER TABLE DROP PARTITION (native SQL)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft2.pm")
    sql("DROP TABLE IF EXISTS graft2.pm.t")
    sql("CREATE TABLE graft2.pm.t (k INT, dt STRING) PARTITIONED BY (dt)")
    sql("INSERT INTO graft2.pm.t VALUES (1,'d1'),(2,'d1'),(3,'d2'),(4,NULL)")
    val parts = sql("SHOW PARTITIONS graft2.pm.t").collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("dt=d1", "dt=d2", "dt=null").sorted
      || parts.toSeq == Seq("dt=__HIVE_DEFAULT_PARTITION__", "dt=d1", "dt=d2"),
      s"unexpected partition listing: ${parts.toSeq}")
    // filtered listing
    val one = sql("SHOW PARTITIONS graft2.pm.t PARTITION (dt='d1')").collect()
    assert(one.length == 1 && one.head.getString(0) == "dt=d1")
    // native DROP PARTITION removes the partition's rows in one commit
    sql("ALTER TABLE graft2.pm.t DROP PARTITION (dt='d1')")
    assert(sql("SELECT k FROM graft2.pm.t").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(3, 4))
    assert(sql("SHOW PARTITIONS graft2.pm.t").collect().length == 2)
    // partitions materialize from data: ADD PARTITION is rejected
    intercept[Exception] {
      sql("ALTER TABLE graft2.pm.t ADD PARTITION (dt='new')")
    }
    // PK table with partition keys outside the primary key: unsafe drop
    sql("DROP TABLE IF EXISTS graft2.pm.tpk")
    sql("""CREATE TABLE graft2.pm.tpk (id INT, v STRING, dt STRING)
          |PARTITIONED BY (dt) TBLPROPERTIES ('primary-key'='id')""".stripMargin)
    sql("INSERT INTO graft2.pm.tpk VALUES (1, 'a', 'x')")
    intercept[Exception] {
      sql("ALTER TABLE graft2.pm.tpk DROP PARTITION (dt='x')")
    }
  }

  test("C20/S58: multi-partition DROP lands as ONE atomic snapshot") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft2.pm")
    sql("DROP TABLE IF EXISTS graft2.pm.atomic")
    sql("CREATE TABLE graft2.pm.atomic (k INT, dt STRING) PARTITIONED BY (dt)")
    sql("INSERT INTO graft2.pm.atomic VALUES (1,'a'),(2,'b'),(3,'c')")
    val dir = new java.io.File(
      spark.conf.get("spark.sql.catalog.graft2.warehouse"), "pm.db/atomic").getAbsolutePath
    val before = graft.sources.GraftTable.load(spark, dir).latestSnapshotId.get
    sql("ALTER TABLE graft2.pm.atomic DROP PARTITION (dt='a'), PARTITION (dt='b')")
    val t = graft.sources.GraftTable.load(spark, dir)
    assert(t.latestSnapshotId.contains(before + 1),
      "two dropped partitions must commit ONE snapshot, not one each")
    assert(sql("SELECT k FROM graft2.pm.atomic").collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
