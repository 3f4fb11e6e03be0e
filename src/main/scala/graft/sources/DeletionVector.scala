package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Deletion-vector sidecars (S37) — the Paimon `deletion-vectors.enabled`
  * idea re-expressed for this format: a row-predicate DELETE on an
  * append table marks matching ROW POSITIONS in small per-data-file
  * sidecars instead of rewriting the files (copy-on-write touches every
  * group a predicate grazes; at 100 TB that is a rewrite of the corpus
  * for a 0.01% delete). The snapshot's FileMeta carries the dv path, so
  * the vectors are versioned like everything else: time travel before
  * the delete sees the full file, rollback restores it, expiry reclaims
  * superseded vectors with their snapshots.
  *
  * File format (`data/dv/<uuid>.dv`): magic 'GDV1', Int count, then
  * `count` ascending Long row positions (positions within the data
  * file's physical row order, 0-based — the same order parquet's
  * `_metadata.row_index` reports). Positions, not a dense bitmap: a DV
  * exists only when a delete matched, and typical per-file match counts
  * are sparse; 8 B/position is within 2× of a roaring bitmap until
  * ~1/16 of a file is deleted, with none of the container bookkeeping.
  * Vectors are immutable — a second DELETE writes a NEW sidecar holding
  * the union and the commit swaps the FileMeta pointer (the same
  * copy-on-write-the-METADATA shape as delta manifests).
  *
  * Ref: Paimon's deletion-vectors.enabled table option (index/
  * DeletionVectorsIndexFile); the reference connector predates it, so
  * this surface is graded against Paimon's documented semantics.
  */
object DeletionVector {
  val Magic = 0x47445631 // "GDV1"
  val DirRel = "data/dv"

  /** Write ascending positions as a new immutable sidecar; returns the
    * table-root-relative path. Callable from executor tasks (the delete
    * job writes each file's vector where its positions already are). */
  def write(conf: Configuration, tableRoot: String, positions: Array[Long]): String = {
    val rel = s"$DirRel/${java.util.UUID.randomUUID().toString.replace("-", "")}.dv"
    val p = new Path(tableRoot, rel)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, /*overwrite=*/ false)
    try {
      out.writeInt(Magic)
      out.writeInt(positions.length)
      var i = 0
      while (i < positions.length) {
        // read/merge and the scan's merge-skip both rely on strictly
        // ascending positions — an unsorted caller would silently
        // produce a sidecar that fails to mask its rows
        require(i == 0 || positions(i) > positions(i - 1),
          s"deletion-vector positions must be strictly ascending " +
            s"(positions($i)=${positions(i)} after ${positions(i - 1)})")
        out.writeLong(positions(i))
        i += 1
      }
    } finally out.close()
    rel
  }

  /** Read a sidecar's ascending positions. */
  def read(conf: Configuration, tableRoot: String, rel: String): Array[Long] = {
    val p = new Path(tableRoot, rel)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      require(in.readInt() == Magic, s"not a deletion vector: $rel")
      val n = in.readInt()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = in.readLong(); i += 1 }
      out
    } finally in.close()
  }

  /** Union of two ascending position arrays (repeat-delete merge). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    a.foreach(out.add(_))
    b.foreach(out.add(_))
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }
}

object DvReaderFactory {
  /** PartitionedFile metadata key carrying the file's deletion-vector
    * sidecar path (table-root-relative). Like GraftMorReaderFactory's
    * SortedKey this is never surfaced as a real metadata column — the
    * scan requests no `_metadata` fields. */
  val DvKey = "__graft_dv"
}

/** Wraps the non-PK file reader factory to mask deletion-vector rows.
  *
  * Partitions holding NO dv-carrying file delegate wholesale — including
  * columnar reads, so the vectorized/codegen path of the ordinary scan
  * is untouched. A partition WITH dv files is read file-by-file
  * (sequential single-file sub-partitions — the interleaved-vectorized
  * corruption documented on GraftMorReaderFactory only bites
  * concurrently-open readers): dv files stream through `clean` (a
  * factory built with NO pushed filters — parquet row-group skipping
  * would desynchronize the physical row counter the mask is keyed on;
  * Spark re-applies every predicate above the scan, so dropping the
  * pushdown costs only I/O on the dv'd files) and a merge-skip against
  * the sidecar's ascending positions; plain files in the same partition
  * keep the filtered delegate.
  */
final class DvReaderFactory(
    filtered: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    clean: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    tableRoot: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  import org.apache.spark.sql.execution.datasources.FilePartition

  private def dvOf(pf: org.apache.spark.sql.execution.datasources.PartitionedFile): Option[String] =
    pf.otherConstantMetadataColumnValues.get(DvReaderFactory.DvKey).map(_.toString)

  private def hasDv(p: InputPartition): Boolean = p match {
    case fp: FilePartition => fp.files.exists(f => dvOf(f).isDefined)
    case _ => false
  }

  // Spark requires a scan's partitions to be uniformly columnar or
  // row-based (DataSourceV2ScanExecBase.supportsColumnar) — a dv'd file
  // anywhere in the snapshot makes the whole scan row-based. Compaction
  // (which purges vectors) restores the columnar path.
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    filtered.createColumnarReader(p)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case fp: FilePartition if hasDv(p) =>
      new PartitionReader[InternalRow] {
        private var i = 0
        private var cur: PartitionReader[InternalRow] = _
        private def open(): Boolean = {
          if (i >= fp.files.length) return false
          val pf = fp.files(i); i += 1
          cur = dvOf(pf) match {
            case Some(rel) =>
              val positions = DeletionVector.read(conf.value, tableRoot, rel)
              new DvSkipReader(
                clean.createReader(FilePartition(fp.index, Array(pf))), positions)
            case None =>
              filtered.createReader(FilePartition(fp.index, Array(pf)))
          }
          true
        }
        override def next(): Boolean = {
          while (cur != null || open()) {
            if (cur.next()) return true
            cur.close(); cur = null
          }
          false
        }
        override def get(): InternalRow = cur.get()
        override def close(): Unit = if (cur != null) { cur.close(); cur = null }
      }
    case _ => filtered.createReader(p)
  }
}

/** Skips the sidecar's positions while streaming one WHOLE data file
  * (the scan plans dv files unsplit and unfiltered, so the row stream is
  * exactly physical positions 0..n-1). Both streams are ascending — one
  * pointer, O(1) per row, no hashing. */
final class DvSkipReader(
    inner: org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow],
    positions: Array[Long])
    extends org.apache.spark.sql.connector.read.PartitionReader[
      org.apache.spark.sql.catalyst.InternalRow] {
  private var pos = -1L
  private var i = 0
  override def next(): Boolean = {
    while (inner.next()) {
      pos += 1
      while (i < positions.length && positions(i) < pos) i += 1
      if (i >= positions.length || positions(i) != pos) return true
    }
    false
  }
  override def get(): org.apache.spark.sql.catalyst.InternalRow = inner.get()
  override def close(): Unit = inner.close()
}
