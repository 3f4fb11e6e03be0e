package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{DataInputStream, DataOutputStream}

/** Per-file bloom-filter column index — equality-predicate file skipping
  * where min/max stats cannot help (high-cardinality, unclustered
  * columns). Spark-first re-expression of Paimon's
  * `file-index.bloom-filter.columns` file index (which the reference
  * connector inherits through Paimon's FileStoreScan planning): the
  * write task hashes each non-null value of the configured columns with
  * the SAME XxHash64 expression the planner later applies to predicate
  * literals, sizes a filter for the file's actual row count at build
  * time, and writes one small sidecar (`<data-file>.bfidx`) next to the
  * data file. Planning stays driver-side and metadata-only: the sidecar
  * is opened lazily, only when an equality predicate on an indexed
  * column survives partition/stats pruning, and is memoized per path.
  *
  * A bloom filter has NO false negatives, so pruning is sound: a file is
  * dropped only when the filter proves the value was never written.
  */
object BloomIndex {

  val Suffix = ".bfidx"
  private val Magic = 0x47424631 // "GBF1" — blooms only (legacy, still read)
  private val Magic2 = 0x47424632 // "GBF2" — blooms + per-entry min/max stats
  private val Magic3 = 0x47424633 // "GBF3" — v2 + declared entry-hashed columns

  /** One file's sidecar: per-column blooms, plus (format v2) per-column
    * per-ENTRY-KEY min/max of integral map/array values — the range half
    * of subscript pruning (`props['k'] > 5`; ref session property
    * range_filters_on_subscripts_enabled). A column appears in
    * `entryStats` ONLY when the writer saw every row (no key-cap
    * overflow) and every non-null value was integral — so key ABSENCE
    * from a present column map proves no row in the file carries that
    * key, and the (min,max) bounds are file-complete.
    *
    * `entryCols` (format v3) declares WHICH columns' blooms hold
    * per-ENTRY hashes rather than whole-value hashes. The hash kind is
    * otherwise invisible in the bits, and it changed for struct columns
    * when struct-leaf subscript pushdown landed: a pre-v3 struct bloom
    * holds whole-value hashes, so probing it with an entry hash would
    * return a FALSE NEGATIVE and prune a file that matches. None =
    * legacy sidecar (v1/v2): map/array blooms were always entry-hashed
    * there, struct blooms never were — the reader must decline struct
    * claims for them. */
  final case class Sidecar(
      blooms: Map[String, Bloom],
      entryStats: Map[String, Map[String, (Long, Long)]],
      entryCols: Option[Set[String]] = None)

  /** ~1% false-positive rate: m ≈ 9.6 bits/item, k = 7. */
  private val BitsPerItem = 10
  private val NumHashes = 7

  final class Bloom(val words: Array[Long]) {
    private val mBits: Long = words.length.toLong * 64
    def mightContain(h: Long): Boolean = {
      // Kirsch–Mitzenmacher double hashing over one 64-bit input
      val h1 = (h & 0xFFFFFFFFL).toInt
      val h2 = (h >>> 32).toInt
      var i = 0
      while (i < NumHashes) {
        var g = (h1 + i.toLong * h2) % mBits
        if (g < 0) g += mBits
        if ((words((g >>> 6).toInt) & (1L << (g & 63))) == 0) return false
        i += 1
      }
      true
    }
  }

  /** Build a filter sized for `n` items from their 64-bit hashes. */
  def build(hashes: Array[Long], n: Int): Bloom = {
    val mBits = math.max(64L, n.toLong * BitsPerItem)
    val words = new Array[Long](((mBits + 63) / 64).toInt)
    val m = words.length.toLong * 64
    var j = 0
    while (j < n) {
      val h = hashes(j)
      val h1 = (h & 0xFFFFFFFFL).toInt
      val h2 = (h >>> 32).toInt
      var i = 0
      while (i < NumHashes) {
        var g = (h1 + i.toLong * h2) % m
        if (g < 0) g += m
        words((g >>> 6).toInt) |= 1L << (g & 63)
        i += 1
      }
      j += 1
    }
    new Bloom(words)
  }

  def write(fs: FileSystem, path: Path, cols: Seq[(String, Bloom)],
      entryStats: Seq[(String, Map[String, (Long, Long)])] = Seq.empty,
      entryCols: Set[String] = Set.empty): Unit =
    SidecarIO.publish(fs, path) { out =>
      out.writeInt(Magic3)
      out.writeInt(cols.size)
      cols.foreach { case (name, b) =>
        out.writeUTF(name)
        out.writeInt(b.words.length)
        b.words.foreach(out.writeLong)
      }
      out.writeInt(entryStats.size)
      entryStats.foreach { case (name, keys) =>
        out.writeUTF(name)
        out.writeInt(keys.size)
        keys.foreach { case (k, (mn, mx)) =>
          out.writeUTF(k)
          out.writeLong(mn)
          out.writeLong(mx)
        }
      }
      // sorted for deterministic bytes (speculative-attempt + rebuild
      // bit-compat contracts)
      out.writeInt(entryCols.size)
      entryCols.toSeq.sorted.foreach(out.writeUTF)
    }

  /** None for a missing/unreadable/foreign sidecar (legacy files — no
    * pruning claim can be made). */
  def read(fs: FileSystem, path: Path): Option[Sidecar] =
    try {
      if (!fs.exists(path)) return None
      // A corrupt/truncated sidecar must degrade to "no pruning claim",
      // not fail planning: validate counts against the file's byte length
      // before allocating (a garbage readInt could otherwise demand a
      // negative or multi-GB array), and catch NonFatal, not just IO.
      val fileLen = fs.getFileStatus(path).getLen
      val in = new DataInputStream(fs.open(path))
      try {
        val magic = in.readInt()
        if (magic != Magic && magic != Magic2 && magic != Magic3) return None
        val n = in.readInt()
        if (n < 0 || n > 10000) return None
        val blooms = (0 until n).map { _ =>
          val name = in.readUTF()
          val wordCount = in.readInt()
          if (wordCount < 0 || wordCount.toLong * 8 > fileLen)
            return None
          val words = Array.fill(wordCount)(in.readLong())
          name -> new Bloom(words)
        }.toMap
        val stats =
          if (magic == Magic) Map.empty[String, Map[String, (Long, Long)]]
          else {
            val nc = in.readInt()
            if (nc < 0 || nc > 10000) return None
            (0 until nc).map { _ =>
              val name = in.readUTF()
              val nk = in.readInt()
              if (nk < 0 || nk.toLong * 16 > fileLen) return None
              name -> (0 until nk).map { _ =>
                in.readUTF() -> (in.readLong(), in.readLong())
              }.toMap
            }.toMap
          }
        val entryCols =
          if (magic != Magic3) None
          else {
            val ne = in.readInt()
            if (ne < 0 || ne > 10000) return None
            Some((0 until ne).map(_ => in.readUTF()).toSet)
          }
        Some(Sidecar(blooms, stats, entryCols))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Hash a predicate literal exactly as the write task hashed the
    * stored values: XxHash64 over the value cast to the column type.
    * None when the value cannot be represented (no pruning claim). */
  def hashLiteral(value: Any, dt: org.apache.spark.sql.types.DataType): Option[Long] =
    try {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      val lit = Literal.create(value, dt)
      Some(new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long])
    } catch { case scala.util.control.NonFatal(_) => None }
}
