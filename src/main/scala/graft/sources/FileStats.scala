package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Per-column min/max recorded per file in the snapshot manifest —
  * manifest-level data skipping on NON-partition columns, the analogue of
  * the reference format's per-file field stats that
  * PrestoFilterConverter-converted predicates prune against. Collected
  * from parquet footers (no data read); at real scale the writing tasks
  * would report these with the commit message instead of a driver-side
  * footer sweep.
  *
  * `nullCount` domain (S39 null skipping): 0 = PROVABLY no nulls (IS
  * NULL prunes the file); > 0 = that many nulls; -1 = unknown (footer
  * did not report — never prune on it). An ALL-null column records
  * min = max = null with its nullCount — IS NOT NULL and every
  * value predicate prune such a file. (The pre-S39 writer encoded
  * footer-omitted counts as 0; no such manifests persist — every graft
  * table here is created fresh by the current writer, and parquet-mr /
  * ORC always report null counts for the files our write path stages —
  * but a migration from foreign manifests would need a stats version.)
  */
final case class ColStats(min: String, max: String, nullCount: Long) {
  // @JsonIgnore: a bean-shaped def would otherwise serialize into the
  // manifest and break deserialization (unknown property)
  @com.fasterxml.jackson.annotation.JsonIgnore
  def isAllNull: Boolean = min == null && nullCount > 0
}

/** Everything the manifest records from one written file's footer. */
final case class FileFooter(stats: Map[String, ColStats], rowCount: Long)

object FileStats {

  /** Read min/max per primitive column (and the file's row count) from a
    * parquet file footer, merged across row groups. Values serialize as
    * strings; the column's Spark type (from the table schema) defines the
    * comparison domain. */
  def fromFooter(conf: Configuration, file: Path): FileFooter = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      // (min, max) null for an all-null chunk; nullCount -1 once any
      // chunk's footer omits the count (unknown poisons the sum). A
      // chunk with NO stats object at all poisons the whole column —
      // min/max merged from the other chunks would miss its values and
      // wrongly prune (its null state is equally unknowable).
      val acc = scala.collection.mutable.Map[String,
        (Comparable[Any], Comparable[Any], Long, org.apache.parquet.schema.PrimitiveType)]()
      val poisoned = scala.collection.mutable.Set[String]()
      for (block <- blocks; col <- block.getColumns.asScala) {
        val stats = col.getStatistics
        val name = col.getPath.toDotString
        if (stats == null || (!stats.hasNonNullValue && !stats.isNumNullsSet)) {
          poisoned += name
        } else {
          val tpe = col.getPrimitiveType
          val mn: Comparable[Any] =
            if (stats.hasNonNullValue) stats.genericGetMin.asInstanceOf[Comparable[Any]] else null
          val mx: Comparable[Any] =
            if (stats.hasNonNullValue) stats.genericGetMax.asInstanceOf[Comparable[Any]] else null
          val nulls = if (stats.isNumNullsSet) stats.getNumNulls else -1L
          def addNulls(a: Long, b: Long): Long = if (a < 0 || b < 0) -1L else a + b
          def lesser(a: Comparable[Any], b: Comparable[Any]): Comparable[Any] =
            if (a == null) b else if (b == null) a else if (a.compareTo(b) < 0) a else b
          def greater(a: Comparable[Any], b: Comparable[Any]): Comparable[Any] =
            if (a == null) b else if (b == null) a else if (a.compareTo(b) > 0) a else b
          acc.get(name) match {
            case None => acc(name) = (mn, mx, nulls, tpe)
            case Some((omn, omx, on, t)) =>
              acc(name) = (lesser(mn, omn), greater(mx, omx), addNulls(on, nulls), t)
          }
        }
      }
      val stats = acc.flatMap { case (name, (mn, mx, nulls, tpe)) =>
        if (poisoned(name)) None // a stats-less chunk: nothing provable
        // raw BINARY (no string/decimal annotation) is opaque bytes —
        // sketch states, media blobs: min/max rendered into the UTF8
        // string domain would be garbage that bloats manifests and
        // compares in the wrong domain; record nothing (L63)
        else if (tpe.getPrimitiveTypeName == PrimitiveTypeName.BINARY &&
            tpe.getLogicalTypeAnnotation == null) None
        else if (mn == null && nulls <= 0) None // nothing provable about this column
        else Some(name -> ColStats(
          if (mn == null) null else render(mn, tpe),
          if (mx == null) null else render(mx, tpe), nulls))
      }.toMap
      FileFooter(stats, blocks.map(_.getRowCount).sum)
    } finally reader.close()
  }

  private def render(v: Any, tpe: org.apache.parquet.schema.PrimitiveType): String =
    tpe.getLogicalTypeAnnotation match {
      // decimal stats (INT32/INT64/FIXED/BINARY carry the unscaled value)
      // serialize as plain BigDecimal strings, the manifest's comparison
      // domain for decimal pruning (ref: the decimal TupleDomains of
      // PrestoFilterConverter.java / testDecimalPredicate)
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        val unscaled = v match {
          case b: Binary => new java.math.BigInteger(b.getBytes)
          case i: java.lang.Integer => java.math.BigInteger.valueOf(i.longValue)
          case l: java.lang.Long => java.math.BigInteger.valueOf(l)
          case other => return String.valueOf(other)
        }
        new java.math.BigDecimal(unscaled, d.getScale).toPlainString
      case _ => v match {
        case b: Binary if tpe.getPrimitiveTypeName == PrimitiveTypeName.BINARY => b.toStringUsingUTF8
        case b: Binary => b.toString
        case other => String.valueOf(other)
      }
    }

  /** ORC analogue of `fromFooter`: min/max per top-level column from the
    * ORC reader's file statistics. Rendered into the SAME string domains
    * as the parquet path (plain numbers, BigDecimal strings, epoch-day
    * ints) so `mayMatch` needs no format awareness. Timestamp stats are
    * skipped (ORC reports millis, the pruning domain is micros —
    * conservative no-prune beats a wrong unit). */
  def fromOrcFooter(conf: Configuration, file: Path): FileFooter = {
    import org.apache.orc.{ColumnStatistics => OrcStats, _}
    val reader = OrcFile.createReader(file, OrcFile.readerOptions(conf))
    try {
      val root = reader.getSchema
      val all = reader.getStatistics
      val totalRows = reader.getNumberOfRows
      val names = root.getFieldNames.asScala.toSeq
      val children = root.getChildren.asScala.toSeq
      // struct children recurse under the parquet dotted-path rendering
      // (r.f) so ORC tables get the same nested-leaf skipping; ORC's
      // per-column value counts exclude rows where an ancestor struct is
      // null, so nullCount matches Spark's `r.f IS NULL` like parquet's
      def walk(name: String, child: org.apache.orc.TypeDescription): Seq[(String, ColStats)] = {
        val s: OrcStats = all(child.getId)
        val mm: Option[(String, String)] = s match {
          case i: IntegerColumnStatistics =>
            Some((i.getMinimum.toString, i.getMaximum.toString))
          case d: DoubleColumnStatistics =>
            Some((d.getMinimum.toString, d.getMaximum.toString))
          case st: StringColumnStatistics if st.getMinimum != null =>
            Some((st.getMinimum, st.getMaximum))
          case dec: DecimalColumnStatistics if dec.getMinimum != null =>
            Some((dec.getMinimum.bigDecimalValue.toPlainString,
              dec.getMaximum.bigDecimalValue.toPlainString))
          case dt: DateColumnStatistics =>
            Some((dt.getMinimumDayOfEpoch.toString, dt.getMaximumDayOfEpoch.toString))
          case _ => None
        }
        val own: Option[(String, ColStats)] =
          if (s.getNumberOfValues == 0 && totalRows > 0)
            Some(name -> ColStats(null, null, totalRows)) // all-null column (S39)
          else mm.filter(_ => s.getNumberOfValues > 0).map { case (mn, mx) =>
            name -> ColStats(mn, mx, totalRows - s.getNumberOfValues)
          }
        val nested =
          if (child.getCategory == org.apache.orc.TypeDescription.Category.STRUCT)
            child.getFieldNames.asScala.toSeq.zip(child.getChildren.asScala.toSeq)
              .flatMap { case (fn, fc) => walk(s"$name.$fn", fc) }
          else Seq.empty
        own.toSeq ++ nested
      }
      val stats = names.zip(children).flatMap { case (n, c) => walk(n, c) }.toMap
      FileFooter(stats, totalRows)
    } finally reader.close()
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** Split a filter attribute into path parts, honoring backtick
    * quoting: dots INSIDE a backtick pair are part of the name (`a.b` is
    * one top-level column; `a`.`b` is a struct walk), and a doubled
    * backtick inside a quoted part is a literal backtick. A naive
    * split('.') would resolve a dotted COLUMN NAME through the struct
    * walk and prune files with the wrong field's stats. */
  private[sources] def splitAttr(attr: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inTick = false
    var i = 0
    while (i < attr.length) {
      val ch = attr.charAt(i)
      if (ch == '`') {
        if (inTick && i + 1 < attr.length && attr.charAt(i + 1) == '`') {
          sb.append('`'); i += 1
        } else inTick = !inTick
      } else if (ch == '.' && !inTick) { out += sb.result(); sb.clear() }
      else sb.append(ch)
      i += 1
    }
    out += sb.result()
    out.toSeq
  }

  private def walkParts(schema: StructType, parts: Seq[String]): Option[StructField] =
    if (parts.length < 2) None
    else parts.tail.foldLeft(schema.fields.find(_.name == parts.head)) { (cur, p) =>
      cur.flatMap(_.dataType match {
        case st: StructType => st.fields.find(_.name == p)
        case _ => None
      })
    }

  /** True when the DOTTED stats key `key` is reachable both as a
    * top-level column name (a name containing literal dots) and as a
    * struct walk — the footer stats map (ColumnPath.toDotString keys)
    * then holds ONE entry for two physical columns, so no claim keyed by
    * it can be attributed. */
  private[sources] def keyCollides(schema: StructType, key: String): Boolean =
    key.contains('.') && schema.fieldNames.contains(key) &&
      walkParts(schema, key.split('.').toSeq).isDefined

  /** Resolve a (possibly nested) filter attribute to its leaf field:
    * the exact top-level name, or a dotted path walked through struct
    * types — parquet footers record nested leaves under exactly this
    * dotted rendering (ColumnPath.toDotString), so `r.f` stats prune
    * `r.f` predicates. Backticked parts (`a`.`b`) normalize to the
    * plain path, with quoting honored: `a.b` is the dotted COLUMN, not
    * the walk. Whenever the dotted rendering collides (a column named
    * "a.b" coexisting with struct a's field b), resolution declines —
    * the stats-map entry under that key is unattributable. */
  private[sources] def resolveField(schema: StructType, attr: String): Option[StructField] = {
    val parts = splitAttr(attr)
    if (keyCollides(schema, parts.mkString("."))) return None
    if (attr.contains('`')) {
      // quoting is authoritative: one part = that exact name, several =
      // the struct walk
      if (parts.length == 1) schema.fields.find(_.name == parts.head)
      else walkParts(schema, parts)
    } else
      schema.fields.find(_.name == attr).orElse(walkParts(schema, parts))
  }

  /** Can `filter` possibly match a file with these stats? Conservative:
    * unknown columns/types/filters ⇒ true (no prune). */
  def mayMatch(filter: Filter, stats: Map[String, ColStats], schema: StructType): Boolean = {
    // S39 null skipping: an all-null column fails every VALUE predicate
    // and IS NOT NULL; a provably-null-free column (nullCount == 0,
    // known — -1 is unknown) fails IS NULL
    // parquet leaf null counts include rows where an ANCESTOR struct is
    // null — matching Spark's `r.f IS NULL` semantics exactly
    def allNull(attr: String): Boolean = statsFor(attr).exists(_.isAllNull)
    // nested attrs ("r.f") key the stats map by the parquet dotted path;
    // normalize a backticked plan rendering to it (quote-aware split —
    // a literal dot inside backticks stays part of the name), declining
    // entirely when the dotted key is schema-ambiguous (keyCollides)
    def statsFor(attr: String): Option[ColStats] = {
      val key = splitAttr(attr).mkString(".")
      if (keyCollides(schema, key)) None else stats.get(key)
    }
    def bounds(attr: String): Option[(Any, Any, DataType)] =
      for {
        cs <- statsFor(attr)
        if cs.min != null && cs.max != null
        field <- resolveField(schema, attr)
        mn <- parse(cs.min, field.dataType)
        mx <- parse(cs.max, field.dataType)
      } yield (mn, mx, field.dataType)

    def cmp(dt: DataType, a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Int, y: Int) => Some(x.compareTo(y))
      case (x: Long, y: Long) => Some(x.compareTo(y))
      case (x: Double, y: Double) => Some(x.compareTo(y))
      case (x: Float, y: Float) => Some(x.compareTo(y))
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => Some(x.compareTo(y))
      // parquet orders string stats by unsigned UTF-8 bytes; Java compareTo
      // is UTF-16 code units. The two orders agree only on pure ASCII.
      case (x: String, y: String) if isAscii(x) && isAscii(y) => Some(x.compareTo(y))
      case _ => None
    }
    // normalize a literal from the filter into the stats domain
    def lit(dt: DataType, v: Any): Option[Any] = (dt, v) match {
      case (IntegerType, x: Int) => Some(x)
      case (LongType, x: Long) => Some(x)
      case (LongType, x: Int) => Some(x.toLong)
      case (DoubleType, x: Double) => Some(x)
      case (FloatType, x: Float) => Some(x)
      case (StringType, x: String) => Some(x)
      case (TimestampType, x: java.sql.Timestamp) =>
        Some(x.getTime * 1000L + (x.getNanos / 1000) % 1000)
      case (TimestampType, x: java.time.Instant) =>
        Some(x.getEpochSecond * 1000000L + x.getNano / 1000)
      case (DateType, x: java.sql.Date) => Some(x.toLocalDate.toEpochDay.toInt)
      case (DateType, x: java.time.LocalDate) => Some(x.toEpochDay.toInt)
      case (_: DecimalType, x: java.math.BigDecimal) => Some(x)
      case (_: DecimalType, x: BigDecimal) => Some(x.underlying)
      case _ => None
    }

    filter match {
      case IsNull(a) =>
        // keep unless the column provably has no nulls in this file
        statsFor(a).forall(_.nullCount != 0L)
      case IsNotNull(a) => !allNull(a)
      case EqualNullSafe(a, null) => statsFor(a).forall(_.nullCount != 0L)
      case EqualNullSafe(a, v) =>
        if (allNull(a)) false else mayMatch(EqualTo(a, v), stats, schema)
      // value predicates: NULL input yields NULL → row dropped, so an
      // all-null referenced column proves no row can pass (leaf cases
      // ONLY — composites recurse through And/Or below, where an
      // embedded IsNull branch may still match)
      case EqualTo(a, v) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (mn, mx, dt) =>
          for (l <- lit(dt, v); c1 <- cmp(dt, l, mn); c2 <- cmp(dt, l, mx))
            yield c1 >= 0 && c2 <= 0
        }.getOrElse(true)
      case In(a, vs) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (mn, mx, dt) =>
          val checks = vs.toSeq.map(v =>
            for (l <- lit(dt, v); c1 <- cmp(dt, l, mn); c2 <- cmp(dt, l, mx))
              yield c1 >= 0 && c2 <= 0)
          if (checks.exists(_.isEmpty)) None else Some(checks.flatten.exists(identity))
        }.getOrElse(true)
      case GreaterThan(a, v) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (_, mx, dt) =>
          for (l <- lit(dt, v); c <- cmp(dt, mx, l)) yield c > 0
        }.getOrElse(true)
      case GreaterThanOrEqual(a, v) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (_, mx, dt) =>
          for (l <- lit(dt, v); c <- cmp(dt, mx, l)) yield c >= 0
        }.getOrElse(true)
      case LessThan(a, v) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (mn, _, dt) =>
          for (l <- lit(dt, v); c <- cmp(dt, mn, l)) yield c < 0
        }.getOrElse(true)
      case LessThanOrEqual(a, v) =>
        if (allNull(a)) false
        else bounds(a).flatMap { case (mn, _, dt) =>
          for (l <- lit(dt, v); c <- cmp(dt, mn, l)) yield c <= 0
        }.getOrElse(true)
      case And(l, r) => mayMatch(l, stats, schema) && mayMatch(r, stats, schema)
      case Or(l, r) => mayMatch(l, stats, schema) || mayMatch(r, stats, schema)
      case _ => true
    }
  }

  /** Parse a rendered stat back into the comparison domain of `dt`.
    * TimestampType stats are parquet INT64 micros; DateType INT32 days.
    * Null stats (an all-null column's entry, S39) parse to None. */
  private[sources] def parse(s: String, dt: DataType): Option[Any] = if (s == null) None else dt match {
    case IntegerType | DateType => s.toIntOption
    case LongType | TimestampType => s.toLongOption
    case DoubleType => s.toDoubleOption
    case FloatType => s.toFloatOption
    case StringType => Some(s)
    case _: DecimalType => scala.util.Try(new java.math.BigDecimal(s)).toOption
    case _ => None
  }
}
