package graft.table

/** Executor-safe metadata-plane primitives: the stats-sidecar line codec
  * and the per-file data-skipping decision, shared VERBATIM by the
  * driver-side fold ([[ManagedTable]]'s `readSidecarFile`/`overlapKept`)
  * and the distributed prune (`keptByStatsDistributed`, the huge-file-
  * count regime where snapshot state is read as a Spark job the way
  * Delta reads its checkpoints). One implementation, two execution
  * venues — the distributed path can never drift from the driver
  * semantics, because both call these functions.
  *
  * Everything here is pure and serializable: no SparkSession, no
  * FileSystem, no table state. Session-dependent inputs (the session
  * time zone for timestamp-predicate coercion) are decoded ON THE DRIVER
  * into [[MetadataPlane.Bounds]] and shipped as plain data.
  */
/** Java-serializable carrier for a Hadoop Configuration (which is only
  * Writable): broadcast the SESSION's conf to executor-side FileSystem
  * opens — a fresh `new Configuration()` in a task would drop every
  * spark.hadoop.* credential/endpoint/fs-impl override and, on object
  * stores, resolve a differently-configured (or failing) filesystem.
  */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object MetadataPlane extends Serializable {

  /** One column's per-file stats cell: (kind, min, max, nullCount).
    * Kinds: "i" integral, "d" double, "s" utf8 string, "D" epoch-day,
    * "T" instant-micros, "t" local-micros, "n" bounds-unusable.
    */
  type Stat = (String, String, String, Long)

  /** One file's sidecar entry. */
  final case class Entry(path: String, len: Long, rows: Long,
                         stats: Map[String, Stat])

  /** v2 format marker (see ManagedTable's sidecar scaladoc: '%' is
    * URLEncoder-escaped, so no encoded column name can collide with it).
    */
  val sidecarV2 = "%v2"

  def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  /** The stat cells of one entry, tab-joined — the payload both the v2
    * sidecar line (after its `path len rows %v2` prefix) and the parquet
    * checkpoint's `stats` column carry.
    */
  def statsCells(stats: Map[String, Stat]): String =
    stats.toSeq.sortBy(_._1).flatMap { case (c, (k, mn, mx, nulls)) =>
      Seq(enc(c), k, enc(mn), enc(mx), nulls.toString) }.mkString("\t")

  /** Inverse of [[statsCells]]; tolerant of a short trailing group. */
  def parseStatsCells(s: String): Map[String, Stat] =
    if (s.isEmpty) Map.empty
    else s.split('\t').toSeq.grouped(5).collect {
      case Seq(c, k, mn, mx, nulls) => dec(c) -> (k, dec(mn), dec(mx), nulls.toLong)
    }.toMap

  /** v2 line: `path len rows %v2 (col kind min max nulls)*`. */
  def sidecarLine(e: Entry): String =
    (Seq(e.path, e.len.toString, e.rows.toString, sidecarV2) ++
      (if (e.stats.isEmpty) Nil else Seq(statsCells(e.stats)))).mkString("\t")

  /** Parse one sidecar line (v2, or legacy v1 with 4-cell stat groups and
    * no null counts); a torn line (crash mid-write) degrades to None — a
    * cache miss, never a failure.
    */
  def parseLine(l: String): Option[Entry] =
    scala.util.Try(l.split('\t') match {
      case Array(p, len, rows, `sidecarV2`, rest @ _*) =>
        val stats = rest.grouped(5).collect {
          case Seq(c, k, mn, mx, nulls) =>
            dec(c) -> (k, dec(mn), dec(mx), nulls.toLong)
        }.toMap
        Some(Entry(p, len.toLong, rows.toLong, stats))
      case Array(p, len, rows, rest @ _*) =>
        val stats = rest.grouped(4).collect {
          case Seq(c, k, mn, mx) => dec(c) -> (k, dec(mn), dec(mx), -1L)
        }.toMap
        Some(Entry(p, len.toLong, rows.toLong, stats))
      case _ => None
    }).toOption.flatten

  /** Unsigned UTF-8 byte order — parquet's binary-stats ordering (UTF-16
    * code-unit order disagrees for supplementary characters).
    */
  def utf8Leq(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }

  /** Numeric stat order via double (Infinity-safe; monotonic rounding for
    * huge longs only creates ties, which keep files — conservative).
    * NaN compares keep the file.
    */
  def numLeq(a: String, b: String): Boolean = {
    val x = java.lang.Double.parseDouble(a); val y = java.lang.Double.parseDouble(b)
    if (x.isNaN || y.isNaN) true else x <= y
  }

  /** One range predicate's bounds, pre-decoded on the driver: raw string
    * forms for the i/d/s kinds plus the epoch-day and epoch-micro
    * decodings (None when the user value doesn't coerce — per-kind
    * conservative keep). Built once per predicate by [[decodeBounds]];
    * executors only compare.
    */
  final case class Bounds(loRaw: String, hiRaw: String,
                          day: Option[(Long, Long)],
                          microsUtc: Option[(Long, Long)],
                          microsNtz: Option[(Long, Long)])

  private def toEpochDay(v: Any): Option[Long] = v match {
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case x => scala.util.Try(
      java.time.LocalDate.parse(x.toString).toEpochDay).toOption
  }

  /** Timestamp decode with the SAME semantics Catalyst's cast applies
    * downstream: instant ("T") stats compare in UTC micros, NTZ ("t") in
    * local micros; cross-semantics coercion goes through `zone` (the
    * session time zone).
    */
  private def toMicros(v: Any, utcKind: Boolean, zone: String): Option[Long] = {
    def sessionZone = java.time.ZoneId.of(zone)
    def ofInstant(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong)
    def ofLocal(l: java.time.LocalDateTime): Long =
      if (utcKind) ofInstant(l.atZone(sessionZone).toInstant)
      else Math.addExact(Math.multiplyExact(
        l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        (l.getNano / 1000).toLong)
    v match {
      case t: java.sql.Timestamp =>
        if (utcKind) Some(ofInstant(t.toInstant))
        else Some(ofLocal(t.toInstant.atZone(sessionZone).toLocalDateTime))
      case i: java.time.Instant =>
        if (utcKind) Some(ofInstant(i))
        else Some(ofLocal(i.atZone(sessionZone).toLocalDateTime))
      case l: java.time.LocalDateTime => Some(ofLocal(l))
      case d: java.time.LocalDate => Some(ofLocal(d.atStartOfDay))
      case d: java.sql.Date => Some(ofLocal(d.toLocalDate.atStartOfDay))
      case x => scala.util.Try {
        val s = x.toString.trim.replace(' ', 'T')
        scala.util.Try(java.time.LocalDateTime.parse(s))
          .getOrElse(java.time.LocalDate.parse(s).atStartOfDay)
      }.toOption.map(ofLocal)
    }
  }

  /** Decode a user-space [lo, hi] once; None for a null bound (a null
    * bound can't prune — SQL comparisons to null match nothing, the exact
    * predicate downstream decides).
    */
  def decodeBounds(lo: Any, hi: Any, zone: String): Option[Bounds] =
    if (lo == null || hi == null) None
    else Some(Bounds(lo.toString, hi.toString,
      for { l <- toEpochDay(lo); h <- toEpochDay(hi) } yield (l, h),
      for { l <- toMicros(lo, utcKind = true, zone)
            h <- toMicros(hi, utcKind = true, zone) } yield (l, h),
      for { l <- toMicros(lo, utcKind = false, zone)
            h <- toMicros(hi, utcKind = false, zone) } yield (l, h)))

  /** One skipping predicate, bounds pre-decoded on the driver. The
    * column name is the PHYSICAL stats key (callers translate through
    * the column mapping before constructing these).
    */
  sealed trait Pred extends Serializable
  /** Range [lo, hi]; None bounds = a null user bound, which can't prune. */
  final case class RangePred(col: String, bounds: Option[Bounds]) extends Pred
  /** `col IS NULL`: a file with a recorded null count of 0 prunes;
    * unknown (-1) or missing stats keep it. */
  final case class NullPred(col: String) extends Pred
  /** `col IS NOT NULL`: an all-null file prunes. */
  final case class NotNullPred(col: String) extends Pred

  /** One column's running ANALYZE aggregate: the associative fold both
    * [[ManagedTable.columnStats]] venues reduce per-file stats with —
    * kind `"!"` marks mixed/unusable bounds (the column's files disagree
    * on stat kind, or the kind carries no usable order), `nulls == -1`
    * marks an unknown null count, `known` counts files carrying stats
    * for the column. Formatting (display decode, missing-file bound
    * suppression) happens once, driver-side, from the reduced aggregates.
    */
  final case class ColAgg(kind: String, mn: String, mx: String,
                          nulls: Long, known: Long)

  /** Stat kinds whose bounds carry a usable order — shared by the merge
    * below AND the display gate in ManagedTable.formatColumnStats, so a
    * new kind can't silently pass one and not the other.
    */
  val usableKinds = Set("i", "d", "s", "D", "T", "t")

  def colAgg(s: Stat): ColAgg = ColAgg(s._1, s._2, s._3, s._4, 1L)

  /** Associative, commutative merge of two [[ColAgg]]s. */
  def mergeColAgg(a: ColAgg, b: ColAgg): ColAgg = {
    val nulls = if (a.nulls < 0 || b.nulls < 0) -1L else a.nulls + b.nulls
    val known = a.known + b.known
    if (a.kind != b.kind || !usableKinds(a.kind))
      ColAgg(if (a.kind == b.kind) a.kind else "!", "", "", nulls, known)
    else {
      val leq: (String, String) => Boolean = a.kind match {
        case "s" => utf8Leq
        case "T" | "t" => (x, y) => x.toLong <= y.toLong
        case _ => numLeq
      }
      ColAgg(a.kind,
        if (leq(a.mn, b.mn)) a.mn else b.mn,
        if (leq(a.mx, b.mx)) b.mx else a.mx,
        nulls, known)
    }
  }

  /** The trailing `col=value` run of a file path's parent dirs, unescaped
    * — executor-safe (pure path parsing, shared by the driver fold and
    * the distributed SHOW PARTITIONS job).
    */
  def partitionSegments(p: String): Seq[(String, String)] =
    p.split('/').dropRight(1).reverse.takeWhile(_.contains('='))
      .reverse.toSeq.map { s =>
        val i = s.indexOf('=')
        (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(s.substring(0, i)),
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(s.substring(i + 1)))
      }

  /** The whole keep decision for one file against a conjunction of
    * predicates: not fully bitmap-deleted, and every predicate admits
    * the file. ONE implementation for the driver fold, the driver-side
    * churn-since-checkpoint handling and the executor flatMap — the
    * venues must never drift.
    */
  def decide(stats: Map[String, Stat], rows: Long, deleted: Long,
             preds: Seq[Pred]): Boolean =
    deleted < rows && preds.forall {
      case RangePred(c, b) => b.forall(bb => keepForRange(stats.get(c), rows, bb))
      case NullPred(c) => stats.get(c).forall(_._4 != 0L)
      case NotNullPred(c) => !stats.get(c).exists(_._4 >= rows)
    }

  /** THE per-file skipping decision for one predicate: may this file hold
    * a row in [lo, hi]? Missing/unusable stats keep the file
    * (conservative, never wrong); an all-null column cannot match a range
    * predicate and prunes. `rows` is the file's physical row count.
    */
  def keepForRange(stat: Option[Stat], rows: Long, b: Bounds): Boolean =
    stat match {
      case Some(("D", mn, mx, _)) => b.day match {
        case Some((l, h)) => mn.toDouble <= h && l <= mx.toDouble
        case None => true
      }
      // exact Long compare: micros overflow double's 53-bit mantissa for
      // dates past ~2255, and a rounded bound could WRONGLY prune
      case Some((k @ ("T" | "t"), mn, mx, _)) =>
        (if (k == "T") b.microsUtc else b.microsNtz) match {
          case Some((l, h)) => mn.toLong <= h && l <= mx.toLong
          case None => true
        }
      // no usable bounds — but a column that is ALL null in this file
      // cannot match a range predicate: prune; otherwise conservative
      case Some(("n", _, _, nulls)) => nulls < rows
      case Some((k, mn, mx, _)) =>
        val leq: (String, String) => Boolean =
          if (k == "s") utf8Leq else numLeq
        leq(mn, b.hiRaw) && leq(b.loRaw, mx)
      case None => true
    }
}
