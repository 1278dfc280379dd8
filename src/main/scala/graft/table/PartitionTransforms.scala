package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, StringType, StructType}

/** HIDDEN PARTITIONING for the versioned store — Iceberg's partition
  * transforms, scoped to the append-mostly fact-table shape.
  *
  * A `partitionBy` entry is either a plain column name (identity —
  * every existing table, fully unchanged) or a TRANSFORM spec:
  *
  *  - `days(ts)`      — partition by the day of a timestamp/date
  *                      column; rel paths carry `ts_day=1996-01-02`
  *  - `bucket16(id)`  — partition by `pmod(xxhash64(id), 16)`; paths
  *                      carry `id_bucket=7` (any bucket count)
  *  - `truncate4(sym)`— partition by a string prefix; paths carry
  *                      `sym_trunc=AAPL` (any width)
  *
  * The SOURCE column stays a normal data column in every file; the
  * DERIVED value exists only in the directory layout — users never
  * see or maintain it (the whole point: nobody forgets to add the
  * date column to their WHERE clause, because there is no date
  * column). Spec strings deliberately contain no comma, so they ride
  * the manifest's comma-joined `partitionBy=` field untouched.
  *
  * Pruning needs NO transform awareness: the store's manifest stats
  * record per-rel min/max of the SOURCE column from the data itself,
  * so `readWhere`/`readWhereDate` and the catalog's stats-pruned
  * scans skip partitions exactly as they do for identity layouts —
  * the transform's job is only to make partition boundaries ALIGN
  * with the query dimension.
  *
  * Scope (v1, enforced loudly): transform-partitioned tables support
  * full-snapshot and disjoint-partition commits, all reads, time
  * travel, schema evolution on non-source columns, and the catalog
  * CREATE/INSERT/SELECT surface. Row-level DML, upserts, layout
  * rewrites, and branches keep their identity-only contract and
  * reject with a clear message ([[VersionedTableStore]] guards) —
  * the append + read shape IS the 100 TB hidden-partitioning use
  * case (event logs, fact tables). */
object PartitionTransforms {

  sealed trait Spec {
    /** the data column the transform reads */
    def source: String
    /** the hidden column name rel paths carry */
    def derivedName: String
    /** derivation as a Column over the source */
    def derive: Column
    /** type of the derived column (for the catalog's partition schema) */
    def derivedType: DataType
    def text: String
  }

  final case class Identity(source: String) extends Spec {
    def derivedName: String = source
    def derive: Column = col(source)
    def derivedType: DataType = StringType // unused: identity keeps its own
    def text: String = source
  }

  final case class Days(source: String) extends Spec {
    def derivedName: String = s"${source}_day"
    def derive: Column = col(source).cast(DateType)
    def derivedType: DataType = DateType
    def text: String = s"days($source)"
  }

  final case class Months(source: String) extends Spec {
    def derivedName: String = s"${source}_month"
    def derive: Column = date_format(col(source), "yyyy-MM")
    def derivedType: DataType = StringType
    def text: String = s"months($source)"
  }

  final case class Years(source: String) extends Spec {
    def derivedName: String = s"${source}_year"
    def derive: Column = year(col(source)).cast(IntegerType)
    def derivedType: DataType = IntegerType
    def text: String = s"years($source)"
  }

  final case class Hours(source: String) extends Spec {
    def derivedName: String = s"${source}_hour"
    def derive: Column = date_format(col(source), "yyyy-MM-dd-HH")
    def derivedType: DataType = StringType
    def text: String = s"hours($source)"
  }

  final case class Bucket(source: String, n: Int) extends Spec {
    def derivedName: String = s"${source}_bucket"
    def derive: Column = pmod(xxhash64(col(source)), lit(n.toLong))
      .cast(IntegerType)
    def derivedType: DataType = IntegerType
    def text: String = s"bucket$n($source)"
  }

  final case class Truncate(source: String, w: Int) extends Spec {
    def derivedName: String = s"${source}_trunc"
    def derive: Column = substring(col(source), 1, w)
    def derivedType: DataType = StringType
    def text: String = s"truncate$w($source)"
  }

  private val DaysRe = """days\(([^(),\s]+)\)""".r
  private val MonthsRe = """months\(([^(),\s]+)\)""".r
  private val YearsRe = """years\(([^(),\s]+)\)""".r
  private val HoursRe = """hours\(([^(),\s]+)\)""".r
  private val BucketRe = """bucket(\d+)\(([^(),\s]+)\)""".r
  private val TruncRe = """truncate(\d+)\(([^(),\s]+)\)""".r

  def parse(entry: String): Spec = entry.trim match {
    case DaysRe(c) => Days(c)
    case MonthsRe(c) => Months(c)
    case YearsRe(c) => Years(c)
    case HoursRe(c) => Hours(c)
    case BucketRe(n, c) =>
      require(n.toInt > 0, s"bucket count must be positive: $entry")
      Bucket(c, n.toInt)
    case TruncRe(w, c) =>
      require(w.toInt > 0, s"truncate width must be positive: $entry")
      Truncate(c, w.toInt)
    case c =>
      require(!c.contains("(") && !c.contains(")"),
        s"unrecognized partition transform `$entry` (supported: " +
          "days(col), bucket<N>(col), truncate<W>(col), identity)")
      Identity(c)
  }

  def specs(partitionBy: Seq[String]): Seq[Spec] = partitionBy.map(parse)

  def isIdentityOnly(partitionBy: Seq[String]): Boolean =
    specs(partitionBy).forall(_.isInstanceOf[Identity])

  /** Hidden (non-identity) derived column names of a layout. */
  def hiddenNames(partitionBy: Seq[String]): Seq[String] =
    specs(partitionBy).collect { case s if !s.isInstanceOf[Identity] =>
      s.derivedName }

  /** Directory-layout column names (identity sources + derived). */
  def pathNames(partitionBy: Seq[String]): Seq[String] =
    specs(partitionBy).map(_.derivedName)

  /** Source data columns the layout reads (for guards/validations). */
  def sourceNames(partitionBy: Seq[String]): Seq[String] =
    specs(partitionBy).map(_.source)

  /** Validate a layout against a schema: sources exist, derived
    * names collide with nothing, transforms fit their source types. */
  def validate(partitionBy: Seq[String], schema: StructType): Unit = {
    val sp = specs(partitionBy)
    sp.foreach { s =>
      val f = schema.find(_.name == s.source).getOrElse(
        throw new IllegalArgumentException(
          s"partition transform ${s.text}: no column `${s.source}`"))
      s match {
        case _: Days | _: Months | _: Years | _: Hours => require(
          Seq("timestamp", "date", "string").contains(f.dataType.typeName),
          s"${s.text} needs a timestamp/date column, got " +
            f.dataType.sql)
        case _: Truncate => require(f.dataType.typeName == "string",
          s"${s.text} needs a string column, got ${f.dataType.sql}")
        case _ => ()
      }
      if (!s.isInstanceOf[Identity])
        require(!schema.fieldNames.contains(s.derivedName),
          s"partition transform ${s.text}: derived name " +
            s"`${s.derivedName}` collides with a data column")
    }
    require(sp.map(_.derivedName).distinct.size == sp.size,
      s"duplicate partition dimensions in $partitionBy")
  }
}
