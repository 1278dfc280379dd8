package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Stable column identity for the versioned store — the mechanism
  * behind METADATA-ONLY `RENAME COLUMN` (and safe type widening on
  * name-stable columns).
  *
  * Parquet files address columns by NAME; a rename would orphan every
  * stored value, so at 100 TB "rename" classically means a full
  * rewrite. Iceberg solves it with field IDs: every column gets an
  * integer identity at creation, files record the ID next to the
  * name, and readers match BY ID, so the logical name is free to
  * change. Spark ships both halves natively (SPARK-38094 /
  * SPARK-40055): the parquet writer stamps `parquet.field.id` from
  * StructField metadata when `spark.sql.parquet.fieldId.write.enabled`
  * (default true), and the reader matches by ID instead of name when
  * `spark.sql.parquet.fieldId.read.enabled` is set and the read
  * schema carries ID metadata. This object is the single place the
  * store converts its manifest's (name -> id) ledger into that
  * metadata.
  *
  * Invariant the store maintains: a manifest with a non-empty
  * `fieldIds` ledger references ONLY data files written with IDs.
  * IDs are first assigned by a FULL commit (create / replace /
  * compact — every live file is rewritten by that very commit);
  * delta and staged commits CARRY the parent's ledger and stamp
  * their own files; a pre-feature table (empty ledger) keeps writing
  * unstamped files and simply cannot be renamed until a full rewrite
  * assigns identities. Under that invariant the read side can stamp
  * IDs whenever the ledger is non-empty: before any rename it is a
  * behavioral no-op (ID matching and name matching agree), and after
  * a rename it is exactly what resolves old files under new names.
  * An ID-less file slipping under an ID-stamped read schema fails
  * LOUDLY (Spark raises FAILED_READ_FILE, never returns wrong rows).
  */
object FieldIds {

  /** The metadata key Spark's parquet reader/writer honor. */
  val MetaKey = "parquet.field.id"

  /** Schema with `parquet.field.id` metadata merged onto every field
    * present in the ledger (identity when the ledger is empty).
    * Existing field metadata is preserved. */
  def stamp(schema: StructType, ids: Seq[(String, Int)]): StructType =
    if (ids.isEmpty) schema
    else {
      val byName = ids.toMap
      StructType(schema.map { f =>
        byName.get(f.name).fold(f) { id =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(MetaKey, id.toLong).build())
        }
      })
    }

  /** Projection that re-aliases every ledgered column with its ID
    * metadata — the write-side stamp for driver-side
    * `df.write.parquet` paths (a bare alias keeps codegen and
    * pushdown lineage intact; no RDD round-trip). */
  def stampDf(df: DataFrame, ids: Seq[(String, Int)]): DataFrame =
    if (ids.isEmpty) df
    else {
      val byName = ids.toMap
      df.select(df.schema.fields.toIndexedSeq.map { f =>
        byName.get(f.name) match {
          case Some(id) =>
            val meta = new MetadataBuilder().withMetadata(f.metadata)
              .putLong(MetaKey, id.toLong).build()
            col(f.name).as(f.name, meta)
          case None => col(f.name)
        }
      }: _*)
    }

  /** Ledger for a commit's schema given the parent's ledger: a name
    * already ledgered keeps its ID (identity is stable across
    * compaction and replace — what keeps a rename durable through a
    * later full rewrite), a new name mints the next ID past the
    * ledger's max. IDs are NEVER reused: a dropped column's ID stays
    * in the ledger as a TOMBSTONE entry (empty name — unmatchable by
    * any field, invisible to stamp()), so a metadata-only DROP +
    * re-ADD mints a FRESH ID and the re-added column correctly reads
    * NULL from retained files instead of resurrecting the dropped
    * column's stored values by ID match. Tombstone count is bounded
    * by the distinct columns the table has ever had. */
  def assign(names: Seq[String], parent: Seq[(String, Int)]): Seq[(String, Int)] = {
    val byName = parent.filter(_._1.nonEmpty).toMap
    var next = if (parent.isEmpty) 0 else parent.map(_._2).max
    val kept = names.map { n =>
      byName.get(n) match {
        case Some(id) => n -> id
        case None => next += 1; n -> next
      }
    }
    val liveIds = kept.map(_._2).toSet
    // every previously-used ID not carried forward becomes (or stays)
    // a tombstone
    val tombstones = parent.collect {
      case (_, id) if !liveIds.contains(id) => "" -> id
    }.distinctBy(_._2)
    kept ++ tombstones
  }

  /** Does `field` carry ID metadata already? (Guards double-stamping
    * and lets bridges detect an already-stamped schema.) */
  def carries(f: StructField): Boolean =
    f.metadata.contains(MetaKey)

  /** The engine-owned metadata keys that must never leave the
    * plan/file boundary: field IDs and the two DEFAULT ledger keys
    * (see [[ColumnDefaults]]). */
  private def boundaryKeys: Seq[String] =
    Seq(MetaKey, ColumnDefaults.ExistsKey, ColumnDefaults.CurrentKey)

  private def carriesAny(f: StructField): Boolean =
    boundaryKeys.exists(f.metadata.contains)

  private def cleaned(f: StructField): StructField = {
    val mb = new MetadataBuilder().withMetadata(f.metadata)
    boundaryKeys.foreach(mb.remove)
    f.copy(metadata = mb.build())
  }

  /** Schema with every engine-owned boundary key removed (identity
    * when none present) — for scan-output schemas. */
  def stripSchema(schema: StructType): StructType =
    if (!schema.exists(carriesAny)) schema
    else StructType(schema.map(f => if (carriesAny(f)) cleaned(f) else f))

  /** Projection that REMOVES boundary metadata from every column
    * carrying it (identity when none does). IDs and defaults belong
    * at the file-matching boundary only: a scan's OUTPUT must be
    * clean, or the metadata leaks into downstream writes (a changelog
    * stage, a CTAS into a different table) and stamps foreign
    * identities or defaults onto tables that never declared them —
    * the read stamps, the result strips. */
  def stripDf(df: DataFrame): DataFrame =
    if (!df.schema.exists(carriesAny)) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      if (!carriesAny(f)) col(f.name)
      else col(f.name).as(f.name, cleaned(f).metadata)
    }: _*)
}
