package graft.table

import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructType}

/** Column DEFAULT values for the versioned store — the Iceberg/Delta
  * "initial default" semantic, metadata-only.
  *
  * `ADD COLUMN c INT DEFAULT 42` on a 100 TB table must not rewrite
  * it, yet pre-existing rows must read 42 (not NULL). A read-side
  * `coalesce(c, 42)` cannot express this: a file WRITTEN WITH the
  * column may legitimately hold NULLs that must stay NULL. Spark's
  * parquet readers implement the exact per-file semantic natively:
  * when a read-schema field carries `EXISTS_DEFAULT` metadata, a file
  * LACKING the column materializes the default, while a file holding
  * the column serves its stored values verbatim (SPARK-39985 family).
  * The store therefore keeps two SQL-literal strings per defaulted
  * column in the manifest:
  *
  *  - '''exists''' — FROZEN at ADD COLUMN time; what pre-add files
  *    read. Never changes afterwards (changing it would rewrite
  *    history's meaning).
  *  - '''current''' — what an INSERT that omits the column (or says
  *    `DEFAULT`) fills; `ALTER COLUMN ... SET/DROP DEFAULT` moves it
  *    freely. Surfaced as `CURRENT_DEFAULT` metadata on the catalog
  *    schema, where Spark's own ResolveDefaultColumns applies it at
  *    INSERT resolution.
  *
  * Like field IDs ([[FieldIds]]), the metadata lives at the
  * plan/file boundary only: scan outputs are stripped so downstream
  * writes never inherit a table's defaults.
  */
object ColumnDefaults {

  val ExistsKey: String =
    ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY
  val CurrentKey: String =
    ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY

  /** Schema with EXISTS/CURRENT default metadata merged onto the
    * ledgered fields. Either half may be empty ("" = no such
    * default): a SET DEFAULT on a column added without one carries a
    * current-only entry (pre-existing files keep reading NULL — their
    * truth), and a DROP DEFAULT leaves an exists-only entry. */
  def stamp(schema: StructType,
      defaults: Seq[(String, String, String)]): StructType =
    if (defaults.isEmpty) schema
    else {
      val byName = defaults.map(d => d._1 -> d).toMap
      StructType(schema.map { f =>
        byName.get(f.name).fold(f) { case (_, exists, current) =>
          val mb = new MetadataBuilder().withMetadata(f.metadata)
          if (exists.nonEmpty) mb.putString(ExistsKey, exists)
          if (current.nonEmpty) mb.putString(CurrentKey, current)
          f.copy(metadata = mb.build())
        }
      })
    }

  /** Validate `sql` as a constant-foldable literal castable to
    * `dataType` — delegating to the same analysis Spark applies to
    * DEFAULT clauses, so the store accepts exactly what SQL would.
    * Throws AnalysisException otherwise. */
  def validate(colName: String, dataType: DataType, sql: String): Unit = {
    ResolveDefaultColumns.analyze(colName, dataType, sql,
      "ALTER TABLE ADD COLUMN")
    ()
  }
}
