package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are sized for the test harness (local[32],
  * 32 shuffle partitions); on a real cluster the same builder is used
  * with master/shuffle-partitions supplied by spark-submit. AQE stays
  * on so shuffle partition counts self-tune at scale (coalescing +
  * skew-join splitting).
  */
object Sessions {

  /** Configs every graft session needs regardless of master.
    *
    * `nanosAsLong` is required because the synthetic `events` table
    * stores TIMESTAMP(NANOS) parquet, which Spark otherwise refuses
    * to read (PARQUET_TYPE_ILLEGAL); we read nanos as Long and derive
    * microsecond timestamps (see [[Tables.events]]).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // column-identity reads (metadata-only RENAME COLUMN): the store
    // stamps parquet field IDs on its read schemas; matching by ID is
    // what serves pre-rename files under post-rename names. Only
    // schemas CARRYING ID metadata change behavior, so this is inert
    // for every other read. See graft.table.FieldIds.
    .config("spark.sql.parquet.fieldId.read.enabled", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // Broadcast policy (r15): the STATIC threshold stays at Spark's
    // 10 MB default, and the generous 64 MB budget moves to the AQE
    // threshold, which compares ACTUAL runtime shuffle sizes. The
    // static estimate is file-bytes x column-pruning ratio with no
    // filter selectivity -- trusting it with 64 MB let a 10x-scale
    // probe broadcast a 6M-row FACT side of tpch_q3 (35 MB estimate,
    // ~200 MB hashed relation; the same flip at cluster scale is a
    // driver OOM). With the split thresholds, mid-size facts plan as
    // shuffle joins and AQE converts to broadcast only when the
    // measured side is genuinely small; explicit broadcast() hints on
    // dims bypass both thresholds, unchanged.
    .config("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
    // The test tables are single small parquet files; the default
    // 128 MB maxPartitionBytes turns every scan into ONE task. 2 MB
    // splits keep 32 local cores busy. A cluster deployment against
    // properly-sized files should restore the 128 MB default.
    .config("spark.sql.files.maxPartitionBytes", 2L * 1024 * 1024)
    .config("spark.sql.files.openCostInBytes", 512L * 1024)
    // Always use the sort-based shuffle writer (r15). Below this
    // threshold Spark picks BypassMergeSortShuffleWriter, which opens
    // one file PER REDUCE PARTITION per map task and then concatenates
    // them (M x R file creates + copyFileStreamNIO merges); thread
    // sampling showed the LSH-join family spending most of its task
    // time in exactly that file churn. The sort-based writer emits one
    // spill-merged file per map task regardless of R. At cluster scale
    // the setting is inert: any serious shuffle has R > 200, where the
    // bypass path is never chosen anyway -- this only governs small-R
    // shuffles, where sort-based is strictly cheaper on file count.
    .config("spark.shuffle.sort.bypassMergeThreshold", 0)

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the session-level graft confs to an externally-created
    * session (e.g. the driver-owned one passed into SparkEntry).
    * All of these are runtime-settable SQL confs.
    */
  def adopt(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark
  }
}
