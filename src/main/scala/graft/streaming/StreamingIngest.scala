package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY.md S2.9).
  *
  * The reference is daily micro-batch (cron Airflow -> Glue) with
  * idempotent MERGE re-runs; its streaming-equivalent semantics are:
  *  - file-source ingest of the raw zone, `Trigger.AvailableNow` for
  *    the batch-parity mode, continuous micro-batches for live mode;
  *  - event-time windowed aggregation with a watermark standing in
  *    for the weekly/monthly calendar rollups;
  *  - keyed stateful processing (mapGroupsWithState) for the
  *    latest-extraction-wins dedup (W1) as a streaming operator.
  *
  * At scale the same topology holds: the file source lists new
  * `date=` partitions incrementally, state is hash-partitioned by
  * key, and the watermark bounds state size.
  */
object StreamingIngest {

  /** Streaming scan of an events-shaped parquet directory. */
  def readEventStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val base = spark.read.parquet(path).schema
    val r = spark.readStream.schema(base)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }

  /** Tumbling event-time window aggregate with a watermark: the
    * streaming twin of the A1/A3 rollups. `tsCol` must be a timestamp
    * column; late data beyond the watermark is dropped (the
    * reference's equivalent: late re-extractions are folded in by the
    * next day's MERGE). */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding event-time windows: every `slide`, counts over the
    * trailing `window_` -- the streaming twin of the j5 bucketed
    * range join's incident monitoring (each event lands in
    * window_/slide overlapping buckets, the streaming analogue of
    * j5's bucket explode; state per open window is one counter). */
  def slidingCounts(events: DataFrame, tsCol: String, window_ : String,
      slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"))

  /** Stream-stream interval join (attribution): every purchase joins
    * the same user's clicks from the preceding hour -- two watermarked
    * streams carved out of one event stream (stream-stream self-join).
    * The watermark plus the interval bound the join state: a click
    * can leave state once no purchase within its hour can still
    * arrive. The batch twin is the same join expression over static
    * frames (spec-checked parity). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String): DataFrame =
    clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
      .join(
        purchases.select(col("user_id").as("p_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
          col("value")).withWatermark("purchase_ts", watermark),
        expr("""user_id = p_user_id AND
                purchase_ts >= click_ts AND
                purchase_ts <= click_ts + INTERVAL 1 HOUR"""))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))

  case class EventRow(event_id: Long, user_id: Long, ts_us: Long,
      event_type: String, value: Double)
  case class LatestState(event_id: Long, ts_us: Long,
      event_type: String, value: Double)

  /** W1 as a streaming stateful operator: per user, keep the
    * latest-timestamp event seen so far (ties broken by event_id,
    * matching the batch dedup's ordering) and emit the current winner
    * each micro-batch. */
  def latestEventPerUser(events: Dataset[EventRow]): Dataset[(Long, LatestState)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, (Long, LatestState)](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[EventRow], state: GroupState[LatestState]) =>
          val incoming = batch.map(e => LatestState(e.event_id, e.ts_us, e.event_type, e.value))
          val best = (state.getOption.iterator ++ incoming)
            .maxBy(s => (s.ts_us, s.event_id))
          state.update(best)
          (userId, best)
      }
  }

  /** Streaming scan of the raw quote zone (`date=` partition dirs of
    * JSONL) with the pinned quote schema -- the reference's daily
    * batch ingest as an incremental file stream: new date partitions
    * are picked up as they land, `AvailableNow` gives exact
    * batch-parity semantics for backfills. */
  def readQuoteZone(spark: SparkSession, root: String): DataFrame =
    spark.readStream
      .schema(graft.model.Schemas.rawQuote.add("date", "string"))
      .option("basePath", root)
      .json(s"$root/date=*")

  /** Stream a VERSIONED table's appends as a Structured Streaming
    * SOURCE -- the read-side twin of the [[upsertSink]] /
    * [[corpusIntakeToWarehouse]] write path. The store's data dirs are
    * immutable and every commit stages NEW files, so the file source's
    * checkpointed file log gives exactly-once accounting of appended
    * files with no custom Source implementation: downstream jobs
    * (rollup maintenance, index builds, exports) follow the table
    * incrementally instead of rescanning it.
    *
    * Partition columns are re-derived from the hive `col=value` path
    * segments (recursive file listing does not surface them as
    * columns), cast back to the table schema's types.
    *
    * Contract: APPEND-ONLY maintenance (commitPartitions landing new
    * partitions/files). Rewrites -- optimizeSmallFiles, DML
    * copy-on-write, compact, full commits -- stage rewritten copies of
    * old rows as new files, which this source re-delivers:
    * at-least-once under maintenance. Pair with
    * [[streamingDedupWithinWatermark]] or a keyed MERGE sink for
    * effectively-once, exactly as the intake pipeline does.
    *
    * Contract: SINGLE WRITER while a follower runs. Writers stage data
    * files under `_data` BEFORE the manifest CAS; a loser deletes its
    * staged dir. A follower listing in that window can therefore (a)
    * checkpoint rows that never joined any snapshot -- phantom rows no
    * file-listing source can distinguish from committed ones (the
    * exactly-once file log makes them permanent), or (b) list a file
    * the loser deletes before the batch reads it. (b) fails soft:
    * `ignoreMissingFiles` below turns the vanished file into an empty
    * read instead of an aborted query. (a) has no read-side fix --
    * follow a contended table through [[graft.table
    * .VersionedTableStore.snapshotDiff]] on committed versions
    * instead (the change-feed source), or run maintenance and
    * followers under one scheduler lease ([[graft.pipeline
    * .PipelineRunner.runMaintenance]]'s single-owner discipline). */
  def tableAppendStream(spark: SparkSession,
      vs: graft.table.VersionedTableStore, name: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val full = vs.read(name).schema
    val pcols = vs.partitionColumns(name)
    val dataSchema = org.apache.spark.sql.types.StructType(
      full.filterNot(f => pcols.contains(f.name)))
    var r = spark.readStream.schema(dataSchema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .option("ignoreMissingFiles", "true")
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    val base = r.parquet(s"${vs.path(name)}/_data")
    // Path segments carry Hive's %XX escaping for chars unsafe in a
    // path (space, ':', '%', '=', ...); decode before the cast or a
    // partition value the writer escaped reads back still-escaped,
    // disagreeing with vs.read of the same table. Hive escaping is
    // NOT form-urlencoding ('+' stays literal), so url_decode would
    // corrupt it -- use Spark's own inverse.
    val unescape = udf((s: String) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(s))
    val withParts = pcols.foldLeft(base) { (df, c) =>
      df.withColumn(c,
        unescape(regexp_extract(col("_metadata").getField("file_path"),
          s"/$c=([^/]+)/", 1)).cast(full(c).dataType))
    }
    withParts.select(full.fieldNames.map(col).toSeq: _*)
  }

  /** The committed-changes twin of [[tableAppendStream]]: stream a
    * versioned table's CHANGELOG (insert / update / delete rows with
    * optional pre-images) via the [[ChangeFeedProvider]]
    * MicroBatchStream. Offsets are commit versions, data comes from
    * `snapshotDiff` over committed manifests only -- so rewrites
    * (OPTIMIZE, DML copy-on-write) and failed-commit staged files,
    * the two hazards the append stream documents, cannot reach the
    * feed. See [[ChangeFeedProvider]] for semantics, options, and the
    * retention contract. */
  def changeFeed(spark: SparkSession, vs: graft.table.VersionedTableStore,
      name: String, keys: Seq[String], includePre: Boolean = false,
      startingVersion: String = "earliest",
      maxVersionsPerTrigger: Option[Int] = None,
      branch: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("graft-changes")
      .option("root", vs.root)
      .option("table", name)
      .option("keys", keys.mkString(","))
      .option("includePre", includePre.toString)
      .option("startingVersion", startingVersion)
    maxVersionsPerTrigger.foreach(n =>
      r = r.option("maxVersionsPerTrigger", n.toString))
    branch.foreach(b => r = r.option("branch", b))
    r.load()
  }

  /** Continuously maintain an additive rollup of a versioned table
    * from its CHANGE FEED -- correct under UPDATE and DELETE
    * maintenance, which [[followRollup]]'s append-stream variant is
    * not (rewrites re-deliver rows there). Each trigger folds the
    * batch's changelog into signed per-group partials: an insert
    * contributes (+1, +v), a delete (-1, -v) off the deleted row the
    * feed carries, an update (0, v - pre_v) off the pre-image -- then
    * lands them via [[graft.table.VersionedTableStore
    * .commitPartitions]] PARTITIONED BY BATCH, so a crash-replayed
    * batch rewrites its own partition and converges idempotently
    * (exactly the [[followRollup]] discipline). [[readRollup]] folds
    * the signed partials to current totals unchanged. */
  def followRollupChanges(spark: SparkSession,
      vs: graft.table.VersionedTableStore, source: String, rollup: String,
      pk: Seq[String], groupKeys: Seq[String], sumCol: String,
      checkpoint: String): StreamingQuery = {
    changeFeed(spark, vs, source, pk, includePre = true).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sign = when(col("change_type") === "insert", 1L)
          .when(col("change_type") === "delete", -1L).otherwise(0L)
        // group keys read from the post-image for inserts/updates and
        // from the (only) image for deletes; an update that MOVES a
        // row between groups emits -pre in the old group and +post in
        // the new one. Group keys that are PART OF THE PK have no
        // pre_ twin and cannot move (they are the diff's join key).
        def preOf(k: String) = if (pk.contains(k)) col(k) else col(s"pre_$k")
        val moved = col("change_type") === "update" &&
          groupKeys.filterNot(pk.contains).map(k => !(col(k) <=> col(s"pre_$k")))
            .reduceOption(_ || _).getOrElse(lit(false))
        // a NULL value (or NULL pre-image, e.g. after the documented
        // mid-stream column-removal pinning) would make the signed
        // delta NULL and silently DROP from the sum, drifting the
        // rollup with no error -- fail the batch loud instead, the
        // feed's own contract for unrepresentable input
        def loud(c: org.apache.spark.sql.Column, what: String) =
          when(c.isNull, raise_error(concat(
            lit(s"followRollupChanges: NULL $what for "),
            col("change_type"), lit(" row of "),
            concat_ws(",", pk.map(k => col(k).cast("string")): _*))))
            .otherwise(c)
        val stay = batch.filter(!moved).select(
          groupKeys.map(col) ++ Seq(
            sign.as("__dn"),
            loud(when(col("change_type") === "delete",
                -loud(col(sumCol), sumCol))
              .when(col("change_type") === "update",
                loud(col(sumCol), sumCol) -
                  loud(col(s"pre_$sumCol"), s"pre_$sumCol"))
              .otherwise(loud(col(sumCol), sumCol)), "delta").as("__dv")): _*)
        val outOfOld = batch.filter(moved).select(
          groupKeys.map(k => preOf(k).as(k)) ++ Seq(
            lit(-1L).as("__dn"),
            (-loud(col(s"pre_$sumCol"), s"pre_$sumCol")).as("__dv")): _*)
        val intoNew = batch.filter(moved).select(
          groupKeys.map(col) ++ Seq(
            lit(1L).as("__dn"), loud(col(sumCol), sumCol).as("__dv")): _*)
        val delta = stay.unionByName(outOfOld).unionByName(intoNew)
          .groupBy(groupKeys.map(col): _*)
          .agg(sum(col("__dn")).as("n"), sum(col("__dv")).as(s"sum_$sumCol"))
          .withColumn("__batch", lit(batchId))
        vs.commitPartitions(delta, rollup, Seq("__batch"))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Continuously maintain an additive rollup of a versioned table
    * from its own append stream -- [[tableAppendStream]] composed with
    * a per-batch partial aggregate landed via [[graft.table
    * .VersionedTableStore.commitPartitions]] into a rollup table
    * PARTITIONED BY BATCH. Each trigger costs O(batch + its groups):
    * the partial is group-sized, and because a replayed batch rewrites
    * ITS OWN partition, crash-replays between commit and checkpoint
    * converge idempotently (the corpusIntakeToWarehouse discipline).
    * Read the current rollup with [[readRollup]] -- a combine over
    * batch-partials, each batch-partition group-sized. */
  def followRollup(spark: SparkSession, vs: graft.table.VersionedTableStore,
      source: String, rollup: String, keys: Seq[String], sumCol: String,
      checkpoint: String): StreamingQuery = {
    tableAppendStream(spark, vs, source).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n"), sum(col(sumCol)).as(s"sum_$sumCol"))
          .withColumn("__batch", lit(batchId))
        vs.commitPartitions(delta, rollup, Seq("__batch"))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Continuously maintain a persistent IVF index
    * ([[graft.api.Similarity.buildIvfIndex]]) from its source table's
    * CHANGE FEED -- the derived-structure composition: warehouse
    * commits flow through the changelog into the cell-partitioned
    * index, so ANN queries ([[graft.api.Similarity.queryIvfIndex]])
    * always serve the committed corpus without a rebuild.
    *
    * Per batch: changed vectors assign to their max-cosine cell
    * against the FIXED stored centroids (one broadcast row -- the
    * standard IVF contract: centroids move only on rebuild); the
    * batch's TOUCHED cells (new homes, plus old homes of updated /
    * deleted vectors via pre-images) are rewritten as
    * current-cell-content minus the batch's keys plus its surviving
    * rows, landed with a partition-granular delta commit. Cost per
    * trigger: the changed cells, never the index. Crash-replay
    * converges: the rebuild reads the (possibly already-updated)
    * index minus batch keys plus batch rows -- the same final
    * partitions either way. With the default `startingVersion =
    * earliest`, the FIRST drain replays the source as inserts and
    * rewrites every populated cell -- a self-healing full build that
    * makes "start following an existing table" a no-thought
    * operation; pass a version to start incremental-only.
    *
    * PRECONDITION of the default old-home location (re-assigning the
    * pre-image vector against the stored centroids): the stored cells
    * must be ARGMAX-CONSISTENT with the stored centroids. That holds
    * inductively for any index built by [[graft.api.Similarity
    * .buildIvfIndex]] and maintained only by this follower (both
    * place rows by the same argmax), and for the self-healing
    * `earliest` replay (which rewrites every populated cell anyway).
    * It can BREAK when adopting a foreign index incremental-only
    * (explicit `startingVersion` skipping the replay) whose rows were
    * placed by some other assignment: a stale row then hides in an
    * un-touched cell and survives the anti-join as a ghost. For that
    * adoption path pass `locateByIndex = true`: old homes are then
    * found by semi-joining the batch's keys against the index itself
    * -- one key-equi scan of the cell table per batch (prunable via
    * parquet blooms on `vec_id` when the index was committed with
    * one) instead of a centroid assignment, correct under ANY prior
    * placement. */
  def followIvfIndex(spark: SparkSession, vs: graft.table.VersionedTableStore,
      source: String, index: String, pk: String, vecCol: String,
      checkpoint: String, startingVersion: String = "earliest",
      locateByIndex: Boolean = false): StreamingQuery = {
    changeFeed(spark, vs, source, Seq(pk), includePre = true,
      startingVersion = startingVersion).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val cents = vs.read(s"${index}_centroids")
          def assign(rows: DataFrame): DataFrame =
            graft.ops.SimilarityOps.assignToCentroids(
              rows.withColumn("nrm",
                sqrt(graft.ops.SimilarityOps.dot(col("v"), col("v")))),
              cents)
          def vecOf(c: String) = transform(col(c), x => x.cast("double"))
          val newRows = assign(batch
            .filter(col("change_type") =!= "delete")
            .select(col(pk).as("vec_id"), vecOf(vecCol).as("v")))
          val keys = batch.select(col(pk).as("vec_id")).distinct()
          // old homes: by default a deleted row carries its vector in
          // the main columns and an updated row's previous vector is
          // the pre-image, re-assigned against the stored centroids
          // (argmax-consistency precondition above); locateByIndex
          // instead asks the index where the keys actually live
          val oldCells =
            if (locateByIndex)
              vs.read(s"${index}_cells")
                .join(keys, Seq("vec_id"), "left_semi").select(col("cell"))
            else assign(batch
              .filter(col("change_type") === "delete")
              .select(col(pk).as("vec_id"), vecOf(vecCol).as("v"))
              .unionByName(batch.filter(col("change_type") === "update")
                .select(col(pk).as("vec_id"), vecOf(s"pre_$vecCol").as("v"))))
              .select(col("cell"))
          val touched = newRows.select(col("cell"))
            .union(oldCells)
            .distinct().collect().map(_.getLong(0)).toSeq
          val kept = vs.read(s"${index}_cells")
            .filter(col("cell").isin(touched: _*))
            .join(keys, Seq("vec_id"), "left_anti")
          val rebuilt = kept.select(col("cell"), col("vec_id"), col("v"), col("nrm"))
            .unionByName(newRows.select(col("cell"), col("vec_id"),
              col("v"), col("nrm")))
          // explicit replacement set: a cell whose LAST vector this
          // batch deletes gets no rows in `rebuilt` and must still be
          // dropped from the snapshot
          vs.commitPartitionsReplacing(rebuilt, s"${index}_cells",
            Seq("cell"), touched.map(c => Seq(c.toString)))
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Retraction maintenance for the persistent dedup signature index
    * ([[graft.api.Dedup.ingestDeduped]]'s `sigTable`) from the source
    * corpus' CHANGE FEED -- the takedown path: when documents are
    * DELETED from the corpus (opt-outs, policy removals), their
    * minhash signatures must leave the index or future near-dups of
    * the removed content keep getting suppressed against ghosts; when
    * a document's text is UPDATED, its signature re-derives (update
    * fires only for docs already IN the index -- non-survivors never
    * enter here, because admission is ingestDeduped's decision, not
    * this follower's).
    *
    * Batch-id-partitioned index: only the partitions holding touched
    * doc_ids rewrite (semi-join locates them; explicit-replacement
    * commit drops partitions the batch fully empties). Unpartitioned
    * index: a full rewrite per batch, same as the small-corpus merge
    * path ingestDeduped documents. Crash replay converges: the
    * rebuild is a function of (current index, batch).
    *
    * Establish the checkpoint BEFORE takedowns can land (one drain
    * right after index build): the feed's first batch is a NET
    * snapshot, so a delete that both happened and was superseded
    * before the stream's first offset is invisible to any
    * startingVersion -- there is nothing left to diff. The default
    * `earliest` makes that first drain a harmless insert replay
    * (inserts are ignored here; admission belongs to ingestDeduped);
    * from then on every delete/update reaches the follower. To adopt
    * an index whose source ALREADY had unprocessed takedowns, pass
    * the startingVersion that precedes them. */
  def followDedupRetractions(spark: SparkSession,
      vs: graft.table.VersionedTableStore, source: String, sigTable: String,
      pk: String, textCol: String, checkpoint: String,
      startingVersion: String = "earliest"): StreamingQuery =
    followIndexRetractions(spark, vs, source, sigTable, pk, checkpoint,
      startingVersion, valueCols = Seq("th"),
      rederive = updates => updates.select(col(pk).as("doc_id"),
        graft.ops.DedupOps.hashedTokenSet(col(textCol)).as("__new_th")))

  /** [[followDedupRetractions]] for the IMAGE phash index
    * ([[graft.api.Dedup.ingestImagesDeduped]]'s `phashTable`): deletes
    * of source assets evict their dHash rows; payload updates
    * re-decode and re-hash through the real codec path. Same
    * checkpoint-before-takedowns contract and partition-granular
    * rebuild as the text follower. */
  def followPhashRetractions(spark: SparkSession,
      vs: graft.table.VersionedTableStore, source: String,
      phashTable: String, pk: String, payloadCol: String,
      checkpoint: String,
      startingVersion: String = "earliest"): StreamingQuery =
    followIndexRetractions(spark, vs, source, phashTable, pk, checkpoint,
      startingVersion, valueCols = Seq("dhash_lo", "dhash_hi"),
      rederive = updates => graft.ops.MultimodalOps
        .imageDhashOf(updates, col(pk), col(payloadCol))
        .select(col("doc_id"), col("dhash_lo").as("__new_dhash_lo"),
          col("dhash_hi").as("__new_dhash_hi")))

  /** The shared retraction dance both index followers run: deletes
    * evict `doc_id` rows, updates replace `valueCols` with the
    * re-derived `__new_<col>` values from `rederive(updates)`, and
    * only the index partitions holding touched doc_ids rewrite
    * (explicit-replacement commit, so fully-emptied partitions drop).
    * `rederive` receives the batch's update rows (post-images) and
    * must return (doc_id, __new_<c> for each valueCol). */
  private def followIndexRetractions(spark: SparkSession,
      vs: graft.table.VersionedTableStore, source: String, idxTable: String,
      pk: String, checkpoint: String, startingVersion: String,
      valueCols: Seq[String],
      rederive: DataFrame => DataFrame): StreamingQuery = {
    changeFeed(spark, vs, source, Seq(pk), includePre = false,
      startingVersion = startingVersion).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val touched = batch
          .filter(col("change_type").isin("delete", "update"))
        if (vs.exists(idxTable) && !touched.isEmpty) {
          val dels = touched.filter(col("change_type") === "delete")
            .select(col(pk).as("doc_id"))
          val renew = rederive(
            touched.filter(col("change_type") === "update"))
          val keys = dels.unionByName(renew.select(col("doc_id"))).distinct()
          val idx = vs.read(idxTable)
          val pcols = vs.partitionColumns(idxTable)
          def rebuildOf(rows: DataFrame): DataFrame = {
            val merged = valueCols.foldLeft(
              rows.join(dels, Seq("doc_id"), "left_anti")
                .join(renew, Seq("doc_id"), "left")) { (df, c) =>
              df.withColumn(c, coalesce(col(s"__new_$c"), col(c)))
            }
            merged.select(rows.columns.toIndexedSeq.map(col): _*)
          }
          if (pcols.nonEmpty) {
            val parts = idx.join(keys, Seq("doc_id"))
              .select(pcols.map(col): _*).distinct()
            val partVals = parts.collect()
              .map(r => pcols.indices.map(i => String.valueOf(r.get(i))))
              .toSeq
            if (partVals.nonEmpty) {
              val affected = idx.join(broadcast(parts), pcols)
              vs.commitPartitionsReplacing(rebuildOf(affected), idxTable,
                pcols, partVals)
            }
          } else {
            if (idx.join(keys, Seq("doc_id"), "left_semi").isEmpty) ()
            else vs.createOrReplace(rebuildOf(idx), idxTable, Nil)
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Mirror a versioned table into a SECOND, INDEPENDENT store from
    * its change feed -- the first composition a real CDC consumer
    * builds: keep an external copy in sync, exactly-once, with no
    * transaction spanning the two stores. The mirror is hash-bucketed
    * on the primary key (`pmod(xxhash64(pk), buckets)` partition
    * column `__bucket`), and each trigger rewrites ONLY the buckets
    * the batch touches:
    *
    *   rebuilt(bucket) = current(bucket) ANTI-JOIN batch.keys
    *                     UNION batch post-images (non-deletes)
    *
    * Exactly-once from an at-least-once foreachBatch: the rebuild is
    * a pure, IDEMPOTENT function of (current mirror, batch changelog)
    * -- re-applying a batch a crash already landed evicts the rows it
    * just wrote and re-inserts the same post-images, converging to
    * the identical state; a batch a crash did NOT land applies
    * normally on replay. The at-least-once window (mirror commit
    * durable, checkpoint offset not) therefore cannot duplicate or
    * lose a change. Spec-pinned by a planted mid-batch crash
    * (ExternalSinkSpec), the corpusIntakeToWarehouse discipline
    * applied ACROSS store boundaries.
    *
    * Cost per trigger: the touched buckets, never the mirror -- pick
    * `buckets` so one bucket is an executor-sized rewrite at the
    * target scale. The bucket is a pure pk-hash, so updates stay in
    * place, deletes find their rows by key (no pre-images read), and
    * a net-empty bucket is dropped via the explicit-replacement
    * commit. `crashAfterBatch` is the injectable fault for the spec.
    *
    * Keep ONE checkpoint for the mirror's lifetime: the feed's first
    * batch under a fresh checkpoint is a NET snapshot, which carries
    * no tombstones for rows deleted before the stream's first offset
    * -- re-pointing an EXISTING mirror at a fresh checkpoint leaves
    * such rows stranded in buckets the snapshot doesn't touch (the
    * followDedupRetractions checkpoint-before-takedowns contract). */
  def followMirror(spark: SparkSession, srcVs: graft.table.VersionedTableStore,
      source: String, pk: Seq[String], dst: graft.table.VersionedTableStore,
      dest: String, checkpoint: String, buckets: Int = 16,
      crashAfterBatch: Option[Long] = None,
      maxVersionsPerTrigger: Option[Int] = None): StreamingQuery = {
    changeFeed(spark, srcVs, source, pk, includePre = false,
      maxVersionsPerTrigger = maxVersionsPerTrigger).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val srcCols = batch.columns.toIndexedSeq.filter(_ != "change_type")
          val bucketOf = pmod(xxhash64(pk.map(col): _*), lit(buckets.toLong))
          val post = batch.filter(col("change_type") =!= "delete")
            .select(srcCols.map(col): _*).withColumn("__bucket", bucketOf)
          if (!dst.exists(dest)) {
            // first drain: the feed's opening batch is a net snapshot
            // of inserts -- seed every bucket directly
            dst.commitPartitions(post, dest, Seq("__bucket"))
          } else {
            val keys = batch.select(pk.map(col): _*)
              .withColumn("__bucket", bucketOf).distinct()
            val touched = keys.select(col("__bucket")).distinct()
              .collect().map(_.getLong(0)).sorted.toIndexedSeq
            val kept = dst.read(dest)
              .filter(col("__bucket").isin(touched: _*))
              .join(keys.drop("__bucket"), pk, "left_anti")
            dst.commitPartitionsReplacing(kept.unionByName(post), dest,
              Seq("__bucket"), touched.map(b => Seq(b.toString)))
          }
          if (crashAfterBatch.contains(batchId))
            throw new RuntimeException(
              s"injected crash after batch $batchId mirror commit")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Export a table's change feed to an EXTERNAL JSONL directory --
    * the handoff shape for non-Spark CDC consumers (search indexers,
    * webhook fan-outs, other warehouses). Batch-id-keyed layout: each
    * trigger OVERWRITES `outDir/batch=<batchId>/` with its changelog
    * rows (change_type + row columns), so the crash-replay of a batch
    * rewrites the SAME directory instead of appending duplicates --
    * the directory set is exactly-once even though foreachBatch is
    * at-least-once (batch ids are stable across checkpoint restarts).
    * Spark's writer stamps `_SUCCESS` per directory; consumers read
    * only _SUCCESS-complete dirs, in batch-id order, and apply each
    * dir once -- giving them the same replayable, idempotent contract
    * the in-store followers get from partition-granular commits. */
  def followChangesToJsonl(spark: SparkSession,
      vs: graft.table.VersionedTableStore, source: String, pk: Seq[String],
      outDir: String, checkpoint: String,
      crashAfterBatch: Option[Long] = None,
      maxVersionsPerTrigger: Option[Int] = None): StreamingQuery = {
    changeFeed(spark, vs, source, pk, includePre = false,
      maxVersionsPerTrigger = maxVersionsPerTrigger).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.write.mode("overwrite").json(s"$outDir/batch=$batchId")
          if (crashAfterBatch.contains(batchId))
            throw new RuntimeException(
              s"injected crash after batch $batchId jsonl write")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** Current rollup state: fold the batch-partials down to one row per
    * key. Partials are group-sized per batch, so this combine is
    * rollup-cardinality work, never source-sized. */
  def readRollup(vs: graft.table.VersionedTableStore, rollup: String,
      keys: Seq[String], sumCol: String): DataFrame =
    vs.read(rollup).groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col(s"sum_$sumCol")).as(s"sum_$sumCol"))

  /** Run a streaming DataFrame to completion over currently-available
    * input (batch-parity mode) into an in-memory table; returns the
    * finished query. */
  def runAvailableNow(df: DataFrame, queryName: String, outputMode: String,
      checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .queryName(queryName)
      .outputMode(outputMode)
      .format("memory")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming corpus intake: the STATELESS prefix of corpus prep --
    * quality gate then context-window chunking -- over a document
    * stream of (doc_id, text). Both stages are narrow projections
    * (filter + posexplode), so they run unchanged under Structured
    * Streaming: no state, no watermark, each micro-batch emits its
    * docs' chunks. Compose with [[streamingExactDedup]] keyed on
    * `chunk_hash` for streaming chunk-level dedup; the stateful dedup
    * and clustering stages stay batch (they need corpus-global
    * state). */
  def qualityChunkStream(docs: DataFrame,
      chunkTokens: Int = graft.ops.TextOps.ChunkTokens): DataFrame =
    graft.ops.TextOps.chunkOf(
      docs.filter(graft.ops.TextOps.keepExpr(org.apache.spark.sql.functions.col("text")))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")),
      chunkTokens)

  case class KeyedDoc(doc_id: Long, content_key: String)

  /** Streaming exact dedup: drop every document whose canonical
    * content key ([[graft.ops.DedupOps.contentKey]]) was already seen
    * -- the streaming twin of the batch exact-dedup pass. State is one
    * boolean per distinct content key, hash-partitioned; within a
    * micro-batch the min doc_id wins (matching the batch survivor
    * rule), across batches first-seen wins. flatMapGroupsWithState in
    * Append mode: emits 0 or 1 rows per (key, batch). */
  def streamingExactDedup(docs: Dataset[KeyedDoc]): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.content_key)
      .flatMapGroupsWithState[Boolean, KeyedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  /** Streaming sessionization via native session windows: dynamic-gap
    * sessions per user, closed and emitted once the watermark passes
    * the session's end -- stateful MergingSessions under the hood,
    * the streaming twin of the batch w5_session_window query. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))

  /** Bounded-state streaming dedup: like [[streamingExactDedup]] but
    * state EXPIRES -- a key is only held while a duplicate could still
    * arrive inside the watermark delay (dropDuplicatesWithinWatermark).
    * The unbounded variant holds one state row per distinct key
    * forever, which at corpus scale is the whole key space in executor
    * state stores; this one holds the recent window only. Use it when
    * duplicates cluster in time (re-crawls, retry storms) and the
    * daily MERGE handles long-range dups. `tsCol` is the event-time
    * column the watermark rides on. */
  def streamingDedupWithinWatermark(docs: DataFrame, keyCol: String,
      tsCol: String, watermark: String): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** foreachBatch MERGE sink: every micro-batch upserts into a
    * warehouse table on its natural key -- the streaming twin of the
    * daily MERGE jobs, and the standard Spark pattern for sinks whose
    * semantics (here: key-idempotent upsert) exceed append. End-to-end
    * effectively-exactly-once: the checkpoint makes delivery at-least-
    * once and the MERGE makes re-delivery a no-op. Runs over available
    * input and returns the finished query. */
  def upsertSink(df: DataFrame, store: graft.table.WarehouseWrites, table: String,
      keys: Seq[String], partitionBy: Seq[String], checkpoint: String,
      queryName: String): StreamingQuery = {
    val q = df.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.table.UpsertWriter.upsertAll(store, table, batch.toDF(), keys, partitionBy)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** One corpus chunk as [[graft.ops.TextOps.chunkOf]] emits it;
    * `chunk_hash` (the 60-bit content fingerprint) is the dedup and
    * MERGE key. */
  case class ChunkRow(doc_id: Long, chunk_id: Int, n_chunk_tokens: Long,
      chunk_text: String, chunk_hash: Long)

  /** Streaming exact dedup at CHUNK granularity, carrying the full
    * chunk payload: first batch to present a chunk_hash wins (within a
    * batch, the min (doc_id, chunk_id) -- the batch survivor rule);
    * later occurrences emit nothing. State is one boolean per distinct
    * fingerprint, hash-partitioned across the state store. */
  def streamingChunkDedup(chunks: Dataset[ChunkRow]): Dataset[ChunkRow] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.chunk_hash)
      .flatMapGroupsWithState[Boolean, ChunkRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[ChunkRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(r => (r.doc_id, r.chunk_id)))
          }
      }
  }

  /** The composed streaming corpus intake, end to end: quality gate ->
    * context-window chunking (stateless, [[qualityChunkStream]]) ->
    * exact dedup on the chunk fingerprint (stateful,
    * [[streamingChunkDedup]]) -> foreachBatch MERGE committing a
    * snapshot per micro-batch into any [[graft.table.WarehouseWrites]]
    * store (against a [[graft.table.VersionedTableStore]], each batch
    * is a rollback-able version).
    *
    * Durability: the checkpoint records source offsets AND dedup state
    * per completed batch; the MERGE key (`chunk_hash`) makes replayed
    * batches no-ops. A crash at ANY point -- including after the
    * snapshot commit but before the batch completes, the partial-side-
    * effect window -- therefore converges to the same table state on
    * restart (spec-pinned by a planted mid-batch crash).
    *
    * `crashAfterBatch`: injectable fault for exactly that spec -- throw
    * AFTER the given batch id's MERGE commits, simulating a worker
    * dying in the at-least-once window. Production callers leave it
    * None (same injectable-fault pattern as PipelineRunner's retry
    * delay). Returns the started query; callers await it. */
  def corpusIntakeToWarehouse(docs: DataFrame,
      store: graft.table.WarehouseWrites, table: String,
      checkpoint: String, queryName: String,
      crashAfterBatch: Option[Long] = None): StreamingQuery = {
    import docs.sparkSession.implicits._
    val deduped = streamingChunkDedup(qualityChunkStream(docs).as[ChunkRow])
    deduped.toDF().writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the chunk table partitions by micro-batch: each MERGE commits
        // only its own partition (a replay rewrites the same partition
        // idempotently), so table maintenance stays O(batch) -- an
        // unpartitioned merge would rewrite the whole corpus of chunks
        // every trigger
        graft.table.UpsertWriter.upsertAll(store, table,
          batch.toDF().withColumn("batch_id",
            org.apache.spark.sql.functions.lit(batchId)),
          keys = Seq("chunk_hash"), partitionBy = Seq("batch_id"))
        if (crashAfterBatch.contains(batchId))
          throw new RuntimeException(s"injected crash after batch $batchId commit")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
