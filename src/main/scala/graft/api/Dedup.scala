package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, Hashing}

/** DataFrame-first dedup API -- the library surface for corpora with
  * arbitrary column names (the `graft.ops` query functions bind the
  * same operators to the test tables for the oracle gates).
  *
  * Every operator takes the id/text columns as [[Column]]s, so any
  * projection works (`$"url"`, `concat(...)`, ...). Scale notes live
  * on the underlying ops; nothing here adds a shuffle.
  */
object Dedup {

  /** Exact duplicate groups on canonical token-set content: one row
    * per distinct content key with the surviving (min) id and group
    * size. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs
      .select(id.as("doc_id"), DedupOps.contentKey(text).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_docs"))

  /** MinHash-LSH near-duplicate pairs over bag-of-words token sets:
    * (doc_a, doc_b, jaccard) with jaccard >= `threshold`. Candidate
    * generation is banded LSH (never an all-pairs join); verification
    * is an exact merge-walk Jaccard inside the join condition. */
  def minhashPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double = DedupOps.JaccardThreshold): DataFrame =
    DedupOps.lshJaccardPairs(
      docs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), DedupOps.hashedTokenSet(text).as("th")),
      DedupOps.MinhashK, DedupOps.LshBandCount, DedupOps.LshRows,
      threshold, "jaccard")

  /** Incremental MinHash-LSH dedup: near-dup pairs between an
    * ARRIVING batch and an EXISTING corpus -- (new_id, existing_id,
    * jaccard). The batch's band buckets join against the corpus's;
    * new x new and existing x existing pairs are never generated, so
    * continuous ingest pays for the batch's collisions, not the
    * corpus pair space. */
  def minhashPairsAgainst(newDocs: DataFrame, id: Column, text: Column,
      existing: DataFrame, existingId: Column, existingText: Column,
      threshold: Double = DedupOps.JaccardThreshold): DataFrame =
    DedupOps.lshJaccardPairsBetween(
      newDocs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), DedupOps.hashedTokenSet(text).as("th")),
      existing.repartition(DedupOps.JoinParallelism)
        .select(existingId.as("doc_id"), DedupOps.hashedTokenSet(existingText).as("th")),
      DedupOps.MinhashK, DedupOps.LshBandCount, DedupOps.LshRows,
      threshold, "jaccard")

  /** Word-order-sensitive near-duplicate pairs over hashed n-gram
    * shingle sets: (doc_a, doc_b, ngram_jaccard). */
  def shinglePairs(docs: DataFrame, id: Column, text: Column,
      n: Int = DedupOps.NgramN,
      threshold: Double = DedupOps.NgramThreshold): DataFrame =
    DedupOps.lshJaccardPairs(
      docs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), DedupOps.hashedShingles(text, n).as("th")),
      DedupOps.MinhashK, DedupOps.NgramBandCount, DedupOps.NgramLshRows,
      threshold, "ngram_jaccard")

  /** EXACT shingle-Jaccard near-dup pairs via prefix filtering
    * (AllPairs): 100% recall at the threshold by construction — the
    * deterministic alternative to [[shinglePairs]]'s probabilistic
    * banding, at the same blocked-join complexity class (each doc
    * emits ~(1-t)·m prefix elements; pair work is sum of
    * prefix-bucket²). Use when a dedup run must certify "no
    * qualifying pair missed"; use banding when the recall curve is
    * acceptable and candidate volume must stay lower. Measure the
    * trade for a corpus with [[lshRecallLadder]]. */
  def exactJaccardPairs(docs: DataFrame, id: Column, text: Column,
      n: Int = DedupOps.NgramN,
      threshold: Double = DedupOps.NgramThreshold): DataFrame =
    DedupOps.prefixJaccardPairs(
      docs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), DedupOps.hashedShingles(text, n).as("th")),
      threshold, "ngram_jaccard")

  /** MinHash banding recall ladder: for each (bands, rows_per_band)
    * layout of the 16-wide signature, candidate and verified-hit
    * counts against the exact prefix-filter truth — one row per
    * config, all exact counts. The measurement that justifies a
    * banding choice before committing a full-corpus dedup run. */
  def lshRecallLadder(docs: DataFrame, id: Column, text: Column,
      n: Int = DedupOps.NgramN,
      threshold: Double = DedupOps.NgramThreshold): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val items = DedupOps.materializeOnce(
      docs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), DedupOps.hashedShingles(text, n).as("th")))
    val truth = DedupOps.prefixJaccardPairs(items, threshold, "j")
      .agg(count(lit(1)).as("n_true"))
    DedupOps.RecallLadderConfigs.map { case (bc, r) =>
      DedupOps.lshJaccardPairs(items, DedupOps.MinhashK, bc, r, -1.0, "j")
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("j") >= threshold, 1L).otherwise(0L)).as("n_hits"))
        .select(lit(bc).as("bands"), lit(r).as("rows_per_band"),
          col("n_cand"), col("n_hits"))
    }.reduce(_ unionByName _).crossJoin(truth)
  }

  /** Character-level edit-distance near-duplicate pairs: (doc_a,
    * doc_b, edit_dist) for every candidate pair within Levenshtein
    * distance `maxDist`. Candidates come from the same shingle-LSH
    * banding as [[shinglePairs]]; the verifier is Spark's banded
    * `levenshtein(a, b, maxDist)` inside the join condition
    * (O(maxDist * len) per candidate, no full DP table, rejected
    * pairs never materialize). The strictest dedup in the family:
    * certifies near-identity, not shared vocabulary. */
  def editDistancePairs(docs: DataFrame, id: Column, text: Column,
      maxDist: Int = DedupOps.EditDistMax,
      shingleN: Int = DedupOps.NgramN): DataFrame =
    DedupOps.editDistancePairs(
      docs.repartition(DedupOps.JoinParallelism)
        .select(id.as("doc_id"), text.as("text"),
          DedupOps.hashedShingles(text, shingleN).as("th")),
      DedupOps.MinhashK, DedupOps.NgramBandCount, DedupOps.NgramLshRows,
      maxDist)

  /** SimHash near-duplicate pairs (hamming <= 4 over a 31-bit
    * fingerprint), optionally blocked by extra columns (e.g. a
    * language column): output (blockCols..., doc_a, doc_b, hamming).
    * Banded hamming-LSH candidates -- 100% recall, no all-pairs
    * join. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
      blockCols: Seq[String] = Nil): DataFrame = {
    val fp = docs.repartition(DedupOps.JoinParallelism)
      .select(blockCols.map(col) ++ Seq(id.as("doc_id"),
        graft.functions.ArrayExprs.simhash(
          DedupOps.hashedTokenSet(text), DedupOps.SimhashBits).as("simhash")): _*)
    DedupOps.simhashPairs(fp, blockCols)
  }

  /** Containment pairs -- the third dedup class: a small document
    * embedded inside a larger one (low symmetric jaccard, so
    * [[minhashPairs]] misses it by design). Candidates share a
    * winnowing fingerprint; score = |A inter B| / min(|A|,|B|) over
    * the token sets, verified inside the join condition. */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      threshold: Double = DedupOps.ContainmentThreshold): DataFrame =
    DedupOps.containmentPairs(
      docs.select(id.as("doc_id"), text.as("text")), threshold)

  /** Benchmark decontamination: every corpus doc sharing >= 1 hashed
    * `n`-gram with the benchmark (eval) docs, as (doc_id, n_hits).
    * The benchmark reduces to its distinct gram set and broadcasts;
    * published practice uses n=13 (the default here matches the
    * short synthetic test docs -- size per deployment). */
  def decontaminationHits(corpus: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, btext: Column,
      n: Int = DedupOps.DecontaminationN): DataFrame =
    DedupOps.decontaminationHits(
      corpus.select(id.as("doc_id"), text.as("text")),
      benchmark.select(btext.as("text")), n)

  /** Embedding near-dup pairs via sign-LSH buckets (the scale path):
    * candidates agree on every hyperplane sign, exact cosine verified
    * inside the join condition. Size `planes` (2^planes buckets) and
    * `dims` (embedding width) to the deployment; the defaults match
    * the driver's 64-dim test tables. */
  def embedLshPairs(vectors: DataFrame, id: Column, vec: Column,
      threshold: Double = DedupOps.EmbedLshThreshold,
      planes: Int = graft.ops.SimilarityOps.LshPlanes,
      dims: Int = graft.ops.SimilarityOps.PlaneDims): DataFrame =
    DedupOps.embedLshPairs(
      vectors.repartition(DedupOps.JoinParallelism)
        .select(id.as("vec_id"),
          org.apache.spark.sql.functions.transform(vec, x => x.cast("double")).as("v")),
      threshold, planes, dims)

  /** IMAGE near-dup pairs via banded perceptual hash: each payload is
    * container-sniffed (PNG/BMP), decoded to pixels, greyscaled,
    * box-averaged to 9x8, and dHashed; the 64-bit hash splits into
    * four 16-bit bands, candidates share a band (equi-join, never
    * all-pairs), and the exact Hamming distance <= `maxHamming`
    * verifies inside the join output. The pixel analog of
    * [[minhashPairs]]: pair work is sum-of-bucket^2. Codec loop and
    * band algebra are oracle-gated (dedup_image_phash). */
  def imagePhashPairs(assets: DataFrame, id: Column, payload: Column,
      maxHamming: Int = graft.ops.MultimodalOps.HammingMax): DataFrame =
    graft.ops.MultimodalOps.imagePhashPairsOf(assets, id, payload,
      maxHamming)

  /** Exact-substring repetition report (ExactSubstr-family): per
    * affected document, the count of >= `gramLen`-token windows that
    * repeat VERBATIM anywhere in the corpus, the number of merged
    * repeat spans, and the repeated-token coverage/fraction. The
    * removal policy (drop the doc, cut the spans) is a downstream
    * projection over this report. Gram stream and hash joins scale
    * linearly in corpus tokens; nothing is all-pairs. */
  def repeatedSpans(docs: DataFrame, id: Column, text: Column,
      gramLen: Int = DedupOps.SubstrGramLen): DataFrame =
    DedupOps.substrSpans(
      docs.select(id.as("doc_id"), text.as("text")), gramLen)

  /** Corpus-wide duplicate-paragraph removal (the CCNet/C4 line-dedup
    * step): paragraphs split on `splitRegex` (blank lines by
    * default), content-hashed, the FIRST occurrence corpus-wide
    * survives, every later occurrence is cut, and documents are
    * reassembled from their surviving paragraphs in order --
    * boilerplate (headers, navigation, license blocks) disappears
    * even where whole-doc dedup sees nothing. Output: (doc_id,
    * n_paras, n_kept, text_dedup). One paragraph-hash shuffle + one
    * doc-keyed reassembly shuffle; never pairwise. */
  def paragraphDedup(docs: DataFrame, id: Column, text: Column,
      splitRegex: String = "\\n+", joinSep: String = "\n"): DataFrame =
    DedupOps.paragraphDedupOf(
      DedupOps.paragraphsOf(docs, id, text, splitRegex), joinSep)

  /** SemDeDup-shape semantic dedup survivors: coarse-cluster the
    * embedding space (per-`seed` means become the quantizer
    * centroids; final cells come from the argmax re-assignment),
    * prune cosine-near-duplicate pairs INSIDE each cell keeping the
    * min-id representative. Returns (vec_id, cell). Grow the number
    * of distinct seeds with the corpus to bound cell size -- the
    * pair stage is sum-of-cell-squared, never corpus squared. */
  def semanticSurvivors(vectors: DataFrame, id: Column, vec: Column,
      seed: Column,
      threshold: Double = DedupOps.SemanticThreshold): DataFrame =
    DedupOps.semanticSurvivors(
      vectors.repartition(DedupOps.JoinParallelism)
        .select(seed.as("label"), id.as("vec_id"),
          org.apache.spark.sql.functions.transform(vec, x => x.cast("double")).as("v")),
      threshold)

  /** Connected components over an arbitrary undirected edge list:
    * (id, component) with component = min id of the component --
    * compose with any of the pair generators for cluster-level
    * dedup. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame =
    DedupOps.connectedComponents(vertices, edges)

  /** End-to-end near-dup clustering: MinHash pairs -> connected
    * components. Returns (id, component). */
  def clusters(docs: DataFrame, id: Column, text: Column,
      threshold: Double = DedupOps.JaccardThreshold): DataFrame = {
    val pairs = minhashPairs(docs, id, text, threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponents(docs.select(id.as("id")), pairs)
  }

  /** Quality-aware survivor pick + soft-dedup weights: per near-dup
    * cluster, the doc maximizing `quality` survives (ties -> min id)
    * and `n_docs` is the cluster size — drop the rest, or weight each
    * member 1/n_docs for soft deduplication (down-weight instead of
    * discard). Output: (cluster_id, survivor_id, n_docs, max_quality).
    * `quality` must be deterministic per doc (length, a gate score, a
    * classifier logit snapshot). */
  def pickSurvivors(docs: DataFrame, id: Column, text: Column,
      quality: Column,
      threshold: Double = DedupOps.JaccardThreshold): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val cl = clusters(docs, id, text, threshold)
      .select(col("id").as("__pid"), col("component").as("cluster_id"))
    val j = docs.select(id.as("__pid"), quality.as("__q"))
      .join(cl, Seq("__pid"))
    val agg = j.groupBy(col("cluster_id")).agg(
      count(lit(1)).as("n_docs"), max(col("__q")).as("max_quality"))
    j.join(agg, Seq("cluster_id"))
      .filter(col("__q") === col("max_quality"))
      .groupBy(col("cluster_id"), col("n_docs"), col("max_quality"))
      .agg(min(col("__pid")).as("survivor_id"))
      .select(col("cluster_id"), col("survivor_id"), col("n_docs"),
        col("max_quality"))
  }

  /** Content-hash Bernoulli sample: keep a row iff its deterministic
    * 60-bit content hash lands under `fraction` -- repartition- and
    * retry-stable, unlike rand(). */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame =
    df.filter(Hashing.h15(keyCol.cast("string")) % 1000000L <
      (fraction * 1000000L).toLong)

  /** Continuous dedup'd ingest against a PERSISTENT signature index --
    * the production composition of [[minhashPairsAgainst]]: the corpus
    * is never re-tokenized, because every batch's surviving token-hash
    * signatures are MERGEd into `sigTable` (schema: doc_id, th) inside
    * the given warehouse store, and the next batch's bands join against
    * that index.
    *
    * Batch semantics, per arriving batch:
    *  1. within-batch near-dup CLUSTERS (banded LSH self-join ->
    *     connected components);
    *  2. a cluster is dropped WHOLE if any member near-matches the
    *     existing index (its content already lives in the corpus --
    *     keeping a different cluster member would readmit it
    *     transitively); otherwise its min-id member survives;
    *  3. survivors' signatures MERGE into `sigTable` (idempotent on
    *     doc_id: re-running a crashed batch is a no-op), and the
    *     survivor ids are returned.
    *
    * Cost per batch: the batch's own signatures + its bucket
    * collisions against the index -- the corpus is scanned, never
    * paired with itself. Pair `store` with a
    * [[graft.table.VersionedTableStore]] and every ingest batch is a
    * rollback-able snapshot of the index.
    *
    * `batchId`: at scale, PASS IT. The index then partitions by
    * batch, and the MERGE commits ONLY this batch's partition -- an
    * unpartitioned index is rewritten wholesale on every merge, which
    * is fine for small corpora and O(corpus) per batch beyond that.
    * Batch ids must be unique per logical batch and stable across
    * retries (the retry then rewrites its own partition only). */
  def ingestDeduped(store: graft.table.WarehouseWrites, sigTable: String,
      batch: DataFrame, id: Column, text: Column,
      threshold: Double = DedupOps.JaccardThreshold,
      batchId: Option[String] = None): DataFrame =
    ingestKeyedDeduped(store, sigTable,
      DedupOps.materializeOnce(
        batch.repartition(DedupOps.JoinParallelism)
          .select(id.as("doc_id"), DedupOps.hashedTokenSet(text).as("th"))),
      withinPairs = sigs => DedupOps.lshJaccardPairs(sigs, DedupOps.MinhashK,
        DedupOps.LshBandCount, DedupOps.LshRows, threshold, "jaccard"),
      betweenPairs = (sigs, index) => DedupOps.lshJaccardPairsBetween(sigs,
        index, DedupOps.MinhashK, DedupOps.LshBandCount, DedupOps.LshRows,
        threshold, "jaccard"),
      batchId)

  /** [[ingestDeduped]] for IMAGES: continuous dedup'd ingest of binary
    * image batches against a persistent perceptual-hash index
    * (`phashTable` schema: doc_id, dhash_lo, dhash_hi [, batch_id]).
    * Pixels are decoded and hashed ONCE per batch, at arrival -- the
    * corpus side of every comparison is the stored 3-column index,
    * never re-decoded bytes. Near-match = Hamming <= `maxHamming` on
    * banded dHash. */
  def ingestImagesDeduped(store: graft.table.WarehouseWrites,
      phashTable: String, batch: DataFrame, id: Column, payload: Column,
      maxHamming: Int = graft.ops.MultimodalOps.HammingMax,
      batchId: Option[String] = None): DataFrame = {
    import graft.ops.MultimodalOps
    def unstored(h: DataFrame): DataFrame = h.select(col("doc_id"),
      col("dhash_lo").as("lo"), col("dhash_hi").as("hi"))
    ingestKeyedDeduped(store, phashTable,
      DedupOps.materializeOnce(
        MultimodalOps.imageDhashOf(batch, id, payload)
          .select(col("doc_id"), col("dhash_lo"), col("dhash_hi"))),
      withinPairs = h =>
        MultimodalOps.imagePhashPairsFromHashes(unstored(h), maxHamming),
      betweenPairs = (h, index) => MultimodalOps.imagePhashPairsBetween(
        unstored(h), unstored(index), maxHamming),
      batchId)
  }

  /** [[ingestDeduped]] for AUDIO: continuous dedup'd ingest of binary
    * audio batches (WAV/PCM, WAV/mu-law, FLAC — container-sniffed)
    * against a persistent FINGERPRINT index (`fpTable` schema:
    * doc_id, fp_lo, fp_hi [, batch_id]). Each clip is decoded ONCE at
    * arrival into a 128-bit energy-delta fingerprint
    * ([[graft.ops.MultimodalOps.audioFingerprintOf]]); near-match =
    * Hamming <= `maxHamming` through the same banded 16-bit
    * equi-join machinery the image path uses — bucket-squared work,
    * never corpus-squared, and the corpus side of every comparison is
    * the stored 3-column index, never re-decoded bytes. */
  def ingestAudioDeduped(store: graft.table.WarehouseWrites,
      fpTable: String, batch: DataFrame, id: Column, payload: Column,
      maxHamming: Int = graft.ops.MultimodalOps.AudioHammingMax,
      batchId: Option[String] = None): DataFrame = {
    import graft.ops.MultimodalOps
    def unstored(h: DataFrame): DataFrame = h.select(col("doc_id"),
      col("fp_lo").as("lo"), col("fp_hi").as("hi"))
    ingestKeyedDeduped(store, fpTable,
      DedupOps.materializeOnce(
        MultimodalOps.audioFingerprintOf(batch, id, payload)),
      withinPairs = h =>
        MultimodalOps.imagePhashPairsFromHashes(unstored(h), maxHamming),
      betweenPairs = (h, index) => MultimodalOps.imagePhashPairsBetween(
        unstored(h), unstored(index), maxHamming),
      batchId)
  }

  /** [[ingestDeduped]] for VIDEO: continuous dedup'd ingest of binary
    * video batches (APNG container) against a persistent FRAME-HASH
    * index (`vhashTable` schema: doc_id, th [, batch_id] — the SAME
    * shape as the text signature index). Each clip's frames decode
    * ONCE at arrival into a perceptual frame-hash SET
    * ([[graft.ops.MultimodalOps.videoFrameHashesOf]]); near-match =
    * Jaccard over frame-hash sets >= `threshold` through the text
    * path's salted banded MinHash-LSH — trims, re-muxes and frame
    * reorders stay near-dups (sets, not sequences), and the corpus
    * side of every comparison is the stored index, never re-decoded
    * frames. */
  def ingestVideosDeduped(store: graft.table.WarehouseWrites,
      vhashTable: String, batch: DataFrame, id: Column, payload: Column,
      threshold: Double = DedupOps.JaccardThreshold,
      batchId: Option[String] = None): DataFrame =
    ingestKeyedDeduped(store, vhashTable,
      DedupOps.materializeOnce(
        graft.ops.MultimodalOps.videoFrameHashesOf(batch, id, payload)),
      withinPairs = sigs => DedupOps.lshJaccardPairs(sigs, DedupOps.MinhashK,
        DedupOps.LshBandCount, DedupOps.LshRows, threshold, "jaccard"),
      betweenPairs = (sigs, index) => DedupOps.lshJaccardPairsBetween(sigs,
        index, DedupOps.MinhashK, DedupOps.LshBandCount, DedupOps.LshRows,
        threshold, "jaccard"),
      batchId)

  /** The SHARED batch contract behind every modality's dedup'd ingest
    * (text token-hash signatures, image perceptual hashes, audio
    * fingerprints — one keyed-signature core, so a new modality only
    * supplies its signature extraction and its two pair generators):
    *
    *  1. within-batch near-dup CLUSTERS (the modality's banded
    *     self-join -> connected components);
    *  2. a cluster is dropped WHOLE if any member near-matches the
    *     existing index (its content already lives in the corpus --
    *     keeping a different cluster member would readmit it
    *     transitively); otherwise its min-id member survives;
    *  3. survivors' signatures MERGE into the index (idempotent on
    *     doc_id: re-running a crashed batch is a no-op), and the
    *     survivor ids are returned.
    *
    * Retry discipline: matches against index entries whose id belongs
    * to THIS batch are excluded — on a crash-retry the batch's own
    * surviving signatures are already in the index, and counting them
    * as corpus hits would empty the retry's survivor list (downstream
    * would lose the batch). Requires the contract every MERGE key
    * already carries: doc_ids are globally unique and stable across
    * re-runs.
    *
    * Cost per batch: the batch's own signatures + its bucket
    * collisions against the index -- the corpus is scanned, never
    * paired with itself. Pair `store` with a
    * [[graft.table.VersionedTableStore]] and every ingest batch is a
    * rollback-able snapshot of the index.
    *
    * `batchId`: at scale, PASS IT. The index then partitions by
    * batch, and the MERGE commits ONLY this batch's partition -- an
    * unpartitioned index is rewritten wholesale on every merge, which
    * is fine for small corpora and O(corpus) per batch beyond that.
    * Batch ids must be unique per logical batch and stable across
    * retries (the retry then rewrites its own partition only).
    *
    * `sigs` carries `doc_id` plus the modality's signature columns in
    * STORED form (what the index table holds); `withinPairs` yields
    * (doc_a, doc_b) candidate near-dups within the batch;
    * `betweenPairs(sigs, index)` yields (new_id, existing_id) hits
    * of the batch against the stored index. */
  private def ingestKeyedDeduped(store: graft.table.WarehouseWrites,
      table: String, sigs: DataFrame,
      withinPairs: DataFrame => DataFrame,
      betweenPairs: (DataFrame, DataFrame) => DataFrame,
      batchId: Option[String]): DataFrame = {
    val comps = connectedComponents(
      sigs.select(col("doc_id").as("id")),
      withinPairs(sigs)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val corpusHits =
      if (!store.exists(table)) comps.limit(0).select(col("id"))
      else betweenPairs(sigs, store.read(table))
        .join(sigs.select(col("doc_id").as("existing_id")),
          Seq("existing_id"), "left_anti")
        .select(col("new_id").as("id")).distinct()
    val droppedClusters = comps.join(corpusHits, Seq("id"))
      .select(col("component")).distinct()
    val survivors = comps
      .join(droppedClusters, Seq("component"), "left_anti")
      .groupBy(col("component")).agg(min(col("id")).as("doc_id"))
      .select(col("doc_id"))
    val survivorSigs0 = sigs.join(survivors, Seq("doc_id"))
    val (survivorSigs, partitionBy) = batchId match {
      case Some(b) =>
        (survivorSigs0.withColumn("batch_id", lit(b)).localCheckpoint(true),
          Seq("batch_id"))
      case None => (survivorSigs0.localCheckpoint(true), Nil)
    }
    graft.table.UpsertWriter.upsertAll(store, table, survivorSigs,
      keys = Seq("doc_id"), partitionBy = partitionBy)
    survivorSigs.select(col("doc_id"))
  }
}
