package graft.api

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables
import graft.ops.DedupOps

/** The DataFrame-first API must produce exactly the results of the
  * table-bound query functions when pointed at the same data with
  * different column names. */
class DedupApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def renamedDocs =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("my_id"), col("text").as("body"), col("lang"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("minhashPairs matches dedupMinhashLsh on renamed columns") {
    val api = Dedup.minhashPairs(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupMinhashLsh(spark, dir)))
  }

  test("shinglePairs matches dedupNgramJaccard") {
    val api = Dedup.shinglePairs(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupNgramJaccard(spark, dir)))
  }

  test("simhashPairs with a lang block matches dedupSimhash") {
    val api = Dedup.simhashPairs(renamedDocs, col("my_id"), col("body"), Seq("lang"))
    assert(rows(api) === rows(DedupOps.dedupSimhash(spark, dir)))
  }

  test("clusters matches dedupClusters") {
    val api = Dedup.clusters(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupClusters(spark, dir)))
  }

  test("exactGroups matches dedupExact") {
    val api = Dedup.exactGroups(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupExact(spark, dir)))
  }

  test("repeatedSpans: planted repeats merge into the right spans") {
    import spark.implicits._
    // doc 1 and doc 2 share a verbatim 10-token run (tokens r0..r9);
    // doc 3 repeats a 8-token run of doc 1 AND a separate 8-token run
    // of doc 2 with unique filler between -> two merged spans.
    val r = (0 until 10).map(i => s"r$i").mkString(" ")      // shared run
    val s1 = (0 until 8).map(i => s"s$i").mkString(" ")      // run 2
    def uniq(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 6)} $r ${uniq("b", 6)}"),
      (2L, s"${uniq("c", 6)} $r $s1"),
      (3L, s"$s1 ${uniq("d", 6)} $r"),
    ).toDF("id", "body")
    val out = Dedup.repeatedSpans(docs, col("id"), col("body"), gramLen = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // doc 1: one 10-token span (3 overlapping 8-grams merged)
    assert(out(1L) === ((3L, 1L, 10L)))
    // doc 2: r-run and s1 are adjacent but DISJOINT repeats (the
    // 18-token concatenation never recurs verbatim): 3 + 1 grams,
    // two spans of 10 + 8 tokens
    assert(out(2L) === ((4L, 2L, 18L)))
    // doc 3: two separated spans (8 + 10 tokens)
    assert(out(3L) === ((4L, 2L, 18L)))
  }

  test("repeatedSpans matches dedupSubstrSpans on renamed columns") {
    val api = Dedup.repeatedSpans(renamedDocs, col("my_id"), col("body"))
    assert(rows(api) === rows(DedupOps.dedupSubstrSpans(spark, dir)))
  }

  test("semanticSurvivors matches dedupSemantic on renamed columns") {
    val renamed = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("eid"), col("embedding").as("e"),
        col("label").as("topic"))
    val api = Dedup.semanticSurvivors(renamed, col("eid"), col("e"), col("topic"))
    assert(rows(api) === rows(DedupOps.dedupSemantic(spark, dir)))
    // pruning is real and the survivor set is a strict subset
    val total = renamed.count()
    val kept = api.count()
    assert(kept < total && kept > 0, s"degenerate pruning: $kept of $total")
  }

  test("LSH banding recall: exact-set dups always found, high-jaccard mostly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(500)(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // 40 base docs; per base: one token-permuted twin (identical token
    // SET -> jaccard 1.0 -> banding recall is exactly 1 by construction)
    // and one light edit (~2 of 60 tokens replaced -> jaccard ~0.95)
    val rows = (0 until 40).flatMap { i =>
      val base = doc(60).split(" ")
      val permuted = rnd.shuffle(base.toSeq).mkString(" ")
      val edited = base.zipWithIndex.map { case (t, j) =>
        if (j < 2) vocab(rnd.nextInt(vocab.length)) else t
      }.mkString(" ")
      Seq((i * 10L, base.mkString(" ")), (i * 10L + 1, permuted), (i * 10L + 2, edited))
    }
    val docs = rows.toDF("id", "txt")
    val pairs = Dedup.minhashPairs(docs, col("id"), col("txt"), threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every (base, permuted) pair MUST be present: same token set
    (0 until 40).foreach { i =>
      assert(pairs.contains((i * 10L, i * 10L + 1)), s"exact-set pair $i missed")
    }
    // banding curve at j~0.95, b=2 r=8: expect most edited twins too
    val editedFound = (0 until 40).count { i =>
      pairs.contains((i * 10L, i * 10L + 2)) || pairs.contains((i * 10L + 1, i * 10L + 2))
    }
    assert(editedFound >= 28, s"recall on ~0.95-jaccard pairs too low: $editedFound/40")
  }

  test("containment pairs find planted sub-documents minhash misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector.tabulate(800)(i => s"t$i")
    // big doc = 60 distinct-ish tokens; small doc = its first 50
    // tokens (token-set containment 1.0, symmetric jaccard ~0.83 --
    // UNDER the 0.9 minhash threshold)
    val rows = (0 until 30).flatMap { i =>
      val big = Seq.fill(60)(vocab(rnd.nextInt(vocab.length)))
      Seq((i * 10L, big.mkString(" ")), (i * 10L + 1, big.take(50).mkString(" ")))
    }
    val docs = rows.toDF("id", "txt")
    val pairs = Dedup.containmentPairs(docs, col("id"), col("txt"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // bottom-6 sketch: the pair is missed only if >= 6 of the big
    // doc's 10 non-shared windows hash below every shared window
    // (~1e-5 per pair) -- every planted pair must surface
    val found = (0 until 30).count(i => pairs.contains((i * 10L, i * 10L + 1)))
    assert(found >= 29, s"containment recall too low: $found/30")
  }

  test("decontamination flags corpus docs sharing benchmark n-grams, and only those") {
    import spark.implicits._
    val gram = (1 to 8).map(i => s"eval$i token$i").mkString(" ") // 16 tokens
    val corpus = Seq(
      // contains the benchmark 8-grams verbatim inside other text
      (1L, s"unrelated lead in text $gram trailing words here"),
      // clean doc, no shared 8-gram
      (2L, (1 to 30).map(i => s"clean$i word$i").mkString(" ")),
      // partial overlap shorter than 8 tokens: must NOT flag
      (3L, "eval1 token1 eval2 token2 then diverges completely " +
        (1 to 20).map(i => s"x$i").mkString(" ")))
      .toDF("my_id", "body")
    val benchmark = Seq((100L, gram)).toDF("bid", "btext")
    val hits = Dedup.decontaminationHits(corpus, col("my_id"), col("body"),
      benchmark, col("btext"), n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L), "contaminated doc not flagged")
    assert(hits(1L) >= 1L)
    assert(!hits.contains(2L), "clean doc falsely flagged")
    assert(!hits.contains(3L), "sub-n overlap must stay below the resolution")
    // facade == table-bound query on the driver tables
    val api = Dedup.decontaminationHits(
      renamedDocs.filter(pmod(col("my_id"), lit(20)) =!= 0), col("my_id"), col("body"),
      renamedDocs.filter(pmod(col("my_id"), lit(20)) === 0), col("body"))
    assert(rows(api) === rows(DedupOps.dedupDecontaminate(spark, dir)))
  }

  test("incremental dedup = exactly the cross-parity slice of the self-join pairs") {
    import spark.implicits._
    val full = DedupOps.dedupMinhashLsh(spark, dir)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val expected = full.collect {
      case (a, b, j) if a % 2 != b % 2 =>
        (if (a % 2 == 1) (a, b) else (b, a), j)
    }.toSet
    val inc = DedupOps.dedupIncremental(spark, dir)
      .select("new_id", "existing_id", "jaccard").as[(Long, Long, Double)].collect()
    inc.foreach { case (n, e, _) =>
      assert(n % 2 === 1 && e % 2 === 0, s"wrong-side pair ($n,$e)")
    }
    assert(inc.map { case (n, e, j) => ((n, e), j) }.toSet === expected)
  }

  test("minhashPairsAgainst never pairs within a side") {
    import spark.implicits._
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val existing = Seq(("e1", txt), ("e2", txt + " lambda")).toDF("k", "body")
    // n1 dups e1; n2 and n3 dup EACH OTHER but nothing existing
    val fresh = Seq(("n1", txt), ("n2", "mu nu xi omicron pi rho sigma tau"),
      ("n3", "mu nu xi omicron pi rho sigma tau")).toDF("k", "body")
    val got = Dedup.minhashPairsAgainst(fresh, col("k"), col("body"),
        existing, col("k"), col("body"))
      .select("new_id", "existing_id").as[(String, String)].collect().toSet
    assert(got.contains(("n1", "e1")))
    assert(!got.exists { case (a, b) => a.startsWith("n") && b.startsWith("n") },
      "new x new pair leaked into incremental output")
    assert(!got.exists { case (a, b) => a.startsWith("e") && b.startsWith("e") },
      "existing x existing pair leaked into incremental output")
  }

  test("string ids: salted pair join still finds duplicates (regression)") {
    import spark.implicits._
    // the salt used to be id % G, which coerces string ids to null on
    // BOTH join sides -> zero pairs, silently; xxhash64-based salting
    // must keep non-numeric ids working
    val docs = (0 until 40).flatMap { i =>
      val txt = s"alpha$i beta gamma delta epsilon zeta eta theta iota kappa"
      Seq((s"url://a/$i", txt), (s"url://b/$i", txt))
    }.toDF("url", "txt")
    val pairs = Dedup.minhashPairs(docs, col("url"), col("txt"))
      .select("doc_a", "doc_b").as[(String, String)].collect()
    assert(pairs.length === 40, "one pair per planted duplicate")
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("adversarial skew: one giant duplicate class still yields every pair") {
    import spark.implicits._
    // 120 identical docs -> ONE band bucket holds the entire corpus;
    // the salted self-join must still emit all C(120,2) pairs exactly
    // once (this is the workload the salting exists for)
    val docs = (0L until 120L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "txt")
    val pairs = Dedup.minhashPairs(docs, col("id"), col("txt"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.length === 120 * 119 / 2)
    assert(pairs.distinct.length === pairs.length, "duplicate pair emissions")
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("ingestDeduped maintains a persistent signature index across batches") {
    import spark.implicits._
    val store = new graft.table.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ingest").toString)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tC = "one two three four five six seven eight nine ten"
    val tF = "red orange yellow green blue indigo violet black white gray"

    // batch 1: 1 and 2 are duplicates (cluster survivor = 1); 3 distinct
    val b1 = Seq((1L, tA), (2L, tA), (3L, tC)).toDF("id", "body")
    val s1 = Dedup.ingestDeduped(store, "sig_index", b1, col("id"), col("body"))
    assert(ids(s1) === Seq(1L, 3L))
    assert(ids(store.read("sig_index")) === Seq(1L, 3L))

    // batch 2: 10+11 duplicate batch-1 content (whole cluster dropped --
    // keeping 11 would readmit 10's content transitively); 12 is new
    val b2 = Seq((10L, tA), (11L, tA), (12L, tF)).toDF("id", "body")
    val s2 = Dedup.ingestDeduped(store, "sig_index", b2, col("id"), col("body"))
    assert(ids(s2) === Seq(12L))
    assert(ids(store.read("sig_index")) === Seq(1L, 3L, 12L))

    // crash-retry of batch 2 is a no-op: same survivors, index unchanged
    val s2b = Dedup.ingestDeduped(store, "sig_index", b2, col("id"), col("body"))
    assert(ids(s2b) === Seq(12L))
    assert(ids(store.read("sig_index")) === Seq(1L, 3L, 12L))

    // retry of a batch with an internal dup cluster: the dropped
    // cluster-mate (21) now matches the batch's OWN surviving index
    // entry (20) -- that hit must not kill the cluster, or the retry
    // would lose doc 20
    val tG = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val b3 = Seq((20L, tG), (21L, tG)).toDF("id", "body")
    assert(ids(Dedup.ingestDeduped(store, "sig_index", b3,
      col("id"), col("body"))) === Seq(20L))
    assert(ids(Dedup.ingestDeduped(store, "sig_index", b3,
      col("id"), col("body"))) === Seq(20L), "retry lost the cluster survivor")
    assert(ids(store.read("sig_index")) === Seq(1L, 3L, 12L, 20L))
  }

  test("ingestDeduped with batch ids: the index MERGE is partition-local") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-b").toString
    val vs = new graft.table.VersionedTableStore(spark, root)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tF = "red orange yellow green blue indigo violet black white gray"
    def b1Files = vs.read("sig_b").inputFiles
      .filter(_.contains("batch_id=b1")).sorted.toSeq
    Dedup.ingestDeduped(vs, "sig_b",
      Seq((1L, tA)).toDF("id", "body"), col("id"), col("body"),
      batchId = Some("b1"))
    val afterB1 = b1Files
    assert(afterB1.nonEmpty)
    Dedup.ingestDeduped(vs, "sig_b",
      Seq((2L, tA), (3L, tF)).toDF("id", "body"), col("id"), col("body"),
      batchId = Some("b2"))
    // batch 2 committed ONLY its own partition: b1's files are shared
    // (identical paths inside batch 1's original data dir)
    assert(b1Files === afterB1,
      "batch-1 partition was rewritten by batch 2's merge")
    // dedup semantics unchanged: 2 duplicates corpus doc 1, 3 is new
    assert(ids(vs.read("sig_b")) === Seq(1L, 3L))
    // retry rewrites its own partition only, same result
    Dedup.ingestDeduped(vs, "sig_b",
      Seq((2L, tA), (3L, tF)).toDF("id", "body"), col("id"), col("body"),
      batchId = Some("b2"))
    assert(ids(vs.read("sig_b")) === Seq(1L, 3L))
    assert(b1Files === afterB1)
  }

  test("ingestAudioDeduped: one keyed-signature core serves a new modality") {
    import spark.implicits._
    val store = new graft.table.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ingest-au").toString)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    // a clip whose WINDOW energies differ decisively between adjacent
    // 16-sample windows (amp levels 7w+seed mod 13 never repeat across
    // neighbors), so the 128 energy-delta bits survive a lossy mu-law
    // round trip — the fingerprint's design claim, asserted below
    def clip(seed: Long): Array[Short] = Array.tabulate(129 * 16) { t =>
      val amp = 2000 + 900 * (((t / 16) * 7 + seed) % 13).toInt
      (((t * 37 + seed * 11) % 200 - 100) * amp / 100).toShort
    }
    def wav(seed: Long) = graft.ops.PixelCodec.encodeWav(clip(seed), 8000)
    def flac(seed: Long) = graft.ops.FlacCodec.encode(clip(seed), 8000, 1)
    def ulaw(seed: Long) = graft.ops.PixelCodec.encodeWavUlaw(clip(seed), 8000)

    // batch 1: docs 1 and 2 are the SAME recording in different
    // containers (WAV vs FLAC — identical samples, identical
    // fingerprint); 3 is a different recording
    val b1 = Seq((1L, wav(0L)), (2L, flac(0L)), (3L, wav(5L)))
      .toDF("id", "payload")
    val s1 = Dedup.ingestAudioDeduped(store, "fp_index", b1,
      col("id"), col("payload"))
    assert(ids(s1) === Seq(1L, 3L))
    assert(ids(store.read("fp_index")) === Seq(1L, 3L))

    // batch 2: doc 10 is recording 0 AGAIN, now through the LOSSY
    // mu-law container — the fingerprint must still near-match the
    // index (whole cluster drops); 12 is new
    val b2 = Seq((10L, ulaw(0L)), (12L, flac(9L))).toDF("id", "payload")
    val s2 = Dedup.ingestAudioDeduped(store, "fp_index", b2,
      col("id"), col("payload"))
    assert(ids(s2) === Seq(12L))
    assert(ids(store.read("fp_index")) === Seq(1L, 3L, 12L))

    // crash-retry converges (the shared core's retry discipline)
    val s2b = Dedup.ingestAudioDeduped(store, "fp_index", b2,
      col("id"), col("payload"))
    assert(ids(s2b) === Seq(12L))
    assert(ids(store.read("fp_index")) === Seq(1L, 3L, 12L))

    // the design claim directly: PCM and mu-law fingerprints of one
    // recording sit within the Hamming bound; different recordings
    // sit far outside it
    val fps = graft.ops.MultimodalOps.audioFingerprintOf(
      Seq((1L, wav(0L)), (2L, ulaw(0L)), (3L, wav(5L)))
        .toDF("id", "payload"), col("id"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(fps(1L), fps(2L)) <=
      graft.ops.MultimodalOps.AudioHammingMax)
    assert(ham(fps(1L), fps(3L)) >
      3 * graft.ops.MultimodalOps.AudioHammingMax)
  }

  test("ingestVideosDeduped: frame-hash sets ride the text LSH machinery") {
    import spark.implicits._
    val store = new graft.table.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ingest-vid").toString)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    // 12x10 grey frames with DISTINCT per-frame gradients: every frame
    // hashes to a distinct dHash, so frame sets behave like token sets
    def frame(seed: Int): graft.ops.PixelCodec.Image =
      graft.ops.PixelCodec.Image(12, 10, 1, Array.tabulate(120) { i =>
        val x = i % 12; val y = i / 12
        ((x * (17 + seed * 13) + y * (29 + seed * 7) + seed * 41) % 256).toByte
      })
    def video(seeds: Seq[Int]): Array[Byte] =
      graft.ops.PixelCodec.encodeApng(seeds.map(frame))
    val full = 0 to 9 // 10 frames
    // batch 1: doc 2 is doc 1 trimmed by one frame (J = 9/10 >= 0.8
    // threshold); doc 3 shares nothing
    val b1 = Seq((1L, video(full)), (2L, video(full.drop(1))),
      (3L, video(20 to 25))).toDF("id", "payload")
    val s1 = Dedup.ingestVideosDeduped(store, "vid_index", b1,
      col("id"), col("payload"))
    assert(ids(s1) === Seq(1L, 3L))
    assert(ids(store.read("vid_index")) === Seq(1L, 3L))
    // batch 2: doc 10 is recording 1 REORDERED and re-muxed (same
    // frame set — sets, not sequences) -> drops against the index;
    // 12 is new
    val b2 = Seq((10L, video(full.reverse)), (12L, video(40 to 46)))
      .toDF("id", "payload")
    val s2 = Dedup.ingestVideosDeduped(store, "vid_index", b2,
      col("id"), col("payload"))
    assert(ids(s2) === Seq(12L))
    assert(ids(store.read("vid_index")) === Seq(1L, 3L, 12L))
    // crash-retry converges (shared-core discipline)
    assert(ids(Dedup.ingestVideosDeduped(store, "vid_index", b2,
      col("id"), col("payload"))) === Seq(12L))
    assert(ids(store.read("vid_index")) === Seq(1L, 3L, 12L))
  }

  test("hashSample is deterministic and repartition-stable") {
    val a = Dedup.hashSample(renamedDocs, col("my_id"), 0.1)
      .select("my_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Dedup.hashSample(renamedDocs.repartition(7), col("my_id"), 0.1)
      .select("my_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
