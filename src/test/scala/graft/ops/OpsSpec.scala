package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Sanity/regression specs for the training-data ops over sf0.001.
  * (The DuckDB oracle is the authoritative gate; these pin cheap
  * invariants so future refactors fail fast in `sbt test`.) */
class OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("text stats are consistent per row") {
    val bad = TextOps.textStats(spark, dir)
      .filter(col("n_distinct_tokens") > col("n_tokens") ||
        col("n_tokens") <= 0 || col("lexical_diversity") > 1.0)
      .count()
    assert(bad === 0)
  }

  test("topTokenFreq fold equals a direct frequency count") {
    val docs = Seq(
      (1L, "a b a c a b"),       // top = a x3
      (2L, "x"),                 // top = x x1
      (3L, "q q q q"),           // top = q x4
      (4L, "m n o p")            // all singletons
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionOf(docs)
      .select("doc_id", "top_token_freq").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 4L, 4L -> 1L))
  }

  test("quality gate keep = conjunction of its rules, reason = first failure") {
    val rows = TextOps.qualityGate(spark, dir).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val rules = Seq("r_len", "r_diversity", "r_top_token", "r_dup_3gram")
        .map(n => n -> r.getAs[Boolean](n))
      val keep = r.getAs[Boolean]("keep")
      assert(keep === rules.forall(_._2))
      val reason = Option(r.getAs[String]("drop_reason"))
      if (keep) { kept += 1; assert(reason.isEmpty) }
      else assert(reason.nonEmpty)
    }
    // thresholds must discriminate: some docs kept, some dropped
    assert(kept > 0 && kept < rows.length)
  }

  test("pii scrub counts and redacts emails/IPv4, leaves clean text byte-identical") {
    val docs = Seq(
      (1L, "contact alice.smith+x@example.co.uk or 10.0.42.7 for access"),
      (2L, "two mails a@b.io c@d.org and versions 1.2.3 are not 1.2.3.4 wait yes"),
      (3L, "perfectly clean prose with no contact details at all"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrubOf(docs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._2 === 1 && out(0)._3 === 1)
    assert(out(0)._4 === "contact <EMAIL> or <IP> for access")
    assert(out(1)._2 === 2 && out(1)._3 === 1)
    assert(out(1)._4 === "two mails <EMAIL> <EMAIL> and versions 1.2.3 are not <IP> wait yes")
    assert(out(2)._2 === 0 && out(2)._3 === 0)
    assert(out(2)._4 === "perfectly clean prose with no contact details at all")
  }

  test("langId picks a language consistent with its scores") {
    val rows = TextOps.langId(spark, dir).collect()
    rows.foreach { r =>
      val en = r.getAs[Long]("score_en")
      val others = Seq("score_de", "score_fr", "score_es").map(r.getAs[Long])
      val pred = r.getAs[String]("predicted_lang")
      if (en > 0 && others.forall(en > _)) assert(pred === "en")
    }
  }

  test("minhash LSH pairs are symmetric-free, above threshold, and deduplicated") {
    val pairs = DedupOps.dedupMinhashLsh(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= DedupOps.JaccardThreshold)
    }
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("minhash LSH pairs verify against direct jaccard computation") {
    val th = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), DedupOps.hashedTokenSet(col("text")).as("th"))
      .as[(Long, Seq[Long])].collect().toMap
    DedupOps.dedupMinhashLsh(spark, dir).collect().take(50).foreach { r =>
      val (a, b) = (th(r.getAs[Long]("doc_a")).toSet, th(r.getAs[Long]("doc_b")).toSet)
      val expected = BigDecimal(a.intersect(b).size.toDouble / a.union(b).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("jaccard") === expected)
    }
  }

  test("cluster ids are component minima and respect the pair graph") {
    val clusters = DedupOps.dedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    // every doc has a label <= its own id
    clusters.foreach { case (d, c) => assert(c <= d) }
    // both endpoints of every near-dup pair share a cluster
    DedupOps.dedupMinhashLsh(spark, dir).collect().foreach { r =>
      assert(clusters(r.getAs[Long]("doc_a")) === clusters(r.getAs[Long]("doc_b")))
    }
  }

  test("ANN results are a subset of brute-force cosine rankings per query") {
    val brute = SimilarityOps.cosineTopK(spark, dir)
      .select("query_id", "match_id", "cosine").as[(Long, Long, Double)]
      .collect().map { case (q, m, c) => (q, m) -> c }.toMap
    val ann = SimilarityOps.annSignLsh(spark, dir)
      .select("query_id", "match_id", "cosine").as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    // every ANN hit that brute force also ranked must carry the same score
    ann.foreach { case (q, m, c) =>
      brute.get((q, m)).foreach(bc => assert(bc === c))
    }
    // the query vector itself is always in its own bucket -> rank 1 self-hit
    val selfHits = ann.collect { case (q, m, _) if q == m => q }.toSet
    assert(selfHits === (0L until SimilarityOps.NumQueries).toSet)
  }

  test("IVF ANN scores agree with brute force; self-hit lands in a probed cell") {
    val brute = SimilarityOps.cosineTopK(spark, dir)
      .select("query_id", "match_id", "cosine").as[(Long, Long, Double)]
      .collect().map { case (q, m, c) => (q, m) -> c }.toMap
    val ivf = SimilarityOps.annIvf(spark, dir)
      .select("query_id", "match_id", "cosine").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, m, c) =>
      brute.get((q, m)).foreach(bc => assert(bc === c))
    }
    // every query gets a full (or cell-limited) result list, ranked 1..k
    val byQuery = ivf.groupBy(_._1)
    assert(byQuery.keySet === (0L until SimilarityOps.NumQueries).toSet)
    // when the query's own cell IS probed, the self-match is rank 1
    // (cosine 1.0 dominates); probing a different cell is legitimate
    // IVF recall loss, so self-hits are not asserted universally
    ivf.collect { case (q, m, c) if q == m => c }.foreach(c => assert(c === 1.0))
  }

  test("topk sketch capacity covers the per-lang vocabulary (exactness precondition)") {
    // topkTokensSketch is oracle-checked against an EXACT rank
    // derivation, which is only valid while capacity=64 >= the
    // per-language distinct token-hash count. If the fixture
    // vocabulary ever outgrows the sketch, fail HERE with a clear
    // message instead of an opaque oracle hash mismatch.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val maxVocab = graft.core.Tables.documents(spark, d)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("lang").agg(countDistinct(col("tok")).as("v"))
        .agg(max(col("v"))).as[Long].head()
      assert(maxVocab <= 64,
        s"per-lang vocabulary $maxVocab exceeds sketch capacity 64 at $d")
    }
  }

  test("header decoder reads real PNG IHDR / JPEG SOF dimensions") {
    import MultimodalOps.HeaderDecoder
    // PNG: signature + IHDR length(13) + "IHDR" + w=640, h=360 BE
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(640) ++ be32(360) ++ Array[Byte](8, 6, 0, 0, 0)
    assert(HeaderDecoder.imageDims(png) === Some((640, 360, "png")))
    // JPEG: SOI, APP0 segment (skipped via its length), then SOF0
    // len=17, precision 8, h=1080, w=1920, 3 components
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val jpeg = Array(0xff, 0xd8).map(_.toByte) ++
      (Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++ new Array[Byte](14)) ++
      (Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(1080) ++ be16(1920) ++ new Array[Byte](10))
    assert(HeaderDecoder.imageDims(jpeg) === Some((1920, 1080, "jpeg")))
    // progressive JPEG frame header (SOF2) parses identically
    val prog = jpeg.updated(21, 0xc2.toByte)
    assert(HeaderDecoder.imageDims(prog) === Some((1920, 1080, "jpeg")))
    // truncated / corrupt / non-image bytes fall back, never throw
    assert(HeaderDecoder.imageDims(png.take(20)) === None)
    assert(HeaderDecoder.imageDims(jpeg.take(6)) === None)
    assert(HeaderDecoder.imageDims("GIF89a plain text".getBytes) === None)
    assert(HeaderDecoder.imageDims(Array.empty[Byte]) === None)
    // the decode boundary routes parsed images as 1-frame stills and
    // everything else through the deterministic fallback
    assert(MultimodalOps.StubDecoder.decode(png) === ((640, 360, 1)))
    val n = 11
    assert(MultimodalOps.StubDecoder.decode(new Array[Byte](n)) ===
      (((n * 7 + 3) % 640 + 1, (n * 11 + 5) % 480 + 1, n % 30 + 1)))
  }

  test("multimodal stub decode is deterministic and schema-typed") {
    val a = MultimodalOps.decodeFeatures(spark, dir).collect()
    val b = MultimodalOps.decodeFeatures(spark, dir).collect()
    assert(a === b)
    assert(a.forall(r => r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640))
  }

  test("resize plan fits the box and preserves aspect ordering") {
    val rows = MultimodalOps.resizePlan(spark, dir).collect()
    rows.foreach { r =>
      val (sw, sh) = (r.getAs[Int]("src_w"), r.getAs[Int]("src_h"))
      val (dw, dh) = (r.getAs[Int]("dst_w"), r.getAs[Int]("dst_h"))
      assert(dw >= 1 && dw <= MultimodalOps.TargetW)
      assert(dh >= 1 && dh <= MultimodalOps.TargetH)
      // one side hits the box exactly; wider-than-tall sources bind width
      assert(dw == MultimodalOps.TargetW || dh == MultimodalOps.TargetH)
      if (sw.toLong * MultimodalOps.TargetH >= sh.toLong * MultimodalOps.TargetW)
        assert(dw === MultimodalOps.TargetW)
    }
  }

  test("frame sampling emits every Nth frame with deterministic fingerprints") {
    val frames = MultimodalOps.sampleFrames(spark, dir).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % MultimodalOps.FrameStride === 0)
    }
    val perDoc = MultimodalOps.decodeFeatures(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames")).toMap
    val counts = frames.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length)
    counts.foreach { case (id, n) =>
      assert(n === (perDoc(id) + MultimodalOps.FrameStride - 1) / MultimodalOps.FrameStride)
    }
  }

  test("perceptron separates a linearly separable planted corpus") {
    import org.apache.spark.sql.functions.{col, when, lit}
    // 'alpha' and 'omega' hash to distinct buckets (59 vs 52 mod 64,
    // precomputed), so the classes are orthogonal features -- the
    // perceptron convergence theorem guarantees separation within the
    // 3 batch epochs
    val docs = Seq(
      (1L, "alpha alpha alpha", "en"), (2L, "alpha alpha", "en"),
      (3L, "omega omega omega", "fr"), (4L, "omega omega", "fr"))
      .toDF("doc_id", "text", "lang")
    val y = when(col("lang") === "en", lit(1L)).otherwise(lit(-1L))
    val got = TextOps.perceptronOf(docs, y)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(1L)._2 === 1 && got(2L)._2 === 1,
      s"positive class misclassified: $got")
    assert(got(3L)._2 === -1 && got(4L)._2 === -1,
      s"negative class misclassified: $got")
    // margins scale with the token count inside a class
    assert(got(1L)._1 > got(2L)._1 && got(3L)._1 < got(4L)._1)
  }

  test("max drawdown matches the hand-computed planted price path") {
    import graft.queries.AnalyticsQueries
    // user 1: 100 -> 120 -> 90 -> 110 -> 60: peak path 100,120,120,120,
    // 120 -> worst drawdown (120-60)/120 = 50%. user 2 monotone up ->
    // 0%. user 3 all zeros -> NULL (guarded division).
    val rows = Seq(
      (1L, 1L, 100.0), (1L, 2L, 120.0), (1L, 3L, 90.0),
      (1L, 4L, 110.0), (1L, 5L, 60.0),
      (2L, 1L, 10.0), (2L, 2L, 20.0), (2L, 3L, 30.0),
      (3L, 1L, 0.0), (3L, 2L, 0.0))
      .map { case (u, i, v) => (u, i, i * 1000L, v) }
    val got = AnalyticsQueries.drawdownOf(
        rows.toDF("user_id", "event_id", "ts_us", "value"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(1L) === ((5L, Some(50.0))))
    assert(got(2L) === ((3L, Some(0.0))))
    assert(got(3L) === ((2L, None)), "all-zero peaks must yield NULL, not /0")
  }

  test("winsorize clips exactly the planted outliers; clean groups untouched") {
    import graft.queries.AnalyticsQueries
    // g1: 100 values 1..100 with two planted outliers far outside;
    // p01/p99 of the 102 values pin the clip band so exactly the
    // outliers clip. g2: constant stream -- lo=hi, nothing clips.
    val g1 = (1 to 100).map(i => ("g1", i.toDouble)) ++
      Seq(("g1", -1e6), ("g1", 1e6))
    val g2 = (1 to 50).map(_ => ("g2", 7.0))
    val out = AnalyticsQueries.winsorizeOf((g1 ++ g2).toDF("event_type", "value"))
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = out("g1")
    assert(r1.getAs[Long]("n") === 102L)
    // interpolated p01 over the 102 sorted values sits at rank 1.01
    // (between 1 and 2), p99 at rank 99.99 (between 99 and 100): the
    // outlier AND the adjacent extreme clip on each side
    val (lo1, hi1) = (r1.getAs[Double]("lo"), r1.getAs[Double]("hi"))
    assert(math.abs(lo1 - 1.01) < 1e-9 && math.abs(hi1 - 99.99) < 1e-9)
    assert(r1.getAs[Long]("n_clip_lo") === 2L, "-1e6 and 1 sit below p01")
    assert(r1.getAs[Long]("n_clip_hi") === 2L, "1e6 and 100 sit above p99")
    // clipped sum = sum(2..99) + 2*lo + 2*hi (four rows take a bound)
    assert(math.abs(r1.getAs[Double]("w_sum") - (4949.0 + 2 * lo1 + 2 * hi1)) < 1e-3)
    val r2 = out("g2")
    assert(r2.getAs[Long]("n_clip_lo") === 0L)
    assert(r2.getAs[Long]("n_clip_hi") === 0L)
    assert(r2.getAs[Double]("w_sum") === 350.0)
    assert(r2.getAs[Double]("w_mean") === 7.0)
  }

  test("MAD shrugs off the outlier that owns the stddev") {
    import graft.queries.AnalyticsQueries
    // {1..7}: med 4, deviations {0,1,1,2,2,3,3} -> mad 2. Adding a
    // 1000 outlier moves the mean by >100 and stddev by >300; med
    // shifts to 4.5, deviations sort to {.5,.5,1.5,1.5,2.5,2.5,3.5,
    // 995.5} whose interpolated median is (1.5+2.5)/2 = 2 -- the
    // outlier contributes one rank and nothing else (50% breakdown)
    val clean = (1 to 7).map(i => ("g", i.toDouble))
    val dirty = clean :+ (("g", 1000.0))
    val m1 = AnalyticsQueries.madOf(clean.toDF("event_type", "value"))
      .select("med", "mad").as[(Double, Double)].head()
    assert(m1 === ((4.0, 2.0)))
    val m2 = AnalyticsQueries.madOf(dirty.toDF("event_type", "value"))
      .select("med", "mad").as[(Double, Double)].head()
    assert(m2 === ((4.5, 2.0)))
  }

  test("approx winsorize/MAD track their exact gates on the real table") {
    import graft.queries.AnalyticsQueries
    val exactM = AnalyticsQueries.a15Mad(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    AnalyticsQueries.a15MadApprox(spark, dir).collect().foreach { r =>
      val (med, mad) = exactM(r.getString(0))
      assert(math.abs(r.getAs[Double]("med") - med) <= 0.25 * math.max(mad, 1e-9),
        s"approx median drifted: ${r.getString(0)}")
      assert(math.abs(r.getAs[Double]("mad") - mad) <= 0.35 * math.max(mad, 1e-9),
        s"approx MAD drifted: ${r.getString(0)}")
    }
    val exactW = AnalyticsQueries.a13Winsorize(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w_mean")).toMap
    AnalyticsQueries.a13WinsorizeApprox(spark, dir).collect().foreach { r =>
      val em = exactW(r.getString(0))
      assert(math.abs(r.getAs[Double]("w_mean") - em) <= 0.05 * math.abs(em),
        s"approx winsorized mean drifted: ${r.getString(0)}")
    }
  }

  test("approx percentiles land inside the q+-0.01 exact rank band") {
    import graft.queries.AnalyticsQueries
    // rank-error framing: approx_percentile returns an actual data
    // value near the requested rank, so the right bound is the exact
    // percentile band around q, not a value-space epsilon
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val bandDf = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.24, 0.26, 0.49, 0.51, 0.89, 0.91, 0.98, 1.0))").as("b"))
    val bands = bandDf.collect().map { r =>
      r.getAs[String]("event_type") -> r.getSeq[Double](1)
    }.toMap
    val approx = AnalyticsQueries.a4PercentilesApprox(spark, dir).collect().map { r =>
      r.getAs[String]("event_type") ->
        Seq("p25", "p50", "p90", "p99").map(r.getAs[Double])
    }.toMap
    assert(bands.keySet === approx.keySet)
    approx.foreach { case (t, as) =>
      val b = bands(t)
      qs.indices.foreach { i =>
        val (lo, hi) = (b(2 * i), b(2 * i + 1))
        assert(as(i) >= lo && as(i) <= hi, s"$t q=${qs(i)}: ${as(i)} not in [$lo,$hi]")
      }
    }
  }

  test("approx table stats track exact NDV within the HLL error bound") {
    import graft.queries.AnalyticsQueries
    def byCol(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Double, Double)] =
      df.collect().map { r =>
        r.getAs[String]("column_name") ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("ndv"),
            r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))
      }.toMap
    val exact = byCol(AnalyticsQueries.s15TableStats(spark, dir))
    val approx = byCol(AnalyticsQueries.s15TableStatsApprox(spark, dir))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (c, (cnt, ndv, mn, mx)) =>
      val (aCnt, aNdv, aMn, aMx) = approx(c)
      // cnt/min/max are exact in both variants; only NDV is sketched
      assert(aCnt === cnt && aMn === mn && aMx === mx, c)
      // rsd 2% -> 5 sigma guard band; also exact for tiny cardinalities
      val tol = math.max(5, (ndv * 0.10).toLong)
      assert(math.abs(aNdv - ndv) <= tol, s"$c: approx $aNdv vs exact $ndv")
    }
  }

  test("chunking covers every token exactly once and reassembles the doc") {
    val docs = graft.core.Tables.documents(spark, dir)
    val chunks = TextOps.chunkOf(docs)
    val rebuilt = chunks
      .groupBy(col("doc_id"))
      .agg(
        array_join(sort_array(collect_list(struct(col("chunk_id"), col("chunk_text"))))
          .getField("chunk_text"), " ").as("rebuilt"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("covered"))
    val joined = docs
      .select(col("doc_id"), col("text"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"))
    val bad = joined.filter(
      col("rebuilt") =!= col("text") || col("covered") =!= col("n_tokens") ||
        col("n_chunks") =!= ceil(col("n_tokens").cast("double") / TextOps.ChunkTokens)
          .cast("long")).count()
    assert(bad === 0)
    // every chunk but the last is exactly full-size
    val shortNonFinal = chunks.join(
        rebuilt.select(col("doc_id"), (col("n_chunks") - 1).as("last_id")), Seq("doc_id"))
      .filter(col("chunk_id") < col("last_id") &&
        col("n_chunk_tokens") =!= TextOps.ChunkTokens.toLong).count()
    assert(shortNonFinal === 0)
  }

  test("packing offsets are contiguous per stream and bins are consistent") {
    val rows = TextOps.pack(spark, dir)
      .orderBy(col("stream"), col("doc_id")).collect()
    assert(rows.nonEmpty)
    var prevStream: String = null
    var prevEnd = 0L
    var straddlers = 0
    rows.foreach { r =>
      val (st, n, off) = (r.getAs[String]("stream"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset"))
      if (st != prevStream) { prevStream = st; prevEnd = 0L }
      assert(off === prevEnd, s"gap in stream $st at doc ${r.getAs[Long]("doc_id")}")
      prevEnd = off + n
      val (bf, bl) = (r.getAs[Long]("bin_first"), r.getAs[Long]("bin_last"))
      assert(bf === off / TextOps.PackBudget)
      assert(bl === (off + n - 1) / TextOps.PackBudget)
      assert(r.getAs[Boolean]("straddles") === (bf < bl))
      if (bf < bl) straddlers += 1
    }
    // budget must discriminate: some docs straddle, most don't
    assert(straddlers > 0 && straddlers < rows.length)
  }

  test("token cap: hash-prefix semantics derived on paper; partitioning-invariant") {
    import spark.implicits._
    // 4 docs of known token counts in one source; expected kept set
    // computed FROM THE SAME HASH the op orders by (h15("tc:" + id)),
    // independently of the engine: walk ids in hash order, keep while
    // the running total fits 25
    val docs = Seq(
      (1L, "src", "a b c d e f g h i j"),          // 10 tokens
      (2L, "src", "a b c d e f g h i j"),          // 10
      (3L, "src", "a b c d e f g h i j"),          // 10
      (4L, "src", "a b c d e"))                    // 5
      .toDF("doc_id", "source", "text")
    val order = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => (graft.ops.Hashing.h15Local(s"tc:$id"), id))
    val toks = Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 5L)
    val expected = {
      var cum = 0L
      order.flatMap { id =>
        cum += toks(id); if (cum <= 25L) Some(id) else None
      }.toSet
    }
    // largest-prefix: the first doc over budget STOPS the source even
    // if a later, smaller doc would still fit
    val got = graft.ops.SamplingOps.tokenCapOf(docs, 25L)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected, s"hash order was $order")
    // same result at any partition count (the bucket decomposition
    // must not change membership)
    val got7 = graft.ops.SamplingOps.tokenCapOf(docs.repartition(7), 25L)
      .select("doc_id").as[Long].collect().toSet
    assert(got7 === expected)
    // cumulative sums are the exact prefix sums in hash order
    val cums = graft.ops.SamplingOps.tokenCapOf(docs, 1000L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    var run = 0L
    order.foreach { id => run += toks(id); assert(cums(id) === run) }
  }

  test("group sample: exact per-group counts, hash-uniform, skew-proof parity") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("grp"))
    val n = graft.ops.SamplingOps.GroupSampleN
    val out = graft.ops.SamplingOps.groupSample(spark, dir)
    // per-group counts are exactly min(n, group size)
    val expect = d.groupBy("grp").count()
      .select(col("grp"), least(col("count"), lit(n.toLong)).as("want"))
    val got = out.groupBy("grp").count()
    assert(got.join(expect, "grp").filter(col("count") =!= col("want"))
      .count() === 0)
    // the salted two-stage result equals the brute-force single window
    val brute = d.select(col("doc_id"), col("grp"),
      graft.ops.Hashing.h15(concat(lit("gs:"), col("doc_id").cast("string")))
        .as("hrank"))
      .withColumn("rank_in_group", row_number().over(Window
        .partitionBy(col("grp"))
        .orderBy(col("hrank").asc, col("doc_id").asc)))
      .filter(col("rank_in_group") <= n).drop("hrank")
    assert(out.collect().map(_.toString).sorted.toSeq ===
      brute.collect().map(_.toString).sorted.toSeq)
    // hash-ranked means NOT the first n ids: the sample is a
    // permutation draw, not a prefix
    val prefix = d.withColumn("r", row_number().over(Window
      .partitionBy(col("grp")).orderBy(col("doc_id").asc)))
      .filter(col("r") <= n)
    assert(out.join(prefix, Seq("doc_id"), "left_anti").count() > 0)
  }

  test("shuffle shard: exact permutation, shard sizes, bruteforce parity") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.ops.SamplingOps.shuffleShard(spark, dir).cache()
    val n = graft.core.Tables.documents(spark, dir).count()
    // global_pos is a permutation of 0..n-1
    assert(out.count() === n)
    assert(out.agg(min("global_pos"), max("global_pos"),
      count_distinct(col("global_pos"))).as[(Long, Long, Long)].head() ===
      ((0L, n - 1, n)))
    // every shard except the last is exactly ShardDocs docs, and
    // pos_in_shard is consistent with global_pos
    val sd = graft.ops.SamplingOps.ShardDocs
    val sizes = out.groupBy("shard").count().orderBy("shard")
      .as[(Long, Long)].collect()
    sizes.dropRight(1).foreach { case (_, c) => assert(c === sd.toLong) }
    assert(sizes.map(_._2).sum === n)
    assert(out.filter(col("global_pos") =!=
      col("shard") * sd + col("pos_in_shard")).count() === 0)
    // the bucketed two-phase ranks equal the single global window
    val brute = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ops.Hashing.h15(
        concat(lit("shuf:"), col("doc_id").cast("string"))).as("ord"))
      .withColumn("global_pos", row_number().over(
        Window.orderBy(col("ord").asc, col("doc_id").asc)).cast("long") - 1)
    assert(out.select("doc_id", "global_pos")
      .collect().map(_.toString).sorted.toSeq ===
      brute.select("doc_id", "global_pos")
        .collect().map(_.toString).sorted.toSeq)
    // a pseudorandom permutation, not id order
    assert(out.filter(col("doc_id") - 1 === col("global_pos")).count() < n / 2)
    // stable under input repartitioning (the rand() failure mode)
    val re = graft.ops.SamplingOps.shuffleShardOf(
      graft.core.Tables.documents(spark, dir).repartition(7))
    assert(re.select("doc_id", "global_pos")
      .collect().map(_.toString).sorted.toSeq ===
      out.select("doc_id", "global_pos")
        .collect().map(_.toString).sorted.toSeq)
    out.unpersist()
  }

  test("NB classifier learns a planted separable vocabulary") {
    // the driver corpus's lang tag is INDEPENDENT of its text (one
    // shared token distribution -- verified: max per-lang frequency
    // spread ~1%), so learning is proven on planted data; the oracle
    // entry proves the arithmetic on the real table
    val train = Seq(
      (1L, "good great fine good", "pos"), (2L, "great good nice fine", "pos"),
      (3L, "bad awful poor bad", "neg"), (4L, "awful bad dire poor", "neg"),
      (5L, "good fine", "pos"), (6L, "poor dire", "neg"))
      .toDF("doc_id", "text", "label")
    val test = Seq(
      (10L, "good great poor"),  // 2 pos markers outvote 1 neg
      (11L, "bad awful fine"),   // 2 neg markers outvote 1 pos
      (12L, "zzz qqq"))          // all-unseen: equal priors+floors tie
    .toDF("doc_id", "text")
    val pred = graft.api.Text.nbClassify(train,
      col("doc_id"), col("text"), col("label"),
      test, col("doc_id"), col("text"))
    val m = pred.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(10L) === "pos")
    assert(m(11L) === "neg")
    // symmetric classes -> the all-unseen doc ties exactly and takes
    // the smaller label: the documented deterministic tie-break
    assert(m(12L) === "neg")
    // a class whose training docs yield no tokens (NULL text) must
    // survive as a prior-only class, not silently vanish from the
    // model: its smoothing floor ln(1/(0+V)) beats the token-heavy
    // classes' ln(1/(10+V)) on an all-unseen doc by more than its
    // prior deficit, so it must WIN doc 12
    val train2 = train.union(Seq(
      (7L, null.asInstanceOf[String], "mute"),
      (8L, null.asInstanceOf[String], "mute")).toDF("doc_id", "text", "label"))
    val pred2 = graft.api.Text.nbClassify(train2,
      col("doc_id"), col("text"), col("label"),
      test, col("doc_id"), col("text"))
    val m2 = pred2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m2(10L) === "pos" && m2(11L) === "neg")
    assert(m2(12L) === "mute", "tokenless class dropped from the model")
    // the table-bound twin emits one finite score per held-out doc
    val tb = TextOps.textNbClassify(spark, dir)
    val nOdd = graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 1).count()
    assert(tb.count() === nOdd)
    assert(tb.filter(col("score").isNull || col("score").isNaN).count() === 0)
  }

  test("kmeans: one cell per vector, k-bounded, partition-count invariant") {
    val e = graft.core.Tables.embeddings(spark, dir)
    val n = e.count()
    val out = SimilarityOps.embKmeans(spark, dir)
    assert(out.count() === n, "every vector assigned exactly once")
    assert(out.filter(col("cell") < 0 ||
      col("cell") >= SimilarityOps.KmeansK).count() === 0)
    // the hash-gate property: identical assignment under a different
    // physical partitioning (quantized integer means + deterministic
    // argmax -- no float-sum ordering leak)
    val vecs7 = e.repartition(7).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val alt = SimilarityOps.kmeansAssignOf(vecs7,
      SimilarityOps.KmeansK, SimilarityOps.KmeansIters)
    assert(alt.collect().map(_.toString).sorted.toSeq ===
      out.collect().map(_.toString).sorted.toSeq)
    // the clustering moved someone: final assignment differs from the
    // hash init (otherwise the loop is decorative)
    val init = e.select(col("vec_id"),
      pmod(graft.ops.Hashing.h15(col("vec_id").cast("string")),
        lit(SimilarityOps.KmeansK)).cast("long").as("cell"))
    assert(out.join(init, "vec_id")
      .filter(out("cell") =!= init("cell")).count() > 0)
    // a zero-norm vector (NULL cosine against every centroid) must
    // land in a REAL cell (the smallest), matching the oracle's
    // coalesced NULLS-LAST argmax -- not the fold's -1 sentinel
    val planted = Seq(
      (100L, Seq(0.0, 0.0, 0.0, 0.0)),
      (101L, Seq(1.0, 0.0, 0.0, 0.0)),
      (102L, Seq(0.0, 1.0, 0.0, 0.0)),
      (103L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("vec_id", "v")
    val pz = SimilarityOps.kmeansAssignOf(planted, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pz.values.forall(c => c >= 0 && c < 2),
      s"zero-norm vector escaped the cell range: $pz")
  }

  test("PQ encode: one code per (vector, subspace), geometry parameterized") {
    val n = graft.core.Tables.embeddings(spark, dir).count()
    val enc = SimilarityOps.embPqEncode(spark, dir)
    assert(enc.count() === n * SimilarityOps.PqSubspaces)
    assert(enc.filter(col("code") < 0 || col("code") > 15).count() === 0)
    assert(enc.groupBy("vec_id", "subspace").count()
      .filter(col("count") =!= 1).count() === 0)
    // squared distance to the chosen centroid: algebraic form may go
    // epsilon-negative, never materially
    assert(enc.filter(col("dist2") < -1e-9).count() === 0)
    // non-default geometry through the API: 8 subspaces x 8 dims
    val e = graft.core.Tables.embeddings(spark, dir)
    val alt = graft.api.Similarity.pqEncode(e, col("vec_id"), col("embedding"),
      subspaces = 8, subDim = 8)
    assert(alt.count() === n * 8)
    assert(alt.select("subspace").distinct().count() === 8)
  }

  test("corpus report card accounts for every doc exactly once per source") {
    val docs = graft.core.Tables.documents(spark, dir)
    val perSource = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextOps.corpusReport(spark, dir).collect()
    assert(rows.map(_.getAs[String]("source")).toSet === perSource.keySet)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n === perSource(r.getAs[String]("source")))
      val reasons = Seq("n_too_short", "n_low_diversity",
        "n_repeated_top_token", "n_repeated_3grams").map(r.getAs[Long](_)).sum
      assert(r.getAs[Long]("n_kept") + reasons === n,
        s"${r.getAs[String]("source")}: kept+dropped != total")
      assert(r.getAs[Double]("keep_rate") ===
        BigDecimal(r.getAs[Long]("n_kept").toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("unigram logprob equals the hand-computed value on a toy corpus") {
    // corpus: tokens a:3 b:2 c:1, total 6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.unigramLogprobOf(docs)
      .select(col("doc_id"), col("n_tokens"), col("avg_logprob"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    def q(p: Double): Long = math.round(math.log(p) * 1e6)
    val d1 = BigDecimal((2 * q(3.0 / 6) + q(2.0 / 6)) / (3 * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = BigDecimal((q(3.0 / 6) + q(2.0 / 6) + q(1.0 / 6)) / (3 * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((3L, d1)))
    assert(got(2L) === ((3L, d2)))
    // rarer-token doc must score strictly lower
    assert(got(2L)._2 < got(1L)._2)
  }

  test("bigram logprob equals the hand-computed interpolated-backoff value") {
    // corpus tokens: d1 = a b a, d2 = a b, d3 = c (no bigrams -> drops)
    // bigram counts: "a b":2, "b a":1; c1: a->2, b->1
    // unigram: a:3 b:2 c:1, total 6
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramLogprobOf(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    val lpAB = q((2.0 + 2.0 / 6) / (2 + 1)) // c2=2, p_u(b)=2/6, c1(a)=2
    val lpBA = q((1.0 + 3.0 / 6) / (1 + 1)) // c2=1, p_u(a)=3/6, c1(b)=1
    def avg(sum: Long, n: Long): Double =
      BigDecimal(sum.toDouble / (n * 1e6))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set(1L, 2L), "single-token doc must drop")
    assert(got(1L) === ((2L, avg(lpAB + lpBA, 2))))
    assert(got(2L) === ((1L, avg(lpAB, 1))))
    // the common bigram scores higher than the rare one
    assert(got(2L)._2 > avg(lpBA, 1))
  }

  test("range join equals the brute-force interval scan") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val expected = ev.filter(_._4 == "error").map { case (wid, _, lo, _) =>
      val in = ev.filter(e => e._3 >= lo && e._3 < lo + graft.queries.AnalyticsQueries.RangeWindowUs)
      wid -> ((in.length.toLong, in.map(_._2).distinct.length.toLong))
    }.toMap
    val got = graft.queries.AnalyticsQueries.j5RangeJoin(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map { case (wid, n, u) => wid -> ((n, u)) }.toMap
    assert(got === expected)
    // every window sees at least its own defining event
    assert(got.values.forall(_._1 >= 1))
  }

  test("retention cohort: offset 0 equals cohort size and bounds every later offset") {
    val rows = graft.queries.AnalyticsQueries.w6RetentionCohort(spark, dir)
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Int, Long)].collect()
    val day0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    // every cohort has an offset-0 row (each user is active on its first day)
    assert(rows.map(_._1).toSet === day0.keySet)
    for ((cohort, off, n) <- rows) {
      assert(off >= 0, s"negative offset $off in cohort $cohort")
      assert(n <= day0(cohort),
        s"cohort $cohort offset $off has $n users > cohort size ${day0(cohort)}")
    }
    // cohorts partition the user base: offset-0 counts sum to distinct users
    val users = graft.core.Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(day0.values.sum === users)
  }

  test("mixture sample keep rates and kept rows match an independent recomputation") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val wOf = SamplingOps.MixtureWeights.toMap
    val perSrc = docs.groupBy(_._2).map { case (src, ds) =>
      src -> ((ds.map(_._3).sum, wOf.getOrElse(src, SamplingOps.MixtureDefaultWeight).toLong))
    }
    val totChars = perSrc.values.map(_._1).sum
    val totW = perSrc.values.map(_._2).sum
    val keepBp = perSrc.map { case (src, (chars, w)) =>
      src -> math.min(10000L,
        totChars * SamplingOps.MixtureBudgetPct / 100 * w / totW * 10000 / chars)
    }
    val expected = docs.filter { case (id, src, _) =>
      Hashing.h15Local(s"mix:$id") % 10000 < keepBp(src)
    }.map { case (id, src, nc) => (id, src, nc, keepBp(src)) }.toSet
    val got = SamplingOps.mixtureSample(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === expected)
    // the mixture must actually mix: some source clipped at keep-all,
    // some source genuinely downsampled
    assert(keepBp.values.exists(_ == 10000L) && keepBp.values.exists(_ < 10000L))
  }

  test("curriculum bins match an independently interpolated decile assignment") {
    val chars = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    val sorted = chars.map(_._2.toDouble).sorted
    // the shared (n-1)p linear-interpolation definition (Spark
    // percentile == DuckDB quantile_cont, pinned by a4)
    def q(p: Double): Double = {
      val rank = (sorted.length - 1) * p
      val lo = rank.toInt
      if (lo + 1 >= sorted.length) sorted.last
      else sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val bounds = (1 to 9).map(i => q(i / 10.0))
    val expected = chars.map { case (id, n) =>
      (id, n, bounds.count(b => n >= b))
    }.toSet
    val got = SamplingOps.curriculumBinsExact(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === expected)
    // deciles of a 500-doc corpus: every bin 0..9 is populated
    assert(got.map(_._3) === (0 to 9).toSet)
    // the production (approx_percentile) default: boundaries are data
    // values near the same ranks, so each doc's bin is within 1 of the
    // exact assignment and monotone in n_chars
    val exactOf = expected.map(t => t._1 -> t._3).toMap
    val approx = SamplingOps.curriculumBins(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(approx.forall { case (id, _, b) => math.abs(b - exactOf(id)) <= 1 },
      "approx bin strayed more than one decile from exact")
    val byChars = approx.sortBy(r => (r._2, r._1)).map(_._3)
    assert(byChars === byChars.sorted, "approx bins not monotone in n_chars")
  }

  test("hash embedding: dense equals sparse; near-dup texts land close in cosine") {
    val near1 = "the quick brown fox jumps over the lazy dog again today"
    val near2 = "the quick brown fox jumps over the lazy dog again tomorrow"
    val far = "completely unrelated subject matter about astronomy and chemistry"
    val docs = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val sparse = TextOps.hashEmbedOf(docs)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val dense = TextOps.hashEmbedDense(docs)
      .as[(Long, Seq[Double])].collect().toMap
    // dense is the zero-filled sparse vector, bucket for bucket
    for ((id, vec) <- dense; (pos, v) <- sparse(id))
      assert(vec(pos.toInt) === v.toDouble)
    for ((id, vec) <- dense)
      assert(vec.count(_ != 0.0) === sparse(id).size)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // token profiles differ by 1 word of 11 -> high cosine; the
    // unrelated doc shares no tokens -> near-zero (hash collisions
    // only)
    assert(cos(dense(1L), dense(2L)) > 0.8)
    assert(math.abs(cos(dense(1L), dense(3L))) < 0.5)
  }

  test("keySkew reports the planted heavy key with the exact share") {
    // 60 rows of "hot", 40 spread over 8 cold keys
    val df = ((1 to 60).map(_ => "hot") ++ (1 to 40).map(i => s"cold${i % 8}"))
      .toDF("k")
    val got = DiagnosticsOps.keySkew(df, col("k"), k = 3)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(got.head === ((1, "hot", 60L, 0.6)))
    assert(got.length === 3)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.reverse.toSeq,
      "ranks must follow descending frequency")
  }

  test("partitionBalance accounts for every row and flags imbalance") {
    val df = spark.range(1000).repartition(8).toDF("id")
    val bal = DiagnosticsOps.partitionBalance(df)
      .as[(Int, Long, Double)].collect()
    assert(bal.map(_._2).sum === 1000L)
    assert(bal.forall(_._3 >= 1.0))
  }

  test("BPE: planted corpus learns the hand-derived merges and piece counts") {
    // corpus tokens: "abab" x4, "ab" x2, "aaa" x1 (all single-doc).
    // round 1 pairs: (a,b) cnt 4*2+2 = 10, (b,a) 4, (a,a) 2 -> merge (a,b)
    // round 2 (after " a b "->" ab "): (ab,ab) 4, (a,a) 2 -> merge (ab,ab)
    // round 3: (a,a) cnt 2 -> merge (a,a); round 4: best below 2 -> stop
    val docs = Seq(
      (1L, "abab abab abab abab ab ab aaa")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs)
    assert(merges === Seq(("a", "b"), ("ab", "ab"), ("a", "a")))
    // encode: abab -> [abab] (1 piece); ab -> [ab]; aaa -> greedy
    // left-to-right (a,a) gives [aa, a] (2 pieces) -- NOT 1
    val enc = TextOps.bpeEncodeOf(docs, merges)
      .select("n_tokens_norm", "n_pieces").as[(Long, Long)].head()
    assert(enc === ((7L, 4L * 1 + 2 * 1 + 2)),
      s"pieces: 4x abab@1 + 2x ab@1 + aaa@2 = 8, got $enc")
    // rank order matters: applying (ab,ab) before (a,b) could never
    // fire on raw chars -- encoding with the list REVERSED must differ
    val rev = TextOps.bpeEncodeOf(docs, merges.reverse)
      .select("n_pieces").as[Long].head()
    assert(rev > enc._2, "rank-order application must beat reversed order")
  }

  test("temperature mixture up-weights small sources by the sqrt rule (planted)") {
    // big: 10,000 chars -> w = 100; small1/small2: 100 chars -> w = 10.
    // budget 40% of 10,200 = 4,080; tot_w = 120.
    //   big share  = 4080 * 100 div 120 = 3400 of 10000 -> keep_bp 3400
    //   small share = 4080 * 10 div 120 = 340 of 100 -> clipped keep-all
    // hand-derived on paper, not from the oracle SQL
    val docs = (
      (1 to 100).map(i => (i.toLong, "big", 100L)) ++
      (1 to 10).map(i => (1000L + i, "small1", 10L)) ++
      (1 to 10).map(i => (2000L + i, "small2", 10L))
    ).toDF("doc_id", "source", "n_chars")
    val got = SamplingOps.temperatureMixtureOf(docs, budgetPct = 40)
    val bp = got.select(col("source"), col("keep_bp")).distinct()
      .as[(String, Long)].collect().toMap
    assert(bp.get("small1").forall(_ === 10000L) &&
      bp.get("small2").forall(_ === 10000L),
      s"small sources must clip at keep-all: $bp")
    // all 20 small-source docs survive; big keeps ~34%
    assert(got.filter(col("source") =!= "big").count() === 20L)
    val bigKept = got.filter(col("source") === "big").count()
    assert(bigKept > 0 && bigKept < 100,
      s"big source must be down-sampled, kept $bigKept/100")
    // the keep_bp the big source carries is exactly the derived 3400
    assert(bp("big") === 3400L)
    // determinism: re-running yields the identical kept set
    val again = SamplingOps.temperatureMixtureOf(docs, budgetPct = 40)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === got.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mixture weights with a duplicate source are rejected (engines would diverge)") {
    val docs = Seq(("1", "src0", 100L)).toDF("doc_id", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      SamplingOps.mixtureSampleOf(docs, Seq("src0" -> 2, "src0" -> 3), 1, 40)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("funnel equals the brute-force per-user ordered-sequence scan") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None else {
        val tv = views.min
        val clicks = es.filter(e => e._2 == "click" && e._3 > tv).map(_._3)
        val tc = if (clicks.isEmpty) None else Some(clicks.min)
        val tp = tc.flatMap { t =>
          val ps = es.filter(e => e._2 == "purchase" && e._3 > t).map(_._3)
          if (ps.isEmpty) None else Some(ps.min)
        }
        Some((u, tv, tc, tp, 1 + tc.size + tp.size))
      }
    }.toSet
    val got = graft.queries.AnalyticsQueries.w7Funnel(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toSet
    assert(got === expected)
    // sequence order matters: every stage-3 user has t_view < t_click < t_purchase
    got.filter(_._5 == 3).foreach { case (u, tv, tc, tp, _) =>
      assert(tv < tc.get && tc.get < tp.get, s"user $u funnel out of order")
    }
  }

  test("zscore top-k tracks the brute-force scores and ordering") {
    val rows = graft.queries.AnalyticsQueries.a8ZscoreTopk(spark, dir)
      .select(col("event_id"), col("event_type"), col("z"))
      .as[(Long, String, Double)].collect()
    assert(rows.length === 20)
    val absZ = rows.map(r => math.abs(r._3))
    assert(absZ.zip(absZ.tail).forall { case (a, b) => a >= b }, "not sorted by |z|")
    // brute force: per-type mean/sample-sd from the raw values
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val byType = ev.groupBy(_._2).map { case (t, es) =>
      val vs = es.map(_._3)
      val mean = vs.sum / vs.length
      val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (vs.length - 1))
      t -> ((mean, sd))
    }
    rows.foreach { case (id, t, z) =>
      val (mean, sd) = byType(t)
      val v = ev.find(_._1 == id).get._3
      assert(math.abs(z - (v - mean) / sd) < 1e-3, s"z drifted for event $id")
    }
    // the cut is genuinely the global top-20
    val cutoff = absZ.last
    val better = ev.count { case (_, t, v) =>
      val (mean, sd) = byType(t); math.abs((v - mean) / sd) > cutoff + 1e-3
    }
    assert(better <= 20, "an event outside the result beats the cutoff")
  }

  test("bm25 equals the hand-computed value on a toy corpus") {
    // doc1 = "a a b" (dl 3), doc2 = "a c" (dl 2); N=2, avgdl=2.5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.queries.AnalyticsQueries.bm25(docs)
      .select(col("doc_id"), col("token"), col("bm25"))
      .as[(Long, String, Double)].collect()
      .map { case (id, t, v) => (id, t) -> v }.toMap
    val k1 = graft.queries.AnalyticsQueries.Bm25K1
    val b = graft.queries.AnalyticsQueries.Bm25B
    def score(tf: Long, dl: Long, df: Long): Double = {
      val idf = math.log(1.0 + (2.0 - df + 0.5) / (df + 0.5))
      val v = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / 2.5))
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === Map(
      (1L, "a") -> score(2, 3, 2), (1L, "b") -> score(1, 3, 1),
      (2L, "a") -> score(1, 2, 2), (2L, "c") -> score(1, 2, 1)))
    // rare terms outrank common ones at equal tf/dl
    assert(got((2L, "c")) > got((2L, "a")))
  }

  test("ANN recall ladder: measured floors on the testdata (tuning target)") {
    val r = SimilarityOps.annRecall(spark, dir)
      .select(col("tier"), col("recall_at_k")).as[(String, Double)]
      .collect().toMap
    assert(r.keySet ===
      Set("ivf", "ivf_kmeans", "ivfpq", "ivfpq_rr", "multiprobe", "signlsh"))
    // exact rerank of the ADC pool can only repair ordering errors
    // inside the pool -- never lose recall vs raw ADC ranking
    assert(r("ivfpq_rr") >= r("ivfpq"),
      s"rerank ${r("ivfpq_rr")} fell below raw ADC ${r("ivfpq")}")
    // floors sit WELL below the measured sf0.001 values (ivf 0.28,
    // ivf_kmeans 0.58, multiprobe 0.42, signlsh 0.20) -- they exist
    // to catch a tier whose candidate generation silently collapses
    // (recall ~0), not to pin exact numbers on synthetic data
    assert(r("ivf") >= 0.2, s"IVF nprobe=2 recall collapsed: ${r("ivf")}")
    assert(r.values.forall(_ > 0.0), s"a tier returned zero recall: $r")
    // multi-probe exists to beat plain sign-LSH at the same planes
    assert(r("multiprobe") >= r("signlsh"),
      s"multi-probe ${r("multiprobe")} fell below sign-LSH ${r("signlsh")}")
  }

  test("IVF-PQ rerank is the exact-cosine ranking of exactly the ADC pool") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.core.Tables.embeddings(spark, dir).repartition(8)
    val qs = e.filter(col("vec_id") < SimilarityOps.NumQueries)
    val pool = graft.api.Similarity.annIvfPq(e, col("vec_id"), col("embedding"),
        col("label"), qs, col("vec_id"), col("embedding"),
        SimilarityOps.IvfNProbe, SimilarityOps.RerankPool)
      .select("query_id", "match_id")
    val allExact = graft.api.Similarity.cosineTopK(e, col("vec_id"),
        col("embedding"), qs, col("vec_id"), col("embedding"), k = 1000000)
      .select("query_id", "match_id", "cosine")
    val expect = pool.join(allExact, Seq("query_id", "match_id"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("match_id").asc)).cast("int"))
      .filter(col("rank") <= SimilarityOps.TopK)
    val got = SimilarityOps.annIvfPqRerank(spark, dir)
    assert(got.collect().map(_.toString).sorted.toSeq ===
      expect.select("query_id", "match_id", "cosine", "rank")
        .collect().map(_.toString).sorted.toSeq)
    // the pool must genuinely be wider than the final cut
    assert(pool.count() > got.count())
  }

  test("CDC chunking: prefix edit re-chunks ONLY the edit's neighborhood; fixed-width loses everything") {
    val toks = (0 until 300).map(i => s"t${i * 31 % 101}x${i * 7 % 13}")
    val base = toks.mkString(" ")
    val edited = "zz1 zz2 zz3 " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = TextOps.cdcChunkOf(docs)
      .select("doc_id", "start_pos", "chunk_hash", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
    val a = out.filter(_._1 == 1L).sortBy(_._2)
    val bHashes = out.filter(_._1 == 2L).map(_._3).toSet
    assert(a.length >= 3, s"expected several chunks, got ${a.length}")
    // boundaries are window-local, so every A-chunk except the FIRST
    // starts at a boundary that exists (shifted by 3) in B -> its
    // exact text and hash reappear
    val missing = a.tail.filterNot(c => bHashes.contains(c._3))
    assert(missing.isEmpty,
      s"CDC lost ${missing.length}/${a.length - 1} suffix chunks under a prefix edit")
    // the fixed-width chunker shifts every chunk: the same assertion
    // must FAIL there (this is CDC's reason to exist)
    val fw = TextOps.chunkOf(docs)
      .select("doc_id", "chunk_id", "chunk_hash")
      .as[(Long, Int, Long)].collect()
    val fwA = fw.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val fwB = fw.filter(_._1 == 2L).map(_._3).toSet
    assert(!fwA.tail.forall(fwB.contains),
      "fixed-width chunks unexpectedly survived a prefix edit")
    // coverage: CDC chunks reassemble the document exactly, in order
    assert(a.map(_._4).mkString(" ") === base)
    // cap: no chunk exceeds maxTokens
    val maxLen = TextOps.cdcChunkOf(docs)
      .agg(max(col("n_chunk_tokens"))).as[Long].head()
    assert(maxLen <= TextOps.CdcMaxTokens)
  }

  test("hybrid RRF fusion: hand-computed ranks, one-sided candidates, tie on match_id") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "durian elderberry")
    ).toDF("doc_id", "text")
    // hand-made dense ranking: doc 2 first, doc 1 second (doc 0 absent)
    val dense = Seq((0L, 2L, 1), (0L, 1L, 2))
      .toDF("query_id", "match_id", "rank")
    val got = RetrievalOps.hybridRrf(docs, col("doc_id"), col("text"),
      docs.filter(col("doc_id") === 0L), dense, 10)
      .orderBy("fused_rank").collect()
    // sparse side: query terms {apple, banana}; doc 0 outranks doc 1
    // (tf 2 + exclusive banana), doc 2 matches nothing
    // RRF: doc1 = 1/62 + 1/62; doc0 = 1/61 (sparse only);
    //      doc2 = 1/61 (dense only) -- doc0/doc2 tie-break on id
    assert(got.map(_.getAs[Long]("match_id")).toSeq === Seq(1L, 0L, 2L))
    assert(got.map(_.getAs[Int]("fused_rank")).toSeq === Seq(1, 2, 3))
    val d1 = got(0)
    assert(d1.getAs[Int]("dense_rank") === 2 && d1.getAs[Int]("sparse_rank") === 2)
    assert(math.abs(d1.getAs[Double]("rrf") - (1.0 / 62 + 1.0 / 62)) < 1e-9)
    // one-sided rows carry NULL on the missing side
    assert(got(1).isNullAt(got(1).fieldIndex("dense_rank")))
    assert(got(2).isNullAt(got(2).fieldIndex("sparse_rank")))
  }

  test("paragraph dedup: first occurrence survives, later repeats cut, docs reassembled") {
    val docs = Seq(
      (1L, "copyright header\nreal content one\nfooter nav"),
      (2L, "copyright header\nreal content two\nfooter nav"),
      (3L, "copyright header\ncopyright header\nunique tail"),
      (4L, "all original here")
    ).toDF("doc_id", "text")
    val byId = graft.api.Dedup.paragraphDedup(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_dedup"))).toMap
    // doc 1 is first everywhere: keeps all three paragraphs
    assert(byId(1L) === ((3L, 3L,
      "copyright header\nreal content one\nfooter nav")))
    // doc 2 loses the boilerplate seen first in doc 1
    assert(byId(2L) === ((3L, 1L, "real content two")))
    // doc 3: its FIRST "copyright header" already lost to doc 1; the
    // in-doc repeat is also cut
    assert(byId(3L) === ((3L, 1L, "unique tail")))
    assert(byId(4L) === ((1L, 1L, "all original here")))
  }

  test("paragraph dedup oracle entry: block accounting consistent, removals exist") {
    val rows = DedupOps.dedupParagraph(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"))
      assert(k >= 0 && k <= n)
      val blocks = r.getAs[String]("text_dedup") match {
        case "" => 0L
        case t  =>
          val toks = t.split(" ").length.toLong
          (toks + DedupOps.ParaBlockTokens - 1) / DedupOps.ParaBlockTokens
      }
      // kept blocks are full-width except at most the doc's last one,
      // so reassembled token count implies at LEAST n_kept blocks
      assert(blocks <= r.getAs[Long]("n_paras"))
    }
    // the synthetic corpus carries real duplicate blocks -- the op
    // must find some (sf0.001 slice of the 59-removal sf0.01 signal)
    val removed = rows.map(r =>
      r.getAs[Long]("n_paras") - r.getAs[Long]("n_kept")).sum
    assert(removed > 0, "no duplicate paragraphs found on the test corpus")
  }

  // classic O(len^2) Wagner-Fischer, written independently of the
  // engine path (which uses Spark's banded levenshtein) so the spec
  // derives expected distances on paper, not from the code under test
  private def refLevenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  test("edit-distance pairs: planted distances verified, rewrites rejected") {
    val base = ((1 to 30).map(i => s"tok$i") :+ "anchor").mkString(" ")
    val typo = base.replace("tok7", "tokX")              // ed = 1
    val appended = base + " tail"                        // ed = 5
    val moved = {                                        // block move: high
      val t = base.split(" ")                            // shingle overlap,
      (t.drop(8) ++ t.take(8)).mkString(" ")             // ed far above 16
    }
    val unrelated = ((1 to 31).map(i => s"zz$i")).mkString(" ")
    val docs = Seq((1L, base), (2L, typo), (3L, appended), (4L, moved),
      (5L, unrelated)).toDF("doc_id", "text")
      .withColumn("th", DedupOps.hashedShingles(col("text"), DedupOps.NgramN))
    val pairs = DedupOps.editDistancePairs(docs, DedupOps.MinhashK,
      DedupOps.NgramBandCount, DedupOps.NgramLshRows, DedupOps.EditDistMax)
      .as[(Long, Long, Int)].collect().sorted
    val texts = Map(1L -> base, 2L -> typo, 3L -> appended, 4L -> moved,
      5L -> unrelated)
    pairs.foreach { case (a, b, ed) =>
      assert(a < b)
      assert(ed === refLevenshtein(texts(a), texts(b)))
      assert(ed <= DedupOps.EditDistMax)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length)
    // the three near-identical variants all pair up...
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // ...and the specific planted distances hold
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((1L, 2L)) === 1)
    assert(byPair((1L, 3L)) === 5)
    // the block-moved rewrite shares most shingles (it IS a candidate)
    // but sits far past the edit threshold -- the verifier must reject
    assert(refLevenshtein(base, moved) > DedupOps.EditDistMax)
  }

  test("KS drift: hand-computed statistics, ties, partition invariance") {
    def ks(s1: Seq[Double], s2: Seq[Double]) = {
      val df = (s1.map((_, true)) ++ s2.map((_, false)))
        .toDF("v", "one").repartition(7)
      DiagnosticsOps.ksDrift(df, col("one"), col("v"))
        .as[(Long, Long, Long, Long)].collect().toList
    }
    // distinct values 1,2,3,4: cum1 = 1,2,3,3; cum2 = 0,1,2,3
    // D = max|3*cum1 - 3*cum2|/(3*3) = 3/9 = 1/3
    assert(ks(Seq(1, 2, 3), Seq(2, 3, 4)) === List((3L, 3L, 3L, 4L)))
    // ties: side1 = [1,1,2], side2 = [1,2,2,2]
    // cum1 = 2,3; cum2 = 1,4 -> max(|4*2-3*1|, |4*3-3*4|) = 5 (= 5/12)
    assert(ks(Seq(1, 1, 2), Seq(1, 2, 2, 2)) === List((3L, 4L, 5L, 2L)))
    // identical samples: zero drift
    assert(ks(Seq(1, 2, 5), Seq(1, 2, 5)) === List((3L, 3L, 0L, 3L)))
  }

  test("pickSurvivors: max-quality survivor, min-id ties, singleton clusters") {
    import graft.api.Dedup
    val w = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, w),                 // near-dup of 2 (token J = 10/11)
      (2L, w + " extra"),      // longer -> survives cluster {1,2}
      (3L, "p q r s t u v"),   // identical twin of 4
      (4L, "p q r s t u v"),   // tie on quality -> min id 3 survives
      (5L, "lone wolf document")) // singleton
      .toDF("doc_id", "text").repartition(3)
    val got = Dedup.pickSurvivors(docs, col("doc_id"), col("text"),
      quality = length(col("text")))
      .select("cluster_id", "survivor_id", "n_docs")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 2L, 2L), (3L, 3L, 2L), (5L, 5L, 1L)))
  }

  test("gram novelty: hand-counted shared vs novel shingles") {
    // doc1: 5 tokens -> 3 shingles; doc2 shares doc1's FIRST shingle
    // (same 3-token prefix) and adds 2 of its own; doc3 fully novel.
    val docs = Seq(
      (1L, "a b c d e"),       // shingles: abc bcd cde
      (2L, "a b c x y"),       // shingles: abc bcx cxy -> shares abc
      (3L, "p q r s t"))       // all novel
      .toDF("doc_id", "text").repartition(3)
    val items = docs.select(col("doc_id"),
      graft.ops.DedupOps.hashedShingles(col("text"),
        graft.ops.DedupOps.NgramN).as("th"))
    val grams = items.select(col("doc_id"), explode(col("th")).as("g"))
    val c = grams.groupBy("g").agg(count(lit(1)).as("n"))
    val got = grams.join(c, "g").groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_shared"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
  }

  test("prefix-filter Jaccard: hand-derived pairs, exact threshold boundary") {
    // 3-gram shingles over n tokens = n-2 shingles; changing ONLY the
    // last token changes only the last shingle. 11 tokens -> 9
    // shingles; |A ∩ B| = 8, |A ∪ B| = 10 -> J = 0.8000 EXACTLY (the
    // >= boundary must include it). 12 tokens -> 10 shingles; J =
    // 9/11 = 0.8182 (in). Doc D shares only a 3-token prefix with A:
    // 1 shared shingle of 9+9 -> J = 1/17 (out).
    val w = (1 to 12).map(i => s"tok$i")
    val a11 = w.take(11).mkString(" ")
    val b11 = (w.take(10) :+ "CHANGED").mkString(" ")
    val a12 = w.take(12).mkString(" ")
    val b12 = (w.take(11) :+ "CHANGED").mkString(" ")
    val far = (w.take(3) ++ (1 to 8).map(i => s"other$i")).mkString(" ")
    val docs = Seq((1L, a11), (2L, b11), (3L, a12), (4L, b12), (5L, far))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        DedupOps.hashedShingles(col("text"), DedupOps.NgramN).as("th"))
      .repartition(5)
    val pairs = DedupOps.prefixJaccardPairs(docs, 0.8, "j")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // (1,2) at exactly 0.8; (3,4) at 9/11. Containments: A11's 9
    // shingles are all inside A12 (9/10 = 0.9, in) AND inside B12
    // (B12's first 9 shingles end at t11 — also 0.9, in). B11 vs
    // either 12-token doc shares only 8 (its 9th shingle ends in
    // CHANGED) of a union of 11 -> 0.7273 (out). far shares one
    // shingle -> 1/17 (out).
    assert(pairs.map(p => (p._1, p._2)) ===
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (3L, 4L)))
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 === 0.8)
    assert(pairs.find(p => p._1 == 3L && p._2 == 4L).get._3 === 0.8182)
    assert(pairs.find(p => p._1 == 1L && p._2 == 3L).get._3 === 0.9)
    // the ladder's invariants against this exact truth: candidates
    // are a superset of hits, hits never exceed the truth
    val truth = pairs.size.toLong
    DedupOps.RecallLadderConfigs.foreach { case (bc, r) =>
      val all = DedupOps.lshJaccardPairs(docs, DedupOps.MinhashK, bc, r,
        -1.0, "j").as[(Long, Long, Double)].collect().toSeq
      val hits = all.count(_._3 >= 0.8).toLong
      assert(hits <= truth, s"config ($bc,$r): hits $hits > truth $truth")
      assert(all.size >= hits)
    }
  }
}
