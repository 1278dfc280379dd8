package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.FunctionRegistration

import graft.TestSpark

class SqlRegistrationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("native expressions are callable from SQL after registration") {
    FunctionRegistration.register(spark)
    import spark.implicits._
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .as[Double].head() === 11.0)
    assert(spark.sql("SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .as[Double].head() === 0.5)
    assert(spark.sql("SELECT graft_simhash(array(7L), 3)").as[Long].head() === 7L)
    // shingle hashing + minhash signatures match their Column-API twins
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(graft_shingle_set(array('a','b','c'), 2), 4)")
      .as[Seq[Long]].head()
    val viaApi = Seq(("x", Seq("a", "b", "c"))).toDF("k", "toks")
      .select(HashExprs.minhashSig(HashExprs.md5ShingleSet(
        org.apache.spark.sql.functions.col("toks"), 2), 4))
      .as[Seq[Long]].head()
    assert(viaSql === viaApi)
    // round-8 expressions: normalization + char-distribution stats
    assert(spark.sql("SELECT graft_nfkc_lower('Ｈｅｌｌｏ！ Ｗorld')")
      .as[String].head() === "hello! world")
    val stats = spark.sql(
      "SELECT s.n_chars, s.n_charset FROM" +
        " (SELECT graft_char_stats('aab') AS s)")
      .as[(Long, Long)].head()
    assert(stats === ((3L, 2L)))
    // registration is idempotent
    FunctionRegistration.register(spark)
  }

  test("image expressions from SQL: phash matches the codec, dims probe, NULL on junk") {
    FunctionRegistration.register(spark)
    import spark.implicits._
    import graft.ops.PixelCodec
    val img = PixelCodec.Image(9, 8, 1,
      Array.tabulate(72)(i => ((i * 37 + 11) % 256).toByte))
    Seq((1L, PixelCodec.encodePng(img)),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "bytes").createOrReplaceTempView("__img_reg")
    val row = spark.sql(
      "SELECT h.dhash_lo, h.dhash_hi FROM" +
        " (SELECT graft_image_phash(bytes) AS h FROM __img_reg WHERE id = 1)")
      .as[(Long, Long)].head()
    assert(row === PixelCodec.dHash(img)) // 9x8 grey: resize/grey = identity
    val dims = spark.sql(
      "SELECT d.width, d.height, d.channels FROM" +
        " (SELECT graft_image_dims(bytes) AS d FROM __img_reg WHERE id = 1)")
      .as[(Int, Int, Int)].head()
    assert(dims === ((9, 8, 1)))
    // lenient SQL semantics: junk bytes -> NULL, not a task failure
    assert(spark.sql(
      "SELECT count(*) FROM __img_reg WHERE graft_image_phash(bytes) IS NULL")
      .as[Long].head() === 1L)
    // a legal but sub-9x8 image is unhashable -> NULL too (dims still probe)
    Seq((9L, PixelCodec.encodePng(PixelCodec.Image(1, 1, 1, Array[Byte](7)))))
      .toDF("id", "bytes").createOrReplaceTempView("__img_tiny")
    assert(spark.sql(
      "SELECT graft_image_phash(bytes) IS NULL, d.width FROM" +
        " (SELECT bytes, graft_image_dims(bytes) AS d FROM __img_tiny)")
      .as[(Boolean, Int)].head() === ((true, 1)))
    // strict DataFrame path fails loud on the same junk (surfaces as
    // the raw IllegalStateException driver-side, SparkException from
    // an executor -- either way the job dies naming the cause)
    val e = intercept[Throwable] {
      graft.ops.MultimodalOps.imageDhashOf(
        spark.sql("SELECT * FROM __img_reg"),
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("bytes")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("undecodable")),
      chain(e).toString)
  }

  test("native AGGREGATES are callable from SQL: topk, kmv, vec moments") {
    FunctionRegistration.register(spark)
    import spark.implicits._
    spark.range(0, 100).selectExpr("id % 3 AS h")
      .createOrReplaceTempView("__agg_reg")
    // SpaceSaving below capacity = exact counts; 0 appears 34 times
    val top = spark.sql(
      "SELECT graft_topk_freq(h, 1, 8) FROM __agg_reg")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getLong(0) === 0L && top.head.getLong(1) === 34L)
    // KMV below capacity holds every distinct hash: 3 of them
    val kmv = spark.sql("SELECT graft_kmv(h, 64).mins FROM __agg_reg")
      .as[Seq[Long]].head()
    assert(kmv.size === 3)
    // moment buffer: n and the quantized per-dim sums
    val m = spark.sql(
      "SELECT graft_vec_outer_sum(array(CAST(1.0 AS FLOAT)," +
        " CAST(2.0 AS FLOAT)), 2) AS m FROM range(5)")
      .select("m.n", "m.sums").as[(Long, Seq[Long])].head()
    assert(m === ((5L, Seq(5000L, 10000L))))
  }

  test("gzip expressions: lossless round-trip, real compression, loud corrupt failure") {
    FunctionRegistration.register(spark)
    import spark.implicits._
    // unicode survives (UTF-8 in, UTF-8 out)
    assert(spark.sql("SELECT graft_gunzip(graft_gzip('héllo wörld — 混合'))")
      .as[String].head() === "héllo wörld — 混合")
    // repetitive text genuinely compresses
    val sizes = spark.sql(
      "SELECT octet_length(graft_gzip(repeat('spark and duck ', 200)))," +
        " octet_length(repeat('spark and duck ', 200))")
      .as[(Int, Int)].head()
    assert(sizes._1 < sizes._2 / 10,
      s"gzip of 3000 repetitive bytes should be tiny, got ${sizes._1}")
    // corrupt bytes fail the task loudly, never decode to garbage
    val e = intercept[Exception] {
      spark.sql("SELECT graft_gunzip(CAST('not a gzip frame' AS BINARY))")
        .collect()
    }
    assert(e.getMessage != null)
  }
}
