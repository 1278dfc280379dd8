package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.ArrayExprs.{DoubleDot, SimHash, SortedLongJaccard}
import graft.functions.CharEntropyStats
import graft.functions.{ImageDims, ImagePhash}
import graft.functions.HashExprs.{Md5ShingleSet, MinhashSig}
import graft.functions.{GzipCompress, GzipDecompress, NfkcLower}

/** SQL registration for graft's native expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the
  * Column API.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for session construction time:
  *    `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *  - [[FunctionRegistration.register]] for an already-running session
  *    (the driver owns session creation in the test harness).
  */
object FunctionRegistration {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info(classOf[DoubleDot], "graft_dot",
        "graft_dot(a, b) - sequential dot product of two array<double>"),
      (es: Seq[Expression]) => DoubleDot(es(0), es(1))),
    (FunctionIdentifier("graft_image_phash"),
      info(classOf[ImagePhash], "graft_image_phash",
        "graft_image_phash(bytes) - perceptual hash of a PNG/BMP payload: " +
          "struct(dhash_lo, dhash_hi, ahash_lo, ahash_hi) 32-bit halves; " +
          "NULL for unrecognized bytes"),
      (es: Seq[Expression]) => ImagePhash(es(0))),
    (FunctionIdentifier("graft_image_dims"),
      info(classOf[ImageDims], "graft_image_dims",
        "graft_image_dims(bytes) - struct(width, height, channels) of a " +
          "PNG/BMP payload; NULL for unrecognized bytes"),
      (es: Seq[Expression]) => ImageDims(es(0))),
    (FunctionIdentifier("graft_jaccard"),
      info(classOf[SortedLongJaccard], "graft_jaccard",
        "graft_jaccard(a, b) - Jaccard similarity of two sorted distinct array<long>"),
      (es: Seq[Expression]) => SortedLongJaccard(es(0), es(1))),
    (FunctionIdentifier("graft_simhash"),
      info(classOf[SimHash], "graft_simhash",
        "graft_simhash(hashes, bits) - SimHash fingerprint of an array<long>"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(b: Int, IntegerType) => SimHash(es(0), b)
        case other => throw new IllegalArgumentException(
          s"graft_simhash bits must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_shingle_set"),
      info(classOf[Md5ShingleSet], "graft_shingle_set",
        "graft_shingle_set(tokens, n) - sorted distinct 31-bit md5 hashes of word n-grams"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(n: Int, IntegerType) => Md5ShingleSet(es(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_shingle_set n must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info(classOf[MinhashSig], "graft_minhash_sig",
        "graft_minhash_sig(hashes, k) - k-wide affine MinHash signature of an array<long>"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(k: Int, IntegerType) => MinhashSig(es(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig k must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_nfkc_lower"),
      info(classOf[NfkcLower], "graft_nfkc_lower",
        "graft_nfkc_lower(s) - NFKC normalization + ROOT lowercase in one pass"),
      (es: Seq[Expression]) => NfkcLower(es.head)),
    (FunctionIdentifier("graft_gzip"),
      info(classOf[GzipCompress], "graft_gzip",
        "graft_gzip(s) - RFC 1952 gzip frame of a string's UTF-8 bytes"),
      (es: Seq[Expression]) => GzipCompress(es.head)),
    (FunctionIdentifier("graft_gunzip"),
      info(classOf[GzipDecompress], "graft_gunzip",
        "graft_gunzip(b) - decompress a gzip frame to a UTF-8 string; " +
          "corrupt bytes fail loudly"),
      (es: Seq[Expression]) => GzipDecompress(es.head)),
    (FunctionIdentifier("graft_char_stats"),
      info(classOf[CharEntropyStats], "graft_char_stats",
        "graft_char_stats(s) - struct(n_chars, n_charset, sum_u) codepoint" +
          " distribution statistics (quantized entropy terms)"),
      (es: Seq[Expression]) => CharEntropyStats(es.head)),
    // the native AGGREGATES register the same way: a builder returning
    // an AggregateFunction, which the analyzer wraps on use
    (FunctionIdentifier("graft_topk_freq"),
      info(classOf[graft.functions.TopKFreq], "graft_topk_freq",
        "graft_topk_freq(h, k, capacity) - SpaceSaving top-k heavy hitters" +
          " over a long column (exact below capacity)"),
      (es: Seq[Expression]) => (es(1), es(2)) match {
        case (Literal(k: Int, IntegerType), Literal(c: Int, IntegerType)) =>
          graft.functions.TopKFreq(es(0), k, c)
        case other => throw new IllegalArgumentException(
          s"graft_topk_freq k/capacity must be integer literals, got $other")
      }),
    (FunctionIdentifier("graft_kmv"),
      info(classOf[graft.functions.KmvSketch], "graft_kmv",
        "graft_kmv(h, k) - k-minimum-values distinct sketch of a long" +
          " column (supports intersection/Jaccard; exact below capacity)"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(k: Int, IntegerType) => graft.functions.KmvSketch(es(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_kmv k must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_vec_outer_sum"),
      info(classOf[graft.functions.VecOuterSum], "graft_vec_outer_sum",
        "graft_vec_outer_sum(v, d) - quantized second-moment buffer" +
          " (n, sums, upper-triangle products) over an array<float> column"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(d: Int, IntegerType) => graft.functions.VecOuterSum(es(0), d)
        case other => throw new IllegalArgumentException(
          s"graft_vec_outer_sum d must be an integer literal, got $other")
      }),
  )

  /** Register into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    FunctionRegistration.functions.foreach(e.injectFunction)
}
