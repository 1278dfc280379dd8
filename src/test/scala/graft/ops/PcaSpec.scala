package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ops.SimilarityOps.{jacobiEig, pcaFit, pcaProjectOf}

/** PCA behavior derived on paper, not engine-vs-oracle equality (the
  * eigen solve has no SQL twin): planted principal axes must be
  * recovered, variance accounting must close, and the whole fit must
  * be partitioning-invariant -- the properties the hash gate on
  * emb_pca_cov cannot see. */
class PcaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("jacobi diagonalizes a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/sqrt2) and 1
    val (vals, vecs) = jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - s) < 1e-12 && math.abs(vecs(0)(1) - s) < 1e-12)
    // sign convention: largest-|entry| coordinate positive
    assert(vecs(1).exists(x => math.abs(math.abs(x) - s) < 1e-12))
    assert(vecs(1)(vecs(1).map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0)
  }

  test("planted axes: PCA recovers the variance directions in order") {
    // dim 0 has the largest spread, dim 2 the next, dim 1 none --
    // centered data, exact on the 1e-3 quantization grid
    val rows = Seq(
      (1L, Array(4.0f, 5.0f, 1.0f, 0.0f)),
      (2L, Array(-4.0f, 5.0f, -1.0f, 0.0f)),
      (3L, Array(2.0f, 5.0f, 0.5f, 0.0f)),
      (4L, Array(-2.0f, 5.0f, -0.5f, 0.0f)),
      (5L, Array(0.0f, 5.0f, 2.0f, 0.0f)),
      (6L, Array(0.0f, 5.0f, -2.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = pcaFit(df, d = 4)
    assert(m.n === 6L)
    // the constant dims contribute nothing; mean is recovered exactly
    assert(m.mean(1) === 5.0 && m.mean(3) === 0.0)
    // pc1 concentrates in dims {0, 2} (the correlated spread plane)
    // and is unit-length with positive leading loading
    val pc1 = m.components(0)
    assert(math.abs(pc1.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(pc1(1)) < 1e-9 && math.abs(pc1(3)) < 1e-9)
    assert(math.abs(pc1(0)) > math.abs(pc1(2)), "dim 0 carries more variance")
    assert(pc1(pc1.map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0)
    // eigenvalues descend and account for the full trace
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val trace = {
      // variances of the planted dims: population covariance over n-1
      val xs = rows.map(_._2(0).toDouble)
      val zs = rows.map(_._2(2).toDouble)
      def varOf(v: Seq[Double]) = {
        val mu = v.sum / v.size
        v.map(x => (x - mu) * (x - mu)).sum / (v.size - 1)
      }
      varOf(xs) + varOf(zs)
    }
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-6)
    assert(math.abs(m.explained(2).sum - 1.0) < 1e-9)
  }

  test("fit is partitioning-invariant and projection matches hand math") {
    val rows = Seq(
      (1L, Array(4.0f, 5.0f, 1.0f, 0.0f)),
      (2L, Array(-4.0f, 5.0f, -1.0f, 0.0f)),
      (3L, Array(2.0f, 5.0f, 0.5f, 0.0f)),
      (4L, Array(-2.0f, 5.0f, -0.5f, 0.0f)),
      (5L, Array(0.0f, 5.0f, 2.0f, 0.0f)),
      (6L, Array(0.0f, 5.0f, -2.0f, 0.0f)))
    val df1 = rows.toDF("vec_id", "embedding").repartition(1)
    val df7 = rows.toDF("vec_id", "embedding").repartition(7)
    val (m1, m7) = (pcaFit(df1, d = 4), pcaFit(df7, d = 4))
    assert(m1.eigenvalues.toSeq === m7.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m7.components.map(_.toSeq).toSeq)
    // projection = dot(v - mean, pc): check row 1 by hand
    val proj = pcaProjectOf(df1, m1, k = 2).orderBy(col("vec_id"))
      .as[(Long, Double, Double)].collect()
    val v1 = rows.head._2.map(_.toDouble)
    val hand = (0 until 4).map(i => (v1(i) - m1.mean(i)) * m1.components(0)(i)).sum
    assert(math.abs(proj.head._2 - hand) < 1e-6)
    // projections onto pc1 carry more spread than onto pc2
    def spread(xs: Seq[Double]) = xs.max - xs.min
    assert(spread(proj.map(_._2).toSeq) > spread(proj.map(_._3).toSeq))
  }

  test("whitening yields unit-variance coordinates; degenerate axes zero out") {
    val rows = Seq(
      (1L, Array(4.0f, 5.0f, 1.0f, 0.0f)),
      (2L, Array(-4.0f, 5.0f, -1.0f, 0.0f)),
      (3L, Array(2.0f, 5.0f, 0.5f, 0.0f)),
      (4L, Array(-2.0f, 5.0f, -0.5f, 0.0f)),
      (5L, Array(0.0f, 5.0f, 2.0f, 0.0f)),
      (6L, Array(0.0f, 5.0f, -2.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = SimilarityOps.pcaFit(df, d = 4)
    val w = SimilarityOps.pcaWhitenOf(df, m, k = 4).collect()
    def sampleVar(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1)
    }
    // the two real axes whiten to unit variance
    for (c <- Seq("pc1", "pc2")) {
      val xs = w.map(_.getAs[Double](c)).toSeq
      assert(math.abs(sampleVar(xs) - 1.0) < 1e-3, s"$c variance")
    }
    // the constant dims have ~zero eigenvalues: zeroed, not amplified
    for (c <- Seq("pc3", "pc4")) {
      assert(w.forall(r => math.abs(r.getAs[Double](c)) < 1e-6), s"$c zeroed")
    }
  }

  test("table-bound pca queries run and the projection plan is narrow") {
    val dir = "/root/testdata/sf0.001"
    val cov = SimilarityOps.embPcaCov(spark, dir)
    assert(cov.count() === (64L * 65L) / 2L)
    val proj = SimilarityOps.embPcaProject(spark, dir)
    assert(proj.columns.toSeq === Seq("vec_id", "pc1", "pc2", "pc3", "pc4"))
    assert(proj.count() > 0)
    // the projection itself is one shuffle-free codegen pass: weights
    // are literals, no exchange anywhere in the plan
    val t = proj.queryExecution.executedPlan.treeString
    assert(!t.contains("Exchange"), s"projection must not shuffle:\n$t")
    // the oracle gate's invariants hold: every boolean true at sf0.001
    val gate = SimilarityOps.embPcaProjectGate(spark, dir).collect()
    assert(gate.length === 4)
    for (r <- gate; c <- Seq("var_in_band", "mean_near_zero", "ortho_ok",
        "order_ok"))
      assert(r.getAs[Boolean](c), s"component ${r.getInt(0)}: $c")
  }

  test("moment aggregate: double input dispatches, bad input fails loud") {
    import graft.functions.VecOuterSum
    // array<double> input reads through getDouble (same moments as
    // the float path on grid-exact values)
    val dd = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val rd = dd.agg(VecOuterSum.agg(col("embedding"), 2)).head().getStruct(0)
    assert(rd.getLong(0) === 2L)
    assert(rd.getSeq[Long](1) === Seq(4000L, 6000L))
    // non-array input is rejected at ANALYSIS time, not silently read
    val bad = Seq((1L, "oops")).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.agg(VecOuterSum.agg(col("embedding"), 2)).head()
    }
    assert(e.getMessage.contains("array<float> or array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
    // a ragged vector fails the job loudly instead of shrinking n
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      ragged.agg(VecOuterSum.agg(col("embedding"), 2)).head()
    }
    assert(e2.getMessage != null)
    // quantize is BINARY round-half-away (the DuckDB round() twin):
    // exact ties go away from zero on both signs, and a value one
    // ulp off the tie rounds by its true binary value
    assert(VecOuterSum.quantize(0.5) === 500L)
    assert(VecOuterSum.quantize(-0.5) === -500L)
    assert(VecOuterSum.quantize(0.0125) === 13L)
    assert(VecOuterSum.quantize(-0.0125) === -13L)
    val justUnderTie = math.nextDown(123.5) / 1000.0 * 1000.0
    assert(VecOuterSum.quantize(math.nextDown(123.5) / 1000.0) ===
      (if (justUnderTie >= 123.5) 124L else 123L))
  }
}
