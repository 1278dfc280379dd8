package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * Everything downstream (minhash, simhash, LSH banding, winnowing
  * fingerprints) needs a hash the DuckDB oracle can reproduce bit-for-
  * bit. Spark's `hash()`/`xxhash64()` have no DuckDB twin, so the
  * engine pins a 60-bit hash derived from the md5 hex digest, which
  * both engines implement identically:
  *
  *   Spark:  conv(substring(md5(s), 1, 15), 16, 10) cast long
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *
  * 15 hex digits = 60 bits, comfortably inside a signed 64-bit long,
  * so the unsigned-parse semantics of both engines agree. md5 here is
  * a content fingerprint, not a security boundary.
  */
object Hashing {

  /** 60-bit deterministic hash of a string column. */
  def h15(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment mirroring [[h15]]. `x` is a SQL expression. */
  def h15Sql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  /** Salted hash: h15(salt:value) -- the per-permutation hash family
    * used by minhash. */
  def h15Salted(salt: String, c: Column): Column =
    h15(concat(lit(salt), lit(":"), c))

  def h15SaltedSql(salt: String, x: String): String =
    h15Sql(s"concat('$salt', ':', $x)")

  /** MinHash signature of a distinct-token array column: for each of
    * `k` hash permutations i, sig(i) = min over tokens of h15(i:t).
    * Pure narrow expression -- no shuffle, codegen-friendly.
    */
  def minhashSig(tokens: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(tokens, t => h15Salted(i.toString, t)))
    }: _*)

  def minhashSigSql(tokensExpr: String, k: Int): String =
    (0 until k).map { i =>
      s"list_min(list_transform($tokensExpr, t -> ${h15SaltedSql(i.toString, "t")}))"
    }.mkString("[", ", ", "]")

  /** LSH band hashes over a minhash signature: `bands` bands of
    * `rows` rows each; band b hashes the comma-joined signature
    * slice. sig length must equal bands*rows.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      h15(array_join(
        transform(slice(sig, b * rows + 1, rows), x => x.cast("string")), ","))
    }: _*)

  def lshBandsSql(sigExpr: String, bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val lo = b * rows + 1
      val hi = b * rows + rows
      h15Sql(s"array_to_string(list_transform(($sigExpr)[$lo:$hi], x -> CAST(x AS VARCHAR)), ',')")
    }.mkString("[", ", ", "]")
}
