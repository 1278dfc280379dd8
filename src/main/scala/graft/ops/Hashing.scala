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

  /** Driver-side twin of [[h15]] for plan-time constant folding
    * (identical md5 -> first-15-hex-digits math). */
  def h15Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment mirroring [[h15]]. `x` is a SQL expression. */
  def h15Sql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  /** Salted hash: h15(salt:value) -- the per-permutation hash family
    * used by minhash. */
  def h15Salted(salt: String, c: Column): Column =
    h15(concat(lit(salt), lit(":"), c))

  def h15SaltedSql(salt: String, x: String): String =
    h15Sql(s"concat('$salt', ':', $x)")

  /** 31-bit token hash: md5-derived, masked so affine-permutation
    * arithmetic below stays inside 64-bit without overflow (DuckDB
    * errors on BIGINT overflow; Spark wraps -- both must stay exact). */
  def h31(c: Column): Column = h15(c).bitwiseAND(lit(0x7FFFFFFFL))

  def h31Sql(x: String): String = s"(${h15Sql(x)} & 2147483647)"

  /** Affine MinHash permutation family over 31-bit token hashes:
    * perm_i(h) = (a_i * h + b_i) mod (2^61 - 1). One md5 per token
    * total (the 31-bit base hash); the k permutations are pure
    * integer arithmetic -- ~16x cheaper than k salted md5 passes.
    * a_i*h < 2^62 so the product cannot overflow a signed long. */
  val MersenneP: Long = (1L << 61) - 1
  def permA(i: Int): Long = ((2654435761L * (i + 1)) & 0x7FFFFFFEL) | 1L
  def permB(i: Int): Long = (2246822519L * (i + 13)) & 0x7FFFFFFFL

  /** MinHash signature of a sorted-distinct 31-bit-hashed token array:
    * sig(i) = min over hashes of perm_i(h). Narrow, codegen-friendly,
    * no shuffle. */
  def minhashSig(hashedTokens: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(hashedTokens,
        h => (h * lit(permA(i)) + lit(permB(i))) % lit(MersenneP)))
    }: _*)

  def minhashSigSql(hashedTokensExpr: String, k: Int): String =
    (0 until k).map { i =>
      s"list_min(list_transform($hashedTokensExpr, h -> (h * ${permA(i)} + ${permB(i)}) % $MersenneP))"
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
