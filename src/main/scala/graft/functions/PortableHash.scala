package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hashing.
  *
  * The driver's correctness gate recomputes every query in DuckDB, so
  * any hash used in a checked query must be computable identically in
  * both engines. Spark's `xxhash64`/`hash` have no DuckDB counterpart;
  * instead we take the first 8 hex chars of md5 as an unsigned 32-bit
  * value:
  *   Spark : CAST(conv(substring(md5(x),1,8),16,10) AS BIGINT)
  *   DuckDB: CAST('0x' || substr(md5(x),1,8) AS BIGINT)
  * Both fit comfortably in BIGINT, so downstream modular arithmetic
  * ((a*h+b) % P) is exact in either engine.
  */
object PortableHash {
  /** Mersenne prime 2^31-1 — modulus for MinHash permutations. */
  val P: Long = 2147483647L

  /** 32-bit portable hash of a string column. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** DuckDB SQL rendering of [[hash32]] over expression `x`. */
  def hash32Sql(x: String): String =
    s"CAST('0x' || substr(md5($x),1,8) AS BIGINT)"

  /** Driver-side twin of [[hash32]]: identical value for the same
    * string, without a Spark job — for bounded collected sets (e.g.
    * the daily turn's batch-id context digest).
    */
  def hash32Jvm(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString, 16)

  /** Deterministic MinHash permutation params (a_i, b_i), i in [0,k).
    *
    * Domain note: `(a·h + b) mod P` over the 32-bit [[hash32]] range
    * is 2-to-1 (P = 2³¹−1 < 2³²) — h and h+P collide in EVERY
    * component simultaneously, equivalent to first folding h into
    * [0, P). That correlated collision has the same probability order
    * as a base md5-prefix collision (~2⁻³¹ per shingle pair) and is
    * accepted as part of the 32-bit portable-hash contract: the DuckDB
    * oracle replays the identical arithmetic, so both engines agree
    * bit-for-bit on any input, colliding or not.
    */
  def minhashParams(k: Int): Seq[(Int, Long, Long)] =
    (0 until k).map(i => (i, 2L * i + 3L, 104729L * (i + 1)))
}
