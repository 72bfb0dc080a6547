package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact hashing for the sketch operators (MinHash, SimHash,
  * rolling fingerprint, KMV): a 48-bit hash from a sha256 hex slice, plus
  * affine permutations / fold combiners in plain modular arithmetic.
  *
  * Every engine computes sha256 over identical bytes and integer
  * arithmetic identically, so any query built ONLY from these kernels can
  * be hash-compared against a DuckDB oracle — the property the Spark-native
  * xxhash64 lacks. The cost is one sha256 per token instead of one xxhash64
  * (~5× per-token, still one pass, still codegen'd); the sketch shapes and
  * shuffle structure are unchanged.
  *
  * Mirrors (`*Sql`) generate the equivalent DuckDB expression so the Scala
  * constants stay the single source of truth for both sides.
  */
object PortableHash {
  /** Modulus for all permutation/fold arithmetic: prime, < 2^30, so
    * `a*h + b` stays well under 2^63 (no ANSI overflow). */
  val P = 1000000007L

  /** 48-bit token hash: first 12 hex chars of sha256. */
  def tokenHash(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 12), 16, 10).cast("long")
  def tokenHashSql(e: String): String =
    s"CAST('0x' || substr(sha256(CAST($e AS VARCHAR)), 1, 12) AS BIGINT)"

  /** Token hash reduced mod P (the domain of the permutations). */
  def tokenHashP(c: Column): Column = tokenHash(c) % lit(P)
  def tokenHashPSql(e: String): String = s"(${tokenHashSql(e)} % $P)"

  /** i-th affine permutation over [0, P): h → (a_i·h + b_i) mod P. */
  def permA(i: Int): Long = 2L * i + 1
  def permB(i: Int): Long = 31L * i + 7
  def perm(i: Int, hModP: Column): Column =
    (lit(permA(i)) * hModP + lit(permB(i))) % lit(P)
  def permSql(i: Int, e: String): String =
    s"((${permA(i)} * $e + ${permB(i)}) % $P)"

  /** Order-sensitive fold combiner: acc → (acc·8191 + h) mod P, seeded
    * with `seed` — combines signature components into a band hash. */
  def fold(seed: Long, hs: Seq[Column]): Column =
    hs.foldLeft(lit(seed): Column)((acc, h) => (acc * lit(8191L) + h) % lit(P))
  def foldSql(seed: Long, es: Seq[String]): String =
    es.foldLeft(seed.toString)((acc, e) => s"(($acc) * 8191 + $e) % $P")
}
