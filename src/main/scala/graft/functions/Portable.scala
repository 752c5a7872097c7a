package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic hashing primitives that evaluate to identical values in
  * Spark and DuckDB, so probabilistic operators (minhash, simhash,
  * fingerprints) can be oracle-verified cell-for-cell. Both engines share
  * md5-of-UTF8; 15 hex digits = 60 bits keeps values positive in a signed
  * 64-bit long on both sides.
  *
  * Spark:  conv(substr(md5(s), 1, 15), 16, 10)::long
  * DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
  *
  * All pure Column expressions — codegen'd, no UDFs.
  */
object Portable {

  /** 60-bit hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: hash of "seed|value" — the minhash family. */
  def hash60(c: Column, seed: Column): Column =
    hash60(concat(seed.cast("string"), lit("|"), c))

  /** The equivalent DuckDB SQL fragment (for oracle builders). */
  def sqlHash60(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def sqlHash60Seeded(expr: String, seedExpr: String): String =
    sqlHash60(s"$seedExpr::VARCHAR || '|' || $expr")

  // ---------------------------------------------- universal hashing (2^31-1)

  /** Mersenne prime modulus: a*(x mod P) + b stays within signed 64 bits for
    * a, b, x < 2^31, so the family evaluates exactly in both engines.
    */
  val P31 = 2147483647L

  /** Driver-side hash60 (same md5-prefix definition) for deriving constants
    * embedded as literals in both the Spark plan and the oracle SQL.
    */
  def scalaHash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic multiplier/offset tables for a k-member universal hash
    * family h_j(x) = (a_j * (x mod P31) + b_j) mod P31.
    */
  def minhashA(k: Int): Seq[Long] = (0 until k).map(j => (scalaHash60("a" + j) % (P31 - 1)) + 1)
  def minhashB(k: Int): Seq[Long] = (0 until k).map(j => scalaHash60("b" + j) % P31)
}
