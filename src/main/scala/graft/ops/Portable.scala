package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine ("portable") deterministic hashing.
  *
  * xxhash64 is the right hash at scale (cheap, codegen'd, 64-bit), but it
  * exists only in Spark — every signature-based operator built on it is
  * invisible to the driver's DuckDB oracle. This object pins an alternative
  * hash family computable bit-identically in BOTH engines from SQL built-ins,
  * so minhash/simhash/winnowing runs are exactly replayable in external SQL:
  *
  *   md5h60(x)        first 15 hex chars of md5(x) as a non-negative BIGINT
  *                    (60 bits; fits a signed 64-bit in both engines)
  *                    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
  *                    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
  *   permHash(p, h)   (A(p) * (h % 2^30) + B(p)) % P30 — a universal-hash
  *                    family over the md5h60 base for minhash permutations;
  *                    P30 = largest prime < 2^30, so every product stays
  *                    < 2^60 and no 64-bit overflow occurs in either engine.
  *
  * Operators take a [[HashMode]]: [[HashMode.XxHash]] for production scale,
  * [[HashMode.PortableMd5]] when the run must be replayable by an external
  * SQL engine (the correctness harness). The dataflow shape is identical in
  * both modes — only the hash expressions swap, so a plan audit of one mode
  * covers the other.
  */
object Portable {

  /** Largest prime below 2^30 — modulus of the universal-hash family. */
  final val P30 = 1073741789L

  /** 2^30 — the base is folded into 30 bits so A*base stays under 2^60. */
  final val Base30 = 1073741824L

  /** 60-bit md5-derived hash of a string/binary column (non-negative).
    * Since round 6 this is the native fused expression
    * [[graft.plans.Md5H60Expr]] — bit-identical to the composite
    * `conv(substring(md5(c), 1, 15), 16, 10)::long` (the first 15 hex chars
    * of the digest ARE its first 60 bits; Md5H60Spec fuzz-pins it) but
    * without the per-row MessageDigest allocation, 32-char hex encode,
    * substring copy, and string re-parse — the overhead that dominated the
    * hash-per-character winnowing path and hash-per-token signature paths. */
  def md5h60(c: Column): Column = graft.plans.GraftExtensions.md5h60(c)

  /** Multiplier of permutation p (Knuth constant folded mod P30; never 0 for
    * any practical p since P30 is prime and p+1 < P30). */
  def permA(p: Int): Long = {
    val a = (2654435761L * (p + 1)) % P30
    if (a == 0L) 1L else a
  }

  /** Offset of permutation p. */
  def permB(p: Int): Long = (40503L * (p + 1)) % P30

  /** h_p over a md5h60 base column: (A(p) * (base % 2^30) + B(p)) % P30. */
  def permHash(p: Int, base: Column): Column =
    pmod(lit(permA(p)) * pmod(base, lit(Base30)) + lit(permB(p)), lit(P30))

  // ---- DuckDB-SQL renderings of the same expressions (oracle generators) ----

  /** DuckDB SQL for md5h60 over `expr`. */
  def md5h60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** DuckDB SQL for permHash with the permutation index given as SQL `pExpr`
    * (the A/B formulas are inlined so DuckDB derives the same constants). */
  def permHashSqlByP(pExpr: String, baseExpr: String): String =
    s"((((2654435761 * (($pExpr) + 1)) % $P30) * (($baseExpr) % $Base30) + " +
      s"((40503 * (($pExpr) + 1)) % $P30)) % $P30)"
}

/** Hash strategy of a signature-based operator (see [[Portable]]). */
sealed trait HashMode
object HashMode {
  /** xxhash64 — the production default (cheapest, 64-bit). */
  case object XxHash extends HashMode
  /** md5-derived portable family — bit-identical in DuckDB (oracle mode). */
  case object PortableMd5 extends HashMode
}
