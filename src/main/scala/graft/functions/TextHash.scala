package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text/hash primitives for the dedup,
  * similarity and text-analysis operators (the training-data-pipeline
  * surface, SURVEY.md §2.2 north-star rows).
  *
  * Everything here is built ONLY from functions whose bit-level behavior is
  * identical in Spark and DuckDB (verified by probe): `md5` over UTF-8,
  * hex→integer conversion, integer arithmetic, IEEE-754 double ops in a
  * defined evaluation order. That makes every derived operator (minhash,
  * simhash, LSH buckets) hash-matchable by the DuckDB oracle — no
  * tolerance comparisons needed. Each Spark builder has a `sql*` twin that
  * emits the same computation as DuckDB SQL from the same constants.
  *
  * Scale: all of these are per-row projections (narrow, codegen'd,
  * shuffle-free); the operators that use them group/join afterwards.
  */
object TextHash {

  /** 2^31 − 1 (Mersenne prime): modulus for the minhash permutations. */
  val HashPrime = 2147483647L

  /** Number of minhash functions and LSH band width (rows per band). */
  val MinhashK = 8
  val BandRows = 2

  /** Seeded affine permutation params a_i, b_i (a odd, < 2^20 so
    * a·h32 + b < 2^52 — no int64 overflow). */
  val MinhashParams: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(MinhashK)((rnd.nextInt(1 << 20).toLong | 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  // ---- column builders (Spark) ---------------------------------------------

  /** 32-bit (unsigned, as long) hash: first 8 hex chars of md5. Evaluated
    * by the native codegen'd [[graft.plans.H32]] expression — bit-identical
    * to `conv(substr(md5(c),1,8),16,10)` (the formulation the DuckDB
    * oracles keep using) without the hex-string round-trip. */
  def h32(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.H32(org.apache.spark.sql.GraftBridge.expression(c)))

  /** 60-bit hash: first 15 hex chars of md5 (fits signed int64). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Canonical text normalization: lowercase, trim, collapse whitespace. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct n-word shingles from a PRE-BOUND tokens column. Out-of-range
    * indexes (docs shorter than n words) yield nulls, which concat_ws
    * skips — the same behavior as DuckDB's concat_ws, keeping the two
    * engines byte-identical on degenerate inputs.
    *
    * `w` MUST be a materialized column (`.withColumn("w", tokens(...))`),
    * not an inline `tokens(c)` expression: the lambda body re-evaluates
    * every non-lambda subexpression per array element, so an inline split
    * would run the regex once per shingle per referenced token — measured
    * 20s vs 0.2s on 5k documents. CollapseProject keeps the bound column
    * as a cheap reference because the split is non-trivial and referenced
    * more than once. */
  def shinglesFromTokens(w: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(w) - n, lit(0))),
        i => concat_ws(" ", (0 until n).map(j => try_element_at(w, i + j + 1)): _*)))

  /** Convenience single-expression form — ONLY for tiny inputs/tests; query
    * builders must bind tokens first (see [[shinglesFromTokens]]). */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** 8-token document-prefix fingerprint over a PRE-BOUND tokens column —
    * the structural "same template/generator" signal shared by the
    * fingerprint export and the template-detection query. */
  def prefixFp8(w: Column): Column =
    h32(concat_ws(" ", slice(w, 1, 8)))

  /** Minhash_i of a shingle array: min over shingles of (a_i·h32(s)+b_i) mod p. */
  def minhash(shinglesCol: Column, i: Int): Column = {
    val (a, b) = MinhashParams(i)
    array_min(transform(shinglesCol, s => (h32(s) * a + b) % HashPrime))
  }

  /** LSH band bucket from a minhash signature: combines [[BandRows]]
    * consecutive minhashes into one band key. */
  def bandBucket(sig: Seq[Column], band: Int): Column =
    ((sig(band * BandRows) * 31L + sig(band * BandRows + 1)) % HashPrime)

  // ---- the same computations as DuckDB SQL fragments -----------------------

  def sqlH32(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  def sqlH60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  def sqlNormText(e: String): String =
    s"regexp_replace(lower(trim($e)), '\\s+', ' ', 'g')"

  def sqlTokens(e: String): String =
    s"string_split(${sqlNormText(e)}, ' ')"

  /** Shingles over a tokens-list alias from an enclosing CTE (DuckDB lists
    * are 1-based; shingle i spans w[i..i+n-1]). */
  def sqlShingles(w: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$w[i+$j]").mkString(", ")
    s"list_distinct(list_transform(generate_series(1, greatest(len($w) - ${n - 1}, 1)), i -> concat_ws(' ', $parts)))"
  }

  /** SQL twin of [[prefixFp8]] over a tokens-list alias. */
  def sqlPrefixFp8(w: String): String =
    sqlH32(s"concat_ws(' ', ${(1 to 8).map(i => s"$w[$i]").mkString(", ")})")

  def sqlMinhash(shinglesExpr: String, i: Int): String = {
    val (a, b) = MinhashParams(i)
    s"list_min(list_transform($shinglesExpr, s -> (${sqlH32("s")} * $a + $b) % $HashPrime))"
  }

  def sqlBandBucket(sigExprs: Seq[String], band: Int): String =
    s"((${sigExprs(band * BandRows)} * 31 + ${sigExprs(band * BandRows + 1)}) % $HashPrime)"
}
