package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable building blocks.
  *
  * Every helper here is defined so the identical value is computable in
  * ANSI-ish SQL on another engine (the DuckDB oracle): deterministic,
  * no engine-specific hash functions, no float accumulation ambiguity.
  *
  *  - Hashing is md5-hex based (md5 is bit-identical everywhere); a
  *    "hash value" is a fixed-width hex string, so MIN() over it is a
  *    numeric min (fixed-length hex compares lexicographically).
  *  - Vector math casts float → double element-wise and folds
  *    left-to-right, matching a sequential dot product.
  *  - All fractional outputs are rounded at a stated precision before
  *    they leave an operator.
  *
  * These run inside whole-stage codegen (built-in expressions only — no
  * Scala UDFs), so they vectorize on a real cluster.
  */
object Portable {

  /** 64-bit-equivalent portable hash: first 16 hex chars of md5. */
  def hex16(c: Column): Column = substring(md5(c), 1, 16)

  /** Tokenize on single spaces (the documents table is single-space
    * separated; literal split keeps Spark and DuckDB aligned). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (default 3). Empty array when the document
    * is shorter than n tokens. The 3-gram case routes through the
    * native [[ShingleArray]] kernel (one compiled call per row); the
    * generic case keeps the declarative HOF form — both produce
    * identical strings. */
  def shingles(text: Column, n: Int = 3): Column =
    if (n == 3) call_function("graft_shingles", tokens(text))
    else shinglesHof(text, n)

  /** Declarative reference formulation of [[shingles]]. */
  def shinglesHof(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** [[shingles]] over an already-tokenized array — lets a caller
    * tokenize the corpus ONCE (materialized) and derive every n-gram
    * grain from the shared relation instead of re-parsing text per
    * signal (the admission gate's single-scan shape). Identical
    * strings to the text-input forms by construction. */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    if (n == 3) call_function("graft_shingles", toks)
    else when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Sequential double-precision dot product of two float vectors —
    * the native codegen'd [[DotProduct]] expression (resolved via the
    * graft function registry; sessions built/tuned by GraftSession
    * have it). Bit-identical to [[dotFold]]. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** The declarative HOF formulation of [[dot]] — kept as the
    * reference implementation the native expression is tested
    * against (same per-product double cast, same left fold). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to `scale` decimals (default 4). */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (l2norm(a) * l2norm(b)), scale)

  /** Exact decimal sum of a double column: cast to DECIMAL(18,4) before
    * summing so the aggregate is order-independent and engine-exact,
    * then back to double rounded to `scale`. */
  def exactSum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double"), scale)

  /** Exact decimal sum of a product of two double columns. */
  def exactSumProd(a: Column, b: Column, scale: Int = 2): Column =
    round(sum(a.cast("decimal(18,4)") * b.cast("decimal(18,4)")).cast("double"), scale)

  /** 52-bit portable hash: first 13 hex chars of md5 as a long —
    * inside the double-exact range, so ratios of hash values are
    * engine-identical. DuckDB mirror:
    * `CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)`. Routes through
    * the native [[Hash52]] kernel (no hex round trip); [[hash52Ref]]
    * is the declarative reference it is tested against. */
  def hash52(c: Column): Column =
    call_function("graft_hash52", c.cast("string"))

  /** Declarative reference formulation of [[hash52]]. */
  def hash52Ref(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10).cast("long")
}
