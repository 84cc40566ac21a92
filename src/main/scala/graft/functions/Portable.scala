package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * The driver hash-compares every query against a DuckDB oracle, so any
  * hashing/scoring the extension operators do must be reproducible in
  * ANSI-ish SQL on both engines, bit for bit:
  *
  *   - Hashes derive from `md5` (identical everywhere) rather than the
  *     engine-specific `xxhash64`/`hash`: a 60-bit (or 32-bit) positive
  *     int is parsed from the leading hex chars. In production on a
  *     cluster you would swap [[hash60]] for `xxhash64` (same shape,
  *     ~10× cheaper) — the LSH math is hash-agnostic.
  *   - Floating reductions over arrays use `aggregate` (a sequential
  *     left fold, matching DuckDB's `list_reduce`) rather than grouped
  *     `sum`, whose merge order is nondeterministic under parallelism.
  */
object Portable {

  /** 60-bit positive hash: first 15 hex chars of md5.
    * DuckDB equivalent: `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit positive hash: first 8 hex chars of md5.
    * DuckDB equivalent: `CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)`.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokens of trimmed text (single-space tokenizer — the
    * fixture corpus is single-space separated; swap for `\\s+` splitting
    * plus filter for messier corpora).
    * DuckDB equivalent: `string_split(trim(text), ' ')`.
    */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Word n-gram shingles of a token array (empty below n tokens).
    * DuckDB (n=3): `[t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1, len(t)-1)]`.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  // Vector math (dot/norm/cosine, hyperplane signatures) lives in the
  // native codegen'd expressions [[CosineSim]] and [[HyperplaneSignature]]
  // — both accumulate strictly left-to-right, bit-identical to DuckDB's
  // `list_reduce(list_prepend(0.0, xs), (a,b) -> a+b)` fold. Composed
  // builtins were measured and rejected: expanded 64-term sums blow the
  // generated-method limit (whole-stage codegen disables itself) and
  // higher-order `aggregate` is interpreted per element.

  /** Count of tokens in `toks` equal to the literal word `w`.
    * DuckDB: `len(list_filter(toks, x -> x = 'w'))`.
    */
  def tokenCount(toks: Column, w: String): Column =
    size(filter(toks, x => x === lit(w)))

  /** [[tokenCount]] computed from the raw text with codegen'd string
    * primitives instead of an interpreted higher-order filter: double
    * every separator space (so adjacent tokens stop sharing a
    * delimiter), pad both ends, and count non-overlapping `" w "`
    * occurrences by length difference. Bit-equal to
    * `tokenCount(tokens(text), w)` for the single-space tokenizer
    * ([[tokens]]): each token is then enclosed by its own pair of
    * spaces, so matches are exactly the tokens string-equal to `w`
    * (substrings inside longer tokens never match — they lack the
    * enclosing spaces).
    *
    * Why it exists: ArrayFilter/lambda expressions are CodegenFallback
    * — no whole-stage codegen and no subexpression elimination — so a
    * marker-scoring projection evaluating 20 of them per row was the
    * hottest interpreted path in the text pipeline (measured ~20× vs
    * this form at 10× scale). DuckDB oracle side stays
    * `len(list_filter(t, x -> x = 'w'))` — same values, so the hash
    * compare also proves the equivalence.
    */
  def tokenCountInText(text: Column, w: String): Column =
    tokenCountInSpaced(spacedText(text), w)

  /** The separator-doubled, padded form `" " + replace(trim(text), " ",
    * "  ") + " "` — every token enclosed by its own pair of spaces.
    * Callers counting SEVERAL markers should project this once and feed
    * the column to [[tokenCountInSpaced]]: the doubling pass is the
    * expensive half, and codegen subexpression elimination does not
    * reliably merge its repeated copies across a wide projection.
    */
  def spacedText(text: Column): Column =
    concat(lit(" "), replace(trim(text), lit(" "), lit("  ")), lit(" "))

  /** Occurrences of token `w` in a [[spacedText]] column: one native
    * `replace` pass + length difference.
    */
  def tokenCountInSpaced(spaced: Column, w: String): Column = {
    require(w.nonEmpty && !w.contains(" "), s"marker token must be space-free: '$w'")
    val pat = s" $w "
    ((length(spaced) - length(replace(spaced, lit(pat), lit("")))) / lit(pat.length))
      .cast("int")
  }
}
