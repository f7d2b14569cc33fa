package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * shingling, token hashing, language-ID scoring, quality features,
  * fingerprints. Everything is a Catalyst `Column` expression (codegen'd,
  * no UDFs), so filters/projections around them still push down and the
  * operators scale with the scan.
  *
  * Hash convention shared with the DuckDB oracle: a token/shingle hash is
  * the first 15 hex chars of md5 parsed as a 60-bit integer — both engines
  * compute identical values, which makes every downstream signature
  * (minhash, simhash, fingerprints) engine-independent.
  */
object TextOps {

  /** Distinct character n-grams of `text` (1-based substr, matching the
    * oracle's `[substr(text, i, n) for i in range(1, len(text)-n+2)]`).
    * Guarded for len < n: Spark's sequence(1, 0) counts DOWN (yielding a
    * bogus truncated gram) where DuckDB's range(1, 0) is empty. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** Whitespace tokens (trimmed; empty text → single empty token, matching
    * regexp_split_to_array semantics in the oracle). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** 60-bit hash of a string: first 15 hex chars of md5, base-16 parsed.
    * Mirrors DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Affine MinHash permutations over the Mersenne field p = 2^31 - 1:
    * perm_p(h) = (A(p) * (h mod p) + B(p)) mod p. Products stay below 2^62
    * (no 64-bit overflow in either engine) and the final mod genuinely
    * wraps, so each permutation shuffles the full hash range — a map whose
    * modulus never engages would degenerate every signature row to an
    * affine image of the same minimum shingle. Constants are Knuth-style
    * multiplicative mixes, identical on the oracle side. */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashA(p: Int): Long = ((p + 1L) * 2654435761L) % MinhashP
  def minhashB(p: Int): Long = ((p + 1L) * 40503L * 196613L) % MinhashP

  /** MinHash signature: per permutation, the minimum affine-permuted
    * shingle hash. One digest per shingle total (hash60); the permutations
    * themselves are integer ops — what keeps minhash affordable when the
    * corpus is 100 TB. */
  def minhashSignature(shingleHashes: Column, numPerms: Int): Column =
    array((0 until numPerms).map { p =>
      array_min(transform(shingleHashes, h =>
        (lit(minhashA(p)) * (h % MinhashP) + lit(minhashB(p))) % MinhashP))
    }: _*)

  /** Oracle twin of [[minhashSignature]] over a BIGINT list column. */
  def oracleMinhashSignature(hsExpr: String, numPerms: Int): String =
    "[" + (0 until numPerms).map { p =>
      s"list_min([(${minhashA(p)} * (h % $MinhashP) + ${minhashB(p)}) % $MinhashP for h in $hsExpr])"
    }.mkString(", ") + "]"

  /** LSH band keys from a minhash signature: the concatenated rows of each
    * band (portable string join). */
  def bandKeys(sig: Column, numPerms: Int, rowsPerBand: Int): Column = {
    val bands = numPerms / rowsPerBand
    array((0 until bands).map { b =>
      val parts = Seq(lit(b.toString)) ++
        (0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r))
      concat_ws("|", parts: _*)
    }: _*)
  }

  /** SimHash over distinct whitespace tokens with `bits` bits: per bit, the
    * sign of the sum of (2*bit(h)-1) votes across token hashes — one fused
    * codegen pass ([[graft.functions.expressions.SimHashPack]], spec-pinned
    * bit-identical to the per-bit composed formulation
    * `Σ_j when(aggregate(hashes, 0L, (acc,h) -> acc+((h>>j)&1)*2-1) > 0, 2^j, 0)`,
    * which pays `bits` interpreted folds per document). */
  def simhash(text: Column, bits: Int): Column = {
    val toks = array_distinct(tokens(text))
    val hashes = transform(toks, t => hash60(t))
    graft.functions.expressions.ShingleExpressions.simHashPack(hashes, bits)
  }

  /** Count occurrences of a literal marker substring (no regex):
    * (len(text) - len(replace(text, m, ''))) / len(m). */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("long")

  /** Language-marker table shared with the oracle: language → stopword
    * markers (space-padded so they match whole words). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die "),
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " la ", " et "),
    "zh" -> Seq(" de ", " shi ", " le ")
  )

  /** Heuristic language ID: argmax of marker counts over a padded text,
    * ties broken by language code ascending, all-zero → 'und'. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(padded, m)).reduce(_ + _)
    }
  }

  /** Argmax of marker counts, ties broken by language code ascending
    * (langMarkers is sorted by code); all-zero → 'und'. */
  def langId(text: Column): Column = {
    var bestLang: Column = lit("und")
    var bestScore: Column = lit(0L)
    langScores(text).foreach { case (lang, sc) =>
      val better = sc > bestScore // strict: earlier (asc) language wins ties
      bestLang = when(better, lit(lang)).otherwise(bestLang)
      bestScore = when(better, sc).otherwise(bestScore)
    }
    bestLang
  }
}
