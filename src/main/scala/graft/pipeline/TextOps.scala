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
    * oracle's `[substr(text, i, n) for i in range(1, len(text)-n+2)]`). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
      i => text.substr(i, lit(n))))

  /** Whitespace tokens (trimmed; empty text → single empty token, matching
    * regexp_split_to_array semantics in the oracle). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** 60-bit hash of a string: first 15 hex chars of md5, base-16 parsed.
    * Mirrors DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signature as `numPerms` md5-string minima over salted shingle
    * hashes — min over lexicographic md5 strings is a valid permutation
    * family and is engine-portable (strings compare identically). */
  def minhashSignature(shingleArr: Column, numPerms: Int): Column =
    array((0 until numPerms).map { p =>
      array_min(transform(shingleArr, s => md5(concat(lit(p.toString), lit("|"), s))))
    }: _*)

  /** LSH band keys from a minhash signature: md5 of the concatenated rows
    * of each band. */
  def bandKeys(sig: Column, numPerms: Int, rowsPerBand: Int): Column = {
    val bands = numPerms / rowsPerBand
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r))
      md5(concat_ws("|", parts: _*))
    }: _*)
  }

  /** SimHash over distinct whitespace tokens with `bits` bits: per bit, the
    * sign of the sum of (2*bit(h)-1) votes across token hashes. */
  def simhash(text: Column, bits: Int): Column = {
    val toks = array_distinct(tokens(text))
    val hashes = transform(toks, t => hash60(t))
    val bitCols = (0 until bits).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
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
