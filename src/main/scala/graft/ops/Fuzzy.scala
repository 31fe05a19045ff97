package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (entity resolution).
  *
  * Levenshtein edit distance is the standard tool for catching
  * typo-variants the exact/fingerprint dedup family cannot see
  * ("blue bolt" vs "blxe bolt"), but it is O(|a|·|b|) per PAIR — an
  * unblocked all-pairs comparison is quadratic in the table and never
  * survives scale-up. The operator therefore requires a BLOCKING key:
  * only pairs sharing the key are compared, turning the cost into
  * sum-of-block² — the user picks a key (phonetic code, a stable
  * token, a length band, an LSH bucket) that bounds block size.
  */
object Fuzzy {

  /** All unordered pairs of distinct `nameCol` values that share
    * `blockCol` and sit within `maxDist` edits.
    *
    * Output: `(name_a, name_b, dist)` with `name_a < name_b` (each
    * pair once, deterministic orientation). Distinct names first: real
    * string columns repeat heavily (64 distinct part names across 2000
    * parts here), and comparing VALUES instead of rows removes the
    * duplicate-pair blow-up entirely.
    *
    * Scale shape: one distinct-agg shuffle on (block, name), then a
    * self equi-join on the block key — pair enumeration stays inside
    * each block's hash partition, and the `<` orientation halves it.
    * Block-size skew is the operator's documented failure mode (same
    * as the co-visitation cap): a hot block with f names emits f²/2
    * candidate pairs, so keys must be chosen — or salted/capped — to
    * keep f bounded.
    */
  def levenshteinPairs(
      df: DataFrame,
      nameCol: String,
      blockCol: org.apache.spark.sql.Column,
      maxDist: Int): DataFrame = {
    val names = df
      .select(col(nameCol).as("name"), blockCol.as("block"))
      .distinct()
    val a = names.select(col("block"), col("name").as("name_a"))
    val b = names.select(col("block"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(
        col("name_a"),
        col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }
}
