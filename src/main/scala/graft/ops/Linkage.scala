package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — the standard
  * model for merging records about the same real-world entity across
  * sources that share no key (dedup across crawls/feeds, customer-file
  * reconciliation, training-set entity merging).
  *
  * Each field comparison contributes a log-likelihood-ratio weight:
  * `ln(m/u)` when the fields AGREE (m = P(agree | same entity),
  * u = P(agree | different entities)) and `ln((1-m)/(1-u))` when they
  * disagree; a pair's score is the sum. The m/u parameters are model
  * inputs (estimated offline, EM in the full method), so the weights
  * enter as precomputed integer micro-nat CONSTANTS — the determinism
  * pattern for transcendentals: both engines sum identical longs, no
  * runtime `ln` to diverge at ULP.
  *
  * Scale shape: candidate generation MUST be blocked — the caller
  * joins the two sources on a blocking key before scoring, which
  * bounds compared pairs to Σ_blocks |A_b|·|B_b| (the same bound as
  * every LSH/banding op in this library; a production stack layers
  * several blocking passes). Scoring itself is scan-side codegen'd
  * arithmetic on the candidate table; best-match selection is one
  * window over the candidate key.
  */
object Linkage {

  /** One field comparison: `agree` predicate plus the two micro-nat
    * weights (agreement, disagreement), precomputed from m/u.
    */
  final case class FieldWeight(agree: Column, agreeMicro: Long, disagreeMicro: Long)

  /** Fellegi–Sunter pair score in exact integer micro-nats. */
  def fsScoreMicro(fields: Seq[FieldWeight]): Column =
    fields
      .map(f => when(f.agree, lit(f.agreeMicro)).otherwise(lit(f.disagreeMicro)))
      .reduce(_ + _)

  /** Best A-side match per B record over a scored candidate table:
    * highest score wins, ties broken on the A key ASC (determinism
    * rule). One window, partitioned by the B key.
    */
  def bestMatch(
      scored: DataFrame,
      bKey: String,
      aKey: String,
      scoreCol: String): DataFrame =
    Windows.topKPerGroup(scored, Seq(bKey), col(scoreCol), Seq(aKey), 1)
      .drop("rn")
}
