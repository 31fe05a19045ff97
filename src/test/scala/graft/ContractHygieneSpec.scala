package graft

import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType, StructType}

/** Contract hygiene over the whole 127-query oracle surface (ADVICE r5):
  * the q104/q109 failure class — a final output column typed DECIMAL —
  * hash-diverges across DuckDB builds even when values match, so the
  * suite's convention is integer cents/micros (or DOUBLE only where the
  * expression is bit-exact cross-engine). This spec scans every
  * `SparkEntry.queries` schema (analysis only — no execution) and fails
  * the build if a new query forgets the convention.
  */
class ContractHygieneSpec extends SparkSpec {

  /** Queries whose DOUBLE final columns are documented bit-exact
    * cross-engine (decimal-exact double sums, correctly-rounded IEEE
    * sqrt/div on exact integer inputs, or probe-verified expression
    * shapes — see scaladocs at each impl). All were hash-green in
    * CORRECTNESS_r05. Additions require the same justification.
    */
  private val doubleAllowlist: Set[String] = Set(
    "q01_pricing_summary", "q03_join_agg", "q04_left_join_defaults",
    "q06_topk_per_group", "q10_conditional_agg", "q11_two_level_agg",
    "q12_composite_join", "q13_describe_stats", "q16_user_session_stats",
    "q25_scalar_functions", "q26_features", "q31_knn_cosine",
    "q36_knn_lsh", "q39_embedding_neardup", "q40_embedding_neardup_lsh",
    "q41_knn_ivf", "q46_group_quantiles", "q66_reconcile", "q72_rollup",
    "q79_cube", "q88_grouping_sets", "q99_winsorize",
    // quantized-integer cosine (exact int dot/norms, one IEEE division
    // chain identical in both engines) — same bit-exactness as q31/q36
    "q146_hard_negatives",
    // PQ rerank emits the same quantized-integer cosine as q31/q36/q41
    "q155_knn_pq", "q160_knn_ivfpq",
    // theta/uplifts: one IEEE division/multiply chain on exact integer
    // cent moments, written textually identically on both sides
    "q158_cuped_uplift",
    // slope: CAST(int)/CAST(int) correctly rounded double
    "q159_theil_sen",
    // purity score / acf / mase: double chains on exact integer
    // moments, written textually identically on both sides
    "q161_gini_stumps", "q162_autocorrelation", "q163_mase_forecast")

  private def leafTypes(dt: DataType): Seq[DataType] = dt match {
    case s: StructType => s.fields.toSeq.flatMap(f => leafTypes(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => leafTypes(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      leafTypes(m.keyType) ++ leafTypes(m.valueType)
    case other => Seq(other)
  }

  test("every queries entry has a matching oracleSql entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without queries: ${(o -- q).toSeq.sorted}")
  }

  test("no Verify output column is DECIMAL-typed (cross-engine hash trap)") {
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      val schema = f(spark, dir).schema
      schema.fields.toSeq.collect {
        case fld if leafTypes(fld.dataType).exists(_.isInstanceOf[DecimalType]) =>
          s"$name.${fld.name}: ${fld.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"DECIMAL-typed contract columns (use integer cents/micros): $offenders")
  }

  test("no contract query plans a MULTI-distinct aggregate (plan-text nondeterminism)") {
    // Catalyst's RewriteDistinctAggregates (2+ distinct-argument groups
    // in one Aggregate) lays out its Expand projections and gids in
    // expression-set HASH order — the same query text plans with
    // permuted gids run-to-run, which is semantically harmless but
    // breaks the bench's byte-stable plan fingerprint (q92/q174/q237
    // were the round-12 offenders). The deterministic shapes: unpivot +
    // one single-distinct agg, distinct-projection + count, or counts
    // of marginal tables — see Profile.profile.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      f(spark, dir).queryExecution.analyzed.collect {
        case a: Aggregate =>
          val distinctGroups = a.aggregateExpressions
            .flatMap(_.collect {
              case ae: AggregateExpression if ae.isDistinct =>
                ae.aggregateFunction.children.map(_.canonicalized).toSet
            })
            .distinct
          if (distinctGroups.size > 1)
            Some(s"$name: ${distinctGroups.size} distinct-arg groups in one agg")
          else None
      }.flatten
    }
    assert(offenders.isEmpty,
      s"multi-distinct aggregates (hash-ordered Expand, unstable plan text): $offenders")
  }

  test("raw floating-point output columns are allowlisted per query") {
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      if (doubleAllowlist.contains(name)) Seq.empty
      else {
        val schema = f(spark, dir).schema
        schema.fields.toSeq.collect {
          case fld if leafTypes(fld.dataType)
              .exists(t => t == DoubleType || t == FloatType) =>
            s"$name.${fld.name}: ${fld.dataType.simpleString}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"un-allowlisted float output columns (quantize to micros or allowlist " +
        s"with a bit-exactness justification): $offenders")
  }
}
