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

  test("materializeCtes rewrites the WITH chain only (WINDOW clauses untouched)") {
    // The pre-r16 `),\s*\w+ AS (` regex also matched the 2nd+
    // definitions of a multi-definition WINDOW clause — invalid DuckDB
    // SQL if such an oracle ever joined the cohort (ADVICE r15). The
    // walker skips balanced-paren CTE bodies (string literals with
    // parens included) and stops at the chain's final SELECT.
    val sql =
      """WITH a AS (SELECT '(' AS lit, 1 AS x), b AS (
        |  SELECT x, count(*) OVER tv AS c FROM a
        |  WINDOW tv AS (PARTITION BY x), bv AS (ORDER BY x)
        |)
        |SELECT x, sum(x) OVER tv, sum(x) OVER bv FROM b
        |WINDOW tv AS (PARTITION BY x), bv AS (ORDER BY x)""".stripMargin
    val out = SparkEntry.materializeCtes(sql)
    assert(out.contains("WITH a AS MATERIALIZED (SELECT '(' AS lit, 1 AS x), " +
      "b AS MATERIALIZED ("))
    assert(out.count(_ == 'M') - sql.count(_ == 'M') ==
      2 * "MATERIALIZED".count(_ == 'M'), "exactly the two chain CTEs rewritten")
    assert(out.contains("WINDOW tv AS (PARTITION BY x), bv AS (ORDER BY x)"),
      "WINDOW definitions must stay untouched")
    // parse failure is LOUD: a silently-unrewritten cohort oracle
    // re-inlines its CTE chain refs^rounds times (q193's 101 s vs 0.1 s)
    intercept[IllegalArgumentException] { SparkEntry.materializeCtes("SELECT 1") }
    // the shipped cohort all came through the walker
    val cohort = Seq("q140_kcore", "q157_communities", "q173_hits",
      "q193_ktruss", "q215_community_purity", "q227_community_nmi",
      "q270_mutual_knn", "q277_knn_outliers", "q287_modularity",
      "q313_kmeans")
    for (n <- cohort)
      assert(SparkEntry.oracleSql(n).contains("AS MATERIALIZED ("), n)
    // q74 has the multi-definition WINDOW shape and is NOT in the cohort
    assert(!SparkEntry.oracleSql("q74_rank_functions").contains("MATERIALIZED"))
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

  /** The q114/q99 scale-killer class (VERDICT r12): a rank-family
    * window partitioned by a BOUNDED dimension column (≤ a handful of
    * distinct values) whose input is corpus-rate — the whole fact
    * shuffles onto |dimension| partitions and each is sorted by ONE
    * task, so parallelism is bounded by group count no matter the
    * cluster. Detector: a row_number/rank/dense_rank/ntile Window
    * whose partition keys are all in the named low-cardinality column
    * set AND whose child has some leaf not behind an Aggregate (an
    * aggregated input is group-rate — q159's day-bounded slope window
    * is the documented allowed shape and passes via its Aggregate).
    */
  private val lowCardCols: Set[String] = Set(
    "l_returnflag", "l_linestatus", "event_type", "source", "lang")

  private def lowCardRankWindows(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.{DenseRank, NTile, Rank, RowNumber}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan, Window, WindowGroupLimit}
    // a leaf that is not count-compressed by some Aggregate (or
    // k-bounded by a WindowGroupLimit rank pushdown — partial mode
    // keeps ≤k rows per group per map task, so the exchange is
    // k·partitions-bounded, not corpus-rate) between it and the window
    // input. Cached aggregates hide behind InMemoryRelation leaves —
    // recurse into the cached PHYSICAL plan so a time-bounded daily
    // aggregate (q159's shape) is not misread as raw rows.
    def physRaw(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => false
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        physRaw(a.initialPlan)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        physRaw(s.relation.cachedPlan)
      case l if l.children.isEmpty => true
      case other => other.children.exists(physRaw)
    }
    def hasRawLeaf(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: WindowGroupLimit => false
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => false
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => false
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        physRaw(imr.cachedPlan)
      case _: LeafNode => true // scans, checkpoints: corpus-rate until proven otherwise
      case other => other.children.exists(hasRawLeaf)
    }
    plan.collect {
      case w: Window
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: AttributeReference => lowCardCols.contains(a.name)
              case _ => false
            } &&
            w.windowExpressions.exists(_.exists {
              case we: WindowExpression => we.windowFunction match {
                case _: RowNumber | _: Rank | _: DenseRank | _: NTile => true
                case _ => false
              }
              case _ => false
            }) &&
            hasRawLeaf(w.child) =>
        s"rank window partitioned by ${w.partitionSpec.map(_.sql).mkString(",")} over raw rows"
    }
  }

  test("no contract query rank-windows raw rows on a bounded dimension key") {
    val dir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      lowCardRankWindows(f(spark, dir).queryExecution.optimizedPlan)
        .map(msg => s"$name: $msg")
    }
    assert(offenders.isEmpty,
      s"corpus-rate rank windows on low-cardinality keys (parallelism bounded " +
        s"by group count — use count-compressed supports, the q171/q214 shape): " +
        s"${offenders.mkString("; ")}")
  }

  test("the low-card rank-window detector fires on the old q114 shape (self-test)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val df = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
    val offender = df.withColumn(
      "rn",
      row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))))
    assert(lowCardRankWindows(offender.queryExecution.optimizedPlan).nonEmpty,
      "detector must flag a row_number over raw rows partitioned by l_returnflag")
    // and the group-rate counter-shape (window over an aggregate) passes
    val fine = df
      .groupBy(col("l_returnflag"), col("l_extendedprice")).count()
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))))
    assert(lowCardRankWindows(fine.queryExecution.optimizedPlan).isEmpty,
      "detector must NOT flag a window whose input is count-compressed")
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
