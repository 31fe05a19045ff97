package graft

import graft.ops.Validate
import org.apache.spark.sql.functions._

/** Data-quality battery: each check isolates exactly its violation
  * rows, and the report folds to one row per constraint.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val child = Seq(
    (Some(1L), "F", 5L),
    (Some(2L), "O", 60L), // range violation
    (Some(9L), "F", 10L), // orphan fk
    (None, "X", 1L) // null fk + bad status
  ).toDF("fk", "status", "qty")

  private lazy val parent = Seq(1L, 2L, 3L).toDF("pk")

  test("notNull / range / acceptedValues isolate exactly their violations") {
    assert(Validate.notNullViolations(child, "fk").count() == 1)
    assert(Validate.rangeViolations(child, "qty", 1L, 50L).count() == 1)
    assert(
      Validate.acceptedValuesViolations(child, "status", Seq("F", "O")).count() == 1)
  }

  test("refIntegrity flags orphans only — null fks are not orphans") {
    val v = Validate.refIntegrityViolations(child, "fk", parent, "pk")
    assert(v.select("fk").as[Long].collect().toSeq == Seq(9L))
  }

  test("uniqueKey reports each duplicated tuple once with its multiplicity") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a")).toDF("k1", "k2")
    val v = Validate.uniqueKeyViolations(df, Seq("k1", "k2")).collect()
    assert(v.length == 1 && v.head.getLong(2) == 2L)
  }

  test("report: one row per check, zero-violation checks included") {
    val r = Validate
      .report(Seq(
        "fk_not_null" -> Validate.notNullViolations(child, "fk"),
        "pk_unique" -> Validate.uniqueKeyViolations(parent, Seq("pk"))))
      .orderBy(col("constraint"))
      .collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("fk_not_null", 1L), ("pk_unique", 0L)))
  }
}
