package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** The fold-in-lambda lint must actually FIRE on the interpreted-HOF
  * inlining trap it was built for (r11 advice): a lambda that divides by
  * an outer norm column gets the norm's defining ArrayAggregate INLINED
  * by CollapseProject and re-run per element. Positive case = the exact
  * pre-fix EmbedPipeline shape; negative cases = the post-fix
  * zip_with/array_repeat shape and the legitimate fold-over-own-element
  * shape. A lint that cannot fire is worse than none.
  */
class FoldInLambdaLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planFlags(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAudit.flags(df.queryExecution.executedPlan)

  // spark.range keeps the plan live (a local Seq constant-folds into a
  // LocalTableScan and there is no lambda left to lint)
  private def vecs = spark.range(4).select(col("id"),
    array(col("id") + 1.0, col("id") + 2.0, col("id") + 3.0).as("vec"))

  test("positive: lambda dividing by an inlined outer fold is flagged") {
    val norm = sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x))
    // the pre-fix EmbedPipeline shape: CollapseProject inlines nrm's
    // defining fold into the transform lambda → per-element recompute
    val df = vecs.withColumn("nrm", norm)
      .select(col("id"), transform(col("vec"), x => x / col("nrm")).as("dir"))
    assert(planFlags(df).contains("fold-in-lambda"),
      s"the inlining trap must be flagged:\n${df.queryExecution.executedPlan}")
  }

  test("negative: the fixed zip_with/array_repeat shape is clean") {
    val norm = sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x))
    val df = vecs.select(col("id"),
      zip_with(col("vec"), array_repeat(norm, 3), (x, n) => x / n).as("dir"))
    assert(!planFlags(df).contains("fold-in-lambda"),
      s"one-fold-per-row must be clean:\n${df.queryExecution.executedPlan}")
  }

  test("negative: a fold over the lambda's OWN element is clean") {
    val df = Seq((1L, Seq(Seq(1.0, 2.0), Seq(3.0)))).toDF("id", "vv")
      .select(col("id"), transform(col("vv"),
        a => aggregate(a, lit(0.0), (acc, x) => acc + x)).as("sums"))
    assert(!planFlags(df).contains("fold-in-lambda"),
      "per-element folds of the element itself are the legitimate shape")
  }
}
