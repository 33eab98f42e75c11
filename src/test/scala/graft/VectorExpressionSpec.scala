package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The codegen'd DotProduct expression must be bit-identical to the
  * higher-order form it replaced (same left-to-right double accumulation)
  * and resolve as a SQL function through the session extension. */
class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot equals the higher-order dot bit-for-bit on the fixture") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val rows = emb.alias("a").join(emb.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        dot(col("a.embedding"), col("b.embedding")).as("fast"),
        dotHof(col("a.embedding"), col("b.embedding")).as("ref"))
      .withColumn("diff", col("fast") - col("ref"))
      .agg(max(abs(col("diff")))).collect()(0).getDouble(0)
    assert(rows == 0.0, "same summation order must give identical doubles")
  }

  test("graft_dot resolves in SQL via SparkSessionExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_probe")
    val n = spark.sql(
      """SELECT graft_dot(embedding, embedding) AS d FROM emb_probe LIMIT 5""")
      .collect()
    assert(n.length == 5 && n.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-5),
      "unit vectors must have self-dot ≈ 1")
  }

  test("mixed element types and null elements") {
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq(2L, 5L, 10L)))
      .toDF("a", "b")
    val d = df.select(dot(col("a"), col("b")).as("d")).collect()(0).getDouble(0)
    assert(d == 1.0 * 2 + 3.0 * 10, "null elements contribute zero")
    val short = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0, 5.0))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(short == 11.0, "mismatched lengths dot the common prefix")
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    val emb = Tables.embeddings(spark, sf)
    val plan = emb.select(dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n) Project" is the WholeStageCodegen marker in the plan string —
    // a CodegenFallback expression would print an unstarred Project
    assert(plan.contains("*(1) Project [graft_dot"),
      s"dot projection should live inside a WholeStageCodegen span:\n$plan")
  }
}
