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

  private def isectCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  test("sorted intersect size equals size(array_intersect) on sorted random sets") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val a = (1 to rng.nextInt(40)).map(_ => s"t${rng.nextInt(60)}").distinct.sorted
      val b = (1 to rng.nextInt(40)).map(_ => s"t${rng.nextInt(60)}").distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("x"))) :+ ((Seq.empty[String], Seq.empty[String]))
    val diff = rows.toDF("a", "b")
      .select(isectCol(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0, "merge-count must agree with array_intersect on sorted distinct input")
    // null elements (array_sort places them last) end the merge, no crash
    val withNull = Seq((Seq("a", "b", null), Seq("a", "c", null)))
      .toDF("a", "b")
      .select(isectCol(col("a"), col("b")).as("n")).collect()(0).getInt(0)
    assert(withNull == 1, "nulls never match and must not crash the kernel")
  }

  test("graft_sorted_intersect_size: SQL resolution, codegen span, analysis-time typing") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    df.createOrReplaceTempView("isect_probe")
    val viaSql = spark.sql(
      "SELECT graft_sorted_intersect_size(x, y) AS n FROM isect_probe")
      .collect()(0).getInt(0)
    assert(viaSql == 2)
    // non-foldable input (a literal frame constant-folds to LocalTableScan)
    val toks = Tables.documents(spark, sf)
      .select(sort_array(split(col("text"), " ")).as("t"))
    val plan = toks.select(isectCol(col("t"), col("t")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_sorted_intersect_size") &&
      plan.contains("*(1) Project"),
      s"intersect kernel should live inside a WholeStageCodegen span:\n$plan")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sorted_intersect_size(array(1, 2), array(2))").collect()
    }
    assert(err.getMessage.contains("array<string>"),
      "non-string arrays must fail analysis, not crash at runtime")
  }
}
