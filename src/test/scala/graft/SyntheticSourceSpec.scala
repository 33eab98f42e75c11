package graft

import java.nio.file.Files
import graft.sources.SyntheticSource

/** Generator parity: schema, determinism, file-count and null-fraction
  * behavior (reference: generate_data.py:27-95; batch arithmetic cases
  * from tests/test_parquet.py:84-123 map to partition counts). */
class SyntheticSourceSpec extends SparkSpec {

  test("schema matches the reference (generate_data.py:27-34)") {
    val df = SyntheticSource.generate(spark, 10, 1)
    assert(df.columns.toSeq == Seq("_id", "feature_1", "feature_2", "feature_3", "feature_4", "score"))
    assert(df.schema("_id").dataType.typeName == "string")
    assert(df.schema("score").dataType.typeName == "double")
  }

  test("ids are UUID-shaped, unique, and deterministic under a seed") {
    val a = SyntheticSource.generate(spark, 100, 2, seed = 5).collect()
    val b = SyntheticSource.generate(spark, 100, 2, seed = 5).collect()
    val ids = a.map(_.getAs[String]("_id"))
    assert(ids.distinct.length == 100)
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("file count follows nFiles (one file per batch, generate_data.py:71-81)") {
    val dir = Files.createTempDirectory("graft_gen").toString
    SyntheticSource.write(SyntheticSource.generate(spark, 1000, 4), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("nullFraction nulls only nullable feature columns, never key or score") {
    val df = SyntheticSource.generate(spark, 2000, 2, seed = 9, nullFraction = 0.3)
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("_id").isNull).count() == 0)
    assert(df.filter(col("score").isNull).count() == 0)
    val f1Nulls = df.filter(col("feature_1").isNull).count()
    assert(f1Nulls > 300 && f1Nulls < 900) // ~30%
  }
}
