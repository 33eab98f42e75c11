package graft

// Throwaway profiling harness (not part of the engine API; excluded from
// the query surface). Times sub-plans of the LSH pipeline at a given sf.
object Scratch {
  import org.apache.spark.sql.functions._
  import graft.functions.TextFunctions._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = Tables.documents(spark, sfDir)
    val grams = shingles(col("text"), 2)
    val docs = df.select(col("doc_id").as("id"), array_distinct(grams).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("sig", minhashSignature(col("grams"), 16, xxHash))
      .persist()
    time("docs materialize (shingle+sig)")(docs.count())
    val banded = docs
      .select(col("id"), posexplode(bandKeys(col("sig"), 8, 2)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    time("banded")(banded.count())
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    time("cand")(cand.count())
    val verified = cand
      .join(docs.select(col("id").as("id1"), col("grams").as("g1")), "id1")
      .join(docs.select(col("id").as("id2"), col("grams").as("g2")), "id2")
      .select(col("id1"), col("id2"), round(jaccard(col("g1"), col("g2")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify")(verified.write.format("noop").mode("overwrite").save())
    time("full q20b (fresh)")(
      operators.TextQueries.q20bMinhashXxh(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
