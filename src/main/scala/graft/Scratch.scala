package graft

// Throwaway profiling harness (not part of the engine API; excluded from
// the query surface). Times sub-plans of the hot dedup pipelines at a
// given sf so optimization targets the real bottleneck stage.
object Scratch {
  import org.apache.spark.sql.functions._
  import org.apache.spark.storage.StorageLevel
  import graft.functions.TextFunctions._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // q19 prefix-filter pipeline stages
    val df = Tables.documents(spark, sfDir)
    val threshold = 0.95
    val base = df.select(col("doc_id").as("id"),
        array_distinct(tokens(col("text"))).as("grams"), col("source").as("blk"))
      .filter(size(col("grams")) > 0)
      .withColumn("sz", size(col("grams")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("q19 base materialize")(base.count())
    val ex = base.select(col("id"), col("blk"), col("sz"), explode(col("grams")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    time("q19 dfreq")(dfreq.count())
    val ordered = ex.join(dfreq, "g")
      .groupBy("id", "blk", "sz")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("og"))
    time("q19 ordered")(ordered.write.format("noop").mode("overwrite").save())
    val plen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val pref = ordered.select(col("id"), col("blk"), col("sz"),
      explode(slice(transform(col("og"), s => s.getField("g")), lit(1), plen)).as("pg"))
    val cand = pref.alias("a")
      .join(pref.alias("b"),
        col("a.pg") === col("b.pg") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) >=
            ceil(greatest(col("a.sz"), col("b.sz")) * threshold))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    time("q19 cand")(println("[scratch] cand rows: " + cand.count()))
    time("q19 full")(operators.TextQueries.q19NgramJaccard(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("q20b full (xx two-level)")(operators.TextQueries.q20bMinhashXxh(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("q23 full (6-bit bands)")(operators.SimilarityQueries.q23AnnSrp(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
