package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling entry (Test scope): times each stage of the minhash
  * pipeline separately. Run: sbt "Test/runMain graft.ProfileMinhash <sfDir>"
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = Tables(spark, dir, "documents")
    time("warmup count")(docs.count())
    val bands = queries.SimilarityQueries.minhashBands(docs)
    time("minhashBands")(bands.write.format("noop").mode("overwrite").save())
    val cands = bands.as("x")
      .join(bands.as("y"), Seq("band", "bandHash"))
      .filter(org.apache.spark.sql.functions.col("x.doc_id") <
        org.apache.spark.sql.functions.col("y.doc_id"))
    time("cands")(cands.write.format("noop").mode("overwrite").save())
    val full = SparkEntry.queries("q_dedup_minhash")
    time("full query")(full(spark, dir).write.format("noop").mode("overwrite").save())
    time("full query again")(full(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
