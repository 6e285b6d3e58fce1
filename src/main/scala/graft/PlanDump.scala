package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for the named queries into per-query
  * files — the before/after plan evidence the optimization rounds commit
  * under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query> [query ...]
  * writes <outDir>/<query>_<suffix>.txt for each.
  *
  * The session mirrors Bench's (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the dumped initial plans match what the bench
  * executes. Composite queries (lakehouse write paths) run their side
  * effects while the final frame is being built; the dump is the final
  * frame's plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val plan = fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
    TempTables.cleanupNow()
  }
}
