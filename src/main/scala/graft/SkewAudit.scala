package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** RUNTIME per-key-skew audit over every declared query (r17 verdict
  * item 3) — the dynamic companion to PlanSpec's structural gate. The
  * structural gate catches GLOBAL windows and 1-partition exchanges, but
  * a window partitioned by a low-cardinality column looks healthy in the
  * plan and still funnels half the corpus through one task (how
  * q_pack_bins shipped in r17). Only the RUNTIME task census sees that:
  * a Spark listener records shuffle-read rows per task, and any stage
  * whose max/mean ratio exceeds [[FlagRatio]] is per-key skew by
  * definition — the rows went through one reducer that its siblings
  * didn't get.
  *
  * Run at a SCALED sf dir (the round battery's sfscale5) where real key
  * distributions exist:
  *   runMain graft.SkewAudit /tmp/sfscale5 skew_audit.json [query ...]
  *
  * Stages below [[MinRows]] total shuffle rows or [[MinTasks]] tasks are
  * ignored (constant-scale metadata stages jitter wildly and cannot
  * hurt at 100 TB). AQE runs under the same audit, so skew it already
  * splits (skew-join) rightly passes — the audit flags what REACHES the
  * tasks. Documented demonstrators are allowlisted with justifications,
  * PlanSpec-style.
  */
object SkewAudit {

  /** max/mean shuffle-read rows per task within one stage above which the
    * stage counts as per-key skew. With 32 shuffle partitions a perfectly
    * hot single key shows ~32 (everything in one task); healthy hash
    * distributions measure < 3. 16 sits far above hash noise while
    * catching any shape where one task carries what should be a
    * partition-count's worth of siblings' work.
    */
  val FlagRatio = 16.0
  /** Second, AQE-robust flag: one task carrying over half a qualifying
    * stage's rows is per-key skew no matter how the sibling partitions
    * were coalesced — AQE merges the SMALL partitions around a hot one,
    * which shrinks the task count and can pull max/mean under
    * [[FlagRatio]] while the hot task still serializes the stage.
    */
  val MaxShare = 0.5
  // overridable floors (the committed defaults are the audit's contract;
  // the hooks exist for the spec and for smoke-testing the listener
  // plumbing at toy scale where no stage reaches 50k shuffle rows)
  private[graft] var MinRows: Long =
    sys.env.get("SPARK_GRAFT_SKEW_MIN_ROWS").map(_.toLong).getOrElse(50000L)
  private[graft] var MinTasks: Int =
    sys.env.get("SPARK_GRAFT_SKEW_MIN_TASKS").map(_.toInt).getOrElse(8)

  /** Queries whose flagged stage is the documented point, not a hazard. */
  val allow: Map[String, String] = Map(
    // deliberate BNLJ demonstrator (SURVEY §2.2): kept as the contrast
    // case for q_join_range_binned/auto, which are its linear twins
    "q_join_range" -> "by-design BroadcastNestedLoop demonstrator",
    // the skew CENSUS itself: its 16 md5-prefix buckets are uniform by
    // construction, but the final 16-row census rides one tiny stage
    // whose per-task rows are the bucket counts being measured
    "q_partition_skew" -> "the skew census's own 16-bucket measurement")

  /** Attribution is by TIME WINDOW, not job group: queries run strictly
    * sequentially and the listener resets between them, so every stage
    * recorded during a query's window belongs to it. (Job-group
    * properties are unreliable here — AQE materializes child stages from
    * a shared thread pool whose inherited properties can be stale.)
    */
  private final class Listener extends SparkListener {
    val stageRows = TrieMap.empty[Int, ArrayBuffer[Long]]
    override def onJobStart(js: SparkListenerJobStart): Unit = ()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        stageRows.getOrElseUpdate(te.stageId, ArrayBuffer.empty).synchronized {
          stageRows(te.stageId) += m.shuffleReadMetrics.recordsRead
        }
    }
    def reset(): Unit = stageRows.clear()
    /** Worst stage by max-task share: (ratio, share, stageId, maxRows,
      * tasks) across the recorded qualifying stages.
      */
    def worst(): Option[(Double, Double, Int, Long, Int)] =
      stageRows.toSeq.flatMap { case (sid, rows0) =>
        val rows = rows0.synchronized(rows0.toVector)
        val total = rows.sum
        if (rows.size < MinTasks || total < MinRows) None
        else {
          val mean = total.toDouble / rows.size
          Some((rows.max / mean, rows.max.toDouble / total, sid, rows.max,
            rows.size))
        }
      }.sortBy(-_._2).headOption
  }

  /** One measured body under a fresh listener — the spec-facing probe
    * (the r17-shape regression pin drives it directly).
    */
  private[graft] def measureWorst(spark: SparkSession)(body: => Unit)
      : Option[(Double, Double, Int, Long, Int)] = {
    val l = new Listener
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(300); l.worst() }
    finally spark.sparkContext.removeSparkListener(l)
  }

  private[graft] def flags(w: Option[(Double, Double, Int, Long, Int)]): Boolean =
    w.exists { case (ratio, share, _, _, _) =>
      ratio > FlagRatio || share > MaxShare
    }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val outPath = if (args.length > 1) args(1) else "skew_audit.json"
    val subset = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // measure the DECLARED partitioning's key distribution: AQE's
      // partition coalescing merges the small siblings around a hot task
      // (or the whole small stage into one task), which hides the skew
      // signal that matters at 100 TB — where no coalescing rescues a
      // hot key. Skew-join splitting etc. stay on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new Listener
    spark.sparkContext.addSparkListener(listener)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.isEmpty || subset.contains(n) }
    val results = named.map { case (name, fn) =>
      listener.reset()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.getMessage) }
      // the listener drains asynchronously; give the last task events a beat
      Thread.sleep(100)
      val w = listener.worst()
      System.err.println(f"[skew] $name ratio=${w.map(_._1).getOrElse(0.0)}%.1f share=${w.map(_._2).getOrElse(0.0)}%.2f" +
        err.map(e => s" ERROR: ${e.take(80)}").getOrElse(""))
      (name, w, err)
    }
    val flagged = results.collect {
      case (n, w, _) if flags(w) && !allow.contains(n) =>
        n -> w.get._2
    }
    def esc(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qjson = results.map { case (n, w, err) =>
      val body = w match {
        case Some((r, share, sid, mx, tasks)) =>
          f"""{"worst_ratio":$r%.2f,"max_share":$share%.3f,"stage":$sid,"max_task_rows":$mx,"tasks":$tasks${err.map(e => s""","error":${esc(e.take(120))}""").getOrElse("")}}"""
        case None =>
          s"""{"worst_ratio":null${err.map(e => s""","error":${esc(e.take(120))}""").getOrElse("")}}"""
      }
      s"${esc(n)}:$body"
    }.mkString("{", ",", "}")
    val fjson = flagged.map { case (n, r) => f"${esc(n)}:$r%.2f" }.mkString("{", ",", "}")
    val ajson = allow.toSeq.sortBy(_._1)
      .map { case (n, why) => s"${esc(n)}:${esc(why)}" }.mkString("{", ",", "}")
    val line = s"""{"sf":${esc(sfDir)},"flag_ratio":$FlagRatio,"max_share":$MaxShare,"flagged":$fjson,"allowlisted":$ajson,"queries":$qjson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"""{"skew_flagged":${flagged.size},"out":${esc(outPath)}}""")
    spark.stop()
    TempTables.cleanupNow()
  }
}
