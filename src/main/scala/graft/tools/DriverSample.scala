package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r19): sample all JVM stacks every 20 ms while one
  * query runs warm, tally RUNNABLE frames by package bucket — answers
  * "where does the wall time OUTSIDE job execution go" (optimizer?
  * codegen? AQE replanning? scheduler?) without an external profiler.
  */
object DriverSample {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "q136_curation_builder")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(qname)
    fn(spark, sfDir).count() // warm
    System.gc()
    val tally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    def bucket(tn: String, st: Array[StackTraceElement]): Option[String] = {
      if (tn.startsWith("Executor task launch")) return Some("TASK_EXEC")
      val s = st.map(_.getClassName)
      def has(p: String) = s.exists(_.contains(p))
      if (has("janino") || has("CodeGenerator")) Some("CODEGEN")
      else if (has("catalyst.optimizer") || has("RuleExecutor")) Some("OPTIMIZER")
      else if (has("catalyst.analysis")) Some("ANALYZER")
      else if (has("QueryPlanningTracker") || has("QueryExecution")) Some("PLANNING_OTHER")
      else if (has("AdaptiveSparkPlanExec")) Some("AQE_DRIVER")
      else if (has("DAGScheduler") || has("TaskSchedulerImpl")) Some("SCHEDULER")
      else if (has("parquet")) Some("PARQUET_META")
      else if (has("TreeNode") || has("catalyst")) Some("CATALYST_MISC")
      else if (has("graft.")) Some("GRAFT_DRIVER")
      else None
    }
    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty)
            bucket(t.getName, st).foreach { b =>
              tally.merge(b, 1, (a: Integer, x: Integer) => a + x)
              if (b == "GRAFT_DRIVER" || b == "PLANNING_OTHER") {
                // representative frame: deepest graft frame, else top 3
                val g = st.find(_.getClassName.startsWith("graft."))
                  .map(e => s"${e.getClassName}.${e.getMethodName}:${e.getLineNumber}")
                  .getOrElse(st.take(3).map(e =>
                    s"${e.getClassName.split("\\.").last}.${e.getMethodName}").mkString("<-"))
                frames.merge(s"$b $g", 1, (a: Integer, x: Integer) => a + x)
              }
            }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(100)
    println(f"TOTAL $total%.2f s  (samples every 20ms => 1 sample ~ 0.02 thread-s)")
    val rows = scala.jdk.CollectionConverters.MapHasAsScala(tally).asScala.toSeq
      .sortBy(-_._2.toInt)
    rows.foreach { case (b, n) => println(f"$b%-16s ${n.toInt * 0.02}%7.2f thread-s ($n samples)") }
    println("-- top frames --")
    scala.jdk.CollectionConverters.MapHasAsScala(frames).asScala.toSeq
      .sortBy(-_._2.toInt).take(20)
      .foreach { case (f, n) => println(f"${n.toInt * 0.02}%6.2f  $f") }
    spark.stop()
  }
}
