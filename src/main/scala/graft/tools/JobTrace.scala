package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run one gate and print every Spark job's callsite — the
  * job-floor profiler behind the maintenance-gate batching work
  * (jobs × scheduling latency IS the driver floor, so knowing which
  * call pays each job is the whole optimization).
  *
  *   SPARK_GRAFT_GATE=q_owl_haskey_delta sbt "runMain graft.tools.JobTrace"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val gate = sys.env.getOrElse("SPARK_GRAFT_GATE", "q_owl_haskey_delta")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60min")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val execSite = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    var tracing = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(
            e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val frame = s.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("JobTrace"))
              .getOrElse(s.description.take(80)).trim
            execSite.put(s.executionId.toString, frame)
          case _ => ()
        }
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (tracing) {
            total.incrementAndGet()
            val eid = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            val root = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id")))
            val site = root.orElse(eid)
              .flatMap(id => Option(execSite.get(id))).getOrElse("?")
            val sub = if (root.exists(r => !eid.contains(r))) " [sub]" else ""
            counts.merge(site + sub, 1L, (a, b) => a + b)
          }
      })
    val fn = graft.SparkEntry.queries(gate)
    fn(spark, dir).collect() // warm (artifacts build here)
    sys.props("graft.pins.trace") = "1"
    graft.ops.ReasonOps.pinLabelCounts.clear()
    tracing = true
    fn(spark, dir).collect()
    Thread.sleep(300)
    tracing = false
    import scala.jdk.CollectionConverters._
    println(s"== $gate warm-run jobs: ${total.get()} ==")
    counts.asScala.toSeq.sortBy(-_._2).foreach { case (cs, n) =>
      println(f"$n%5d  $cs")
    }
    println("== pinCapped calls by label ==")
    graft.ops.ReasonOps.pinLabelCounts.asScala.toSeq
      .sortBy(-_._2.longValue).foreach { case (w, n) =>
        println(f"${n.longValue}%5d  $w")
      }
    spark.stop()
  }
}
