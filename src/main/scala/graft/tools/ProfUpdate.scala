package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the q_sparql_update gate: times each update operation
  * and the final audit aggregate separately (the bench only sees the
  * total). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfUpdate"
  */
object ProfUpdate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CONSTRAINTS", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-phase job accounting: how many Spark jobs each op launches and
    // how much wall time they cover (the rest is driver-side planning)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) { jobs.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - s) }
      }
    })
    def t[A](label: String)(f: => A): A = {
      val (j0, n0) = (jobs.get(), jobNanos.get())
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  jobs=${jobs.get() - j0}%3d jobTime=${(jobNanos.get() - n0) / 1e9}%6.2f s")
      r
    }
    val st = t("ingest (forDir)") { graft.store.GraftStore.forDir(spark, sfDir) }
    System.err.println(s"[prof] triples parts=${st.triples.rdd.getNumPartitions} " +
      s"enc parts=${st.enc.rdd.getNumPartitions} dict parts=${st.dict.rdd.getNumPartitions}")
    t("raw enc count") { st.enc.count() }
    t("raw triples count") { st.triples.count() }
    t("raw dict count") { st.dict.count() }
    (1 to sys.env.getOrElse("PROF_ROUNDS", "2").toInt).foreach { round =>
      System.err.println(s"[prof] ---- round $round ----")
      var h = st
      h = t("op1 DELETE WHERE") { graft.sparql.Sparql.update(spark, h,
        """PREFIX : <>
          |DELETE WHERE { ?s :orderstatus "P" }""".stripMargin) }
      h = t("op2 INSERT..WHERE") { graft.sparql.Sparql.update(spark, h,
        """PREFIX : <>
          |INSERT { ?s :bulk "true" } WHERE { ?s :a "Order" . ?s :orderpriority "1-URGENT" }""".stripMargin) }
      h = t("op3+4 ground batch") { graft.sparql.Sparql.update(spark, h,
        """PREFIX : <>
          |DELETE DATA { <region:0> :name "AFRICA" } ;
          |INSERT DATA { <region:99> :a "Region" . <region:99> :name "ATLANTIS" }""".stripMargin) }
      t("final audit agg") {
        h.triples.groupBy("p")
          .agg(count(lit(1)).as("cnt"), countDistinct(col("s")).as("n_subj"))
          .orderBy("p").count()
      }
    }
    spark.stop()
  }
}
