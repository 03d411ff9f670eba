package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured crossover for cross-chain-feed retraction: on the
  * q_owl_xchain_del fixture (custRegion ⊒ cn∘nr feeding custWorld ⊒
  * custRegion∘inWorld), time the STRATIFIED Δ path
  * ([[graft.ops.ReasonOps.owlRetract]]) against the r13 fallback —
  * RE-MATERIALIZING the remaining base ([[graft.ops.ReasonOps.owlClosure]]
  * of base − Δ) — across delete rates. The Δ path's cost is a
  * rate-independent job floor plus Δ-sized probes; the re-materialize
  * cost is one full closure regardless of rate, so the printed table
  * IS the crossover evidence SURVEY cites (r13 carried the analytic
  * argument only).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ChainCrossover"
  *
  * One JSON line per (rate, path): {"rate":..,"path":"delta|remat",
  * "sec":..,"delRows":..}. min of SPARK_GRAFT_REPEAT (default 2) runs.
  */
object ChainCrossover {
  def main(args: Array[String]): Unit = {
    import graft.ops.ReasonOps
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.cleaner.periodicGC.interval", "60min")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    def t(name: String) = graft.Tables.loadPar(spark, dir, name)
    val cu = t("customer"); val na = t("nation"); val re = t("region")
    val ck = concat(lit("customer:"), col("c_custkey"))
    val nk = concat(lit("nation:"), col("n_nationkey"))
    val rk = concat(lit("region:"), col("r_regionkey"))
    val tbox = spark.createDataFrame(Seq(
      ("custRegion", ReasonOps.PropertyChainAxiom, "_:x0"),
      ("_:x0", ReasonOps.RdfFirst, "cn"),
      ("_:x0", ReasonOps.RdfRest, "_:x1"),
      ("_:x1", ReasonOps.RdfFirst, "nr"),
      ("_:x1", ReasonOps.RdfRest, ReasonOps.RdfNil),
      ("custWorld", ReasonOps.PropertyChainAxiom, "_:x2"),
      ("_:x2", ReasonOps.RdfFirst, "custRegion"),
      ("_:x2", ReasonOps.RdfRest, "_:x3"),
      ("_:x3", ReasonOps.RdfFirst, "inWorld"),
      ("_:x3", ReasonOps.RdfRest, ReasonOps.RdfNil))).toDF("s", "p", "o")
    val base = cu.select(ck.as("s"), lit("cn").as("p"),
        concat(lit("nation:"), col("c_nationkey")).as("o"))
      .unionAll(na.select(nk.as("s"), lit("nr").as("p"),
        concat(lit("region:"), col("n_regionkey")).as("o")))
      .unionAll(re.select(rk.as("s"), lit("inWorld").as("p"),
        lit("world").as("o")))
      .unionAll(tbox)
      .localCheckpoint(true)
    val closure = ReasonOps.owlClosure(base).localCheckpoint(true)
    // delete rates: fraction of customers whose cn edge goes
    for (mod <- Seq(10000L, 1000L, 100L, 7L)) {
      val del = cu.where(col("c_custkey") % mod === 0)
        .select(ck.as("s"), lit("cn").as("p"),
          concat(lit("nation:"), col("c_nationkey")).as("o"))
        .localCheckpoint(true)
      val n = del.count()
      def time(what: String)(f: => Unit): Unit = {
        var best = Double.MaxValue
        for (_ <- 1 to repeat) {
          System.gc()
          val t0 = System.nanoTime()
          f
          val s = (System.nanoTime() - t0) / 1e9
          if (s < best) best = s
        }
        println(f"""{"rate":"1/$mod","path":"$what","sec":$best%.2f,"delRows":$n}""")
      }
      time("delta") {
        ReasonOps.owlRetract(closure, base, del, tbox).count()
        require(!ReasonOps.lastRetractRematerialized.get(),
          "expected the stratified delta path")
      }
      time("remat") {
        val probe = del.toDF("__xs", "__xp", "__xo")
        val baseRem = base.join(broadcast(probe),
          col("s") === col("__xs") && col("p") === col("__xp") &&
            col("o") === col("__xo"), "left_anti")
        ReasonOps.owlClosure(baseRem).count()
      }
    }
    spark.stop()
  }
}
