package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cc] $l%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    (1 to 3).foreach { round =>
      System.err.println(s"[cc] ---- round $round ----")
      val ord = tbl("orders"); val li = tbl("lineitem")
      val edges = ord.select(
          concat(lit("order:"), col("o_orderkey")).as("s"),
          concat(lit("customer:"), col("o_custkey")).as("o"))
        .unionAll(li.select(
          concat(lit("lineitem:"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("s"),
          concat(lit("order:"), col("l_orderkey")).as("o")))
      val ranks = t("orderRanks+ckpt") { graft.ops.GraphOps.orderRanks(
          edges.select(col("s")).unionAll(edges.select(col("o").as("s"))))
        .localCheckpoint(true) }
      val enc = t("encode joins") { edges
        .join(ranks.select(col("node").as("s"), col("rk").as("srk")), Seq("s"))
        .join(ranks.select(col("node").as("o"), col("rk").as("ork")), Seq("o"))
        .select(col("srk").as("s"), col("ork").as("o")) }
      val cc = t("connectedComponents") { graft.ops.GraphOps.connectedComponents(enc) }
      t("decode+orderBy+count") {
        cc.join(ranks.select(col("rk").as("node"), col("node").as("nodeName")), Seq("node"))
          .join(ranks.select(col("rk").as("component"), col("node").as("compName")), Seq("component"))
          .select(col("nodeName").as("node"), col("compName").as("component"))
          .orderBy("node").collect().length
      }
    }
    spark.stop()
  }
}
