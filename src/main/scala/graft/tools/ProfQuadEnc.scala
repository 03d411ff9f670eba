package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the q_quad_enc_modify gate: separates store open,
  * update script, and the final aggregate query. Run:
  *   GRAFT_PROF_UPDATE=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfQuadEnc"
  */
object ProfQuadEnc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof-q] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    (1 to sys.env.getOrElse("PROF_ROUNDS", "3").toInt).foreach { round =>
      System.err.println(s"[prof-q] ---- round $round ----")
      val (enc, dict) = t("open quadDatasetEnc") {
        graft.store.GraftStore.quadDatasetEnc(spark, sfDir)
      }
      if (round == 1) {
        System.err.println(s"[prof-q] enc plan nodes: " +
          enc.queryExecution.analyzed.collect { case n => n }.size)
        System.err.println(s"[prof-q] dict plan nodes: " +
          dict.queryExecution.analyzed.collect { case n => n }.size)
      }
      val (enc2, dict2) = t("update script") {
        graft.sparql.Sparql.updateQuadsEnc(spark, enc, dict,
          """WITH <graph:nation> DELETE { ?s <name> ?n } INSERT { ?s <name2> ?n }
            |WHERE { ?s <name> ?n } ;
            |DELETE WHERE { GRAPH <graph:region> { ?s <a> "Region" } } ;
            |INSERT { GRAPH ?g { ?s <audit> "seen" } }
            |WHERE { GRAPH ?g { ?s <a> "Supplier" } }""".stripMargin)
      }
      val res = t("compile query") {
        graft.sparql.Sparql.executeQuadsEncoded(spark, enc2, dict2,
          """SELECT ?g ?p (COUNT(?s) AS ?cnt) WHERE {
            |  GRAPH ?g { ?s ?p ?o }
            |  FILTER(?p IN ("name", "name2", "a", "audit"))
            |  FILTER(?g IN ("graph:nation", "graph:region", "graph:supplier"))
            |} GROUP BY ?g ?p ORDER BY ?g ?p""".stripMargin)
      }
      t("collect") { res.collect().length }
    }
    spark.stop()
  }
}
