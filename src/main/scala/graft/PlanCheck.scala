package graft

/** Plan-quality audit: prints, for each declared query, the number of
  * whole-stage-codegen spans, exchanges (shuffles), broadcast joins, and
  * the pushed filters / read schemas reaching the parquet scans. Run:
  *   sbt "runMain graft.PlanCheck [sfDir] [q1,q2,...]"
  * This is the review loop for 100 TB readiness: a scan reading all
  * columns for a two-column projection, or a filter that fails to reach
  * the scan, shows up here before it shows up as a bottleneck.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = Tables.localSession(8)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // collect() runs THIS df's own QueryExecution (a noop write or
          // foreach would spawn a fresh plan and leave df's AQE plan
          // provisional, isFinalPlan=false), so the final plan and its
          // whole-stage-codegen *(N) annotations are real. Gate results
          // are small at audit SFs.
          df.collect()
          // the finalized AQE tree appends "== Initial Plan ==" — drop it
          // or every operator double-counts
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          val codegen = """\*\(\d+\)""".r.findAllIn(plan).map(identity).toSet.size
          val exchanges = "Exchange".r.findAllIn(plan).length
          val bcast = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          val scans = "FileScan".r.findAllIn(plan).length
          println(f"$name%-22s codegenSpans=$codegen%-3d exchanges=$exchanges%-3d broadcast=$bcast%-2d scans=$scans%-3d scansWithPushedFilters=$pushed")
        } catch {
          case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}")
        }
      }
    spark.stop()
  }
}
