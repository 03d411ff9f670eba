// Lives in Spark's execution package to reach the private[sql] Dataset
// constructor — the standing technique for engine-level extensions that
// the public surface doesn't cover (same access level a custom
// SparkStrategy compiles against).
package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Workaround for a Spark 4.1 constraint-propagation defect observed on
  * self-joined UNIONS of eager local checkpoints:
  *
  * `Dataset.localCheckpoint` builds a `LogicalRDD` whose
  * `originConstraints` snapshot the source plan's constraints. When a
  * later self-join forces `DeduplicateRelations` to `newInstance()` the
  * node, the snapshot keeps the OLD expression ids, and
  * `UnionBase.rewriteConstraints` — which maps every child-constraint
  * attribute through the child's CURRENT output — dies with
  * `key not found: o#N`.
  *
  * `stripOriginConstraints` rebuilds the checkpointed node with no origin
  * constraints (they are an optimizer hint, never a correctness input);
  * origin statistics are dropped with them — AQE re-derives sizes at
  * runtime, and every small-side join in this codebase carries an
  * explicit broadcast hint anyway.
  */
object CleanCheckpoint {
  def stripOriginConstraints(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(spark,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(spark, None, None))
      case _ => df
    }
}
