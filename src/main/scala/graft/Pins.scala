package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle tracker for eager local checkpoints inside fixpoint loops.
  *
  * Iterative operators (path closures, blank-node closures, dictionary
  * repair) checkpoint each round to cut lineage; the superseded rounds'
  * blocks otherwise stay pinned in the block manager until a driver GC
  * lets ContextCleaner reap them — under a throughput collector that can
  * be a whole bench run, and the accumulated blocks eventually crowd the
  * old generation (observed as progressive slowdown late in long
  * many-query sessions). `Pins` makes the release explicit: `pin` tracks
  * each intermediate checkpoint, `seal` materializes the loop's final
  * result ONCE and then frees every tracked intermediate immediately.
  *
  * Only checkpoints that are truly superseded may be released — a
  * checkpointed RDD has no lineage to recompute from — which is exactly
  * the contract `seal` enforces by materializing the result first.
  */
final class Pins {
  private val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Eagerly checkpoint `df` and track it for later release. */
  def pin(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    tracked += c
    c
  }

  /** Track an already-checkpointed frame for release. */
  def track(df: DataFrame): DataFrame = { tracked += df; df }

  /** Materialize `result` into its own (untracked) checkpoint, then free
    * every tracked intermediate. The returned frame owns its blocks and
    * no longer references any released one.
    */
  def seal(result: DataFrame): DataFrame = {
    val out = result.localCheckpoint(true)
    release()
    out
  }

  /** Free all tracked checkpoints (callers must not use them afterwards). */
  def release(): Unit = {
    tracked.foreach(Pins.unpin)
    tracked.clear()
  }
}

object Pins {
  /** Drop the block-manager blocks behind an eager local checkpoint.
    * A checkpointed Dataset's plan is a `LogicalRDD` over the materialized
    * RDD; anything else is left alone (nothing to free).
    */
  def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Is this frame already a materialized checkpoint? */
  def isPinned(df: DataFrame): Boolean =
    df.queryExecution.analyzed.isInstanceOf[LogicalRDD]
}
