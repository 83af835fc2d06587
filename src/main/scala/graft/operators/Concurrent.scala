package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-side fork/join for INDEPENDENT durable-state advances.
  *
  * Spark's scheduler accepts jobs from any number of driver threads,
  * so materializers whose states live under different roots (the
  * replica, the rollup, and each join-view side of the chained CDC→IVM
  * pipeline) can overlap their fixed per-epoch costs — the touched-
  * bucket probe job, the parquet commit, the ledger I/O — instead of
  * paying them serially. On a near-empty steady epoch that fixed cost
  * IS the epoch time, so the overlap is the difference between a
  * cadence bounded by the SLOWEST advance and one bounded by the SUM
  * of all eight (r9 verdict item 1).
  *
  * Only for mutually independent work: two advances of the SAME state
  * dir would race the single-writer ledger protocol. Exceptions
  * propagate to the awaiting thread (first failure rethrown after all
  * complete). The active session is re-pinned inside each task —
  * worker threads don't inherit the caller's thread-locals.
  */
object Concurrent {
  import scala.concurrent.{Await, ExecutionContext, Future}
  import scala.concurrent.duration.Duration

  def all[T](spark: SparkSession)(thunks: (() => T)*): Seq[T] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = thunks.map { t =>
      Future {
        SparkSession.setActiveSession(spark)
        t()
      }
    }
    fs.map(f => Await.result(f, Duration.Inf))
  }

  def both[A, B](spark: SparkSession)(a: => A, b: => B): (A, B) = {
    val r = all[Any](spark)(() => a, () => b)
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
