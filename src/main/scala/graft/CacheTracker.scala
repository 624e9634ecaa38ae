package graft

import org.apache.spark.sql.Dataset

import scala.collection.mutable.ArrayBuffer

/** Registry for operator-result caches that must outlive the operator call
  * (model-based ops persist their small output so returning it doesn't
  * re-run the fit/probe chain) but not the session.
  *
  * Contract: operators register such caches via [[track]]; the harness
  * (Verify/Bench — or any caller embedding an operator in a longer job)
  * calls [[releaseAll]] once it has consumed the result. Without this the
  * executor block manager pins every result cache for the session
  * lifetime when operators are called repeatedly.
  */
object CacheTracker {
  private val live = ArrayBuffer.empty[Dataset[_]]

  def track[T](ds: Dataset[T]): Dataset[T] = synchronized { live += ds; ds }

  def releaseAll(): Unit = synchronized {
    live.foreach(ds => try ds.unpersist() catch { case _: Throwable => () })
    live.clear()
  }
}
