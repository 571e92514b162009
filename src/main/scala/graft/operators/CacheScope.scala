package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic lifecycle for the DataFrames an operator persists.
  *
  * The dedup/similarity operators cache intermediates (shingle sets,
  * signatures, capped bucket sets) that feed multiple consumers of one
  * query plan. Inside Bench/Verify the harness's `clearCache()` between
  * queries releases them; a library consumer composing operators in a
  * long-lived session owns the lifecycle instead: pass a fresh scope,
  * materialize the result, then `release()` (r3 advice — without it the
  * session accumulates cached partitions unbounded).
  *
  * The default [[CacheScope.sessionManaged]] persists without tracking —
  * exactly the old behavior, released by `spark.catalog.clearCache()`.
  */
final class CacheScope private[operators] (track: Boolean) {
  private val held = scala.collection.mutable.ListBuffer.empty[DataFrame]

  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist()
    if (track) synchronized { held += df }
    df
  }

  /** Unpersist every DataFrame this scope's operators cached. Idempotent. */
  def release(): Unit = synchronized {
    held.foreach(_.unpersist(blocking = false))
    held.clear()
  }

  /** Number of currently-held cached DataFrames (diagnostics/tests). */
  def heldCount: Int = synchronized(held.size)
}

object CacheScope {
  /** A tracking scope — the caller promises to call `release()`. */
  def apply(): CacheScope = new CacheScope(true)

  /** Persist-only (no tracking): cache lifetime is the session's, released
    * by `clearCache()` — the Bench/Verify harness contract. */
  val sessionManaged: CacheScope = new CacheScope(false)
}
