package graft.core

import org.apache.spark.sql.DataFrame

/** Operator-scoped cache lifetime, made uniform (round-12 ADVICE class,
  * closed repo-wide in round 13): an operator that `persist()`s an
  * intermediate must not return a LAZY plan over it — the cache then
  * outlives the call and accumulates in a long-lived session until
  * ContextCleaner notices. The contract here is the
  * `minHashNearDupPairs` pattern: eagerly materialize the OPERATOR'S
  * OUTPUT (which is output-sized by design — blocks, labels, top-k,
  * pairs) via `localCheckpoint`, then release every persisted
  * intermediate immediately. Checkpoint blocks die with the returned
  * frame; cached frames don't. Same total work: the pipeline runs
  * exactly once either way, and the checkpoint also truncates lineage —
  * downstream plans stop re-analyzing the whole upstream pipeline.
  *
  * Operators whose persist IS deliberate cross-call state (a caller-
  * owned cache) must say so at the persist site instead of using this.
  */
object CacheScope {

  /** Materialize `out` eagerly, then unpersist `cached`. */
  def seal(out: DataFrame, cached: DataFrame*): DataFrame = {
    val m = out.localCheckpoint()
    cached.foreach(_.unpersist())
    m
  }
}
