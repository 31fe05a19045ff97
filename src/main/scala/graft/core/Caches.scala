package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifecycle for intra-operator caches.
  *
  * Several operators materialize an intermediate that their own plan
  * references more than once (LSH bands, covis distinct projections,
  * prefix subtrees): without `.cache()` the subtree re-runs per
  * reference. But a bare `.cache()` pins executor memory until the
  * session dies — fine for one query, creeping pressure for a
  * long-lived service running thousands (LRU eviction masks it at the
  * cost of eviction churn).
  *
  * `Caches.cache(df)` behaves exactly like `df.cache()` when no scope
  * is active (library default: the caller owns the lifecycle, as with
  * `Dataset.cache` itself). Inside `Caches.withScope { ... }` every
  * cache CREATED by the block is unpersisted when the block exits —
  * after the consuming action, so harness loops (`Verify`, `Bench`)
  * leave no lingering `InMemoryRelation` per query.
  *
  * A plan that is ALREADY cached when `cache(df)` is called is NOT
  * adopted by the scope — whoever created that entry owns it. This
  * lets a harness pin genuinely shared tables (e.g. the sessionized
  * events every query reads) outside the per-query scopes and keep
  * cross-query reuse, while operator-local intermediates come and go
  * with their query.
  *
  * Scopes nest (innermost wins) and are thread-confined: plan
  * construction happens on the calling thread, so a ThreadLocal stack
  * is sufficient and concurrent harness threads never share scopes.
  */
object Caches {

  final class Scope private[Caches] () {
    private[Caches] val owned = ArrayBuffer.empty[DataFrame]
  }

  private val active = new ThreadLocal[List[Scope]] {
    override def initialValue: List[Scope] = Nil
  }

  /** `df.cache()`, registered with the innermost active scope iff this
    * call is what created the cache entry.
    */
  def cache(df: DataFrame): DataFrame = {
    // an ALREADY-cached plan is returned as-is (whoever cached it owns
    // it — the adoption rule) without re-asking the CacheManager, which
    // would log a spurious "already cached" warning per call
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val out = df.cache()
      active.get.headOption.foreach(_.owned += out)
      out
    }
  }

  /** [[cache]] + eager materialization (a count over the cached frame
    * fills every partition before returning). Required whenever the
    * cached frame fans out into 2+ BROADCAST exchanges: broadcast
    * builds run on concurrent threads and race past a LAZY cache
    * entry, recomputing the subtree once per broadcast (the q227
    * rule). A support table consumed by a cumsum, a totals broadcast,
    * and a threshold broadcast is exactly that shape — materialize it
    * once, then every consumer reads the InMemoryRelation.
    */
  def materialized(df: DataFrame): DataFrame = {
    val out = cache(df)
    out.count()
    out
  }

  /** Run `f`; unpersist every cache created via [[cache]] inside it.
    * Non-blocking unpersist: block cleanup proceeds asynchronously.
    */
  def withScope[A](f: => A): A = {
    val s = new Scope
    active.set(s :: active.get)
    try f
    finally {
      active.set(active.get.tail)
      s.owned.foreach(_.unpersist(blocking = false))
      s.owned.clear()
    }
  }
}
