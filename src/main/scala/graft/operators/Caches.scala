package graft.operators

/** Bounded LRU maps for the session-lifetime operator memos (fitted
  * models, index handles, layout paths). A long-lived driver mints
  * fresh layouts/models across many corpora; an unbounded
  * ConcurrentHashMap never lets those entries die. Eviction is always
  * SAFE here — every cached value is recomputable (a model re-trains,
  * a layout re-writes, a parquet handle re-resolves) — so a small
  * access-ordered LRU gives the same warm-path amortization with a
  * hard memory ceiling.
  *
  * `Collections.synchronizedMap` keeps `computeIfAbsent` atomic (the
  * wrapper synchronizes default methods on itself), preserving the
  * one-writer-per-key contract the layout writers rely on; callers
  * that iterate a view (e.g. invalidation sweeps) must synchronize on
  * the returned map, per the wrapper's contract.
  */
private[graft] object Caches {
  def lru[K, V](maxEntries: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > maxEntries
      })
}
