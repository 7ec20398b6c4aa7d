package graft.operators

/** Session memo for PERSISTED index layouts — the storage-side face of
  * [[Ann.buildCached]] / [[Fts.buildCached]]: an index layout is an
  * offline artifact, written once and probed many times (reference:
  * store.py:274 builds its IVF_PQ index once per table, not per
  * `search` call). Keyed by a caller-chosen string naming
  * (corpus, layout kind, params); the value is the layout's root path.
  *
  * The write runs inside `computeIfAbsent`, so concurrent probes of the
  * same key wait for one writer instead of racing two layouts. Temp
  * dirs are reaped on JVM exit.
  */
object LayoutCache {
  private val cache = Caches.lru[String, String](128)

  /** Return the memoized layout path for `key`, writing it first (into
    * a fresh temp dir) on first use.
    */
  def getOrWrite(key: String)(write: String => Unit): String =
    cache.computeIfAbsent(
      key,
      _ => {
        val p = graft.streaming.StreamPipeline
          .deleteRecursivelyOnExit(java.nio.file.Files.createTempDirectory("graft_layout_"))
          .resolve("idx").toString
        write(p)
        p
      }
    )
}
