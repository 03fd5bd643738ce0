package graft.ops

import scala.collection.concurrent.TrieMap

/** A tiny bounded memo with the one eviction rule every cache in this
  * package must share: evict only when INSERTING a new key into a full
  * memo — a repeat hit at capacity must never flush the memo
  * (evict-on-hit would make a session with `capacity` live corpora
  * refit/rebuild on every call, thrashing forever). Factored out so
  * the next cache can't re-introduce that bug by copy-pasting the
  * idiom and dropping the `!contains` guard.
  *
  * `onOverflow` is the per-value disposal run when a new-key insert
  * overflows capacity (e.g. `_.unpersist()` for persisted relations;
  * the default no-op for values whose blocks the context cleaner
  * reclaims once callers release their references). Explicit
  * [[clear]] takes its own disposal because some memos are
  * deliberately more destructive on an explicit reset than on
  * overflow (see `Dedup.clearPairCache`).
  */
private[graft] final class BoundedMemo[K, V](capacity: Int,
    onOverflow: V => Unit = (_: V) => ()) {
  private val m = TrieMap.empty[K, V]

  def getOrElseUpdate(key: K)(build: => V): V = {
    if (!m.contains(key) && m.size >= capacity) clear(onOverflow)
    m.getOrElseUpdate(key, build)
  }

  def get(key: K): Option[V] = m.get(key)

  def size: Int = m.size

  /** Dispose every value with `dispose` (defaults to the overflow
    * disposal) and drop all entries.
    */
  def clear(dispose: V => Unit = onOverflow): Unit = {
    m.values.foreach(dispose)
    m.clear()
  }
}
