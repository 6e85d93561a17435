package graft.util

import org.apache.spark.broadcast.Broadcast
import java.util.concurrent.ConcurrentHashMap

/** Delta transport for the broadcast-state superstep loops.
  *
  * The per-superstep driver envelope (BASELINE.md Legs B: ~0.9 s at the
  * 1-core legs) is dominated by O(V) per-round costs that do not shrink
  * with cluster size: publishing a fresh V-long community array + a
  * C-entry size map to the block manager every round, each executor
  * fetching and deserializing them, and the driver rebuilding the size
  * map by scanning all V vertices. But a superstep changes only the MOVED
  * vertices — late rounds move a few hundred of 10^6+.
  *
  * So the per-round broadcast becomes a [[DeltaState.Payload]]: a handle
  * to a FULL base snapshot (republished only when the accumulated delta
  * grows past `V/4`) plus the cumulative ABSOLUTE overrides since that
  * base (position -> community, community -> size). Absolute overrides
  * make application idempotent: an executor holding any reconstruction of
  * an earlier epoch against the same base can be brought to the current
  * epoch by just (re)applying the override list in place — O(delta), no
  * clone. A fresh executor (or a straggler/retry task for an older epoch)
  * falls back to clone-base-and-apply — always correct, never dependent
  * on cache state.
  *
  * Cache safety: rounds execute sequentially (job r completes before the
  * driver publishes round r+1), so when the in-place fast path mutates
  * the cached arrays no running task can still be reading the older
  * epoch; a re-submitted task for an older epoch takes the clone path
  * (epoch mismatch) and leaves the cache alone. Size-map keys can only
  * disappear over a run (a community emptied by hedonic moves can never
  * be re-entered: it has no members, hence no neighbors, hence is never a
  * candidate), so every override key exists in any base snapshot — the
  * resolver still guards the slot lookup and falls back to a rebuild if
  * that invariant ever broke.
  */
object DeltaState {

  /** Full state snapshot (the delta base). Sizes ship as parallel arrays
    * and are hashed executor-side once per base — shipping the map's
    * internal 2x-capacity arrays would double the payload. */
  final class FullState(
      val comms: Array[Long],
      val sizeKeys: Array[Long],
      val sizeVals: Array[Long]) extends Serializable

  /** Per-round broadcast payload: base handle + cumulative absolute
    * overrides since the base epoch. */
  final class Payload(
      val runId: Long,
      val epoch: Int,
      val baseEpoch: Int,
      val base: Broadcast[FullState],
      val pos: Array[Int],
      val comms: Array[Long],
      val sizeKeys: Array[Long],
      val sizeVals: Array[Long]) extends Serializable

  // epoch is written LAST by the in-place writer (applyOverrides) and read
  // FIRST by the lock-free fast path in resolve(): @volatile makes that a
  // release/acquire pair, so a reader that observes the new epoch also
  // observes every preceding comms/sizes write. Without it the JMM permits
  // a torn read (new epoch, stale array contents) on a multi-core executor.
  private final class Entry(
      val baseEpoch: Int,
      @volatile var epoch: Int,
      val comms: Array[Long],
      val sizes: StateMap.LongLongMap)

  // executor-global reconstruction cache, one entry per live run; bounded
  // by evicting the oldest runs past MAX_RUNS (an executor outliving many
  // runs would otherwise pin V-long arrays forever).
  private val MAX_RUNS = 4
  private val cache = new ConcurrentHashMap[Long, Entry]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()

  private def applyOverrides(e: Entry, p: Payload): Boolean = {
    // Publish "in transition" BEFORE mutating (ADVICE r5): in-place
    // mutation of a cached entry happens only under cache.synchronized,
    // but the resolve() fast path reads lock-free — a late task for the
    // PREVIOUS epoch must not match this entry while its arrays are
    // mid-mutation. Int.MinValue equals no real epoch, so any reader
    // arriving after this volatile write falls through to the
    // synchronized path and waits the writer out. (The residual window —
    // a reader that validated the old epoch in the instant before this
    // write — is closable only by clone-and-swap, which would reintroduce
    // the O(V)-per-round cost this transport exists to remove; it
    // requires a zombie task from a SUPERSEDED attempt, whose results the
    // driver discards, and speculative execution stays off in every
    // deployment profile this engine ships.)
    e.epoch = Int.MinValue
    val n = p.pos.length
    var i = 0
    while (i < n) { e.comms(p.pos(i)) = p.comms(i); i += 1 }
    val m = p.sizeKeys.length
    var j = 0
    while (j < m) {
      val s = e.sizes.slot(p.sizeKeys(j))
      if (s < 0) return false // key absent from base: invariant broke, rebuild
      e.sizes.vals(s) = p.sizeVals(j)
      j += 1
    }
    e.epoch = p.epoch
    true
  }

  private def rebuild(p: Payload): Entry = {
    val full = p.base.value
    val comms = full.comms.clone()
    val sizes = StateMap.longLong(full.sizeKeys, full.sizeVals, full.sizeKeys.length)
    val e = new Entry(p.baseEpoch, p.baseEpoch, comms, sizes)
    if (!applyOverrides(e, p))
      throw new IllegalStateException(
        s"DeltaState: size override key missing from base epoch ${p.baseEpoch}")
    e
  }

  private def resolve(p: Payload): Entry = {
    val cached = cache.get(p.runId)
    if (cached != null && cached.epoch == p.epoch && cached.baseEpoch == p.baseEpoch)
      return cached
    cache.synchronized {
      val e = cache.get(p.runId)
      if (e != null && e.epoch == p.epoch && e.baseEpoch == p.baseEpoch) return e
      if (e != null && e.baseEpoch == p.baseEpoch && e.epoch < p.epoch &&
          applyOverrides(e, p)) return e
      if (e != null && e.baseEpoch == p.baseEpoch && e.epoch > p.epoch)
        return rebuild(p) // stale retry: serve fresh, keep the newer cache
      val fresh = rebuild(p)
      if (cache.put(p.runId, fresh) == null) {
        order.add(java.lang.Long.valueOf(p.runId))
        while (cache.size() > MAX_RUNS) {
          val old = order.poll()
          if (old != null) cache.remove(old.longValue()) else return fresh
        }
      }
      fresh
    }
  }

  /** Kernel entry points (called from generated code / interpreted eval —
    * the payload arrives as the broadcast's value, untyped). */
  def comms(payload: AnyRef): Array[Long] = resolve(payload.asInstanceOf[Payload]).comms
  def sizes(payload: AnyRef): StateMap.LongLongMap =
    resolve(payload.asInstanceOf[Payload]).sizes

  // Seeded from the JVM start time (VERDICT r5 hardening): a plain
  // counter restarts at 1 in every driver JVM, so an executor outliving a
  // driver restart (not possible in standalone/local deployments, where
  // executors are per-application — but cheap to rule out everywhere)
  // could see a colliding runId with matching epochs and serve stale
  // cached state. The start-time upper bits make ids from different
  // driver JVMs disjoint; the low 20 bits leave room for 1M runs per
  // driver.
  private val runIds = new java.util.concurrent.atomic.AtomicLong(
    java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime << 20)
  /** Fresh run id, unique within the driver JVM AND across driver
    * restarts (executors only ever see ids minted here). */
  def newRunId(): Long = runIds.incrementAndGet()
}
