package graft

/** Central registry for cross-query memo invalidation (ADVICE r12).
  *
  * Several modules memoize locally-checkpointed frames across queries
  * (today: [[graft.llm.TextDedup]]'s shared dup-edge table). A harness
  * that reclaims checkpoint blocks between passes (graft.Bench's
  * inter-pass cleanup) must clear EVERY such memo afterwards — a
  * survivor holds a frame with truncated lineage and dies with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on its next scan. Hardcoding the
  * module list in Bench made that requirement a comment; this registry
  * makes it structural: a module that memoizes registers its
  * invalidator at object-init (which necessarily runs before the memo
  * can hold anything), and the harness clears them all with one call.
  */
object Memo {
  private val invalidators =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a memo-clearing thunk. Call once from the memoizing
    * module's object body so registration precedes first use. */
  def registerInvalidator(f: () => Unit): Unit = invalidators.add(f)

  /** Clear every registered memo. Safe to call when nothing is
    * registered; modules not yet class-loaded hold no memos. */
  def invalidateAll(): Unit = invalidators.forEach(f => f())
}
