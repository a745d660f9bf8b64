package graft.streaming

/** A plan (or plan fragment) lies outside the incrementally maintainable
  * fragment — the batch/snapshot engine's job, not an infrastructure
  * failure. The engine's best-effort wire path catches EXACTLY this type
  * to demote an interest to the snapshot path; genuine Spark/session
  * errors during standing-query construction propagate instead of being
  * silently swallowed as a demotion (round-9 ADVICE, `Engine.scala:417`).
  */
final class UnmaintainablePlan(msg: String) extends RuntimeException(msg)

object UnmaintainablePlan {
  /** Throw the typed rejection (drop-in for `sys.error` at plan-shape
    * rejection sites). */
  def reject(msg: String): Nothing = throw new UnmaintainablePlan(msg)

  /** Shape precondition (drop-in for `require` at construction-time
    * plan-shape checks): a failed condition means the plan lies outside
    * the maintainable fragment, NOT that an invariant broke — so it
    * throws the typed rejection the engine's demote path catches, never
    * an IllegalArgumentException that could be confused with a genuine
    * Spark/infra failure. */
  def require(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new UnmaintainablePlan(msg)
}
