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
}
