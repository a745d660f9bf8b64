package graft.model

/** Typed engine failure mirroring the reference `Error` struct
  * (`src/lib.rs:163-208`): a machine-readable category plus a free-form
  * message. Transports forward it as `Output::Error` with the category
  * intact, so reference clients can dispatch on `df.error/category`. */
final case class GraftError(category: String, message: String)
    extends RuntimeException(message)

object GraftError {
  /** A malformed request or input (`Error::incorrect`, lib.rs:174-178). */
  def incorrect(message: String): GraftError =
    GraftError("df.error.category/incorrect", message)

  /** A missing attribute / rule / entity (`Error::not_found`, lib.rs:182-186). */
  def notFound(message: String): GraftError =
    GraftError("df.error.category/not-found", message)

  /** A conflict with existing state — duplicate attribute, write at a
    * closed time, frontier rewind (`Error::conflict`, lib.rs:190-194). */
  def conflict(message: String): GraftError =
    GraftError("df.error.category/conflict", message)

  /** An internal fault (`Error::fault`, lib.rs:198-202). */
  def fault(message: String): GraftError =
    GraftError("df.error.category/fault", message)

  /** A request outside the supported feature set (`Error::unsupported`,
    * lib.rs:206-210). */
  def unsupported(message: String): GraftError =
    GraftError("df.error.category/unsupported", message)
}
