package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attribute update on a stream: the (e, v) pair with event time and
  * multiplicity diff — the streaming shape of the reference's per-attribute
  * collections of `((Value, Value), T, isize)` (`src/sources/mod.rs:47-64`).
  */
final case class Update[V](e: Long, v: V, t: Long, diff: Long)

/** Side-tagged update feeding [[DatomStreams.joinDiffs]]. */
final case class JoinUpdate[A, B](
    e: Long, left: Option[A], right: Option[B], t: Long, diff: Long)

/** One weighted output diff of an incremental join. */
final case class JoinDiff[A, B](e: Long, left: A, right: B, t: Long, diff: Long)

/** Structured Streaming counterparts of the reference's input-semantics
  * operators and delivery-time controls (SURVEY.md §2.9):
  *
  * | reference                                  | here                      |
  * |--------------------------------------------|---------------------------|
  * | `InputSemantics::LastWriteWins`            | [[DatomStreams.lastWriteWins]] |
  * | `InputSemantics::Distinct`                 | [[DatomStreams.distinctSet]]   |
  * | `Coarsen` delivery granularity             | [[DatomStreams.coarsen]]       |
  * | `trace_slack` state bound                  | [[DatomStreams.withSlack]]     |
  * | epoch advance / frontier                   | micro-batch boundary      |
  *
  * The stateful operators are `flatMapGroupsWithState` transforms keyed by
  * entity (or (e, v)): state is partitioned exactly like the reference's
  * hash-exchanged arrangements, scales by key, and emits explicit
  * retraction diffs — which Spark's own output modes do not produce.
  * Filter/project/union need no operators at all: they map diffs 1:1, so
  * the plain DataFrame transforms apply unchanged to a diff stream.
  */
object DatomStreams {

  /** Last-write-wins input semantics, the streaming mirror of the
    * reference's per-entity state machine
    * (`src/operators/last_write_wins.rs:71-101`): updates apply in event-
    * time order per entity; an addition retracts the previous value and
    * asserts the new one; an explicit retraction retracts the current value
    * and clears state (later writes may re-assert). Emits `(e, v, t, ±1)`
    * diffs; downstream consolidation cancels same-value rewrites.
    */
  def lastWriteWins[V](updates: Dataset[Update[V]])(
      implicit uEnc: Encoder[Update[V]], vEnc: Encoder[V]): Dataset[Update[V]] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    updates
      .groupByKey(_.e)
      .flatMapGroupsWithState[V, Update[V]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (e: Long, it: Iterator[Update[V]], state: GroupState[V]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Update[V]]
          // Stable sort by event time (arrival order breaks ties), as the
          // reference sorts each batch per key before the state machine.
          it.toSeq.sortBy(_.t).foreach { u =>
            state.getOption match {
              case None =>
                require(u.diff > 0,
                  "Received a retraction of a new key on a LastWriteWins attribute")
                state.update(u.v)
                out += Update(e, u.v, u.t, 1L)
              case Some(old) =>
                if (u.diff > 0) {
                  state.update(u.v)
                  out += Update(e, old, u.t, -1L)
                  out += Update(e, u.v, u.t, 1L)
                } else {
                  state.remove()
                  out += Update(e, old, u.t, -1L)
                }
            }
          }
          out.iterator
      }
  }

  /** Distinct (set) input semantics: per (e, v), emit +1 when accumulated
    * support first turns positive and -1 when it drops back to zero —
    * the streaming form of the reference's `distinct` wrapper on attribute
    * inputs (`src/server/mod.rs:355-361`). */
  def distinctSet[V](updates: Dataset[Update[V]])(
      implicit uEnc: Encoder[Update[V]], vEnc: Encoder[V]): Dataset[Update[V]] = {
    implicit val keyEnc: Encoder[(Long, V)] = Encoders.tuple(Encoders.scalaLong, vEnc)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    updates
      .groupByKey(u => (u.e, u.v))
      .flatMapGroupsWithState[Long, Update[V]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, V), it: Iterator[Update[V]], state: GroupState[Long]) =>
          val (e, v) = key
          var support = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[Update[V]]
          it.toSeq.sortBy(_.t).foreach { u =>
            val before = support
            support += u.diff
            if (before <= 0 && support > 0) out += Update(e, v, u.t, 1L)
            else if (before > 0 && support <= 0) out += Update(e, v, u.t, -1L)
          }
          state.update(support)
          out.iterator
      }
  }

  /** Incremental equijoin of two diff streams on the entity key — the
    * streaming form of differential's join delta rule
    * `Δ(L ⋈ R) = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR` (SURVEY.md §4.2). Keyed
    * state holds both sides' accumulated (value → weight) multisets;
    * each batch's updates apply sequentially (event-time order), emitting
    * the cross product against the other side's current state with
    * multiplied weights — so retractions propagate with negative diffs.
    * The telescoping sum makes the net diffs independent of the order in
    * which same-timestamp updates apply. */
  def joinDiffs[A, B](left: Dataset[Update[A]], right: Dataset[Update[B]])(
      implicit tEnc: Encoder[JoinUpdate[A, B]],
      oEnc: Encoder[JoinDiff[A, B]]): Dataset[JoinDiff[A, B]] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[(Map[A, Long], Map[B, Long])] =
      Encoders.kryo[(Map[A, Long], Map[B, Long])]
    val tagged = left.map(u => JoinUpdate[A, B](u.e, Some(u.v), None, u.t, u.diff))
      .union(right.map(u => JoinUpdate[A, B](u.e, None, Some(u.v), u.t, u.diff)))
    tagged
      .groupByKey(_.e)
      .flatMapGroupsWithState[(Map[A, Long], Map[B, Long]), JoinDiff[A, B]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (e: Long, it: Iterator[JoinUpdate[A, B]],
            state: GroupState[(Map[A, Long], Map[B, Long])]) =>
          var (ls, rs) = state.getOption.getOrElse((Map.empty[A, Long], Map.empty[B, Long]))
          val out = scala.collection.mutable.ArrayBuffer.empty[JoinDiff[A, B]]
          it.toSeq.sortBy(_.t).foreach { u =>
            (u.left, u.right) match {
              case (Some(a), _) =>
                rs.foreach { case (b, wb) =>
                  val d = u.diff * wb
                  if (d != 0L) out += JoinDiff(e, a, b, u.t, d)
                }
                val nw = ls.getOrElse(a, 0L) + u.diff
                ls = if (nw == 0L) ls - a else ls.updated(a, nw)
              case (_, Some(b)) =>
                ls.foreach { case (a, wa) =>
                  val d = wa * u.diff
                  if (d != 0L) out += JoinDiff(e, a, b, u.t, d)
                }
                val nw = rs.getOrElse(b, 0L) + u.diff
                rs = if (nw == 0L) rs - b else rs.updated(b, nw)
              case _ => ()
            }
          }
          state.update((ls, rs))
          out.iterator
      }
  }

  /** Incrementally maintained grouped COUNT/SUM over a diff stream: per
    * entity, each batch folds the incoming weighted updates into keyed
    * state and emits a retraction of the previous aggregate value plus an
    * assertion of the new one — the reference's diff-monoid aggregation
    * (`src/plan/aggregate_neu.rs:167-243`) expressed as keyed state. Keys
    * whose support drops to zero retract without re-asserting (empty
    * consolidated support emits nothing). `valueOf` extracts the summed
    * quantity (COUNT = `_ => 1L`). */
  def aggregateDiffs[V](updates: Dataset[Update[V]])(valueOf: V => Long)(
      implicit uEnc: Encoder[Update[V]]): Dataset[Update[Long]] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[Update[Long]] = Encoders.product[Update[Long]]
    implicit val stateEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    updates
      .groupByKey(_.e)
      .flatMapGroupsWithState[(Long, Long), Update[Long]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (e: Long, it: Iterator[Update[V]], state: GroupState[(Long, Long)]) =>
          val (oldSum, oldSupport) = state.getOption.getOrElse((0L, 0L))
          var sum = oldSum
          var support = oldSupport
          var tMax = Long.MinValue
          it.foreach { u =>
            sum += valueOf(u.v) * u.diff
            support += u.diff
            if (u.t > tMax) tMax = u.t
          }
          state.update((sum, support))
          val out = scala.collection.mutable.ArrayBuffer.empty[Update[Long]]
          if (sum != oldSum || (support > 0L) != (oldSupport > 0L)) {
            if (oldSupport > 0L) out += Update(e, oldSum, tMax, -1L)
            if (support > 0L) out += Update(e, sum, tMax, 1L)
          }
          out.iterator
      }
  }

  /** Delivery-granularity coarsening: round an event time STRICTLY up to
    * the next interval bound — (t/g + 1)·g, even at exact multiples — the
    * reference's `Coarsen` (`src/timestamp/mod.rs:151-154`). On a stream
    * this is a plain column transform feeding a tumbling-window group-by. */
  def coarsen(t: Column, granularity: Long): Column =
    t - (t % granularity) + granularity // == (t/g + 1)·g for t ≥ 0

  /** Bounded state retention: the reference compacts indexes up to
    * `frontier - trace_slack` (`src/domain/mod.rs:291-341`); the Spark
    * analog is an event-time watermark, which bounds stateful-operator
    * state and late-data acceptance the same way. `tMillis` must be an
    * epoch-ms long column; returns the frame with a `_ts` timestamp column
    * registered for watermarking. */
  def withSlack(df: DataFrame, tMillisCol: String, slackMs: Long): DataFrame =
    df.withColumn("_ts", timestamp_millis(col(tMillisCol)))
      .withWatermark("_ts", s"$slackMs milliseconds")

  /** Tumbling-window count with watermark — delivery granularity + slack
    * composed (the `Interest.granularity` path, `src/server/mod.rs:110-119`).
    */
  def windowedCounts(
      df: DataFrame, tMillisCol: String, granularityMs: Long,
      slackMs: Long): DataFrame =
    withSlack(df, tMillisCol, slackMs)
      .groupBy(window(col("_ts"), s"$granularityMs milliseconds"))
      .count()
}
