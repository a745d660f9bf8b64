package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.engine.Engine
import graft.model._

/** MAINTAINED bitemporal serving — standing queries over `Pair(sys,
  * event)` time (reference `src/timestamp/pair.rs`, exercised by
  * `tests/input_semantics.rs:337-508`), composing the bitemporal
  * frontier rules with [[IncrementalQuery]]:
  *
  *  - Visibility bookkeeping (which datoms product-dominate the processed
  *    time) and per-attribute INPUT-SEMANTICS resolution (Raw clamp /
  *    Distinct support / LastWriteWins lex-latest winner) are
  *    control-plane-sized and live on the driver — the same split as the
  *    reference, whose progress tracking is worker-local while the
  *    dataflow is maintained.
  *  - The QUERY is a standing [[IncrementalQuery]]: each newly completed
  *    pair time feeds only the VISIBLE-VIEW TRANSITIONS of the referenced
  *    attributes (signed `(e, v, ±1)` rows — LWW winner regressions
  *    included, which the unitemporal forward-only LWW view could never
  *    express), so per-time dataflow work is delta-proportional, never
  *    the per-time snapshot recompute [[graft.engine.BiEngine]] pays.
  *  - Delivery follows BiEngine's lattice rule exactly:
  *    `diff(t) = R(t) − Σ_{s ≤ t} diff(s)` with `≤` the PRODUCT order —
  *    `R` is accumulated from the standing query's diffs, the emitted
  *    ledger is output-sized and driver-side.
  *
  * `BiPropertySpec`-style parity: for any signed bitemporal history and
  * any advance schedule, `drain` equals BiEngine's drain multiset-exactly.
  */
class BiMaintained(val spark: SparkSession) {

  type BiTime = (Long, Long)

  final case class BiDatom(e: Value, a: String, v: Value, t: BiTime, diff: Long)

  private def dominates(t: BiTime, s: BiTime): Boolean =
    s._1 <= t._1 && s._2 <= t._2

  private case class AttrState(
      config: AttributeConfig,
      buffer: mutable.ArrayBuffer[BiDatom])

  private val attrs = mutable.LinkedHashMap.empty[String, AttrState]
  private val rules = mutable.LinkedHashMap.empty[String, Rule]
  private val interests = mutable.LinkedHashSet.empty[String]
  private var sysFrontier: Long = 0L
  private val processed = mutable.Set.empty[BiTime]

  def createAttribute(name: String, config: AttributeConfig = AttributeConfig()): Unit =
    attrs(name) = AttrState(config, mutable.ArrayBuffer.empty)

  def register(rule: Rule): Unit = rules(rule.name) = rule

  def interest(name: String): Unit = {
    require(rules.contains(name), s"unknown rule $name")
    interests += name
    standings.getOrElseUpdate(name, new Standing(name))
  }

  def transact(datoms: Seq[BiDatom]): Unit = datoms.foreach { d =>
    require(d.t._1 >= sysFrontier,
      s"write at closed system time ${d.t._1}: frontier at $sysFrontier")
    attrs.getOrElseUpdate(d.a,
      AttrState(AttributeConfig(), mutable.ArrayBuffer.empty)).buffer += d
  }

  // ---- per-interest standing state --------------------------------------

  private final class Standing(name: String) {
    private val plan = rules(name).plan
    private val rulePlans: Map[String, Plan] =
      rules.iterator.map { case (n, ru) => n -> ru.plan }.toMap
    val refAttrs: Seq[String] =
      IncrementalQuery.planAttributes(plan, rulePlans).toSeq.sorted
    var iq: IncrementalQuery = null
    var kinds: Map[String, ValueKind] = Map.empty
    // Per referenced attribute: the view multiset served at the last
    // processed time — (e.native, v.native) -> multiplicity.
    val prevView = mutable.Map.empty[String, Map[(Any, Any), Long]]
      .withDefaultValue(Map.empty)
    // Accumulated standing-query result R(t) (output-sized).
    val r = mutable.Map.empty[Seq[Any], Long]
    // Emitted ledger: (time, diff map) — BiEngine's accumulation input.
    val ledger = mutable.ArrayBuffer.empty[(BiTime, Map[Seq[Any], Long])]
    val out = mutable.ArrayBuffer.empty[(Seq[Any], BiTime, Long)]

    /** Build — or REBUILD when a referenced attribute's first datom
      * reveals a kind after the first build (BiEngine re-infers per
      * evaluation; the standing query's schema is fixed at build, so a
      * revealed kind replays the accumulated views into a fresh query,
      * discarding the replay diffs — they are already in `r`). Kinds
      * follow BiEngine's rule: first datom's value kind, KString until
      * one exists. No view rows of the revealed attribute can have been
      * fed yet — its view was empty while the kind was unknown. */
    def ensureBuilt(): Unit = {
      val current: Map[String, ValueKind] = refAttrs.map { a =>
        a -> attrs.get(a).flatMap(_.buffer.headOption)
          .map(d => ValueKind.of(d.v)).getOrElse(ValueKind.KString)
      }.toMap
      if (iq == null) {
        kinds = current
        // All semantics resolve in the VIEW layer: the standing query
        // consumes plain signed Z-set transitions.
        iq = new IncrementalQuery(spark, plan, kinds, rulePlans)
      } else if (kinds != current) {
        kinds = current
        iq = new IncrementalQuery(spark, plan, kinds, rulePlans)
        val replay = refAttrs.flatMap { a =>
          viewFrame(a, kinds(a), prevView(a).map { case (k, m) => k -> m })
        }.toMap
        if (replay.nonEmpty) iq.advance(replay).count() // state only; diffs ≡ r
      }
    }

    /** Signed rows frame for a full view (replay) — None when empty. */
    private def viewFrame(a: String, kind: ValueKind,
        view: Map[(Any, Any), Long]): Option[(String, DataFrame)] =
      if (view.isEmpty) None
      else Some(a -> rowsFrame(kind,
        view.iterator.map { case ((e, v), m) => Row(e, v, m) }.toSeq))
  }

  /** (e, v, diff) rows → DataFrame with the attribute's value kind. */
  private def rowsFrame(kind: ValueKind, rows: Seq[Row]): DataFrame = {
    val schema = StructType(Seq(
      StructField("e", LongType, false),
      StructField("v", kind.dataType, true),
      StructField("diff", LongType, false)))
    val nPart = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, rows.size / 65536 + 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, nPart), schema)
  }

  private val standings = mutable.Map.empty[String, Standing]

  /** Attribute view multiset at pair time `t` — BiEngine's `asOfBi`
    * semantics verbatim: Raw clamps net weight at ≥ 0, Distinct keeps
    * support, LastWriteWins keeps the lexicographically-latest visible
    * event's value iff it was an add (ties by transaction order). */
  private def viewAt(a: String, t: BiTime): Map[(Any, Any), Long] =
    attrs.get(a) match {
      case None => Map.empty
      case Some(st) =>
        val visible = st.buffer.zipWithIndex
          .filter { case (d, _) => dominates(t, d.t) }
        st.config.inputSemantics match {
          case InputSemantics.LastWriteWins =>
            visible.groupBy(_._1.e).flatMap { case (_, ds) =>
              val (last, _) = ds.maxBy { case (d, i) => (d.t, i) }
              if (last.diff > 0L) Some((last.e.native, last.v.native) -> 1L)
              else None
            }.toMap
          case InputSemantics.Distinct =>
            visible.groupBy { case (d, _) => (d.e, d.v) }
              .filter(_._2.map(_._1.diff).sum > 0L)
              .keys.map { case (e, v) => (e.native, v.native) -> 1L }.toMap
          case InputSemantics.Raw =>
            visible.groupBy { case (d, _) => (d.e, d.v) }.iterator
              .map { case ((e, v), ds) =>
                (e.native, v.native) -> math.max(0L, ds.map(_._1.diff).sum)
              }
              .filter(_._2 > 0L).toMap
        }
    }

  /** Advance the system frontier: every input time with `sys < sysNext`
    * completes; each is processed lex-ordered through the standing
    * queries, diffs delivered under the product-order accumulation. */
  def advance(sysNext: Long): Unit = {
    require(sysNext > sysFrontier, s"cannot rewind from $sysFrontier to $sysNext")
    val newTimes = attrs.valuesIterator.flatMap(_.buffer.iterator.map(_.t))
      .filter(t => t._1 < sysNext && !processed(t))
      .toSeq.distinct.sorted
    for (t <- newTimes; name <- interests) {
      val st = standings(name)
      st.ensureBuilt()
      // Visible-view transitions per referenced attribute.
      val deltas: Map[String, DataFrame] = st.refAttrs.flatMap { a =>
        val cur = viewAt(a, t)
        val prev = st.prevView(a)
        val rows = (cur.keySet ++ prev.keySet).iterator.flatMap { k =>
          val d = cur.getOrElse(k, 0L) - prev.getOrElse(k, 0L)
          if (d == 0L) None else Some(Row(k._1, k._2, d))
        }.toSeq
        st.prevView(a) = cur
        if (rows.isEmpty) None
        else Some(a -> rowsFrame(st.kinds(a), rows))
      }.toMap
      if (deltas.nonEmpty) {
        // O(delta) dataflow work; R accumulates the standing diffs.
        val d = st.iq.advance(deltas)
        d.collect().foreach { row =>
          val n = row.length - 1
          val tuple: Seq[Any] = (0 until n).map(i => Engine.deepNative(row.get(i)))
          val w = st.r.getOrElse(tuple, 0L) + row.getLong(n)
          if (w == 0L) st.r.remove(tuple) else st.r(tuple) = w
        }
      }
      // BiEngine's lattice delivery rule over the emitted ledger.
      val acc = mutable.Map.empty[Seq[Any], Long]
      st.ledger.foreach { case (s, diffMap) =>
        if (dominates(t, s))
          diffMap.foreach { case (k, w) => acc(k) = acc.getOrElse(k, 0L) + w }
      }
      val diff = (st.r.keySet ++ acc.keySet).iterator.map { tuple =>
        tuple -> (st.r.getOrElse(tuple, 0L) - acc.getOrElse(tuple, 0L))
      }.filter(_._2 != 0L).toMap
      if (diff.nonEmpty) {
        st.ledger += ((t, diff))
        diff.foreach { case (tuple, w) => st.out += ((tuple, t, w)) }
      }
    }
    processed ++= newTimes
    sysFrontier = sysNext
  }

  def drain(name: String): Seq[(Seq[Any], BiTime, Long)] = {
    val buf = standings(name).out
    val res = buf.toSeq
    buf.clear()
    res
  }
}
