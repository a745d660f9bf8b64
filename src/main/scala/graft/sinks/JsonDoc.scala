package graft.sinks

import scala.collection.mutable

import graft.model.Value

/** Incremental flattened-JSON-document maintenance — the delivery side of
  * GraphQL v2 (`src/plan/graphql_v2.rs:395-498`): per epoch, merge the
  * arriving pull-path tuples into per-root documents and emit a FULL
  * key-sorted snapshot of every root that changed.
  *
  * Faithful to the reference's `Changes` + snapshot operators:
  *  - pointers flatten to `[root_eid, last_aid]` (`:355-374`) — nested
  *    values land on the root document under their leaf attribute;
  *  - cardinality One: values overwrite (`:379-390`); diffs are not
  *    consulted (the reference drains `(path, t, diff)` ignoring `diff`);
  *  - roots that lack any `requiredAids` key at snapshot time are excised
  *    from the state and not emitted (`:455-476`).
  *
  * Delivery-plane component: inputs are query-sized per-epoch diffs (the
  * distributed work is the pull query itself), state is one entry per
  * live root — same class as [[AssocIn]].
  */
final class JsonDocSink(requiredAids: Seq[String] = Seq.empty) {

  /** root → (aid → rendered JSON scalar), both levels key-sorted. */
  private val merged = mutable.TreeMap.empty[String, mutable.TreeMap[String, String]]

  /** Root keys render like the reference's `From<Value> for JValue`
    * string coercion (`src/lib.rs:138-149`): eids/numbers to decimal
    * strings, strings as-is. */
  private def rootKey(v: Value): String = v match {
    case Value.VEid(e)    => e.toString
    case Value.VNumber(n) => n.toString
    case Value.VAid(s)    => s
    case Value.VString(s) => s
    case other => sys.error(s"graphql_v2 root must be an entity-like key, got $other")
  }

  private def jsonScalar(v: Value): String = v match {
    case Value.VNumber(n)   => n.toString
    case Value.VBool(b)     => b.toString
    case Value.VEid(e)      => "\"" + e + "\""
    case Value.VInstant(ms) => "\"" + ms + "\""
    case Value.VAid(s)      => quote(s)
    case Value.VString(s)   => quote(s)
    case Value.VUuid(s)     => quote(s)
    case other => sys.error(s"graphql_v2 cannot render $other as JSON")
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def render(fields: mutable.TreeMap[String, String]): String =
    fields.iterator.map { case (k, v) => quote(k) + ":" + v }
      .mkString("{", ",", "}")

  /** Merge one epoch of `(pathId, tuple)` rows and return the full-document
    * snapshots `(root, json)` of the roots that changed this epoch, in root
    * order. A changed root excised by `requiredAids` is dropped from state
    * and from the output. */
  def advance(paths: Seq[(Seq[String], Seq[Value])]): Seq[(String, String)] = {
    val changed = mutable.TreeSet.empty[String]
    paths.foreach { case (pathId, tuple) =>
      require(pathId.nonEmpty, "empty path id")
      require(tuple.length >= 2, s"path tuple too short: $tuple")
      val aid = pathId.last
      val root = rootKey(tuple.head)
      val doc = merged.getOrElseUpdate(root, mutable.TreeMap.empty)
      doc.put(aid, jsonScalar(tuple.last))
      changed += root
    }
    changed.iterator.flatMap { root =>
      merged.get(root).flatMap { doc =>
        if (requiredAids.forall(doc.contains)) Some(root -> render(doc))
        else { merged.remove(root); None }
      }
    }.toSeq
  }

  /** Current full snapshot (tests / introspection). */
  def snapshot: Map[String, String] =
    merged.iterator.map { case (r, doc) => r -> render(doc) }.toMap
}
