package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.{Value, Variant}

/** Nested-document sink — the Spark/Scala mirror of the reference `AssocIn`
  * (`src/sinks/assoc_in.rs:22-231`): folds result *paths*
  * `[key key ... leaf-key leaf-val]` into nested JSON documents, Clojure
  * `assoc-in` style. Additions insert at the key path, retractions delete
  * the leaf key; within a timestamp retractions apply first so a same-batch
  * re-assertion isn't dissoc'ed (`assoc_in.rs:169-172`).
  *
  * Two modes, as in the reference (`stateful` field, `assoc_in.rs:22-32`):
  *  - stateless [[fold]]: one batch of paths → fresh documents, one per
  *    top-level key;
  *  - [[Stateful]]: documents persist across batches; each merge reports
  *    the changed sub-structures at the configured `granularity` depth.
  *
  * This is an *edge* (delivery) component: paths are small query results,
  * folded record-at-a-time exactly like the reference's sink operator. The
  * distributed part — producing the paths — is the pull query itself.
  */
object AssocIn {

  /** Nested JSON value: either a scalar leaf or a sorted-key object (the
    * reference uses serde_json's BTreeMap — key-sorted — for maps). */
  sealed trait Node
  final case class Leaf(v: Value) extends Node
  final case class Obj(fields: mutable.TreeMap[String, Node] = mutable.TreeMap.empty)
      extends Node

  /** Path keys must be attribute ids, entity ids, or strings
    * (`assoc_in.rs:159-167`). */
  def parseKey(v: Value): String = v match {
    case Value.VAid(x)    => x
    case Value.VEid(x)    => x.toString
    case Value.VString(x) => x
    case other => sys.error(s"Malformed pull path. Expected a key, got $other")
  }

  /** Merge a batch of `(path, time, diff)` rows into `acc`; returns the
    * change keys truncated to `granularity` (`merge_paths`,
    * `assoc_in.rs:140-231`). */
  def mergePaths(
      acc: Obj,
      paths: Seq[(Seq[Value], Long, Long)],
      granularity: Int = 1): Seq[Seq[String]] = {
    val ordered = paths.sortBy { case (_, t, diff) => (t, diff) }
    val changes = mutable.ArrayBuffer.empty[Seq[String]]

    ordered.foreach { case (path, _, diff) =>
      require(path.length >= 2, s"pull path too short: $path")
      val leafVal = path.last
      val keys = path.init.map(parseKey)
      val leafKey = keys.last
      val prefix = keys.init

      changes += keys.take(granularity)

      // Descend, creating intermediate objects; a leaf blocking the way
      // stops the descent (the reference's `if let Object` guards).
      var cur: Option[Obj] = Some(acc)
      prefix.foreach { k =>
        cur = cur.flatMap { o =>
          o.fields.getOrElseUpdate(k, Obj()) match {
            case child: Obj => Some(child)
            case _: Leaf    => None
          }
        }
      }
      cur.foreach { o =>
        if (diff > 0) o.fields(leafKey) = Leaf(leafVal)
        else o.fields.remove(leafKey)
      }
    }
    changes.distinct.sorted(Ordering.Implicits.seqOrdering[Seq, String]).toSeq
  }

  /** Stateless mode: fold one batch into fresh documents and emit each
    * top-level key's subtree as JSON (`assoc_in.rs:85-101`). */
  def fold(paths: Seq[(Seq[Value], Long, Long)]): Seq[(String, String)] = {
    val acc = Obj()
    mergePaths(acc, paths, granularity = 1)
    acc.fields.iterator.map { case (k, node) => (k, render(node)) }.toSeq
  }

  /** Stateful mode: documents persist; each merge emits the changed
    * sub-structure at `granularity` depth (`assoc_in.rs:102-128`). */
  final class Stateful(granularity: Int = 1) {
    private val state = Obj()

    def merge(paths: Seq[(Seq[Value], Long, Long)]): Seq[(Seq[String], String)] = {
      val changes = mergePaths(state, paths, granularity)
      changes.flatMap { ck =>
        navigate(state, ck).map(node => ck -> render(node))
      }
    }

    def snapshot: String = render(state)

    private def navigate(node: Node, path: Seq[String]): Option[Node] =
      path.foldLeft(Option(node)) {
        case (Some(Obj(fields)), k) => fields.get(k)
        case _                      => None
      }
  }

  /** Pull results arrive from the compiler as one `array<variant>` column
    * plus the weight; decode rows (positive weight = assertions) into path
    * batches for folding. */
  def pathsOfFrame(pathFrame: DataFrame): Seq[(Seq[Value], Long, Long)] = {
    val w = pathFrame.columns.length - 1
    pathFrame.collect().toSeq.map { row =>
      val arr = row.getSeq[Row](0).map(Variant.valueOf)
      (arr, 0L, row.getLong(w))
    }
  }

  /** Minimal JSON rendering (sorted keys, standard escapes). */
  def render(node: Node): String = node match {
    case Leaf(v) => renderScalar(v)
    case Obj(fields) =>
      fields.iterator
        .map { case (k, n) => s"${quote(k)}:${render(n)}" }
        .mkString("{", ",", "}")
  }

  private def renderScalar(v: Value): String = v match {
    case Value.VAid(s)         => quote(s)
    case Value.VString(s)      => quote(s)
    case Value.VUuid(s)        => quote(s)
    case Value.VBool(b)        => b.toString
    case Value.VNumber(n)      => n.toString
    case Value.VEid(e)         => e.toString
    case Value.VInstant(ms)    => ms.toString
    case Value.VReal(d)        => d.toString
    case Value.VRational(n, d) => s"""{"num":$n,"den":$d}"""
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    } + "\""
}
