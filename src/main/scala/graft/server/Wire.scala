package graft.server

import graft.model._

/** The reference's client-facing request API (`Request`,
  * `src/server/mod.rs:153-191`) as a plain ADT — the transport (WebSocket,
  * `server/src/main.rs`) is out of scope for the library, but the request
  * vocabulary and its serde-JSON wire format are mirrored so a reference
  * client's payloads drive this engine unchanged (see [[Wire]]).
  */
sealed trait Request
object Request {
  final case class Transact(datoms: Seq[Datom]) extends Request
  /** Interest in an ENTIRE attribute (`Request::Subscribe`). */
  final case class Subscribe(name: String) extends Request
  /** Derive new attributes under a namespace from a GraphQL document
    * (`Request::Derive`, feature-gated in the reference). */
  final case class Derive(namespace: String, query: String) extends Request
  /** Sink configuration attachable to an `Interest` (`Sink`,
    * `src/sinks/mod.rs:56-65`): results route into the sink instead of the
    * plain QueryDiff channel. */
  sealed trait SinkSpec
  object SinkSpec {
    /** /dev/null benchmarking sink (`Sink::TheVoid(Option<String>)`):
      * diffs are swallowed; per-advance latency is logged, optionally
      * appended to `logPath`. */
    final case class TheVoid(logPath: Option[String]) extends SinkSpec
    /** Nested-document sink (`Sink::AssocIn`, `src/sinks/assoc_in.rs:22-32`):
      * result paths fold into documents, emitted as `Output::Json`.
      * `stateful = Some(g)` keeps history and reports changed
      * sub-structures at granularity depth `g`; `None` folds each batch
      * into fresh documents. */
    final case class AssocIn(stateful: Option[Int]) extends SinkSpec
    /** Local CSV file sink (`Sink::CsvFile`, `src/sinks/csv_file.rs:14-24`;
      * declared upstream but disabled in the enabled enum — carried here
      * for surface completeness): diffs append to `path` as delimited
      * records, optional `c0..cn` header. `flexible` is accepted for wire
      * fidelity (our tuples are fixed-width, so it never changes
      * behavior). */
    final case class CsvFile(path: String, hasHeaders: Boolean,
        delimiter: Char, flexible: Boolean) extends SinkSpec
    /** GraphQL-v2-style flattened-document sink
      * ([[graft.sinks.JsonDocSink]], mirroring
      * `src/plan/graphql_v2.rs:395-498`): pull paths land at
      * `[root, leaf_aid]`, and each advance emits full `Output::Json`
      * snapshots of the roots that changed. Roots missing any of
      * `requiredAids` are excised (`with_required_aids`). */
    final case class JsonDoc(requiredAids: Seq[String]) extends SinkSpec
    /** Parquet directory sink (beyond parity — the columnar twin of the
      * source-side ParquetFile): the rule's maintained diffs land under
      * `path/<rule>/` partitioned by emitted time
      * ([[graft.sinks.ParquetDirSink]]) — the DATA-SIZED delivery edge
      * over the wire, in both domain modes: results are computed and
      * written distributed, never collected to the server. Per-RULE
      * like every data-sized standing (idempotent identical re-sends;
      * a mismatched path errors); in a unitemporal domain attach it
      * before the rule's first advance (the maintained baseline streams
      * once). */
    final case class ParquetDir(path: String) extends SinkSpec
  }
  final case class Interest(name: String, granularity: Option[Long] = None,
      sink: Option[SinkSpec] = None, disableLogging: Option[Boolean] = None)
      extends Request
  final case class Uninterest(name: String) extends Request
  final case class Register(rules: Seq[Rule], publish: Seq[String]) extends Request
  final case class CreateAttribute(name: String, config: AttributeConfig)
      extends Request
  final case class AdvanceDomain(domain: Option[String], t: Long) extends Request
  /** Attach an external data source publishing one or more attributes
    * (`Request::RegisterSource`, `src/server/mod.rs:171`). The source
    * vocabulary is [[graft.sources.FileSources.Source]]: the
    * reference's CsvFile/JsonFile plus the beyond-parity ParquetFile. */
  final case class RegisterSource(
      source: graft.sources.FileSources.Source) extends Request
  case object Tick extends Request
  final case class CloseInput(name: String) extends Request
  case object Disconnect extends Request
  case object Setup extends Request
  case object Status extends Request
  case object Shutdown extends Request
}

/** Server-to-client payloads (`Output`, `src/lib.rs:250-262`), serialized
  * with serde's externally-tagged representation — what a reference client
  * receives over the socket. */
sealed trait Output
object Output {
  /** A batch of (tuple, time, diff) triples for a named query. */
  final case class QueryDiff(name: String, batch: Seq[(Seq[Value], Long, Long)])
      extends Output
  /** An error forwarded to a specific client (`Error`, `src/lib.rs:163-170`). */
  final case class Error(client: Long, category: String, message: String, txId: Long)
      extends Output
  /** A JSON message forwarded to a specific client (e.g. the `Status`
    * response, `server/src/main.rs:605-614`). */
  final case class Message(client: Long, json: String) extends Output
  /** A JSON document produced by a sink (`Output::Json`,
    * `src/lib.rs:254-256`): (query name, rendered JSON, time, diff). */
  final case class Json(name: String, json: String, t: Long, diff: Long)
      extends Output
}

/** serde-JSON wire codec for the request API, matching the reference's
  * derived `Serialize`/`Deserialize` representation
  * (`server/tests/serialization.rs`):
  *
  *  - `Value`: `String`/`Bool`/`Number` untagged (`"foo"`, `true`, `44`),
  *    other variants externally tagged (`{"Aid": ":edge"}`,
  *    `{"Instant": 0}`, `{"Uuid": "..."}`); tagged scalar forms are also
  *    accepted on input (older clients, `cli/examples/changes.json`);
  *  - tuple structs as arrays: `Datom` is `[e, a, v, time?, diff]`;
  *  - enums externally tagged: `{"Transact": [...]}`, unit variants as
  *    bare strings (`"Tick"`);
  *  - `Time`: `{"TxId": n}` (logical) or `{"Real": {"secs": s, "nanos": n}}`
  *    (wall-clock, mapped to epoch-ms).
  */
object Wire {

  // ------------------------------------------------------------- JSON AST

  sealed trait J
  object J {
    case object JNull extends J
    final case class JBool(b: Boolean) extends J
    final case class JNum(n: Double, raw: String) extends J
    final case class JStr(s: String) extends J
    final case class JArr(items: Vector[J]) extends J
    final case class JObj(fields: Vector[(String, J)]) extends J {
      def get(k: String): Option[J] = fields.collectFirst { case (`k`, v) => v }
    }
  }
  import J._

  // ------------------------------------------------------------- requests

  def parseRequests(json: String): Seq[Request] = parseJson(json) match {
    case JArr(items) => items.map(requestOf)
    case single      => Seq(requestOf(single))
  }

  def requestOf(j: J): Request = j match {
    case JStr("Tick")       => Request.Tick
    case JStr("Disconnect") => Request.Disconnect
    case JStr("Setup")      => Request.Setup
    case JStr("Status")     => Request.Status
    case JStr("Shutdown")   => Request.Shutdown
    case o: JObj =>
      o.fields match {
        case Vector(("Transact", JArr(ds))) =>
          Request.Transact(ds.map(datomOf))
        case Vector(("Interest", io: JObj)) =>
          Request.Interest(
            str(io.get("name").get),
            io.get("granularity").filter(_ != JNull).map(timeOf),
            io.get("sink").filter(_ != JNull).map(sinkOf),
            io.get("disable_logging").filter(_ != JNull).map(bool))
        case Vector(("Subscribe", JStr(n))) => Request.Subscribe(n)
        case Vector(("Derive", JArr(Vector(JStr(ns), JStr(q))))) =>
          Request.Derive(ns, q)
        case Vector(("Uninterest", JStr(n))) => Request.Uninterest(n)
        case Vector(("Register", ro: JObj)) =>
          Request.Register(
            arr(ro.get("rules").get).map(ruleOf),
            ro.get("publish").map(arr(_).map(str)).getOrElse(Seq.empty))
        case Vector(("CreateAttribute", co: JObj)) =>
          Request.CreateAttribute(str(co.get("name").get),
            co.get("config").map(configOf).getOrElse(AttributeConfig()))
        case Vector(("AdvanceDomain", JArr(Vector(dom, t)))) =>
          Request.AdvanceDomain(
            if (dom == JNull) None else Some(str(dom)), timeOf(t))
        case Vector(("CloseInput", JStr(n))) => Request.CloseInput(n)
        case Vector(("RegisterSource", so: JObj)) =>
          // serde shape: {"CsvFile": {path, has_headers, delimiter(u8),
          // comment(u8|null), eid_offset, timestamp_offset(usize|null),
          // schema: [[aid,[off,ValueHint]]]}} — reference
          // `src/sources/csv_file.rs:17-40`. timestamp_offset feeds the
          // EVENT coordinate in a bitemporal domain; unsupported
          // reference fields (flexible, fuel) ignored.
          def charOf(j: J): String = j match {
            case n: JNum => long(n).toChar.toString
            case other   => str(other)
          }
          so.fields match {
            case Vector(("CsvFile", co: JObj)) =>
              val schema = arr(co.get("schema").get).map { e =>
                arr(e) match {
                  case Seq(aidJ, offVal) => arr(offVal) match {
                    case Seq(off, hint) =>
                      (str(aidJ), (int(off), ValueKind.of(valueOf(hint))))
                    case other => sys.error(s"malformed schema entry: $other")
                  }
                  case other => sys.error(s"malformed schema entry: $other")
                }
              }
              Request.RegisterSource(graft.sources.FileSources.CsvFile(
                path = str(co.get("path").get),
                hasHeaders = co.get("has_headers") match {
                  case Some(JBool(b)) => b
                  case _              => true
                },
                delimiter = co.get("delimiter").map(charOf).getOrElse(","),
                comment = co.get("comment").filter(_ != JNull).map(charOf),
                eidOffset = co.get("eid_offset").map(int).getOrElse(0),
                schema = schema,
                tsOffset = co.get("timestamp_offset")
                  .filter(_ != JNull).map(int)))
            case Vector(("JsonFile", co: JObj)) =>
              Request.RegisterSource(graft.sources.FileSources.JsonFile(
                path = str(co.get("path").get),
                attributes = arr(co.get("attributes").get).map { e =>
                  arr(e) match {
                    case Seq(aidJ, hint) =>
                      (str(aidJ), ValueKind.of(valueOf(hint)))
                    case other => sys.error(s"malformed attribute entry: $other")
                  }
                }))
            case Vector(("ParquetFile", co: JObj)) =>
              // Beyond-parity source (FileSources.ParquetFile): named
              // columns, {"ParquetFile":{path, eid_column,
              // timestamp_column(string|null),
              // attributes:[[aid,[column,ValueHint]]]}}.
              Request.RegisterSource(graft.sources.FileSources.ParquetFile(
                path = str(co.get("path").get),
                eidColumn = str(co.get("eid_column").get),
                attributes = arr(co.get("attributes").get).map { e =>
                  arr(e) match {
                    case Seq(aidJ, colHint) => arr(colHint) match {
                      case Seq(column, hint) =>
                        (str(aidJ), (str(column), ValueKind.of(valueOf(hint))))
                      case other =>
                        sys.error(s"malformed attribute entry: $other")
                    }
                    case other => sys.error(s"malformed attribute entry: $other")
                  }
                },
                tsColumn = co.get("timestamp_column")
                  .filter(_ != JNull).map(str)))
            case other => sys.error(s"unknown source: $other")
          }
        case other => sys.error(s"unknown request: $other")
      }
    case other => sys.error(s"unknown request: $other")
  }

  def renderRequest(r: Request): String = r match {
    case Request.Tick       => "\"Tick\""
    case Request.Disconnect => "\"Disconnect\""
    case Request.Setup      => "\"Setup\""
    case Request.Status     => "\"Status\""
    case Request.Shutdown   => "\"Shutdown\""
    case Request.Transact(ds) =>
      s"""{"Transact":[${ds.map(renderDatom).mkString(",")}]}"""
    case Request.Interest(name, g, sink, dl) =>
      s"""{"Interest":{"name":${qs(name)},"granularity":${
        g.map(t => s"""{"TxId":$t}""").getOrElse("null")},"sink":${
        sink.map(renderSink).getOrElse("null")},"disable_logging":${
        dl.map(_.toString).getOrElse("null")}}}"""
    case Request.Subscribe(n)  => s"""{"Subscribe":${qs(n)}}"""
    case Request.Derive(ns, q) => s"""{"Derive":[${qs(ns)},${qs(q)}]}"""
    case Request.Uninterest(n) => s"""{"Uninterest":${qs(n)}}"""
    case Request.Register(rules, publish) =>
      s"""{"Register":{"rules":[${rules.map(renderRule).mkString(",")}],"publish":[${
        publish.map(qs).mkString(",")}]}}"""
    case Request.RegisterSource(src) =>
      def hint(kind: ValueKind): String = kind match {
        case ValueKind.KString  => """{"String":""}"""
        case ValueKind.KNumber  => """{"Number":0}"""
        case ValueKind.KEid     => """{"Eid":0}"""
        case ValueKind.KBool    => """{"Bool":false}"""
        case ValueKind.KInstant => """{"Instant":0}"""
        case ValueKind.KReal    => """{"Real":0.0}"""
        case other              => sys.error(s"unsupported source type hint $other")
      }
      src match {
        case c: graft.sources.FileSources.CsvFile =>
          val schema = c.schema.map { case (aid, (off, kind)) =>
            s"[${qs(aid)},[$off,${hint(kind)}]]"
          }.mkString(",")
          // Reference delimiters are u8; ours are strings (Spark allows
          // multi-char). Render single chars as u8 for serde parity, else
          // as a string (our parser accepts both) — no silent truncation.
          def charJson(s: String): String =
            if (s.length == 1) s.head.toInt.toString else qs(s)
          s"""{"RegisterSource":{"CsvFile":{"path":${qs(c.path)},""" +
            s""""has_headers":${c.hasHeaders},"delimiter":${charJson(c.delimiter)},""" +
            s""""comment":${c.comment.map(charJson).getOrElse("null")},""" +
            s""""eid_offset":${c.eidOffset},"timestamp_offset":${
              c.tsOffset.map(_.toString).getOrElse("null")},""" +
            s""""schema":[$schema]}}}"""
        case jf: graft.sources.FileSources.JsonFile =>
          val attrs = jf.attributes.map { case (aid, kind) =>
            s"[${qs(aid)},${hint(kind)}]"
          }.mkString(",")
          s"""{"RegisterSource":{"JsonFile":{"path":${qs(jf.path)},"attributes":[$attrs]}}}"""
        case p: graft.sources.FileSources.ParquetFile =>
          val attrs = p.attributes.map { case (aid, (column, kind)) =>
            s"[${qs(aid)},[${qs(column)},${hint(kind)}]]"
          }.mkString(",")
          s"""{"RegisterSource":{"ParquetFile":{"path":${qs(p.path)},""" +
            s""""eid_column":${qs(p.eidColumn)},"timestamp_column":${
              p.tsColumn.map(qs).getOrElse("null")},""" +
            s""""attributes":[$attrs]}}}"""
      }
    case Request.CreateAttribute(n, c) =>
      s"""{"CreateAttribute":{"name":${qs(n)},"config":{"input_semantics":${
        qs(semanticsName(c.inputSemantics))}}}}"""
    case Request.AdvanceDomain(dom, t) =>
      s"""{"AdvanceDomain":[${dom.map(qs).getOrElse("null")},{"TxId":$t}]}"""
    case Request.CloseInput(n) => s"""{"CloseInput":${qs(n)}}"""
  }

  // -------------------------------------------------------------- outputs

  /** Render a server output as the reference's serde JSON:
    * `{"QueryDiff":["name",[[[v,...],{"TxId":t},diff],...]]}` /
    * `{"Error":[client,{"df.error/category":...,"df.error/message":...},tx]}`.
    */
  def renderOutput(o: Output): String = o match {
    case Output.QueryDiff(name, batch) =>
      val rows = batch.map { case (tuple, t, d) =>
        s"""[[${tuple.map(renderValue).mkString(",")}],{"TxId":$t},$d]"""
      }
      s"""{"QueryDiff":[${qs(name)},[${rows.mkString(",")}]]}"""
    case Output.Error(client, category, message, tx) =>
      s"""{"Error":[$client,{"df.error/category":${qs(category)},"df.error/message":${
        qs(message)}},$tx]}"""
    case Output.Message(client, json) =>
      s"""{"Message":[$client,$json]}"""
    case Output.Json(name, json, t, d) =>
      s"""{"Json":[${qs(name)},$json,{"TxId":$t},$d]}"""
  }

  /** Re-render a parsed JSON value (used to carry `Message` payloads
    * through verbatim). */
  def renderJson(j: J): String = j match {
    case JNull        => "null"
    case JBool(b)     => b.toString
    case n: JNum      => n.raw
    case JStr(s)      => qs(s)
    case JArr(items)  => items.map(renderJson).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.map { case (k, v) => s"${qs(k)}:${renderJson(v)}" }
        .mkString("{", ",", "}")
  }

  /** Parse a server output (the client side of [[renderOutput]]). */
  def parseOutput(json: String): Output = parseJson(json) match {
    case o: JObj => o.fields match {
      case Vector(("QueryDiff", JArr(Vector(JStr(name), JArr(rows))))) =>
        Output.QueryDiff(name, rows.map {
          case JArr(Vector(JArr(vs), t, d)) =>
            (vs.map(valueOf), timeOf(t), long(d))
          case other => sys.error(s"malformed result diff: $other")
        })
      case Vector(("Error", JArr(Vector(client, eo: JObj, tx)))) =>
        Output.Error(long(client),
          eo.get("df.error/category").map(str).getOrElse(""),
          eo.get("df.error/message").map(str).getOrElse(""), long(tx))
      case Vector(("Message", JArr(Vector(client, payload)))) =>
        Output.Message(long(client), renderJson(payload))
      case Vector(("Json", JArr(Vector(JStr(name), payload, t, d)))) =>
        Output.Json(name, renderJson(payload), timeOf(t), long(d))
      case other => sys.error(s"unknown output: $other")
    }
    case other => sys.error(s"unknown output: $other")
  }

  // --------------------------------------------------------------- pieces

  // ------------------------------------------- bitemporal domain wire

  /** `Time::Bi(Duration, u64)` (`src/timestamp/mod.rs:13-20`):
    * `{"Bi":[{"secs":s,"nanos":n}, event]}` — the sys coordinate maps to
    * epoch-ms exactly like `Real`; a bare `[sys, event]` number pair or
    * `{"Bi":[sysMs, event]}` is accepted as the lenient CLI shape. */
  def biTimeOf(j: J): (Long, Long) = j match {
    case JArr(Vector(s: JNum, e: JNum)) => (long(s), long(e))
    case o: JObj =>
      o.fields match {
        case Vector(("Bi", JArr(Vector(d, e)))) =>
          val sysMs = d match {
            case n: JNum => long(n)
            case ro: JObj => long(ro.get("secs").get) * 1000L +
              long(ro.get("nanos").get) / 1000000L
            case other => scala.sys.error(s"unsupported bi sys time: $other")
          }
          (sysMs, long(e))
        case other => scala.sys.error(s"unsupported bi time: $other")
      }
    case other => scala.sys.error(s"unsupported bi time: $other")
  }

  def renderBiTime(t: (Long, Long)): String =
    s"""{"Bi":[{"secs":${t._1 / 1000L},"nanos":${(t._1 % 1000L) * 1000000L}},${t._2}]}"""

  /** Bitemporal-domain request surface: the SAME reference `Request`
    * grammar, read with `Time::Bi` where the unitemporal server reads
    * `TxId`/`Real` — Transact datoms carry pair times, an Interest
    * granularity is a pair window, AdvanceDomain advances the system
    * frontier. Every other request passes through unchanged (one domain
    * type per server process, as the reference runs). */
  sealed trait BiWireReq
  object BiWireReq {
    final case class BiTransact(
        datoms: Seq[(Long, String, Value, (Long, Long), Long)]) extends BiWireReq
    final case class BiInterest(name: String,
        granularity: Option[(Long, Long)],
        sink: Option[Request.SinkSpec]) extends BiWireReq
    final case class BiAdvance(sys: Long) extends BiWireReq
    final case class Passthrough(r: Request) extends BiWireReq
  }

  def parseBiRequests(json: String): Seq[BiWireReq] = {
    def one(j: J): BiWireReq = j match {
      case o: JObj =>
        o.fields match {
          case Vector(("Transact", JArr(ds))) =>
            BiWireReq.BiTransact(ds.map {
              case JArr(Vector(e, JStr(a), v, t, d)) =>
                (eidOf(e), a, valueOf(v), biTimeOf(t), long(d))
              case other => scala.sys.error(s"malformed bi datom: $other")
            })
          case Vector(("Interest", io: JObj)) =>
            BiWireReq.BiInterest(str(io.get("name").get),
              io.get("granularity").filter(_ != JNull).map(biTimeOf),
              io.get("sink").filter(_ != JNull).map(sinkOf))
          case Vector(("AdvanceDomain", JArr(Vector(_, t)))) =>
            val sysT = t match {
              case to: JObj if to.fields.exists(_._1 == "Bi") => biTimeOf(t)._1
              case _ => timeOf(t)
            }
            BiWireReq.BiAdvance(sysT)
          case _ => BiWireReq.Passthrough(requestOf(j))
        }
      case _ => BiWireReq.Passthrough(requestOf(j))
    }
    parseJson(json) match {
      case JArr(items) => items.map(one)
      case single      => Seq(one(single))
    }
  }

  /** `Output::Json` with a `Time::Bi` coordinate — the bi twin of
    * `renderOutput`'s Json case (per-client AssocIn/JsonDoc sinks are
    * timestamp-generic in the reference, like the rest of the loop). */
  def renderBiJson(name: String, json: String, t: (Long, Long),
      d: Long): String =
    s"""{"Json":[${qs(name)},$json,${renderBiTime(t)},$d]}"""

  /** `Output::QueryDiff` with `Time::Bi` coordinates. */
  def renderBiQueryDiff(name: String,
      batch: Seq[(Seq[Value], (Long, Long), Long)]): String = {
    val rows = batch.map { case (tuple, t, d) =>
      s"""[[${tuple.map(renderValue).mkString(",")}],${renderBiTime(t)},$d]"""
    }
    s"""{"QueryDiff":[${qs(name)},[${rows.mkString(",")}]]}"""
  }

  def datomOf(j: J): Datom = j match {
    case JArr(Vector(e, JStr(a), v, t, d)) =>
      Datom(eidOf(e), a, valueOf(v),
        if (t == JNull) None else Some(timeOf(t)), long(d))
    // Older CLI TxData shape — (diff, e, a, v, t), as in the reference's
    // own cli/examples/changes.json (predates the current Datom derive).
    case JArr(Vector(d: JNum, e, JStr(a), v, t)) =>
      Datom(eidOf(e), a, valueOf(v),
        if (t == JNull) None else Some(timeOf(t)), long(d))
    case other => sys.error(s"malformed datom: $other")
  }

  /** Entity position: bare number or tagged `{"Eid": n}`. */
  private def eidOf(j: J): Long = j match {
    case o: JObj => o.fields match {
      case Vector(("Eid", n: JNum)) => long(n)
      case other                    => sys.error(s"malformed entity id: $other")
    }
    case other => long(other)
  }

  def renderDatom(d: Datom): String =
    s"""[${d.e},${qs(d.a)},${renderValue(d.v)},${
      d.t.map(t => s"""{"TxId":$t}""").getOrElse("null")},${d.diff}]"""

  def valueOf(j: J): Value = j match {
    case JStr(s)     => Value.VString(s)
    case JBool(b)    => Value.VBool(b)
    case n: JNum     => Value.VNumber(long(n))
    case o: JObj =>
      o.fields match {
        case Vector(("Aid", JStr(s)))      => Value.VAid(s)
        case Vector(("String", JStr(s)))   => Value.VString(s)
        case Vector(("Bool", JBool(b)))    => Value.VBool(b)
        case Vector(("Number", n: JNum))   => Value.VNumber(long(n))
        case Vector(("Eid", n: JNum))      => Value.VEid(long(n))
        case Vector(("Instant", n: JNum))  => Value.VInstant(long(n))
        case Vector(("Uuid", JStr(s)))     => Value.VUuid(s)
        case Vector(("Rational32", JArr(Vector(p, q)))) =>
          Value.VRational(long(p), long(q))
        case Vector(("Real", n: JNum))     => Value.VReal(n.n)
        case other => sys.error(s"unknown value: $other")
      }
    case other => sys.error(s"unknown value: $other")
  }

  def renderValue(v: Value): String = v match {
    case Value.VString(s)      => qs(s)
    case Value.VBool(b)        => b.toString
    case Value.VNumber(n)      => n.toString
    case Value.VAid(s)         => s"""{"Aid":${qs(s)}}"""
    case Value.VEid(e)         => s"""{"Eid":$e}"""
    case Value.VInstant(ms)    => s"""{"Instant":$ms}"""
    case Value.VUuid(s)        => s"""{"Uuid":${qs(s)}}"""
    case Value.VRational(p, q) => s"""{"Rational32":[$p,$q]}"""
    case Value.VReal(d)        => s"""{"Real":$d}"""
  }

  /** `Time`: logical tx ids pass through; `Real` durations map to epoch-ms
    * (the engine's single clock). Bare numbers are accepted. */
  def timeOf(j: J): Long = j match {
    case n: JNum => long(n)
    case o: JObj =>
      o.fields match {
        case Vector(("TxId", n: JNum)) => long(n)
        case Vector(("Real", ro: JObj)) =>
          long(ro.get("secs").get) * 1000L +
            long(ro.get("nanos").get) / 1000000L
        case other => sys.error(s"unsupported time: $other")
      }
    case other => sys.error(s"unsupported time: $other")
  }

  /** `Sink` (`src/sinks/mod.rs:56-65`), externally tagged like every other
    * enum: `{"TheVoid":null|"path"}`, `{"AssocIn":{"stateful":n|null}}`. */
  def sinkOf(j: J): Request.SinkSpec = j match {
    case o: JObj =>
      o.fields match {
        case Vector(("TheVoid", JNull))   => Request.SinkSpec.TheVoid(None)
        case Vector(("TheVoid", p))       => Request.SinkSpec.TheVoid(Some(str(p)))
        case Vector(("AssocIn", ao: JObj)) =>
          Request.SinkSpec.AssocIn(
            ao.get("stateful").filter(_ != JNull).map(int))
        case Vector(("CsvFile", co: JObj)) =>
          // Reference field shape (src/sinks/csv_file.rs:14-24): path,
          // has_headers, delimiter (a byte), flexible.
          Request.SinkSpec.CsvFile(
            str(co.get("path").getOrElse(sys.error("CsvFile sink needs a path"))),
            co.get("has_headers").filter(_ != JNull).map(bool).getOrElse(true),
            co.get("delimiter").filter(_ != JNull).map(int(_).toChar).getOrElse(','),
            co.get("flexible").filter(_ != JNull).map(bool).getOrElse(false))
        case Vector(("ParquetDir", JStr(p))) => Request.SinkSpec.ParquetDir(p)
        case Vector(("ParquetDir", po: JObj)) =>
          Request.SinkSpec.ParquetDir(str(po.get("path")
            .getOrElse(sys.error("ParquetDir sink needs a path"))))
        case Vector(("JsonDoc", JNull)) => Request.SinkSpec.JsonDoc(Seq.empty)
        case Vector(("JsonDoc", jo: JObj)) =>
          Request.SinkSpec.JsonDoc(
            jo.get("required_aids").filter(_ != JNull) match {
              case Some(JArr(items)) => items.map(str).toSeq
              case _                 => Seq.empty
            })
        case other => sys.error(s"unsupported sink: $other")
      }
    case other => sys.error(s"unsupported sink: $other")
  }

  def renderSink(s: Request.SinkSpec): String = s match {
    case Request.SinkSpec.TheVoid(p) =>
      s"""{"TheVoid":${p.map(qs).getOrElse("null")}}"""
    case Request.SinkSpec.AssocIn(st) =>
      s"""{"AssocIn":{"stateful":${st.map(_.toString).getOrElse("null")}}}"""
    case Request.SinkSpec.CsvFile(path, headers, delim, flex) =>
      s"""{"CsvFile":{"path":${qs(path)},"has_headers":$headers,""" +
        s""""delimiter":${delim.toInt},"flexible":$flex}}"""
    case Request.SinkSpec.JsonDoc(aids) =>
      if (aids.isEmpty) """{"JsonDoc":null}"""
      else s"""{"JsonDoc":{"required_aids":[${aids.map(qs).mkString(",")}]}}"""
    case Request.SinkSpec.ParquetDir(path) =>
      s"""{"ParquetDir":{"path":${qs(path)}}}"""
  }

  def ruleOf(j: J): Rule = j match {
    case o: JObj => Rule(str(o.get("name").get), planOf(o.get("plan").get))
    case other   => sys.error(s"malformed rule: $other")
  }

  def renderRule(r: Rule): String =
    s"""{"name":${qs(r.name)},"plan":${renderPlan(r.plan)}}"""

  def planOf(j: J): Plan = j match {
    case o: JObj =>
      o.fields match {
        case Vector(("MatchA", JArr(Vector(e, JStr(a), v)))) =>
          Plan.MatchA(int(e), a, int(v))
        case Vector(("MatchEA", JArr(Vector(e, JStr(a), v)))) =>
          Plan.MatchEA(long(e), a, int(v))
        case Vector(("MatchAV", JArr(Vector(e, JStr(a), v)))) =>
          Plan.MatchAV(int(e), a, valueOf(v))
        case Vector(("Project", po: JObj)) =>
          Plan.Project(vars(po.get("variables").get), planOf(po.get("plan").get))
        case Vector(("Join", jo: JObj)) =>
          Plan.Join(vars(jo.get("variables").get),
            planOf(jo.get("left_plan").get), planOf(jo.get("right_plan").get))
        case Vector(("Hector", ho: JObj)) =>
          Plan.Hector(vars(ho.get("variables").get),
            arr(ho.get("bindings").get).map(bindingOf))
        case Vector(("Antijoin", ao: JObj)) =>
          Plan.Antijoin(vars(ao.get("variables").get),
            planOf(ao.get("left_plan").get), planOf(ao.get("right_plan").get))
        case Vector(("Negate", p)) => Plan.Negate(planOf(p))
        case Vector(("Union", uo: JObj)) =>
          Plan.Union(vars(uo.get("variables").get),
            arr(uo.get("plans").get).map(planOf))
        case Vector(("Filter", fo: JObj)) =>
          Plan.Filter(vars(fo.get("variables").get),
            predicateOf(fo.get("predicate").get),
            planOf(fo.get("plan").get),
            arr(fo.get("constants").get).map(c =>
              if (c == JNull) None else Some(valueOf(c))))
        case Vector(("Transform", to: JObj)) =>
          Plan.Transform(vars(to.get("variables").get),
            int(to.get("result_variable").get),
            planOf(to.get("plan").get),
            fnOf(to.get("function").get),
            arr(to.get("constants").get).map(c =>
              if (c == JNull) None else Some(valueOf(c))))
        case Vector(("Aggregate", ao: JObj)) =>
          Plan.Aggregate(vars(ao.get("variables").get),
            planOf(ao.get("plan").get),
            arr(ao.get("aggregation_fns").get).map(aggFnOf),
            vars(ao.get("key_variables").get),
            vars(ao.get("aggregation_variables").get),
            vars(ao.get("with_variables").get))
        case Vector(("NameExpr", JArr(Vector(vs, JStr(name))))) =>
          Plan.NameExpr(vars(vs), name)
        case Vector(("PullLevel", po: JObj)) =>
          Plan.PullLevel(vars(po.get("variables").get),
            planOf(po.get("plan").get),
            int(po.get("pull_variable").get),
            arr(po.get("pull_attributes").get).map(str),
            arr(po.get("path_attributes").get).map(str),
            po.get("cardinality_many").contains(JBool(true)))
        case Vector(("Pull", po: JObj)) =>
          Plan.Pull(vars(po.get("variables").get),
            arr(po.get("paths").get).map(planOf))
        case Vector(("PullAll", po: JObj)) =>
          Plan.PullAll(vars(po.get("variables").get),
            arr(po.get("pull_attributes").get).map(str))
        case other => sys.error(s"unknown plan: $other")
      }
    case other => sys.error(s"unknown plan: $other")
  }

  def renderPlan(p: Plan): String = p match {
    case Plan.MatchA(e, a, v)  => s"""{"MatchA":[$e,${qs(a)},$v]}"""
    case Plan.MatchEA(e, a, v) => s"""{"MatchEA":[$e,${qs(a)},$v]}"""
    case Plan.MatchAV(e, a, v) => s"""{"MatchAV":[$e,${qs(a)},${renderValue(v)}]}"""
    case Plan.Project(vs, x) =>
      s"""{"Project":{"variables":${ints(vs)},"plan":${renderPlan(x)}}}"""
    case Plan.Join(vs, l, r) =>
      s"""{"Join":{"variables":${ints(vs)},"left_plan":${renderPlan(l)},"right_plan":${renderPlan(r)}}}"""
    case Plan.Hector(vs, bs) =>
      s"""{"Hector":{"variables":${ints(vs)},"bindings":[${bs.map(renderBinding).mkString(",")}]}}"""
    case Plan.Antijoin(vs, l, r) =>
      s"""{"Antijoin":{"variables":${ints(vs)},"left_plan":${renderPlan(l)},"right_plan":${renderPlan(r)}}}"""
    case Plan.Negate(x) => s"""{"Negate":${renderPlan(x)}}"""
    case Plan.Union(vs, ps) =>
      s"""{"Union":{"variables":${ints(vs)},"plans":[${ps.map(renderPlan).mkString(",")}]}}"""
    case Plan.Filter(vs, pred, x, cs) =>
      s"""{"Filter":{"variables":${ints(vs)},"predicate":${qs(predName(pred))},"plan":${
        renderPlan(x)},"constants":[${cs.map(_.map(renderValue).getOrElse("null")).mkString(",")}]}}"""
    case Plan.Transform(vs, rv, x, f, cs) =>
      s"""{"Transform":{"variables":${ints(vs)},"result_variable":$rv,"plan":${
        renderPlan(x)},"function":${qs(fnName(f))},"constants":[${
        cs.map(_.map(renderValue).getOrElse("null")).mkString(",")}]}}"""
    case Plan.Aggregate(vs, x, fns, ks, as_, ws) =>
      s"""{"Aggregate":{"variables":${ints(vs)},"plan":${renderPlan(x)},"aggregation_fns":[${
        fns.map(f => qs(aggName(f))).mkString(",")}],"key_variables":${ints(ks)},"aggregation_variables":${
        ints(as_)},"with_variables":${ints(ws)}}}"""
    case Plan.NameExpr(vs, n) => s"""{"NameExpr":[${ints(vs)},${qs(n)}]}"""
    case Plan.PullLevel(vs, x, pv, pas, paths, cm) =>
      s"""{"PullLevel":{"variables":${ints(vs)},"plan":${renderPlan(x)},"pull_variable":$pv,"pull_attributes":[${
        pas.map(qs).mkString(",")}],"path_attributes":[${paths.map(qs).mkString(",")}],"cardinality_many":$cm}}"""
    case Plan.Pull(vs, paths) =>
      s"""{"Pull":{"variables":${ints(vs)},"paths":[${paths.map(renderPlan).mkString(",")}]}}"""
    case Plan.PullAll(vs, pas) =>
      s"""{"PullAll":{"variables":${ints(vs)},"pull_attributes":[${pas.map(qs).mkString(",")}]}}"""
  }

  def bindingOf(j: J): Binding = j match {
    case o: JObj =>
      o.fields match {
        case Vector(("Attribute", ao: JObj)) =>
          val Seq(e, v) = pair(ao.get("variables").get)
          Binding.Attr(e, str(ao.get("source_attribute").get), v)
        case Vector(("Constant", co: JObj)) =>
          Binding.Const(int(co.get("variable").get), valueOf(co.get("value").get))
        case Vector(("BinaryPredicate", bo: JObj)) =>
          val Seq(x, y) = pair(bo.get("variables").get)
          Binding.BinaryPred(x, y, predicateOf(bo.get("predicate").get))
        case Vector(("Not", no: JObj)) =>
          Binding.Not(bindingOf(no.get("binding").get))
        case other => sys.error(s"unknown binding: $other")
      }
    case other => sys.error(s"unknown binding: $other")
  }

  def renderBinding(b: Binding): String = b match {
    case Binding.Attr(e, a, v) =>
      s"""{"Attribute":{"variables":[$e,$v],"source_attribute":${qs(a)}}}"""
    case Binding.Const(x, v) =>
      s"""{"Constant":{"variable":$x,"value":${renderValue(v)}}}"""
    case Binding.BinaryPred(x, y, p) =>
      s"""{"BinaryPredicate":{"variables":[$x,$y],"predicate":${qs(predName(p))}}}"""
    case Binding.Not(inner) =>
      s"""{"Not":{"binding":${renderBinding(inner)}}}"""
  }

  private def configOf(j: J): AttributeConfig = j match {
    case o: JObj =>
      val sem = o.get("input_semantics").map(str).getOrElse("Raw") match {
        case "Raw"           => InputSemantics.Raw
        case "LastWriteWins" => InputSemantics.LastWriteWins
        case "CardinalityOne" => InputSemantics.LastWriteWins
        case "Distinct"      => InputSemantics.Distinct
        case other           => sys.error(s"unknown input semantics $other")
      }
      val slack = o.get("trace_slack").filter(_ != JNull).map(timeOf)
      AttributeConfig(sem, slack)
    case _ => AttributeConfig()
  }

  private def semanticsName(s: InputSemantics): String = s match {
    case InputSemantics.Raw           => "Raw"
    case InputSemantics.LastWriteWins => "LastWriteWins"
    case InputSemantics.Distinct      => "Distinct"
  }

  private def predicateOf(j: J): Predicate = str(j) match {
    case "LT" => Predicate.LT; case "GT" => Predicate.GT
    case "LTE" => Predicate.LTE; case "GTE" => Predicate.GTE
    case "EQ" => Predicate.EQ; case "NEQ" => Predicate.NEQ
    case other => sys.error(s"unknown predicate $other")
  }
  private def predName(p: Predicate): String = p.toString

  private def fnOf(j: J): Fn = str(j) match {
    case "TRUNCATE" => Fn.TRUNCATE
    case "ADD"      => Fn.ADD
    case "SUBTRACT" => Fn.SUBTRACT
    case other      => sys.error(s"unknown function $other")
  }
  private def fnName(f: Fn): String = f.toString

  private def aggFnOf(j: J): AggregationFn = str(j) match {
    case "MIN" => AggregationFn.MIN; case "MAX" => AggregationFn.MAX
    case "MEDIAN" => AggregationFn.MEDIAN; case "COUNT" => AggregationFn.COUNT
    case "SUM" => AggregationFn.SUM; case "AVG" => AggregationFn.AVG
    case "VARIANCE" => AggregationFn.VARIANCE
    case other => sys.error(s"unknown aggregation $other")
  }
  private def aggName(f: AggregationFn): String = f.toString

  // ------------------------------------------------------ JSON primitives

  private def str(j: J): String = j match {
    case JStr(s) => s
    case other   => sys.error(s"expected string, got $other")
  }
  private def arr(j: J): Seq[J] = j match {
    case JArr(items) => items
    case other       => sys.error(s"expected array, got $other")
  }
  private def long(j: J): Long = j match {
    // The reference's Number/Eid/Instant/TxId are integers (i64) — a
    // fractional or exponent literal here is a malformed payload, not
    // something to silently truncate.
    case n: JNum =>
      require(!(n.raw.contains('.') || n.raw.contains('e') || n.raw.contains('E')),
        s"expected an integer, got ${n.raw}")
      java.lang.Long.parseLong(n.raw)
    case other => sys.error(s"expected number, got $other")
  }
  private def int(j: J): Int = long(j).toInt
  private def bool(j: J): Boolean = j match {
    case JBool(b) => b
    case other    => sys.error(s"expected bool, got $other")
  }
  private def vars(j: J): Seq[Int] = arr(j).map(int)
  private def pair(j: J): Seq[Int] = vars(j)
  private def ints(vs: Seq[Int]): String = vs.mkString("[", ",", "]")

  private[server] def qs(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Minimal recursive-descent JSON parser (lenient: trailing commas
    * tolerated, as seen in the reference CLI examples). */
  def parseJson(input: String): J = {
    var pos = 0
    def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    // Bounds-checked cursor: truncated documents fail with a parse error,
    // not a StringIndexOutOfBoundsException.
    def cur(): Char = {
      require(pos < input.length, s"unexpected end of JSON input at $pos")
      input(pos)
    }
    def expect(c: Char): Unit = {
      ws(); require(pos < input.length && input(pos) == c,
        s"expected '$c' at $pos"); pos += 1
    }
    // Literals must be spelled exactly — 'trXX' is an error, not `true`.
    def literal(word: String): Unit = {
      require(input.regionMatches(pos, word, 0, word.length),
        s"malformed literal at $pos (expected $word)")
      pos += word.length
    }
    def value(): J = {
      ws()
      cur() match {
        case '{' =>
          pos += 1
          val fields = Vector.newBuilder[(String, J)]
          ws()
          while (cur() != '}') {
            ws()
            val k = string()
            expect(':')
            fields += (k -> value())
            ws()
            if (cur() == ',') { pos += 1; ws() }
          }
          pos += 1
          JObj(fields.result())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[J]
          ws()
          while (cur() != ']') {
            items += value()
            ws()
            if (cur() == ',') { pos += 1; ws() }
          }
          pos += 1
          JArr(items.result())
        case '"' => JStr(string())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ =>
          val start = pos
          while (pos < input.length && "+-0123456789.eE".contains(input(pos))) pos += 1
          val raw = input.substring(start, pos)
          require(raw.nonEmpty, s"expected a JSON value at $start")
          JNum(raw.toDouble, raw)
      }
    }
    def string(): String = {
      ws()
      require(cur() == '"', s"expected string at $pos")
      pos += 1
      val sb = new StringBuilder
      while (cur() != '"') {
        if (input(pos) == '\\') {
          pos += 1
          cur() match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' =>
              require(pos + 5 <= input.length, s"truncated \\u escape at $pos")
              sb += Integer.parseInt(input.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case c => sb += c
          }
        } else sb += input(pos)
        pos += 1
      }
      pos += 1
      sb.toString
    }
    val v = value()
    ws()
    require(pos == input.length, s"trailing JSON input at $pos")
    v
  }
}
