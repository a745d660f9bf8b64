package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._
import graft.server.{Request, Wire}

/** serde-JSON wire format round-trips (`server/tests/serialization.rs`) and
  * a full request-driven engine session. */
class WireSpec extends AnyFunSuite {

  test("Value serialization matches the reference (serialization.rs)") {
    assert(Wire.renderValue(Value.VAid(":edge")) == """{"Aid":":edge"}""")
    assert(Wire.renderValue(Value.str("foo")) == "\"foo\"")
    assert(Wire.renderValue(Value.bool(true)) == "true")
    assert(Wire.renderValue(Value.num(44)) == "44")
    assert(Wire.renderValue(Value.VInstant(0)) == """{"Instant":0}""")
    assert(Wire.renderValue(Value.VUuid("71828aae-4fc8-421b-82ca-68c5f4981d74"))
      == """{"Uuid":"71828aae-4fc8-421b-82ca-68c5f4981d74"}""")
  }

  test("values, datoms, plans, bindings round-trip through JSON") {
    val values = Seq(
      Value.VAid(":a"), Value.str("s"), Value.bool(false), Value.num(-7),
      Value.eid(42), Value.VInstant(1234), Value.VUuid("u"),
      Value.rational(1, 3))
    values.foreach { v =>
      assert(Wire.valueOf(Wire.parseJson(Wire.renderValue(v))) == v)
    }

    val datom = Datom.addAt(5L, ":person/name", Value.str("alice"), 3L)
    assert(Wire.datomOf(Wire.parseJson(Wire.renderDatom(datom))) == datom)

    val plan: Plan = Hector(Seq(0, 1, 2), Seq(
      Binding.attribute(0, ":orders/custkey", 1),
      Binding.constant(2, Value.str("BUILDING")),
      Binding.binaryPredicate(Predicate.GT, 1, 2),
      Binding.not(0, ":blocked", 3)))
    assert(Wire.planOf(Wire.parseJson(Wire.renderPlan(plan))) == plan)

    val nested: Plan = Aggregate(Seq(0, 1),
      Union(Seq(0, 1), Seq(
        Project(Seq(0, 1), Join(Seq(0), MatchA(0, ":x", 1), Negate(MatchA(0, ":y", 1)))),
        Filter(Seq(1), Predicate.LT, MatchEA(9, ":z", 1), Seq(None, Some(Value.num(5)))),
        Transform(Seq(1), 2, NameExpr(Seq(0, 1), "r"), Fn.ADD, Seq(Some(Value.num(1)))))),
      Seq(AggregationFn.SUM), Seq(0), Seq(1), Seq.empty)
    assert(Wire.planOf(Wire.parseJson(Wire.renderPlan(nested))) == nested)

    // Interest with a sink configuration round-trips (reference
    // Interest.sink, src/server/mod.rs:110-119 + Sink, src/sinks/mod.rs).
    Seq[Request](
      Request.Interest("q", Some(10L),
        Some(Request.SinkSpec.TheVoid(Some("/tmp/void.log"))), Some(true)),
      Request.Interest("q", None,
        Some(Request.SinkSpec.AssocIn(Some(2))), None),
      Request.Interest("q", None,
        Some(Request.SinkSpec.AssocIn(None)), None),
      Request.Interest("q", None,
        Some(Request.SinkSpec.CsvFile("/tmp/out.csv", hasHeaders = true,
          delimiter = ';', flexible = false)), None),
      Request.Interest("q", None,
        Some(Request.SinkSpec.JsonDoc(Seq.empty)), None),
      Request.Interest("q", None,
        Some(Request.SinkSpec.JsonDoc(Seq(":doc/title", ":doc/body"))), None),
      Request.Interest("q", None,
        Some(Request.SinkSpec.ParquetDir("/tmp/out_pq")), None),
      // RegisterSource round-trips, including the timestamp_offset the
      // bitemporal domain reads as the event coordinate.
      Request.RegisterSource(graft.sources.FileSources.CsvFile(
        path = "/tmp/in.csv", hasHeaders = true, delimiter = ",",
        comment = None, eidOffset = 0,
        schema = Seq(":src/x" -> ((1, graft.model.ValueKind.KNumber))),
        tsOffset = Some(2))),
      Request.RegisterSource(graft.sources.FileSources.CsvFile(
        path = "/tmp/in.csv", hasHeaders = false, delimiter = "|",
        comment = None, eidOffset = 0,
        schema = Seq(":src/s" -> ((1, graft.model.ValueKind.KString))),
        tsOffset = None)),
      // ParquetFile (beyond-parity): named columns, optional
      // timestamp_column, Real/Instant hints allowed.
      Request.RegisterSource(graft.sources.FileSources.ParquetFile(
        path = "/tmp/in.parquet", eidColumn = "doc_id",
        attributes = Seq(
          ":doc/lang" -> (("lang", graft.model.ValueKind.KString)),
          ":doc/score" -> (("score", graft.model.ValueKind.KReal))),
        tsColumn = Some("ts"))),
      Request.RegisterSource(graft.sources.FileSources.ParquetFile(
        path = "/tmp/in.parquet", eidColumn = "id",
        attributes = Seq(":doc/n" -> (("n", graft.model.ValueKind.KNumber))),
        tsColumn = None))
    ).foreach { r =>
      assert(Wire.parseRequests(Wire.renderRequest(r)) == Seq(r))
    }
  }

  test("tagged scalar values from older clients are accepted") {
    assert(Wire.valueOf(Wire.parseJson("""{"String":"Peter"}""")) == Value.str("Peter"))
    assert(Wire.valueOf(Wire.parseJson("""{"Number":43}""")) == Value.num(43))
    assert(Wire.valueOf(Wire.parseJson("""{"Eid":100}""")) == Value.eid(100))
  }

  test("a JSON request session drives the engine end-to-end") {
    val engine = new Engine(TestSpark.spark)
    val session = Seq(
      """{"CreateAttribute":{"name":":age","config":{"input_semantics":"Distinct"}}}""",
      """{"Register":{"rules":[{"name":"adults","plan":
           {"Filter":{"variables":[1],"predicate":"GTE",
                      "plan":{"MatchA":[0,":age",1]},
                      "constants":[null,{"Number":18}]}}}],"publish":["adults"]}}""",
      """{"Interest":{"name":"adults","granularity":null}}""",
      """{"Transact":[[1,":age",33,null,1],[2,":age",12,null,1],[3,":age",18,null,1]]}""",
      """{"AdvanceDomain":[null,{"TxId":1}]}""")
    session.foreach(s => engine.handle(Wire.parseRequests(s).head))
    val got = engine.drain("adults").toSet
    assert(got == Set(
      (Seq(1L, 33L), 0L, 1L),
      (Seq(3L, 18L), 0L, 1L)))

    // Uninterest drops tracking; subsequent advances emit nothing for it.
    engine.handle(Wire.parseRequests("""{"Uninterest":"adults"}""").head)
    engine.handle(Wire.parseRequests(
      """{"Transact":[[4,":age",99,null,1]]}""").head)
    engine.handle(Wire.parseRequests("""{"AdvanceDomain":[null,{"TxId":2}]}""").head)
    assert(engine.drain("adults").isEmpty)
  }

  test("Derive registers and subscribes a GraphQL-derived rule") {
    val engine = new Engine(TestSpark.spark)
    engine.createAttribute("hero", AttributeConfig(InputSemantics.Distinct))
    engine.createAttribute("name", AttributeConfig(InputSemantics.Distinct))
    engine.handle(Wire.parseRequests(
      """{"Derive":["heroes","{ hero { name } }"]}""").head)
    engine.transact(Seq(
      Datom.add(1L, "hero", Value.eid(7)),
      Datom.add(7L, "name", Value.str("alice"))))
    engine.advance(1)
    val got = engine.drain("heroes").map { case (t, _, d) => (t, d) }.toSet
    assert(got == Set(
      (Seq(1L, "hero", "name", "alice"), 1L),
      (Seq(1L, "hero", "db__id", 7L), 1L)))
  }

  test("Subscribe delivers whole-attribute diffs; CloseInput rejects writes") {
    val engine = new Engine(TestSpark.spark)
    engine.createAttribute(":tag", AttributeConfig(InputSemantics.Distinct))
    engine.handle(Wire.parseRequests("""{"Subscribe":":tag"}""").head)
    engine.transact(Seq(Datom.add(1L, ":tag", Value.str("x"))))
    engine.advance(1)
    assert(engine.drain(":tag") == Seq((Seq(1L, "x"), 0L, 1L)))

    engine.handle(Wire.parseRequests("""{"CloseInput":":tag"}""").head)
    val ex = intercept[GraftError] {
      engine.transact(Seq(Datom.add(2L, ":tag", Value.str("y"))))
    }
    assert(ex.getMessage.contains("closed"))
    assert(ex.category == "df.error.category/conflict")
  }

  test("interest granularity coarsens emitted times and delays delivery") {
    val engine = new Engine(TestSpark.spark)
    engine.createAttribute(":v", AttributeConfig(InputSemantics.Distinct))
    engine.register(Rule("q", matchA(0, ":v", 1)))
    engine.interest("q", granularity = Some(10L))
    engine.transact(Seq(Datom.addAt(1L, ":v", Value.num(5), 3L)))
    engine.advance(4)
    // 3 coarsens to bound 10, which has not completed at frontier 4 — the
    // diff is held back (the reference delays until the bound completes).
    assert(engine.drain("q") == Seq.empty)
    engine.advance(11)
    assert(engine.drain("q") == Seq((Seq(1L, 5L), 10L, 1L)))
    // Exact multiples coarsen strictly up: t=20 → bound 30.
    engine.transact(Seq(Datom.addAt(2L, ":v", Value.num(7), 20L)))
    engine.advance(31)
    assert(engine.drain("q") == Seq((Seq(2L, 7L), 30L, 1L)))
  }
}
