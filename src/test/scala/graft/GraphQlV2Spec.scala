package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.compile.Compiler
import graft.domain.Domain
import graft.model._
import graft.model.Plan._
import graft.model.Value._
import graft.plans.GraphQlV2
import graft.sinks.JsonDocSink

/** GraphQL v2 / pull_v2 (`src/plan/graphql_v2.rs`, `src/plan/pull_v2.rs`):
  * per-path keyed compilation, flattened batch document assembly, and the
  * incremental per-epoch snapshot sink.
  */
class GraphQlV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def heroData = Seq(
    Datom.add(100, "name", str("Alice")),
    Datom.add(100, "hero", bool(true)),
    Datom.add(200, "name", str("Bob")),
    Datom.add(200, "hero", bool(true)),
    Datom.add(300, "name", str("Mabel")),
    Datom.add(300, "hero", bool(true)),
    Datom.add(400, "name", str("Dipper")),
    Datom.add(400, "hero", bool(true)),
    Datom.add(300, "bested", eid(400)),
    Datom.add(200, "bested", eid(100)),
    Datom.add(300, "age", num(13)),
    Datom.add(400, "age", num(12)))

  private val heroRoot = Hector(Seq(0), Seq(Binding.attribute(0, "hero", 11111)))

  private def heroCompiler: Compiler = {
    val dom = new Domain(spark)
    Seq("name", "hero", "bested", "age").foreach(a => dom.createAttribute(a))
    dom.transact(heroData, 0L)
    new Compiler(dom.asOf(Long.MaxValue), Map.empty)
  }

  test("compilePullV2: homogeneous per-path frames keyed by path id") {
    val paths = GraphQlV2.pathRels(heroCompiler, "{ name bested { name age } }", heroRoot)
    assert(paths.map(_._1) ==
      Seq(Seq("bested", "age"), Seq("bested", "name"), Seq("name")))
    val byId = paths.toMap
    // Nested paths carry the full input tuple plus the pulled value.
    val bestedAge = byId(Seq("bested", "age")).df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bestedAge == Set((300L, 400L, 12L)))
    val bestedName = byId(Seq("bested", "name")).df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(bestedName == Set((300L, 400L, "Dipper"), (200L, 100L, "Alice")))
    val name = byId(Seq("name")).df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(name == Set((100L, "Alice"), (200L, "Bob"),
      (300L, "Mabel"), (400L, "Dipper")))
  }

  test("flatDocuments: [root, last_aid] flattening, MAX overwrite, excision") {
    val paths = GraphQlV2.pathRels(heroCompiler, "{ name bested { name age } }", heroRoot)
    val all = GraphQlV2.flatDocuments(paths)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // Nested names land on the ROOT under "name" (the v2 flattening);
    // duplicates resolve to MAX of the rendered value.
    assert(all("200") == """{"name":"Bob"}""")       // Bob > Alice
    assert(all("300") == """{"age":12,"name":"Mabel"}""")
    assert(all("400") == """{"name":"Dipper"}""")
    assert(all("100") == """{"name":"Alice"}""")
    // required_aids excises roots missing the key entirely.
    val kept = GraphQlV2.flatDocuments(paths, requiredAids = Seq("age"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(kept == Seq("300" -> """{"age":12,"name":"Mabel"}"""))
  }

  test("JsonDocSink: changed-root snapshots, overwrite, excision and revival") {
    val sink = new JsonDocSink(requiredAids = Seq("name"))
    // Epoch 1: root 1 complete; root 2 lacks "name" -> excised, unreported.
    val out1 = sink.advance(Seq(
      (Seq("name"), Seq(eid(1), str("a"))),
      (Seq("age"), Seq(eid(2), num(5)))))
    assert(out1 == Seq("1" -> """{"name":"a"}"""))
    assert(sink.snapshot.keySet == Set("1"))
    // Epoch 2: overwrite emits the FULL document of the changed root only;
    // nested tuples flatten to [root, leaf-aid].
    val out2 = sink.advance(Seq(
      (Seq("bested", "name"), Seq(eid(1), eid(9), str("z")))))
    assert(out2 == Seq("1" -> """{"name":"z"}"""))
    // Epoch 3: the excised root revives only with the required key present
    // (its pre-excision state is gone).
    val out3 = sink.advance(Seq(
      (Seq("age"), Seq(eid(2), num(6))),
      (Seq("name"), Seq(eid(2), str("b")))))
    assert(out3 == Seq("2" -> """{"age":6,"name":"b"}"""))
    // Untouched roots are not re-emitted.
    assert(!out3.exists(_._1 == "1"))
  }
}
