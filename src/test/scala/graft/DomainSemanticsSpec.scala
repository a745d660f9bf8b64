package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._
import graft.model.Value._

/** Ports of the reference's domain / registration suites: epoch advance
  * rules (`tests/domain_test.rs:9-22`) and late query registration against
  * already-ingested inputs (`tests/registration_test.rs`). */
class DomainSemanticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("advance_epoch: same-epoch ok, rewind errors (domain_test.rs:9)") {
    val engine = new Engine(spark)
    engine.createAttribute(":x")
    engine.register(Rule("q", matchA(0, ":x", 1)))
    engine.interest("q")
    engine.advance(1)
    engine.advance(1) // advancing to the current epoch is a no-op
    val ex = intercept[GraftError] { engine.advance(0) }
    assert(ex.getMessage.contains("rewind"))
    assert(ex.category == "df.error.category/conflict")
  }

  test("match_ea after input (registration_test.rs:11)") {
    val engine = new Engine(spark)
    engine.createAttribute(":name", AttributeConfig(InputSemantics.Distinct))
    engine.transact(Seq(
      Datom.add(1, ":name", str("Dipper")),
      Datom.add(1, ":name", str("Alias")),
      Datom.add(2, ":name", str("Mabel"))))
    engine.advance(1)

    // Query registered AFTER the data was ingested and the domain advanced:
    // the subscriber receives the accumulated state as initial diffs.
    engine.register(Rule("match_ea", MatchEA(1, ":name", 1)))
    engine.interest("match_ea")
    engine.advance(2)

    val got = engine.drain("match_ea").map { case (tuple, _, d) => (tuple, d) }.toSet
    assert(got == Set((Seq("Alias"), 1L), (Seq("Dipper"), 1L)))
  }

  test("join after input (registration_test.rs:66)") {
    val engine = new Engine(spark)
    engine.createAttribute(":transfer/from", AttributeConfig(InputSemantics.Distinct))
    engine.createAttribute(":user/id", AttributeConfig(InputSemantics.Distinct))
    engine.advance(1)
    engine.transact(Seq(Datom.add(1, ":user/id", str("123-456-789"))))
    engine.advance(2)
    engine.transact(Seq(Datom.add(101, ":transfer/from", str("123-456-789"))))
    engine.advance(3)

    val (transfer, sender, uuid) = (1, 2, 3)
    engine.register(Rule("join", Project(Seq(transfer, sender),
      Join(Seq(uuid),
        matchA(transfer, ":transfer/from", uuid),
        matchA(sender, ":user/id", uuid)))))
    engine.interest("join")
    engine.advance(4)

    val got = engine.drain("join").map { case (tuple, _, d) => (tuple, d) }
    assert(got == Seq((Seq(101L, 1L), 1L)))
  }
}
