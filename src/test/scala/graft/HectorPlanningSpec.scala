package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.Value._
import graft.plans.PlanOrder._

/** Port of the reference's binding-planning unit tests
  * (`tests/hector_test.rs:28-165`). */
class HectorPlanningSpec extends AnyFunSuite {

  test("binding_requirements (hector_test.rs:28)") {
    val (a, b, c, d) = (0, 1, 2, 3)
    val edge = Binding.attribute(a, ":edge", b)
    assert(requiredToExtend(edge, Seq(a, c), d) == None)
    assert(requiredToExtend(edge, Seq(a, c), b) == Some(None))
    assert(requiredToExtend(edge, Seq(c, d), a) == Some(Some(b)))
    assert(requiredToExtend(edge, Seq(c, d), b) == Some(Some(a)))
  }

  test("binding_readiness (hector_test.rs:52)") {
    val (a, b, c, d) = (0, 1, 2, 3)
    assert(readyToExtend(Binding.constant(a, eid(100)), Seq(a, b)) == None)
    assert(readyToExtend(Binding.constant(a, eid(100)), Seq(c, d)) == Some(a))
    val edge = Binding.attribute(a, ":edge", b)
    assert(readyToExtend(edge, Seq(c, d)) == None)
    assert(readyToExtend(edge, Seq(a, c)) == Some(b))
    assert(readyToExtend(edge, Seq(c, a)) == Some(b))
    assert(readyToExtend(edge, Seq(c, b)) == Some(a))
    assert(readyToExtend(edge, Seq(b, c)) == Some(a))
  }

  test("conflicts (hector_test.rs:88)") {
    val (e, c, e2, a, n) = (0, 1, 2, 3, 4)
    val bindings = Seq(
      Binding.attribute(e2, ":age", a),
      Binding.attribute(e, ":age", a),
      Binding.attribute(e, ":name", c),
      Binding.attribute(e2, ":name", n),
      Binding.constant(c, str("Ivan")),
      Binding.Not(Binding.constant(c, str("Petr"))))
    assert(sourceConflicts(0, bindings).isEmpty)
    assert(sourceConflicts(2, bindings) == Seq(
      Binding.constant(c, str("Ivan")),
      Binding.Not(Binding.constant(c, str("Petr")))))
  }

  test("ordering (hector_test.rs:112)") {
    val (e, c, e2, a, n) = (0, 1, 2, 3, 4)
    val bindings = Seq(
      Binding.attribute(e2, ":age", a),
      Binding.attribute(e, ":age", a),
      Binding.attribute(e, ":name", c),
      Binding.attribute(e2, ":name", n),
      Binding.constant(c, str("Ivan")))

    {
      val (variableOrder, bindingOrder) = planOrder(0, bindings)
      assert(variableOrder == Seq(e2, a, e, n, c))
      assert(bindingOrder == Seq(
        Binding.attribute(e, ":age", a),
        Binding.attribute(e2, ":name", n),
        Binding.attribute(e, ":name", c),
        Binding.constant(c, str("Ivan"))))
    }
    {
      val (variableOrder, bindingOrder) = planOrder(1, bindings)
      assert(variableOrder == Seq(e, a, c, e2, n))
      assert(bindingOrder == Seq(
        Binding.attribute(e, ":name", c),
        Binding.attribute(e2, ":age", a),
        Binding.attribute(e2, ":name", n),
        Binding.constant(c, str("Ivan"))))
    }
    {
      val (variableOrder, bindingOrder) = planOrder(2, bindings)
      assert(variableOrder == Seq(e, c, a, e2, n))
      assert(bindingOrder == Seq(
        Binding.attribute(e, ":age", a),
        Binding.attribute(e2, ":age", a),
        Binding.attribute(e2, ":name", n),
        Binding.constant(c, str("Ivan"))))
    }
  }
}
