package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.Compiler
import graft.domain.Domain
import graft.model._
import graft.model.ValueKind._

/** Co-located attribute fusion (`Domain.registerColocated` +
  * `AttributeSource.fused`): a conjunction of attributes of ONE
  * one-row-per-entity table over a shared entity variable must compile to
  * a single multi-column scan with results IDENTICAL to the self-join
  * plan the separate 2-column registrations produce — including constant
  * pushes, duplicate value variables, nulls, and mixes with non-fusable
  * (transacted) attributes. */
class ColocatedFusionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base: DataFrame = Seq(
    (1L, 10L, "a"),
    (2L, 20L, "b"),
    (3L, 30L, "a"),
    (4L, 10L, null: String)).toDF("id", "n", "s")

  private def colocatedDomain(): Domain = {
    val d = new Domain(spark)
    d.registerColocated("t", base, col("id"), Seq(
      (":t/n", col("n"), KNumber), (":t/s", col("s"), KString)))
    d
  }

  private def separateDomain(): Domain = {
    val d = new Domain(spark)
    d.registerStatic(":t/n", base.select(col("id").as("e"), col("n").as("v")), KNumber)
    d.registerStatic(":t/s", base.select(col("id").as("e"), col("s").as("v")), KString)
    d
  }

  private def run(d: Domain, plan: Plan): Set[Seq[Any]] = {
    val rel = new Compiler(d.asOf(Long.MaxValue), Map.empty)
      .compile(plan, Map.empty)
      .getOrElse(fail("compilation failed"))
    rel.df.collect().map(_.toSeq.map(String.valueOf)).toSet
  }

  private def both(plan: Plan): (Set[Seq[Any]], Set[Seq[Any]]) =
    (run(colocatedDomain(), plan), run(separateDomain(), plan))

  test("two-attribute conjunction fuses with identical results") {
    val plan = Plan.Hector(Seq(0, 1, 2), Seq(
      Binding.attribute(0, ":t/n", 1),
      Binding.attribute(0, ":t/s", 2)))
    val (fused, joined) = both(plan)
    assert(fused === joined)
    assert(fused.nonEmpty)
    // The fused compile really is join-free (the separate one is not).
    val df = new Compiler(colocatedDomain().asOf(Long.MaxValue), Map.empty)
      .compile(plan, Map.empty).get.df
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      df.queryExecution.executedPlan.toString)
  }

  test("constant bindings push into the fused scan") {
    val plan = Plan.Hector(Seq(0, 1), Seq(
      Binding.attribute(0, ":t/n", 1),
      Binding.attribute(0, ":t/s", 2),
      Binding.constant(2, Value.str("a"))))
    val (fused, joined) = both(plan)
    assert(fused === joined)
    assert(fused.map(_.head).== (Set("1", "3")))
  }

  test("duplicate value variable pins an equality inside the cluster") {
    // [?e :t/n ?x][?e :t/m ?x]: only entities whose two attributes agree.
    val d1 = new Domain(spark)
    d1.registerColocated("t", base, col("id"), Seq(
      (":t/n", col("n"), KNumber), (":t/m", col("id") * 10L, KNumber)))
    val d2 = new Domain(spark)
    d2.registerStatic(":t/n", base.select(col("id").as("e"), col("n").as("v")), KNumber)
    d2.registerStatic(":t/m", base.select(col("id").as("e"), (col("id") * 10L).as("v")), KNumber)
    val plan = Plan.Hector(Seq(0, 1), Seq(
      Binding.attribute(0, ":t/n", 1),
      Binding.attribute(0, ":t/m", 1)))
    assert(run(d1, plan) === run(d2, plan))
    // n == id*10 holds for ids 1 (10), 2 (20), 3 (30); id 4 has n=10 ≠ 40.
    assert(run(d1, plan).map(_.head) === Set("1", "2", "3"))
  }

  test("fused cluster joins a transacted (non-fusable) attribute unchanged") {
    def withTx(d: Domain): Domain = {
      d.createAttribute(":t/tag", AttributeConfig(InputSemantics.Distinct))
      d.transact(Seq(
        Datom.add(1, ":t/tag", Value.str("x")),
        Datom.add(3, ":t/tag", Value.str("y"))), 0L)
      d
    }
    val plan = Plan.Hector(Seq(0, 1, 2, 3), Seq(
      Binding.attribute(0, ":t/n", 1),
      Binding.attribute(0, ":t/s", 2),
      Binding.attribute(0, ":t/tag", 3)))
    val fused = run(withTx(colocatedDomain()), plan)
    val joined = run(withTx(separateDomain()), plan)
    assert(fused === joined)
    assert(fused.map(_.head) === Set("1", "3"))
  }
}
