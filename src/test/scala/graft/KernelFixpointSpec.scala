package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model._
import graft.model.Plan._

/** The iterative RDD kernel for linear recursion (Compiler.kernelLinear)
  * must be a pure implementation swap: identical result sets to the
  * general semi-naive DataFrame loop on the same rules and data, and a
  * clean fallback (not a wrong answer) whenever its shape gates fail.
  */
class KernelFixpointSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  /** Deterministic pseudo-random graph: n nodes, ~2n edges. */
  private def graphDatoms(n: Int, seed: Long): Seq[Datom] = {
    val rnd = new scala.util.Random(seed)
    (0 until 2 * n).map { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      Datom.add(a, ":edge", Value.eid(b))
    }
  }

  private val closureRules = Seq(
    Rule("edges", matchA(0, ":edge", 1)),
    Rule("closure", Union(Seq(0, 1), Seq(
      NameExpr(Seq(0, 1), "edges"),
      Project(Seq(0, 1), Join(Seq(2),
        NameExpr(Seq(0, 2), "edges"),
        NameExpr(Seq(2, 1), "closure")))))))

  private def runClosure(rules: Seq[Rule], datoms: Seq[Datom],
      interest: String): Set[Seq[Any]] = {
    val engine = new Engine(spark)
    engine.createAttribute(":edge", AttributeConfig(InputSemantics.Distinct))
    rules.foreach(engine.register)
    engine.interest(interest)
    engine.transact(datoms)
    engine.advance(1)
    engine.drain(interest).map { case (tuple, _, d) =>
      assert(d == 1L, s"closure diffs must be +1, got $d for $tuple")
      tuple
    }.toSet
  }

  private def withKernelOff[A](body: => A): A = {
    sys.props("graft.fixpoint.kernel") = "off"
    try body finally sys.props.remove("graft.fixpoint.kernel")
  }

  test("kernel closure is correct across multiple partitions") {
    // 300 disjoint 11-node chains: 3000 edges exceed the 2000-row floor,
    // so the kernel spreads across min(userPartitions, 16) partitions and
    // candidates/deltas cross partition boundaries every round (the
    // claimed-partitioner bug class the CC kernel shipped — see
    // RddKernel's invariants). Expected closure is analytic: exactly the
    // within-chain (i, j), i < j pairs.
    val datoms = for {
      c <- 0 until 300; i <- 0 until 10
    } yield Datom.add((c * 11 + i).toLong, ":edge", Value.eid((c * 11 + i + 1).toLong))
    val expected: Set[Seq[Any]] = (for {
      c <- 0 until 300; i <- 0 to 10; j <- (i + 1) to 10
    } yield Seq((c * 11 + i).toLong, (c * 11 + j).toLong): Seq[Any]).toSet
    val got = runClosure(closureRules, datoms, "closure")
    assert(got == expected)
  }

  test("kernel and DataFrame loops agree on a random transitive closure") {
    val datoms = graphDatoms(60, seed = 7)
    val viaKernel = runClosure(closureRules, datoms, "closure")
    val viaDataFrame = withKernelOff(runClosure(closureRules, datoms, "closure"))
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaDataFrame)
    // The primitive-pair fast path (binary long shape) and the generic
    // boxed path must be pure implementation swaps of each other.
    sys.props("graft.fixpoint.pairs") = "off"
    val viaGeneric =
      try runClosure(closureRules, datoms, "closure")
      finally sys.props.remove("graft.fixpoint.pairs")
    assert(viaGeneric == viaKernel)
  }

  test("filtered linear recursion runs on the kernel with identical results") {
    // Bounded reachability: a Filter between the Project and the Join
    // compiles to a kernel-side JVM predicate; results must match the
    // general DataFrame loop exactly.
    val rules = Seq(
      Rule("edges", matchA(0, ":edge", 1)),
      Rule("closure", Union(Seq(0, 1), Seq(
        NameExpr(Seq(0, 1), "edges"),
        Filter(Seq(0), Predicate.LTE,
          Project(Seq(0, 1), Join(Seq(2),
            NameExpr(Seq(0, 2), "edges"),
            NameExpr(Seq(2, 1), "closure"))),
          Seq(None, Some(Value.num(40))))))))
    val datoms = graphDatoms(60, seed = 11)
    val got = runClosure(rules, datoms, "closure")
    val reference = withKernelOff(runClosure(rules, datoms, "closure"))
    assert(got.nonEmpty && got == reference)
  }

  test("kernel bails to the DataFrame loop on non-bare recursive references") {
    // A Project WRAPPING the recursive NameExpr inside the join breaks the
    // bare-reference gate; the fixpoint must still converge correctly via
    // the general loop.
    val rules = Seq(
      Rule("edges", matchA(0, ":edge", 1)),
      Rule("closure", Union(Seq(0, 1), Seq(
        NameExpr(Seq(0, 1), "edges"),
        Project(Seq(0, 1), Join(Seq(2),
          NameExpr(Seq(0, 2), "edges"),
          Project(Seq(2, 1), NameExpr(Seq(2, 1), "closure"))))))))
    val datoms = graphDatoms(60, seed = 11)
    val got = runClosure(rules, datoms, "closure")
    val reference = withKernelOff(runClosure(rules, datoms, "closure"))
    assert(got.nonEmpty && got == reference)
  }

  test("downstream aggregation consumes a kernel-produced relation") {
    // labelprop shape: MIN over the closure — exercises the RDD-backed
    // DataFrame the kernel returns as input to a grouped aggregation.
    val rules = closureRules :+
      Rule("labels", Aggregate(Seq(1, 0), NameExpr(Seq(0, 1), "closure"),
        Seq(AggregationFn.MIN), Seq(1), Seq(0), Seq.empty))
    val datoms = graphDatoms(40, seed = 3)
    val viaKernel = runClosure(rules, datoms, "labels")
    val viaDataFrame = withKernelOff(runClosure(rules, datoms, "labels"))
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaDataFrame)
  }

  test("arrangement consolidates a negating NameExpr static (r11 review)") {
    // The static side references a RULE whose compiled Z-set carries
    // negative weights (a bare Negate body — distinct=false, W=-1).
    // Past the broadcast gate the arrangement must consolidate it the
    // way the broadcast path does (distinctify → empty static here);
    // treating the rule reference as unit-weighted would surface the
    // negated edges into the static index and derive through them.
    // Today TWO layers guarantee this: depEnv pre-distinctifies every
    // external rule dependency before the kernel compiles the static,
    // and the gate's positiveWeights recurses through rule bodies
    // (defense in depth if a future call path skips depEnv) — this
    // test pins the end-to-end behavior against both regressing.
    val rules = Seq(
      Rule("edges0", matchA(0, ":edge", 1)),
      Rule("dead", matchA(0, ":dead", 1)),
      Rule("neg_dead", Negate(NameExpr(Seq(0, 1), "dead"))),
      Rule("closure", Union(Seq(0, 1), Seq(
        NameExpr(Seq(0, 1), "edges0"),
        Project(Seq(0, 1), Join(Seq(2),
          NameExpr(Seq(0, 2), "neg_dead"),
          NameExpr(Seq(2, 1), "closure")))))))
    val datoms = Seq(
      Datom.add(0L, ":edge", Value.eid(1L)),
      Datom.add(1L, ":edge", Value.eid(2L)),
      Datom.add(10L, ":dead", Value.eid(0L)),
      Datom.add(11L, ":dead", Value.eid(0L)))
    def run(): Set[Seq[Any]] = {
      val engine = new Engine(spark)
      engine.createAttribute(":edge", AttributeConfig(InputSemantics.Distinct))
      engine.createAttribute(":dead", AttributeConfig(InputSemantics.Distinct))
      rules.foreach(engine.register)
      engine.interest("closure")
      engine.transact(datoms)
      engine.advance(1)
      engine.drain("closure").map(_._1).toSet
    }
    // Threshold 60 ⇒ maxStaticRows = 1 at arity 2, so the 2-row static
    // routes through the partitioned arrangement, not the broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "60")
    try {
      val arranged = run()
      val reference = withKernelOff(run())
      assert(arranged == reference, s"arranged=$arranged reference=$reference")
      assert(arranged == Set(Seq(0L, 1L), Seq(1L, 2L)),
        s"negated static must contribute NOTHING, got $arranged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
