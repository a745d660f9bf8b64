package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.Compiler
import graft.domain.AttributeSource
import graft.model._
import graft.model.ValueKind.KEid

/** Regression: set semantics inside the recursive fixpoint applies to
  * LEAVES too. A Z-set input tuple with NEGATIVE net support (legal on
  * signed-delta sources) must act as ABSENT — not join into round
  * bodies at its raw weight, where its negative products cancel genuine
  * derivations before distinctify nets candidate weights. Found by the
  * maintained general-recursion node disagreeing with the batch
  * fixpoint on a mutual odd/even clique. */
class MutualFixpointRepro extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("negative-support leaves cannot cancel fixpoint derivations") {
    spark.range(1).count() // the fixpoint reads SparkSession.active
    val edges = Seq((3L, 1L), (2L, 0L), (1L, 1L), (1L, 2L), (0L, 3L), (3L, 3L))
    val schema = StructType(Seq(
      StructField("e", LongType, false), StructField("v", LongType, false),
      StructField("_w", LongType, false)))
    val src = new AttributeSource {
      def has(name: String): Boolean = name == ":e1" || name == ":e2"
      def kind(name: String): ValueKind = KEid
      def unit(name: String): Boolean = false
      def collection(name: String): DataFrame = {
        // (2,3) and (1,3) at net support −1: without leaf
        // normalization, edge(2,3)·odd(3,y) products at weight −1
        // cancel edge(2,0)∘odd(0,y) derivations of the same tuples.
        val rows = if (name == ":e1")
          edges.map { case (a, b) => Row(a, b, 1L) } ++
            Seq(Row(2L, 3L, -1L), Row(1L, 3L, -1L))
        else Seq.empty[Row]
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      }
      override def version: (Long, Long) = (0L, Long.MaxValue)
    }
    val odd = Plan.Union(Seq(0, 1), Seq(
      Plan.MatchA(0, ":e1", 1),
      Plan.Project(Seq(0, 1), Plan.Join(Seq(2),
        Plan.MatchA(0, ":e1", 2), Plan.NameExpr(Seq(2, 1), "even")))))
    val even = Plan.Union(Seq(0, 1), Seq(
      Plan.MatchA(0, ":e2", 1),
      Plan.Project(Seq(0, 1), Plan.Join(Seq(2),
        Plan.MatchA(0, ":e1", 2), Plan.NameExpr(Seq(2, 1), "odd")))))
    val comp = new Compiler(src, Map(
      "odd" -> Rule("odd", odd), "even" -> Rule("even", even)))
    val res = comp.compile(Plan.NameExpr(Seq(0, 1), "odd"), Map.empty).get
    val got = res.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute-force fixpoint over the SUPPORT SET of the edges.
    val support = edges.toSet
    var o = Set.empty[(Long, Long)]; var ev = Set.empty[(Long, Long)]
    var stable = false
    while (!stable) {
      val o2 = support ++
        (for ((x, z) <- support; (z2, y) <- ev if z2 == z) yield (x, y))
      val e2 =
        (for ((x, z) <- support; (z2, y) <- o if z2 == z) yield (x, y))
      stable = o2 == o && e2 == ev
      o = o2; ev = e2
    }
    assert(got == o, s"got ${got.toSeq.sorted} expected ${o.toSeq.sorted}")
  }

  test("negative-support leaves cannot cancel NON-LINEAR fixpoint derivations") {
    // The non-linear variant (>=2 recursive refs per body) routes through
    // the NAIVE-RECOMPUTE branch — which must run its round bodies
    // through the same leaf support-set compiler as the semi-naive
    // branch: without it, the (2,3)/(1,3) net −1 edge rows join into
    // `edge ⋈ tc` at weight −1 and cancel the same tuples derived via
    // `tc ⋈ tc`, before distinctify nets candidate weights.
    spark.range(1).count()
    val edges = Seq((3L, 1L), (2L, 0L), (1L, 1L), (1L, 2L), (0L, 3L), (3L, 3L))
    val schema = StructType(Seq(
      StructField("e", LongType, false), StructField("v", LongType, false),
      StructField("_w", LongType, false)))
    val src = new AttributeSource {
      def has(name: String): Boolean = name == ":e1"
      def kind(name: String): ValueKind = KEid
      def unit(name: String): Boolean = false
      def collection(name: String): DataFrame = {
        val rows = edges.map { case (a, b) => Row(a, b, 1L) } ++
          Seq(Row(2L, 3L, -1L), Row(1L, 3L, -1L))
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      }
      override def version: (Long, Long) = (0L, Long.MaxValue)
    }
    // tc := edge ∪ (edge ⋈ tc) ∪ (tc ⋈ tc): a leaf join AND a non-linear
    // self-join in one clique body.
    val tc = Plan.Union(Seq(0, 1), Seq(
      Plan.MatchA(0, ":e1", 1),
      Plan.Project(Seq(0, 1), Plan.Join(Seq(2),
        Plan.MatchA(0, ":e1", 2), Plan.NameExpr(Seq(2, 1), "tc"))),
      Plan.Project(Seq(0, 1), Plan.Join(Seq(2),
        Plan.NameExpr(Seq(0, 2), "tc"), Plan.NameExpr(Seq(2, 1), "tc")))))
    val comp = new Compiler(src, Map("tc" -> Rule("tc", tc)))
    val res = comp.compile(Plan.NameExpr(Seq(0, 1), "tc"), Map.empty).get
    val got = res.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute-force transitive closure over the SUPPORT SET of the edges.
    val support = edges.toSet
    var cl = support
    var stable = false
    while (!stable) {
      val next = cl ++
        (for ((x, z) <- cl; (z2, y) <- cl if z2 == z) yield (x, y))
      stable = next == cl
      cl = next
    }
    assert(got == cl, s"got ${got.toSeq.sorted} expected ${cl.toSeq.sorted}")
  }
}
