package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, struct}
import org.apache.spark.sql.types._

/** Closed scalar union mirroring the reference's `enum Value`
  * (declarative-dataflow `src/lib.rs:86-106`). All engine tuples are rows of
  * these scalars; there are no nested types in the reference data model.
  *
  * Spark mapping: each attribute column keeps its *native* Spark type
  * (LongType/StringType/...) so Catalyst comparisons, pushdown and codegen
  * all apply; `Value` only exists at the driver edge (literals in plans,
  * transacted datoms, collected expectations).
  */
sealed trait Value extends Serializable {

  /** The JVM value as Spark external row representation. */
  def native: Any

  /** The Spark column type this scalar naturally maps to. */
  def sparkType: DataType
}

object Value {

  /** Attribute name used as a value (pull paths) — `src/lib.rs:88`. */
  final case class VAid(a: String) extends Value {
    def native: Any = a; def sparkType: DataType = StringType
  }

  final case class VString(s: String) extends Value {
    def native: Any = s; def sparkType: DataType = StringType
  }

  final case class VBool(b: Boolean) extends Value {
    def native: Any = b; def sparkType: DataType = BooleanType
  }

  /** 64-bit signed integer — `src/lib.rs:94` (`Number(i64)`). */
  final case class VNumber(n: Long) extends Value {
    def native: Any = n; def sparkType: DataType = LongType
  }

  /** Exact rational, the result type of AVG/VARIANCE
    * (`src/plan/aggregate_neu.rs:206-239`). Always stored normalized
    * (gcd-reduced, positive denominator). Spark: `struct<num:long,den:long>`.
    */
  final case class VRational private (num: Long, den: Long) extends Value {
    def native: Any = org.apache.spark.sql.Row(num, den)
    def sparkType: DataType = VRational.schema
  }

  object VRational {
    val schema: StructType = StructType(
      Seq(StructField("num", LongType, false), StructField("den", LongType, false)))

    def apply(num: Long, den: Long): VRational = {
      require(den != 0, "rational with zero denominator")
      val sign = if (den < 0) -1 else 1
      val g = gcd(math.abs(num), math.abs(den))
      val gg = if (g == 0) 1 else g
      new VRational(sign * num / gg, sign * den / gg)
    }

    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  }

  /** Entity id — `src/lib.rs:96` (`Eid(u64)`). */
  final case class VEid(e: Long) extends Value {
    def native: Any = e; def sparkType: DataType = LongType
  }

  /** Milliseconds since Unix epoch — `src/lib.rs:98` (`Instant(u64)`).
    * Kept as a long so TRUNCATE-style modular arithmetic is exact.
    */
  final case class VInstant(ms: Long) extends Value {
    def native: Any = ms; def sparkType: DataType = LongType
  }

  /** Canonical-form UUID string — `src/lib.rs:100`. */
  final case class VUuid(s: String) extends Value {
    def native: Any = s; def sparkType: DataType = StringType
  }

  /** Fixed-point real (feature "real", `src/lib.rs:103-105`); we use double. */
  final case class VReal(d: Double) extends Value {
    def native: Any = d; def sparkType: DataType = DoubleType
  }

  /** Spark literal for a scalar value (used by MatchAV / constant bindings). */
  def asLiteral(v: Value): Column = v match {
    case VRational(n, d) => struct(lit(n).as("num"), lit(d).as("den"))
    case other           => lit(other.native)
  }

  /** Shorthand constructors mirroring the reference's `From` impls. */
  def str(s: String): Value = VString(s)
  def num(n: Long): Value = VNumber(n)
  def eid(e: Long): Value = VEid(e)
  def bool(b: Boolean): Value = VBool(b)
  def instant(ms: Long): Value = VInstant(ms)
  def rational(n: Long, d: Long): Value = VRational(n, d)
}

/** The only base fact type: an EAV triple with optional explicit time and a
  * multiplicity diff — reference `Datom(e, a, v, Option<Time>, isize)`
  * (`src/lib.rs:216`).
  */
final case class Datom(e: Long, a: String, v: Value, t: Option[Long], diff: Long)

object Datom {
  /** `Datom::add` — `src/lib.rs:220`. */
  def add(e: Long, a: String, v: Value): Datom = Datom(e, a, v, None, 1L)

  /** `Datom::add_at` — `src/lib.rs:225`. */
  def addAt(e: Long, a: String, v: Value, t: Long): Datom = Datom(e, a, v, Some(t), 1L)

  /** `Datom::retract` — `src/lib.rs:230`. */
  def retract(e: Long, a: String, v: Value): Datom = Datom(e, a, v, None, -1L)

  /** `Datom::retract_at` — `src/lib.rs:235`. */
  def retractAt(e: Long, a: String, v: Value, t: Long): Datom = Datom(e, a, v, Some(t), -1L)
}
