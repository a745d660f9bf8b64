package graft.plans

import graft.model._
import graft.model.Plan._

/** GraphQL entry point — mirror of the reference `GraphQl` plan
  * (`src/plan/graphql.rs:23-271`): a GraphQL selection document lowers to a
  * vector of `PullLevel` plans rooted at a `Hector` conjunction, which then
  * compiles like any other `Pull` query.
  *
  * Supported subset (as the reference: no fragments, no named operations):
  * selection sets with nested fields and scalar arguments, e.g.
  * `{ hero(name: "alice") { age friend { name } } }`.
  *
  *  - a field WITH a selection set is an edge: it adds the binding
  *    `[?parent field ?this]` to the level's Hector plan
  *    (`graphql.rs:156-166`);
  *  - field arguments become `[?this arg ?sym] [?sym = const]` bindings
  *    (`graphql.rs:170-181`);
  *  - fields WITHOUT a selection set are the level's pull attributes
  *    (`graphql.rs:115-130`);
  *  - a level with no bindings at all lowers to `PullAll`
  *    (`graphql.rs:216-221`).
  */
object GraphQl {

  final case class Field(
      name: String,
      arguments: Seq[(String, Value)],
      selections: Seq[Field])

  /** Parse + lower a document to a single `Pull` plan rooted at the empty
    * conjunction (`GraphQl::new`, `graphql.rs:31-45`). */
  def plan(query: String): Plan =
    Pull(Seq.empty, paths(query))

  /** Lower to pull paths, optionally starting from a custom root
    * conjunction (`GraphQl::with_plan`). */
  def paths(query: String, root: Hector = Hector(Seq(0), Seq.empty)): Seq[Plan] = {
    val gensym = new java.util.concurrent.atomic.AtomicInteger(1000000)
    selectionSetToPaths(parse(query), root, Seq.empty, Seq.empty, gensym)
  }

  /** `selection_set_to_paths` — `graphql.rs:143-233`. */
  private def selectionSetToPaths(
      items: Seq[Field],
      parentPlan: Hector,
      arguments: Seq[(String, Value)],
      parentPath: Seq[String],
      gensym: java.util.concurrent.atomic.AtomicInteger): Seq[Plan] = {

    var vars = parentPlan.variables
    var bindings = parentPlan.bindings

    // Any level after the first links parent entity to this one.
    if (parentPath.nonEmpty) {
      val parent = vars.last
      val thisVar = vars.length
      vars = vars :+ thisVar
      bindings = bindings :+ Binding.Attr(parent, parentPath.last, thisVar)
    }
    val thisVar = vars.last

    // Arguments constrain this level's entity through gensym'd variables
    // kept out of the output projection.
    arguments.foreach { case (aid, v) =>
      val sym = gensym.getAndIncrement()
      bindings = bindings :+ Binding.Attr(thisVar, aid, sym)
      bindings = bindings :+ Binding.Const(sym, v)
    }

    val pullAttributes = items.filter(_.selections.isEmpty).map(_.name)

    val nestedLevels = items.filter(_.selections.nonEmpty).flatMap { f =>
      selectionSetToPaths(f.selections, Hector(vars, bindings), f.arguments,
        parentPath :+ f.name, gensym)
    }

    if (pullAttributes.isEmpty) nestedLevels
    else if (bindings.isEmpty)
      nestedLevels :+ PullAll(Seq.empty, pullAttributes)
    else
      nestedLevels :+ PullLevel(Seq.empty, Hector(vars, bindings), thisVar,
        pullAttributes, parentPath, cardinalityMany = false)
  }

  // ------------------------------------------------------------ parsing

  /** Parse `{ field(arg: val) { sub ... } ... }` → top-level fields. */
  def parse(query: String): Seq[Field] = {
    val p = new Parser(query)
    p.skipWs()
    val fields = p.selectionSet()
    p.skipWs()
    require(p.atEnd, s"trailing input in GraphQL document at ${p.pos}")
    fields
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s(pos).isWhitespace || s(pos) == ',')) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!atEnd && s(pos) == c, s"expected '$c' at $pos in: $s")
      pos += 1
    }
    private def peekIs(c: Char): Boolean = { skipWs(); !atEnd && s(pos) == c }

    def selectionSet(): Seq[Field] = {
      expect('{')
      val items = Seq.newBuilder[Field]
      while (!peekIs('}')) items += field()
      expect('}')
      items.result()
    }

    private def field(): Field = {
      val n = name()
      val args = if (peekIs('(')) argumentList() else Seq.empty
      val subs = if (peekIs('{')) selectionSet() else Seq.empty
      Field(n, args, subs)
    }

    private def argumentList(): Seq[(String, Value)] = {
      expect('(')
      val args = Seq.newBuilder[(String, Value)]
      while (!peekIs(')')) {
        val k = name()
        expect(':')
        args += (k -> value())
      }
      expect(')')
      args.result()
    }

    private def name(): String = {
      skipWs()
      val start = pos
      // A leading ':' admits attribute-style names (':customer/name');
      // inside a name ':' terminates it (argument separator).
      if (!atEnd && s(pos) == ':') pos += 1
      while (!atEnd && (s(pos).isLetterOrDigit ||
        "_/.-".contains(s(pos)))) pos += 1
      require(pos > start, s"expected a name at $start in: $s")
      s.substring(start, pos)
    }

    /** Int / String / Boolean — the reference's supported argument types
      * (`graphql.rs:259-269`). */
    private def value(): Value = {
      skipWs()
      s(pos) match {
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          while (s(pos) != '"') {
            if (s(pos) == '\\') pos += 1
            sb += s(pos); pos += 1
          }
          pos += 1
          Value.VString(sb.toString)
        case c if c == '-' || c.isDigit =>
          val start = pos
          if (s(pos) == '-') pos += 1
          while (!atEnd && s(pos).isDigit) pos += 1
          Value.VNumber(s.substring(start, pos).toLong)
        case _ =>
          name() match {
            case "true"  => Value.VBool(true)
            case "false" => Value.VBool(false)
            case other   => sys.error(s"unsupported GraphQL value: $other")
          }
      }
    }
  }
}
