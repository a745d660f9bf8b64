package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{LongRuns, PackedRuns}

/** Model-based property coverage for the packed sorted-run stores: any
  * sequence of netted delta batches must leave [[LongRuns]] /
  * [[PackedRuns]] agreeing with a plain weight map on point lookups,
  * prefix scans, and full iteration — across compactions, cancellations
  * (zero weights vanish), duplicate re-insertions, and negative
  * weights. */
class RunStoreSpec extends AnyFunSuite {

  private val genBatch: Gen[Seq[((Long, Long), Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.chooseNum(-3L, 3L)
      b <- Gen.chooseNum(-3L, 3L)
      w <- Gen.oneOf(-2L, -1L, 1L, 2L)
    } yield ((a, b), w))).map(
      _.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 != 0L).toSeq) // netted unique keys, like callers

  test("LongRuns agrees with the model over arbitrary batch histories") {
    val params = Gen.Parameters.default
    (0 until 30).foreach { seed =>
      var runs = LongRuns.empty
      val model = scala.collection.mutable.Map.empty[(Long, Long), Long]
      (1 to 8).foreach { i =>
        val batch = genBatch(params, Seed(seed * 7919L + i)).getOrElse(Seq.empty)
        batch.foreach { case (k, w) =>
          val nw = model.getOrElse(k, 0L) + w
          if (nw == 0L) model.remove(k) else model(k) = nw
        }
        val packed = batch.flatMap { case ((a, b), w) => Seq(a, b, w) }.toArray
        runs = runs.merged(packed)
        // point lookups (present, cancelled, and absent keys)
        for (a <- -3L to 3L; b <- -3L to 3L)
          assert(runs.get(a, b) == model.getOrElse((a, b), 0L),
            s"get($a,$b) seed=$seed batch=$i runs=${runs.runCount}")
        // prefix scans
        for (a <- -3L to 3L) {
          val want = model.collect { case ((`a`, b), w) => b -> w }.toMap
          assert(runs.prefix(a).toMap == want, s"prefix($a) seed=$seed batch=$i")
        }
        // full iteration nets to the model
        assert(runs.iterator.toMap ==
          model.map { case (k, w) => k -> w }.toMap,
          s"iterator seed=$seed batch=$i")
      }
    }
  }

  test("PackedRuns agrees with the model at widths 1..4") {
    val params = Gen.Parameters.default
    for (width <- 1 to 4; seed <- 0 until 12) {
      val genB: Gen[Seq[(Vector[Long], Long)]] =
        Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, for {
          ks <- Gen.listOfN(width, Gen.chooseNum(-2L, 2L))
          w <- Gen.oneOf(-2L, -1L, 1L, 2L)
        } yield (ks.toVector, w))).map(
          _.groupBy(_._1).view.mapValues(_.map(_._2).sum)
            .filter(_._2 != 0L).toSeq)
      var runs = PackedRuns.empty(width)
      val model = scala.collection.mutable.Map.empty[Vector[Long], Long]
      (1 to 6).foreach { i =>
        val batch = genB(params, Seed(width * 104729L + seed * 7919L + i))
          .getOrElse(Seq.empty)
        batch.foreach { case (k, w) =>
          val nw = model.getOrElse(k, 0L) + w
          if (nw == 0L) model.remove(k) else model(k) = nw
        }
        val packed = batch.flatMap { case (ks, w) => ks :+ w }.toArray
        runs = runs.merged(packed)
        batch.foreach { case (k, _) =>
          assert(runs.get(k.toArray) == model.getOrElse(k, 0L),
            s"get($k) width=$width seed=$seed")
        }
        assert(runs.iterator.map { case (k, w) => k.toVector -> w }.toMap ==
          model.toMap, s"iterator width=$width seed=$seed batch=$i")
        // prefix-ranged iteration == full iteration filtered, at every
        // prefix width (r18: the backfill's per-attribute seek)
        for (pw <- 1 to width; p0 <- -2L to 2L) {
          val pfx = Array.fill(pw)(p0)
          val want = model.collect {
            case (k, w) if k.take(pw) == pfx.toVector => k -> w
          }.toMap
          assert(runs.iteratorForPrefix(pfx)
            .map { case (k, w) => k.toVector -> w }.toMap == want,
            s"iteratorForPrefix(${pfx.toSeq}) width=$width seed=$seed batch=$i")
        }
      }
    }
  }

  test("size-tiered compaction bounds the run count logarithmically") {
    var runs = LongRuns.empty
    (0 until 200).foreach { i =>
      val packed = (0 until 50).flatMap(j =>
        Seq(i * 50L + j, j.toLong, 1L)).toArray
      runs = runs.merged(packed)
      assert(runs.runCount <= 20,
        s"run count ${runs.runCount} after ${i + 1} batches")
    }
    assert(runs.packedCount == 200L * 50L)
  }

  test("dictionary-encoded PackedGroups agrees with BoxedGroups over mixed-kind histories") {
    // Strings, doubles, nulls, inline longs, and an overflow long that
    // cannot inline — all through the interning dictionary — must make
    // the packed backend byte-identical to the boxed trie on group
    // reads across cancellations and re-insertions.
    import graft.model.ValueKind
    import graft.streaming.{BoxedGroups, GroupIndex}
    val vals: Seq[Any] = Seq("a", "bb", 7L, -3L, 2.5, null, "a",
      Long.MaxValue - 1L, 0.0, "ccc")
    val rnd = new scala.util.Random(7)
    var packed = GroupIndex.empty(
      Seq(ValueKind.KString, ValueKind.KNumber), Seq(ValueKind.KString))
    assert(packed.getClass.getSimpleName == "PackedGroups",
      "string-kinded cells must take the packed backend now")
    var boxed: GroupIndex = BoxedGroups(scala.collection.immutable.HashMap.empty)
    val keys = scala.collection.mutable.Set.empty[Seq[Any]]
    (0 until 40).foreach { _ =>
      val batch = (0 until 30).map { _ =>
        val k = Seq(vals(rnd.nextInt(vals.length)), rnd.nextInt(3).toLong: Any)
        val row = Seq(vals(rnd.nextInt(vals.length)))
        keys += k
        ((k, row), (rnd.nextInt(5) - 2).toLong)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter(_._2 != 0L).toSeq // netted, like the callers
      packed = packed.merged(batch)
      boxed = boxed.merged(batch)
      keys.foreach { k =>
        assert(packed.group(k) == boxed.group(k), s"group($k) diverged")
      }
      assert(packed.group(Seq("absent", 99L)).isEmpty)
    }
  }

  test("PackedGroups routes arity-mismatched keys and rows to the boxed side (r10 ADVICE)") {
    import graft.model.ValueKind
    import graft.streaming.GroupIndex
    // Declared shape: 2-long key, 1-long row. Irregular records — short
    // key, long key, short row — must land in the boxed side map intact,
    // never packed with stale/overflowing longs in the reused record
    // buffer.
    val g0 = GroupIndex.empty(
      Seq(ValueKind.KNumber, ValueKind.KNumber), Seq(ValueKind.KNumber))
    assert(g0.getClass.getSimpleName == "PackedGroups")
    val g = g0.merged(Seq(
      ((Seq[Any](1L, 2L), Seq[Any](10L)), 1L),      // regular → packed
      ((Seq[Any](7L), Seq[Any](20L)), 1L),          // short key → boxed
      ((Seq[Any](1L, 2L, 3L), Seq[Any](30L)), 1L),  // long key → boxed
      ((Seq[Any](4L, 5L), Seq[Any](40L, 41L)), 1L)  // long row → boxed
    ))
    assert(g.group(Seq[Any](1L, 2L)) == Map(Seq[Any](10L) -> 1L))
    assert(g.group(Seq[Any](7L)) == Map(Seq[Any](20L) -> 1L))
    assert(g.group(Seq[Any](1L, 2L, 3L)) == Map(Seq[Any](30L) -> 1L))
    assert(g.group(Seq[Any](4L, 5L)) == Map(Seq[Any](40L, 41L) -> 1L))
    // A short key must NOT shadow or corrupt a packed group sharing its
    // prefix longs (the latent stale-buffer bug the guard closes).
    assert(g.group(Seq[Any](7L, 0L)).isEmpty)
  }

  test("PackedGroups compacts its interning dictionary under value churn (r11 review)") {
    // A churning string column — every batch retracts the previous
    // distinct value and asserts a fresh one — must NOT grow the
    // interning dictionary with the total HISTORICAL distinct count:
    // once the dictionary provably exceeds what live records can
    // reference, the store re-encodes through a fresh one. The boxed
    // trie frees values with their records; the packed backend must
    // stay in the same live-sized class.
    import graft.model.ValueKind
    import graft.streaming.{GroupIndex, PackedGroups}
    var g = GroupIndex.empty(Seq(ValueKind.KEid), Seq(ValueKind.KString))
    var prev: Option[String] = None
    (0 until 400).foreach { i =>
      val v = s"val-$i"
      val batch: Seq[((Seq[Any], Seq[Any]), Long)] =
        Seq(((Seq[Any](1L), Seq[Any](v)), 1L)) ++
          prev.map(p => ((Seq[Any](1L), Seq[Any](p)), -1L))
      g = g.merged(batch)
      prev = Some(v)
    }
    val pg = g.asInstanceOf[PackedGroups]
    assert(pg.dictVals.length < 200,
      s"dictionary holds ${pg.dictVals.length} of 400 historical values " +
        "— churn compaction did not trigger")
    // Reads stay exact through compactions: only the live value remains.
    assert(g.group(Seq[Any](1L)) == Map(Seq[Any]("val-399") -> 1L))
    assert(g.group(Seq[Any](2L)).isEmpty)
  }
}
