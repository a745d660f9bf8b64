package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.model.InputSemantics

/** Driver → distributed migration must not plant already-processed sys
  * index entries into the partitions: transition slabs are `(py+1, ty]`
  * and the processed sys coordinate only advances, so entries at or
  * under the processed frontier can never be scanned again — without
  * the split-time prune they would stay resident forever (r11 review
  * finding against the packed store's rebuild-by-ingest migration). */
class BiSplitPruneSpec extends AnyFunSuite {

  private val sem: BiVisibility.Sem = _ => InputSemantics.Raw

  private def recs = (0 until 200).map { i =>
    BiKey(":b/x", i.toLong, (i * 10).toLong) ->
      BiRec(sys = i % 10, event = i % 7, seq = i, diff = 1L, v = (i * 10).toLong)
  }

  test("boxed split drops sys entries at or under the processed frontier") {
    val boxed0 = BiVisibility.empty.ingest(recs)
    val (boxed1, _) = boxed0.transition(None, (4L, 10L), sem)
    val parts = boxed1.split(3, Some(4L))
    parts.foreach { p =>
      assert(p.bySys.keysIterator.forall(_ > 4L),
        s"dead sys entries survive the boxed split: ${p.bySys.keySet}")
    }
    assert(parts.map(_.datomCount).sum == 200L)
  }

  test("packed split sheds dead sys weight and transitions exactly (r11 review)") {
    val packed0 = BiPacked.empty.ingest(recs)
    val (packed1, _) = packed0.transition(None, (4L, 10L), sem)
    val pruned = packed1.split(3, Some(4L))
    val unpruned = packed1.split(3, None)
    assert(pruned.map(_.estimatedBytes).sum < unpruned.map(_.estimatedBytes).sum,
      "pruned split must shed the dead sys index weight")
    def step(vs: Seq[BiVis]): Set[(String, Any, Any, Long)] =
      vs.flatMap(_.transition(Some((4L, 10L)), (9L, 3L), sem)._2).toSet
    val whole = packed1.transition(Some((4L, 10L)), (9L, 3L), sem)._2.toSet
    assert(step(pruned) == whole && step(unpruned) == whole,
      "split stores must transition exactly like the unsplit store")
  }
}
