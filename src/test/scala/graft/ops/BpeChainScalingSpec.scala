package graft.ops

import graft.plug.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BPE induction lineage discipline: with the every-[[Corpus.RepersistEvery]]
  * localCheckpoint cadence, per-round cost stays FLAT in the merge index
  * instead of growing with the accumulated rewrite chain — the property a
  * real 32k-merge tokenizer run depends on. */
class BpeChainScalingSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "learnMerges re-persist cadence"

  it should "learn 64 merges with late rounds no slower than early ones" in {
    // a corpus rich enough that 64 rounds never exhaust adjacent pairs:
    // distinct multi-word docs over a varied token set
    val rnd = new scala.util.Random(13)
    val words = (0 until 400).map(_ =>
      (0 until (5 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until 600).map { i =>
      (i.toLong, (0 until 12).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    docs.persist()
    docs.count()

    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val merges = Corpus.learnMerges(docs, "text", nMerges = 64, maxChain = 6,
      onRound = (i, ns) => times += ((i, ns)))
    docs.unpersist()

    merges.size shouldBe 64
    merges.map(_._1) shouldBe (1 to 64)
    // every merge pair must be distinct — the loop genuinely progresses
    merges.map(m => (m._2, m._3)).distinct.size shouldBe 64

    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val byRound = times.toMap
    val early = median((2 to 16).map(byRound))   // round 1 pays JIT/analysis warmup
    val late = median((49 to 64).map(byRound))
    // flat cadence ⇒ ratio ≈ 1 (checkpoint rounds add a bounded job);
    // an unbounded chain grows the ratio with the round index — at round
    // ~56 the un-checkpointed plan replays 7× more rewrites than round 8.
    // Generous slack for a loaded host.
    withClue(s"early=$early late=$late ratio=${late / early}") {
      late should be < early * 5.0
    }
  }
}
