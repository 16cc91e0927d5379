package graft.ops

import graft.plug.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BPE induction at REALISTIC merge counts: the pair-indexed (symbol
  * array, frequency) representation plus the every-[[Corpus.RepersistEvery]]
  * localCheckpoint cadence keep per-round cost FLAT in the merge index —
  * the property a real 32k-merge tokenizer run depends on. The replaced
  * literal replace-chain representation grew round cost linearly (round k
  * replayed k·maxChain nested replaces), which is exactly what this spec
  * would catch at 512 rounds. */
class BpeChainScalingSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.session
  import spark.implicits._

  behavior of "learnMerges pair-indexed rounds"

  it should "learn 512 merges with late rounds no slower than early ones" in {
    // a corpus rich enough that 512 rounds never exhaust adjacent pairs:
    // distinct multi-word docs over a varied token set (~2600 adjacent
    // pair slots across the distinct vocab)
    val rnd = new scala.util.Random(13)
    val words = (0 until 400).map(_ =>
      (0 until (5 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until 600).map { i =>
      (i.toLong, (0 until 12).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    docs.persist()
    docs.count()

    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val merges = Corpus.learnMerges(docs, "text", nMerges = 512, maxChain = 6,
      onRound = (i, ns) => times += ((i, ns)))
    docs.unpersist()

    merges.size shouldBe 512
    merges.map(_._1) shouldBe (1 to 512)
    // every merge pair must be distinct — the loop genuinely progresses
    merges.map(m => (m._2, m._3)).distinct.size shouldBe 512

    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val byRound = times.toMap
    val early = median((2 to 32).map(byRound))   // round 1 pays JIT/analysis warmup
    val late = median((481 to 512).map(byRound))
    // flat cadence ⇒ ratio ≈ 1 (checkpoint rounds add a bounded job); a
    // per-round representation that replays the merge history would be
    // ~16× slower here by round ~500. Generous slack for a loaded host.
    withClue(s"early=$early late=$late ratio=${late / early}") {
      late should be < early * 5.0
    }
  }
}
