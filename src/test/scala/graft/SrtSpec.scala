package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the SubRip parser (`mm_srt`): structural invariants of the
  * parsed cue table, the hour-rollover witness, and deterministic refusal
  * of malformed documents.
  */
class SrtSpec extends AnyFunSuite {

  test("srt: parsed cues are monotone, non-overlapping, 1-based, and the " +
    "hour-rollover witness exists") {
    val all = (0L until Multimodal.N_SRT).flatMap(id =>
      Multimodal.srtParse(id, Multimodal.srtDoc(id)))
    assert(all.nonEmpty)
    all.groupBy(_._1).foreach { case (id, cues) =>
      val sorted = cues.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.length), s"clip $id cue indices")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 <= b._3, s"clip $id cues overlap")
        case _ => ()
      }
      cues.foreach(c => assert(c._5 > 0 && c._5 == c._4 - c._3))
    }
    // every 4th clip starts before the hour mark and ends after it
    val roll = all.filter(c => c._1 % 4 == 0)
    assert(roll.exists(c => c._3 < 3600000L) && roll.exists(c => c._4 > 3600000L),
      "hour-rollover witness missing")
  }

  test("srt: malformed documents refuse deterministically") {
    def bad(s: String, what: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.srtParse(0L, s))
      assert(e.getMessage.contains("srt:"), s"$what -> ${e.getMessage}")
    }
    bad("1\n00:00:01,000 --> 00:00:02,000", "missing text line")
    bad("x\n00:00:01,000 --> 00:00:02,000\nhi", "bad index")
    bad("1\n00:00:01,00 --> 00:00:02,000\nhi", "short ms field")
    bad("1\n00:00:02,000 --> 00:00:01,000\nhi", "non-positive duration")
    bad("1\n00:00:01,000 --> 00:00:02,000\nhi\n", "empty trailing text line")
  }
}
