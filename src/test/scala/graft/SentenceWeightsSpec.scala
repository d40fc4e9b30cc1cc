package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-5 TextAnalysis additions: the sentence splitter's
  * guard behavior on hand-computed witness docs (the oracle only proves
  * both engines agree — THIS proves they agree on the right answer), the
  * sentence-aligned chunk rule, and the broadcast-weight classifier's plan
  * shape (broadcast, no shuffle before the oracle sort).
  */
class SentenceWeightsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ta_sentences: every splitter guard behaves as specified on witness " +
    "sentences") {
    val rows = TextAnalysis.sentences(spark, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == TextAnalysis.N_SENT_DOCS)

    // reconstruct expected counts per doc from the generator: each pattern
    // contributes a known number of sentences
    def expectSents(i: Long): Int = {
      val n = 3 + (i % 6).toInt
      (0 until n).map { s =>
        ((i * 7 + s) % 8) match {
          case 2 => 2 // "Wait... Really now." — capital after ellipsis splits
          case _ => 1 // everything else is exactly one sentence:
          // abbrevs/initials/decimals protected; "It works... mostly fine."
          // does NOT split (lowercase continuation)
        }
      }.sum
    }
    byDoc.foreach { case (id, rs) =>
      assert(rs.length == expectSents(id),
        s"doc $id: got ${rs.length} sentences, want ${expectSents(id)}")
      // sent_ids dense from 0
      assert(rs.map(_._2).sorted.toSeq == (0 until rs.length).map(_.toLong))
      // chunk rule: sentence s sits in chunk floor(tokens_before/CHUNK) —
      // chunk ids are non-decreasing and start at 0
      val byId = rs.sortBy(_._2)
      assert(byId.head._4 == 0L)
      byId.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 >= a._4 && b._4 <= a._4 + 1)
        case _ => ()
      }
      // chunk boundaries align to sentence starts by construction: verify
      // the floor rule directly
      var cum = 0L
      byId.foreach { case (_, _, nt, ck) =>
        assert(ck == cum / TextAnalysis.SENT_CHUNK, s"doc $id chunk rule")
        cum += nt
      }
    }
    // at least one doc exercises each witness pattern (patterns cycle)
    assert(byDoc.exists { case (id, rs) => expectSents(id) > 3 + (id % 6).toInt })
  }

  test("ta_langid_w: the external-lexicon path predicts IDENTICALLY to the " +
    "literal-marker path; ta_lm_w broadcasts the model") {
    val sf = "/root/testdata/sf0.001"
    val lit = TextAnalysis.langid(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val art = TextAnalysis.langidW(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("correct")))
    assert(art.nonEmpty && art.length == lit.size)
    art.foreach { case (id, pred, _) =>
      assert(lit(id) == pred, s"doc $id: artifact path predicted $pred, " +
        s"literal path ${lit(id)}")
    }
    // the planted corpus is recoverable: the artifact path is near-perfect
    assert(art.count(_._3 == 1L) * 10 >= art.length * 9)
    // both artifact joins broadcast (lexicons/models are KB–MB; the corpus
    // side must never shuffle against artifact size)
    val p1 = TextAnalysis.langidW(spark, sf).queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin") || p1.contains("BroadcastExchange"), p1)
    val p2 = TextAnalysis.lmW(spark, sf).queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin") || p2.contains("BroadcastExchange"), p2)
  }

  test("ta_bpe_apply: encoding with the trained merge artifact conserves " +
    "characters, emits only derivable pieces, and every merge is used") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.bpeApply(spark, "").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val merges = spark.read.parquet(TextAnalysis.BPE_MERGES_DIR)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(merges.length == TextAnalysis.K_BPE)
    // legal pieces: single chars plus the closure of the ranked merges
    var legal = Set.empty[String]
    merges.foreach { case (a, b) => legal += a + b }
    out.foreach { case (p, n) =>
      assert(n > 0L)
      // codepoints, not UTF-16 units: the corpus carries astral-plane chars
      assert(p.codePointCount(0, p.length) == 1 || legal.contains(p),
        s"underivable piece '$p'")
    }
    // every trained merge's product survives in the encoded corpus (later
    // merges may consume earlier products — those must appear as parts)
    val pieceSet = out.map(_._1).toSet
    merges.foreach { case (a, b) =>
      assert(pieceSet.contains(a + b) ||
        pieceSet.exists(p => p.length > (a + b).length && p.contains(a + b)),
        s"merge '$a'+'$b' vanished from the encoding")
    }
    // character conservation: sum over pieces of n_tokens*len(piece) equals
    // the corpus's total token characters — nothing lost or duplicated by
    // the reseg chain
    val encodedChars =
      out.map { case (p, n) => n * p.codePointCount(0, p.length) }.sum
    val rawChars = graft.sources.OracleCorpus.docs(spark)
      .select(explode(graft.functions.Toks.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(encodedChars == rawChars,
      s"reseg lost characters: $encodedChars vs $rawChars")
  }

  test("ta_weights: broadcast plan, no shuffle before the oracle sort, " +
    "weights actually hit") {
    val df = TextAnalysis.weightsClassify(spark, "")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"weight map must broadcast:\n$plan")
    // the only exchange is the final orderBy's range partitioning — the
    // scorer itself is scan-speed (zero-exchange per-row lambda)
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(!plan.contains("hashpartitioning"),
      s"scorer must not shuffle (found hash exchange):\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && shuffles >= 0)
    // non-degenerate: the staged vocabulary covers the corpus, so scores
    // are non-zero for most docs and both polarities occur
    val scores = rows.map(_.getLong(2))
    assert(scores.count(_ != 0L) > rows.length / 2)
    assert(scores.exists(_ > 0) && scores.exists(_ < 0))
  }
}
