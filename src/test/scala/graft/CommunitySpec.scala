package graft

import graft.operators.CrawlOps
import graft.sources.StructuredCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Pins for synchronous label propagation (`ex_communities`): a plain-Scala
  * brute replay of the exact rule (most-frequent neighbor label, count desc
  * then lex-least, all nodes simultaneously) must match the distributed
  * result after 4 rounds, the planted cliques must resolve to their min
  * labels despite the bridges, and the star must still be oscillating —
  * the documented sync-LPA pathology.
  */
class CommunitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def bruteRounds(k: Int): Map[String, String] = {
    val e0 = StructuredCorpus.commEdges()
    val adj = (e0 ++ e0.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to k) {
      labels = labels.map { case (n, own) =>
        val counts = adj(n).map(labels).groupBy(identity)
          .view.mapValues(_.size).toSeq
        if (counts.isEmpty) n -> own
        else n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("ex_communities: distributed 4-round LPA equals the brute replay; " +
    "cliques resolve, bridges hold, the star oscillates") {
    val got = CrawlOps.exCommunities(spark, "").collect()
      .map(r => r.getAs[String]("node") -> r.getAs[String]("label")).toMap
    val want = bruteRounds(4)
    assert(got == want)

    // every clique k labels ALL SIX of its members c{k}n0 (bridges included)
    for (k <- 0 until 4; j <- 0 until 6)
      assert(got(s"c${k}n$j.example.org") == s"c${k}n0.example.org",
        s"clique $k member $j leaked its community")
    // the triangle converged to its min
    Seq("g0", "g1", "g2").foreach(g =>
      assert(got(s"$g.example.org") == "g0.example.org"))
    // the star has NOT converged: round 3 and round 4 states differ on it —
    // the bipartite flip sync-LPA is known for
    val r3 = bruteRounds(3)
    val starNodes = Seq("s0c.example.org", "s0l1.example.org")
    assert(starNodes.exists(n => r3(n) != want(n)),
      "star stopped oscillating — the pathology witness is gone")
  }
}
