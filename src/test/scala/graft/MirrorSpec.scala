package graft

import graft.operators.CrawlOps
import graft.sources.StructuredCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Pins for host-mirror detection (`dd_mirror`): a brute recomputation of
  * every host-pair Jaccard from the generator's own rows must agree with
  * the distributed inverted-index path, and the planted boundary witnesses
  * must behave (exact J=1/2 kept, 19/41 dropped, syndication decoy
  * dropped, no cross-family pair).
  */
class MirrorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("dd_mirror: brute all-pairs Jaccard agrees; boundaries behave") {
    val sets: Map[String, Set[String]] =
      (0 until StructuredCorpus.N_MHOSTS).map { h =>
        val rows = StructuredCorpus.mirrorRows(h)
        rows.head._2 -> rows.map(_._3).toSet
      }.toMap
    val hosts = sets.keys.toSeq.sorted
    val want = (for {
      i <- hosts.indices; j <- i + 1 until hosts.length
      a = hosts(i); b = hosts(j)
      inter = (sets(a) & sets(b)).size
      if 3 * inter >= sets(a).size + sets(b).size
    } yield (a, b, sets(a).size, sets(b).size, inter)).toSet

    val got = CrawlOps.ddMirror(spark, "").collect().map { r =>
      (r.getAs[String]("host_a"), r.getAs[String]("host_b"),
        r.getAs[Long]("n_a").toInt, r.getAs[Long]("n_b").toInt,
        r.getAs[Long]("n_common").toInt)
    }.toSet
    assert(got == want)

    // the planted structure really is what the generator promises
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.contains(("mhost0.example.org", "mhost1.example.org")), "full mirror")
    assert(pairs.contains(("mhost4.example.org", "mhost5.example.org")),
      "exact J=1/2 boundary must be KEPT by the >= rule")
    assert(!pairs.exists(p => p._1.startsWith("mhost6") || p._2.startsWith("mhost7")),
      "19/41 under-boundary pair must drop")
    assert(!pairs.exists(p => p._1.startsWith("mhost8")), "syndication decoy must drop")
    assert(got.size == 3, s"unexpected extra pairs: $got")
  }
}
