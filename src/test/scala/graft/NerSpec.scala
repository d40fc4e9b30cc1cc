package graft

import graft.operators.TextAnalysis
import graft.sources.StructuredCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Pins for capitalized-span entity mining (`ta_ner`): a local brute-force
  * recomputation over the generator's own strings (same regex rule, plain
  * Scala fold — no Spark, no SQL) must reproduce the distributed result
  * exactly, and the planted witnesses must behave: stopword-wrapped entities
  * surface STRIPPED, "The <Word>" decoys never surface, every surfaced
  * entity is a pool member.
  */
class NerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val SPAN = java.util.regex.Pattern.compile("[A-Z][a-z]+( [A-Z][a-z]+)+")
  private val STRIP = "^(The|And|An|At|In|On|A) ".r

  private def brute(): Map[String, (Int, Int)] = {
    // entity -> (df, tf), by the same rule the engines run
    val perDoc = (0L until StructuredCorpus.N_NEWS).map { i =>
      val m = SPAN.matcher(StructuredCorpus.newsText(i))
      val found = Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => STRIP.replaceFirstIn(m.group(0), ""))
        .filter(_.contains(" ")).toSeq
      found
    }
    val tf = perDoc.flatten.groupBy(identity).view.mapValues(_.size)
    val df = perDoc.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    tf.keys.map(e => e -> (df(e), tf(e))).toMap.filter(_._2._1 >= 2)
  }

  test("ta_ner: distributed result equals the brute recomputation, and " +
    "witnesses behave") {
    val got = TextAnalysis.taNer(spark, "").collect()
      .map(r => r.getAs[String]("entity") ->
        (r.getAs[Long]("df").toInt, r.getAs[Long]("tf").toInt)).toMap
    val want = brute()
    assert(got == want)

    val pool = (0 until 26).map(StructuredCorpus.newsEntity).toSet
    // every surfaced entity is a planted pool member — the lowercase-filler
    // invariant (no accidental ≥2-cap runs) and the decoy filter both hold
    assert(got.keySet.subsetOf(pool))
    // no surfaced entity retains stopword chrome
    assert(got.keySet.forall(e => !e.startsWith("The ")))
    // the stopword-wrapped plants really exist in the corpus (the stripped
    // form is reachable only through the strip rule for at least one doc)
    val wrapped = (0L until StructuredCorpus.N_NEWS)
      .exists(i => StructuredCorpus.newsText(i).contains(" The " +
        StructuredCorpus.newsEntity(0).split(" ").head))
    assert(wrapped || got.nonEmpty) // corpus-shape sanity, not a hard plant

    // decoys exist in the raw text ("The <Word>" with lowercase after) and
    // produce no single-word entities anywhere in the result by the
    // multi-word filter — spot-check the raw corpus carries some decoy
    val anyDecoy = (0L until StructuredCorpus.N_NEWS).exists { i =>
      val t = StructuredCorpus.newsText(i)
      val m = SPAN.matcher(t)
      Iterator.continually(m.find()).takeWhile(identity)
        .exists(_ => STRIP.replaceFirstIn(m.group(0), "").split(" ").length == 1)
    }
    assert(anyDecoy, "generator no longer plants 'The <Word>' decoys — " +
      "the multi-word filter is untested")
  }
}
