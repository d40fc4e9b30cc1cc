package graft

import graft.operators.TextAnalysis
import graft.sources.StructuredCorpus
import org.scalatest.funsuite.AnyFunSuite

/** Pins for SymSpell typo canonicalization (`ta_symspell`): witness classes
  * the staged corpus plants, plus the one case the corpus cannot force — a
  * distance-2 candidate ADMITTED by the deletion index and KILLED by the
  * exact verify ("ab"/"ba" meet at both single-char deletions).
  */
class SymspellSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ta_symspell: every planted typo maps to its source; the distance-2 " +
    "decoy never maps; ambiguity resolves by frequency-then-lex") {
    val got = TextAnalysis.taSymspell(spark, "").collect()
      .map(r => r.getAs[String]("rare") -> r.getAs[String]("canon")).toMap

    val want = Map(
      "alph" -> "alpha", "bravp" -> "bravo", "carbonn" -> "carbon",
      "delt" -> "delta", "embr" -> "ember", "falcom" -> "falcon",
      "gammma" -> "gamma", "harbr" -> "harbor", "indigoo" -> "indigo",
      "zephyrx" -> "zephyr")
    want.foreach { case (t, c) => assert(got.get(t).contains(c), s"$t -> $c") }
    assert(!got.contains("brxvq"), "distance-2 decoy mapped")

    // the ambiguous plant maps to whichever of ember/umber is more frequent
    // in the staged corpus (lex tiebreak if equal) — recompute the expectation
    import org.apache.spark.sql.functions._
    val tf = StructuredCorpus.typodocs(spark)
      .select(explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getAs[String]("t") -> r.getAs[Long]("count")).toMap
    val expect =
      if (tf("ember") > tf("umber")) "ember"
      else if (tf("umber") > tf("ember")) "umber"
      else "ember"
    assert(got.get("omber").contains(expect))
    assert(got.size == 11)
  }

  test("symspellMap: the deletion index admits a distance-2 pair and the " +
    "exact verify kills it") {
    import spark.implicits._
    // "ab" and "ba" share deletion keys {a, b} but levenshtein = 2
    val vocab = Seq(("ab", 1L), ("ba", 500L)).toDF("t", "tf")
    assert(TextAnalysis.symspellMap(vocab, 10L, 100L).collect().isEmpty)
    // control: a true substitution neighbor at the same shape maps
    val vocab2 = Seq(("ab", 1L), ("cb", 500L)).toDF("t", "tf")
    val m = TextAnalysis.symspellMap(vocab2, 10L, 100L).collect()
    assert(m.length == 1 && m.head.getAs[String]("canon") == "cb")
  }
}
