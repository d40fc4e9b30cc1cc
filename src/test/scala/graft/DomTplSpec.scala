package graft

import graft.operators.ExtractOracle
import graft.sources.OracleCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for DOM-template clustering (`ex_domtpl`): family membership means
  * IDENTICAL (tag:depth) sequences (recomputed directly from the blocks
  * table), families with differing member TEXTS exist (same template,
  * different articles — the wrapper-induction case ex_hostlines' text rule
  * cannot see), and families never span hosts.
  */
class DomTplSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ex_domtpl: families are structure-identical, text-diverse, host-local") {
    val fams = ExtractOracle.exDomtpl(spark, "").collect()
    assert(fams.nonEmpty)

    // recompute per-url structure + text digest straight from blocks
    val bl = OracleCorpus.blocks(spark).toDF
      .filter(col("kind") === "html" &&
        col("flags").bitwiseAND(lit(Model.FLAG_SENTINEL)) === 0)
    val perUrl = bl.groupBy("url")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("seq"),
          concat_ws(":", col("tag"), col("depth")).as("td")))),
          s => s.getField("td")), ",").as("structure"),
        md5(concat_ws("|", array_sort(collect_list(col("text")))).cast("binary"))
          .as("text_h"))
      .collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[String]("structure"), r.getAs[String]("text_h"))).toMap

    val sigOf = perUrl.keys.groupBy(u => perUrl(u)._1)
    var diverse = 0
    fams.foreach { f =>
      val ex = f.getAs[String]("exemplar")
      val host = f.getAs[String]("host")
      val struct = perUrl(ex)._1
      val members = sigOf(struct).filter(_.contains(s"//$host/")).toSeq
      // the family count matches the direct structure grouping per host
      assert(members.size.toLong == f.getAs[Long]("n_pages"),
        s"$host family size mismatch")
      if (members.map(u => perUrl(u)._2).distinct.size > 1) diverse += 1
    }
    assert(diverse > 0,
      "no family with differing member texts — the structure/text " +
        "separation witness is gone")
  }
}
