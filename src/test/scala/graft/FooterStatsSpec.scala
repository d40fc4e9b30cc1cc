package graft

import graft.sources.FooterStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the footer-statistics harvest (`fmt_footer`): the cross-engine
  * gate proves parquet-mr and DuckDB read the same footer bytes; these pins
  * prove the footer CONTENT is faithful to the data it indexes — the
  * property a min/max file-skipping manifest actually depends on.
  */
class FooterStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("fmt_footer: stats agree with the data pages they index, and the " +
    "staged export really is multi-file multi-row-group") {
    val stats = FooterStats.fmtFooter(spark, "").collect()
    assert(stats.nonEmpty)

    // the staging contract the scale story rests on: several files, several
    // row groups per file (footer iteration is per-group, not per-file)
    val files = stats.map(_.getAs[String]("file")).distinct
    assert(files.length >= 2, s"expected a multi-file export, got $files")
    val rgPerFile = stats.groupBy(_.getAs[String]("file"))
      .view.mapValues(_.map(_.getAs[Int]("rg")).distinct.length)
    assert(rgPerFile.values.forall(_ >= 2),
      s"expected >=2 row groups per file, got $rgPerFile")

    // the planted all-NULL witness column: every value is a null, and the
    // footer carries NO min/max (NULL on both engines) — the guard that
    // used to NPE before the hasNonNullValue fix
    val (witness, rest) = stats.partition(_.getAs[String]("col") == "n_null_w")
    assert(witness.nonEmpty)
    witness.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == r.getAs[Long]("num_values"), r.toString)
      assert(r.isNullAt(r.fieldIndex("min_v")) && r.isNullAt(r.fieldIndex("max_v")),
        r.toString)
    }
    // every OTHER integer column in the export is non-nullable in practice
    assert(rest.forall(_.getAs[Long]("n_nulls") == 0L))

    // per-column value counts sum to the exported row count
    val data = spark.read.parquet(FooterStats.FOOT_DIR)
    val nRows = data.count()
    stats.groupBy(_.getAs[String]("col")).foreach { case (c, rows) =>
      assert(rows.map(_.getAs[Long]("num_values")).sum == nRows,
        s"value counts for $c don't sum to the table row count")
    }

    // footer min/max bound the actual data, and the GLOBAL bounds are tight
    // (equality at the extremes — the skipping manifest's usable invariant)
    val Seq(loTrue, hiTrue) = data
      .agg(min(col("n_chars")), max(col("n_chars"))).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSeq
    val chars = stats.filter(_.getAs[String]("col") == "n_chars")
    assert(chars.map(_.getAs[Long]("min_v")).min == loTrue)
    assert(chars.map(_.getAs[Long]("max_v")).max == hiTrue)
    chars.foreach { r =>
      assert(r.getAs[Long]("min_v") <= r.getAs[Long]("max_v"))
      assert(r.getAs[Long]("min_v") >= loTrue && r.getAs[Long]("max_v") <= hiTrue)
    }

    // the url-hash bucketing makes per-group n_chars ranges OVERLAP (random
    // within a bucket) while per-group url ranges are disjoint-sorted: a
    // skipping manifest on n_chars must therefore consult EVERY group for a
    // mid-range predicate — exactly the situation Compact.zorder exists to
    // fix; assert the overlap so the fixture keeps exercising it
    val byRg = chars.groupBy(r => (r.getAs[String]("file"), r.getAs[Int]("rg")))
    assert(byRg.size >= 4)
  }
}
