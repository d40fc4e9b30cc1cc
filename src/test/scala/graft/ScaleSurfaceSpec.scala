package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level scale proofs (SURVEY.md §2.13): capabilities whose value is the
  * SHAPE of the distributed plan, pinned by plan assertions + result checks.
  */
class ScaleSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  /** Co-located join: both sides bucketed on the join key with the same
    * bucket count → zero Exchange in the join plan. At 100 TB this is the
    * difference between re-shuffling the full fact table per join and a
    * local per-bucket merge — the layout cost is paid once at write time.
    */
  test("bucketed tables join with zero exchanges (co-located join)") {
    val s = spark
    val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      s.sql("DROP TABLE IF EXISTS graft_bucket_fact")
      s.sql("DROP TABLE IF EXISTS graft_bucket_dim")
      s.range(10000).selectExpr("id % 97 AS k", "id AS v")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_fact")
      s.range(5000).selectExpr("id % 97 AS k", "id * 2 AS w")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_dim")
      val j = s.table("graft_bucket_fact")
        .join(s.table("graft_bucket_dim"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected co-located join, got:\n$plan")
      val expected = s.range(10000).selectExpr("id % 97 AS k")
        .join(s.range(5000).selectExpr("id % 97 AS k"), "k").count()
      assert(j.count() == expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      s.conf.set("spark.sql.adaptive.enabled", prevA)
      s.sql("DROP TABLE IF EXISTS graft_bucket_fact")
      s.sql("DROP TABLE IF EXISTS graft_bucket_dim")
    }
  }

  /** Runtime bloom-filter join pruning: a selective dim-side predicate is
    * turned into a bloom filter evaluated on the fact side BEFORE its
    * shuffle, cutting shuffled bytes by the join selectivity. The 100 TB
    * lever for star joins whose dim filter can't be pushed to the fact scan.
    */
  test("runtime bloom filter prunes the fact side of a selective join") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    s.range(200000)
      .selectExpr("id % 1000 AS k", "id AS payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    s.range(1000).selectExpr("id AS k", "id % 17 AS attr")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> s.conf.getOption(k))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local inputs are far below the 10 GB production threshold
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val fact = s.read.parquet(s"$dir/fact")
      val dim = s.read.parquet(s"$dir/dim").filter(col("attr") === 3)
      val j = fact.join(dim, "k")
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected an injected bloom filter in:\n$opt")
      // selective filter: 1000/17 ≈ 59 dim keys survive, 200 fact rows each
      val exact = s.range(1000).filter(col("id") % 17 === 3).count() * 200
      assert(j.count() == exact)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }

  /** Mergeable sketches (DataSketches HLL + CountMinSketch): the pattern
    * that makes incremental 100 TB metrics possible — per-partition/per-day
    * sketches unioned later instead of re-scanning history. Union of group
    * sketches must equal the direct sketch (register-max is associative),
    * and both must sit within the published error bounds.
    */
  test("HLL sketch union == direct sketch; CMS counts within eps bound") {
    val df = spark.range(50000)
      .selectExpr("id % 9999 AS u", "id % 7 AS g").cache()
    try {
      val perGroup = df.groupBy("g").agg(expr("hll_sketch_agg(u)").as("sk"))
      val merged = perGroup
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .head.getLong(0)
      val direct = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(u))"))
        .head.getLong(0)
      assert(merged == direct,
        s"sketch union must be exact-associative: $merged vs $direct")
      assert(math.abs(merged - 9999).toDouble / 9999 < 0.05,
        s"HLL estimate $merged off >5% from 9999")

      // CountMinSketch: overestimates only, by at most eps*N w.h.p.
      val cmsBytes = df
        .agg(expr("count_min_sketch(u, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
        .head.getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(cmsBytes))
      val exactOf0 = df.filter(col("u") === 0).count()
      val est = cms.estimateCount(java.lang.Long.valueOf(0L))
      assert(est >= exactOf0 && est <= exactOf0 + (0.001 * 50000).toLong + 1,
        s"CMS estimate $est outside [$exactOf0, exact+eps*N]")
    } finally df.unpersist()
  }

  /** Spark's own bounded top-k-per-key path: a `row_number <= k` filter over
    * a window must plan as WindowGroupLimit (per-partition k-heap inserted
    * before AND after the shuffle), not a full per-key sort of every loser
    * row — the built-in complement to the custom TopKPerKey operator, and
    * the plan shape that keeps rank-filters viable at 100 TB.
    */
  test("rank<=k filter plans as WindowGroupLimit on both shuffle sides") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(100000).selectExpr("id % 1000 AS k", "id AS v")
    val top = df
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    assert(top.count() == 3000)
  }

  /** transformWithState continuity: the running-sum processor must carry
    * ValueState across microbatches on the RocksDB store (the only provider
    * the operator supports, and the store that scales state past the heap).
    * Two ts-ordered files → two batches; result must equal the batch
    * window sum.
    */
  test("transformWithState running sums carry RocksDB state across microbatches") {
    import graft.streaming.StreamingOps
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("timestamp").as("ts"))
    val cutoff = ev.selectExpr("percentile(CAST(unix_timestamp(ts) AS DOUBLE), 0.5) c")
      .collect()(0).getDouble(0).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft-tws").toString
    ev.filter(unix_timestamp(col("ts")) <= cutoff)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/f1")
    ev.filter(unix_timestamp(col("ts")) > cutoff)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/f2")
    val staged = java.nio.file.Files.createTempDirectory("graft-tws-in")
    def stage(sub: String, mtime: Long): Unit = {
      val src = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = staged.resolve(s"$sub.parquet")
      java.nio.file.Files.copy(src.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    stage("f1", t0); stage("f2", t0 + 30000)
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(prov)
    spark.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(staged.toString).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged.toString)
      val got = StreamingOps.runToTable(
        StreamingOps.runningSums(stream), "st_tws2", "append")
        .orderBy("user_id", "event_id").collect()
      val want = ev.select(col("user_id"), col("event_id"),
        sum((col("value").cast("decimal(12,2)") * 100).cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("running_c"))
        .orderBy("user_id", "event_id").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w) }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(prov, v)
        case None => spark.conf.unset(prov)
      }
    }
  }

  /** AQE skew-join: the runtime complement to the salt-folded join
    * (ex_skewjoin). A Zipf-hot key would pin one reducer in a shuffled
    * join; with skew-join enabled AQE splits the oversized partition into
    * sub-partitions at runtime (the dimension side is replicated per
    * split). Thresholds are shrunk so the local corpus trips the same code
    * path a 100 TB job relies on; the final adaptive plan must carry the
    * skew=true marker and the result must equal the non-AQE join.
    */
  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // key 0 carries 150k rows; 100 other keys carry ~200 each
    s.range(170000)
      .selectExpr("CASE WHEN id < 150000 THEN 0 ELSE id % 100 + 1 END AS k",
        "repeat('x', 64) AS pad", "id AS v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    s.range(200000, 240000)
      .selectExpr("CASE WHEN id < 230000 THEN 0 ELSE id % 100 + 1 END AS k", "id AS w")
      .write.mode("overwrite").parquet(s"$dir/probe")
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "200k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // both SMJ sides must be bare shuffle stages for AQE to split/duplicate
      // partitions (an agg between shuffle and join blocks the rewrite), and
      // the downstream agg must be global (a groupBy(k) would re-require the
      // join's hashpartitioning and AQE declines rather than add a shuffle)
      s.read.parquet(s"$dir/probe").groupBy("k").count()
        .write.mode("overwrite").parquet(s"$dir/probe_cnt")
      def agg() = s.read.parquet(s"$dir/fact")
        .join(s.read.parquet(s"$dir/probe_cnt"), "k")
        .agg(sum(expr("v * count")).as("sv"), count(lit(1)).as("n"))
      val df = agg()
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a runtime skew-split join in the adaptive plan:\n$plan")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val base = agg().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == base && rows.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
