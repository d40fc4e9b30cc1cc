package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the driver testdata tables (SURVEY.md
  * §2.4 J6, §2.5 A5–A7, §2.6 W6, §2.7 O2–O4, §2.8 scalars).
  *
  * Oracle-exactness rules used throughout (see FIXTURES.md §3):
  *   - money math goes double -> DECIMAL(12,2) -> BIGINT cents BEFORE
  *     aggregation (exact and order-independent; double sums would drift
  *     between engines) and every aggregate RESULT column is BIGINT on both
  *     sides: the driver hashes typed results, and DuckDB widens decimal /
  *     sum outputs (sum(BIGINT) -> HUGEINT, DECIMAL -> decimal128) away from
  *     Spark's int64 — value-equal, hash-different (CORRECTNESS_r01 lesson);
  *   - DuckDB window/rollup sums and row_number get explicit BIGINT casts
  *     (DuckDB row_number is int64; Spark's is int32 -> cast Spark to long);
  *   - integer division uses Spark `div` / DuckDB `//` (never `/`+cast);
  *   - every ORDER BY key set is total, with NULLS FIRST made explicit on
  *     the DuckDB side (its default is NULLS LAST; Spark's is NULLS FIRST);
  *   - doubles appear only where bit-identical by construction (round() of
  *     the same double, interpolated median of integral values).
  */
object Relational {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // ---- aggregation (TPC-H Q1 shape, integer-cents exact) -----------------
  //
  // Money math: double -> DECIMAL(12,2) (both engines round half-away-from-
  // zero on positive values) -> *100 -> BIGINT cents, then all aggregation is
  // exact 64-bit integer arithmetic. DECIMAL *output* columns are avoided
  // entirely: the driver hashes typed results and DuckDB widens decimal
  // sums/outputs differently than Spark (CORRECTNESS_r01 lesson).

  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .withColumn("qty_c", (col("l_quantity").cast("decimal(12,2)") * 100).cast("long"))
      .withColumn("price_c", (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .withColumn("disc_c", (col("l_discount").cast("decimal(12,2)") * 100).cast("long"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_base_c"),
        // cents * (100 - disc_cents): exact integer, unit = 1e-4 currency
        sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sum_disc_price_e4"),
        count(lit(1)).as("n")
      )
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) sum_qty_c,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) sum_base_c,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |                * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
      |            AS BIGINT) sum_disc_price_e4,
      |       count(*) n
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- 3-way join + top-k (TPC-H Q3 shape) -------------------------------

  def q3Join(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer").as("c")
      .join(t(spark, sfDir, "orders").as("o"), col("c.c_custkey") === col("o.o_custkey"))
      .join(t(spark, sfDir, "lineitem").as("l"), col("o.o_orderkey") === col("l.l_orderkey"))
      .filter(col("o.o_orderstatus") === "O")
      .groupBy(col("l.l_orderkey").as("l_orderkey"))
      .agg(
        // exact BIGINT, unit = 1e-4 currency (cents * (100 - disc_cents))
        sum((col("l.l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
          * (lit(100L) - (col("l.l_discount").cast("decimal(12,2)") * 100).cast("long")))
          .as("revenue_e4"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
      .limit(10)

  val q3JoinSql: String =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |                * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
      |            AS BIGINT) revenue_e4,
      |       count(*) n_items
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderstatus = 'O'
      |GROUP BY 1 ORDER BY revenue_e4 DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** 5-way join chain (TPC-H Q5 shape): region -> nation -> customer ->
    * orders -> lineitem, revenue by nation. The two dimension tables get
    * explicit broadcast hints (they are tiny at ANY scale factor — the big
    * fact-side never shuffles for them); customer⨝orders⨝lineitem are the
    * real shuffles. Exercises the deepest join chain in the suite plus
    * Catalyst's join planning over mixed broadcast/shuffle strategies.
    */
  def q5Join(spark: SparkSession, sfDir: String): DataFrame =
    broadcast(t(spark, sfDir, "region").filter(col("r_name") === "ASIA")).as("r")
      .join(broadcast(t(spark, sfDir, "nation")).as("n"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .join(t(spark, sfDir, "customer").as("c"),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .join(t(spark, sfDir, "orders").as("o"),
        col("o.o_custkey") === col("c.c_custkey"))
      .join(t(spark, sfDir, "lineitem").as("l"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .groupBy(col("n.n_name").as("n_name"))
      .agg(
        sum((col("l.l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
          * (lit(100L) - (col("l.l_discount").cast("decimal(12,2)") * 100).cast("long")))
          .as("revenue_e4"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("revenue_e4").desc, col("n_name").asc)

  val q5JoinSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |                * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)))
      |            AS BIGINT) revenue_e4,
      |       count(*) n_items
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |            JOIN customer ON c_nationkey = n_nationkey
      |            JOIN orders ON o_custkey = c_custkey
      |            JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE r_name = 'ASIA'
      |GROUP BY 1 ORDER BY revenue_e4 DESC, n_name ASC""".stripMargin

  // ---- semi / anti / outer joins -----------------------------------------

  def qSemi(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier")
      .join(
        t(spark, sfDir, "lineitem").filter(col("l_quantity") >= 49),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")

  val qSemiSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      |ORDER BY s_suppkey""".stripMargin

  def qAnti(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  def qOuter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .join(t(spark, sfDir, "customer"), col("c_nationkey") === col("n_nationkey"), "left_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(count(col("c_custkey")).as("n_cust"))
      .orderBy("n_nationkey")

  val qOuterSql: String =
    """SELECT n_nationkey, n_name, count(c_custkey) n_cust
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY n_nationkey""".stripMargin

  // ---- rollup / cube -----------------------------------------------------

  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  val qRollupSql: String =
    """SELECT lang, source, count(*) n, CAST(sum(n_chars) AS BIGINT) chars
      |FROM documents GROUP BY ROLLUP(lang, source)
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("e_day", date_trunc("DAY", col("ts")).cast("timestamp_ntz"))
      .cube("event_type", "e_day")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("e_day").asc_nulls_first)

  // DuckDB date_trunc('day'/'month', x) returns DATE (arrow date32) while
  // Spark's returns TIMESTAMP — cast the oracle side back to TIMESTAMP so
  // the arrow types agree (Spark side emits timestamp_ntz under UTC session)
  val qCubeSql: String =
    """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) e_day, count(*) n
      |FROM events GROUP BY CUBE(event_type, date_trunc('day', ts))
      |ORDER BY event_type ASC NULLS FIRST, e_day ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS (beyond rollup/cube) with grouping_id — SQL-only
    * surface in Spark's Dataset API, so stated via spark.sql over a temp
    * view (same pattern as the correlated subquery).
    */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents").createOrReplaceTempView("v_documents")
    spark.sql(
      """SELECT lang, source, count(*) AS n,
        |       CAST(grouping_id(lang, source) AS BIGINT) AS gid
        |FROM v_documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT lang, source, count(*) AS n,
      |       CAST(GROUPING(lang, source) AS BIGINT) AS gid
      |FROM documents
      |GROUP BY GROUPING SETS ((lang), (source), ())
      |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin

  // ---- window functions --------------------------------------------------

  def qWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, sfDir, "events")
      .withColumn("v100", round(col("value") * 100).cast("long"))
      .select(
        col("user_id"), col("event_id"),
        // BIGINT on both sides: DuckDB row_number() is int64, Spark's is int32
        row_number().over(w).cast("long").as("rn"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        sum(col("v100")).over(w.rowsBetween(-3, 0)).as("mv_sum")
      )
      .orderBy("user_id", "rn")
  }

  val qWindowSql: String =
    """SELECT user_id, event_id,
      |       row_number() OVER w rn,
      |       lag(event_type, 1) OVER w prev_type,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT))
      |              OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) mv_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn""".stripMargin

  /** RANGE-frame window + dense_rank (the W6 members not covered elsewhere):
    * per-user trailing-1-hour value sum over event-time seconds, plus a
    * dense rank of the event type. The frame key is integer epoch seconds
    * (Spark unix_timestamp == DuckDB epoch_us // 1e6, both floor) so the
    * RANGE bound is exact on both engines despite sub-second timestamps.
    */
  def qRangeWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val wr = Window.partitionBy("user_id").orderBy("es")
    val wd = Window.partitionBy("user_id").orderBy("event_type")
    t(spark, sfDir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("v100", round(col("value") * 100).cast("long"))
      .select(
        col("user_id"), col("event_id"), col("es"),
        sum(col("v100")).over(wr.rangeBetween(-3600, 0)).as("hour_sum"),
        dense_rank().over(wd).cast("long").as("type_rank")
      )
      .orderBy("user_id", "es", "event_id")
  }

  val qRangeWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
      |         CAST(round(value * 100) AS BIGINT) v100, event_type
      |  FROM events)
      |SELECT user_id, event_id, es,
      |       CAST(sum(v100) OVER (PARTITION BY user_id ORDER BY es
      |                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |            AS BIGINT) hour_sum,
      |       dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) type_rank
      |FROM e ORDER BY user_id, es, event_id""".stripMargin

  // ---- json / dates / scalars --------------------------------------------

  def qJson(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .orderBy("event_id")

  val qJsonSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) k
      |FROM events ORDER BY event_id""".stripMargin

  /** MapType scalar coverage (SURVEY.md §2.8 map family): build a map with
    * `map_from_entries`, read it back with `element_at` / `map_keys`. DuckDB
    * map extraction returns a one-element LIST, hence the trailing `[1]`.
    */
  def qMap(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        map_from_entries(array(
          struct(lit("brand").as("k"), col("p_brand").as("v")),
          struct(lit("type").as("k"), col("p_type").as("v"))
        )).as("m")
      )
      .select(
        col("p_partkey"),
        element_at(col("m"), "brand").as("brand"),
        element_at(col("m"), "type").as("ptype"),
        element_at(col("m"), "missing").as("novalue"),
        size(map_keys(col("m"))).cast("long").as("nkeys")
      )
      .orderBy("p_partkey")

  val qMapSql: String =
    """WITH wm AS (
      |  SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) m FROM part)
      |SELECT p_partkey,
      |       m['brand'][1] brand,
      |       m['type'][1] ptype,
      |       m['missing'][1] novalue,
      |       CAST(cardinality(m) AS BIGINT) nkeys
      |FROM wm ORDER BY p_partkey""".stripMargin

  /** Array-family coverage not exercised elsewhere: posexplode (position +
    * value) and flatten. DuckDB has no WITH ORDINALITY in 1.0 — positions
    * come from an unnested generate_series over the list length.
    */
  def qArray(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        split(col("p_name"), " ").as("words"),
        array_join(flatten(array(array(col("p_brand")), array(col("p_type")))), "|")
          .as("flat"))
      .select(col("p_partkey"), col("flat"),
        posexplode(col("words")).as(Seq("pos", "w")))
      .withColumn("pos", col("pos").cast("long"))
      .orderBy("p_partkey", "pos")

  val qArraySql: String =
    """WITH t AS (
      |  SELECT p_partkey,
      |         string_split(p_name, ' ') words,
      |         array_to_string(flatten([[p_brand], [p_type]]), '|') flat
      |  FROM part),
      |px AS (
      |  SELECT p_partkey, flat, words,
      |         unnest(generate_series(1, len(words))) i
      |  FROM t)
      |SELECT p_partkey, flat, CAST(i - 1 AS BIGINT) pos, words[i] w
      |FROM px ORDER BY p_partkey, pos""".stripMargin

  def qDates(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(date_trunc("MONTH", col("o_orderdate")).cast("timestamp_ntz").as("o_month"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"))
      .orderBy("o_month")

  val qDatesSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) o_month, count(*) n,
      |       min(o_orderkey) min_key
      |FROM orders GROUP BY 1 ORDER BY o_month""".stripMargin

  def qScalarStr(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        substring(col("p_name"), 1, 5).as("pre"),
        translate(col("p_brand"), "B#", "b-").as("tbrand"),
        instr(col("p_name"), "a").cast("long").as("apos"),
        lpad(col("p_type"), 20, ".").as("ptype"),
        concat_ws("/", col("p_brand"), col("p_size")).as("bs"),
        length(col("p_name")).cast("long").as("nlen")
      )
      .orderBy("p_partkey")

  val qScalarStrSql: String =
    """SELECT p_partkey,
      |       lower(p_name) lname,
      |       substr(p_name, 1, 5) pre,
      |       translate(p_brand, 'B#', 'b-') tbrand,
      |       CAST(instr(p_name, 'a') AS BIGINT) apos,
      |       lpad(p_type, 20, '.') ptype,
      |       concat_ws('/', p_brand, p_size) bs,
      |       CAST(length(p_name) AS BIGINT) nlen
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- sorts / limits / set ops / distinct -------------------------------

  def qTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("price_c")
      )
      .orderBy(col("price_c").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)

  val qTopkSql: String =
    """SELECT l_orderkey, l_linenumber,
      |       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c
      |FROM lineitem ORDER BY price_c DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 20""".stripMargin

  /** Top-k per key via the custom Catalyst operator stack
    * ([[graft.plans.TopKPerKey]]): bounded heaps map-side and reduce-side
    * instead of the window formulation's shuffle-everything + sort-partition.
    * The DuckDB oracle IS the window formulation — with a total order the
    * two are bit-identical.
    */
  def qTopkPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("price_c"))
    graft.plans.TopK.perKey(
      li,
      keys = Seq(col("l_returnflag"), col("l_linestatus")),
      order = Seq(col("price_c").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      k = 3)
      .orderBy(col("l_returnflag"), col("l_linestatus"),
        col("price_c").desc, col("l_orderkey"), col("l_linenumber"))
  }

  val qTopkPerKeySql: String =
    """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, price_c
      |FROM (SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
      |             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c
      |      FROM lineitem)
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |                           ORDER BY price_c DESC, l_orderkey, l_linenumber) <= 3
      |ORDER BY l_returnflag, l_linestatus, price_c DESC, l_orderkey, l_linenumber""".stripMargin

  /** The NAIVE top-k-per-key formulation — `row_number` window + `rn <= 2`
    * filter, no [[graft.plans.TopK.perKey]] call. [[graft.plans.AutoTopKRewrite]]
    * (a `Rule[LogicalPlan]` on the optimizer-rule injection surface) rewrites
    * it to the bounded-heap TopKPerKey stack; CatalystSurfaceSpec pins the
    * physical plan and the rewrite's equivalence to the un-rewritten run.
    * The DuckDB oracle is the same QUALIFY formulation — ranks included, so
    * the hash also pins that the post-rewrite recomputed `row_number` equals
    * the stock one.
    */
  def qTopkAuto(spark0: SparkSession, sfDir: String): DataFrame = {
    // The rule is session state — scope it to an isolated session so the
    // driver's other queries keep their stock plans (same SparkContext).
    val spark = spark0.newSession()
    graft.plans.TopK.ensureRule(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("price_c").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("price_c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      // BIGINT on both sides: DuckDB row_number() is int64, Spark's is int32
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("price_c"), col("rn").cast("long").as("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  val qTopkAutoSql: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, price_c,
      |       row_number() OVER (PARTITION BY l_returnflag
      |                          ORDER BY price_c DESC, l_orderkey, l_linenumber) rn
      |FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
      |             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c
      |      FROM lineitem)
      |QUALIFY rn <= 2
      |ORDER BY l_returnflag, rn""".stripMargin

  def qExcept(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer").select(col("c_custkey"))
      .except(t(spark, sfDir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  val qExceptSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY c_custkey""".stripMargin

  def qIntersect(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer").select(col("c_custkey"))
      .intersect(t(spark, sfDir, "orders").select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  val qIntersectSql: String =
    """SELECT c_custkey FROM customer
      |INTERSECT SELECT o_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin

  def qDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_parts"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val qDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) nd_parts, count(*) n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pivot (wide aggregation): order counts per month x orderstatus. Spark's
    * `pivot` compiles to conditional aggregation, which is exactly how the
    * DuckDB oracle states it — fixed pivot-column list on both sides (an
    * open-ended pivot needs a driver-side distinct pass; fixed lists are the
    * scale-safe form).
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .withColumn("o_month", date_trunc("MONTH", col("o_orderdate")).cast("timestamp_ntz"))
      .groupBy("o_month")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_month")

  val qPivotSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) o_month,
      |       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) "F",
      |       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) "O",
      |       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) "P"
      |FROM orders GROUP BY 1 ORDER BY o_month""".stripMargin

  // ---- range / as-of joins -----------------------------------------------

  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders").as("o")
      .join(
        t(spark, sfDir, "lineitem").as("l"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") >= col("o.o_orderdate") &&
          col("l.l_shipdate") < col("o.o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o.o_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy("o_orderkey")

  val qRangeJoinSql: String =
    """SELECT o_orderkey, count(*) n_in_window
      |FROM orders JOIN lineitem
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      |GROUP BY 1 ORDER BY o_orderkey""".stripMargin

  def qAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t(spark, sfDir, "events")
      .filter(col("ts") <= expr("timestamp'2024-01-15 00:00:00'"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("asof_ts"), col("event_type"))
      .orderBy("user_id")
  }

  val qAsofSql: String =
    """SELECT user_id, ts asof_ts, event_type
      |FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- correlated scalar subquery (Catalyst decorrelation) ---------------

  def qSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sfDir, "lineitem").createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT o_orderkey,
        |       (SELECT count(*) FROM v_lineitem WHERE l_orderkey = o_orderkey) AS n_items
        |FROM v_orders ORDER BY o_orderkey""".stripMargin)
  }

  val qSubquerySql: String =
    """SELECT o_orderkey,
      |       (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- union (O3 relational surface) -------------------------------------

  def qUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val d = t(spark, sfDir, "documents")
    d.filter(col("lang") === "en").select(col("doc_id"), lit("en_doc").as("tag"))
      .unionByName(
        d.filter(col("n_chars") > 400).select(col("doc_id"), lit("long_doc").as("tag")))
      .orderBy("doc_id", "tag")
  }

  val qUnionSql: String =
    """SELECT doc_id, 'en_doc' AS tag FROM documents WHERE lang = 'en'
      |UNION ALL
      |SELECT doc_id, 'long_doc' AS tag FROM documents WHERE n_chars > 400
      |ORDER BY doc_id, tag""".stripMargin

  // ---- exact median over integral doubles --------------------------------

  def qMedian(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val qMedianSql: String =
    """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) med_qty, count(*) n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- gap-filled calendar spine (§2.12) ---------------------------------

  /** Gap-fill: daily order counts per priority over a fixed calendar month,
    * missing days zero-filled — the date-spine pattern every time-series
    * report needs (a groupBy alone silently drops empty days). The spine is
    * `sequence(start, stop) × distinct keys`: generated, never shuffled at
    * scale (the fact side aggregates FIRST, the tiny spine left-joins the
    * aggregate — broadcast at any corpus size).
    */
  def qGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val days = spark.range(1).select(
      explode(expr("sequence(DATE'1995-01-01', DATE'1995-01-31', interval 1 day)")).as("d"))
    val pr = t(spark, sfDir, "orders").select(col("o_orderpriority")).distinct()
    val counts = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1995-02-01"))
      .groupBy(to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    days.crossJoin(pr)
      .join(counts, Seq("d", "o_orderpriority"), "left")
      .select(col("d"), col("o_orderpriority"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("d", "o_orderpriority")
  }

  val qGapfillSql: String =
    """WITH days AS (
      |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-01-31',
      |                                     INTERVAL 1 DAY)) AS DATE) d),
      |pr AS (SELECT DISTINCT o_orderpriority FROM orders),
      |c AS (SELECT CAST(o_orderdate AS DATE) d, o_orderpriority, count(*) n
      |      FROM orders
      |      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |        AND o_orderdate < TIMESTAMP '1995-02-01'
      |      GROUP BY 1, 2)
      |SELECT days.d, pr.o_orderpriority, CAST(coalesce(c.n, 0) AS BIGINT) n_orders
      |FROM days CROSS JOIN pr
      |LEFT JOIN c ON c.d = days.d AND c.o_orderpriority = pr.o_orderpriority
      |ORDER BY days.d, pr.o_orderpriority""".stripMargin

  // ---- distribution ranks: ntile / percent_rank / cume_dist (§2.12) ------

  /** The remaining ranking-window family: quartile bucket, percentile rank,
    * and cumulative distribution per event over its type's value ordering.
    * The ORDER BY is total (value, event_id), so the double-valued
    * percent_rank/cume_dist are the same exact rationals in both engines.
    */
  def qRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    t(spark, sfDir, "events")
      .select(
        col("event_id"), col("event_type"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy("event_id")
  }

  val qRanksSql: String =
    """SELECT event_id, event_type,
      |       ntile(4)       OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist()    OVER w AS cum_dist
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  // ---- unpivot / melt (§2.12 — inverse of A9 pivot) ----------------------

  /** `Dataset.unpivot` (melt): the wide per-month × status counts from the
    * pivot shape stacked back to long form, missing cells zero-filled. Wide
    * → long is the standard prep step before per-cell operators (the pivot
    * demo's exact inverse; `unpivot` is the first-class Spark 3.4+ API, not
    * a stack() selectExpr).
    */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = t(spark, sfDir, "orders")
      .withColumn("o_month", date_trunc("MONTH", col("o_orderdate")).cast("timestamp_ntz"))
      .groupBy("o_month")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
    wide
      .unpivot(Array(col("o_month")), Array(col("F"), col("O"), col("P")),
        "o_orderstatus", "n")
      .select(col("o_month"), col("o_orderstatus"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("o_month", "o_orderstatus")
  }

  val qUnpivotSql: String =
    """WITH c AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) m,
      |                  o_orderstatus st, count(*) n
      |           FROM orders GROUP BY 1, 2),
      |months AS (SELECT DISTINCT m FROM c),
      |sts AS (SELECT unnest(['F', 'O', 'P']) st)
      |SELECT months.m AS o_month, sts.st AS o_orderstatus,
      |       CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |FROM months CROSS JOIN sts
      |LEFT JOIN c ON c.m = months.m AND c.st = sts.st
      |ORDER BY o_month, o_orderstatus""".stripMargin

  // ---- navigation window functions (§2.12 — completes W6/W7) -------------

  /** first_value / last_value / nth_value over the full partition frame:
    * per event, its type's first, last, and third event id in time order.
    * The frame must be explicitly UNBOUNDED FOLLOWING — the default frame
    * ends at CURRENT ROW, which silently turns last_value into "self".
    */
  def qNav(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, sfDir, "events")
      .select(
        col("event_id"), col("event_type"),
        first(col("event_id")).over(w).as("first_ev"),
        last(col("event_id")).over(w).as("last_ev"),
        nth_value(col("event_id"), 3).over(w).as("third_ev"))
      .orderBy("event_id")
  }

  val qNavSql: String =
    """SELECT event_id, event_type,
      |       first_value(event_id) OVER w AS first_ev,
      |       last_value(event_id)  OVER w AS last_ev,
      |       nth_value(event_id, 3) OVER w AS third_ev
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  // ---- VARIANT (Spark 4 semi-structured type) ----------------------------

  /** The props JSON parsed once into a VARIANT column, then typed paths
    * extracted with variant_get — Spark 4's answer to schema-on-read
    * semi-structured data (binary-encoded, so repeated path extraction skips
    * re-parsing; the at-scale contrast to get_json_object in q_json).
    * try_variant_get on a missing path yields NULL, matching the oracle's
    * json_extract_string. Grouped tail proves the extracted values feed
    * normal relational ops.
    */
  def qVariant(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
        expr("try_variant_get(parse_json(props), '$.missing', 'int')").as("m"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
        count(col("m")).as("n_missing"))
      .orderBy("event_type", "k_mod")

  val qVariantSql: String =
    """SELECT event_type,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
      |       count(*) n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) sum_k,
      |       count(json_extract_string(props, '$.missing')) n_missing
      |FROM events
      |GROUP BY 1, 2 ORDER BY event_type, k_mod""".stripMargin

  // ---- lateral join (correlated top-N subquery per row) ------------------

  /** LATERAL correlated subquery: each BUILDING-segment customer paired with
    * its two highest-value orders. Catalyst decorrelates the LIMIT-per-group
    * subquery into a ranked window join — the declarative form of the
    * top-k-per-key pattern (U5) expressed through the SQL lateral surface.
    * Money compared in exact BIGINT cents (FIXTURES.md §3 rules).
    */
  def qLateral(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.total_c
        |FROM v_customer c,
        |LATERAL (
        |  SELECT o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) total_c
        |  FROM v_orders WHERE o_custkey = c.c_custkey
        |  ORDER BY total_c DESC, o_orderkey LIMIT 2
        |) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, total_c DESC, o_orderkey""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.total_c
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) total_c
      |  FROM orders WHERE o_custkey = c.c_custkey
      |  ORDER BY total_c DESC, o_orderkey LIMIT 2
      |) o
      |WHERE c.c_mktsegment = 'BUILDING'
      |ORDER BY c_custkey, total_c DESC, o_orderkey""".stripMargin

  // ---- recursive CTE (iterative query surface, Spark 4 WITH RECURSIVE) ---

  /** Recursive CTE: each part's containment chain under the deterministic
    * decimal hierarchy (parent = key div 10), walked to the single-digit
    * root. The recursion is linear (one parent per node, depth ≤ ⌈log₁₀
    * maxkey⌉ ≈ 7), so the iterative plan runs a bounded number of
    * micro-joins regardless of corpus size — the same shape as a
    * reachability walk over a shallow forest. Integer `div`/`//` per
    * FIXTURES.md §3 (both truncate; keys are non-negative).
    */
  def qRcte(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "part").createOrReplaceTempView("v_part")
    spark.sql(
      """WITH RECURSIVE anc(part, node, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM v_part
        |  UNION ALL
        |  SELECT part, node div 10, depth + 1 FROM anc WHERE node >= 10
        |)
        |SELECT part, CAST(max(depth) AS BIGINT) chain_len,
        |       CAST(min(node) AS BIGINT) root
        |FROM anc GROUP BY part ORDER BY part""".stripMargin)
  }

  /** min(node) is the root because the walk is monotone decreasing. */
  val qRcteSql: String =
    """WITH RECURSIVE anc(part, node, depth) AS (
      |  SELECT p_partkey, p_partkey, 0 FROM part
      |  UNION ALL
      |  SELECT part, node // 10, depth + 1 FROM anc WHERE node >= 10
      |)
      |SELECT part, CAST(max(depth) AS BIGINT) chain_len,
      |       CAST(min(node) AS BIGINT) root
      |FROM anc GROUP BY part ORDER BY part""".stripMargin

  // ---- null-safe join (`<=>` / IS NOT DISTINCT FROM) ---------------------

  /** Null-safe equi-join: facts keyed by a NULLABLE derived key joined to
    * the distinct key dimension with `<=>`, so NULL-keyed rows match the
    * NULL dimension row instead of silently dropping (a plain `===` loses
    * them). Catalyst keeps `<=>` on the hash/sort-merge equi path (the key
    * is compared null-safely, not degraded to a nested-loop join). Scale
    * note: all NULL keys hash to ONE reducer — acceptable here because the
    * dim side is distinct-tiny (broadcast); for fact-fact null-safe joins
    * at 100 TB, split the NULL stratum out first (it can only match NULL).
    */
  def qNullsafe(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = t(spark, sfDir, "events")
      .select(col("event_id"), expr("nullif(event_type, 'click')").as("k"))
    // dim derives from fact (a self-join lineage): alias both sides and use
    // qualified names so the analyzer can tell the two `k`s apart.
    val dim = fact.select(col("k")).distinct()
    fact.as("f").join(broadcast(dim.as("d")), col("f.k") <=> col("d.k"))
      .groupBy(coalesce(col("d.k"), lit("(null)")).as("k_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("k_label")
  }

  val qNullsafeSql: String =
    """WITH f AS (SELECT event_id, nullif(event_type, 'click') k FROM events),
      |d AS (SELECT DISTINCT k FROM f)
      |SELECT coalesce(d.k, '(null)') k_label, count(*) n
      |FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- batch sessionization (gaps-and-islands) ---------------------------

  /** Gaps-and-islands sessionization: per-user event streams cut into
    * sessions at >30-minute silences — the batch twin of the streaming
    * session window (ST4), expressed as the classic lag-flag + running-sum
    * pattern (the same shape W3 uses for line ids). ONE shuffle on user_id
    * serves both windows and the session aggregate: the flag window, the
    * running sum, and the groupBy all share the user_id partitioning
    * (Exchange reuse), so at 100 TB this is a single repartition of the
    * event log. Gap arithmetic in integer epoch seconds (exact both
    * engines); tie-break on event_id makes the order total.
    */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    t(spark, sfDir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("new_s",
        when(lag(col("es"), 1).over(w).isNull ||
          col("es") - lag(col("es"), 1).over(w) > 1800L, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("es")).as("s_start"),
        max(col("es")).as("s_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess")
  }

  val qSessionizeSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es FROM events),
      |f AS (
      |  SELECT user_id, event_id, es,
      |         CASE WHEN lag(es) OVER w IS NULL
      |                OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END flg
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |s AS (
      |  SELECT user_id, es,
      |         sum(flg) OVER (PARTITION BY user_id ORDER BY es, event_id
      |                        ROWS UNBOUNDED PRECEDING) sess
      |  FROM f)
      |SELECT user_id, CAST(sess AS BIGINT) sess, min(es) s_start,
      |       max(es) s_end, count(*) n_events
      |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin

  // ---- bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) ----------------

  /** `exceptAll` / `intersectAll`: multiset difference and intersection over
    * order keys that repeat (one row per lineitem), where the DISTINCT
    * variants (O4) would collapse multiplicities. Both plan as a count-
    * aggregate + generate (no nested loop); identical duplicate rows make
    * the ORDER BY safely total for hashing.
    */
  def qBagOps(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val a = li.filter(col("l_quantity") < 10).select(col("l_orderkey"))
    val b = li.filter(col("l_discount") > 0.05).select(col("l_orderkey"))
    a.exceptAll(b).select(lit("except_all").as("tag"), col("l_orderkey"))
      .unionByName(
        a.intersectAll(b).select(lit("intersect_all").as("tag"), col("l_orderkey")))
      .orderBy("tag", "l_orderkey")
  }

  val qBagOpsSql: String =
    """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_quantity < 10),
      |b AS (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05)
      |SELECT * FROM (
      |  SELECT 'except_all' tag, l_orderkey FROM (
      |    SELECT l_orderkey FROM a EXCEPT ALL SELECT l_orderkey FROM b)
      |  UNION ALL
      |  SELECT 'intersect_all' tag, l_orderkey FROM (
      |    SELECT l_orderkey FROM a INTERSECT ALL SELECT l_orderkey FROM b))
      |ORDER BY tag, l_orderkey""".stripMargin

  // ---- two-table as-of join (union + LOCF, one shuffle) ------------------

  /** As-of join of the event stream to a per-type quote series (latest
    * quote with qs ≤ es), implemented as the SCALE-CORRECT union+LOCF
    * formulation: tag quotes and events, union them, and carry the last
    * quote forward in ONE (event_type)-partitioned time-ordered window —
    * the big side shuffles exactly once and there is no per-row subquery or
    * range join at all. Tie-break `pri` sorts a quote BEFORE an event at
    * the same timestamp, giving the inclusive `es >= qs` semantics. The
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — two independent
    * formulations of as-of semantics (window fill vs binary-search join)
    * hash-compared row-for-row.
    */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val e = t(spark, sfDir, "events").select(col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val quotes = e.select("event_type").distinct()
      .crossJoin(spark.range(120).select(col("id").as("i")))
      .select(col("event_type"),
        (lit(base) + col("i") * 21600L).as("qs"),
        ((col("i") * 31 + length(col("event_type")) * 17) % 1000).as("qv"))
    val uq = quotes.select(col("event_type"), col("qs").as("t"), lit(0).as("pri"),
      lit(null).cast("long").as("event_id"), col("qs"), col("qv"))
    val ue = e.select(col("event_type"), col("es").as("t"), lit(1).as("pri"),
      col("event_id"), lit(null).cast("long").as("qs"), lit(null).cast("long").as("qv"))
    val w = Window.partitionBy("event_type").orderBy("t", "pri")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    uq.unionByName(ue)
      .withColumn("qs_f", last(col("qs"), ignoreNulls = true).over(w))
      .withColumn("qv_f", last(col("qv"), ignoreNulls = true).over(w))
      .filter(col("pri") === 1)
      .select(col("event_id"), col("event_type"), col("t").as("es"),
        col("qs_f").as("qs"), col("qv_f").as("qv"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """WITH et AS (SELECT DISTINCT event_type FROM events),
      |q AS (
      |  SELECT event_type, 1704067200 + i * 21600 AS qs,
      |         (i * 31 + length(event_type) * 17) % 1000 AS qv
      |  FROM et, range(120) t(i)),
      |e AS (SELECT event_id, event_type, epoch_us(ts) // 1000000 AS es FROM events)
      |SELECT e.event_id, e.event_type, e.es, q.qs, q.qv
      |FROM e ASOF LEFT JOIN q
      |  ON e.event_type = q.event_type AND e.es >= q.qs
      |ORDER BY e.event_id""".stripMargin

  // ---- winsorization (exact order-statistic outlier clipping) ------------

  /** Per-group outlier clipping to the EXACT [p5, p95] order statistics:
    * ranks are assigned by a total order (value, event_id), the bound ranks
    * are pure integer arithmetic (`greatest(1, (q*n) div 100)` — no
    * interpolated percentile, so no float drift), and the two selected rows
    * collapse to a tiny per-group bounds table that BROADCASTS back onto
    * the events for the clamp. The standard value-cleaning pass before
    * aggregate features at 100 TB: one event_type shuffle for the ranking
    * window, then a broadcast map-side clamp — the big side shuffles once.
    */
  def qWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = t(spark, sfDir, "events").select(col("event_id"), col("event_type"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"))
    val ranked = e
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("v", "event_id")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val bounds = ranked.filter(
        col("rn") === expr("greatest(1L, (5 * n) div 100)") ||
          col("rn") === expr("greatest(1L, (95 * n) div 100)"))
      .groupBy("event_type").agg(min(col("v")).as("p5"), max(col("v")).as("p95"))
    e.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("v"),
        least(greatest(col("v"), col("p5")), col("p95")).as("v_clip"))
      .orderBy("event_id")
  }

  val qWinsorizeSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) v
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) rn,
      |         count(*) OVER (PARTITION BY event_type) n
      |  FROM e),
      |b AS (
      |  SELECT event_type, min(v) p5, max(v) p95 FROM r
      |  WHERE rn = greatest(1, (5 * n) // 100) OR rn = greatest(1, (95 * n) // 100)
      |  GROUP BY 1)
      |SELECT event_id, e.event_type, v, least(greatest(v, p5), p95) v_clip
      |FROM e JOIN b ON e.event_type = b.event_type ORDER BY event_id""".stripMargin

  // ---- CDC snapshot diff (incremental processing) ------------------------

  /** Change-data-capture diff between two deterministic snapshots of the
    * orders table (yesterday = keys with k%7≠0; today = keys with k%10≠0,
    * every 13th price bumped): one FULL OUTER join on the key classifies
    * each row as added / removed / changed and drops unchanged rows — the
    * recompute-avoidance primitive that turns a daily 100 TB rebuild into
    * processing only the delta. Single key shuffle (or zero with bucketed
    * snapshots, §2.13 O5); prices compared in exact integer cents.
    */
  def qCdc(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(col("o_orderkey"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("c"))
    val a = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("ka"), col("c").as("old_c"))
    val b = o.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("kb"),
        (col("c") + when(col("o_orderkey") % 13 === 0, 100L).otherwise(0L)).as("new_c"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .withColumn("op",
        when(col("ka").isNull, "added")
          .when(col("kb").isNull, "removed")
          .when(col("old_c") =!= col("new_c"), "changed"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
        col("op"), col("old_c"), col("new_c"))
      .orderBy("o_orderkey")
  }

  val qCdcSql: String =
    """WITH o AS (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
      |  FROM orders),
      |a AS (SELECT o_orderkey ka, c old_c FROM o WHERE o_orderkey % 7 <> 0),
      |b AS (SELECT o_orderkey kb,
      |             c + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END new_c
      |      FROM o WHERE o_orderkey % 10 <> 0),
      |j AS (
      |  SELECT ka, kb, old_c, new_c,
      |         CASE WHEN ka IS NULL THEN 'added'
      |              WHEN kb IS NULL THEN 'removed'
      |              WHEN old_c <> new_c THEN 'changed' END op
      |  FROM a FULL OUTER JOIN b ON ka = kb)
      |SELECT coalesce(ka, kb) o_orderkey, op, old_c, new_c
      |FROM j WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin

  // ---- integer PageRank (iterative link analysis) ------------------------

  /** Four damped PageRank iterations over a deterministic NON-UNIFORM link
    * graph in EXACT parts-per-billion integer arithmetic: every doc links to
    * `(id² + 13) % n` (quadratic — non-bijective, so quadratic residues
    * become hubs and non-residues get zero in-links) and every third doc
    * adds `(id*17 + 5) % n` (out-degree varies 1/2). Update rule
    * `r' = (15e7 div n) + (85 * Σ_in (r div outdeg)) div 100` with
    * identical `div` truncation in both engines keeps four iterations
    * bit-equal; the graph genuinely exercises it — at sf0.01 the fixpoint
    * has 147 distinct ranks spanning 0.3 M (teleport-only sinks) to 25 M
    * ppb (hubs), and Σr = 999 999 833 < 1e9 shows real truncation loss the
    * oracle must reproduce. Weighted-iteration complement to dd_components'
    * fixpoint labels. Scale shape: each iteration is ONE shuffle
    * (contribution groupBy on dst) plus a key-partitioned join back to the
    * node set; lineage is cut per iteration (`localCheckpoint`, as in
    * components) so the plan never deepens; iteration count is fixed, not
    * data-dependent. At 100 TB the edges table would be the co-partitioned
    * big side and ranks the re-shuffled small side of each round.
    */
  def qPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).localCheckpoint()
    val n = docs.count() // scalar graph-size parameter (teleport + modulus)
    val odeg = when(col("doc_id") % 3 === 0, 2L).otherwise(1L)
    val edges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * col("doc_id") + 13) % n).as("dst"), odeg.as("odeg"))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 17 + 5) % n).as("dst"), lit(2L).as("odeg")))
      .localCheckpoint()
    val tele = 150000000L / n
    var ranks = docs.select(col("doc_id"), lit(1000000000L / n).as("r"))
    for (_ <- 1 to 4) {
      val contrib = ranks
        .join(edges, ranks("doc_id") === edges("src"))
        .groupBy("dst").agg(sum(expr("r div odeg")).as("s"))
      ranks = docs
        .join(contrib, docs("doc_id") === contrib("dst"), "left")
        .select(docs("doc_id"),
          (lit(tele) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.orderBy("doc_id")
  }

  val qPagerankSql: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT nodes.doc_id,
         |         150000000 // (SELECT c FROM n)
         |           + (85 * coalesce(sum(p.r // e.odeg), 0)) // 100 AS r
         |  FROM nodes
         |  LEFT JOIN e ON e.dst = nodes.doc_id
         |  LEFT JOIN $prev p ON p.doc_id = e.src
         |  GROUP BY nodes.doc_id)""".stripMargin
    s"""WITH n AS (SELECT count(*) c FROM documents),
       |nodes AS (SELECT doc_id FROM documents),
       |e AS (
       |  SELECT doc_id src, (doc_id * doc_id + 13) % (SELECT c FROM n) dst,
       |         CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END odeg
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 17 + 5) % (SELECT c FROM n), 2
       |  FROM documents WHERE doc_id % 3 = 0),
       |r0 AS (SELECT doc_id, 1000000000 // (SELECT c FROM n) AS r FROM nodes),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")},
       |${step("r3", "r4")}
       |SELECT doc_id, CAST(r AS BIGINT) r FROM r4 ORDER BY doc_id""".stripMargin
  }

  // ---- LOCF forward fill (time-series repair) ----------------------------

  /** Last-observation-carried-forward: a deterministically-punched sensor
    * series (every 3rd event's reading NULLed) repaired per user by carrying
    * the last non-null value forward in event-time order — `last(...,
    * ignoreNulls)` over ROWS UNBOUNDED PRECEDING, the running-state window
    * that complements q_gapfill's zero-fill. One user_id shuffle, same
    * partitioning the sessionize/asof family rides; leading NULLs (no prior
    * observation) stay NULL in both engines.
    */
  def qLocf(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("v",
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("event_id") % 100))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("es"), col("v"), col("filled"))
      .orderBy("user_id", "es", "event_id")
  }

  val qLocfSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
      |         CASE WHEN event_id % 3 = 0 THEN NULL
      |              ELSE event_id % 100 END AS v
      |  FROM events)
      |SELECT user_id, event_id, es, v,
      |       last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY es, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM o ORDER BY user_id, es, event_id""".stripMargin

  // ---- bucketized interval join (pure range predicate, no equi key) ------

  /** Interval-containment join with NO equi key — events counted into 100
    * overlapping 8-hour windows — rewritten as a BUCKETIZED EQUI-JOIN, the
    * formulation that survives two large sides. Spark plans a bare
    * `ts BETWEEN ws AND we` join as BroadcastNestedLoopJoin (or a cartesian
    * product when neither side broadcasts — the 100 TB killer). Instead:
    * quantize time into 4-hour buckets, explode each interval into the 2–3
    * buckets it spans, attach each event to its single bucket, and
    * equi-join on the bucket with the range check as a residual filter.
    * Each (event, interval) pair meets in EXACTLY one bucket (the event's
    * own), so no dedup is needed. The join is now hash/merge-able and
    * shuffles on a high-cardinality key; interval explosion is bounded by
    * span/bucket (≤3 here). A plan test pins the no-nested-loop claim with
    * broadcast disabled. Epoch-second integer arithmetic both engines.
    */
  def qIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val wins = spark.range(100).select(
      col("id").as("wid"),
      (lit(base) + col("id") * 25200L).as("ws"),
      (lit(base) + col("id") * 25200L + 28800L).as("we"))
    val winBuckets = wins.withColumn("bkt",
      explode(sequence(expr("ws div 14400"), expr("(we - 1) div 14400"))))
    t(spark, sfDir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("bkt", expr("es div 14400"))
      .join(winBuckets, Seq("bkt"))
      .filter(col("es") >= col("ws") && col("es") < col("we"))
      .groupBy("wid")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("wid")
  }

  val qIntervalJoinSql: String =
    """WITH w AS (
      |  SELECT i AS wid, 1704067200 + i * 25200 AS ws,
      |         1704067200 + i * 25200 + 28800 AS we
      |  FROM range(100) t(i)),
      |e AS (SELECT epoch_us(ts) // 1000000 AS es FROM events)
      |SELECT wid, count(*) n_events
      |FROM e JOIN w ON es >= ws AND es < we
      |GROUP BY 1 ORDER BY wid""".stripMargin

  // ---- Z-order clustering profile (layout optimization) ------------------

  /** Z-order (Morton curve) clustering profile — the OPTIMIZE ZORDER BY
    * layout job in miniature: interleave the bits of two independent query
    * dimensions (customer, order day) into one key, cut the keyspace into
    * fixed z-range "files", and emit each file's per-dimension min/max —
    * the file-skipping stats table a lakehouse scan prunes with. Because the
    * curve preserves locality in BOTH dimensions, every file covers a narrow
    * x-range AND a narrow y-range, so predicates on EITHER dimension skip
    * most files (a single-column sort gives the second dimension world-wide
    * ranges). The bit interleave is one per-row integer fold (codegen'd,
    * exact in both engines); file assignment quantizes z directly (`z div
    * 2^16`), so the whole profile is map-side + one ≤256-group partial agg —
    * no global sort, no skew surface. The production rewrite job would
    * `repartitionByRange($"z")` and write; the stats here are what its file
    * footer min/maxes would contain.
    */
  def qZorder(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .withColumn("x", pmod(col("o_custkey"), lit(65536L)))
      .withColumn("y",
        pmod(datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")).cast("long"), lit(65536L)))
      .withColumn("z", expr(
        "aggregate(sequence(0, 15), 0L, (acc, i) -> acc" +
          " + shiftleft((x div shiftleft(1L, i)) % 2, 2*i)" +
          " + shiftleft((y div shiftleft(1L, i)) % 2, 2*i+1))"))
      .withColumn("file_id", expr("z div 65536"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("file_id")

  val qZorderSql: String =
    """WITH b AS (
      |  SELECT o_custkey % 65536 AS x,
      |         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536 AS y
      |  FROM orders),
      |zt AS (
      |  SELECT x, y,
      |         CAST(list_sum([(((x // (1::BIGINT << i)) % 2) << (2*i)) +
      |                        (((y // (1::BIGINT << i)) % 2) << (2*i+1))
      |                        for i in generate_series(0, 15)]) AS BIGINT) AS z
      |  FROM b)
      |SELECT z // 65536 AS file_id, CAST(count(*) AS BIGINT) n,
      |       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
      |FROM zt GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- fixed-width histogram (distribution profiling) --------------------

  /** 16-bucket equi-width histogram of lineitem price cents with per-bucket
    * count/min/max/sum — the distribution-profiling pass that sizes
    * partitions and spots skew before a 100 TB run. Bucket assignment is
    * EXACT integer arithmetic (`(v - lo) * n div (hi - lo)`, clamped), not a
    * double-based width_bucket, so bucket edges cannot drift between
    * engines; the aggregate is a 16-group partial-agg-friendly groupBy
    * (map-side combine reduces each partition to ≤16 rows before the one
    * tiny shuffle).
    */
  def qHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val (lo, hi, n) = (90000L, 11000000L, 16L)
    t(spark, sfDir, "lineitem")
      .withColumn("c", (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .withColumn("bucket",
        expr(s"least(greatest(((c - ${lo}L) * ${n}L) div ${hi - lo}L, -1L), ${n}L)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min(col("c")).as("min_c"),
        max(col("c")).as("max_c"), sum(col("c")).as("sum_c"))
      .orderBy("bucket")
  }

  val qHistogramSql: String =
    """WITH c AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
      |  FROM lineitem)
      |SELECT least(greatest(((c - 90000) * 16) // 10910000, -1), 16) AS bucket,
      |       count(*) n_rows, min(c) min_c, max(c) max_c,
      |       CAST(sum(c) AS BIGINT) sum_c
      |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- approximate aggregates (bound-violation oracle form) --------------

  /** The raw sketch values per group — used by the suite's rank/error pins
    * and as the input to [[qApprox]]'s violation filter. */
  private[graft] def qApproxSketches(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_price")
      )
      .orderBy("l_returnflag")

  /** Approximate aggregates with a REAL cross-engine oracle: sketch values
    * (HLL++, KLL/GK) are engine-specific and can never hash-match DuckDB, so
    * the query returns the groups where the approximation VIOLATES its
    * configured error bound — expected result EMPTY, and empty==empty is an
    * exact hash match. Each engine checks ITS OWN sketch against ITS OWN
    * exact recomputation under the SAME rule:
    *   - `hll`: |approx_count_distinct − exact distinct| must stay within
    *     4σ = 4·rsd·exact (rsd 0.02 Spark-side; DuckDB's default HLL is
    *     tighter, ~0.4%) → violation when 100·|Δ| > 8·exact.
    *   - `p95`: the approx 95th-percentile price (accuracy 10000 → rank
    *     error 1e-4 Spark-side) must lie within the exact [p94, p96] value
    *     envelope (±1% RANK margin, covering ties/plateaus) → violation when
    *     outside [floor(p94), ceil(p96)].
    * Price space is exact integer cents so floor/ceil edges cannot drift
    * between engines. One hash-partial groupBy (3 groups), no extra shuffle
    * for the exact side — it rides the same exchange as the sketches.
    */
  def qApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val g = t(spark, sfDir, "lineitem")
      .withColumn("c", (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("c"), lit(0.95), lit(10000)).as("p95a"),
        expr("percentile(c, 0.94)").as("p94e"),
        expr("percentile(c, 0.96)").as("p96e"))
    val hll = g
      .filter(expr("100 * abs(approx_parts - exact_parts) > 8 * exact_parts"))
      .select(col("l_returnflag"), lit("hll").as("kind"),
        col("approx_parts").cast("long").as("approx_v"),
        expr("CAST(ceil(0.92 * exact_parts) AS BIGINT)").as("lo"),
        expr("CAST(floor(1.08 * exact_parts) AS BIGINT)").as("hi"))
    val p95 = g
      .filter(col("p95a") < expr("floor(p94e)") || col("p95a") > expr("ceil(p96e)"))
      .select(col("l_returnflag"), lit("p95").as("kind"),
        col("p95a").cast("long").as("approx_v"),
        expr("CAST(floor(p94e) AS BIGINT)").as("lo"),
        expr("CAST(ceil(p96e) AS BIGINT)").as("hi"))
    hll.union(p95).orderBy("l_returnflag", "kind")
  }

  val qApproxSql: String =
    """WITH c AS (
      |  SELECT l_returnflag, l_partkey,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
      |  FROM lineitem),
      |g AS (
      |  SELECT l_returnflag,
      |         approx_count_distinct(l_partkey) AS approx_parts,
      |         count(DISTINCT l_partkey) AS exact_parts,
      |         approx_quantile(c, 0.95) AS p95a,
      |         quantile_cont(c, 0.94) AS p94e,
      |         quantile_cont(c, 0.96) AS p96e
      |  FROM c GROUP BY 1)
      |SELECT l_returnflag, 'hll' AS kind, CAST(approx_parts AS BIGINT) AS approx_v,
      |       CAST(ceil(0.92 * exact_parts) AS BIGINT) AS lo,
      |       CAST(floor(1.08 * exact_parts) AS BIGINT) AS hi
      |FROM g WHERE 100 * abs(approx_parts - exact_parts) > 8 * exact_parts
      |UNION ALL
      |SELECT l_returnflag, 'p95', CAST(p95a AS BIGINT),
      |       CAST(floor(p94e) AS BIGINT), CAST(ceil(p96e) AS BIGINT)
      |FROM g WHERE p95a < floor(p94e) OR p95a > ceil(p96e)
      |ORDER BY l_returnflag, kind""".stripMargin

  // ---- contract surface --------------------------------------------------

  // ---- ordered funnel analysis (view → click → purchase) -------------------

  /** Funnel: of the users who ever viewed, how many clicked within 24 h of
    * their FIRST view, then purchased within 24 h of that qualifying click —
    * the order-sensitive conversion query every product-analytics stack
    * ships. Output is one row per stage with users reached and conversion
    * permille vs stage 1.
    *
    * Spark formulation: three chained conditional-min windows over the SAME
    * `user_id` partitioning (each references the previous stage's timestamp),
    * then a per-user collapse and a single global count — events shuffle
    * ONCE on user_id; the window chain and the per-user groupBy all ride
    * that one exchange, and the final aggregate is partial-agg'd to 3 longs
    * per task. The DuckDB oracle is an INDEPENDENT formulation (three
    * self-join hops), so agreement cross-checks the semantics, not the plan.
    */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val perUser = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("vt", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("ct", min(when(col("event_type") === "click" &&
        col("ts") > col("vt") &&
        col("ts") <= col("vt") + expr("INTERVAL 24 HOURS"), col("ts"))).over(w))
      .withColumn("pt", min(when(col("event_type") === "purchase" &&
        col("ts") > col("ct") &&
        col("ts") <= col("ct") + expr("INTERVAL 24 HOURS"), col("ts"))).over(w))
      .groupBy("user_id")
      .agg(max("vt").as("vt"), max("ct").as("ct"), max("pt").as("pt"))
    perUser
      .agg(count(col("vt")).as("nv"), count(col("ct")).as("nc"), count(col("pt")).as("np"))
      .select(explode(array(
        struct(lit(1L).as("stage"), lit("view").as("name"), col("nv").as("n_users")),
        struct(lit(2L).as("stage"), lit("click").as("name"), col("nc").as("n_users")),
        struct(lit(3L).as("stage"), lit("purchase").as("name"), col("np").as("n_users"))
      )).as("s"), col("nv"))
      .select(col("s.stage").as("stage"), col("s.name").as("name"),
        col("s.n_users").as("n_users"),
        expr("(1000 * s.n_users) div greatest(nv, 1)").as("conv_x1000"))
      .orderBy("stage")
  }

  val qFunnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) vt FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) ct FROM events e JOIN v ON e.user_id = v.user_id
      |        AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 24 HOUR
      |      WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) pt FROM events e JOIN c ON e.user_id = c.user_id
      |        AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 24 HOUR
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      |n AS (SELECT CAST((SELECT count(*) FROM v) AS BIGINT) nv,
      |             CAST((SELECT count(*) FROM c) AS BIGINT) nc,
      |             CAST((SELECT count(*) FROM p) AS BIGINT) np)
      |SELECT s.stage, s.name, s.n_users,
      |       (1000 * s.n_users) // greatest((SELECT nv FROM n), 1) AS conv_x1000
      |FROM (SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name, nv AS n_users FROM n
      |      UNION ALL SELECT CAST(2 AS BIGINT), 'click', nc FROM n
      |      UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', np FROM n) s
      |ORDER BY s.stage""".stripMargin

  // ---- sequence-pattern matching (MATCH_RECOGNIZE subset) -------------------

  /** Contiguous event-pattern regex the matcher looks for: view, 1+ clicks,
    * purchase, with NO intervening event of any other type — the strict
    * MATCH_RECOGNIZE contiguity semantic (q_funnel is the time-windowed,
    * gap-tolerant complement).
    */
  val PATTERN = "vc+p"

  /** MATCH_RECOGNIZE-subset sequence matching: each user's events collapse
    * (in exact (ts, id) order) to a type-initial string, and the pattern
    * runs as an ordinary regex — first match, its position, and the
    * non-overlapping match count per user. The reduction-to-string trick is
    * how row-pattern matching is actually deployed on engines without the
    * clause: one user-keyed exchange, then pure codegen'd string
    * expressions; backtracking happens on a per-user byte string, never on
    * rows. Per-user state is bounded by that user's event count (at 100 TB,
    * sessionize first — the string then bounds by session length).
    *
    * Both engines' regex runtimes (Java util.regex, RE2) agree leftmost +
    * non-overlapping for this pattern class (no alternation ambiguity).
    */
  def qPattern(spark: SparkSession, sfDir: String): DataFrame = {
    val fm = coalesce(regexp_extract(col("seq"), PATTERN, 0), lit(""))
    t(spark, sfDir, "events")
      .withColumn("init", substring(col("event_type"), 1, 1))
      .groupBy("user_id")
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("init")))).as("evs"))
      .withColumn("seq", array_join(expr("transform(evs, e -> e.init)"), ""))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("n_events"),
        fm.as("first_match"),
        when(fm === "", 0L)
          .otherwise(instr(col("seq"), fm).cast("long")).as("match_pos"),
        expr(s"regexp_count(seq, '$PATTERN')").cast("long").as("n_matches"))
      .orderBy("user_id")
  }

  val qPatternSql: String =
    s"""WITH s AS (
       |  SELECT user_id,
       |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT user_id, seq,
       |         coalesce(regexp_extract(seq, '$PATTERN', 0), '') AS fm
       |  FROM s)
       |SELECT user_id,
       |       CAST(length(seq) AS BIGINT) AS n_events,
       |       fm AS first_match,
       |       CAST(CASE WHEN fm = '' THEN 0 ELSE strpos(seq, fm) END AS BIGINT) AS match_pos,
       |       CAST(len(regexp_extract_all(seq, '$PATTERN')) AS BIGINT) AS n_matches
       |FROM m ORDER BY user_id""".stripMargin

  // ---- distribution drift (binned two-sample KS gap) -------------------------

  /** Corpus-drift monitor, the gate a continuously-crawling pipeline runs
    * before mixing a new drop into training data: the doc-length
    * distributions of two crawl halves compared as a BINNED two-sample KS
    * statistic — per fixed bin, both sides' counts, cumulative counts, and
    * the ECDF gap in exact parts-per-million integer arithmetic (`div`
    * truncation identical in both engines; `n_chars` is a stored BIGINT so
    * no cross-engine string-length semantics enter). The max `gap_x1e6` row
    * IS the KS distance at bin resolution.
    *
    * Scale shape: the per-bin counts partial-agg map-side (32 groups — the
    * reducer sees 32 pre-combined rows per mapper at most); the cumulative
    * window then touches ≤32 ROWS TOTAL, so the deliberate single-task
    * global window costs nothing — exactly how a drift gate should be
    * shaped at 100 TB (never a global sort of raw values).
    */
  def qDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("side", (col("doc_id") % 2 === 0).cast("long"))
      .withColumn("bin", least(lit(31L), expr("n_chars div 20")))
    val binned = d.groupBy("bin").agg(
      sum(col("side")).as("n_a"),
      sum(lit(1L) - col("side")).as("n_b"))
    val wc = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("cum_a", sum("n_a").over(wc))
      .withColumn("cum_b", sum("n_b").over(wc))
      .withColumn("tot_a", sum("n_a").over(wt))
      .withColumn("tot_b", sum("n_b").over(wt))
      .select(col("bin"), col("n_a"), col("n_b"), col("cum_a"), col("cum_b"),
        abs(expr("(1000000 * cum_a) div tot_a - (1000000 * cum_b) div tot_b"))
          .as("gap_x1e6"))
      .orderBy("bin")
  }

  val qDriftSql: String =
    """WITH d AS (
      |  SELECT CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS side,
      |         least(31, n_chars // 20) AS bin
      |  FROM documents),
      |b AS (
      |  SELECT bin, CAST(sum(side) AS BIGINT) AS n_a,
      |         CAST(sum(1 - side) AS BIGINT) AS n_b
      |  FROM d GROUP BY bin),
      |c AS (
      |  SELECT bin, n_a, n_b,
      |         sum(n_a) OVER (ORDER BY bin) AS cum_a,
      |         sum(n_b) OVER (ORDER BY bin) AS cum_b,
      |         sum(n_a) OVER () AS tot_a,
      |         sum(n_b) OVER () AS tot_b
      |  FROM b)
      |SELECT bin, n_a, n_b,
      |       CAST(cum_a AS BIGINT) AS cum_a, CAST(cum_b AS BIGINT) AS cum_b,
      |       CAST(abs((1000000 * cum_a) // tot_a - (1000000 * cum_b) // tot_b) AS BIGINT) AS gap_x1e6
      |FROM c ORDER BY bin""".stripMargin

  // ---- robust outlier gate (median absolute deviation) -----------------------

  /** MAD-based outlier flagging — the robust complement of q_winsorize's
    * quantile clipping (one wild price corrupts a stddev rule but not the
    * MAD): per group, median and MAD computed in EXACT integers by carrying
    * ×2 and ×4 scalings through the even-count midpoint averages (cents are
    * integers, `percentile(2c, .5)` averages two even ints → integer; the
    * deviations double again before their median), then the classic
    * |x − med| > 3·1.4826·mad rule becomes the exact integer comparison
    * 20·dev₂ > 89·mad₄.
    *
    * Scale shape: robust stats are inherently TWO dependent aggregations
    * (med before dev, mad before flag) — three passes over the group-keyed
    * exchange; the med/mad sides are #groups rows and broadcast back. An
    * approximate production variant would swap `percentile` for the
    * mergeable sketch (A13) at the same plan shape.
    */
  def qOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    // line VALUE (unit-price proxy × quantity): the product of two spreads
    // is genuinely long-tailed, so the 4.45·MAD rule flags a real ~2 % tail
    // (the raw uniform price flags nothing — vacuous rule, wrong witness)
    val c = ((col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
      * col("l_quantity").cast("long"))
    val li = t(spark, sfDir, "lineitem").select(col("l_returnflag"), c.as("c"))
    val med = li.groupBy("l_returnflag")
      .agg(expr("CAST(percentile(2*c, 0.5) AS BIGINT)").as("med2"))
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("dev2", abs(lit(2L) * col("c") - col("med2")) * 2L)
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("CAST(percentile(dev2, 0.5) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        max(col("med2")).as("med2"), max(col("mad4")).as("mad4"),
        sum(when(lit(20L) * col("dev2") > lit(89L) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("l_returnflag")
  }

  val qOutliersSql: String =
    """WITH li AS (
      |  SELECT l_returnflag,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           * CAST(l_quantity AS BIGINT) AS c
      |  FROM lineitem),
      |m AS (SELECT l_returnflag, CAST(quantile_cont(2*c, 0.5) AS BIGINT) med2
      |      FROM li GROUP BY 1),
      |d AS (SELECT li.l_returnflag, c, med2, 2 * abs(2*c - med2) AS dev2
      |      FROM li JOIN m USING (l_returnflag)),
      |md AS (SELECT l_returnflag, CAST(quantile_cont(dev2, 0.5) AS BIGINT) mad4
      |       FROM d GROUP BY 1)
      |SELECT d.l_returnflag, CAST(count(*) AS BIGINT) n,
      |       max(med2) AS med2, max(mad4) AS mad4,
      |       CAST(sum(CASE WHEN 20*dev2 > 89*mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN md USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- running count-distinct window (unsupported-native emulation) ----------

  /** Running COUNT(DISTINCT) over an ordered window — a construct Spark
    * (and most engines) REFUSES natively (`DISTINCT is not supported in
    * window functions`): emulated exactly by flagging each key's FIRST
    * occurrence (row_number over (user, event_type) == 1) and running-
    * summing the flags over the event-time window. Per user and event, the
    * distinct event types seen SO FAR — the per-entity vocabulary-growth
    * curve (ta_heaps is the corpus-level form).
    *
    * Scale shape: both windows cluster on user_id — hashpartitioning(user)
    * satisfies the (user, type) first-occurrence window AND the running
    * sum, so the whole construct is ONE data shuffle (same device as
    * q_sessionize's stacked windows).
    */
  def qRunDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wFirst = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum("first_seen").over(wRun))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("n_types_seen"))
      .orderBy("user_id", "event_id")
  }

  val qRunDistinctSql: String =
    """WITH f AS (
      |  SELECT user_id, event_id, event_type, ts,
      |         CASE WHEN row_number() OVER (
      |                PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      |              THEN 1 ELSE 0 END AS first_seen
      |  FROM events)
      |SELECT user_id, event_id, event_type,
      |       CAST(sum(first_seen) OVER (
      |              PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
      |FROM f ORDER BY user_id, event_id""".stripMargin

  // ---- time-decayed activity score (integer half-life) -----------------------

  /** Recency-weighted activity — the freshness-aware popularity metric a
    * recrawl/frontier budgeter prefers over raw counts: per user, daily
    * event counts decay by a one-WEEK half-life applied as an exact integer
    * shift (`n_d div (1 << age_d div 7)` — truncation identical in both
    * engines; no transcendental exp enters). A burst four weeks ago scores
    * 1/16 of the same burst today.
    *
    * Scale shape: the (user, day) pre-aggregation partial-aggs map-side and
    * caps rows at users × days; the weighted rollup rides the same user
    * exchange. The decay anchor is a fixed date, not now() — runs are
    * reproducible by construction.
    */
  def qDecay(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .withColumn("age",
        datediff(lit("2024-01-31").cast("date"), to_date(col("ts"))).cast("long"))
    ev.groupBy("user_id", "age").agg(count(lit(1)).as("n"))
      .withColumn("w",
        expr("n div shiftleft(CAST(1 AS BIGINT), CAST(least(age div 7, 40L) AS INT))"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"), sum("w").as("decayed"))
      .orderBy("user_id")
  }

  val qDecaySql: String =
    """WITH d AS (
      |  SELECT user_id,
      |         date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') AS age,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      |       CAST(sum(n // (CAST(1 AS BIGINT) << CAST(least(age // 7, 40) AS INT)))
      |            AS BIGINT) AS decayed
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- cohort retention matrix ---------------------------------------------

  /** Retention: users cohorted by their first-purchase day; for each cohort ×
    * day-offset (0..7), how many distinct cohort members were active that
    * day. The classic triangle matrix behind every retention dashboard.
    *
    * Scale shape: the cohort table is a per-user aggregate (one user_id
    * shuffle, partial-agg'd); the activity join is user_id-equi on two sides
    * already partitioned by user_id, then the countDistinct re-aggregates on
    * the (cohort, offset) key — cardinality ≤ cohorts × 8, so the second
    * shuffle is tiny. No window over the full event stream is needed.
    */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val firstDay = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
    ev.join(firstDay, "user_id")
      .withColumn("day_offset", datediff(to_date(col("ts")), col("d0")).cast("long"))
      .filter(col("day_offset").between(0, 7))
      .groupBy(col("d0").as("cohort_day"), col("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val qRetentionSql: String =
    """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) d0 FROM events
      |           WHERE event_type = 'purchase' GROUP BY user_id),
      |a AS (SELECT e.user_id, f.d0, date_diff('day', f.d0, CAST(e.ts AS DATE)) day_off
      |      FROM events e JOIN f ON e.user_id = f.user_id)
      |SELECT d0 AS cohort_day, CAST(day_off AS BIGINT) AS day_offset,
      |       CAST(count(DISTINCT user_id) AS BIGINT) n_users
      |FROM a WHERE day_off BETWEEN 0 AND 7 GROUP BY d0, day_off
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---- SCD type-2 dimension build ------------------------------------------

  /** Slowly-changing-dimension type 2: each user's 'signup' events become
    * versioned dimension rows — valid_from = event ts, valid_to = next
    * version's ts (NULL ⇒ current), attribute from the event's JSON props.
    * The warehouse-dimension complement to q_cdc's snapshot diff.
    *
    * Scale shape: one user_id exchange serves both the version numbering
    * and the valid_to lead — a single window sort per user; no join at all.
    */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .withColumn("attr", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("version"), col("attr"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  val qScd2Sql: String =
    """WITH s AS (
      |  SELECT user_id, ts, CAST(json_extract(props, '$.k') AS BIGINT) attr,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) valid_to
      |  FROM events WHERE event_type = 'signup')
      |SELECT user_id, CAST(rn AS BIGINT) AS "version", attr, ts AS valid_from, valid_to,
      |       (valid_to IS NULL) AS is_current
      |FROM s ORDER BY user_id, rn""".stripMargin

  // ---- triangle counting (degree-ordered orientation) ----------------------

  /** Triangle enumeration over a deterministic undirected graph on part
    * keys (3 arithmetic edge rules, canonicalized + dedup'd). The Spark
    * side uses DEGREE-ORDERED ORIENTATION: every edge points from its
    * lower-(degree,id) endpoint to the higher one, so out-degree is bounded
    * by O(√m) and the wedge self-join — the quadratic step in naive
    * triangle counting — touches Σ outdeg² ≈ m^1.5 pairs instead of
    * Σ deg² (which a hub node makes quadratic). Each triangle is found
    * exactly once (its lowest-ordered vertex pivots), then re-sorted to
    * canonical (u<v<w) rows.
    *
    * The DuckDB oracle is the INDEPENDENT naive formulation (canonical
    * 3-way self-join) — same set, different algorithm, so agreement checks
    * the orientation logic end to end.
    */
  def qTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = t(spark, sfDir, "part").select(col("p_partkey").as("k")).localCheckpoint()
    val n = parts.count() // scalar modulus for the edge rules
    val raw = parts.select(col("k"), ((col("k") * col("k") + 1) % n).as("t"))
      .unionByName(parts.select(col("k"), ((col("k") + 1) % n).as("t")))
      .unionByName(parts.select(col("k"), ((col("k") * 2 + 3) % n).as("t")))
      .filter(col("k") =!= col("t"))
    val e = raw.select(least(col("k"), col("t")).as("u"),
      greatest(col("k"), col("t")).as("v")).distinct()
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("a"),
      when(fwd, col("v")).otherwise(col("u")).as("b"),
      when(fwd, col("dv")).otherwise(col("du")).as("db")).localCheckpoint()
    val o1 = oriented.select(col("a"), col("b").as("b1"), col("db").as("d1"))
    val o2 = oriented.select(col("a"), col("b").as("b2"), col("db").as("d2"))
    val wedges = o1.join(o2, "a")
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("b1") < col("b2")))
    wedges
      .join(oriented.select(col("a").as("ca"), col("b").as("cb")),
        col("b1") === col("ca") && col("b2") === col("cb"))
      .select(array_sort(array(col("a"), col("b1"), col("b2"))).as("tn"))
      .select(element_at(col("tn"), 1).as("u"),
        element_at(col("tn"), 2).as("v"),
        element_at(col("tn"), 3).as("w"))
      .orderBy("u", "v", "w")
  }

  val qTrianglesSql: String =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) c FROM part),
      |raw AS (
      |  SELECT p_partkey k, (p_partkey * p_partkey + 1) % (SELECT c FROM n) t FROM part
      |  UNION ALL SELECT p_partkey, (p_partkey + 1) % (SELECT c FROM n) FROM part
      |  UNION ALL SELECT p_partkey, (2 * p_partkey + 3) % (SELECT c FROM n) FROM part),
      |e AS (SELECT DISTINCT least(k, t) u, greatest(k, t) v FROM raw WHERE k <> t)
      |SELECT e1.u u, e1.v v, e2.v w
      |FROM e e1 JOIN e e2 ON e2.u = e1.v
      |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      |ORDER BY u, v, w""".stripMargin

  // ---- Pareto skyline (two-level prefix max) -------------------------------

  /** Per-group Pareto frontier over distinct (price, quantity) points —
    * cheapest-for-their-quantity lineitems (minimize price, maximize
    * quantity). A point survives iff its quantity strictly beats every
    * lower-priced point's and ties at its own price resolve to the max.
    *
    * Scale shape — the naive skyline is a quadratic NOT EXISTS self-join;
    * this plans as a TWO-LEVEL PREFIX MAX instead: prices are cut into
    * fixed integer buckets, the within-bucket prefix max and same-price max
    * ride ONE (g, bucket) exchange (both windows range-frame the same
    * sort), and the cross-bucket prefix comes from a per-bucket max table
    * (cardinality = groups × buckets) that broadcasts back. No global sort,
    * no quadratic join, hub-proof at any row count. The DuckDB oracle is
    * the single-sort window formulation (cross-validated once against the
    * quadratic NOT EXISTS form at sf0.01 — identical 17 rows).
    */
  def qSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = 1000000L
    val d = t(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("price_c"),
        (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("qty_c"))
      .distinct()
      .withColumn("bk", expr(s"price_c div $bucket"))
    val wLt = Window.partitionBy("g", "bk").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy("g", "bk").orderBy("price_c").rangeBetween(0, 0)
    val wPrev = Window.partitionBy("g").orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = d.groupBy("g", "bk").agg(max("qty_c").as("bmax"))
      .withColumn("pmax", max("bmax").over(wPrev))
      .select(col("g"), col("bk"), col("pmax"))
    d.join(broadcast(prev), Seq("g", "bk"))
      .withColumn("mlt",
        greatest(coalesce(max("qty_c").over(wLt), lit(-1L)),
          coalesce(col("pmax"), lit(-1L))))
      .withColumn("meq", max("qty_c").over(wEq))
      .filter(col("qty_c") > col("mlt") && col("qty_c") === col("meq"))
      .select(col("g"), col("price_c"), col("qty_c"))
      .orderBy("g", "price_c", "qty_c")
  }

  val qSkylineSql: String =
    """WITH p AS (
      |  SELECT l_returnflag g,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c,
      |         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) qty_c
      |  FROM lineitem),
      |d AS (SELECT DISTINCT g, price_c, qty_c FROM p),
      |w AS (SELECT g, price_c, qty_c,
      |        max(qty_c) OVER (PARTITION BY g ORDER BY price_c
      |                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) mlt,
      |        max(qty_c) OVER (PARTITION BY g, price_c) meq
      |      FROM d)
      |SELECT g, price_c, qty_c FROM w
      |WHERE qty_c > coalesce(mlt, CAST(-1 AS BIGINT)) AND qty_c = meq
      |ORDER BY g, price_c, qty_c""".stripMargin

  // ---- typed cogroup (two-stream per-key merge) -----------------------------

  /** Typed `cogroup` coverage: per user, the view stream and the purchase
    * stream meet in one function call — purchases strictly after the user's
    * FIRST view are counted by a sequential scan over the two group
    * iterators (the API for per-key merge logic SQL can't express row-by-
    * row). The DuckDB oracle is the relational formulation (first-view agg
    * + conditional join), so agreement proves the typed path computes the
    * same answer as the declarative one.
    *
    * Scale shape: cogroup shuffles each side ONCE on the key and streams
    * both iterators per group — no materialized join product; memory is
    * bounded by the larger single group, not the corpus.
    */
  def qCogroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, sfDir, "events")
    def side(kind: String) = ev.filter(col("event_type") === kind)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    side("view").groupByKey(_._1)
      .cogroup(side("purchase").groupByKey(_._1)) { (uid, vs, ps) =>
        // streaming min: constant memory per group regardless of view count
        var vt: java.sql.Timestamp = null
        vs.foreach { v => if (vt == null || v._2.before(vt)) vt = v._2 }
        if (vt == null) Iterator.empty
        else Iterator((uid, ps.count(_._2.after(vt)).toLong))
      }
      .toDF("user_id", "n_after")
      .orderBy("user_id")
  }

  val qCogroupSql: String =
    """WITH v AS (SELECT user_id, min(ts) vt FROM events WHERE event_type='view' GROUP BY user_id),
      |p AS (SELECT e.user_id, CAST(count(*) AS BIGINT) np
      |      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT v.user_id, CAST(coalesce(p.np, 0) AS BIGINT) n_after
      |FROM v LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  // ---- CDC changelog apply (the upsert half of q_cdc) -----------------------

  /** MERGE-shaped changelog apply: a deterministic changelog (updates on
    * k%7=0, deletes on k%11=3, 50 fresh inserts) is applied to the part
    * snapshot in ONE full-outer join — coalesce picks the surviving value,
    * delete rows drop. This is the recompute-avoidance APPLY complementing
    * q_cdc's DIFF: together they form the daily incremental-maintenance
    * loop (diff yesterday→today, apply to the serving copy). One key
    * shuffle; zero with bucketed tables (O5).
    */
  def qApplyCdc(spark: SparkSession, sfDir: String): DataFrame = {
    val snap = t(spark, sfDir, "part")
      .select(col("p_partkey").as("k"),
        (col("p_retailprice").cast("decimal(12,2)") * 100).cast("long").as("price_c"))
    val m = snap.agg(max("k")).head.getLong(0) // scalar key horizon for inserts
    val chg = snap.filter(col("k") % 7 === 0)
      .select(col("k"), lit("U").as("op"), (col("price_c") + 500).as("new_price"))
      .unionByName(snap.filter(col("k") % 7 =!= 0 && col("k") % 11 === 3)
        .select(col("k"), lit("D").as("op"), lit(null).cast("long").as("new_price")))
      .unionByName(spark.range(1, 51)
        .select((lit(m) + col("id")).as("k"), lit("I").as("op"),
          (lit(100000L) + col("id") * 7).as("new_price")))
    snap.join(chg, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("op") === "D", lit(null).cast("long"))
          .when(col("op").isNull, col("price_c"))
          .otherwise(col("new_price")).as("price_c"),
        coalesce(col("op"), lit("kept")).as("src"))
      .filter(col("price_c").isNotNull)
      .orderBy("k")
  }

  val qApplyCdcSql: String =
    """WITH snap AS (
      |  SELECT p_partkey k, CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c
      |  FROM part),
      |mx AS (SELECT max(k) m FROM snap),
      |chg AS (
      |  SELECT k, 'U' op, price_c + 500 new_price FROM snap WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, 'D', NULL FROM snap WHERE k % 7 <> 0 AND k % 11 = 3
      |  UNION ALL
      |  SELECT (SELECT m FROM mx) + i, 'I', 100000 + 7 * i
      |  FROM (SELECT unnest(generate_series(1, 50)) i)),
      |app AS (
      |  SELECT coalesce(s.k, c.k) k,
      |         CASE WHEN c.op = 'D' THEN NULL
      |              WHEN c.op IS NULL THEN s.price_c
      |              ELSE c.new_price END price_c,
      |         CASE WHEN c.op IS NULL THEN 'kept' ELSE c.op END src
      |  FROM snap s FULL OUTER JOIN chg c ON s.k = c.k)
      |SELECT k, price_c, src FROM app WHERE price_c IS NOT NULL ORDER BY k""".stripMargin

  // ---- equi-depth histogram (rank-based bucketing) --------------------------

  /** Equi-depth complement to q_histogram's fixed-width buckets: ntile(8)
    * over a TOTAL order (price, orderkey, linenumber — ties broken so both
    * engines assign identical tiles) gives per-group buckets of equal row
    * count with their exact value ranges — the distribution profile that
    * sizes range partitions before a big sort/join.
    */
  def qEqdepth(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("g").orderBy("price_c", "ok", "ln")
    t(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("price_c"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .withColumn("tile", ntile(8).over(w).cast("long"))
      .groupBy("g", "tile")
      .agg(count(lit(1)).as("n"), min("price_c").as("lo"), max("price_c").as("hi"))
      .orderBy("g", "tile")
  }

  val qEqdepthSql: String =
    """WITH p AS (
      |  SELECT l_returnflag g,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) price_c,
      |         l_orderkey ok, l_linenumber ln
      |  FROM lineitem),
      |t AS (SELECT g, price_c,
      |        CAST(ntile(8) OVER (PARTITION BY g ORDER BY price_c, ok, ln) AS BIGINT) tile
      |      FROM p)
      |SELECT g, tile, CAST(count(*) AS BIGINT) n, min(price_c) lo, max(price_c) hi
      |FROM t GROUP BY g, tile ORDER BY g, tile""".stripMargin

  // ---- try_* fault-tolerance semantics ---------------------------------------

  /** ANSI-mode fault tolerance: Spark 4 runs ANSI SQL by default, where a
    * single bad cast / overflow / div-by-zero KILLS the job — at 100 TB a
    * one-in-a-billion malformed row must null out instead, which is exactly
    * the `try_*` family. Four legs over deterministically-planted bad rows:
    * try_cast (non-numeric string), try_add (LONG overflow), try_divide
    * (zero divisor), try_to_timestamp (malformed date). The DuckDB oracle
    * reproduces each null via its own guards (CASE / try_cast /
    * try_strptime) — so the hash pins WHICH rows null out, not just counts.
    */
  def qTry(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .filter(col("event_id") < 2000)
      .select(col("event_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"),
        when(col("event_id") % 5 === 0, concat(lit("x"), col("event_id").cast("string")))
          .otherwise(col("event_id").cast("string")).as("s"),
        when(col("event_id") % 7 === 0, lit(9223372036854775800L))
          .otherwise(col("event_id")).as("x"),
        (col("event_id") % 4).as("nz"),
        when(col("event_id") % 3 === 0, lit("not-a-date"))
          .otherwise(concat(lit("2024-01-0"), (col("event_id") % 9 + 1).cast("string"))).as("ds"))
      .select(col("event_id"),
        expr("try_cast(s AS BIGINT)").as("c_bad"),
        expr("try_add(x, CAST(100 AS BIGINT))").as("a_ovf"),
        expr("CAST(try_divide(cents, nz) AS BIGINT)").as("d_div"),
        // NTZ cast: the UTC session makes this an identity on wall time,
        // aligning with the parquet-sourced NTZ columns the oracle compares
        expr("CAST(try_to_timestamp(ds, 'yyyy-MM-dd') AS TIMESTAMP_NTZ)").as("t_ts"))
      .orderBy("event_id")

  val qTrySql: String =
    """WITH b AS (
      |  SELECT event_id,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents,
      |         CASE WHEN event_id % 5 = 0 THEN 'x' || event_id ELSE CAST(event_id AS VARCHAR) END s,
      |         CASE WHEN event_id % 7 = 0 THEN CAST(9223372036854775800 AS BIGINT) ELSE event_id END x,
      |         event_id % 4 nz,
      |         CASE WHEN event_id % 3 = 0 THEN 'not-a-date'
      |              ELSE '2024-01-0' || (1 + event_id % 9) END ds
      |  FROM events WHERE event_id < 2000)
      |SELECT event_id,
      |       try_cast(s AS BIGINT) c_bad,
      |       CASE WHEN event_id % 7 = 0 THEN NULL ELSE x + 100 END a_ovf,
      |       CASE WHEN nz = 0 THEN NULL ELSE CAST(trunc(cents / nz) AS BIGINT) END d_div,
      |       try_strptime(ds, '%Y-%m-%d') t_ts
      |FROM b ORDER BY event_id""".stripMargin

  // ---- XML round trip (Spark 4 to_xml / from_xml) ---------------------------

  /** XML expression coverage: each event is serialized to a REAL XML
    * fragment with `to_xml` and parsed back with `from_xml` (typed schema),
    * proving the encode→parse loop is lossless for strings and longs. The
    * DuckDB oracle NEVER touches XML — it recomputes the expected fields
    * straight from the base columns, so any escaping/typing defect in the
    * XML round trip breaks the hash. Entirely per-row expressions; the only
    * exchange is the presentation sort.
    */
  def qXml(spark: SparkSession, sfDir: String): DataFrame = {
    val parsedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
    t(spark, sfDir, "events")
      .filter(col("event_id") < 2000)
      .select(col("event_id"),
        to_xml(struct(col("event_type").as("t"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))).as("x"))
      .select(col("event_id"), from_xml(col("x"), parsedSchema).as("p"))
      .select(col("event_id"), col("p.t").as("t"), col("p.cents").as("cents"))
      .orderBy("event_id")
  }

  val qXmlSql: String =
    """SELECT event_id, event_type AS t,
      |       CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  // ---- map higher-order functions ------------------------------------------

  /** Map-column pipeline: per-user event-type counts built into a MapType
    * column, then transform_keys (upper-case), transform_values (×2) and
    * map_filter (≥6) applied before exploding back to rows — the §2.8 map
    * family's higher-order half. The DuckDB oracle never builds a map: it
    * is the flat GROUP BY / HAVING equivalent, so agreement proves the map
    * HOF chain preserves exactly the relational semantics.
    *
    * Scale shape: one user_id×type partial-agg'd shuffle + a per-user
    * collect of ≤5 entries (bounded by the event-type vocabulary, not the
    * stream length) — map columns stay small regardless of corpus size.
    */
  def qMapHof(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("c"))))).as("m"))
      .select(col("user_id"),
        map_filter(
          transform_values(
            transform_keys(col("m"), (k, _) => upper(k)),
            (_, v) => v * 2),
          (_, v) => v >= 6).as("m2"))
      .select(col("user_id"), explode(col("m2")).as(Seq("event_type", "n2")))
      .orderBy("user_id", "event_type")

  val qMapHofSql: String =
    """SELECT user_id, upper(event_type) AS event_type,
      |       2 * CAST(count(*) AS BIGINT) AS n2
      |FROM events GROUP BY user_id, event_type
      |HAVING 2 * count(*) >= 6
      |ORDER BY user_id, upper(event_type)""".stripMargin

  // ---- NOT IN vs NOT EXISTS null semantics ----------------------------------

  /** ANSI three-valued-logic pin: `NOT IN (subquery)` with a NULL in the
    * subquery never returns TRUE (every non-matching row compares UNKNOWN),
    * while NOT EXISTS is null-proof. Four legs over the same
    * deterministically NULL-poisoned order list — poisoned by CUSTOMER key
    * (`o_custkey % 97 = 0`), so whole customers lose every order reference
    * and not_in_clean / not_exists are provably > 0 at every SF (key 97
    * exists from sf0.001 up); not_in_nulls stays 0 (UNKNOWN never passes),
    * in_nulls is unaffected (NULL can't block a TRUE match). Poisoning by
    * order key would be degenerate at small SFs: every customer keeps some
    * unpoisoned order and all three anti legs collapse to 0, and a NOT IN
    * implementation that wrongly stripped subquery NULLs would still pass.
    * Both engines implement the standard, so the hash agreement pins the
    * semantics end to end.
    *
    * Scale note: Spark plans a nullable NOT IN as a NULL-aware anti join
    * (BroadcastNestedLoopJoin — the subquery side must broadcast whole);
    * NOT EXISTS plans as a hash/merge left_anti that shuffles normally.
    * At 100 TB the two are NOT interchangeable: write NOT EXISTS (or strip
    * NULLs explicitly) — this query documents the trap and pins that the
    * rewrite preserves results.
    */
  def qNotin(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("v_ni_customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("v_ni_orders")
    spark.sql(
      """WITH poisoned AS (
        |  SELECT CASE WHEN o_custkey % 97 = 0 THEN CAST(NULL AS BIGINT)
        |              ELSE o_custkey END AS k
        |  FROM v_ni_orders)
        |SELECT 'in_nulls' AS variant, CAST(count(*) AS BIGINT) AS n
        |FROM v_ni_customer WHERE c_custkey IN (SELECT k FROM poisoned)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM v_ni_customer c
        |WHERE NOT EXISTS (SELECT 1 FROM poisoned p WHERE p.k = c.c_custkey)
        |UNION ALL
        |SELECT 'not_in_clean', CAST(count(*) AS BIGINT)
        |FROM v_ni_customer
        |WHERE c_custkey NOT IN (SELECT k FROM poisoned WHERE k IS NOT NULL)
        |UNION ALL
        |SELECT 'not_in_nulls', CAST(count(*) AS BIGINT)
        |FROM v_ni_customer WHERE c_custkey NOT IN (SELECT k FROM poisoned)
        |ORDER BY variant""".stripMargin)
  }

  val qNotinSql: String =
    """WITH poisoned AS (
      |  SELECT CASE WHEN o_custkey % 97 = 0 THEN CAST(NULL AS BIGINT)
      |              ELSE o_custkey END AS k
      |  FROM orders)
      |SELECT 'in_nulls' AS variant, CAST(count(*) AS BIGINT) AS n
      |FROM customer WHERE c_custkey IN (SELECT k FROM poisoned)
      |UNION ALL
      |SELECT 'not_exists', CAST(count(*) AS BIGINT)
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM poisoned p WHERE p.k = c.c_custkey)
      |UNION ALL
      |SELECT 'not_in_clean', CAST(count(*) AS BIGINT)
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT k FROM poisoned WHERE k IS NOT NULL)
      |UNION ALL
      |SELECT 'not_in_nulls', CAST(count(*) AS BIGINT)
      |FROM customer WHERE c_custkey NOT IN (SELECT k FROM poisoned)
      |ORDER BY variant""".stripMargin

  // ---- linear interpolation gap repair ---------------------------------------

  /** Exact integer LINEAR interpolation of a punched sensor series — the
    * between-points complement to q_locf's carry-forward: each NULL is
    * repaired to the time-weighted average of its nearest non-null
    * neighbors, `(pv*(nes-es) + nv*(es-pes)) div (nes-pes)`. The weighted
    * form keeps every term non-negative, so truncating `div` (Spark) and
    * `//` (DuckDB) agree without a floor-vs-truncate hazard. Leading gaps
    * fall back to the next value, trailing gaps to the previous, equal
    * timestamps to the previous (guards the zero division ANSI mode would
    * throw on). Neighbor value/time pairs ride two frames of the SAME
    * (user_id, es, event_id) window order — one exchange total.
    */
  def qInterp(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("es", "event_id")
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t(spark, sfDir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("v",
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("event_id") % 100))
      .withColumn("pv", last(when(col("v").isNotNull, col("v")), ignoreNulls = true).over(back))
      .withColumn("pes", last(when(col("v").isNotNull, col("es")), ignoreNulls = true).over(back))
      .withColumn("nv", first(when(col("v").isNotNull, col("v")), ignoreNulls = true).over(fwd))
      .withColumn("nes", first(when(col("v").isNotNull, col("es")), ignoreNulls = true).over(fwd))
      .withColumn("filled",
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .when(col("nes") === col("pes"), col("pv"))
          .otherwise(expr(
            "CAST((pv * (nes - es) + nv * (es - pes)) div (nes - pes) AS BIGINT)")))
      .select(col("user_id"), col("event_id"), col("es"), col("v"), col("filled"))
      .orderBy("user_id", "es", "event_id")
  }

  val qInterpSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
      |         CASE WHEN event_id % 3 = 0 THEN NULL
      |              ELSE event_id % 100 END AS v
      |  FROM events),
      |w AS (
      |  SELECT user_id, event_id, es, v,
      |         last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY es, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |         last_value(CASE WHEN v IS NOT NULL THEN es END IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY es, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pes,
      |         first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY es, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |         first_value(CASE WHEN v IS NOT NULL THEN es END IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY es, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nes
      |  FROM o)
      |SELECT user_id, event_id, es, v,
      |       CASE WHEN v IS NOT NULL THEN v
      |            WHEN pv IS NULL THEN nv
      |            WHEN nv IS NULL THEN pv
      |            WHEN nes = pes THEN pv
      |            ELSE (pv * (nes - es) + nv * (es - pes)) // (nes - pes)
      |       END AS filled
      |FROM w ORDER BY user_id, es, event_id""".stripMargin

  // ---- incremental view maintenance (delta-refresh an aggregate) -------------

  /** Incremental maintenance of a materialized per-customer order aggregate:
    * the stored view (count + BIGINT-cents sum per customer) absorbs a
    * changelog of weighted rows (+1 inserts, -1 deletes) by aggregating the
    * DELTA alone and full-outer-merging it onto the view — groups whose
    * count reaches zero drop out. The DuckDB oracle recomputes the post-
    * change state FROM SCRATCH over the effective row set, so hash
    * agreement proves delta-refresh == full recompute (count and sum are
    * self-maintainable; no rescan needed).
    *
    * Scale shape: refresh cost is O(|changelog| + |affected groups|) — the
    * base FACTS are never rescanned (the 100 TB daily-metrics loop: q_cdc
    * diffs, q_apply_cdc upserts, q_ivm refreshes the aggregates). One
    * changelog-sized shuffle + one group-keyed merge join; with the view
    * and delta bucketed on the key (O5) the merge is exchange-free.
    */
  def qIvm(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    val orders = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), cents.as("cents"))
    // stored view state: everything except the %7 rows (those arrive as inserts)
    val mv = orders.filter(col("o_orderkey") % 7 =!= 0)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_c"))
    // changelog: %7 rows insert (+1), %5 rows already in the view delete (-1)
    val changelog = orders.filter(col("o_orderkey") % 7 === 0).withColumn("w", lit(1L))
      .unionByName(
        orders.filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 5 === 0)
          .withColumn("w", lit(-1L)))
    val delta = changelog.groupBy("o_custkey")
      .agg(sum(col("w")).as("dn"), sum(col("w") * col("cents")).as("dc"))
    mv.as("m").join(delta.as("d"), Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        (coalesce(col("n_orders"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("total_c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_c"))
      .filter(col("n_orders") > 0)
      .orderBy("o_custkey")
  }

  val qIvmSql: String =
    """SELECT o_custkey,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders
      |WHERE o_orderkey % 7 = 0
      |   OR (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---- bucketed co-located join (zero-exchange repeat joins) --------------

  private val BUCKETS = 8
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Bucketed twins of orders+customer, both CLUSTERED BY custkey INTO the
    * same bucket count — the lakehouse device that makes every future join
    * on that key exchange-FREE at read time: bucket i of orders only ever
    * meets bucket i of customer, so the sort-merge join plans with no
    * ShuffleExchange on either side (pinned in CatalystSurfaceSpec with
    * broadcast disabled). At 100 TB this is THE repeat-join amortizer: the
    * fact table pays its shuffle once at write time, then every downstream
    * join/aggregation on the bucket key is map-side. Staging is
    * session-catalog-keyed (in-memory catalog): first call per JVM writes
    * the bucketed layout under /tmp, later calls reuse it.
    */
  private[graft] def bucketedPair(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    synchronized {
      // tag = the FULL sanitized path, not a hash: two sfDirs can never
      // collide onto one staged layout (a hashCode collision would silently
      // serve the first directory's data for the second)
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      // per-process path: a concurrent JVM (suite + Verify run side by side)
      // must never overwrite a layout this session's catalog already points
      // at — staging is cheap, a torn read is not. Cleaned on JVM exit so
      // repeated runs don't accumulate per-pid copies in /tmp.
      val base = s"/tmp/graft-bucketed-$tag-${ProcessHandle.current().pid()}"
      if (!cleanupRegistered.getAndSet(true))
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          new java.io.File("/tmp").listFiles((_, n) =>
            n.startsWith("graft-bucketed-") &&
              n.endsWith(s"-${ProcessHandle.current().pid()}")) match {
            case null => ()
            case ds => ds.foreach(graft.sources.Snapshots.deleteRecursively)
          }))
      def stage(name: String, keyCol: String): String = {
        val tbl = s"graft_bkt_${name}_$tag"
        val path = s"$base/$name"
        if (!spark.catalog.tableExists(tbl)) {
          if (new java.io.File(path, "_SUCCESS").isFile) {
            // another SparkSession in this JVM already staged the layout
            // (tableExists is session-scoped): register the existing files
            // WITHOUT rewriting — a mode=overwrite here would tear the
            // first session's reads out from under its catalog entry
            val ddl = t(spark, sfDir, name).schema.toDDL
            spark.sql(s"CREATE TABLE $tbl ($ddl) USING parquet " +
              s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $BUCKETS BUCKETS " +
              s"LOCATION '$path'")
          } else {
            t(spark, sfDir, name)
              .repartition(BUCKETS, col(keyCol))
              .write.mode("overwrite")
              .bucketBy(BUCKETS, keyCol).sortBy(keyCol)
              .option("path", path)
              .format("parquet")
              .saveAsTable(tbl)
          }
        }
        tbl
      }
      (spark.table(stage("orders", "o_custkey")),
        spark.table(stage("customer", "c_custkey")))
    }

  /** Per-mktsegment order rollup over the bucketed join. The RESULT is
    * plan-independent (broadcast or SMJ give the same rows — that is what
    * the oracle checks); the zero-exchange property is the plan test's job.
    */
  def qBucketJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (ord, cust) = bucketedPair(spark, sfDir)
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")).as("sum_price_c"))
      .orderBy("c_mktsegment")
  }

  val qBucketJoinSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) n_orders,
      |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) sum_price_c
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- ordered string aggregation + bitwise aggregates ---------------------

  /** ANSI `LISTAGG ... WITHIN GROUP (ORDER BY ...)` (new in Spark 4) — the
    * ordered string aggregation every report/export pipeline reaches for;
    * the WITHIN GROUP order is what makes the result deterministic and
    * hash-oracle-able (bare listagg is explicitly order-undefined).
    */
  def qListagg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        expr("listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)").as("names"),
        count(lit(1)).as("n_supp"))
      .orderBy("s_nationkey")

  val qListaggSql: String =
    """SELECT s_nationkey,
      |       string_agg(s_name, ',' ORDER BY s_name) AS names,
      |       CAST(count(*) AS BIGINT) AS n_supp
      |FROM supplier GROUP BY 1 ORDER BY s_nationkey""".stripMargin

  /** Bitwise aggregate family (`bit_and`/`bit_or`/`bit_xor` + `bit_count`)
    * — flag-mask rollups and parity checksums; all order-insensitive, so
    * exact at any parallelism with no sort.
    */
  def qBits(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bit_and(o_orderkey)").as("b_and"),
        expr("bit_or(o_orderkey)").as("b_or"),
        expr("bit_xor(o_orderkey)").as("b_xor"),
        sum(expr("bit_count(o_orderkey)").cast("long")).as("pop_sum"))
      .orderBy("o_orderstatus")

  val qBitsSql: String =
    """SELECT o_orderstatus,
      |       bit_and(o_orderkey) AS b_and, bit_or(o_orderkey) AS b_or,
      |       bit_xor(o_orderkey) AS b_xor,
      |       CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS pop_sum
      |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  // ---- SQL MERGE INTO on the pages catalog (row-level upsert) --------------

  private val mergeCleanupRegistered =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** End-to-end `MERGE INTO` through the DSv2 catalog
    * ([[graft.sources.GraftCatalog]], `SupportsRowLevelOperations`): a
    * pages table staged from `documents` takes a deterministic upsert feed
    * (every doc_id %7 row re-texted + 50 brand-new urls) and the MERGED
    * table is read back. The DuckDB oracle computes the same post-merge
    * state as a full-outer join over the raw parquet — hash agreement
    * proves the copy-on-write rewrite (group-confined by runtime bucket
    * filtering) reproduced exactly the logical merge semantics, survivors
    * included.
    *
    * Scale shape: the rewrite touches only url-hash buckets containing
    * matches (here: all 8 at sf0.01 — the feed is corpus-wide by design;
    * PageTableSpec pins the untouched-bucket byte-identity property on a
    * narrow feed). Staging is per-call and per-process; cleaned on exit.
    */
  def qMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val id = java.util.UUID.randomUUID().toString.take(8)
    val wh = s"/tmp/graft-mergeq-${ProcessHandle.current().pid()}-$id"
    if (!mergeCleanupRegistered.getAndSet(true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        new java.io.File("/tmp").listFiles((_, n) =>
          n.startsWith(s"graft-mergeq-${ProcessHandle.current().pid()}-")) match {
          case null => ()
          case ds => ds.foreach(graft.sources.Snapshots.deleteRecursively)
        }))
    val cat = s"gmerge_$id"
    graft.sources.PageTable.register(spark, cat, wh)
    val docs = t(spark, sfDir, "documents")
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2025-07-01 00:00:00")
    val target = docs.select(
      concat(lit("https://docs.example/"), col("doc_id")).as("url"),
      lit(t0).as("warc_ts"),
      lit(null).cast("binary").as("html"),
      col("text"),
      col("lang")).as[graft.Page]
    graft.sources.PageTable.write(target, s"$wh/pages", numBuckets = 8)
    val srcView = s"merge_src_$id"
    docs.filter(col("doc_id") % 7 === 0).select(
        concat(lit("https://docs.example/"), col("doc_id")).as("url"),
        lit(t1).as("warc_ts"),
        lit(null).cast("binary").as("html"),
        concat(lit("MERGED::"), col("text")).as("text"),
        col("lang"))
      .unionByName(
        spark.range(50).select(
          concat(lit("https://merge-new.example/"), col("id")).as("url"),
          lit(t1).as("warc_ts"),
          lit(null).cast("binary").as("html"),
          concat(lit("NEWDOC-"), col("id")).as("text"),
          lit("en").as("lang")))
      .createOrReplaceTempView(srcView)
    spark.sql(
      s"""MERGE INTO $cat.pages t USING $srcView s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET text = s.text
         |WHEN NOT MATCHED THEN INSERT (url, warc_ts, html, text, lang)
         |  VALUES (s.url, s.warc_ts, s.html, s.text, s.lang)""".stripMargin)
    spark.table(s"$cat.pages")
      .select(col("url"), col("text"), col("lang"))
      .orderBy("url")
  }

  val qMergeSql: String =
    """WITH tgt AS (
      |  SELECT 'https://docs.example/' || doc_id AS url, text, lang
      |  FROM documents),
      |src AS (
      |  SELECT 'https://docs.example/' || doc_id AS url,
      |         'MERGED::' || text AS text, lang
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT 'https://merge-new.example/' || i AS url,
      |         'NEWDOC-' || i AS text, 'en' AS lang
      |  FROM range(50) r(i))
      |SELECT coalesce(t.url, s.url) AS url,
      |       coalesce(s.text, t.text) AS text,
      |       coalesce(t.lang, s.lang) AS lang
      |FROM tgt t FULL OUTER JOIN src s ON t.url = s.url
      |ORDER BY url""".stripMargin

  // ---- order-independent table digests ------------------------------------

  /** Cross-engine table checksums (`q_tabledigest`) — the migration-fidelity
    * primitive: after copying/compacting/re-encoding a 100 TB table, both
    * sides compute a digest that is (a) ORDER-independent (no global sort —
    * a sort is the one thing you cannot afford), (b) partial-aggregable
    * (map-side combine, one tiny exchange), and (c) engine-portable. Per
    * row: the first 15 hex chars of md5 over a canonical `|`-joined column
    * rendering (60 bits — BIGINT-safe in both engines), folded with
    * `bit_xor` (commutative/associative ⇒ partition-order-free; overflow-
    * free where a sum would carry). Any lost, duplicated, or altered row
    * flips the digest. One row per audited table + exact row counts.
    */
  def qTabledigest(spark: SparkSession, sfDir: String): DataFrame = {
    def dig(name: String, df: DataFrame, cols: Seq[String]): DataFrame = {
      val rendered = concat_ws("|", cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
      df.select(conv(substring(md5(rendered.cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))
        .select(lit(name).as("tbl"), col("n_rows"), col("digest"))
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dig("documents", docs, Seq("doc_id", "text", "lang", "source", "n_chars"))
      .unionByName(dig("lineitem_keys", li,
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")))
      .orderBy("tbl")
  }

  val qTabledigestSql: String =
    s"""WITH d AS (
       |  SELECT CAST(('0x' || substr(md5(concat_ws('|',
       |           coalesce(CAST(doc_id AS VARCHAR), chr(0)),
       |           coalesce(text, chr(0)),
       |           coalesce(lang, chr(0)),
       |           coalesce(source, chr(0)),
       |           coalesce(CAST(n_chars AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) h
       |  FROM documents),
       |l AS (
       |  SELECT CAST(('0x' || substr(md5(concat_ws('|',
       |           coalesce(CAST(l_orderkey AS VARCHAR), chr(0)),
       |           coalesce(CAST(l_partkey AS VARCHAR), chr(0)),
       |           coalesce(CAST(l_suppkey AS VARCHAR), chr(0)),
       |           coalesce(CAST(l_linenumber AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) h
       |  FROM lineitem)
       |SELECT tbl, n_rows, digest FROM (
       |  SELECT 'documents' tbl, count(*) n_rows, bit_xor(h) digest FROM d
       |  UNION ALL
       |  SELECT 'lineitem_keys', count(*), bit_xor(h) FROM l)
       |ORDER BY tbl""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tabledigest" -> (qTabledigest _),
    "q_merge" -> (qMerge _),
    "q_listagg" -> (qListagg _),
    "q_bits" -> (qBits _),
    "q_bucket_join" -> (qBucketJoin _),
    "q_notin" -> (qNotin _),
    "q_interp" -> (qInterp _),
    "q_ivm" -> (qIvm _),
    "q_triangles" -> (qTriangles _),
    "q_maphof" -> (qMapHof _),
    "q_skyline" -> (qSkyline _),
    "q_xml" -> (qXml _),
    "q_try" -> (qTry _),
    "q_cogroup" -> (qCogroup _),
    "q_apply_cdc" -> (qApplyCdc _),
    "q_eqdepth" -> (qEqdepth _),
    "q_funnel" -> (qFunnel _),
    "q_pattern" -> (qPattern _),
    "q_drift" -> (qDrift _),
    "q_outliers" -> (qOutliers _),
    "q_run_distinct" -> (qRunDistinct _),
    "q_decay" -> (qDecay _),
    "q_retention" -> (qRetention _),
    "q_scd2" -> (qScd2 _),
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "q5_join" -> (q5Join _),
    "q_semi" -> (qSemi _),
    "q_anti" -> (qAnti _),
    "q_outer" -> (qOuter _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_gsets" -> (qGroupingSets _),
    "q_window" -> (qWindow _),
    "q_range_window" -> (qRangeWindow _),
    "q_json" -> (qJson _),
    "q_map" -> (qMap _),
    "q_array" -> (qArray _),
    "q_dates" -> (qDates _),
    "q_scalar_str" -> (qScalarStr _),
    "q_topk" -> (qTopk _),
    "q_topk_per_key" -> (qTopkPerKey _),
    "q_topk_auto" -> (qTopkAuto _),
    "q_except" -> (qExcept _),
    "q_intersect" -> (qIntersect _),
    "q_distinct" -> (qDistinct _),
    "q_pivot" -> (qPivot _),
    "q_range_join" -> (qRangeJoin _),
    "q_asof" -> (qAsof _),
    "q_median" -> (qMedian _),
    "q_subquery" -> (qSubquery _),
    "q_lateral" -> (qLateral _),
    "q_variant" -> (qVariant _),
    "q_rcte" -> (qRcte _),
    "q_nullsafe" -> (qNullsafe _),
    "q_sessionize" -> (qSessionize _),
    "q_bag_ops" -> (qBagOps _),
    "q_histogram" -> (qHistogram _),
    "q_zorder" -> (qZorder _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_locf" -> (qLocf _),
    "q_pagerank" -> (qPagerank _),
    "q_cdc" -> (qCdc _),
    "q_winsorize" -> (qWinsorize _),
    "q_asof_join" -> (qAsofJoin _),
    "q_gapfill" -> (qGapfill _),
    "q_ranks" -> (qRanks _),
    "q_unpivot" -> (qUnpivot _),
    "q_nav" -> (qNav _),
    "q_union" -> (qUnion _),
    "q_approx" -> (qApprox _)
  )

  def oracles: Map[String, String] = Map(
    "q_merge" -> qMergeSql,
    "q_listagg" -> qListaggSql,
    "q_bits" -> qBitsSql,
    "q_bucket_join" -> qBucketJoinSql,
    "q_notin" -> qNotinSql,
    "q_interp" -> qInterpSql,
    "q_ivm" -> qIvmSql,
    "q_triangles" -> qTrianglesSql,
    "q_maphof" -> qMapHofSql,
    "q_skyline" -> qSkylineSql,
    "q_xml" -> qXmlSql,
    "q_try" -> qTrySql,
    "q_cogroup" -> qCogroupSql,
    "q_apply_cdc" -> qApplyCdcSql,
    "q_eqdepth" -> qEqdepthSql,
    "q_funnel" -> qFunnelSql,
    "q_pattern" -> qPatternSql,
    "q_drift" -> qDriftSql,
    "q_outliers" -> qOutliersSql,
    "q_tabledigest" -> qTabledigestSql,
    "q_run_distinct" -> qRunDistinctSql,
    "q_decay" -> qDecaySql,
    "q_retention" -> qRetentionSql,
    "q_scd2" -> qScd2Sql,
    "q1_agg" -> q1AggSql,
    "q3_join" -> q3JoinSql,
    "q5_join" -> q5JoinSql,
    "q_semi" -> qSemiSql,
    "q_anti" -> qAntiSql,
    "q_outer" -> qOuterSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_gsets" -> qGroupingSetsSql,
    "q_window" -> qWindowSql,
    "q_range_window" -> qRangeWindowSql,
    "q_json" -> qJsonSql,
    "q_map" -> qMapSql,
    "q_array" -> qArraySql,
    "q_dates" -> qDatesSql,
    "q_scalar_str" -> qScalarStrSql,
    "q_topk" -> qTopkSql,
    "q_topk_per_key" -> qTopkPerKeySql,
    "q_topk_auto" -> qTopkAutoSql,
    "q_except" -> qExceptSql,
    "q_intersect" -> qIntersectSql,
    "q_distinct" -> qDistinctSql,
    "q_pivot" -> qPivotSql,
    "q_range_join" -> qRangeJoinSql,
    "q_asof" -> qAsofSql,
    "q_median" -> qMedianSql,
    "q_subquery" -> qSubquerySql,
    "q_lateral" -> qLateralSql,
    "q_variant" -> qVariantSql,
    "q_rcte" -> qRcteSql,
    "q_nullsafe" -> qNullsafeSql,
    "q_sessionize" -> qSessionizeSql,
    "q_bag_ops" -> qBagOpsSql,
    "q_histogram" -> qHistogramSql,
    "q_zorder" -> qZorderSql,
    "q_interval_join" -> qIntervalJoinSql,
    "q_locf" -> qLocfSql,
    "q_pagerank" -> qPagerankSql,
    "q_cdc" -> qCdcSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_gapfill" -> qGapfillSql,
    "q_ranks" -> qRanksSql,
    "q_unpivot" -> qUnpivotSql,
    "q_nav" -> qNavSql,
    "q_union" -> qUnionSql,
    // q_approx: sketch VALUES are engine-specific, so the query returns
    // bound-VIOLATION rows (expected empty) — each engine re-derives the
    // exact side and the bound; empty==empty is a real hash match
    "q_approx" -> qApproxSql
  )
}
