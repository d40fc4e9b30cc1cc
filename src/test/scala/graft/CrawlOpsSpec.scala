package graft

import graft.operators.CrawlOps
import graft.sources.StructuredCorpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the crawl-hygiene batch (SURVEY §2.24): threshold boundaries the
  * DuckDB oracle shares with the Spark side (and so cannot catch drifting
  * TOGETHER), plus semantics on crafted inputs the synthetic corpus only
  * samples.
  */
class CrawlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ---- template-line discovery boundaries ----------------------------------

  test("hostlines: strict-majority boundary — maj line in, half line out, " +
    "small hosts produce nothing") {
    val tpl = CrawlOps.exHostlines(spark, "").collect()
    // every discovered line is a site/maj line by construction; no half/unique
    assert(tpl.nonEmpty)
    tpl.foreach { r =>
      val line = r.getAs[String]("line")
      assert(line.startsWith("site") || line.startsWith("maj"),
        s"non-template line discovered: $line")
      assert(2 * r.getAs[Long]("n_pages") > r.getAs[Long]("host_pages"))
    }
    // the planted floor(p/2)+1 majority line IS discovered for every host
    // with >= MIN_HOST_PAGES pages
    val majHosts = tpl.filter(_.getAs[String]("line").startsWith("maj"))
      .map(_.getAs[String]("host")).toSet
    val expected = (0L until StructuredCorpus.N_DHOSTS.toLong)
      .filter(h => StructuredCorpus.dhostPages(h) >= CrawlOps.MIN_HOST_PAGES)
      .map(h => s"dhost$h.example.org").toSet
    assert(majHosts == expected)
    // hosts below the page floor never appear at all
    val small = (0L until StructuredCorpus.N_DHOSTS.toLong)
      .filter(h => StructuredCorpus.dhostPages(h) < CrawlOps.MIN_HOST_PAGES)
      .map(h => s"dhost$h.example.org").toSet
    assert(tpl.map(_.getAs[String]("host")).toSet.intersect(small).isEmpty)
  }

  test("hostclean: drops exactly the template lines, preserves order, " +
    "counts reconcile") {
    val cleaned = CrawlOps.exHostclean(spark, "").collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    val tplByHost = CrawlOps.exHostlines(spark, "").collect()
      .groupBy(_.getAs[String]("host"))
      .map { case (h, rs) => h -> rs.map(_.getAs[String]("line")).toSet }
    StructuredCorpus.hostdocs(spark).collect().foreach { r =>
      val (url, host, text) = (r.getAs[String]("url"),
        r.getAs[String]("host"), r.getAs[String]("text"))
      val lines = text.split("\n", -1).toSeq
      val tpl = tplByHost.getOrElse(host, Set.empty[String])
      val kept = lines.filterNot(tpl)
      val (nl, nk, ct) = cleaned(url)
      assert(nl == lines.size && nk == kept.size &&
        ct == kept.mkString("\n"), s"mismatch at $url")
    }
  }

  // ---- url-template normalization unit cases --------------------------------

  test("url template: adjacent digit segments, long-segment {s}, sorted params") {
    import spark.implicits._
    val rows = Seq(
      ("h", "https://h.example.org/cal/2026/3/14"),
      ("h", "https://h.example.org/s/0123456789abcdef"),
      ("h", "https://h.example.org/a/7?ref=x&id=9"), // params out of order
      ("h", "https://h.example.org/mix12seg/ok"), // mixed segment stays literal
      ("h", "https://h.example.org/")
    ).toDF("host", "url")
    val tpls = rows.select(col("url"), CrawlOps.urlTemplate(col("url")).as("tpl"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tpls("https://h.example.org/cal/2026/3/14") == "/cal/{n}/{n}/{n}")
    assert(tpls("https://h.example.org/s/0123456789abcdef") == "/s/{s}")
    assert(tpls("https://h.example.org/a/7?ref=x&id=9") == "/a/{n}?id,ref")
    assert(tpls("https://h.example.org/mix12seg/ok") == "/mix12seg/ok")
    assert(tpls("https://h.example.org/") == "/")
  }

  test("url template: trap flag fires at the 50-url threshold, " +
    "calendar hosts carry exactly one trap") {
    val out = CrawlOps.exUrltemplate(spark, "").collect()
    out.foreach { r =>
      assert((r.getAs[Long]("is_trap") == 1L) ==
        (r.getAs[Long]("n_urls") >= CrawlOps.TRAP_URLS))
    }
    val traps = out.filter(_.getAs[Long]("is_trap") == 1L)
    assert(traps.nonEmpty)
    traps.foreach { r =>
      assert(r.getAs[String]("tpl") == "/cal/{n}/{n}/{n}")
      assert(r.getAs[String]("host").stripPrefix("chost")
        .stripSuffix(".example.org").toLong % 3 == 0)
    }
  }

  // ---- unicode scrub semantics ----------------------------------------------

  test("ta_clean: counts and scrub on a crafted string") {
    import spark.implicits._
    val dirty = "a\u00ADb \u200Bc\u200Cd\uFEFF e\u00A0fgh\u0007\u0001\r\ni\rj"
    val df = Seq(("u", dirty)).toDF("url", "text")
    val r = CrawlOps.cleanColumns(df).collect()(0)
    assert(r.getAs[Long]("n_soft") == 1)
    assert(r.getAs[Long]("n_zw") == 3)
    assert(r.getAs[Long]("n_nbsp") == 1)
    assert(r.getAs[Long]("n_ctrl") == 2)
    assert(r.getAs[String]("clean_text") == "ab cd e fgh\ni\nj")
  }

  // ---- freshness classes ------------------------------------------------------

  test("freshness: hot/warm/cold witnesses all present and consistent") {
    val out = CrawlOps.exFreshness(spark, "").collect()
    val byP = out.groupBy(_.getAs[String]("priority")).view.mapValues(_.length)
    assert(byP.getOrElse("hot", 0) > 0)
    assert(byP.getOrElse("warm", 0) > 0)
    assert(byP.getOrElse("cold", 0) > 0)
    out.foreach { r =>
      val (nc, lc, p) = (r.getAs[Long]("n_changes"),
        r.getAs[Long]("last_change"), r.getAs[String]("priority"))
      if (p == "cold") assert(nc == 0 && lc == -1)
      else assert(nc > 0 && lc >= 1)
      if (r.getAs[Long]("n_crawls") == 1) assert(p == "cold")
    }
  }

  // ---- scale-shape plan pins -----------------------------------------------

  private def exchanges(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Exchange")).map(_.trim).toSeq
  }

  test("plan pins: hostlines = one (host,line) hash exchange with partial agg " +
    "+ broadcast page-count side; urltemplate = one (host,tpl) exchange; " +
    "ta_clean/linkstats = zero pre-sort exchanges") {
    // exHostlines: exactly one hashpartitioning exchange on (host, line)
    // before the presentation sort; the host_pages side is broadcast
    val hl = CrawlOps.exHostlines(spark, "")
    val hlPlan = hl.queryExecution.executedPlan.toString
    val hlEx = exchanges(hl).filterNot(_.contains("rangepartitioning"))
    // two-phase distinct page count ((host,line,url) partial dedup +
    // (host,line) final) + one (host) exchange for the page-count side
    assert(hlEx.count(_.contains("hashpartitioning")) == 3,
      s"hostlines exchanges:\n${hlEx.mkString("\n")}")
    assert(hlPlan.contains("BroadcastExchange") ||
      hlPlan.contains("BroadcastHashJoin") || hlPlan.contains("BroadcastQueryStage"),
      s"expected broadcast page-count join:\n$hlPlan")
    // exUrltemplate: one hash exchange, map-side combine
    val ut = CrawlOps.exUrltemplate(spark, "")
    val utEx = exchanges(ut).filterNot(_.contains("rangepartitioning"))
    assert(utEx.count(_.contains("hashpartitioning")) == 1,
      s"urltemplate exchanges:\n${utEx.mkString("\n")}")
    assert(ut.queryExecution.executedPlan.toString.contains("partial_count"))
    // taClean: zero exchanges before the presentation sort
    val tc = CrawlOps.taClean(spark, "")
    assert(exchanges(tc).forall(_.contains("rangepartitioning")),
      s"ta_clean must be scan->project->sort:\n${exchanges(tc).mkString("\n")}")
    // exLinkstats: two-phase distinct for the external-host fan-out —
    // (url, ext_host) partial dedup then the url-keyed final agg
    val ls = CrawlOps.exLinkstats(spark, "")
    val lsEx = exchanges(ls).filterNot(_.contains("rangepartitioning"))
    assert(lsEx.count(_.contains("hashpartitioning")) == 2,
      s"linkstats exchanges:\n${lsEx.mkString("\n")}")
  }

  // ---- outlink profile ---------------------------------------------------------

  test("linkstats: empty-anchor links counted with zero anchor chars; " +
    "internal + external partition the total") {
    val out = CrawlOps.exLinkstats(spark, "").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_int") + r.getAs[Long]("n_ext") ==
        r.getAs[Long]("n_links"))
    }
    // every 4th page carries the empty-anchor deep link: 5 internal there
    val deep = out.filter(_.getAs[String]("url").endsWith("/p/0"))(0)
    assert(deep.getAs[Long]("n_int") == 5L)
  }

  // ---- mixed-language span segmentation -----------------------------------------

  test("seglang: spans reconstruct the planted language runs exactly, " +
    "single-span witnesses present, decoy lines classify by majority") {
    val out = CrawlOps.taSeglang(spark, "").collect()
      .groupBy(_.getAs[String]("url"))
    val names = StructuredCorpus.SEG_LANGS.map(_._1)
    var singles = 0
    (0L until StructuredCorpus.N_MIXED).foreach { i =>
      val url = s"https://mixed.example.org/m/$i"
      val planted = StructuredCorpus.mixedLineLangs(i).map(names)
      // run-length encode the planted labels → expected spans
      val exp = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, Int)]
      var s = 0
      while (s < planted.length) {
        var e = s
        while (e + 1 < planted.length && planted(e + 1) == planted(s)) e += 1
        exp += ((planted(s), e - s + 1, s, e))
        s = e + 1
      }
      val got = out(url).sortBy(_.getAs[Long]("span_id"))
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_lines").toInt,
          r.getAs[Long]("start_ord").toInt, r.getAs[Long]("end_ord").toInt))
        .toSeq
      assert(got == exp.toSeq, s"doc $i: got $got expected $exp")
      if (exp.length == 1) singles += 1
    }
    assert(singles >= (StructuredCorpus.N_MIXED / 10).toInt)
  }

  test("plan pins: seglang rides ONE url exchange (windows + rollup share it); " +
    "hostgraph = two-phase distinct page count") {
    // taSeglang: HashPartitioning(url) from the window satisfies the span
    // rollup's ClusteredDistribution(url, span_id) — no second shuffle
    val sl = CrawlOps.taSeglang(spark, "")
    val slEx = exchanges(sl).filterNot(_.contains("rangepartitioning"))
    assert(slEx.count(_.contains("hashpartitioning")) == 1,
      s"seglang exchanges:\n${slEx.mkString("\n")}")
    // exHostgraph: (src,dst,url) partial dedup then the (src,dst) final agg
    val hg = CrawlOps.exHostgraph(spark, "")
    val hgEx = exchanges(hg).filterNot(_.contains("rangepartitioning"))
    assert(hgEx.count(_.contains("hashpartitioning")) == 2,
      s"hostgraph exchanges:\n${hgEx.mkString("\n")}")
  }

  // ---- host link graph ------------------------------------------------------------

  test("hostgraph: edge volume reconciles with the per-page profile; " +
    "internal self-edges on every source host; externals stay in-universe") {
    val edges = CrawlOps.exHostgraph(spark, "").collect()
    edges.foreach { r =>
      val s = r.getAs[String]("src_host")
      val d = r.getAs[String]("dst_host")
      assert(s.startsWith("lhost"), s"unexpected src $s")
      assert(r.getAs[Long]("is_internal") == (if (s == d) 1L else 0L))
      if (s != d) assert(d.startsWith("ext"), s"unexpected dst $d")
      assert(r.getAs[Long]("n_pages") <= r.getAs[Long]("n_links"))
    }
    val totLinks = CrawlOps.exLinkstats(spark, "").collect()
      .map(_.getAs[Long]("n_links")).sum
    assert(edges.map(_.getAs[Long]("n_links")).sum == totLinks)
    // all 12 page hosts carry an internal self-edge (4 nav links per page)
    assert(edges.filter(_.getAs[Long]("is_internal") == 1L)
      .map(_.getAs[String]("src_host")).toSet.size == 12)
  }

  // ---- redirect-chain resolution ---------------------------------------------------

  test("redirects: pointer doubling equals a brute-force walk — exact " +
    "terminals + hop counts on chains, cycle flags on loops and " +
    "cycle-feeding tails") {
    val edgeMap = StructuredCorpus.redirectEdges().toMap
    val out = CrawlOps.exRedirects(spark, "").collect()
    assert(out.length == edgeMap.size)
    out.foreach { r =>
      val src = r.getAs[String]("src")
      // brute-force reference: follow edges up to the doubling capacity
      var cur = src
      var hops = 0L
      val cap = 1 << CrawlOps.REDIRECT_ROUNDS
      while (edgeMap.contains(cur) && hops < cap) {
        cur = edgeMap(cur); hops += 1
      }
      if (edgeMap.contains(cur)) { // still mid-graph after cap hops = cycle
        assert(r.getAs[Long]("is_cycle") == 1L, s"$src should flag cycle")
        assert(r.getAs[String]("final_url") == "")
        assert(r.getAs[Long]("n_hops") == -1L)
      } else {
        assert(r.getAs[Long]("is_cycle") == 0L, s"$src resolved")
        assert(r.getAs[String]("final_url") == cur, s"$src terminal")
        assert(r.getAs[Long]("n_hops") == hops, s"$src hop count")
      }
    }
    // topology witnesses all present: an 8-hop chain head, a cycle member,
    // and a tail that FEEDS a cycle without being on it
    val bySrc = out.map(r => r.getAs[String]("src") -> r).toMap
    val eight = bySrc("https://redir.example.org/c39/0") // len = 1 + 39%8 = 8
    assert(eight.getAs[Long]("n_hops") == 8L &&
      eight.getAs[String]("final_url") == "https://redir.example.org/c39/8")
    assert(bySrc("https://redir.example.org/y0/0").getAs[Long]("is_cycle") == 1L)
    assert(bySrc("https://redir.example.org/t0/0").getAs[Long]("is_cycle") == 1L)
  }
}
