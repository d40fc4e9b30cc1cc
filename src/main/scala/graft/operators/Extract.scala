package graft.operators

import graft._
import graft.functions.Charset
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The distributed extraction pipeline (SURVEY.md §3.2): scan → per-row
  * tokenize (typed flatMap, the one legitimately procedural stage) → pure
  * Catalyst column expressions / window functions / ordered aggregations for
  * everything else (classification J1/W4/W5, line merge W2/W3/A1, document
  * assembly A2). The semantics are normatively defined in
  * [[graft.operators.Classify]]; golden tests assert byte-identical equality
  * per url between this pipeline and the scalar oracle under any partitioning.
  *
  * Shuffle plan (deliberate, scale-first; pinned by the plan-shape test):
  * two consumer branches (sentinel metadata / classification+assembly),
  * each with exactly ONE url-hash Exchange whose input Catalyst has
  * branch-filtered — sentinels shuffle 1 tiny row/page, classification
  * shuffles candidate blocks; every window/agg inside a branch reuses that
  * branch's partitioning, and the final metadata join is co-partitioned.
  * See the comment in [[extract]] + BASELINE.md for the measured
  * alternatives (exchange reuse, fused no-join) and why they lost.
  * An optional pages-level salted repartition (`saltedPages`) balances
  * tokenizer work when the input file layout is host-skewed (B:14).
  */
object Extract {

  /** Per-page procedural step: sniff, decode, tokenize/parse. Emits the
    * candidate block rows plus exactly one sentinel row per page carrying
    * document metadata (so empty/unsupported docs survive the relational
    * stages, and nBlocks/nDropped are exact).
    */
  def toRows(p: Page): Iterator[BlockRow] = {
    val kind = Charset.sniffKind(p.html)
    def sentinel(k: String, nBlocks: Int, fullText: String) = BlockRow(
      url = p.url, warc_ts = p.warc_ts, lang = p.lang, kind = k,
      seq = -1, tag = "", depth = 0, text = "", textLen = 0, linkChars = 0,
      wordCount = 0, parentSeq = 0, flags = Model.FLAG_SENTINEL,
      x = 0, y = 0, w = 0, h = 0, nBlocks = nBlocks, fullText = fullText)
    def blockRow(k: String, b: RawBlock) = BlockRow(
      url = p.url, warc_ts = p.warc_ts, lang = p.lang, kind = k,
      seq = b.seq, tag = b.tag, depth = b.depth, text = b.text,
      textLen = b.textLen, linkChars = b.linkChars, wordCount = b.wordCount,
      parentSeq = b.parentSeq, flags = b.flags, x = b.x, y = b.y, w = b.w,
      h = b.h, nBlocks = 0, fullText = "")

    kind match {
      case Charset.KIND_HTML =>
        val blocks = HtmlBlocks.blocks(Charset.decode(p.html))
        blocks.iterator.map(blockRow(kind, _)) ++
          Iterator.single(sentinel(kind, blocks.length, ""))
      case Charset.KIND_PDF =>
        PdfRuns.parse(p.html) match {
          case Some(runs) =>
            runs.iterator.map(blockRow(kind, _)) ++
              Iterator.single(sentinel(kind, runs.length, ""))
          case None => Iterator.single(sentinel("pdf_unsupported", 0, ""))
        }
      case Charset.KIND_TEXT =>
        val t = Charset.normalizeWs(Charset.decode(p.html))
        Iterator.single(sentinel(kind, if (t.isEmpty) 0 else 1, t))
      case other => Iterator.single(sentinel(other, 0, ""))
    }
  }

  /** F3: the processable-page predicate — non-null payload, and optionally a
    * language allow-list. Expression-only (no UDF) so the null/isin parts
    * push down to the parquet scan (`PushedFilters`) and row groups of
    * filtered-out pages are never read; `length(html) > 0` evaluates
    * post-scan but pre-decode. Applied by the user-facing drivers
    * (Main extract-dir) ahead of [[extract]].
    */
  def processable(langs: Seq[String] = Nil): org.apache.spark.sql.Column = {
    val base = col("html").isNotNull && length(col("html")) > 0
    if (langs.isEmpty) base else base && col("lang").isin(langs: _*)
  }

  /** Optional pages-level balancing shuffle: url-hash plus a salt term folded
    * into the key (B:14 "salting for skewed hosts"). Changes no output —
    * property-tested.
    */
  def saltedPages(pages: Dataset[Page], numPartitions: Int, salt: Long): Dataset[Page] =
    pages.repartition(numPartitions, pmod(xxhash64(col("url"), lit(salt)), lit(numPartitions)))

  /** The unified reading-order keys (HTML: document order; PDF: page, -y, x,
    * seq), materialized as columns so every downstream window shares one
    * sort. ONE definition — [[classifyCandidates]] (production) and the
    * [[lines]] fallback (oracle path) must never drift on row order.
    */
  private def withOrdKeys(df: DataFrame): DataFrame = {
    val isPdf = col("kind") === Charset.KIND_PDF
    df.withColumn("ord0", when(isPdf, col("depth")).otherwise(lit(0)))
      .withColumn("ord1", when(isPdf, -col("y")).otherwise(col("seq")))
      .withColumn("ord2", when(isPdf, col("x")).otherwise(lit(0)))
      .withColumn("ord3", when(isPdf, col("seq")).otherwise(lit(0)))
  }

  /** Blocks DataFrame with all classification columns (the SQL-expressible
    * middle of the pipeline — also materialized for the DuckDB oracle).
    */
  def classifiedBlocks(rows: Dataset[BlockRow]): DataFrame =
    classifiedFrom(rows.toDF.repartition(col("url")))

  /** Classification over a blocks frame with sentinel/boiler rows still
    * present (oracle path).
    */
  private[graft] def classifiedFrom(parted: DataFrame): DataFrame = {
    val sentinelFlag = (col("flags").bitwiseAND(lit(Model.FLAG_SENTINEL))) =!= 0
    val boiler = (col("flags").bitwiseAND(lit(Model.FLAG_BOILER))) =!= 0
    classifyCandidates(parted.filter(!sentinelFlag && !boiler))
  }

  /** Classification over candidate rows only. */
  private[graft] def classifyCandidates(cand: DataFrame): DataFrame = {
    val isHtml = col("kind") === Charset.KIND_HTML
    val isPdf = col("kind") === Charset.KIND_PDF

    val heading = col("tag").isin("h1", "h2", "h3", "h4", "h5", "h6")

    val wParent = Window.partitionBy("url", "parentSeq")
    val wUrl = Window.partitionBy("url")
    // The neighborhood-smoothing window orders by the SAME unified reading-
    // order keys as the downstream [[lines]] windows (HTML: (0,seq,0,0) ≡
    // seq — identical smoothing; PDF: `kept` is constant true, so its
    // lag/lead operand is value-irrelevant). The keys are MATERIALIZED as
    // columns (`ord0..ord3`, added below) rather than inlined expressions:
    // WindowExec projects non-attribute order-by expressions into fresh
    // `_w` columns per Window node, which defeats ordering reuse — with
    // attribute keys, every reading-order window downstream (smoothing
    // here, line-break + lineId in [[lines]]) is satisfied by ONE sort.
    // Plan effect: the classify branch runs 2 full-width sorts (parentSeq
    // scoring + reading order) instead of 5 (pinned by the plan test).
    val wSeq = Window.partitionBy("url")
      .orderBy(col("ord0").asc, col("ord1").asc, col("ord2").asc, col("ord3").asc)

    cand
      .withColumn("ld", ((lit(100) * col("linkChars")) / col("textLen")).cast("int"))
      .withColumn(
        "dense",
        isHtml && (
          (col("textLen") >= Classify.DENSE_MIN_LEN && col("ld") < Classify.LINK_DENSITY_MAX) ||
            (heading && col("textLen") >= Classify.HEADING_MIN_LEN && col("linkChars") === 0)
        )
      )
      .withColumn(
        "contrib",
        when(col("dense"), col("textLen").cast("long") - lit(2L) * col("linkChars"))
      )
      .withColumn("pscore", sum(col("contrib")).over(wParent))
      .withColumn(
        "best",
        max(when(col("dense"), struct(col("pscore"), (-col("parentSeq")).as("negParent"))))
          .over(wUrl)
      )
      .withColumn(
        "boost",
        !col("dense") && col("best").isNotNull &&
          col("parentSeq") === -col("best.negParent") &&
          col("ld") < Classify.LINK_DENSITY_MAX &&
          col("textLen") >= Classify.BOOST_MIN_LEN && isHtml
      )
      .withColumn("base", col("dense") || col("boost"))
      // materialized reading-order keys — added AFTER the scoring stage so
      // they don't widen the (url, parentSeq) sort's buffer rows
      .transform(withOrdKeys)
      .withColumn(
        "kept",
        isPdf || col("base") || (
          coalesce(lag(col("base"), 1).over(wSeq), lit(false)) &&
            coalesce(lead(col("base"), 1).over(wSeq), lit(false)) &&
            col("ld") < Classify.LINK_DENSITY_MAX &&
            col("textLen") < Classify.SMOOTH_MAX_LEN
        )
      )
  }

  /** Kept blocks → per-line rows: unified ordering (HTML: seq; PDF: page,
    * -y, x, seq — `depth` carries the page ordinal on the PDF branch, see
    * PdfRuns), line breaks (HTML: every block; PDF: page boundary or vertical
    * gap > PDF_LINE_GAP), within-line merge ordered by (x, seq) joined by
    * single space (A1).
    */
  def lines(classified: DataFrame): DataFrame = {
    val isPdf = col("kind") === Charset.KIND_PDF
    // Reuse the materialized reading-order keys when the input comes from
    // [[classifyCandidates]] (the production path — keeps every window here
    // on the ordering its sort already produced); compute them otherwise.
    val withOrd =
      if (classified.columns.contains("ord0")) classified
      else withOrdKeys(classified)
    val wOrd = Window.partitionBy("url")
      .orderBy(col("ord0").asc, col("ord1").asc, col("ord2").asc, col("ord3").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    withOrd
      .filter(col("kept"))
      .withColumn("prevY", lag(col("y"), 1).over(wOrd))
      .withColumn("prevPage", lag(col("ord0"), 1).over(wOrd))
      .withColumn(
        "newLine",
        when(!isPdf, lit(1))
          .when(col("prevY").isNull, lit(1))
          .when(col("prevPage") =!= col("ord0"), lit(1))
          .when(col("prevY") - col("y") > Classify.PDF_LINE_GAP, lit(1))
          .otherwise(lit(0))
      )
      .withColumn("lineId", sum(col("newLine")).over(wRun).cast("int"))
      .groupBy(col("url"), col("lineId"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("x"), col("seq"), col("text")))),
            e => e.getField("text")
          ),
          " "
        ).as("lineText"),
        min(col("seq")).as("sourceSeq"),
        count(lit(1)).as("nRows")
      )
  }

  /** Lines → one assembled row per url: lines joined by \n in lineId order,
    * spans with running UTF-16 offsets computed by an ordered fold (A2).
    */
  def assembled(lineDf: DataFrame): DataFrame = {
    lineDf
      .groupBy(col("url"))
      .agg(
        array_sort(
          collect_list(struct(col("lineId"), col("lineText"), col("sourceSeq")))
        ).as("ls"),
        sum(col("nRows")).as("keptRows")
      )
      .withColumn(
        "atext",
        array_join(transform(col("ls"), l => l.getField("lineText")), "\n")
      )
      .withColumn(
        "aspans",
        aggregate(
          col("ls"),
          struct(
            lit(0).as("off"),
            array().cast("array<struct<lineId:int,start:int,end:int,sourceSeq:int>>").as("sp")
          ),
          (acc, l) => {
            val len = length(l.getField("lineText"))
            val start = acc.getField("off")
            struct(
              (start + len + 1).as("off"),
              concat(
                acc.getField("sp"),
                array(
                  struct(
                    l.getField("lineId").as("lineId"),
                    start.as("start"),
                    (start + len).as("end"),
                    l.getField("sourceSeq").as("sourceSeq")
                  )
                )
              ).as("sp")
            )
          },
          acc => acc.getField("sp")
        )
      )
      .select("url", "atext", "aspans", "keptRows")
  }

  /** Tokenizer output as a DataFrame — either the typed flatMap or the
    * native Generator ([[graft.functions.ExtractBlocks]]); both are
    * row-identical (equivalence-tested). The Generator path skips Page
    * materialization and the output encoder; selectable for benchmarking
    * via -Dgraft.extract.generator=true.
    */
  private def blockFrame(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    if (sys.props.get("graft.extract.generator").contains("true"))
      pages.toDF.select(col("url"), col("warc_ts"), col("lang"),
        graft.functions.ExtractBlocks.expr(col("html")))
    else pages.flatMap(toRows).toDF
  }

  /** Full pipeline: Dataset[Page] → Dataset[ExtractedDoc]. */
  def extract(pages: Dataset[Page]): Dataset[ExtractedDoc] =
    extract(pages, sys.props.getOrElse("graft.extract.materialize", "none"))

  /** `materialize` selects how the two consumer branches share the tokenizer
    * output (measured head-to-head by `graft.Main mat-bench`; BENCH.md):
    *   - "none" (default): branch plan — tokenizer runs once per branch, each
    *     branch shuffles only its pushed-down column/row subset;
    *   - "cache": persist the repartitioned blocks (InMemoryRelation keeps
    *     the url-hash partitioning, so both branches consume one exchange and
    *     one tokenize pass); caller owns unpersist/clearCache;
    *   - "checkpoint": localCheckpoint() — same single-pass sharing with the
    *     lineage cut, at the cost of materializing ALL block columns.
    * On a real cluster reading object storage the scan+decode+tokenize pass
    * dominates, which shifts the trade toward the single-pass variants — the
    * default stays measurement-driven per environment.
    */
  def extract(pages: Dataset[Page], materialize: String): Dataset[ExtractedDoc] = {
    val spark = pages.sparkSession
    import spark.implicits._

    // Two consumers branch off the tokenizer output below: sentinel
    // metadata, and block classification/assembly. Catalyst pushes each
    // branch's filter and column set below the repartition, so the two
    // exchange subtrees differ and the tokenizer runs once PER BRANCH.
    // This is a measured, deliberate trade (see BASELINE.md):
    //   - the pushed-down filters mean each branch shuffles only what it
    //     needs (sentinels: 1 tiny row/page; classify: candidate blocks);
    //   - a ReuseExchange formulation (non-deterministic barrier column)
    //     defeats predicate pushdown but not column pruning, so reuse
    //     still breaks;
    //   - a fully fused single-exchange/no-join formulation (sentinels as
    //     lineId=-1 rows + conditional aggregation) was implemented and
    //     benchmarked ~2x MORE CPU: every row then rides through all four
    //     window sorts, which costs more than the second tokenizer pass.
    // The windows/aggs below all derive from one url-hash partitioning, so
    // within each branch there is exactly one shuffle and the final join is
    // co-partitioned.
    val parted0 = blockFrame(pages).repartition(col("url"))
    val parted = materialize match {
      case "cache" =>
        parted0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case "checkpoint" => parted0.localCheckpoint()
      case _            => parted0
    }

    val sentinelFlag = (col("flags").bitwiseAND(lit(Model.FLAG_SENTINEL))) =!= 0
    val sentinels = parted
      .filter(sentinelFlag)
      .select("url", "warc_ts", "lang", "kind", "nBlocks", "fullText")

    val docsAssembled = assembled(lines(classifiedFrom(parted)))

    val isTextKind = col("kind") === Charset.KIND_TEXT
    val isDocKind = col("kind").isin(Charset.KIND_HTML, Charset.KIND_PDF)

    sentinels
      .join(docsAssembled, Seq("url"), "left_outer")
      .select(
        col("url"),
        col("warc_ts"),
        col("lang"),
        when(isTextKind, col("fullText"))
          .when(isDocKind, coalesce(col("atext"), lit("")))
          .otherwise(lit(""))
          .as("text"),
        when(isTextKind && length(col("fullText")) > 0,
          array(struct(lit(1).as("lineId"), lit(0).as("start"),
            length(col("fullText")).as("end"), lit(0).as("sourceSeq"))))
          .when(isDocKind,
            coalesce(col("aspans"),
              array().cast("array<struct<lineId:int,start:int,end:int,sourceSeq:int>>")))
          .otherwise(array().cast("array<struct<lineId:int,start:int,end:int,sourceSeq:int>>"))
          .as("spans"),
        col("nBlocks"),
        when(isDocKind, col("nBlocks") - coalesce(col("keptRows"), lit(0L)).cast("int"))
          .otherwise(lit(0))
          .as("nDropped"),
        col("kind").as("contentKind")
      )
      .as[ExtractedDoc]
  }
}
