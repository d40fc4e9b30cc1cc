package graft.functions

import graft.operators.{HtmlBlocks, PdfRuns, RawBlock}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `extract_blocks(html BINARY)` — the tokenizer as a native Catalyst
  * Generator (SURVEY.md §2.10 U2/U3): one input page payload explodes into
  * its candidate block rows plus one sentinel metadata row, identical in
  * content to [[graft.operators.Extract.toRows]] minus the page-level
  * columns (url/warc_ts/lang), which `Generate` preserves from the child
  * automatically.
  *
  * Compared to the typed `flatMap` path this emits `InternalRow`s directly —
  * no Page object materialization (the html byte array is not copied into a
  * case class) and no encoder round-trip for the output. The generator is
  * `CodegenFallback` (procedural body), which is expected: `GenerateExec`
  * breaks a codegen stage at this operator either way. Both paths are kept;
  * an equivalence test pins them row-identical.
  */
case class ExtractBlocks(child: Expression) extends Generator with CodegenFallback {

  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtractBlocks =
    copy(child = newChildren.head)

  override def elementSchema: StructType = ExtractBlocks.SCHEMA

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    ExtractBlocks.rows(bytes)
  }

  override def prettyName: String = "extract_blocks"
}

object ExtractBlocks {

  /** BlockRow minus (url, warc_ts, lang) — those ride along from the child. */
  val SCHEMA: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("seq", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("textLen", IntegerType, nullable = false),
    StructField("linkChars", IntegerType, nullable = false),
    StructField("wordCount", IntegerType, nullable = false),
    StructField("parentSeq", IntegerType, nullable = false),
    StructField("flags", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("nBlocks", IntegerType, nullable = false),
    StructField("fullText", StringType, nullable = false)
  ))

  def expr(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      ExtractBlocks(org.apache.spark.sql.graftshim.GraftShim.expression(c)))

  private def sentinel(kind: String, nBlocks: Int, fullText: String): InternalRow =
    InternalRow(UTF8String.fromString(kind), -1, UTF8String.EMPTY_UTF8, 0,
      UTF8String.EMPTY_UTF8, 0, 0, 0, 0, graft.Model.FLAG_SENTINEL,
      0, 0, 0, 0, nBlocks, UTF8String.fromString(fullText))

  private def block(kind: UTF8String, b: RawBlock): InternalRow =
    InternalRow(kind, b.seq, UTF8String.fromString(b.tag), b.depth,
      UTF8String.fromString(b.text), b.textLen, b.linkChars, b.wordCount,
      b.parentSeq, b.flags, b.x, b.y, b.w, b.h, 0, UTF8String.EMPTY_UTF8)

  /** Same decomposition as Extract.toRows, emitting InternalRows. */
  def rows(bytes: Array[Byte]): Iterator[InternalRow] =
    Charset.sniffKind(bytes) match {
      case Charset.KIND_HTML =>
        val blocks = HtmlBlocks.blocks(Charset.decode(bytes))
        val k = UTF8String.fromString(Charset.KIND_HTML)
        blocks.iterator.map(block(k, _)) ++
          Iterator.single(sentinel(Charset.KIND_HTML, blocks.length, ""))
      case Charset.KIND_PDF =>
        PdfRuns.parse(bytes) match {
          case Some(runs) =>
            val k = UTF8String.fromString(Charset.KIND_PDF)
            runs.iterator.map(block(k, _)) ++
              Iterator.single(sentinel(Charset.KIND_PDF, runs.length, ""))
          case None => Iterator.single(sentinel("pdf_unsupported", 0, ""))
        }
      case Charset.KIND_TEXT =>
        val t = Charset.normalizeWs(Charset.decode(bytes))
        Iterator.single(
          sentinel(Charset.KIND_TEXT, if (t.isEmpty) 0 else 1, t))
      case other => Iterator.single(sentinel(other, 0, ""))
    }
}
