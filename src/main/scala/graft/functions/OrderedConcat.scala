package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Ordered string concatenation as a typed `Aggregator` (SURVEY.md §2.5 A8 —
  * the reserve for the `collect_list`+`array_sort` assembly pattern if a
  * pathological document ever approaches the 2 GB array limit): buffers
  * (sortKey, text) pairs, merges associatively, sorts once at reduction end,
  * joins with the separator. Deterministic for distinct keys regardless of
  * partitioning / merge order (ties broken by text — same policy as
  * `array_sort(collect_list(struct(key, text)))`).
  *
  * Register with `spark.udf.register("ordered_concat", OrderedConcat.udafFn)`
  * or use [[OrderedConcat.apply]] as a Column.
  */
object OrderedConcat {

  case class Buf(items: ArrayBuffer[(Long, String)])

  class OrderedConcatAgg(sep: String)
      extends Aggregator[(Long, String), Buf, String] {
    override def zero: Buf = Buf(ArrayBuffer.empty)
    override def reduce(b: Buf, a: (Long, String)): Buf = { b.items += a; b }
    override def merge(b1: Buf, b2: Buf): Buf = { b1.items ++= b2.items; b1 }
    override def finish(b: Buf): String = {
      val sorted = b.items.sortBy { case (k, t) => (k, t) }
      sorted.iterator.map(_._2).mkString(sep)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def udafFn(sep: String): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new OrderedConcatAgg(sep), Encoders.tuple(Encoders.scalaLong, Encoders.STRING))

  /** `ordered_concat(key, text)` over a group, joined by `sep` in key order. */
  def apply(key: Column, text: Column, sep: String): Column =
    udafFn(sep).apply(key, text)
}
