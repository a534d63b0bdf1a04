package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** X2/E6 — exact distinct count over a DENSE BOUNDED integer domain
  * via a fixed-width bitmap, as a typed Spark `Aggregator`: the
  * ClickHouse/Doris-style `bitmap` aggregate Spark lacks. When keys
  * are surrogate ids in [0, domain) — dimension keys, user ids after
  * dictionary encoding — a bitmap OR-merge beats `count(DISTINCT)`
  * structurally: the shuffle carries ONE `domain/8`-byte buffer per
  * group per partition instead of every distinct key, and merge is
  * wordwise OR (associative + commutative + idempotent, so any merge
  * tree and any duplication yields the identical bitmap — the same
  * mergeability law as the HLL/KMV sketches, but EXACT).
  *
  * Scale rule (the E6 note): bitmap when the domain is dense and
  * bounded (buffer = domain/8 bytes — 12 MB at 100 M keys), HLL
  * (q171) when it is huge or sparse. Out-of-range keys fail fast
  * rather than silently alias.
  *
  * [[GeoMeanAggregator]] is the toy registration example; this is the
  * production-shaped one: a real buffer type (Array[Long]) exercising
  * the Encoder path, registered the same `functions.udaf` way. */
final class BitmapDistinctAgg(domain: Int)
    extends Aggregator[Long, Array[Long], Long] {
  require(domain > 0 && domain <= (1 << 28),
    "domain must be in (0, 2^28] (buffer = domain/8 bytes; use HLL beyond)")

  override def zero: Array[Long] = new Array[Long]((domain + 63) >>> 6)

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    require(a >= 0 && a < domain,
      s"key $a outside bitmap domain [0, $domain)")
    b((a >>> 6).toInt) |= 1L << (a & 63)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapDistinct {
  /** Column function: exact distinct of `key` (long in [0, domain)). */
  def bitmapDistinct(key: Column, domain: Int): Column =
    udaf(new BitmapDistinctAgg(domain)).apply(key)
}
