package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** A-stat/X3 — the FUSED kernel of the deterministic Poisson
  * bootstrap ([[graft.ops.Aggregates.poissonBootstrapSE]]): one
  * `TypedImperativeAggregate` that, per input unit (id, y), draws all
  * B resample weights and accumulates (Σw·y, Σw) per replicate plus
  * (n, Σy) into one flat Long buffer — replacing the
  * `explode(sequence(1, B))` form, which amplified the scan B× and
  * round-tripped every draw through an md5 HEX STRING and a base-16
  * `conv` parse. Here the 60-bit hash is read straight off the digest
  * bytes; zero per-draw allocation beyond the digest itself.
  *
  * Determinism contract (identical to the exploded form and the
  * DuckDB oracle): u = first 15 hex nibbles of md5(id || ':' || b) as
  * an unsigned integer, mod 10⁶; w = Poisson(1) inverse CDF of u at
  * the literal ppm thresholds. Bit-for-bit across engines and runs.
  *
  * Buffer layout: [n_units, Σy, wy_1..wy_B, ws_1..ws_B] — 2B+2 longs
  * (~820 B at B=50), serialized only at the partial/final shuffle
  * boundary (the `TypedImperativeAggregate` property; same split as
  * Spark's own ApproximatePercentile). Scale: ONE pass over units,
  * map-side combine, a (2B+2)-long row per partition to the driver
  * side of the final merge — the coordination-free bootstrap at any
  * row count. */
case class PoissonBootstrapPairs(
    idExpr: Expression,
    yExpr: Expression,
    nReps: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  require(nReps >= 2 && nReps <= 200, "nReps in [2, 200]")

  override def left: Expression = idExpr
  override def right: Expression = yExpr

  // Poisson(1) CDF in ppm: P(W <= k) for k = 0..6; u >= last -> w = 7
  private val cdfPpm = Array(367879L, 735759L, 919699L, 981012L,
    996340L, 999406L, 999917L)

  // ":b" suffix bytes per replicate, built once per operator instance
  @transient private lazy val sufs: Array[Array[Byte]] =
    (0 to nReps).map(b => s":$b".getBytes("UTF-8")).toArray

  // MessageDigest is not thread-safe and expression instances can be
  // shared; one digest + output scratch per thread
  @transient private lazy val mdTl =
    ThreadLocal.withInitial[(java.security.MessageDigest, Array[Byte])](() =>
      (java.security.MessageDigest.getInstance("MD5"), new Array[Byte](16)))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * nReps + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val idV = idExpr.eval(input)
    val yV = yExpr.eval(input)
    if (idV != null && yV != null) {
      val idBytes = idV.asInstanceOf[UTF8String].getBytes
      val y = yV.asInstanceOf[Long]
      buf(0) += 1L
      buf(1) += y
      val (md, out) = mdTl.get()
      var b = 1
      while (b <= nReps) {
        md.reset()
        md.update(idBytes)
        md.update(sufs(b))
        md.digest(out, 0, 16)
        // first 15 hex nibbles as unsigned == 7 full bytes + the high
        // nibble of byte 7 (what conv(substring(hex, 1, 15), 16, 10)
        // parses) — 60 bits, sign-safe in a Long
        var v = 0L
        var i = 0
        while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
        v = (v << 4) | ((out(7) & 0xffL) >>> 4)
        val u = v % 1000000L
        var w = 0L
        while (w < 7 && u >= cdfPpm(w.toInt)) w += 1
        buf(1 + b) += w * y
        buf(1 + nReps + b) += w
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(b.length * 8)
    bytes.asLongBuffer().put(b)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = createAggregationBuffer()
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "poisson_bootstrap_pairs"
  override def withNewMutableAggBufferOffset(o: Int): PoissonBootstrapPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PoissonBootstrapPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PoissonBootstrapPairs =
    copy(idExpr = l, yExpr = r)
}

object BootstrapAgg {
  /** Column wrapper: array<long> of [n, Σy, wy_1..wy_B, ws_1..ws_B]. */
  def poissonBootstrapPairs(id: Column, y: Column, nReps: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PoissonBootstrapPairs(
        org.apache.spark.sql.GraftSqlBridge.expression(id),
        org.apache.spark.sql.GraftSqlBridge.expression(y),
        nReps).toAggregateExpression())
}
