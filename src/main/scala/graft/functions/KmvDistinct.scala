package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch as a native Catalyst
  * TypedImperativeAggregate — the scale-correct form of
  * q_agg_approx_distinct_kmv's estimator (SURVEY.md §2.4, §7.6).
  *
  * Buffer = the k lexicographically-smallest md5 hex strings of the
  * group's values. KMV's defining property makes it a mergeable sketch:
  * merge(A, B) = k-smallest of A ∪ B, so partial aggregation works
  * map-side and the shuffle carries ≤ k strings per group — unlike the
  * window-rank formulation, nothing ever materializes per-row state.
  *
  * Estimate (must stay bit-identical to the SQL oracle): with fewer than
  * k distinct hashes the sketch IS the exact distinct count; otherwise
  * est = floor((k-1) · 16¹⁵ / v_k) where v_k is the integer value of the
  * k-th smallest hash's first 15 hex digits (exact in a long; the single
  * double division matches the oracle's expression IEEE-for-IEEE).
  * Hashing uses md5 over the UTF-8 string form — identical to both
  * engines' md5() of the same cast.
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[String]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a string column (cast first), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): JTreeSet[String] =
    new JTreeSet[String]()

  // MessageDigest is stateful and not thread-safe, and aggregate
  // instances can be shared across tasks — one digest per thread, reused
  // per row (a getInstance() + 16 Formatter allocations per row would
  // dominate the sketch's cost).
  @transient private lazy val digests =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def update(buf: JTreeSet[String],
      input: InternalRow): JTreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val h = md5hex(v.toString)
      // only admit hashes that would enter the k-smallest frontier
      if (buf.size < k || h.compareTo(buf.last()) < 0) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: JTreeSet[String],
      b: JTreeSet[String]): JTreeSet[String] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def eval(buf: JTreeSet[String]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      var v = 0L
      val kth = buf.last()
      var i = 0
      while (i < 15) {
        v = v * 16 + Character.digit(kth.charAt(i), 16)
        i += 1
      }
      // Defense in depth: if the k-th hash's first 15 hex digits are all
      // zero (p ≈ 2^-60), v=0 would divide to Infinity → Long.MaxValue
      // here but a CAST error in the DuckDB oracle. Clamp to 1 on both
      // sides (oracle mirrors with greatest(v, 1)).
      v = math.max(v, 1L)
      math.floor((k - 1).toDouble * math.pow(16.0, 15.0) / v.toDouble).toLong
    }

  override def serialize(buf: JTreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[String] = {
    val buf = new JTreeSet[String]()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split('\n').foreach(buf.add)
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
}
