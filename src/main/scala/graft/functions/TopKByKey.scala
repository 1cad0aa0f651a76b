package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One (score, id) candidate held by a [[TopKByKey]] buffer. `score` and
  * `id` are CATALYST-internal values (UTF8String for strings), already
  * copied out of any unsafe row they were read from. Fields are vars only
  * so [[TopKBuffer.offer]] can reuse one probe instance for rejected
  * candidates; entries stored in the heap are never mutated. */
private[graft] final class TopKEntry(var score: Any, var id: Any)

/** Bounded top-k buffer: a worst-at-top binary heap of ≤ k entries under
  * `better` ("a ranks strictly before b"). Insertion is O(log k) and the
  * buffer never exceeds k entries — the whole point: partial aggregation
  * caps every map-side state at k, so the shuffle moves ≤ k entries per
  * (partition, key) instead of every scored candidate row. */
private[graft] final class TopKBuffer(val k: Int,
    better: (TopKEntry, TopKEntry) => Boolean) {
  // initial capacity stays SMALL and growth follows actual insertions —
  // k is a CAP, not a size hint, and callers legitimately pass huge caps
  // ("give me the full membership" probes with k = Int.MaxValue, which
  // an eager capacity-k allocation would turn into a VM-limit OOM)
  private[this] val heap = new java.util.PriorityQueue[TopKEntry](
    math.max(1, math.min(k, 16)),
    // worst first: reverse of rank order
    (a: TopKEntry, b: TopKEntry) =>
      if (better(a, b)) 1 else if (better(b, a)) -1 else 0)

  def insert(e: TopKEntry): Unit =
    if (heap.size < k) { heap.add(e); () }
    else if (better(e, heap.peek())) { heap.poll(); heap.add(e); () }

  // reused for rejected-candidate tests in `wouldAccept` — never enters
  // the heap (PriorityQueue only consults the comparator on add/poll)
  private[this] val probe = new TopKEntry(null, null)

  /** Would (score, id) enter the heap right now? Allocation-free — the
    * hot update path tests with a reused probe entry and materializes
    * NOTHING for the (dominant) rejected candidates; the caller clones
    * unsafe-backed values and allocates the entry only on accept. (A
    * by-name `copyId` variant was measured ~2× slower on the 1M-doc
    * probe smoke: the thunk is a per-row Function0 allocation whether or
    * not the candidate ranks.) */
  def wouldAccept(score: Any, id: Any): Boolean =
    heap.size < k || {
      probe.score = score
      probe.id = id
      better(probe, heap.peek())
    }

  def entries: Array[TopKEntry] = heap.toArray(new Array[TopKEntry](heap.size))

  /** Entries in rank order (best first). */
  def ranked: Array[TopKEntry] = {
    val out = entries
    java.util.Arrays.sort(out, (a: TopKEntry, b: TopKEntry) =>
      if (better(a, b)) -1 else if (better(b, a)) 1 else 0)
    out
  }
}

/** `top_k_by_key(score, id, k)` — the per-group top-k as ONE bounded
  * aggregate instead of `row_number() OVER (PARTITION BY key ORDER BY
  * score DESC, id ASC) <= k` over every candidate row.
  *
  * Ordering contract (bit-parity with the window formulation the ANN
  * paths golden-pin): score DESC NULLS LAST with Spark's double ordering
  * (NaN ranks greatest, so first under DESC; SQLOrderingUtil), ties and
  * null scores broken by id ASC NULLS FIRST. The output array holds
  * (score, id) structs in rank order, so `posexplode` reconstructs
  * `rank = pos + 1`.
  *
  * Why it exists: the window shape shuffles EVERY scored candidate row
  * to its key's partition and sorts there — at 1M corpus × 1k queries ×
  * nprobe 8/64 that is ~10⁸ (key, id, score) rows through the exchange.
  * This aggregate runs inside ObjectHashAggregate with map-side partial
  * aggregation: each task reduces its slice to ≤ k entries per key
  * before the exchange, so the shuffle carries ≤ tasks × |keys| × k
  * entries — output-sized, not candidate-sized. Scores/ids pass through
  * untouched (no arithmetic), so results are bit-identical to the
  * window (AnnTopKParitySpec + unchanged golden hashes).
  *
  * Supported types — score: double/float/long/int/date/timestamp/
  * decimal (timestamps and dates ride their Catalyst-internal
  * long/int forms, so "latest-n per key" is a bounded aggregate too);
  * id: long/int/string. Callers fall back to the window plan — with a
  * warning — for anything else.
  */
case class TopKByKey(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_key"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", score.dataType, nullable = true),
    StructField("id", id.dataType, nullable = true))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okScore = score.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | DateType |
           TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }
    val okId = id.dataType match {
      case LongType | IntegerType | StringType => true
      case _ => false
    }
    if (okScore && okId)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("top_k_by_key supports score double/float/long/" +
        "int/date/timestamp/decimal and id long/int/string, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  /** score DESC NULLS LAST (Spark double/float ordering), then id ASC
    * NULLS FIRST — exactly `orderBy(score.desc, id.asc)`. Timestamps
    * (micros) ride the long comparator and dates (days) the int one —
    * their Catalyst-internal forms; "latest-n per key" is therefore a
    * bounded aggregate, not a window. Decimals compare through
    * [[org.apache.spark.sql.types.Decimal]]'s own ordering, the
    * comparator Spark's sort uses. */
  private def scoreCmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1 // null score loses (NULLS LAST under DESC)
    case (_, null) => 1
    case (x, y) => score.dataType match {
      case DoubleType =>
        SQLOrderingUtil.compareDoubles(x.asInstanceOf[Double],
          y.asInstanceOf[Double])
      case FloatType =>
        SQLOrderingUtil.compareFloats(x.asInstanceOf[Float],
          y.asInstanceOf[Float])
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.compare(x.asInstanceOf[Long], y.asInstanceOf[Long])
      case _: DecimalType =>
        x.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .compare(y.asInstanceOf[org.apache.spark.sql.types.Decimal])
      case _ => java.lang.Integer.compare(x.asInstanceOf[Int],
        y.asInstanceOf[Int])
    }
  }

  private def idCmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1 // ASC NULLS FIRST
    case (_, null) => 1
    case (x, y) => id.dataType match {
      case LongType => java.lang.Long.compare(x.asInstanceOf[Long],
        y.asInstanceOf[Long])
      case IntegerType => java.lang.Integer.compare(x.asInstanceOf[Int],
        y.asInstanceOf[Int])
      case _ => x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String])
    }
  }

  private def better(a: TopKEntry, b: TopKEntry): Boolean = {
    val s = scoreCmp(a.score, b.score)
    if (s != 0) s > 0 else idCmp(a.id, b.id) < 0
  }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, better)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i0 = id.eval(input)
    // UTF8String from an unsafe row is a VIEW into reusable memory — it
    // must be copied before being held across rows, but ONLY once the
    // insert is accepted: test first (allocation-free), clone + allocate
    // the entry only for the candidates that actually rank
    if (buf.wouldAccept(s, i0)) {
      val i = i0 match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buf.insert(new TopKEntry(s, i))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.entries.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.ranked.map(e =>
      InternalRow(e.score, e.id): Any))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.length)
    es.foreach { e =>
      out.writeBoolean(e.score == null)
      if (e.score != null) score.dataType match {
        case DoubleType => out.writeDouble(e.score.asInstanceOf[Double])
        case FloatType => out.writeFloat(e.score.asInstanceOf[Float])
        case LongType | TimestampType | TimestampNTZType =>
          out.writeLong(e.score.asInstanceOf[Long])
        case _: DecimalType => out.writeUTF(e.score
          .asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toString)
        case _ => out.writeInt(e.score.asInstanceOf[Int]) // int / date
      }
      out.writeBoolean(e.id == null)
      if (e.id != null) id.dataType match {
        case LongType => out.writeLong(e.id.asInstanceOf[Long])
        case IntegerType => out.writeInt(e.id.asInstanceOf[Int])
        case _ =>
          val b = e.id.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val s = if (in.readBoolean()) null else score.dataType match {
        case DoubleType => java.lang.Double.valueOf(in.readDouble())
        case FloatType => java.lang.Float.valueOf(in.readFloat())
        case LongType | TimestampType | TimestampNTZType =>
          java.lang.Long.valueOf(in.readLong())
        case dt: DecimalType => org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(in.readUTF()), dt.precision, dt.scale)
        case _ => java.lang.Integer.valueOf(in.readInt()) // int / date
      }
      val i = if (in.readBoolean()) null else id.dataType match {
        case LongType => java.lang.Long.valueOf(in.readLong())
        case IntegerType => java.lang.Integer.valueOf(in.readInt())
        case _ =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
      }
      buf.insert(new TopKEntry(s, i))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKey =
    copy(score = newChildren(0), id = newChildren(1))
}
