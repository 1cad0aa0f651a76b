package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Minimal XLSX reader for the reference's Lightcast analytics exports
  * (SURVEY §2.1 S6 — the reference converts these by hand; here they load
  * directly): `spark.read.format("graft-xlsx").option("header", true)
  * .load(path)`.
  *
  * XLSX is a ZIP of OOXML parts; this reads `xl/sharedStrings.xml` and
  * the first worksheet with the JDK's ZIP + StAX — no extra dependency.
  * Every value surfaces as a string (like the Socrata JSON bronze layer;
  * casts happen downstream). Analytics exports are small single blobs, so
  * the scan plans ONE partition and buffers the file — at lake scale the
  * first pipeline step converts to parquet anyway, exactly like the
  * reference's manual conversion (README.md:12,36).
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = XlsxSource.pathOf(options)
    val header = Option(options.get("header")).forall(_.toBoolean)
    val rows = XlsxParser.readRows(
      XlsxSource.readAllBytes(path, XlsxSource.driverHadoopConf()))
    val first = rows.headOption.getOrElse(
      throw new IllegalArgumentException(s"graft-xlsx: $path has no rows"))
    val width = rows.map(_.length).maxOption.getOrElse(0)
    val raw =
      if (header) (0 until width).map(i =>
        Option(first.lift(i).flatten.orNull).getOrElse(s"_c$i"))
      else (0 until width).map(i => s"_c$i")
    // repeated header labels get positional suffixes — resolution is by
    // NAME downstream, so duplicates would silently all read the first
    // occurrence's cells
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = raw.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    StructType(names.map(n => StructField(n, StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XlsxTable(schema, properties.asScala.toMap)
}

object XlsxSource {
  def pathOf(options: util.Map[String, String]): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx requires .load(path)"))

  /** The session's Hadoop conf (spark.hadoop.* — object-store creds, fs
    * impls) for driver-side reads; a bare `new Configuration()` would
    * ignore all of it. */
  def driverHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Whole-file read through the Hadoop FS API (works for file:// and
    * object stores alike). */
  def readAllBytes(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}

/** Hadoop Configuration is not Serializable; ship it to executors via
  * its Writable form (the same trick Spark's own file sources use). */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

final class XlsxTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-xlsx(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(schema, props ++ options.asScala)
}

final class XlsxScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns {

  private var prunedSchema: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) prunedSchema = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx path=${props.getOrElse("path", "?")} " +
      s"fields=${prunedSchema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(XlsxFilePartition(XlsxSource.pathOf(props.asJava)))

  override def createReaderFactory(): PartitionReaderFactory = {
    val header = props.get("header").forall(_.toBoolean)
    // column → position mapping uses the FULL header so pruning keeps
    // reading the right cells
    val fullNames = fullSchema.fieldNames
    new XlsxReaderFactory(fullNames, prunedSchema.fieldNames, header,
      new SerializableHadoopConf(XlsxSource.driverHadoopConf()))
  }
}

final case class XlsxFilePartition(path: String) extends InputPartition

final class XlsxReaderFactory(fullNames: Array[String],
    wanted: Array[String], header: Boolean,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[XlsxFilePartition].path
    new PartitionReader[InternalRow] {
      private val wantedIdx = wanted.map(fullNames.indexOf(_))
      private lazy val rows: Iterator[Array[Option[String]]] = {
        val all = XlsxParser.readRows(
          XlsxSource.readAllBytes(path, conf.value)).iterator
        if (header && all.hasNext) { all.next(); all } else all
      }
      private var current: Array[Option[String]] = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(wantedIdx.toSeq.map { i =>
          if (i < 0) null
          else current.lift(i).flatten.map(UTF8String.fromString).orNull
        })
      override def close(): Unit = ()
    }
  }
}

/** The actual OOXML parsing: shared strings + first worksheet via StAX.
  * Handles shared strings (`t="s"`), inline strings (`t="inlineStr"`),
  * formula-cached strings (`t="str"`), booleans (`t="b"` → true/false)
  * and numbers (raw `<v>` text). Rich-text runs concatenate. */
object XlsxParser {

  /** All rows of the first worksheet as dense arrays (None = blank cell),
    * sized to each row's last populated column. */
  def readRows(bytes: Array[Byte]): Seq[Array[Option[String]]] = {
    val shared = readEntry(bytes, "xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheet = readEntry(bytes, sheetPath(bytes)).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: no worksheet found"))
    parseSheet(sheet, shared)
  }

  /** First sheet path: workbook.xml sheet[0] r:id → rels target; falls
    * back to the conventional xl/worksheets/sheet1.xml. */
  private def sheetPath(bytes: Array[Byte]): String = {
    val target = for {
      wb <- readEntry(bytes, "xl/workbook.xml")
      rid <- firstSheetRid(wb)
      rels <- readEntry(bytes, "xl/_rels/workbook.xml.rels")
      t <- relTarget(rels, rid)
    } yield if (t.startsWith("/")) t.drop(1) else s"xl/$t"
    target.getOrElse("xl/worksheets/sheet1.xml")
  }

  private def readEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if e.getName == name =>
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 14)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          out.toByteArray
        }
    } finally zin.close()
  }

  private def staxReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  private def firstSheetRid(wb: Array[Byte]): Option[String] = {
    val r = staxReader(wb)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          return (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
        }
      }
      None
    } finally r.close()
  }

  private def relTarget(rels: Array[Byte], rid: String): Option[String] = {
    val r = staxReader(rels)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            Option(r.getAttributeValue(null, "Id")).contains(rid)) {
          return Option(r.getAttributeValue(null, "Target"))
        }
      }
      None
    } finally r.close()
  }

  private def parseSharedStrings(ss: Array[Byte]): IndexedSeq[String] = {
    val r = staxReader(ss)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
      out.toIndexedSeq
    } finally r.close()
  }

  /** "C" of "C5" → 2 (0-based). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(sheet: Array[Byte],
      shared: IndexedSeq[String]): Seq[Array[Option[String]]] = {
    val r = staxReader(sheet)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Option[String]]]
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val text = new StringBuilder
    var cellCol = -1
    var cellType = ""
    var inValue = false
    var nextCol = 0
    try {
      while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells.clear(); nextCol = 0
            case "c" =>
              // absent r attribute ⇒ next column after the previous cell
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text.clear()
            case "v" | "t" if cellCol >= 0 => inValue = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inValue =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => inValue = false
            case "c" if cellCol >= 0 =>
              val raw = text.toString
              val value = cellType match {
                // toIntOption: a shared-string cell with a missing/empty
                // <v> (`<c t="s"/>`, legal OOXML for an empty cell) or a
                // malformed index degrades to a blank cell, like the
                // out-of-range case, instead of failing the whole read
                case "s" => raw.trim.toIntOption.flatMap(shared.lift).getOrElse("")
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw // inlineStr/str accumulate via <t>, numbers via <v>
              }
              if (value.nonEmpty || cellType == "inlineStr" || cellType == "str")
                cells += cellCol -> value
              cellCol = -1
            case "row" =>
              val width = cells.map(_._1).maxOption.map(_ + 1).getOrElse(0)
              val arr = Array.fill[Option[String]](width)(None)
              cells.foreach { case (c, v) => if (c >= 0) arr(c) = Some(v) }
              rows += arr
            case _ =>
          }
        case _ =>
      }
      rows.toSeq
    } finally r.close()
  }
}
