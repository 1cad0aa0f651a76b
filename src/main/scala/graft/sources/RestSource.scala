package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Fetches one page of a paginated REST dataset (Socrata-style
  * `?$limit=N&$offset=M` — /root/reference/src/data_ingestion.py:15-36).
  * Implementations must be serializable-by-name: executors instantiate the
  * class reflectively (zero-arg constructor).
  */
trait PageFetcher {
  /** Returns the page's rows as field→value maps; empty ⇒ past the end. */
  def fetch(baseUrl: String, limit: Long, offset: Long): Seq[Map[String, String]]
}

/** Production fetcher: HTTP GET + JSON array-of-objects parsing (Jackson,
  * already on the Spark classpath). Values are stringified — Socrata JSON
  * arrives stringly and the reference casts downstream (SURVEY §1.3).
  */
class HttpJsonPageFetcher extends PageFetcher {
  override def fetch(baseUrl: String, limit: Long, offset: Long): Seq[Map[String, String]] = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    val url = s"$baseUrl$sep$$limit=$limit&$$offset=$offset"
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    // fail loudly on API errors — a 429/5xx body parsed as data would
    // either NPE obscurely or silently ingest garbage rows
    if (resp.statusCode() != 200) {
      throw new java.io.IOException(
        s"REST page fetch failed: HTTP ${resp.statusCode()} for $url " +
          s"(body starts: ${resp.body().take(200)})")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(resp.body())
    if (!root.isArray) {
      throw new java.io.IOException(
        s"REST page fetch: expected a JSON array at $url, got " +
          s"${root.getNodeType} (body starts: ${resp.body().take(200)})")
    }
    (0 until root.size()).map { i =>
      val node = root.get(i)
      node.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isNull) null else if (v.isTextual) v.asText() else v.toString)
      }.toMap
    }
  }
}

/** DataSource V2 provider: `spark.read.format("graft-rest")
  * .option("url", ...).option("fields", "a,b,c").option("pageSize", 50000)
  * .option("maxPages", 64).load()`.
  *
  * Plans one [[InputPartition]] per page so executors fetch pages in
  * parallel — the scale path for the reference's driver-side fetch loop
  * (SURVEY §2.1 S1). Supports column pruning down to the requested fields.
  */
class RestSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val fields = Option(options.get("fields")).getOrElse(
      throw new IllegalArgumentException(
        "graft-rest requires .option(\"fields\", \"col1,col2,…\") or an explicit schema"))
    StructType(fields.split(",").map(f => StructField(f.trim, StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(schema, properties.asScala.toMap)
}

final class RestTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${props.getOrElse("url", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, props ++ options.asScala)
}

final class RestScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var prunedSchema: StructType = fullSchema
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) prunedSchema = requiredSchema

  /** LIMIT n plans only ceil(n / pageSize) pages instead of maxPages —
    * `df.limit(100)` against a 64-page source fetches one page. Returns
    * false (partial push): pages are fetched whole, Spark re-applies the
    * exact row limit above the scan. Safe against servers capping
    * `$limit` below pageSize: each partition refills its row range until
    * full or end-of-data (see the reader), so the planned pages always
    * cover the pushed limit. */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    false
  }

  override def build(): Scan = this
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest url=${props.getOrElse("url", "?")} fields=${prunedSchema.fieldNames.mkString(",")}" +
      limit.fold("")(l => s" pushedLimit=$l")

  override def planInputPartitions(): Array[InputPartition] = {
    val pageSize = props.getOrElse("pagesize", "50000").toLong
    val maxPages = props.getOrElse("maxpages", "64").toInt
    val pages = limit.fold(maxPages) { l =>
      math.min(maxPages.toLong, (l + pageSize - 1) / pageSize).toInt
    }
    (0 until pages)
      .map(p => RestPagePartition(p * pageSize, pageSize): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val pageSize = props.getOrElse("pagesize", "50000").toLong
    val maxPages = props.getOrElse("maxpages", "64").toInt
    // truncation warning only applies when the plan was capped by
    // maxPages itself (a pushed LIMIT capping pages is intentional)
    val lastPlannedOffset =
      if (limit.isDefined) -1L else (maxPages - 1).toLong * pageSize
    new RestReaderFactory(
      props.getOrElse("url", ""),
      props.getOrElse("fetcher", classOf[HttpJsonPageFetcher].getName),
      prunedSchema.fieldNames, lastPlannedOffset)
  }
}

final case class RestPagePartition(offset: Long, limit: Long) extends InputPartition

final class RestReaderFactory(url: String, fetcherClass: String,
    fields: Array[String], lastPlannedOffset: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestPagePartition]
    new PartitionReader[InternalRow] {
      private var fetched = 0L
      private var exhausted = false
      private lazy val fetcher = Class.forName(fetcherClass)
        .getDeclaredConstructor().newInstance().asInstanceOf[PageFetcher]
      private var rows: Iterator[Map[String, String]] = Iterator.empty
      private var current: Map[String, String] = _

      /** The partition owns the row range [offset, offset+limit). Servers
        * may cap `$limit` below the requested page size (Socrata caps at
        * 50k) — a single fetch would then silently under-fill the range
        * (and under-satisfy a pushed LIMIT), so refill from
        * offset+fetched until the range is full or a page comes back
        * empty (true end of dataset). */
      private def refill(): Boolean = {
        while (!rows.hasNext && !exhausted && fetched < p.limit) {
          val batch = fetcher.fetch(url, p.limit - fetched, p.offset + fetched)
          if (batch.isEmpty) exhausted = true
          else rows = batch.iterator
        }
        rows.hasNext
      }

      override def next(): Boolean =
        if (refill()) { current = rows.next(); fetched += 1; true }
        else false
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map(f =>
          current.get(f).flatMap(Option(_)).map(UTF8String.fromString).orNull))
      override def close(): Unit = {
        // the final planned page coming back FULL means the dataset very
        // likely continues past maxPages*pageSize — surface the
        // truncation instead of silently under-ingesting
        if (p.offset == lastPlannedOffset && fetched == p.limit) {
          org.slf4j.LoggerFactory.getLogger(classOf[RestReaderFactory]).warn(
            s"graft-rest: last planned page (offset ${p.offset}) returned a " +
              s"full ${p.limit} rows — dataset at $url is probably truncated; " +
              "raise maxPages")
        }
      }
    }
  }
}
