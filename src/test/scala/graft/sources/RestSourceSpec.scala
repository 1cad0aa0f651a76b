package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Deterministic in-memory fetcher standing in for the Socrata API:
  * 2.5 pages of 100 rows (id, title, salary), empty past row 250. */
class SyntheticPageFetcher extends PageFetcher {
  override def fetch(baseUrl: String, limit: Long, offset: Long): Seq[Map[String, String]] = {
    val total = 250L
    val start = offset
    val end = math.min(offset + limit, total)
    if (start >= total) Seq.empty
    else (start until end).map { i =>
      Map(
        "id" -> i.toString,
        "title" -> s"Title $i",
        "salary" -> (50000 + i * 10).toString,
        "maybe_null" -> (if (i % 7 == 0) null else s"v$i"))
    }
  }
}

/** Records every fetched offset (static — readable from the driver in
  * local mode). */
class RecordingPageFetcher extends SyntheticPageFetcher {
  override def fetch(baseUrl: String, limit: Long, offset: Long): Seq[Map[String, String]] = {
    RecordingPageFetcher.offsets.add(offset)
    super.fetch(baseUrl, limit, offset)
  }
}
object RecordingPageFetcher {
  val offsets = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
}

/** Models a server that silently caps `$limit` at 30 rows per request
  * regardless of what's asked (the Socrata 50k cap in miniature). */
class CappedPageFetcher extends PageFetcher {
  override def fetch(baseUrl: String, limit: Long, offset: Long): Seq[Map[String, String]] = {
    val total = 250L
    val end = math.min(offset + math.min(limit, 30L), total)
    if (offset >= total) Seq.empty
    else (offset until end).map(i => Map("id" -> i.toString))
  }
}

class RestSourceSpec extends SparkTestBase {

  private def read =
    spark.read.format("graft-rest")
      .option("url", "synthetic://payroll")
      .option("fields", "id,title,salary,maybe_null")
      .option("pageSize", "100")
      .option("maxPages", "5")
      .option("fetcher", classOf[SyntheticPageFetcher].getName)
      .load()

  test("parallel paginated read assembles all pages") {
    val df = read
    assert(df.schema.fieldNames.toSeq == Seq("id", "title", "salary", "maybe_null"))
    assert(df.count() == 250)
    assert(df.rdd.getNumPartitions == 5) // one partition per planned page
    val ids = df.select("id").collect().map(_.getString(0).toLong).sorted
    assert(ids.toSeq == (0L until 250L))
    // null JSON values surface as SQL nulls
    assert(df.where(col("maybe_null").isNull).count() == 36)
  }

  test("column pruning reaches the reader") {
    val pruned = read.select("title")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("fields=title"), s"plan was:\n$scan")
    assert(pruned.distinct().count() == 250)
  }

  test("limit pushdown plans only the pages the limit needs") {
    RecordingPageFetcher.offsets.clear()
    val limited = spark.read.format("graft-rest")
      .option("url", "synthetic://payroll")
      .option("fields", "id,title,salary,maybe_null")
      .option("pageSize", "100")
      .option("maxPages", "5")
      .option("fetcher", classOf[RecordingPageFetcher].getName)
      .load()
      .limit(150)
    assert(limited.collect().length == 150)
    // ceil(150/100) = 2 pages fetched instead of maxPages=5
    val fetched = RecordingPageFetcher.offsets
    assert(fetched.size() <= 2 && !fetched.contains(200L),
      s"fetched offsets $fetched")
    val scan = limited.queryExecution.executedPlan.toString()
    assert(scan.contains("pushedLimit=150"), s"plan was:\n$scan")
    // and the limit still returns exact rows when it lands mid-page
    assert(read.limit(42).count() == 42)
  }

  test("server-capped pages refill their range (pushed limit stays satisfied)") {
    val df = spark.read.format("graft-rest")
      .option("url", "synthetic://capped")
      .option("fields", "id")
      .option("pageSize", "100") // server caps every response at 30 rows
      .option("maxPages", "5")
      .option("fetcher", classOf[CappedPageFetcher].getName)
      .load()
    // full scan still sees every row, not 30 per planned page
    assert(df.count() == 250)
    // a pushed limit of 150 plans 2 pages; without refilling those two
    // pages would yield only 60 rows
    assert(df.limit(150).count() == 150)
    val ids = df.select("id").collect().map(_.getString(0).toLong).sorted
    assert(ids.toSeq == (0L until 250L))
  }

  test("pages beyond the data end contribute nothing") {
    val df = spark.read.format("graft-rest")
      .option("url", "synthetic://payroll")
      .option("fields", "id")
      .option("pageSize", "200")
      .option("maxPages", "50")
      .option("fetcher", classOf[SyntheticPageFetcher].getName)
      .load()
    assert(df.count() == 250)
  }
}
