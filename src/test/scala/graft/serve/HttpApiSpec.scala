package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkTestBase

/** Drives [[HttpApi]] over a live ephemeral port: endpoint parity with the
  * reference FastAPI app (api/main.py) plus deterministic pagination and
  * the driver-protection page cap. */
class HttpApiSpec extends SparkTestBase {

  private lazy val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def withGold(): Unit = {
    val s = spark
    import s.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
    spark.sql("DROP TABLE IF EXISTS gold.nyc_salary_matches")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "gold.db/nyc_salary_matches")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    (1 to 10).map(i => (s"Title $i", 80 + i))
      .toDF("posted_job_title", "match_score")
      .write.saveAsTable("gold.nyc_salary_matches")
  }

  test("endpoints: root, health, reports list, report page, errors") {
    withGold()
    val api = HttpApi.start(spark, port = 0)
    try {
      val (rootCode, rootBody) = get(api.port, "/")
      assert(rootCode == 200 && rootBody.contains("NYC Jobs Audit API"))

      val (hCode, hBody) = get(api.port, "/health")
      assert(hCode == 200 && hBody.contains("\"status\":\"healthy\""))

      val (rCode, rBody) = get(api.port, "/reports")
      assert(rCode == 200)
      assert(rBody.contains("""{"id":0,"report":"nyc_salary_matches"}"""))
      assert(rBody.contains("""{"id":3,"report":"nyc_matched_job_posting_duration_soc_unique_title"}"""))

      // full page, sorted by match_score desc
      val (pCode, pBody) = get(api.port, "/reports/0")
      assert(pCode == 200)
      val scores = "\"match_score\":(\\d+)".r
        .findAllMatchIn(pBody).map(_.group(1).toInt).toSeq
      assert(scores == (81 to 90).reverse)

      // pagination: two non-overlapping pages stitch to the full result
      val (_, page1) = get(api.port, "/reports/0?offset=0&limit=5")
      val (_, page2) = get(api.port, "/reports/0?offset=5&limit=5")
      val stitched = "\"match_score\":(\\d+)".r
        .findAllMatchIn(page1 + page2).map(_.group(1).toInt).toSeq
      assert(stitched == scores)

      // error mapping (fetch_data.py:72-80 / main.py:46-47)
      assert(get(api.port, "/reports/99")._1 == 400)   // unknown id
      assert(get(api.port, "/reports/zz")._1 == 400)   // malformed id
      assert(get(api.port, "/reports/0?offset=nope")._1 == 400)
      assert(get(api.port, "/reports/0?offset=100")._1 == 404) // past the end
      assert(get(api.port, "/nonsense")._1 == 404)
    } finally api.stop()
  }

  test("fetchJson clamps the page to maxPageRows") {
    withGold()
    val rows = Serve.fetchJson(spark, 0, 0, Int.MaxValue, maxPageRows = 3)
    assert(rows.length == 3)
    // the HTTP layer passes its cap through
    val api = HttpApi.start(spark, port = 0, maxPageRows = 4)
    try {
      val (_, body) = get(api.port, "/reports/0?limit=1000000")
      assert("\"match_score\":".r.findAllIn(body).length == 4)
    } finally api.stop()
  }
}
