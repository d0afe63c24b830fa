package graft.sources

import graft.SparkSpec
import graft.etl.{QuickbooksEtl, ShopifyEtl, SquareEtl, ZoloPipeline}

/** The HTTP extraction layer against the loopback API doubles: pagination
  * contracts, retry policy on the real wire, auth fail-fast, distributed
  * page fetch, raw-zone landing, and end-to-end equality with the
  * file-based ETLs.
  */
class RestSourceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("square over HTTP == square over files (token pagination + injected 429/500)") {
    val viaHttp = rows(RestQueries.squareHttpTrans(spark))
    val viaFile = rows(
      SquareEtl
        .run(spark, s"${ZoloPipeline.fixturesDir}/square_payments.json")
        ._1
        .orderBy("payment_id"))
    assert(viaHttp.nonEmpty && viaHttp == viaFile)
  }

  test("time-sliced parallel square == sequential chain (r5 stretch: sharded cursor fetch)") {
    val mk = () => FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 3)
    val (b, e) = ("2019-01-01T00:00:00Z", "2020-01-01T00:00:00Z")
    val srv1 = mk()
    val seq1 =
      try rows(RestQueries.squareExtract(spark, s"${srv1.base}/v1/L/payments", "t", b, e)
        .orderBy("payment_id"))
      finally srv1.stop()
    val srv2 = mk()
    try {
      val par = rows(RestQueries.squareExtractSharded(
        spark, s"${srv2.base}/v1/L/payments", "t", b, e, nSlices = 4).orderBy("payment_id"))
      assert(par.nonEmpty && par == seq1)
      // every sub-window issues at least its first request — the fetch
      // genuinely fanned out across slices instead of one driver chain
      assert(srv2.requestCount >= 4)
    } finally srv2.stop()
    // degenerate slicing still covers the window exactly
    val slices = RestSource.timeSlices(b, e, 3)
    assert(slices.head._1 == b && slices.last._2 == e)
    assert(slices.sliding(2).forall { case Seq(x, y) => x._2 == y._1; case _ => true })
  }

  test("shopify over HTTP == shopify over files (distributed page fetch)") {
    val viaHttp = rows(RestQueries.shopifyHttpTrans(spark))
    val viaFile = rows(
      ShopifyEtl
        .run(spark, s"${ZoloPipeline.fixturesDir}/shopify_orders.json")
        ._1
        .orderBy("order_id"))
    assert(viaHttp.nonEmpty && viaHttp == viaFile)
  }

  test("quickbooks over HTTP == quickbooks over files (offset pagination, ceil page count)") {
    val viaHttp = rows(RestQueries.qbHttpTrans(spark))
    val viaFile = rows(
      QuickbooksEtl
        .run(spark, s"${ZoloPipeline.fixturesDir}/qb_invoices.json")
        ._1
        .orderBy("payment_id"))
    // 3 invoices at 2/page: the reference's round(3/25)=0 pages would have
    // extracted NOTHING — ceil fetches both pages (RestQueries scaladoc)
    assert(viaHttp.nonEmpty && viaHttp == viaFile)
  }

  test("square pagination really pages: fixture spans multiple Link-chained requests") {
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 3)
    try {
      val tokRe = """batch_token=(.*?)&begin_time=""".r
      val base  = s"${srv.base}/v1/L/payments"
      val bodies = RestSource.fetchTokenPages(
        s"$base?begin_time=2019-01-01&end_time=2020-01-01",
        p => p.header("Link").flatMap(tokRe.findFirstMatchIn(_))
          .map(m => s"$base?batch_token=${m.group(1)}&begin_time=2019-01-01&end_time=2020-01-01"),
        HttpConf().withBearer("t"))
      assert(bodies.size == 3)        // 8 records / 3 per page
      assert(srv.requestCount == 3)   // no over- or re-fetch
    } finally srv.stop()
  }

  test("non-terminating token chain hits the maxPages guard") {
    // pageSize=0 never advances past the window → the server issues a next
    // token forever; the guard must throw rather than loop
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 0)
    try {
      val tokRe = """batch_token=(.*?)&begin_time=""".r
      val base  = s"${srv.base}/v1/L/payments"
      val ex = intercept[IllegalArgumentException] {
        RestSource.fetchTokenPages(
          s"$base?begin_time=2019-01-01&end_time=2020-01-01",
          p => p.header("Link").flatMap(tokRe.findFirstMatchIn(_))
            .map(m => s"$base?batch_token=${m.group(1)}&begin_time=2019-01-01&end_time=2020-01-01"),
          HttpConf().withBearer("t"),
          maxPages = 5)
      }
      assert(ex.getMessage.contains("did not terminate"))
    } finally srv.stop()
  }

  test("429 Retry-After and 500 are retried; budget exhaustion raises the LAST failure") {
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 100, failFirst = 2)
    try {
      // attempts: 429 → 500 → 200 within the default 5-attempt budget
      val ok = Http.get(
        Http.newClient(),
        s"${srv.base}/v1/L/payments?begin_time=2019-01-01&end_time=2020-01-01",
        HttpConf().withBearer("t"))
      assert(ok.status == 200 && ok.body.startsWith("["))
    } finally srv.stop()

    val srv2 = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 100, failFirst = 100)
    try {
      val e = intercept[HttpFailure] {
        Http.get(
          Http.newClient(),
          s"${srv2.base}/v1/L/payments?begin_time=2019-01-01&end_time=2020-01-01",
          HttpConf(maxAttempts = 3, baseBackoffMs = 1).withBearer("t"))
      }
      assert(e.attempts == 3 && (e.status == 429 || e.status == 500))
    } finally srv2.stop()
  }

  test("distributed fetch retries INSIDE executor tasks: every page URI fails twice first") {
    val srv = FixtureApiServer.shopifyAdmin(
      s"${ZoloPipeline.fixturesDir}/shopify_orders.json",
      user = "u", pass = "p", failFirst = 2)
    try {
      val cfg  = HttpConf().withBasicAuth("u", "p")
      val urls = (1 to 2).map(k => s"${srv.base}/admin/orders.json?limit=2&page=$k")
      val bodies = RestSource.fetchPages(spark, urls, cfg, parallelism = 2)
        .collect().map(_.getString(1))
      assert(bodies.length == 2 && bodies.forall(_.startsWith("""{"orders":[""")))
      // per-URI injection: each page URL was attempted exactly 3 times
      // (429, 500, 200) — and those attempts ran in Spark tasks, so the
      // retry loop is proven to survive closure serialization
      urls.foreach { u =>
        val uri = u.stripPrefix(srv.base)
        assert(srv.uriAttempts.get(uri).get() == 3, s"attempts for $uri")
      }
    } finally srv.stop()
  }

  test("4xx auth errors fail fast — no retry burns the budget on a bad token") {
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "right-token", pageSize = 100)
    try {
      val e = intercept[HttpFailure] {
        Http.get(
          Http.newClient(),
          s"${srv.base}/v1/L/payments?begin_time=2019-01-01&end_time=2020-01-01",
          HttpConf().withBearer("wrong-token"))
      }
      assert(e.status == 401 && e.attempts == 1)
    } finally srv.stop()
  }

  test("date-range params filter server-side, like the reference's incremental pull") {
    val srv = FixtureApiServer.shopifyAdmin(
      s"${ZoloPipeline.fixturesDir}/shopify_orders.json", user = "u", pass = "p")
    try {
      val cfg = HttpConf().withBasicAuth("u", "p")
      // only 2 of the 4 fixture orders fall before 2019-06-10
      val body = Http.get(
        Http.newClient(),
        s"${srv.base}/admin/orders/count.json?created_at_min=2019-01-01&created_at_max=2019-06-10",
        cfg).body
      assert(body == """{"count":2}""")
    } finally srv.stop()
  }

  test("raw-zone landing: bodies land verbatim and re-read with the pinned schema") {
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "L", token = "t", pageSize = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-raw-zone-").toString
    try {
      val tokRe = """batch_token=(.*?)&begin_time=""".r
      val base  = s"${srv.base}/v1/L/payments"
      val bodies = RestSource.fetchTokenPages(
        s"$base?begin_time=2019-01-01&end_time=2020-01-01",
        p => p.header("Link").flatMap(tokRe.findFirstMatchIn(_))
          .map(m => s"$base?batch_token=${m.group(1)}&begin_time=2019-01-01&end_time=2020-01-01"),
        HttpConf().withBearer("t"))
      RestSource.landRaw(RestSource.pagesDf(spark, bodies), dir)
      val reread = spark.read.schema(graft.etl.ZoloSchemas.squarePayment).json(dir)
      assert(reread.count() == 8)
      assert(reread.where("id IS NULL").count() == 0)
    } finally {
      srv.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
