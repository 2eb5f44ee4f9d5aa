package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Drives the `endpoint=http://…` transport seam end-to-end against an
  * in-process JDK HttpServer double (no external egress): the server
  * speaks the olap-proxy wire contract — a 200 `{"data":[...]}` body per
  * GET (`oec.py:62`) — and the source must plan one partition per query,
  * stream-parse each response, normalize names, widen schema across
  * responses, evaluate pushed filters on the raw records, and surface
  * non-200s as reader errors naming the URL.
  */
class OecJsonHttpSpec extends SparkFunSuite {

  private def withServer(routes: Map[String, String])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val key = Option(ex.getRequestURI.getQuery).getOrElse("")
      routes.get(key) match {
        case Some(resp) =>
          val bytes = resp.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case None =>
          ex.sendResponseHeaders(404, -1L)
      }
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/olap")
    finally server.stop(0)
  }

  test("live endpoint: one GET per query string, one partition each, results unioned") {
    withServer(Map(
      "cube=trade&drilldowns=Year" ->
        """{"data": [{"Year": 2020, "Trade Value": 10.5},
          |          {"Year": 2021, "Trade Value": 11.0}]}""".stripMargin,
      "cube=trade&drilldowns=Nation" ->
        """{"data": [{"Year": 2022, "Trade Value": 7}]}""")) { base =>
      val df = spark.read.format("oecjson")
        .option("endpoint", base)
        .option("queries", "cube=trade&drilldowns=Year;cube=trade&drilldowns=Nation")
        .load()
      // reference normalization applies to wire keys (oec.py:24)
      assert(df.columns.toSeq == Seq("year", "trade_value"))
      // widening across responses: 7 (long) joins 10.5/11.0 -> double
      assert(df.schema("trade_value").dataType.typeName == "double")
      // one response = one partition (the reference's one-GET-per-query
      // model fanned across executors)
      assert(df.rdd.getNumPartitions == 2)
      val got = df.orderBy(col("year")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((2020L, 10.5), (2021L, 11.0), (2022L, 7.0)))
    }
  }

  test("live endpoint: pushed filters evaluate on the wire records before row materialization") {
    withServer(Map(
      "cube=trade&drilldowns=Year" ->
        """{"data": [{"Year": 2020, "Trade Value": 10.5},
          |          {"Year": 2021, "Trade Value": 11.0},
          |          {"Year": 2022, "Trade Value": 12.0}]}""".stripMargin)) { base =>
      val df = spark.read.format("oecjson")
        .option("endpoint", base)
        .option("queries", "cube=trade&drilldowns=Year")
        .load()
        .filter(col("year") >= 2021)
      // the comparison filter is claimable by the source (same contract
      // as the file transport — the layers above the byte stream are
      // transport-agnostic)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("year"),
        s"expected the year filter pushed into the scan:\n${plan.take(800)}")
      assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2021L, 2022L))
    }
  }

  test("live endpoint: a comma-valued multi-member cut travels the wire unescaped") {
    // the reference's wire grammar never URL-escapes cut values
    // (util.py:1-23 — members join with a literal ','); the route key
    // below only matches if the GET carries the comma byte-for-byte, so
    // a transport that percent-encodes it would 404 this read
    withServer(Map(
      "cube=trade&Year=1996,1997&drilldowns=Nation" ->
        """{"data": [{"Nation": "Georgia", "Trade Value": 3},
          |          {"Nation": "Armenia", "Trade Value": 4}]}""".stripMargin)) {
      base =>
        val df = spark.read.format("oecjson")
          .option("endpoint", base)
          .option("queries", "cube=trade&Year=1996,1997&drilldowns=Nation")
          .load()
        assert(df.columns.toSeq == Seq("nation", "trade_value"))
        val got = df.orderBy(col("nation")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == Seq(("Armenia", 4L), ("Georgia", 3L)))
    }
  }

  test("live endpoint: a bare URL with no queries option is one response, one partition") {
    withServer(Map(
      "" -> """{"data": [{"Nation": "Georgia", "N": 1}]}""")) { base =>
      val df = spark.read.format("oecjson").option("endpoint", base).load()
      assert(df.rdd.getNumPartitions == 1)
      assert(df.collect().map(_.getString(0)).toSeq == Seq("Georgia"))
    }
  }

  test("live endpoint: a non-200 response fails the read naming the URL and code") {
    withServer(Map(
      "cube=ok" -> """{"data": [{"A": 1}]}""")) { base =>
      val e = intercept[Exception] {
        spark.read.format("oecjson")
          .option("endpoint", base)
          .option("queries", "cube=missing")
          .load().collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("HTTP 404") && msgs.contains("cube=missing"),
        s"expected the 404 named with its URL, got: $msgs")
    }
  }
}
