package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drives the HTTP query edge over a real socket with the reference
  * client's exact three call shapes (functions.js:156/312/351). */
class QueryEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, path: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("serves the reference's three call shapes over HTTP") {
    // the aggregate table the memory sink would hold: (user, sec) rows
    // with counts and retained movements
    Seq(
      ("7", 100L, 2L, Seq((1, 2, 1000L), (3, 4, 1100L))),
      ("7", 101L, 1L, Seq((5, 6, 2000L))),
      ("7", 102L, 3L, Seq((7, 8, 3000L))),
      ("9", 100L, 9L, Seq((9, 9, 1500L))))
      .toDF("user_id", "sec", "cnt", "m")
      .withColumn("movs", transform(col("m"),
        e => struct(e.getField("_1").as("x"), e.getField("_2").as("y"),
          e.getField("_3").as("time"))))
      .drop("m")
      .createOrReplaceTempView("edge_test")

    val server = QueryEdge.start(spark, "edge_test")
    val port = server.getAddress.getPort
    try {
      // incremental poll: sec > ts ascending, counts only
      val (c1, poll) = get(port, "/users/7/movements/100")
      assert(c1 == 200)
      assert(poll ==
        """[{"timestamp":101,"count":1},{"timestamp":102,"count":3}]""")

      // initial load: reverse from now, descending
      val (c2, load) = get(port, "/users/7/movements/102?reverse=true")
      assert(c2 == 200)
      assert(load.startsWith("""[{"timestamp":102,"count":3}"""))
      assert(load.contains(""""timestamp":100"""))
      assert(!load.contains("movs"))

      // heatmap read: reverse + count=false + limit → raw movs, capped
      val (c3, heat) =
        get(port, "/users/7/movements/102?reverse=true&count=false&limit=2")
      assert(c3 == 200)
      assert(heat ==
        """[{"timestamp":102,"count":3,"movs":[{"X":7,"Y":8}]},""" +
          """{"timestamp":101,"count":1,"movs":[{"X":5,"Y":6}]}]""")

      // a user with no rows past the key → empty array (the client's
      // data.length == 0 branch, functions.js:161)
      val (c4, empty) = get(port, "/users/9/movements/100")
      assert(c4 == 200 && empty == "[]")

      // malformed path → 404
      assert(get(port, "/users/7/nope/3")._1 == 404)

      // non-GET on a VALID resource → 405 with Allow, not 404
      val del = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$port/users/7/movements/100"))
          .DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() == 405)
      assert(del.headers().firstValue("Allow").orElse("") == "GET")

      // client's fault (unparsable param) → 400, valid JSON body
      val (c5, bad) = get(port, "/users/7/movements/100?limit=notanumber")
      assert(c5 == 400, s"got $c5: $bad")
      assert(bad.startsWith("""{"error":""""))
    } finally server.stop(0)
  }

  test("the server-side page cap bounds EVERY response (VERDICT r16 " +
       "item 4) and the client's timestamp-token idiom pages through " +
       "the remainder unchanged") {
    // 50 seconds of history for one user — more than the cap below
    (1L to 50L).map(s => ("3", s, s % 5 + 1L))
      .toDF("user_id", "sec", "cnt")
      .withColumn("movs", array(struct(lit(1).as("x"), lit(2).as("y"),
        (col("sec") * 1000).as("time"))))
      .createOrReplaceTempView("edge_cap")
    val server = QueryEdge.start(spark, "edge_cap", maxRows = 10)
    val port = server.getAddress.getPort
    try {
      def page(ts: Long): Seq[(Long, Long)] = {
        val (code, body) = get(port, s"/users/3/movements/$ts")
        assert(code == 200)
        if (body == "[]") Seq.empty
        else """"timestamp":(\d+),"count":(\d+)""".r
          .findAllMatchIn(body)
          .map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
      }
      // an UNCAPPED poll (no limit param) returns a bounded page —
      // the unbounded driver collect is impossible at the serve edge
      val p1 = page(0L)
      assert(p1.size == 10, s"page bounded at maxRows, got ${p1.size}")
      assert(p1.map(_._1) == (1L to 10L), "ascending page = oldest rows")
      // a limit param ABOVE the cap clamps instead of being honored
      val (_, big) = get(port, "/users/3/movements/0?limit=9999")
      assert(""""timestamp":""".r.findAllIn(big).size == 10,
        "over-cap limit clamps to maxRows")
      // the reference client's continuation (functions.js:168: next
      // {ts} = last row's timestamp) walks the full history across
      // bounded pages with no protocol change
      val all = Iterator.iterate((page(0L), 0)) { case (p, _) =>
        val next = page(p.last._1)
        (next, 0)
      }.takeWhile(_._1.nonEmpty).flatMap(_._1).toSeq
      assert(all.map(_._1) == (1L to 50L),
        "timestamp-token paging reassembles the complete history")
      // the reverse initial load keeps the NEWEST rows when truncated
      // (where functions.js:322 reads its token: data[0].timestamp)
      val (_, rev) = get(port, "/users/3/movements/50?reverse=true")
      val revTs = """"timestamp":(\d+)""".r.findAllMatchIn(rev)
        .map(_.group(1).toLong).toSeq
      assert(revTs == (50L to 41L by -1),
        s"descending page keeps the newest rows, got $revTs")
    } finally server.stop(0)
  }

  test("server-side failure surfaces as 500 with JSON-safe error body") {
    // a missing table is the SERVER's problem: 500, and the multi-line
    // Spark exception message must still render as one valid JSON
    // string (control characters stripped)
    val server = QueryEdge.start(spark, "no_such_table_xyz")
    val port = server.getAddress.getPort
    try {
      val (code, body) = get(port, "/users/1/movements/0")
      assert(code == 500, s"got $code: $body")
      assert(body.startsWith("""{"error":"""") && body.endsWith("\"}"))
      assert(!body.exists(c => c < ' '), s"control chars must be stripped: $body")
    } finally server.stop(0)
  }

  test("end to end: wire JSON → streaming aggregate → HTTP poll") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.MouseStream
    val input = MemoryStream[String](spark)
    val q = MouseStream.startToMemory(spark,
      MouseStream.parse(input.toDF()), tableName = "edge_e2e")
    val server = QueryEdge.start(spark, "edge_e2e")
    try {
      input.addData(
        """{"user_id":"42","x":10,"y":20,"time":5000}""",
        """{"user_id":"42","x":11,"y":21,"time":5400}""",
        """{"user_id":"42","x":12,"y":22,"time":6100}""")
      q.processAllAvailable()
      val port = server.getAddress.getPort
      // poll everything after sec 4: two windows, counts 2 and 1
      val (code, body) = get(port, "/users/42/movements/4")
      assert(code == 200)
      assert(body == """[{"timestamp":5,"count":2},{"timestamp":6,"count":1}]""")
      // heatmap shape returns the retained raw positions
      val (_, heat) =
        get(port, "/users/42/movements/6?reverse=true&count=false&limit=1")
      assert(heat == """[{"timestamp":6,"count":1,"movs":[{"X":12,"Y":22}]}]""")
    } finally { server.stop(0); q.stop() }
  }
}
