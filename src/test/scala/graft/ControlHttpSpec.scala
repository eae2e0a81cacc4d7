package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.control._

class ControlHttpSpec extends SparkSpec {

  private def mkPlane(): ControlPlane =
    new ControlPlane(spark,
      (id: String, df: DataFrame) => Some[StreamingQuery](
        df.writeStream.format("memory")
          .queryName(s"http_$id").outputMode("append").start()))

  private val client = HttpClient.newHttpClient()

  private def call(method: String, url: String,
      body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = (method match {
      case "GET" => b.GET()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body))
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body))
      case "DELETE" => b.DELETE()
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("HTTP control surface drives add/disable/enable/remove (§2.C over REST)") {
    spark.readStream.format("rate").option("rowsPerSecond", "5").load()
      .createOrReplaceTempView("http_rate_view")
    val cp = mkPlane()
    val http = new ControlHttp(cp).start()
    val base = s"http://127.0.0.1:${http.boundPort}/api/v1/plans"
    try {
      // empty listing
      assert(call("GET", base) == (200, """{"plans":[]}"""))
      // add via the control JSON codec
      val (c1, _) = call("POST", base,
        """{"type":"add","planId":"h1","plan":"SELECT value * 2 AS v FROM http_rate_view"}""")
      assert(c1 == 200)
      assert(cp.planIds == Seq("h1") && cp.isEnabled("h1"))
      assert(cp.runningQuery("h1").exists(_.isActive))
      val (_, listing) = call("GET", base)
      assert(listing ==
        """{"plans":[{"id":"h1","enabled":true,"running":true}]}""")
      // duplicate add → 400, service stays up
      val (cDup, bDup) = call("POST", base,
        """{"type":"add","planId":"h1","plan":"SELECT 1 AS x"}""")
      assert(cDup == 400 && bDup.contains("already exists"))
      // garbage body → 400
      assert(call("POST", base, "not json")._1 == 400)
      // disable stops the query but keeps the plan
      assert(call("PUT", s"$base/h1/disable")._1 == 200)
      assert(!cp.isEnabled("h1") && cp.runningQuery("h1").isEmpty)
      // enable restarts it
      assert(call("PUT", s"$base/h1/enable")._1 == 200)
      assert(cp.isEnabled("h1") && cp.runningQuery("h1").exists(_.isActive))
      // remove tears it down
      assert(call("DELETE", s"$base/h1")._1 == 200)
      assert(cp.planIds.isEmpty)
      // unknown route → 404
      assert(call("PUT", s"$base/h1/bogus")._1 == 404)
    } finally {
      http.stop()
      cp.shutdown()
    }
  }
}
