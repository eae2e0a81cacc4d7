package graft.control

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal REST front-end over [[ControlPlane]] — the service surface
  * the reference sketches in its experimental module
  * (experimental/src/main/scala/com/github/haoch/experimental/CEPService.scala:64-92,
  * a spray route over queries whose handlers are all unimplemented)
  * made concrete on the JDK's built-in HTTP server: zero new
  * dependencies, driver-local by default (binds 127.0.0.1).
  *
  *   - `GET    /api/v1/plans`              → `{"plans":[{id,enabled,running}…]}`
  *   - `POST   /api/v1/plans`              → body = control JSON
  *     (`{"type":"add"|"update"|…}`), routed through
  *     [[ControlPlane.handleJson]] — the same codec the streaming
  *     control channel uses, so HTTP and stream control can't diverge
  *   - `PUT    /api/v1/plans/<id>/enable`  → enable
  *   - `PUT    /api/v1/plans/<id>/disable` → disable
  *   - `DELETE /api/v1/plans/<id>`         → remove
  *
  * Control mutations are serialized by [[ControlPlane.handle]]'s lock;
  * the server threads only marshal. Bad requests (unparseable JSON,
  * duplicate/unknown plan ids, failed compiles) return 400 with the
  * error text — a poison request must never take the service down
  * (the control-stream warn-and-drop policy, same contract).
  */
final class ControlHttp(cp: ControlPlane, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseBody(code, bytes)
  }

  // sendResponseBody is not a JDK method — tiny wrapper so the length
  // bookkeeping lives in one place
  implicit private class Ex(ex: HttpExchange) {
    def sendResponseBody(code: Int, bytes: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  private def ok(ex: HttpExchange): Unit =
    respond(ex, 200, """{"ok":true}""")

  private def bad(ex: HttpExchange, msg: String): Unit =
    respond(ex, 400, s"""{"ok":false,"error":${jsonStr(msg)}}""")

  private def guard(ex: HttpExchange)(f: => Unit): Unit =
    try f catch {
      case e: Exception => bad(ex, Option(e.getMessage).getOrElse(
        e.getClass.getSimpleName))
    }

  server.createContext("/api/v1/plans", (ex: HttpExchange) => guard(ex) {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val tail = path.stripPrefix("/api/v1/plans").stripPrefix("/")
    // the JDK server matches contexts by PREFIX: "/api/v1/plansgarbage"
    // lands here too — only exact or slash-delimited paths are routes
    val route =
      if (path == "/api/v1/plans" || path.startsWith("/api/v1/plans/"))
        tail.split("/").filter(_.nonEmpty).toList
      else List("_", "_", "_") // unroutable: falls to the 404 arm
    (ex.getRequestMethod, route) match {
      case ("GET", Nil) =>
        val items = cp.planIds.sorted.map { id =>
          s"""{"id":${jsonStr(id)},"enabled":${cp.isEnabled(id)},""" +
            s""""running":${cp.runningQuery(id).exists(_.isActive)}}"""
        }
        respond(ex, 200, items.mkString("""{"plans":[""", ",", "]}"))
      case ("POST", Nil) =>
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        // acked path: HTTP results land in the same ackLog the
        // streaming channel feeds — one uniform control audit trail
        val a = cp.handleJsonAcked(body)
        if (a.ok) ok(ex) else bad(ex, a.error)
      case ("PUT", id :: "enable" :: Nil) =>
        val a = cp.handleAcked(EnablePlan(id))
        if (a.ok) ok(ex) else bad(ex, a.error)
      case ("PUT", id :: "disable" :: Nil) =>
        val a = cp.handleAcked(DisablePlan(id))
        if (a.ok) ok(ex) else bad(ex, a.error)
      case ("DELETE", id :: Nil) =>
        val a = cp.handleAcked(RemovePlan(id))
        if (a.ok) ok(ex) else bad(ex, a.error)
      case (m, _) =>
        respond(ex, 404, s"""{"ok":false,"error":${jsonStr(
          s"no route for $m $path")}}""")
    }
  })

  def start(): ControlHttp = { server.start(); this }

  def stop(): Unit = server.stop(0)
}
