package graft.server

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CompletionStage, CountDownLatch, TimeUnit}

/** Minimal command-line client for [[WsServer]] — mirror of the reference
  * CLI (`cli/src/main.rs:20-180`):
  *
  * {{{
  *   runMain graft.server.Cli [--host H] [--port P] ping
  *   runMain graft.server.Cli req  '<json request or [requests]>'
  *   runMain graft.server.Cli req  @requests.json
  *   runMain graft.server.Cli tx   '<tx data json>' | tx @changes.json
  *   runMain graft.server.Cli gql  <namespace> '<graphql document>'
  * }}}
  *
  * `ping` sends `Status` and prints the reply; `req` sends raw requests;
  * `tx` wraps tx data in `Transact`; `gql` sends `Derive`. Each command
  * prints every server message received within the wait window.
  */
object Cli {

  def main(args: Array[String]): Unit = run(args, println)

  /** `main` with an injectable message consumer (tests collect output
    * delivered on the WebSocket callback thread). */
  def run(args: Array[String], print: String => Unit): Unit = {
    var host = "127.0.0.1"
    var port = 6262
    var rest = args.toList
    var done = false
    while (!done) rest match {
      case "--host" :: h :: tl => host = h; rest = tl
      case "--port" :: p :: tl => port = p.toInt; rest = tl
      case _                   => done = true
    }

    def arg(i: Int): String = {
      val raw = rest.drop(i + 1).headOption.getOrElse(
        sys.error(s"missing argument for ${rest.head}"))
      if (raw.startsWith("@")) Files.readString(Paths.get(raw.drop(1))) else raw
    }

    val payload = rest.headOption match {
      case Some("ping") => "[\"Status\"]"
      case Some("req")  => arg(0)
      case Some("tx")   => s"""[{"Transact":${arg(0)}}]"""
      case Some("gql")  =>
        val ns = rest.drop(1).headOption.getOrElse(sys.error("gql needs a namespace"))
        val q = rest.drop(2).headOption.getOrElse(sys.error("gql needs a document"))
        Wire.renderRequest(Request.Derive(ns, q))
      case other => sys.error(s"unknown command $other (ping | req | tx | gql)")
    }

    val gotOne = new CountDownLatch(1)
    val listener = new WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence,
          last: Boolean): CompletionStage[_] = {
        buf.append(data)
        if (last) { print(buf.toString); buf.clear(); gotOne.countDown() }
        ws.request(1)
        null
      }
    }
    val ws = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://$host:$port/"), listener)
      .get(10, TimeUnit.SECONDS)
    ws.sendText(payload, true).get(10, TimeUnit.SECONDS)
    // Wait briefly for replies (diff batches arrive after an advance).
    gotOne.await(3, TimeUnit.SECONDS)
    Thread.sleep(200)
    ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
  }
}
