package graft.server

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CompletionStage, CountDownLatch, TimeUnit}

import graft.model.{Rule, Value}

/** Command-line client for [[WsServer]] — mirror of the reference CLI
  * (`cli/src/main.rs:20-180`, subcommand surface `cli/src/cli.yml`):
  *
  * {{{
  *   runMain graft.server.Cli [--host H] [--port P] ping
  *   runMain graft.server.Cli req  '<json request or [requests]>'
  *   runMain graft.server.Cli req  @requests.json   |  req -   (stdin)
  *   runMain graft.server.Cli tx   '<tx data json>' |  tx @changes.json
  *   runMain graft.server.Cli gql  [--granularity N] '<graphql document>'
  *   runMain graft.server.Cli derive <namespace> '<graphql document>'
  * }}}
  *
  * `ping` sends `Status` and prints the reply; `req` sends raw requests
  * (argument, `@file`, or stdin — the reference reads stdin when the
  * positional is absent); `tx` wraps tx data in `Transact`; `gql`
  * registers the query as a GraphQl rule and subscribes with an
  * `AssocIn` sink exactly like the reference (`cli/src/main.rs:103-145`
  * — `--granularity` maps to the sink's `stateful` knob), printing each
  * document as `diff@t` + pretty JSON; `derive` rides the server-side
  * `Request::Derive` route instead. One-shot commands (`ping`, `req`,
  * `tx`) close after the first reply window; `gql`/`derive` keep
  * listening until interrupted, the reference's consumer behavior. */
object Cli {

  def main(args: Array[String]): Unit = run(args, println)

  private def stdinAll(): String = {
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    var n = System.in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = System.in.read(buf) }
    out.toString("UTF-8")
  }

  /** Render a server message the way the reference CLI logs it: sink
    * documents as `diff@t` + pretty JSON, errors loudly, raw otherwise. */
  private[server] def pretty(msg: String): String =
    try Wire.parseOutput(msg) match {
      case Output.Json(_, json, t, diff) =>
        s"$diff@$t\n${prettyJson(json)}"
      case Output.Error(_, category, message, txId) =>
        s"ERROR $category @ $txId: $message"
      case Output.QueryDiff(name, batch) =>
        batch.map { case (tuple, t, w) =>
          val sign = if (w >= 0) s"+$w" else w.toString
          s"$sign@$t $name ${tuple.map(renderCell).mkString("[", ", ", "]")}"
        }.mkString("\n")
      case Output.Message(_, json) => prettyJson(json)
    } catch { case scala.util.control.NonFatal(_) => msg }

  private def renderCell(v: Value): String = v.native match {
    case s: String => s""""$s""""
    case other     => String.valueOf(other)
  }

  /** Minimal pretty-printer over [[Wire]]'s JSON AST. */
  private def prettyJson(json: String): String = {
    def go(j: Wire.J, indent: String): String = j match {
      case Wire.J.JObj(fields) if fields.nonEmpty =>
        val in = indent + "  "
        fields.map { case (k, v) => s"""$in"$k": ${go(v, in)}""" }
          .mkString("{\n", ",\n", s"\n$indent}")
      case Wire.J.JArr(items) if items.nonEmpty =>
        val in = indent + "  "
        items.map(v => s"$in${go(v, in)}").mkString("[\n", ",\n", s"\n$indent]")
      case other => Wire.renderJson(other)
    }
    try go(Wire.parseJson(json), "")
    catch { case scala.util.control.NonFatal(_) => json }
  }

  /** `main` with an injectable message consumer (tests collect output
    * delivered on the WebSocket callback thread) — one-shot commands
    * return after the first reply window; streaming commands run until
    * `maxMessages` messages arrived (Int.MaxValue = forever). */
  def run(args: Array[String], print: String => Unit,
      maxMessages: Int = Int.MaxValue): Unit = {
    var host = "127.0.0.1"
    var port = 6262
    var granularity: Option[Int] = None
    var rest = args.toList
    var done = false
    while (!done) rest match {
      case "--host" :: h :: tl        => host = h; rest = tl
      case "--port" :: p :: tl        => port = p.toInt; rest = tl
      case "--granularity" :: g :: tl => granularity = Some(g.toInt); rest = tl
      case _                          => done = true
    }

    def arg(i: Int): String =
      rest.drop(i + 1).headOption match {
        case None | Some("-") => stdinAll() // reference: stdin fallback
        case Some(raw) if raw.startsWith("@") =>
          Files.readString(Paths.get(raw.drop(1)))
        case Some(raw) => raw
      }

    var streaming = false
    val payload = rest.headOption match {
      case Some("ping") => "[\"Status\"]"
      case Some("req")  => arg(0)
      case Some("tx")   => s"""[{"Transact":${arg(0)}}]"""
      case Some("gql") =>
        // The reference registers the document as a GraphQl rule under a
        // fresh name and subscribes with an AssocIn sink
        // (`cli/src/main.rs:103-145`).
        streaming = true
        val q = arg(0)
        val name = java.util.UUID.randomUUID().toString
        val reg = Wire.renderRequest(
          Request.Register(Seq(Rule(name, graft.plans.GraphQl.plan(q))), Seq(name)))
        val interest = Wire.renderRequest(Request.Interest(
          name, granularity = None,
          sink = Some(Request.SinkSpec.AssocIn(granularity))))
        s"[$reg,$interest]"
      case Some("derive") =>
        streaming = true
        val ns = rest.drop(1).headOption.getOrElse(sys.error("derive needs a namespace"))
        val q = rest.drop(2).headOption.getOrElse(sys.error("derive needs a document"))
        Wire.renderRequest(Request.Derive(ns, q))
      case other => sys.error(s"unknown command $other (ping | req | tx | gql | derive)")
    }

    val remaining = new java.util.concurrent.atomic.AtomicInteger(maxMessages)
    val finished = new CountDownLatch(1)
    val gotOne = new CountDownLatch(1)
    val listener = new WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence,
          last: Boolean): CompletionStage[_] = {
        buf.append(data)
        if (last) {
          print(pretty(buf.toString)); buf.clear()
          gotOne.countDown()
          if (remaining.decrementAndGet() <= 0) finished.countDown()
        }
        ws.request(1)
        null
      }
    }
    val ws = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://$host:$port/"), listener)
      .get(10, TimeUnit.SECONDS)
    ws.sendText(payload, true).get(10, TimeUnit.SECONDS)
    if (streaming && maxMessages == Int.MaxValue) {
      finished.await() // consumer mode: listen until interrupted
    } else if (streaming) {
      finished.await(30, TimeUnit.SECONDS)
    } else {
      // One-shot: wait briefly for replies (diff batches arrive after an
      // advance), then close.
      gotOne.await(3, TimeUnit.SECONDS)
      Thread.sleep(200)
    }
    try ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    catch { case scala.util.control.NonFatal(_) => () }
  }
}
