package graft.bgp

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** The LISTEN side of the SPARQL 1.1 Protocol — the seam that closes
  * the reference's query-in/results-out service loop (Client.c:7-25,
  * Proxy.c:40-258): `serve` exposes a [[TripleStore]] at an HTTP
  * endpoint speaking exactly the dialect [[SparqlHttp]] consumes, so
  * two graft instances federate with each other over the real
  * transport (SERVICE <http://…> against another engine's endpoint is
  * indistinguishable from SERVICE against this one).
  *
  * Protocol surface (SPARQL 1.1 Protocol §2.1): query via GET
  * `?query=`, via POST `application/x-www-form-urlencoded` (`query=`),
  * or via POST `application/sparql-query` (raw body). Responses are
  * `application/sparql-results+json` with the store's canonical term
  * spellings mapped back to protocol typing — `"lex"^^<dt>` → typed
  * literal, `"lex"@tag` → language-tagged literal, `scheme:local` →
  * uri, `_:x` → bnode, anything else a plain literal — the exact
  * inverse of [[SparqlHttp.parse]]'s canonicalization, so a federated
  * round-trip is lossless.
  *
  * Scale shape: the RESPONSE is the protocol's driver-side
  * materialization point, so it is CAPPED (`maxRows`) — a request
  * whose result exceeds the cap gets a loud 500 rather than an
  * unbounded buffer (the same discipline as the client-side response
  * cap). A federating caller keeps results under the cap the same way
  * any federation client does: by shipping its bindings as a VALUES
  * restriction (SparqlHttp's bound join), which is precisely what the
  * graft client arm sends.
  */
object SparqlServer {

  /** Server-side result cap: past this many rows the request fails
    * loudly instead of buffering an unbounded response.
    */
  val MaxResponseRows = 100000

  /** A running endpoint; `stop()` releases the port. */
  final class Handle private[SparqlServer] (
      server: HttpServer, path: String) {
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://localhost:$port$path"
    def stop(): Unit = server.stop(0)
  }

  private val typedRe = "(?s)^\"(.*)\"\\^\\^<([^<>]*)>$".r
  private val langRe = "(?s)^\"(.*)\"@([A-Za-z0-9-]+)$".r
  private val iriRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*$"

  /** One protocol binding object for a stored-form value (inverse of
    * SparqlHttp.parse's canonical spellings).
    */
  private def bindingJson(
      om: com.fasterxml.jackson.databind.ObjectMapper,
      v: String): com.fasterxml.jackson.databind.node.ObjectNode = {
    val o = om.createObjectNode()
    v match {
      case typedRe(lex, dt) =>
        o.put("type", "literal"); o.put("datatype", dt); o.put("value", lex)
      case langRe(lex, tag) =>
        o.put("type", "literal"); o.put("xml:lang", tag); o.put("value", lex)
      case b if b.startsWith("_:") =>
        o.put("type", "bnode"); o.put("value", b.drop(2))
      case u if u.matches(iriRe) =>
        o.put("type", "uri"); o.put("value", u)
      case lit =>
        o.put("type", "literal"); o.put("value", lit)
    }
    o
  }

  /** Evaluate one protocol request's query text against the store and
    * render `application/sparql-results+json`. Package-visible for
    * direct unit testing of the render path.
    */
  private[graft] def answer(store: TripleStore, query: String,
      maxRows: Int): String = {
    val df = BgpPlanner.query(store, query)
    val vars = df.columns.toSeq
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length > maxRows) throw new IllegalStateException(
      s"result exceeds the $maxRows-row response cap — restrict the " +
        "query (federating clients ship their bindings as VALUES)")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val head = root.putObject("head")
    val varArr = head.putArray("vars")
    vars.foreach(varArr.add)
    val bindings = root.putObject("results").putArray("bindings")
    rows.foreach { r =>
      val b = om.createObjectNode()
      vars.zipWithIndex.foreach { case (v, i) =>
        if (!r.isNullAt(i)) b.set[com.fasterxml.jackson.databind.JsonNode](
          v, bindingJson(om, String.valueOf(r.get(i))))
      }
      bindings.add(b)
    }
    om.writeValueAsString(root)
  }

  /** Pull the query text out of a protocol request (§2.1.1-2.1.3). */
  private def queryOf(ex: HttpExchange): String = {
    def fromForm(s: String): String = {
      val enc = s.split('&').iterator.map(_.split("=", 2))
        .collectFirst { case Array("query", v) => v }
        .getOrElse(throw new IllegalArgumentException(
          "missing query= parameter"))
      java.net.URLDecoder.decode(enc, "UTF-8")
    }
    ex.getRequestMethod match {
      case "GET" => fromForm(Option(ex.getRequestURI.getRawQuery)
        .getOrElse(throw new IllegalArgumentException("missing query string")))
      case "POST" =>
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val ct = Option(ex.getRequestHeaders.getFirst("Content-Type"))
          .getOrElse("")
        if (ct.startsWith("application/sparql-query")) body
        else fromForm(body)
      case m => throw new IllegalArgumentException(s"unsupported method $m")
    }
  }

  /** Start serving `store` at `http://localhost:<port><path>`; port 0
    * picks an ephemeral port. The handler evaluates each request on
    * the store's own SparkSession (protocol requests are the
    * coordinator loop, not executor work).
    */
  def serve(store: TripleStore, port: Int = 0, path: String = "/sparql",
      maxRows: Int = MaxResponseRows): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(path, new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val (code, body, ctype) =
          try {
            val q = queryOf(ex)
            (200, answer(store, q, maxRows),
              "application/sparql-results+json")
          } catch {
            case e: IllegalArgumentException =>
              (400, s"bad request: ${e.getMessage}", "text/plain")
            case scala.util.control.NonFatal(e) =>
              (500, s"query failed: ${e.getMessage}", "text/plain")
          }
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", ctype)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    new Handle(server, path)
  }
}
