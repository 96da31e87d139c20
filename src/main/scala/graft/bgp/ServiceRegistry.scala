package graft.bgp

/** Endpoint registry for SPARQL 1.1 Federated Query (`SERVICE`).
  *
  * A `SERVICE <endpoint> { ... }` block evaluates its patterns against
  * the store registered under that endpoint URI — in-process
  * federation over a second [[TripleStore]] standing in for the remote
  * SPARQL endpoint. This keeps the §2.2 semantics exact (the block
  * plans independently on the federated store, returns LEXICAL
  * bindings like a remote endpoint's SPARQL results would, and
  * natural-joins into the outer solution) while the transport stays
  * behind one seam: `http://`/`https://` endpoints take the REAL
  * SPARQL 1.1 Protocol arm ([[SparqlHttp]] — GET + JSON results +
  * bound-join VALUES injection over the wire) and every other
  * endpoint resolves here. At cluster scale a registered store is
  * itself a full partitioned TripleStore, so an in-process federated
  * block is a distributed subquery, not a driver-side fetch.
  */
object ServiceRegistry {

  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, TripleStore]()

  def register(endpoint: String, store: TripleStore): Unit =
    stores.put(endpoint, store)

  def resolve(endpoint: String): TripleStore =
    Option(stores.get(endpoint)).getOrElse(
      throw new IllegalArgumentException(
        s"no store registered for SERVICE endpoint <$endpoint> — " +
          "call ServiceRegistry.register first"))

  def clear(): Unit = stores.clear()
}
