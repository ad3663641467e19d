package graft.engine

/** Tiny build-time provenance registry: named facts a query's BUILD
  * phase measured about its own data — e.g. how many degenerate hot
  * bands `mm_phash_dup` dropped from candidate generation (round-16
  * advice: a recall-affecting cap must surface how often it fired, not
  * just that it exists). Facts are recorded at query-construction time
  * and read by specs/audits; they are never part of a result schema,
  * so the DuckDB oracles are untouched.
  *
  * Driver-side only by construction (query builders run on the
  * driver); last write per (query, fact) wins, which is the right
  * semantics for "the most recent build of this query". */
object Provenance {
  private val facts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()
  private val lazyFacts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), () => Long]()

  def record(query: String, fact: String, value: Long): Unit =
    facts.put((query, fact), value)

  /** Deferred fact: the thunk runs when a reader first asks (then the
    * value is memoized via [[record]]). For facts whose measurement is
    * itself a (bounded) Spark job — e.g. mm_phash_dup's hot-band count
    * is a domain-bounded aggregate over the corpus: recording it
    * eagerly made merely CONSTRUCTING the query run a job (round-19
    * fix; plan-only consumers like explain() paid a corpus scan). The
    * job now runs only for consumers that actually read the fact
    * (specs/audits), never for plan inspection. */
  def recordLazy(query: String, fact: String, value: () => Long): Unit = {
    facts.remove((query, fact)) // a later build supersedes an old value
    lazyFacts.put((query, fact), value)
  }

  def get(query: String, fact: String): Option[Long] =
    Option(facts.get((query, fact))).orElse {
      Option(lazyFacts.remove((query, fact))).map { thunk =>
        val v = thunk()
        facts.put((query, fact), v)
        v
      }
    }
}
