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

  def record(query: String, fact: String, value: Long): Unit =
    facts.put((query, fact), value)

  def get(query: String, fact: String): Option[Long] =
    Option(facts.get((query, fact)))
}
