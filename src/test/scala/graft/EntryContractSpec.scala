package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry: the harness matches
  * oracle SQL to queries BY NAME and hashes columns BY NAME, so a
  * rename that drifts between the two maps silently downgrades a
  * hash-checked query to rows-only (or orphans an oracle). Pin the
  * contract here.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every oracle belongs to a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are the known engine-specific set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "d03_dedup_minhash_lsh", "d04_dedup_simhash",
      "q33_approx_aggs", "s02_knn_lsh", "s03_knn_ivf", "s11_knn_lsh_batch",
      "s12_knn_pq", "s13_knn_ivfpq", "s14_knn_pq_batch",
      "s15_knn_pq_indexed"),
      s"unexpected rows-only queries (add an oracle or update this pin): $rowsOnly")
  }

  test("query names follow the series naming scheme") {
    val bad = SparkEntry.queries.keySet.filterNot(
      _.matches("[dmqst][0-9]{2}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("oracle SQL is non-empty and has no trailing statement separator") {
    // (no blanket ';' scan: semicolons legitimately appear inside
    // string/regex literals, e.g. t02's punctuation class)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.endsWith(";"), s"$name: trailing ';' breaks the driver compare")
    }
  }
}
