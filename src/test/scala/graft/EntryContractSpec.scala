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

  test("every oracle-carrying query ends in scalar columns only") {
    // The driver's comparator sorts and hashes rows through pandas,
    // which throws `unhashable type: 'numpy.ndarray'` on ARRAY cells —
    // that crash was the ONE untested row of round 9 (s23, since
    // exploded to scalar rows). Pin the invariant so no future query
    // re-trips it: final schemas must be atomic types.
    val spark = SparkFixture.spark
    val offenders = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, SparkFixture.sfDir).schema
      val bad = schema.fields.filterNot(f => f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => false
        case _: org.apache.spark.sql.types.MapType => false
        case _: org.apache.spark.sql.types.StructType => false
        case _ => true
      })
      if (bad.isEmpty) None
      else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"non-scalar final columns crash the driver comparator:\n${offenders.mkString("\n")}")
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
