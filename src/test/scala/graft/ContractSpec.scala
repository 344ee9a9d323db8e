package graft

/** The driver contract's structural invariants — cheap checks that
  * catch registration mistakes before a whole driver round is spent
  * discovering them. */
class ContractSpec extends GraftSpec {

  test("query names are unique (a duplicate silently drops a query from the map)") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }

  test("every oracle belongs to a registered query") {
    val names = SparkEntry.all.map(_.name).toSet
    val orphaned = SparkEntry.oracleSql.keys.filterNot(names.contains)
    assert(orphaned.isEmpty, s"oracles without queries: ${orphaned.mkString(", ")}")
  }

  test("oracle SQL strings are single statements (no stray semicolons)") {
    // the driver feeds each string to one DuckDB execute(); a trailing
    // or embedded semicolon would break the comparison harness
    val bad = SparkEntry.oracleSql.filter(_._2.contains(";"))
    assert(bad.isEmpty, s"semicolons in: ${bad.keys.mkString(", ")}")
  }
}
