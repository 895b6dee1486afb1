package graft

/** The driver's contract surface: entry() must return rows, every query
  * must have oracle SQL or be consciously rows-only (none are, as of
  * round 2), and the catalog keys must be consistent across both maps.
  * entry() runs only when the driver's testdata is present.
  */
class SparkEntrySpec extends SparkSpecBase {

  test("every catalog query has oracle SQL (no rows-only checks left)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
  }

  test("entry() returns rows on the smoke corpus") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
