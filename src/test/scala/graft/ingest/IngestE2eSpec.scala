package graft.ingest

import graft.SparkSpec
import graft.queries.IngestE2e

/** Pins the fixture-determined values of the B3/B18 declared rows —
  * the rows-only driver check sees row counts; this spec gates the
  * CONTENT: per-table loaded/rejected/evolution, swap outcome, audit
  * parity, pushdown plan evidence, catalog lifecycle flags.
  */
class IngestE2eSpec extends SparkSpec {

  test("b3_ingest_e2e: full loop lands both table classes with exact fixture counts") {
    val rows = IngestE2e.ingestE2e.fn(spark, sf()).collect()
    assert(rows.length === 2)
    val dims = rows(0); val metrics = rows(1)
    assert(dims.getString(0) === "dims")
    assert(dims.getLong(1) === 5L, "dims loads 3 (gen1) + 2 (gen2)")
    assert(dims.getLong(2) === 0L)
    assert(dims.getLong(4) === 2L, "full refresh: lake holds ONLY generation 2")
    assert(dims.getBoolean(8), "Derby swap must land generation 2")
    assert(metrics.getString(0) === "metrics")
    assert(metrics.getLong(1) === 12L, "8 deduped (tick1) + 4 (tick2)")
    assert(metrics.getLong(2) === 3L, "2 + 1 malformed lines quarantined")
    assert(metrics.getString(3) === "region", "tick2 manifest adds region")
    assert(metrics.getLong(4) === 12L, "append class accumulates both batches")
    assert(metrics.getBoolean(8))
    // both tables: inputs archived, upload drained
    assert(rows.forall(_.getLong(5) === 2L), "2 csv files archived per table")
    assert(rows.forall(_.getLong(6) === 0L), "no csv left in upload")
  }

  test("b3_jdbc_roundtrip: (n, checksum) parity through live Derby") {
    val r = IngestE2e.jdbcRoundtrip.fn(spark, sf()).head()
    assert(r.getLong(0) > 0 && r.getLong(0) === r.getLong(1))
    assert(r.getBoolean(2) && r.getBoolean(3))
  }

  test("b3_jdbc_pushdown: predicate reaches the JDBC scan, 4-way partitioned read") {
    val r = IngestE2e.jdbcPushdown.fn(spark, sf()).head()
    assert(r.getLong(0) === r.getLong(1), "pushed read returns exactly the expected rows")
    assert(r.getBoolean(2), "both predicates must appear in PushedFilters")
    assert(r.getLong(3) === 4L, "partitionColumn must split the read 4 ways")
  }

  test("b18_catalog_lifecycle: saveAsTable + insertInto + DESCRIBE + SHOW") {
    val r = IngestE2e.catalogLifecycle.fn(spark, sf()).head()
    assert(r.getBoolean(2), "insertInto must append through the catalog")
    assert(r.getBoolean(3), "SHOW TABLES must list the table")
    assert(r.getString(4).contains("nkey:bigint") && r.getString(4).contains("n_name:string"))
  }
}
