package graft

import graft.queries.IngestExtra

/** Pins for the round-9 ninth wave. */
class IngestExtraSpec extends SparkSpec {

  test("b25_charset_ingest: latin-1+gzip decodes byte-identical to UTF-8, accents intact") {
    val row = IngestExtra.charsetIngest.fn(spark, sf()).collect().head
    assert(row.getLong(0) == 4L && row.getLong(1) == 4L)
    assert(row.getBoolean(2), "latin-1 gz decode must equal the UTF-8 read")
    assert(row.getBoolean(3), "non-ASCII chars must survive the round trip")
  }

  test("ts_spectral_peak: shares sum to 1 and the daily rhythm is visible") {
    val rows = IngestExtra.tsSpectralPeak.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(6L, 12L, 24L, 168L))
    assert(math.abs(rows.values.sum - 1.0) < 1e-4)
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
  }
}
