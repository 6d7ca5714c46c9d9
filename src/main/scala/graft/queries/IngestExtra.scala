package graft.queries

import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables => T}

/** Round-9 ninth wave: legacy-encoding + gzip CSV ingest (the
  * warehouse importer's messy-reality surface) and spectral period
  * detection on the event series.
  */
object IngestExtra {

  private def dbl(c: Column): Column = c.cast("double")

  /** B25: LEGACY-CHARSET + GZIP CSV INGEST — real import feeds arrive
    * as gzipped ISO-8859-1 dumps, not clean UTF-8: the row writes the
    * SAME rows as (a) plain UTF-8 CSV and (b) gzipped ISO-8859-1 CSV
    * (accented names, semicolon sep), reads both back with the right
    * `encoding` option, and asserts byte-identical decoded content and
    * intact non-ASCII characters. Gzip is splittable-never — one task
    * per .gz file regardless of size — so the Scaladoc's 100 TB note:
    * repack to a splittable codec (or many files) at the lake
    * boundary, which is exactly what the compaction row (b5) does.
    */
  val charsetIngest: Q = Q.noOracle("b25_charset_ingest") { (s, d) =>
    val run = java.nio.file.Files.createTempDirectory("graft_b25")
    // every non-ASCII char here MUST exist in ISO-8859-1 (ö ü ñ ç à é å)
    // — chars outside latin-1 would be '?'-substituted at write time and
    // the equality check would fail by construction
    val rows = Seq(
      ("Skänska Müller", 123.45), ("Señor Araçà", 67.89),
      ("Ålesund Büré", 0.5), ("plain ascii", 9.99))
    val csv = rows.map { case (n, v) => s"$n;$v" }.mkString("\n")
    // (a) plain UTF-8
    val utf8Dir = run.resolve("utf8"); java.nio.file.Files.createDirectories(utf8Dir)
    java.nio.file.Files.write(utf8Dir.resolve("part.csv"),
      csv.getBytes(StandardCharsets.UTF_8))
    // (b) gzipped ISO-8859-1 (all chars above exist in latin-1)
    val gzDir = run.resolve("latin1gz"); java.nio.file.Files.createDirectories(gzDir)
    val gz = new GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gzDir.resolve("part.csv.gz")))
    gz.write(csv.getBytes(StandardCharsets.ISO_8859_1)); gz.close()
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("v", DoubleType)))
    def rd(dir: java.nio.file.Path, enc: String) =
      s.read.schema(schema).option("sep", ";").option("encoding", enc)
        .csv(dir.toString).select(col("name"), col("v"))
    val a = rd(utf8Dir, "UTF-8").collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val b = rd(gzDir, "ISO-8859-1").collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val accentsOk = b.exists(_._1.contains("ü")) && b.exists(_._1.contains("ñ"))
    val row = (a.length.toLong, b.length.toLong, (a.toSeq == b.toSeq), accentsOk)
    s.createDataFrame(Seq(row)).toDF("n_utf8", "n_latin1_gz", "decoded_equal", "accents_ok")
  }

  /** Spectral period detection on the hourly event-count series:
    * single-frequency DFT power at candidate periods {6, 12, 24,
    * 168 h} of the MEAN-REMOVED series — "which rhythm dominates?",
    * quantifying what ts_seasonal_hour eyeballs. Each term is
    * y_t·cos/sin(2π·t/T) over the CALENDAR-BOUNDED hourly aggregate;
    * trig of identical double arguments differs ≤ 1 ulp cross-engine
    * and the bounded sums round at 6 dp on the POWER-SHARE ratio
    * (never the raw power); output ordered by period, not by power,
    * so a near-tie cannot flip row order. Scale: the hourly aggregate
    * is one partial-aggregable pass; the DFT runs over
    * |hours|·|periods| bounded rows.
    */
  val tsSpectralPeak: Q = Q(
    "ts_spectral_peak",
    """WITH h AS (
      |  SELECT CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS hx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |t0 AS (SELECT CAST(min(hx) AS BIGINT) AS h0,
      |              CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
      |       FROM h),
      |per AS (SELECT CAST(unnest([6, 12, 24, 168]) AS BIGINT) AS period),
      |term AS (
      |  SELECT period,
      |         (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |           * cos(2.0 * pi() * CAST(hx - h0 AS DOUBLE) / CAST(period AS DOUBLE)) AS c,
      |         (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |           * sin(2.0 * pi() * CAST(hx - h0 AS DOUBLE) / CAST(period AS DOUBLE)) AS s
      |  FROM h CROSS JOIN per CROSS JOIN t0),
      |pw AS (
      |  SELECT period, sum(c) * sum(c) + sum(s) * sum(s) AS power
      |  FROM term GROUP BY 1),
      |tot AS (SELECT CAST(sum(power) AS DOUBLE) AS ptot FROM pw)
      |SELECT period, round(power / ptot, 6) AS power_share
      |FROM pw CROSS JOIN tot ORDER BY period""".stripMargin
  ) { (s, d) =>
    val h = T.events(s, d)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hx"))
      .groupBy(col("hx")).agg(count(lit(1)).as("y"))
    val t0 = h.agg(min(col("hx")).as("h0"), count(lit(1)).as("n"),
      sum(col("y")).cast("long").as("sy"))
    val per = s.range(0, 4).select(
      element_at(array(lit(6L), lit(12L), lit(24L), lit(168L)), (col("id") + 1).cast("int"))
        .as("period"))
    val yc = dbl(col("y")) - dbl(col("sy")) / dbl(col("n"))
    val ang = lit(2.0) * lit(math.Pi) * dbl(col("hx") - col("h0")) / dbl(col("period"))
    val term = h.crossJoin(broadcast(per)).crossJoin(broadcast(t0))
      .select(col("period"), (yc * cos(ang)).as("c"), (yc * sin(ang)).as("s"))
    val pw = term.groupBy(col("period"))
      .agg((sum(col("c")) * sum(col("c")) + sum(col("s")) * sum(col("s"))).as("power"))
    val tot = pw.agg(sum(col("power")).cast("double").as("ptot"))
    pw.crossJoin(broadcast(tot))
      .select(col("period"), round(col("power") / col("ptot"), 6).as("power_share"))
      .orderBy(col("period"))
  }

  val all: Seq[Q] = Seq(charsetIngest, tsSpectralPeak)
}
