package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-7 statistics / IR wave: BM25 relevance scoring, Kaplan–Meier
  * survival, a two-proportion A/B z-test, mutual information, and
  * association rules — the analytics surface between plain aggregation
  * and ML that a warehouse engine is expected to cover.
  *
  * Determinism discipline (the memory rules): every count is an exact
  * BIGINT; floats appear only in FINAL formulas whose operation order
  * is mirrored token-for-token in the oracle SQL; ln/exp 1-ulp drift is
  * absorbed by round(…, 6) at ≤1e3 magnitudes; row membership is always
  * decided by integer/string comparisons, never by a float threshold.
  */
object StatsExt {

  /** Okapi BM25 (k1=1.2, b=0.75) of three fixed probe terms over the
    * document corpus — one (doc, term) row per hit in the doc_id ≤ 50
    * window. Scale shape: one tokenize pass; tf/df/doclen are
    * partial-aggregable; the corpus aggregate (N, Σdl) is a broadcast
    * 1-row cross (text_tfidf precedent). No per-term scan: terms are
    * filtered during the single explode.
    */
  val textBm25: Q = Q(
    "text_bm25",
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |doclen AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tok),
      |corp AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                CAST(sum(dl) AS BIGINT) AS sdl FROM doclen),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(w) AS term FROM tok) t
      |  WHERE term IN ('join', 'vector', 'scan') GROUP BY 1, 2),
      |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id, tf.term, tf.tf,
      |       round(ln(1 + (n - df + 0.5) / (df + 0.5))
      |             * (tf * 2.2)
      |             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
      |                            / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))),
      |             6) AS bm25
      |FROM tf JOIN dft USING (term) JOIN doclen USING (doc_id) CROSS JOIN corp
      |WHERE tf.doc_id <= 50
      |ORDER BY doc_id, term""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val toks = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val doclen = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val glob = doclen.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val tf = toks.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin("join", "vector", "scan"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dft, "term").join(doclen, "doc_id").crossJoin(broadcast(glob))
      .filter(col("doc_id") <= 50)
      .select(col("doc_id"), col("term"), col("tf"),
        round(log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl").cast("double")
            / (col("sdl").cast("double") / col("n").cast("double")))),
          6).as("bm25"))
      .orderBy(col("doc_id").asc_nulls_first, col("term").asc_nulls_first)
  }

  /** Kaplan–Meier estimate of "time to first reorder": per customer the
    * event is the second order (t = days from first to second order);
    * customers who never reorder are right-censored at the corpus'
    * latest order date. S(t) = Π(1 − dᵢ/nᵢ) computed as exp(Σ ln·) over
    * the event-time table — after grouping to distinct t that table is
    * bounded by the day-grain corpus span (~2.5k rows at ANY corpus
    * size), so the two unpartitioned windows run over a bounded
    * aggregate, not the fact table (the dq_freshness posture). The
    * ln(0) edge (d = n at the last event time) is floored at 1e-300 on
    * BOTH engines: Spark's log returns NULL at 0 while DuckDB returns
    * −inf — the floor makes both produce exp(−690) → 0.0 at 6 dp.
    */
  val survivalKm: Q = Q(
    "survival_km",
    """WITH o AS (SELECT o_custkey, o_orderdate FROM orders),
      |firsts AS (SELECT o_custkey, min(o_orderdate) AS d1 FROM o GROUP BY 1),
      |seconds AS (
      |  SELECT o.o_custkey, min(o.o_orderdate) AS d2
      |  FROM o JOIN firsts f USING (o_custkey)
      |  WHERE o.o_orderdate > f.d1 GROUP BY 1),
      |maxd AS (SELECT max(o_orderdate) AS dmax FROM o),
      |subj AS (
      |  SELECT CAST(CASE WHEN s.d2 IS NULL THEN date_diff('day', f.d1, dmax)
      |              ELSE date_diff('day', f.d1, s.d2) END AS BIGINT) AS t,
      |         CASE WHEN s.d2 IS NULL THEN 0 ELSE 1 END AS ev
      |  FROM firsts f LEFT JOIN seconds s USING (o_custkey) CROSS JOIN maxd),
      |km AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS m, CAST(sum(ev) AS BIGINT) AS d
      |  FROM subj GROUP BY 1),
      |risk AS (
      |  SELECT t, d, CAST(sum(m) OVER (ORDER BY t DESC) AS BIGINT) AS n FROM km)
      |SELECT t, d, n,
      |       round(exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE),
      |                                 1e-300))) OVER (ORDER BY t ASC)), 6) AS s_km
      |FROM risk WHERE d > 0 ORDER BY t""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d).select(col("o_custkey"), col("o_orderdate"))
    val firsts = o.groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("d1"))
    val seconds = o.join(firsts, Seq("o_custkey"))
      .filter(col("o_orderdate") > col("d1"))
      .groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("d2"))
    val maxd = o.agg(max(col("o_orderdate")).as("dmax"))
    val subj = firsts.join(seconds, Seq("o_custkey"), "left")
      .crossJoin(broadcast(maxd))
      .select(
        when(col("d2").isNull, datediff(col("dmax"), col("d1")))
          .otherwise(datediff(col("d2"), col("d1"))).cast("long").as("t"),
        when(col("d2").isNull, lit(0L)).otherwise(lit(1L)).as("ev"))
    val km = subj.groupBy(col("t"))
      .agg(count(lit(1)).as("m"), sum(col("ev")).as("d"))
    val risk = km.withColumn("n",
      sum(col("m")).over(Window.orderBy(col("t").desc)))
    risk.filter(col("d") > 0)
      .withColumn("s_km", round(exp(sum(
        log(greatest(lit(1.0) - col("d").cast("double") / col("n").cast("double"),
          lit(1e-300)))).over(Window.orderBy(col("t").asc))), 6))
      .select(col("t"), col("d"), col("n"), col("s_km"))
      .orderBy(col("t").asc_nulls_first)
  }

  /** Two-proportion z-test: purchase conversion per (user, day)
    * session unit, split by user_id parity — the A/B readout. The unit
    * must be finer than the user: every user in the corpus eventually
    * purchases (p = 1.0 both arms → pooled variance exactly 0 → ANSI
    * divide-by-zero), while user-day conversion sits near 0.40 at every
    * SF. Counts are exact per-unit maxima rolled into two group rows;
    * the z statistic is ONE float formula over four exact integers.
    * Fully partial-aggregable; the pivot runs over a 2-row aggregate.
    */
  val abTestZ: Q = Q(
    "ab_test_z",
    """WITH u AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT user_id % 2 AS grp, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(conv) AS BIGINT) AS x
      |  FROM u GROUP BY 1),
      |w AS (
      |  SELECT max(CASE WHEN grp = 0 THEN n END) AS n0,
      |         max(CASE WHEN grp = 0 THEN x END) AS x0,
      |         max(CASE WHEN grp = 1 THEN n END) AS n1,
      |         max(CASE WHEN grp = 1 THEN x END) AS x1
      |  FROM g)
      |SELECT n0, x0, n1, x1,
      |  round(CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS p0,
      |  round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
      |  round((CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |         - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |        / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |               * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |               * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))),
      |        6) AS z
      |FROM w""".stripMargin
  ) { (s, d) =>
    val u = T.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      .groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(max(when(col("event_type") === "purchase", lit(1)).otherwise(lit(0)))
        .as("conv"))
    val g = u.groupBy((col("user_id") % 2).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("x"))
    val w = g.agg(
      max(when(col("grp") === 0, col("n"))).as("n0"),
      max(when(col("grp") === 0, col("x"))).as("x0"),
      max(when(col("grp") === 1, col("n"))).as("n1"),
      max(when(col("grp") === 1, col("x"))).as("x1"))
    def dbl(c: String) = col(c).cast("double")
    val pp = (col("x0") + col("x1")).cast("double") / (col("n0") + col("n1")).cast("double")
    w.select(col("n0"), col("x0"), col("n1"), col("x1"),
      round(dbl("x0") / dbl("n0"), 6).as("p0"),
      round(dbl("x1") / dbl("n1"), 6).as("p1"),
      round((dbl("x0") / dbl("n0") - dbl("x1") / dbl("n1"))
        / sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / dbl("n0") + lit(1.0) / dbl("n1"))),
        6).as("z"))
  }

  /** Mutual information between customer market segment and order
    * priority: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the ≤ 5×5 cell
    * table. Every count is exact; the 25-term float sum carries ~1e-16
    * accumulation-order noise against a round at 1e-6 — three orders of
    * magnitude of headroom. The corpus total is a broadcast 1-row
    * cross; long products (nxy·n, nx·ny) are cast to DOUBLE before the
    * divide (headroom: exact up to 2⁵³, i.e. ~9e15-row joins).
    */
  val mutualInfo: Q = Q(
    "mutual_info",
    """WITH j AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
      |xy AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS nxy FROM j GROUP BY 1, 2),
      |x AS (SELECT seg, CAST(count(*) AS BIGINT) AS nx FROM j GROUP BY 1),
      |y AS (SELECT pri, CAST(count(*) AS BIGINT) AS ny FROM j GROUP BY 1)
      |SELECT n,
      |  round(sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
      |            * ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
      |                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 6) AS mi
      |FROM xy JOIN x USING (seg) JOIN y USING (pri) CROSS JOIN tot
      |GROUP BY n""".stripMargin
  ) { (s, d) =>
    val j = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderpriority").as("pri")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("pri"))
    val tot = j.agg(count(lit(1)).as("n"))
    val xy = j.groupBy(col("seg"), col("pri")).agg(count(lit(1)).as("nxy"))
    val x = j.groupBy(col("seg")).agg(count(lit(1)).as("nx"))
    val y = j.groupBy(col("pri")).agg(count(lit(1)).as("ny"))
    xy.join(x, "seg").join(y, "pri").crossJoin(broadcast(tot))
      .groupBy(col("n"))
      .agg(round(sum((col("nxy").cast("double") / col("n").cast("double"))
        * log((col("nxy").cast("double") * col("n").cast("double"))
          / (col("nx").cast("double") * col("ny").cast("double")))), 6).as("mi"))
      .select(col("n"), col("mi"))
  }

  /** Association rules over order baskets: brand pairs with ≥1% order
    * support, with confidence P(b|a) and lift P(ab)/(P(a)P(b)). The
    * pair table reuses basket_brand_pairs' one-scan set expansion (the
    * oracle states the classic self-join); supports are exact distinct
    * counts; membership is the INTEGER comparison 100·n_ab ≥ N — never
    * a float cut. The basket-set frame is cached across its three
    * consumers (pairs, per-brand supports, total) so the lineitem scan
    * runs once.
    */
  val assocRules: Q = Q(
    "assoc_rules",
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |nb AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_brand FROM ob GROUP BY 1),
      |tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob),
      |pairs AS (
      |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |         CAST(count(*) AS BIGINT) AS n_ab
      |  FROM ob a JOIN ob b
      |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_ab,
      |  round(CAST(n_ab AS DOUBLE) / CAST(na.n_brand AS DOUBLE), 6) AS confidence,
      |  round(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
      |        / (CAST(na.n_brand AS DOUBLE) * CAST(nbb.n_brand AS DOUBLE)), 6) AS lift
      |FROM pairs
      |JOIN nb na ON brand_a = na.p_brand
      |JOIN nb nbb ON brand_b = nbb.p_brand
      |CROSS JOIN tot
      |WHERE 100 * n_ab >= n_orders
      |ORDER BY brand_a, brand_b""".stripMargin
  ) { (s, d) =>
    val ob = T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      .join(T.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    val sets = ob.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .cache()
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
          |  transform(slice(bs, i + 2, size(bs)),
          |            y -> struct(x AS brand_a, y AS brand_b))))""".stripMargin))
        .as("pr"))
      .select(col("pr.brand_a").as("brand_a"), col("pr.brand_b").as("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    val nb = sets.select(explode(col("bs")).as("p_brand"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_brand"))
    val tot = sets.agg(count(lit(1)).as("n_orders"))
    pairs
      .join(nb.select(col("p_brand").as("ba"), col("n_brand").as("na_")),
        col("brand_a") === col("ba"))
      .join(nb.select(col("p_brand").as("bb"), col("n_brand").as("nb_")),
        col("brand_b") === col("bb"))
      .crossJoin(broadcast(tot))
      .filter(lit(100) * col("n_ab") >= col("n_orders"))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        round(col("n_ab").cast("double") / col("na_").cast("double"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders").cast("double")
          / (col("na_").cast("double") * col("nb_").cast("double")), 6).as("lift"))
      .orderBy(col("brand_a").asc_nulls_first, col("brand_b").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(textBm25, survivalKm, abTestZ, mutualInfo, assocRules)
}
