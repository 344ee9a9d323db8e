package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 session-4 additions: measurement-reliability panel
  * (Cronbach's alpha, one-way ICC + survey design effect, Kendall's W
  * concordance, Gwet's AC1), variance-homogeneity (Bartlett), and the
  * sequential/fold, corpus-richness, and graph batches that follow —
  * each with an exact DuckDB oracle on the repo's integer-grid
  * determinism discipline (milli-quantized value digests, 1e-9
  * quantized log terms summed as DECIMAL, round-6 final doubles,
  * identical double expression trees on both engines).
  *
  * Reference scope: the reference app (reference `app.py:139-200`)
  * reports correlation/describe analytics over sensor channels; this
  * block extends that surface with the reliability/QA statistics a
  * multi-sensor (multi-rater) pipeline publishes about its own
  * channels, all driver-graded.
  */
object R12Queries {

  val defs: Seq[QueryDef] = Seq(

    // Bartlett's test (Bartlett 1937) for variance homogeneity across
    // the 5 event_type channels. One shuffle to a 5-row digest of
    // exact milli-int (n, Σv, Σv²); each group's ln s² is quantized to
    // the 1e-9 grid BEFORE the exact DECIMAL sum (the repo's
    // transcendental-parity rule), so both engines add identical
    // terms. The C correction factor is pure digest algebra. At 100 TB
    // this is one map-side-combined pass to 5 rows.
    QueryDef("q_bartlett_test",
      (s, d) => {
        val g = graft.sources.Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 1000).cast("long").as("vm"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"),
            sum(col("vm") * col("vm")).as("qv"))
        // cross-group sums are order-dependent in double: quantize each
        // group's term and sum as exact DECIMAL (repo rule)
        g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
            sum(round(col("qv").cast("double") -
              col("sv").cast("double") * col("sv").cast("double") /
                col("n").cast("double"), 4).cast("decimal(38,4)")).as("ssw"),
            // decimal(20,9) × decimal(10,0) → decimal(31,9): sized so
            // Spark does NOT hit precision-38 overflow (which silently
            // truncates the product's scale to 6)
            sum(round(log((col("qv").cast("double") -
                col("sv").cast("double") * col("sv").cast("double") /
                  col("n").cast("double")) /
              (col("n") - 1).cast("double")), 9)
              .cast("decimal(20,9)") *
              (col("n") - 1).cast("decimal(10,0)")).as("slns"),
            sum(round(lit(1.0) / (col("n") - 1).cast("double"), 12)
              .cast("decimal(38,12)")).as("sinv"))
          .select(col("k"), col("nt").as("n_total"),
            round({
              val dfw = (col("nt") - col("k")).cast("double")
              // ln quantized to the 1e-9 grid: JVM Math.log and libm
              // can differ in the last ulp, and ×dfw amplifies it onto
              // a 6dp rounding knife-edge
              val lnsp = round(log(col("ssw").cast("double") / dfw), 9)
              val c = lit(1.0) +
                (col("sinv").cast("double") - lit(1.0) / dfw) /
                  (lit(3.0) * (col("k") - 1).cast("double"))
              (dfw * lnsp - col("slns").cast("double")) / c
            }, 6).as("bartlett_stat"),
            (col("k") - 1).cast("long").as("df"))
      },
      Some("""WITH g AS (SELECT event_type, count(*)::BIGINT AS n,
             |    sum(floor(value * 1000)::BIGINT)::BIGINT AS sv,
             |    sum(floor(value * 1000)::BIGINT
             |        * floor(value * 1000)::BIGINT)::BIGINT AS qv
             |  FROM events GROUP BY 1),
             |a AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nt,
             |    sum(round(qv::DOUBLE - sv::DOUBLE * sv::DOUBLE
             |        / n::DOUBLE, 4)::DECIMAL(38,4)) AS ssw,
             |    sum(round(ln((qv::DOUBLE - sv::DOUBLE * sv::DOUBLE
             |          / n::DOUBLE) / (n - 1)::DOUBLE), 9)::DECIMAL(38,9)
             |        * (n - 1)) AS slns,
             |    sum(round(1.0 / (n - 1)::DOUBLE, 12)::DECIMAL(38,12))
             |      AS sinv
             |  FROM g)
             |SELECT k, nt AS n_total,
             |  round(((nt - k)::DOUBLE
             |      * round(ln(ssw::DOUBLE / (nt - k)::DOUBLE), 9)
             |      - slns::DOUBLE)
             |    / (1.0 + (sinv::DOUBLE - 1.0 / (nt - k)::DOUBLE)
             |        / (3.0 * (k - 1)::DOUBLE)), 6) AS bartlett_stat,
             |  (k - 1)::BIGINT AS df
             |FROM a""".stripMargin)),

    // Cronbach's alpha (Cronbach 1951): internal consistency of the 5
    // event_type channels as "items" scored per user (summed milli
    // value, zero-filled — a user with no 'error' events scores 0 on
    // the error item). All variances come from exact integer digests:
    // the per-item Σx/Σx² pass and the per-user total pass are two
    // map-side-combined shuffles on low-cardinality keys; nothing
    // data-sized crosses the wire. Zero-fill is free in the digests —
    // zeros add nothing to Σx or Σx², only n (the distinct-user count)
    // matters.
    QueryDef("q_cronbach_alpha",
      (s, d) => {
        val e = graft.sources.Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            floor(col("value") * 1000).cast("long").as("vm"))
        val ui = e.groupBy(col("user_id"), col("event_type"))
          .agg(sum(col("vm")).as("x"))
        val items = ui.groupBy(col("event_type"))
          .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("qx"))
        val users = ui.groupBy(col("user_id")).agg(sum(col("x")).as("t"))
        val tot = users.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
          sum(col("t").cast("decimal(38,0)") * col("t")).as("qt"))
        items.agg(count(lit(1)).as("kk"),
            sum(col("qx").cast("decimal(38,0)")).cast("double").as("sqx"),
            sum(col("sx").cast("decimal(38,0)") * col("sx"))
              .cast("double").as("ssx2"))
          .crossJoin(broadcast(tot))
          .select(col("n").as("n_users"), col("kk").as("k_items"),
            round({
              val n = col("n").cast("double")
              // Σ item sample variances: Σqx/(n-1) - Σsx²/(n(n-1))
              val svi = (col("sqx") - col("ssx2") / n) / (n - 1)
              val svt = (col("qt").cast("double") -
                col("st").cast("double") * col("st").cast("double") / n) /
                (n - 1)
              col("kk").cast("double") / (col("kk") - 1).cast("double") *
                (lit(1.0) - svi / svt)
            }, 6).as("alpha"))
      },
      Some("""WITH ui AS (SELECT user_id, event_type,
             |    sum(floor(value * 1000)::BIGINT)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |items AS (SELECT event_type, sum(x)::BIGINT AS sx,
             |    sum(x * x)::BIGINT AS qx FROM ui GROUP BY 1),
             |users AS (SELECT user_id, sum(x)::BIGINT AS t
             |  FROM ui GROUP BY 1),
             |tot AS (SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
             |    sum(t::HUGEINT * t) AS qt FROM users),
             |it AS (SELECT count(*)::BIGINT AS kk,
             |    sum(qx)::DOUBLE AS sqx,
             |    sum(sx::HUGEINT * sx)::DOUBLE AS ssx2 FROM items)
             |SELECT tot.n AS n_users, it.kk AS k_items,
             |  round(kk::DOUBLE / (kk - 1)::DOUBLE * (1.0 -
             |    ((sqx - ssx2 / n::DOUBLE) / (n - 1)::DOUBLE)
             |    / ((qt::DOUBLE - st::DOUBLE * st::DOUBLE / n::DOUBLE)
             |       / (n - 1)::DOUBLE)), 6) AS alpha
             |FROM it, tot""".stripMargin)),

    // One-way random-effects ICC(1,1) (Shrout & Fleiss 1979, unbalanced
    // per Searle 1971) with clusters = users, measurements = their
    // event values, plus the survey design effect DEFF = 1 + (m̄-1)·ICC
    // (Kish 1965) that prices user-clustered sampling of events. Exact
    // per-user (n, Σv, Σv²) digests; SSW/SSB and the unbalanced n0 are
    // digest algebra in identical double trees.
    QueryDef("q_icc_deff",
      (s, d) => {
        val g = graft.sources.Tables.events(s, d)
          .select(col("user_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"),
            sum(col("vm") * col("vm")).as("qv"))
        g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
            sum(col("sv")).as("svt"),
            sum(col("qv").cast("decimal(38,0)")).as("qvt"),
            // per-user term quantized to 1e-4 then exact DECIMAL sum —
            // a raw double sum over millions of users is order-dependent
            sum(round(col("sv").cast("double") * col("sv").cast("double") /
              col("n").cast("double"), 4).cast("decimal(38,4)"))
              .cast("double").as("sb"),
            sum(col("n") * col("n")).as("sn2"))
          .select(col("k").as("n_users"), col("nt").as("n_obs"),
            round({
              val nt = col("nt").cast("double")
              val k = col("k").cast("double")
              val ssb = col("sb") -
                col("svt").cast("double") * col("svt").cast("double") / nt
              val ssw = col("qvt").cast("double") - col("sb")
              val msb = ssb / (k - 1)
              val msw = ssw / (nt - k)
              val n0 = (nt - col("sn2").cast("double") / nt) / (k - 1)
              (msb - msw) / (msb + (n0 - lit(1.0)) * msw)
            }, 6).as("icc"),
            round({
              val nt = col("nt").cast("double")
              val k = col("k").cast("double")
              val ssb = col("sb") -
                col("svt").cast("double") * col("svt").cast("double") / nt
              val ssw = col("qvt").cast("double") - col("sb")
              val msb = ssb / (k - 1)
              val msw = ssw / (nt - k)
              val n0 = (nt - col("sn2").cast("double") / nt) / (k - 1)
              val icc = (msb - msw) / (msb + (n0 - lit(1.0)) * msw)
              lit(1.0) + (nt / k - lit(1.0)) * icc
            }, 6).as("deff"))
      },
      Some("""WITH g AS (SELECT user_id, count(*)::BIGINT AS n,
             |    sum(floor(value * 1000)::BIGINT)::BIGINT AS sv,
             |    sum(floor(value * 1000)::BIGINT
             |        * floor(value * 1000)::BIGINT)::BIGINT AS qv
             |  FROM events GROUP BY 1),
             |a AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nt,
             |    sum(sv)::BIGINT AS svt, sum(qv) AS qvt,
             |    sum(round(sv::DOUBLE * sv::DOUBLE / n::DOUBLE,
             |      4)::DECIMAL(38,4))::DOUBLE AS sb,
             |    sum(n * n)::BIGINT AS sn2
             |  FROM g)
             |SELECT k AS n_users, nt AS n_obs,
             |  round(((sb - svt::DOUBLE * svt::DOUBLE / nt::DOUBLE)
             |        / (k - 1)::DOUBLE
             |      - (qvt::DOUBLE - sb) / (nt - k)::DOUBLE)
             |    / ((sb - svt::DOUBLE * svt::DOUBLE / nt::DOUBLE)
             |        / (k - 1)::DOUBLE
             |      + ((nt::DOUBLE - sn2::DOUBLE / nt::DOUBLE)
             |          / (k - 1)::DOUBLE - 1.0)
             |        * (qvt::DOUBLE - sb) / (nt - k)::DOUBLE), 6) AS icc,
             |  round(1.0 + (nt::DOUBLE / k::DOUBLE - 1.0) *
             |    (((sb - svt::DOUBLE * svt::DOUBLE / nt::DOUBLE)
             |        / (k - 1)::DOUBLE
             |      - (qvt::DOUBLE - sb) / (nt - k)::DOUBLE)
             |    / ((sb - svt::DOUBLE * svt::DOUBLE / nt::DOUBLE)
             |        / (k - 1)::DOUBLE
             |      + ((nt::DOUBLE - sn2::DOUBLE / nt::DOUBLE)
             |          / (k - 1)::DOUBLE - 1.0)
             |        * (qvt::DOUBLE - sb) / (nt - k)::DOUBLE)), 6) AS deff
             |FROM a""".stripMargin)),

    // Kendall's coefficient of concordance W (Kendall & Babington
    // Smith 1939, tie-corrected) across m = 5 judges (event_type
    // channels) ranking n = calendar days by daily event count,
    // zero-filled onto the shared spine. Midranks are kept EXACT by
    // doubling: 2·midrank = 2·(#below) + t + 1 is an integer, so the
    // spread S and the tie terms T_j stay in BIGINT algebra until the
    // single final division (W = 3·S4 / (m²(n³-n) - m·ΣT)). The only
    // shuffles are the daily digest and a per-judge value-cell rollup.
    QueryDef("q_kendall_w",
      (s, d) => {
        val ev = graft.sources.Tables.events(s, d)
        val daily = ev
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val spine = ev.agg(min(to_date(col("ts"))).as("d0"),
            max(to_date(col("ts"))).as("d1"))
          .select(explode(expr("sequence(d0, d1)")).as("day"))
        val judges = ev.select(col("event_type")).distinct()
        val grid = spine.crossJoin(broadcast(judges))
          .join(daily, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("c"), lit(0L)).as("c"))
        // per judge, per distinct count value: t (tie size), #below
        val cells = grid.groupBy(col("event_type"), col("c"))
          .agg(count(lit(1)).as("t"))
        val wj = Window.partitionBy(col("event_type")).orderBy(col("c"))
        val ranked = cells
          .withColumn("below",
            coalesce(sum(col("t")).over(
              wj.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("event_type"), col("c"),
            (col("below") * 2 + col("t") + 1).as("r2"), col("t"))
        val ties = ranked.groupBy(col("event_type"))
          .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tj"))
          .agg(sum(col("tj")).as("st"))
        val di = grid.join(ranked, Seq("event_type", "c"))
          .groupBy(col("day")).agg(sum(col("r2")).as("d2"))
        val nm = di.agg(count(lit(1)).as("n")).crossJoin(
          grid.select(col("event_type")).distinct()
            .agg(count(lit(1)).as("m")))
        di.crossJoin(broadcast(nm))
          .groupBy(col("n"), col("m"))
          .agg(sum((col("d2") - col("m") * (col("n") + 1)) *
            (col("d2") - col("m") * (col("n") + 1))).as("s4"))
          .crossJoin(broadcast(ties))
          .select(col("n").as("n_days"), col("m").as("m_judges"),
            round(lit(3.0) * col("s4").cast("double") /
              (col("m").cast("double") * col("m").cast("double") *
                (col("n").cast("double") * col("n").cast("double") *
                  col("n").cast("double") - col("n").cast("double")) -
                col("m").cast("double") * col("st").cast("double")), 6)
              .as("kendall_w"))
      },
      Some("""WITH sp AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1
             |  FROM events),
             |spine AS (SELECT unnest(generate_series(sp.d0, sp.d1,
             |    INTERVAL 1 DAY))::DATE AS day FROM sp),
             |judges AS (SELECT DISTINCT event_type FROM events),
             |daily AS (SELECT ts::DATE AS day, event_type,
             |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
             |grid AS (SELECT s.day, j.event_type,
             |    coalesce(d.c, 0)::BIGINT AS c
             |  FROM spine s CROSS JOIN judges j
             |  LEFT JOIN daily d ON d.day = s.day
             |    AND d.event_type = j.event_type),
             |cells AS (SELECT event_type, c, count(*)::BIGINT AS t
             |  FROM grid GROUP BY 1, 2),
             |ranked AS (SELECT event_type, c,
             |    (2 * coalesce(sum(t) OVER (PARTITION BY event_type
             |      ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) + t + 1)::BIGINT AS r2, t
             |  FROM cells),
             |tiesum AS (SELECT sum(tj)::BIGINT AS st FROM (
             |  SELECT event_type, sum(t * t * t - t)::BIGINT AS tj
             |  FROM ranked GROUP BY 1)),
             |di AS (SELECT g.day, sum(r.r2)::BIGINT AS d2
             |  FROM grid g JOIN ranked r
             |    ON r.event_type = g.event_type AND r.c = g.c
             |  GROUP BY 1),
             |nm AS (SELECT (SELECT count(*) FROM di)::BIGINT AS n,
             |    (SELECT count(*) FROM judges)::BIGINT AS m),
             |s4 AS (SELECT nm.n, nm.m,
             |    sum((d2 - m * (n + 1)) * (d2 - m * (n + 1)))::BIGINT AS s4
             |  FROM di, nm GROUP BY 1, 2)
             |SELECT s4.n AS n_days, s4.m AS m_judges,
             |  round(3.0 * s4::DOUBLE /
             |    (m::DOUBLE * m::DOUBLE *
             |      (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)
             |     - m::DOUBLE * st::DOUBLE), 6) AS kendall_w
             |FROM s4, tiesum""".stripMargin)),

    // Gwet's AC1 (Gwet 2008) on the same 3 derived binary raters the
    // Fleiss query scores — the chance-agreement model that stays
    // stable when the trait is rare (the kappa paradox). Identical
    // integer digests (n_docs, tot_pos, agree2); only the Pe formula
    // differs: Pe_AC1 = 2π(1-π) with π the mean per-item positive
    // proportion. Reported beside Fleiss for the contrast.
    QueryDef("q_gwet_ac1",
      (s, d) => {
        val lab = s.read.parquet(s"$d/documents.parquet")
          .select(
            when(col("n_chars") >= 250, 1L).otherwise(0L).as("a"),
            when(size(graft.ext.TextAnalysis.tokens(col("text"))) >= 60, 1L)
              .otherwise(0L).as("b"),
            when(size(filter(graft.ext.TextAnalysis.tokens(col("text")),
              t => t.isin(graft.ext.TextAnalysis.Stopwords: _*))) >= 8, 1L)
              .otherwise(0L).as("c"))
          .select((col("a") + col("b") + col("c")).as("n_pos"))
        lab.agg(count(lit(1)).as("n_docs"), sum(col("n_pos")).as("tot_pos"),
            sum(col("n_pos") * (col("n_pos") - 1) +
              (lit(3) - col("n_pos")) * (lit(2) - col("n_pos")))
              .as("agree2"))
          .select(col("n_docs"), col("tot_pos"),
            round({
              val pa = col("agree2").cast("double") /
                (col("n_docs") * 6).cast("double")
              val pi = col("tot_pos").cast("double") /
                (col("n_docs") * 3).cast("double")
              val pe = lit(2.0) * pi * (lit(1.0) - pi)
              (pa - pe) / (lit(1.0) - pe)
            }, 6).as("gwet_ac1"),
            round({
              val pa = col("agree2").cast("double") /
                (col("n_docs") * 6).cast("double")
              val pi = col("tot_pos").cast("double") /
                (col("n_docs") * 3).cast("double")
              val pe = lit(1.0) - lit(2.0) * pi * (lit(1.0) - pi)
              (pa - pe) / (lit(1.0) - pe)
            }, 6).as("fleiss_kappa"))
      },
      Some("""WITH lab AS (SELECT
             |    (CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
             |     + CASE WHEN len(string_split(lower(text), ' ')) >= 60
             |         THEN 1 ELSE 0 END
             |     + CASE WHEN len(list_filter(string_split(lower(text), ' '),
             |         t -> list_contains(['the','a','an','of','and','to','in',
             |           'is','on','for','with','at'], t))) >= 8
             |         THEN 1 ELSE 0 END)::BIGINT AS n_pos
             |  FROM documents),
             |ag AS (SELECT count(*)::BIGINT AS n_docs,
             |    sum(n_pos)::BIGINT AS tot_pos,
             |    sum(n_pos * (n_pos - 1) + (3 - n_pos) * (2 - n_pos))::BIGINT
             |      AS agree2
             |  FROM lab)
             |SELECT n_docs, tot_pos,
             |  round((agree2::DOUBLE / (n_docs * 6)::DOUBLE
             |      - 2.0 * (tot_pos::DOUBLE / (n_docs * 3)::DOUBLE)
             |        * (1.0 - tot_pos::DOUBLE / (n_docs * 3)::DOUBLE))
             |    / (1.0 - 2.0 * (tot_pos::DOUBLE / (n_docs * 3)::DOUBLE)
             |        * (1.0 - tot_pos::DOUBLE / (n_docs * 3)::DOUBLE)), 6)
             |    AS gwet_ac1,
             |  round((agree2::DOUBLE / (n_docs * 6)::DOUBLE
             |      - (1.0 - 2.0 * (tot_pos::DOUBLE / (n_docs * 3)::DOUBLE)
             |        * (1.0 - tot_pos::DOUBLE / (n_docs * 3)::DOUBLE)))
             |    / (1.0 - (1.0 - 2.0 * (tot_pos::DOUBLE
             |          / (n_docs * 3)::DOUBLE)
             |        * (1.0 - tot_pos::DOUBLE / (n_docs * 3)::DOUBLE))), 6)
             |    AS fleiss_kappa
             |FROM ag""".stripMargin))
  )
}
