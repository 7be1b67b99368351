package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.operators.{AsOf, Cdc, Funnel, Graph, Incremental, Ranking, Sessionize, Timeseries}

/** Time-series / semi-structured coverage over `events`: JSON
  * extraction (§2.7 gap fill), tumbling windows, gap sessionization,
  * and the as-of join (§2.4 extension). All four are the batch twins of
  * the Structured Streaming surface in [[graft.streaming.Streams]] —
  * the reference's "streaming" is a 20-minute batch re-run
  * (/root/reference/dags/Main.py:23), so every streaming semantic here
  * must stay batch-checkable against the oracle (SURVEY.md §2.8).
  */
object Events {

  /** q91 oracle: integer PageRank unrolled to `iters` chained CTEs.
    * A recursive CTE would be the compact form, but aggregate
    * functions inside a recursive term are restricted across SQL
    * dialects — the unrolled chain is plain ANSI and runs anywhere.
    * Every quantity is BIGINT micro-rank units (`//` = the operator's
    * `div`; inputs are non-negative so floor = truncate), making the
    * chain bit-identical to the Spark side. */
  private def pageRankOracle(iters: Int): String = {
    val chain = (1 to iters).map { k =>
      s"""pr$k AS (SELECT e.dst AS p,
         |  CAST((SELECT (15 * init) // 100 FROM c)
         |    + (85 * sum(CASE WHEN e.w = 1 THEN pr${k - 1}.r // e.outdeg ELSE 0 END)) // 100
         |    AS BIGINT) AS r
         |  FROM pr${k - 1} JOIN e2 e ON pr${k - 1}.p = e.src GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS page
       |  FROM events),
       |edges AS (
       |  SELECT src, dst FROM (
       |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
       |           page AS dst FROM ev)
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |nodes AS (SELECT DISTINCT src AS p FROM edges UNION SELECT DISTINCT dst AS p FROM edges),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |e2 AS (
       |  SELECT e.src, e.dst, d.outdeg, 1 AS w FROM edges e JOIN deg d ON e.src = d.src
       |  UNION ALL SELECT p, p, NULL, 0 FROM nodes),
       |c AS (SELECT 1000000000000 // nullif(count(*), 0) AS init FROM nodes),
       |pr0 AS (SELECT p, CAST((SELECT init FROM c) AS BIGINT) AS r FROM nodes),
       |$chain
       |SELECT p, r AS rank FROM pr$iters ORDER BY p""".stripMargin
  }

  /** q136 oracle: [[pageRankOracle]] with the restart mass placed on
    * the SEED self-loop rows only (sb column) — r(p) = sb(p) +
    * d·Σ contrib, seeds start with SCALE/|seeds| and everyone else 0.
    * Same integer arithmetic, same unrolling. */
  private def pprOracle(iters: Int): String = {
    val chain = (1 to iters).map { k =>
      s"""pr$k AS (SELECT e.dst AS p,
         |  CAST(sum(e.sb)
         |    + (85 * sum(CASE WHEN e.w = 1 THEN pr${k - 1}.r // e.outdeg ELSE 0 END)) // 100
         |    AS BIGINT) AS r
         |  FROM pr${k - 1} JOIN e2 e ON pr${k - 1}.p = e.src GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS page
       |  FROM events),
       |edges AS (
       |  SELECT src, dst FROM (
       |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
       |           page AS dst FROM ev)
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |nodes AS (SELECT DISTINCT src AS p FROM edges UNION SELECT DISTINCT dst AS p FROM edges),
       |c AS (SELECT 1000000000000 // nullif(count(*), 0) AS sinit
       |      FROM nodes WHERE p % 10 = 0),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |e2 AS (
       |  SELECT e.src, e.dst, d.outdeg, 1 AS w, CAST(0 AS BIGINT) AS sb
       |  FROM edges e JOIN deg d ON e.src = d.src
       |  UNION ALL SELECT n.p, n.p, NULL, 0,
       |    CAST(CASE WHEN n.p % 10 = 0 THEN (15 * (SELECT sinit FROM c)) // 100
       |         ELSE 0 END AS BIGINT)
       |  FROM nodes n),
       |pr0 AS (SELECT p,
       |  CAST(CASE WHEN p % 10 = 0 THEN (SELECT sinit FROM c) ELSE 0 END AS BIGINT) AS r
       |  FROM nodes),
       |$chain
       |SELECT p, r AS rank FROM pr$iters ORDER BY p""".stripMargin
  }

  /** q128 oracle: synchronous label propagation unrolled to `iters`
    * chained (count, argmax) CTE pairs — same unrolling rationale as
    * [[pageRankOracle]]. Tie-break is (cnt DESC, label ASC), the exact
    * lexicographic struct-max the operator computes. */
  private def lpaOracle(iters: Int): String = {
    val chain = (1 to iters).map { k =>
      s"""c$k AS (SELECT s.u, l.label, count(*) AS cnt
         |  FROM sym s JOIN l${k - 1} l ON l.p = s.v GROUP BY s.u, l.label),
         |l$k AS (SELECT u AS p, label FROM (
         |    SELECT u, label,
         |      row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label) AS rn
         |    FROM c$k) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS page
       |  FROM events),
       |raw AS (SELECT src, dst FROM (
       |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
       |           page AS dst FROM ev)
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |      FROM raw WHERE src <> dst),
       |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
       |l0 AS (SELECT DISTINCT u AS p, u AS label FROM sym),
       |$chain
       |SELECT p, label FROM l$iters ORDER BY p""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Click-graph PageRank (10 integer-exact iterations) over page
    // transitions: the crawl-importance prior a web-scale corpus
    // weights sources by. Edges = consecutive events per user; ranks
    // in 10^-12 units so both engines run identical 64-bit integer
    // arithmetic (float PageRank can never hash-match cross-engine).
    Q("q91_pagerank", pageRankOracle(10)) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      val edges = Graph.clickEdges(ev, "user_id", "ts", "event_id", "page")
      Graph.pageRank(edges, iterations = 10).orderBy("p")
    },

    // Per-node triangle counts over the same click graph: the
    // local-clustering quality prior next to q91's PageRank. Spark
    // runs the degree-ordered compact-forward algorithm (each triangle
    // found once at its lowest-ranked vertex, wedge work O(m^1.5)
    // under any skew); the oracle lists triangles by the simpler
    // id-ordered 3-join — same triangle set, so per-node counts hash.
    Q("q122_triangle_counts",
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS page
        |  FROM events),
        |raw AS (SELECT src, dst FROM (
        |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |           page AS dst FROM ev)
        |  WHERE src IS NOT NULL AND dst IS NOT NULL),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e1.b = e2.a
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT x AS p FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT p, count(*) AS triangles FROM corners
        |GROUP BY p ORDER BY p""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      Graph.triangleCounts(
          Graph.clickEdges(ev, "user_id", "ts", "event_id", "page"))
        .orderBy("p")
    },

    // Label-propagation communities over the click graph (3 sync
    // rounds, ties to the smallest label): the domain-clustering
    // signal completing the graph tier — importance (q91), density
    // (q122), membership (here). Deterministic by construction, so the
    // unrolled-CTE oracle hashes exactly like q91's.
    Q("q128_label_propagation", Events.lpaOracle(3)) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      Graph.labelPropagation(
          Graph.clickEdges(ev, "user_id", "ts", "event_id", "page"),
          iterations = 3)
        .orderBy("p")
    },

    // Multi-source BFS distance over the click graph: min hops from a
    // deterministic trusted seed set (page % 10 = 0) to every node
    // within 6 hops — the link-distance quality prior (TrustRank-style
    // distance-from-seeds) next to q91's importance and q128's
    // communities. Spark runs the FRONTIER loop (per round: frontier ⋈
    // pre-partitioned edges, anti-join known, stop on empty — the
    // per-round shuffle is the frontier, never edges or distances);
    // the oracle enumerates (node, depth) pairs with a recursive
    // UNION-dedup CTE and takes min(depth). Integer hop counts —
    // bit-identical under any partitioning.
    Q("q134_bfs_distances",
      """WITH RECURSIVE ev AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS page
        |  FROM events),
        |raw AS (SELECT src, dst FROM (
        |    SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |           page AS dst FROM ev)
        |  WHERE src IS NOT NULL AND dst IS NOT NULL),
        |e AS (SELECT DISTINCT src, dst FROM raw),
        |nodes AS (SELECT src AS p FROM e UNION SELECT dst FROM e),
        |seeds AS (SELECT p FROM nodes WHERE p % 10 = 0),
        |walk(p, d) AS (
        |  SELECT p, CAST(0 AS BIGINT) AS d FROM seeds
        |  UNION
        |  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.p
        |  WHERE w.d < 6)
        |SELECT p, min(d) AS dist FROM walk GROUP BY p
        |ORDER BY p""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      // same persist rationale as q136: the seed derivation must not
      // replay the events window the operator already caches
      val edges = Graph.clickEdges(ev, "user_id", "ts", "event_id", "page")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nodes = edges.select(col("src").as("p"))
          .unionByName(edges.select(col("dst").as("p"))).distinct()
        val seeds = nodes.where(pmod(col("p"), lit(10L)) === 0L)
        Graph.bfsDistances(edges, seeds, maxDepth = 6).orderBy("p")
      } finally { edges.unpersist(); () }
    },

    // Personalized PageRank from the trusted seed set (page % 10 = 0):
    // TrustRank proper — how much seed trust FLOWS to each page, the
    // weighted complement of q134's hop distances. Restart mass lands
    // only on seeds (carried on their self-loop rows, so the round
    // stays ONE join + one aggregate); integer micro-rank units make
    // 10 iterations bit-identical to the unrolled-CTE oracle.
    Q("q136_personalized_pagerank", Events.pprOracle(10)) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      // edges feed BOTH the operator and the seed derivation; persist
      // here or the seed plan replays the events window from scratch
      // (the operator materializes eagerly, so unpersist is safe)
      val edges = Graph.clickEdges(ev, "user_id", "ts", "event_id", "page")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nodes = edges.select(col("src").as("p"))
          .unionByName(edges.select(col("dst").as("p"))).distinct()
        val seeds = nodes.where(pmod(col("p"), lit(10L)) === 0L)
        Graph.personalizedPageRank(edges, seeds, iterations = 10).orderBy("p")
      } finally { edges.unpersist(); () }
    },

    // Top-20 three-step click paths: the exploratory twin of q80's
    // funnel — instead of checking one given pattern, enumerate every
    // window of 3 consecutive pages per user and count them
    // corpus-wide (the Sankey/flow-analysis feed). One window shuffle
    // carries both leads, the count is map-side-combinable, and the
    // top-k is TakeOrderedAndProject — no global sort. Ties break to
    // the smallest path string, so the cut is deterministic.
    Q("q135_click_paths",
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS page
        |  FROM events),
        |w AS (SELECT CAST(page AS VARCHAR) AS s0,
        |    lead(CAST(page AS VARCHAR), 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
        |    lead(CAST(page AS VARCHAR), 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS s2
        |  FROM ev),
        |p AS (SELECT s0 || ' -> ' || s1 || ' -> ' || s2 AS path FROM w
        |      WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL)
        |SELECT path, count(*) AS n FROM p GROUP BY path
        |ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType))
          .getField("k").cast("long").as("page"))
      Funnel.topPaths(ev, "user_id", "ts", "event_id", "page", len = 3, k = 20)
    },

    // JSON-in-string extraction (events.props = {"k": N}).
    Q("q20_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, d) =>
      // from_json with a fixed {"k": string} schema: parsed once into a
      // codegen-friendly struct, vs get_json_object re-parsing the JSON
      // string per access (measured ~2-3× cheaper at sf0.1). k is read
      // as STRING then cast, matching the oracle's lenient
      // json_extract_string+CAST for non-integral k shapes ({"k":"5"}
      // would be NULL under a LONG schema in PERMISSIVE mode but 5 in
      // the oracle).
      Tables.events(s, d)
        .groupBy(from_json(col("props"), new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.StringType)).getField("k")
          .cast("long").as("k"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .orderBy("k")
    },

    // Tumbling hour window, batch form (streaming twin uses window(ts, '1 hour')).
    Q("q22_tumbling_window",
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .orderBy("hour_start", "event_type")
    },

    // Sliding hour window with 15-minute slide — the batch twin of
    // streaming slidingAgg: each event lands in dur/slide = 4
    // overlapping windows. The oracle reconstructs Spark's
    // epoch-aligned window grid by exploding 4 slide offsets per event.
    Q("q47_sliding_window",
      """SELECT ws AS window_start, event_type, count(*) AS n
        |FROM (
        |  SELECT e.event_type,
        |    make_timestamp((CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - k.k * 900) * 1000000) AS ws
        |  FROM events e
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type")
    },

    // Gap-based sessionization (30-minute timeout). Gap test uses exact
    // integer-microsecond interval arithmetic — no float drift between
    // engines.
    Q("q23_sessions",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |      AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      Sessionize.sessions(Tables.events(s, d), "user_id", "ts", "event_id", 1800L)
        .select("user_id", "session_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_id")
    },

    // Dense hourly resample: every user × hour in the user's own
    // activity span, absent hours filled with 0 — the zeros a sparse
    // groupBy never emits and every rate/plot/window model needs. The
    // grid is bounded by Σ per-user span hours (each key explodes
    // only its own [lo, hi]); the span table reduces the COUNTS, not
    // the raw events.
    Q("q106_gapfill_hours",
      """WITH c AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour_start, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(hour_start) AS lo, max(hour_start) AS hi
        |      FROM c GROUP BY 1),
        |g AS (SELECT user_id,
        |        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        |      FROM s)
        |SELECT g.user_id, g.hour_start, coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.hour_start = c.hour_start
        |ORDER BY g.user_id, g.hour_start""".stripMargin) { (s, d) =>
      Timeseries.gapFillHourly(Tables.events(s, d), "user_id", "ts")
        .orderBy("user_id", "hour_start")
    },

    // Retention triangle: users cohorted by first-seen date, activity
    // bucketed into whole weeks since, distinct actives per cell —
    // the standard product-analytics matrix. Integer floor-division
    // week bucketing keeps both engines bit-identical.
    Q("q107_cohort_retention",
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT e.user_id, f.cohort_date,
        |    CAST(datediff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7 AS INT) AS week_n
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_date, week_n, count(DISTINCT user_id) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Timeseries.cohortRetention(Tables.events(s, d), "user_id", "ts")
        .orderBy("cohort_date", "week_n")
    },

    // Exact global percentiles of the event value WITHOUT a global
    // sort: two-phase histogram selection (bounded bucket-count sync,
    // only target buckets re-ranked) — the scale path q28's per-group
    // percentile() cannot take when the "group" is the whole corpus.
    // The oracle checks the ORDER STATISTIC directly (rank =
    // integer-exact ceil(pct*n/100) under (value, event_id)), so the
    // histogram is invisible to the comparison.
    Q("q109_exact_quantiles",
      """WITH n AS (SELECT count(*) AS n FROM events WHERE value IS NOT NULL),
        |t(pct) AS (VALUES (50), (90), (99)),
        |r AS (SELECT pct, (pct * n.n + 99) // 100 AS rank FROM t, n),
        |o AS (SELECT value, row_number() OVER (ORDER BY value, event_id) AS rank
        |      FROM events WHERE value IS NOT NULL)
        |SELECT r.pct, r.rank, o.value
        |FROM r JOIN o USING (rank) ORDER BY r.pct""".stripMargin) { (s, d) =>
      Ranking.exactQuantiles(Tables.events(s, d), "value", "event_id",
          percents = Seq(50, 90, 99))
        .orderBy("pct")
    },

    // As-of join: each event picks up the most recent order (at or
    // before its ts) of the same user. Right side pre-deduped to one row
    // per (custkey, orderdate) so both engines are deterministic.
    Q("q24_asof_join",
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val rightDedup = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOf.join(
          Tables.events(s, d).select("event_id", "user_id", "ts"),
          rightDedup,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          rightValCols = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey").as("last_orderkey"))
        .orderBy("event_id")
    },

    // Stream-stream interval join, batch twin: each click pairs with
    // the same user's views in the preceding 30 minutes. The SAME
    // operator runs incrementally over two watermarked streams
    // (StreamingSpec) — in batch the watermark node is eliminated and
    // Catalyst plans a sort-merge join on user_id with the time range
    // as a join predicate.
    Q("q75_interval_join",
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.view_ts >= c.click_ts - INTERVAL 30 MINUTE
        |  AND v.view_ts <= c.click_ts
        |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      graft.streaming.Streams.intervalJoin(clicks, views, Seq("user_id"),
          "click_ts", "view_ts", within = "30 minutes", watermark = "1 hour")
        .select("user_id", "click_id", "click_ts", "view_id", "view_ts")
        .orderBy("click_id", "view_id")
    },

    // Salted fact-to-dim join for a skewed-but-KEPT hot key (the
    // complement of the frequency caps, which DROP hot keys — see
    // operators/Skew.scala for when each applies). Salting is
    // semantically transparent, so the oracle is the PLAIN join — the
    // hash-match proves exactness; SkewSpec proves the balanced plan.
    Q("q59_salted_join",
      """WITH tot AS (
        |  SELECT user_id, count(*) AS user_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_total
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, t.user_events, t.user_total
        |FROM events e JOIN tot t USING (user_id)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val userTotals = events.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("user_total"))
      graft.operators.Skew.saltedJoin(
          events.select("event_id", "user_id"), userTotals,
          keys = Seq("user_id"), salts = 8, saltSource = col("event_id"))
        .select("event_id", "user_id", "user_events", "user_total")
        .orderBy("event_id")
    },

    // Multi-step funnel (view → click → purchase): earliest qualifying
    // time per step per user, step i valid only strictly after a
    // qualifying step i-1. ONE shuffle total: all step windows and the
    // final per-user aggregate share the user_id exchange (the
    // join-per-step formulation would shuffle the fact table 3×). The
    // oracle mirrors the exact row-frame semantics.
    Q("q80_funnel",
      """WITH q0 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN event_type = 'view' THEN ts END AS s0
        |  FROM events),
        |q1 AS (
        |  SELECT *, CASE WHEN event_type = 'click'
        |      AND min(s0) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
        |    THEN ts END AS s1
        |  FROM q0),
        |q2 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase'
        |      AND min(s1) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
        |    THEN ts END AS s2
        |  FROM q1)
        |SELECT user_id,
        |  min(s0) AS ts_step1, min(s1) AS ts_step2, min(s2) AS ts_step3,
        |  (CASE WHEN min(s0) IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN min(s1) IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN min(s2) IS NOT NULL THEN 1 ELSE 0 END) AS steps_reached
        |FROM q2 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Funnel.funnel(Tables.events(s, d), "user_id", "ts", "event_id",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")
    },

    // Time-decayed engagement score per user: value · 2^-min(age_days,14)
    // summed per key. Integer math end-to-end (cents × exact power-of-2
    // weight), so the sum is exact and order-independent; ONE double
    // division at the end. Newest event date broadcast in as the
    // reference point (the bm25-stats pattern).
    Q("q83_time_decay",
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS r FROM events),
        |w AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT)
        |      * CAST(power(2, 14 - least(date_diff('day', CAST(ts AS DATE), ref.r), 14)) AS BIGINT)
        |      AS contrib
        |  FROM events, ref)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(contrib) AS DOUBLE) / 1638400.0 AS decayed_value
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Funnel.timeDecayScore(Tables.events(s, d), "user_id", "ts", "value",
          maxAgeDays = 14)
        .orderBy("user_id")
    },

    // Incremental aggregate maintenance: the stored per-event_type
    // stat table (count/sum/min/max over 80% of the facts) folded
    // with a 20%-of-facts batch through Incremental.mergeBatch — the
    // O(batch) refresh that never rescans history. The oracle is the
    // full recompute over ALL facts: merging partials must be
    // indistinguishable from starting over (decomposability made
    // bit-exact by the DECIMAL running sum).
    Q("q98_incremental_agg",
      """SELECT event_type, count(value) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    / nullif(count(value), 0) AS avg_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val history = ev.where(pmod(col("event_id"), lit(10)) < 8)
      val batch = ev.where(pmod(col("event_id"), lit(10)) >= 8)
      val stored = Incremental.partials(history, Seq("event_type"), "value")
      Incremental.finalize(
          Incremental.mergeBatch(stored, batch, Seq("event_type"), "value"))
        .orderBy("event_type")
    },

    // CDC snapshot maintenance: a per-(user, event_type) state
    // snapshot built from 80% of the facts, folded with the last 20%
    // as a versioned change batch (every 7th event retracts its key)
    // through Cdc.applyChanges — last writer per key wins, winning
    // deletes remove the key, untouched base rows pass through, and
    // the base never shuffles (broadcast key-set anti-join). The
    // oracle rebuilds the same MERGE independently with window
    // keep-last + NOT EXISTS.
    Q("q99_cdc_apply",
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, ts, value FROM events),
        |base AS (
        |  SELECT user_id, event_type, event_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY event_id DESC) AS rn
        |    FROM ev WHERE event_id % 10 < 8) WHERE rn = 1),
        |latest AS (
        |  SELECT user_id, event_type, event_id, ts, value, is_delete FROM (
        |    SELECT *, (event_id % 7 = 0) AS is_delete,
        |      row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY event_id DESC) AS rn
        |    FROM ev WHERE event_id % 10 >= 8) WHERE rn = 1)
        |SELECT user_id, event_type, event_id, ts, value FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l
        |                  WHERE l.user_id = b.user_id
        |                    AND l.event_type = b.event_type)
        |UNION ALL
        |SELECT user_id, event_type, event_id, ts, value FROM latest
        |WHERE NOT is_delete
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select("user_id", "event_type", "event_id", "ts", "value")
      val hist = ev.where(pmod(col("event_id"), lit(10)) < 8)
      val base = hist
        .groupBy("user_id", "event_type")
        .agg(max_by(struct(col("event_id"), col("ts"), col("value")),
          col("event_id")).as("__s"))
        .select(col("user_id"), col("event_type"), col("__s.event_id"),
          col("__s.ts"), col("__s.value"))
      val changes = ev.where(pmod(col("event_id"), lit(10)) >= 8)
        .withColumn("is_delete", pmod(col("event_id"), lit(7)) === 0)
      Cdc.applyChanges(base, changes, Seq("user_id", "event_type"),
          versionCol = "event_id", deleteCol = "is_delete")
        .orderBy("user_id", "event_type")
    },

    // Exact incremental count(DISTINCT): distinct users per event_type
    // maintained through the (group, key, dup_cnt) supporting multiset
    // — count(DISTINCT) is not decomposable over scalar stats, so the
    // stored state is one row per live pair, folded with each batch's
    // partials and never rescanning history. The oracle recomputes
    // count(DISTINCT) over ALL facts: the fold must be
    // indistinguishable from starting over.
    Q("q100_incremental_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val stored = Incremental.distinctPartials(
        ev.where(pmod(col("event_id"), lit(10)) < 8), Seq("event_type"), "user_id")
      val batch = Incremental.distinctPartials(
        ev.where(pmod(col("event_id"), lit(10)) >= 8), Seq("event_type"), "user_id")
      Incremental.finalizeDistinct(
          Incremental.mergeDistinct(stored, batch, Seq("event_type"), "user_id"),
          Seq("event_type"), "n_users")
        .orderBy("event_type")
    },

    // SCD2 historization of the full CDC log (q99's change stream,
    // unsplit): every surviving change carries its validity interval
    // in version units; deletes close their predecessor's interval
    // and vanish. The oracle rebuilds the same lead()-window over the
    // undeleted-filtered-after log independently.
    Q("q101_scd2_history",
      """WITH chg AS (
        |  SELECT user_id, event_type, event_id, value,
        |    (event_id % 7 = 0) AS is_delete FROM events),
        |w AS (
        |  SELECT *, event_id AS valid_from,
        |    lead(event_id) OVER (PARTITION BY user_id, event_type
        |                         ORDER BY event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, event_type, event_id, value, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM w WHERE NOT is_delete
        |ORDER BY user_id, event_type, event_id""".stripMargin) { (s, d) =>
      val log = Tables.events(s, d)
        .select("user_id", "event_type", "event_id", "value")
        .withColumn("is_delete", pmod(col("event_id"), lit(7)) === 0)
      Cdc.history(log, Seq("user_id", "event_type"),
          versionCol = "event_id", deleteCol = "is_delete")
        .orderBy("user_id", "event_type", "event_id")
    },

    // INCREMENTAL SCD2 historization: the stored q101 history table
    // folded forward with only the NEW half of the change log — open
    // intervals close at each affected key's first new version, the
    // batch historizes internally, untouched keys carry through. The
    // oracle is q101's full-log replay: incremental ≡ replay is the
    // correctness claim, and the stored side never re-sorts (one key
    // semi/anti pair + the batch's own window).
    Q("q126_incremental_scd2",
      """WITH chg AS (
        |  SELECT user_id, event_type, event_id, value,
        |    (event_id % 7 = 0) AS is_delete FROM events),
        |w AS (
        |  SELECT *, event_id AS valid_from,
        |    lead(event_id) OVER (PARTITION BY user_id, event_type
        |                         ORDER BY event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, event_type, event_id, value, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM w WHERE NOT is_delete
        |ORDER BY user_id, event_type, event_id""".stripMargin) { (s, d) =>
      val log = Tables.events(s, d)
        .select("user_id", "event_type", "event_id", "value")
        .withColumn("is_delete", pmod(col("event_id"), lit(7)) === 0)
      // deterministic split point (one-row scalar, not a hot collect)
      val cut = log.agg(max(col("event_id"))).head.getLong(0) / 2
      val stored = Cdc.history(log.where(col("event_id") <= cut),
        Seq("user_id", "event_type"), versionCol = "event_id",
        deleteCol = "is_delete")
      Cdc.applyHistoryBatch(stored, log.where(col("event_id") > cut),
          Seq("user_id", "event_type"), versionCol = "event_id",
          deleteCol = "is_delete")
        .orderBy("user_id", "event_type", "event_id")
    },

    // Temporal (point-in-time) join: each purchase fact attaches the
    // signup-dimension version VALID AT its event_id — the q101 SCD2
    // history (same delete convention) probed by containment. Spark
    // resolves the containing interval via the as-of union-merge (one
    // key shuffle, disjoint intervals ⇒ greatest valid_from <= t, then
    // a liveness check so DELETE gaps yield NULL); the oracle states
    // the contract directly as the interval-containment LEFT JOIN.
    Q("q125_temporal_join",
      """WITH log AS (
        |  SELECT user_id, event_id, value, (event_id % 7 = 0) AS is_delete
        |  FROM events WHERE event_type = 'signup'),
        |h AS (
        |  SELECT user_id, value, event_id AS valid_from,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        |    is_delete
        |  FROM log),
        |hh AS (SELECT * FROM h WHERE NOT is_delete),
        |f AS (SELECT event_id, user_id, value AS amount
        |      FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.amount,
        |  hh.value AS dim_value, hh.valid_from
        |FROM f LEFT JOIN hh ON f.user_id = hh.user_id
        |  AND hh.valid_from <= f.event_id
        |  AND (hh.valid_to IS NULL OR f.event_id < hh.valid_to)
        |ORDER BY f.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val log = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("value").as("dim_value"))
        .withColumn("is_delete", pmod(col("event_id"), lit(7)) === 0)
      val history = Cdc.history(log, Seq("user_id"),
        versionCol = "event_id", deleteCol = "is_delete")
      val facts = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value").as("amount"))
      AsOf.temporalJoin(facts, history, "user_id", "user_id", "event_id",
          histValCols = Seq("dim_value"))
        .orderBy("event_id")
    })
}
