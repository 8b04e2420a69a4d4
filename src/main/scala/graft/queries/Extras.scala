package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Exact

/** Operators beyond the reference's inventory that any warehouse/analytics
  * user of it would reach for next: sessionization, per-group top-N,
  * rollup subtotals, JSON field extraction, sketch distinct. (SURVEY §2.13
  * lists these as "free from Spark" — here they are, registered and
  * checked.)
  */
object Extras {

  // X1 — gap-based sessionization over the event stream: a new session
  // starts after >30min of user inactivity; session id = running count of
  // session starts. Shuffles once on user_id — the canonical partitioned
  // event-time op.
  private val x1 = QueryDef("x1_sessionize", (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gapUs = 30L * 60 * 1000 * 1000
    val sessions = Tables.eventsWithTsUs(s, dir)
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("is_new",
        (col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > gapUs).cast("long"))
      .withColumn("session_seq",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    sessions.groupBy("user_id", "session_seq").agg(
        count(lit(1)).as("n_events"),
        ((max("ts_us") - min("ts_us")) / lit(1000000L)).as("duration_s"))
      .groupBy("user_id").agg(
        max("session_seq").cast("long").as("n_sessions"),
        sum("n_events").cast("long").as("n_events"),
        max("duration_s").as("max_session_s"))
  }, Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM events),
      g AS (SELECT user_id, ts_us,
        CASE WHEN lag(ts_us) OVER w IS NULL
               OR ts_us - lag(ts_us) OVER w > 30*60*1000*1000
             THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      sess AS (SELECT user_id, ts_us,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_seq
        FROM g),
      agg AS (SELECT user_id, session_seq,
        CAST(count(*) AS BIGINT) AS n_events,
        (max(ts_us) - min(ts_us)) / 1000000 AS duration_s
        FROM sess GROUP BY 1, 2)
      SELECT user_id, CAST(max(session_seq) AS BIGINT) AS n_sessions,
        CAST(sum(n_events) AS BIGINT) AS n_events,
        max(duration_s) AS max_session_s
      FROM agg GROUP BY user_id"""), headline = true)

  // X2 — top-N per group (window rank + filter): top-3 orders by price
  // within each priority.
  private val x2 = QueryDef("x2_topn_per_group", (s, dir) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
  }, Some("""SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk,
        o_orderkey, o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders)
      WHERE rnk <= 3"""))

  // X3 — rollup subtotals (the dashboard's grand-total + per-group tiles
  // in one pass; SURVEY §2.13 notes cube/rollup come free).
  private val x3 = QueryDef("x3_rollup", (s, dir) => {
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        Exact.exactSum(col("l_quantity"), 2).as("qty"))
  }, Some(s"""SELECT l_returnflag, l_linestatus,
      CAST(count(*) AS BIGINT) AS n,
      ${Exact.exactSumSql("l_quantity", 2)} AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  // X4 — JSON field extraction from the event props payload.
  private val x4 = QueryDef("x4_json_extract", (s, dir) => {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type").agg(
        min("k").as("k_min"), max("k").as("k_max"),
        count(when(col("k").isNull, lit(1))).as("k_nulls"))
  }, Some("""SELECT event_type,
      CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_min,
      CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_max,
      CAST(count(*) FILTER (WHERE props->>'k' IS NULL) AS BIGINT) AS k_nulls
      FROM events GROUP BY event_type"""))

  // X5 — sketch distinct (HLL++): the 100 TB way to count uniques. The
  // estimate is engine-specific -> rows-only here; ExtrasSpec pins the
  // relative error against the exact count.
  //
  // The two counts are computed in SEPARATE aggregations on purpose:
  // mixing a DISTINCT aggregate with a non-distinct one in a single agg
  // makes the planner rewrite through a groupBy(distinct key) stage that
  // carries every other aggregate's buffer PER KEY — at rsd=0.01 the HLL
  // buffer is ~1.6k longs, so the "combined" form shuffles ~13 KB per
  // distinct order (measured 3x slower at sf0.1, and growing with key
  // count). Two single-pass aggs + a 1x1-row cross join sidestep it.
  private val x5 = QueryDef("x5_approx_distinct", (s, dir) => {
    Tables.lineitem(s, dir)
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01)
        .as("approx_orders"))
      .crossJoin(Tables.lineitem(s, dir)
        .agg(countDistinct("l_orderkey").as("exact_orders")))
  }, None)

  // X5P — PORTABLE distinct-count sketch, oracle-checked where x5's HLL
  // cannot be (Spark's HLL++ buffer layout is engine-internal): a
  // k-minimum-values estimator. KMV (Bar-Yossef et al. 2002): with h
  // uniform on [0, M), the k-th smallest DISTINCT hash h_k estimates
  // the distinct count as (k-1) * M / h_k. poly_hash alone is NOT
  // uniform on short digit strings (measured rel_err 70 — the fold of
  // a 5-char string never wraps the modulus), so it gets a Fibonacci
  // scramble: u = (poly_hash * 2654435761) % 2^31, overflow-safe
  // (poly_hash < 2^30, product < 2.9e18 < 2^63) and portable. Measured
  // rel_err at the gate SF: 0.55% (k=256, theoretical ~1/sqrt(k)).
  // The k-min-of-distinct-hashes set is deterministic REGARDLESS of
  // the algorithm that finds it, so Spark computes it declaratively
  // (distinct -> global top-k; Catalyst plans the per-partition
  // TakeOrdered + single-partition merge — the sketch merge shape) and
  // DuckDB mirrors it with ORDER BY h LIMIT k; everything after is
  // exact-integer or exactly-rounded IEEE division, so the estimate
  // hash-matches bit for bit. At 100 TB the same k-min set comes from
  // a bounded aggregator (graft.functions.KmvSketch is that shape) —
  // the result, and therefore the oracle, is identical.
  private val x5p = QueryDef("x5p_kmv_distinct", (s, dir) => {
    val k = 256
    val m = 2147483648L // scramble modulus 2^31
    val kmin = Tables.lineitem(s, dir)
      .select(expr(
        s"(poly_hash(CAST(l_orderkey AS STRING)) * 2654435761L) % $m")
        .as("h"))
      .distinct()
      .orderBy("h").limit(k)
      .agg(max("h").as("hk"), count(lit(1)).cast("long").as("kk"))
    val exact = Tables.lineitem(s, dir)
      .agg(countDistinct("l_orderkey").as("true_distinct"))
    // Small-population regime: with fewer than k distinct hashes the
    // k-min set IS the population, so KMV reports the exact count kk
    // (the estimator's error is unbounded there — kk=1 divides by a
    // possibly tiny hk). Mirrored branch in the DuckDB oracle.
    val est = when(col("kk") < lit(k.toLong), col("kk").cast("double"))
      .otherwise(
        expr(s"CAST((kk - 1) * $m AS DOUBLE)") / col("hk").cast("double"))
    kmin.crossJoin(exact)
      .select(
        est.as("est_distinct"),
        col("true_distinct"),
        (abs(est - col("true_distinct").cast("double")) /
          col("true_distinct").cast("double")).as("rel_err"))
  }, Some("""WITH h AS (SELECT DISTINCT (list_reduce(list_prepend(
        CAST(7 AS BIGINT),
        list_transform(range(1, length(CAST(l_orderkey AS VARCHAR)) + 1),
          i -> ascii(CAST(l_orderkey AS VARCHAR)[i]))),
        (a, b) -> (a * 31 + b) % 1073741789) * 2654435761) % 2147483648
        AS h
      FROM lineitem),
    km AS (SELECT h FROM h ORDER BY h LIMIT 256),
    agg AS (SELECT CAST(max(h) AS BIGINT) hk,
              CAST(count(*) AS BIGINT) kk FROM km),
    ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
             true_distinct FROM lineitem),
    e AS (SELECT CASE WHEN kk < 256 THEN CAST(kk AS DOUBLE)
            ELSE CAST((kk - 1) * 2147483648 AS DOUBLE) / hk END AS est,
            true_distinct
          FROM agg, ex)
    SELECT est AS est_distinct, true_distinct,
      abs(est - CAST(true_distinct AS DOUBLE))
        / CAST(true_distinct AS DOUBLE) AS rel_err
    FROM e"""))

  // X6 — deterministic argmax per group via struct-max (max_by has no
  // tiebreak; ordering the struct by (value, key) pins ties).
  private val x6 = QueryDef("x6_argmax", (s, dir) => {
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice").as("p"),
        col("o_orderkey").as("k"))).as("m"))
      .select(col("o_custkey"), col("m.p").as("best_price"),
        col("m.k").as("best_order"))
  }, Some("""SELECT o_custkey, m.p AS best_price, m.k AS best_order
      FROM (SELECT o_custkey,
        max({'p': o_totalprice, 'k': o_orderkey}) AS m
        FROM orders GROUP BY o_custkey)"""))

  // X7 — fixed-width histogram (arithmetic buckets — portable, unlike
  // width_bucket which DuckDB lacks).
  private val x7 = QueryDef("x7_histogram", (s, dir) => {
    Tables.orders(s, dir)
      .withColumn("bucket",
        floor(col("o_totalprice") / lit(60000.0)).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }, Some("""SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT)
      AS bucket, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1"""))

  // X8 — order-insensitive list aggregation: collect_set sorted then
  // joined (raw collect_list order is partitioning-dependent — never
  // expose it).
  private val x8 = QueryDef("x8_collect_sorted", (s, dir) => {
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(array_join(sort_array(collect_set("o_orderstatus")), ",")
        .as("statuses"),
        count(lit(1)).as("n"))
  }, Some("""SELECT o_orderpriority,
      array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        AS statuses,
      CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority"""))

  // X9 — declarative constraint checks over the star inputs: uniqueness,
  // not-null, row predicate, and referential integrity, one violation
  // count each (G6's pre-load integrity gate as a first-class operator).
  private val x9 = QueryDef("x9_constraints", (s, dir) => {
    import graft.operators.Constraints._
    check(Tables.lineitem(s, dir), Seq(
      Unique("dup_line_keys", Seq("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey")),
      NotNull("null_orderkey", "l_orderkey"),
      Check("nonpositive_qty", col("l_quantity") > 0),
      ForeignKey("orphan_orders", Seq("l_orderkey"),
        Tables.orders(s, dir), Seq("o_orderkey")),
      ForeignKey("orphan_parts", Seq("l_partkey"),
        Tables.part(s, dir), Seq("p_partkey"))))
  }, Some("""SELECT
      CAST((SELECT coalesce(sum(cnt - 1), 0) FROM (
        SELECT count(*) cnt FROM lineitem
        GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey
        HAVING count(*) > 1)) AS BIGINT) AS dup_line_keys,
      CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
        AS BIGINT) AS null_orderkey,
      CAST((SELECT count(*) FROM lineitem
        WHERE NOT coalesce(l_quantity > 0, false)) AS BIGINT)
        AS nonpositive_qty,
      CAST((SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS BIGINT)
        AS orphan_orders,
      CAST((SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        SELECT 1 FROM part WHERE p_partkey = l_partkey)) AS BIGINT)
        AS orphan_parts"""))

  // X10 — pivot matrix (the dashboard's rows-x-columns tile): revenue by
  // returnflag pivoted over linestatus. Pivot values are pinned so the
  // output schema is static and oracle-mirrorable with FILTER aggregates.
  private val x10 = QueryDef("x10_pivot", (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("O", "F", "P"))
      .agg(Exact.exactSum(Exact.revenue(col("l_extendedprice"),
        col("l_discount")), 4))
      .withColumnRenamed("O", "rev_O")
      .withColumnRenamed("F", "rev_F")
      .withColumnRenamed("P", "rev_P")
  }, Some {
    def cell(status: String) =
      s"""CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) *
          10000.0, 0) AS BIGINT)) FILTER (WHERE l_linestatus = '$status')
          AS DOUBLE) / 10000.0"""
    s"""SELECT l_returnflag, ${cell("O")} AS rev_O, ${cell("F")} AS rev_F,
        ${cell("P")} AS rev_P FROM lineitem GROUP BY l_returnflag"""
  })

  // X11 — analytic windows beyond the reference's row_number/last:
  // lag/lead (order-to-order deltas), ntile (quartiles), percent_rank.
  private val x11 = QueryDef("x11_window_analytics", (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_order", lag("o_orderkey", 1).over(w))
      .withColumn("next_order", lead("o_orderkey", 1).over(w))
      .withColumn("quartile", ntile(4).over(wPrice).cast("long"))
      .withColumn("price_rank", percent_rank().over(wPrice))
      .filter(col("o_custkey") < 50)
      .select("o_custkey", "o_orderkey", "prev_order", "next_order",
        "quartile", "price_rank")
  }, Some("""SELECT * FROM (
      SELECT o_custkey, o_orderkey,
        lag(o_orderkey, 1) OVER w AS prev_order,
        lead(o_orderkey, 1) OVER w AS next_order,
        CAST(ntile(4) OVER wp AS BIGINT) AS quartile,
        percent_rank() OVER wp AS price_rank
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
             wp AS (PARTITION BY o_custkey
                    ORDER BY o_totalprice, o_orderkey))
      WHERE o_custkey < 50"""))

  // X12 — exact percentiles per group (linear interpolation — the same
  // definition both engines implement), plus the scale path: at 100 TB
  // exact percentile sorts each group, so approx_percentile (t-digest-
  // style GK sketch, mergeable, one pass) is the production form —
  // ExtrasSpec pins its error against these exact values.
  private val x12 = QueryDef("x12_percentiles", (s, dir) => {
    Tables.orders(s, dir).groupBy("o_orderpriority").agg(
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.9)").as("p90"),
      count(lit(1)).as("n"))
  }, Some("""SELECT o_orderpriority,
      quantile_cont(o_totalprice, 0.5) AS p50,
      quantile_cont(o_totalprice, 0.9) AS p90,
      CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority"""))

  // X12P — MERGEABLE quantile sketch, oracle-checked: a fixed-width
  // histogram (x7's shape) whose counts merge by ADDITION across
  // partitions, streams, or days — the scale path for percentiles,
  // where x12's exact percentile() must materialize the full value
  // multiset per group. The quantile pick (smallest bucket whose
  // cumulative count reaches q*N) runs on the <=1000-row bucket table,
  // so the single-partition window there is the right plan, not a
  // bottleneck; estimates are bucket lower bounds, error bounded by
  // the bucket width. Integer counts + exactly-rounded IEEE
  // multiplication end to end -> bit-exact against DuckDB.
  private val x12p = QueryDef("x12p_histogram_quantiles", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.orders(s, dir)
      .withColumn("b",
        floor(col("o_totalprice") / lit(6000.0)).cast("long"))
      .groupBy("b").agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum",
      sum("n").over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val total = hist.agg(sum("n").cast("long").as("nt"))
    cum.crossJoin(total)
      .select(col("b"), col("cum"), col("nt"),
        explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
      .filter(col("cum").cast("double") >= col("q") * col("nt"))
      .groupBy("q")
      .agg(min("b").cast("long").as("bucket"),
        max("nt").as("n_total"))
      .select(col("q"), col("bucket"),
        (col("bucket").cast("double") * lit(6000.0)).as("est_lo"),
        col("n_total"))
  }, Some("""WITH h AS (SELECT CAST(floor(o_totalprice / 6000.0) AS BIGINT)
        b, CAST(count(*) AS BIGINT) n FROM orders GROUP BY 1),
      c AS (SELECT b, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) cum FROM h),
      t AS (SELECT CAST(sum(n) AS BIGINT) nt FROM h),
      qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        CAST(0.99 AS DOUBLE)]) q)
      SELECT q, CAST(min(b) AS BIGINT) AS bucket,
        CAST(min(b) AS DOUBLE) * 6000.0 AS est_lo,
        CAST(max(nt) AS BIGINT) AS n_total
      FROM c, t, qs WHERE CAST(cum AS DOUBLE) >= q * nt GROUP BY q"""))

  // X13 — full cube with grouping_id: every subtotal combination in one
  // pass (the dashboard's grand total, per-flag, per-status, and matrix
  // tiles; completes §2.13's grouping-sets family next to x3's rollup).
  private val x13 = QueryDef("x13_cube", (s, dir) => {
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        Exact.exactSum(col("l_quantity"), 2).as("qty"))
  }, Some(s"""SELECT l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
        AS gid,
      CAST(count(*) AS BIGINT) AS n,
      ${Exact.exactSumSql("l_quantity", 2)} AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  // X14 — the SQL entry point (SURVEY §2.13: "spark.sql available for
  // free since we register tables as temp views"): ONE ANSI SQL string, a
  // star-chain revenue rollup, executed verbatim by BOTH engines — Spark
  // over registered temp views, DuckDB as the oracle. Demonstrates that a
  // SQL-first consumer of the reference could run unchanged queries here.
  private val x14Sql =
    s"""SELECT n_name,
        CAST(count(*) AS BIGINT) AS n_lines,
        ${Exact.exactSumSql("l_extendedprice * (1.0 - l_discount)", 4)}
          AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name"""
  private val x14 = QueryDef("x14_sql_entry", (s, dir) => {
    Seq("lineitem", "orders", "customer", "nation").foreach(t =>
      Tables.t(s, dir, t).createOrReplaceTempView(t))
    s.sql(x14Sql)
  }, Some(x14Sql))

  // X15 — keyed upsert (MERGE INTO semantics, operators/Upsert.scala):
  // a derived update set (BUILDING customers re-segmented, plus one
  // synthetic new key) merged into customer; updates win on matched
  // keys, current rows survive otherwise. Verified by per-segment
  // counts so the 15k-row merged output stays a compact oracle result.
  private val x15 = QueryDef("x15_upsert", (s, dir) => {
    import graft.operators.Upsert
    val customer = Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_mktsegment")
    val updates = customer.filter(col("c_mktsegment") === "BUILDING")
      .withColumn("c_mktsegment", lit("CONSTRUCTION"))
      .unionByName(
        customer.sparkSession.range(1).select(
          lit(-1L).as("c_custkey"), lit("new-customer").as("c_name"),
          lit("FRESH").as("c_mktsegment")))
    Upsert.merge(customer, updates, Seq("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
  }, Some("""WITH cust AS (SELECT c_custkey, c_name, c_mktsegment
        FROM customer),
      updates AS (
        SELECT c_custkey, c_name, 'CONSTRUCTION' AS c_mktsegment
        FROM cust WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT -1, 'new-customer', 'FRESH'),
      merged AS (
        SELECT * FROM cust WHERE NOT EXISTS (
          SELECT 1 FROM updates u WHERE u.c_custkey = cust.c_custkey)
        UNION ALL SELECT * FROM updates)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM merged GROUP BY c_mktsegment"""))

  // X16W/X16 — bucketed co-located join (sources/Bucketed), split into
  // the two costs bucketing separates in production: x16w pays the
  // ONE-TIME shuffle+write that registers both sides bucketed+sorted on
  // the join key; x16 is every later read-join that the layout makes
  // exchange-free. Timing them as one entry (as a single x16 did
  // through round 5) made the bench number write-dominated and hid the
  // join cost the entry exists to show. Table names carry a dir hash so
  // a session that benched one SF can't serve another SF's layout.
  // The RESULTS are layout-independent (both oracles use the plain
  // parquet), which is the point — bucketing changes the PLAN
  // (exchange-free join, pinned in BucketedSpec), never the data. At
  // this SF the planner may still pick broadcast for the small side;
  // the bucketed layout is what survives when neither side broadcasts.
  private def bucketedNames(dir: String): (String, String, String) = {
    val h = Integer.toHexString(dir.hashCode)
    val tmp = System.getProperty("java.io.tmpdir") + s"/graft_bucketed_$h"
    (s"graft_b_lineitem_$h", s"graft_b_orders_$h", tmp)
  }

  private def writeBucketedPair(s: org.apache.spark.sql.SparkSession,
                                dir: String): Unit = {
    import graft.sources.Bucketed
    val (lt, ot, tmp) = bucketedNames(dir)
    Bucketed.writeBucketed(
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
      lt, "l_orderkey", 8, s"$tmp/lineitem")
    Bucketed.writeBucketed(
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
      ot, "o_orderkey", 8, s"$tmp/orders")
  }

  private val x16w = QueryDef("x16w_bucketed_write", (s, dir) => {
    writeBucketedPair(s, dir)
    val (lt, ot, _) = bucketedNames(dir)
    s.table(lt).agg(count(lit(1)).as("n_lineitem"))
      .crossJoin(s.table(ot).agg(count(lit(1)).as("n_orders")))
  }, Some("""SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitem,
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders"""))

  private val x16 = QueryDef("x16_bucketed_join", (s, dir) => {
    val (lt, ot, _) = bucketedNames(dir)
    // registry order runs x16w first (same session); a standalone run
    // self-provisions the fixture, paying the write outside no timer
    if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(ot))
      writeBucketedPair(s, dir)
    s.table(lt)
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        Exact.exactSum(col("l_extendedprice"), 2).as("gross"))
  }, Some(s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      ${Exact.exactSumSql("l_extendedprice", 2)} AS gross
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  // X17 — ORC sink/scan round trip (sources/Formats): result is
  // layout-independent (the oracle aggregates the plain parquet table),
  // proving the ORC path is lossless end to end; FormatsSpec pins the
  // scan-level pushdown/pruning.
  private val x17 = QueryDef("x17_orc_roundtrip", (s, dir) => {
    import graft.sources.Formats
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_orc_rt"
    Formats.writeOrc(Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice"), tmp)
    Formats.readOrc(s, tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Exact.exactSum(col("o_totalprice"), 2).as("total"))
  }, Some(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      ${Exact.exactSumSql("o_totalprice", 2)} AS total
      FROM orders GROUP BY o_orderstatus"""))

  // X19 — JSON-lines sink/scan round trip (sources/Formats), the x17
  // pattern for the interchange format ingest pipelines actually
  // exchange: write a column slice as .jsonl, read it back under the
  // EXPLICIT schema (schema-on-read inference is banned on the ingest
  // path — a type flip on one file would poison a 100 TB union), and
  // aggregate. The oracle aggregates the plain parquet table, so the
  // hash-match proves the jsonl path is lossless end to end (longs,
  // strings, and doubles all round-trip exactly — Spark writes doubles
  // via Jackson's shortest-round-trip repr). FormatsSpec pins the
  // quarantine variant for malformed lines.
  private val x19 = QueryDef("x19_jsonl_roundtrip", (s, dir) => {
    import graft.sources.Formats
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_jsonl_rt"
    val slice = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    Formats.writeJsonl(slice, tmp)
    Formats.readJsonl(s, tmp, slice.schema)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Exact.exactSum(col("o_totalprice"), 2).as("total"))
  }, Some(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      ${Exact.exactSumSql("o_totalprice", 2)} AS total
      FROM orders GROUP BY o_orderstatus"""))

  // X18 — vocabulary heavy hitters WITHOUT a full-vocab shuffle: a
  // Misra–Gries candidate sketch (bounded state per partition, merge-
  // order-independent superset guarantee) followed by an exact recount
  // of the <= capacity candidates. phi=0.02 >= 1/(capacity+1), so the
  // candidate set provably contains every answer and the output is
  // deterministic — checked by a plain GROUP BY / HAVING oracle that
  // never sees the sketch. The sketch's trim paths are exercised under
  // zipf pressure in MisraGriesSpec (the gate corpus's vocabulary is
  // smaller than the capacity, so here the sketch passes through).
  private val x18 = QueryDef("x18_heavy_hitters", (s, dir) => {
    graft.operators.TextAnalysis.heavyHitters(Tables.documents(s, dir),
      "text", phi = 0.02, capacity = 99)
  }, Some("""WITH toks AS (SELECT unnest(list_filter(
        string_split(text, ' '), t -> length(t) > 0)) t FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) tt FROM toks),
      c AS (SELECT t AS term, CAST(count(*) AS BIGINT) freq
        FROM toks GROUP BY t)
      SELECT term, freq FROM c CROSS JOIN n
      WHERE CAST(freq AS DOUBLE) > 0.02 * CAST(tt AS DOUBLE)"""))

  // X20 — Z-ORDER layout write + read-back (operators/ZOrder): lineitem
  // z-clustered on (l_partkey, l_suppkey) 16-bit buckets, the
  // 2-D-pruning lakehouse layout. The query re-reads the z-written copy
  // and emits every row's stored z-key; the oracle recomputes the
  // Morton interleave arithmetically from the plain parquet table, so
  // the hash-match covers the native interleave_bits expression AND the
  // write/read round trip per row. The pruning VALUE of the layout
  // (files touched under a one-dimension filter, vs a linear sort) is
  // measured in ZOrderSpec — file-skipping itself is not SQL-visible.
  private val x20 = QueryDef("x20_zorder_layout", (s, dir) => {
    import graft.operators.ZOrder
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_zorder"
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      ZOrder.zvalue((col("l_partkey") % 65536L).cast("long"),
        (col("l_suppkey") % 65536L).cast("long")).as("z"))
    ZOrder.writeZOrdered(li, "z", tmp, numFiles = 8)
    s.read.parquet(tmp).select("l_orderkey", "l_linenumber", "z")
  }, Some("""SELECT l_orderkey, l_linenumber,
      CAST(list_sum(list_transform(range(0, 16), i ->
        (((l_partkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i)) +
        (((l_suppkey % 65536) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))
      )) AS BIGINT) AS z
      FROM lineitem"""))

  // X21 — point-in-interval RANGE JOIN (operators/RangeJoin): events
  // against sliding promo-style windows derived from orders keys (both
  // sides SF-scale, so the naive BETWEEN predicate — which Spark plans
  // as BroadcastNestedLoopJoin — is exactly the shape that dies at
  // scale). Bucketized to one equi-join hash shuffle + an exact BETWEEN
  // filter; the oracle is the naive BETWEEN join itself, so the
  // hash-match proves the bucket rewrite is semantics-transparent.
  // Hour-of-epoch domain through Tables.eventTsUs (the NTZ discipline);
  // window anchors land inside the events span so the join is
  // non-vacuous at the gate SF.
  private val x21 = QueryDef("x21_range_join", (s, dir) => {
    import graft.operators.RangeJoin
    val pts = Tables.eventsWithTsUs(s, dir)
      .select(col("event_id"),
        expr("ts_us DIV 3600000000").as("hr"))
    val win = Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
      .select(col("o_orderkey"),
        (lit(473352L) + pmod(col("o_orderkey"), lit(600L)))
          .as("start_hr"))
      .withColumn("end_hr", col("start_hr") + lit(47L))
    RangeJoin.pointInInterval(pts, win, "hr", "start_hr", "end_hr",
        bucketWidth = 24L)
      .groupBy("o_orderkey").agg(
        count(lit(1)).as("n_events"),
        sum("event_id").cast("long").as("id_sum"))
  }, Some("""WITH p AS (SELECT event_id,
        epoch_us(ts) // 3600000000 AS hr FROM events),
      w AS (SELECT o_orderkey,
        473352 + o_orderkey % 600 AS start_hr FROM orders
        WHERE o_orderkey % 97 = 0)
      SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(event_id) AS BIGINT) AS id_sum
      FROM p JOIN w ON p.hr BETWEEN w.start_hr AND w.start_hr + 47
      GROUP BY o_orderkey"""))

  // X22 — fixed-point PageRank (operators/GraphRank) over the
  // undirected customer↔supplier co-purchase graph (distinct
  // (custkey, suppkey) pairs from lineitem⋈orders — an SF-scaling edge
  // list). The corpus-curation authority score (domain/URL ranking)
  // expressed in exact scaled-BIGINT arithmetic, so all four power
  // iterations replay in DuckDB as unrolled CTEs and must land on the
  // identical rank vector — cross-engine-exact iterative graph
  // training, the l31 discipline on a graph algorithm.
  // both directions in ONE pass over the joined+distinct edge base —
  // the union shape (e0.union(e0.swap)) executed the lineitem⋈orders
  // join + distinct TWICE when pageRank materialized its edge cache
  private def x22Edges(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

  private val x22 = QueryDef("x22_pagerank", (s, dir) => {
    import graft.operators.GraphRank
    GraphRank.pageRankFixedPoint(x22Edges(s, dir), "src", "dst",
      iters = 4)
  }, Some(graft.operators.GraphRank.oracleSql(
    """SELECT src, dst FROM (SELECT DISTINCT o_custkey*2 AS src,
         l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b
       UNION ALL
       SELECT dst AS src, src AS dst FROM (SELECT DISTINCT
         o_custkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b2""", iters = 4)))

  // X22P — x22 with `prePartitionEdges = true` (RISKS.md row 2's named
  // lever): the edge list is hash-partitioned on the join key ONCE and
  // cached in that layout, so each of the four power iterations joins
  // it exchange-free and the per-iteration shuffle is only the
  // (dst, contrib) aggregate. Same oracle SQL as x22 — the hash-match
  // certifies cross-engine that the physical layout change is
  // result-inert (partitioning must never change ranks); GraphRankSpec
  // measures the shuffle-byte cut with a task-metrics listener.
  private val x22p = QueryDef("x22p_pagerank_prepart", (s, dir) => {
    import graft.operators.GraphRank
    GraphRank.pageRankFixedPoint(x22Edges(s, dir), "src", "dst",
      iters = 4, prePartitionEdges = true)
  }, Some(graft.operators.GraphRank.oracleSql(
    """SELECT src, dst FROM (SELECT DISTINCT o_custkey*2 AS src,
         l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b
       UNION ALL
       SELECT dst AS src, src AS dst FROM (SELECT DISTINCT
         o_custkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b2""", iters = 4)))

  // X23 — parquet NATIVE bloom-filter point lookup: the documents
  // X22W/X22B — the x16w discipline applied to the GRAPH layout
  // (round 15): x22w pays the ONE-TIME bucketed-on-src write of x22's
  // edge list (plus the symmetrized+distinct CC variant of the same
  // edges — both tables a production graph store would keep); x22b is
  // every later COLD-START PageRank over that layout —
  // `pageRankFromBucketed` reads the bucket layout and runs all four
  // iterations with zero edge-side exchange (not even x22p's one
  // upfront repartition). Same oracle as x22/x22p: storage layout must
  // never change ranks, certified cross-engine. Table names carry the
  // dir hash (the x16w session-cache discipline).
  private def x22BucketedNames(dir: String): (String, String, String) = {
    val h = Integer.toHexString(dir.hashCode)
    val tmp = System.getProperty("java.io.tmpdir") + s"/graft_b_graph_$h"
    (s"graft_b_predges_$h", s"graft_b_ccedges_$h", tmp)
  }

  private def writeBucketedGraph(s: org.apache.spark.sql.SparkSession,
                                 dir: String): Unit = {
    import graft.operators.GraphRank
    val (pt, ct, tmp) = x22BucketedNames(dir)
    val e = x22Edges(s, dir)
    GraphRank.writeEdgesBucketed(e, "src", "dst", pt, 8, s"$tmp/pr",
      symmetrizeForCC = false)
    GraphRank.writeEdgesBucketed(e, "src", "dst", ct, 8, s"$tmp/cc",
      symmetrizeForCC = true)
  }

  private val x22w = QueryDef("x22w_bucketed_graph_write", (s, dir) => {
    writeBucketedGraph(s, dir)
    val (pt, ct, _) = x22BucketedNames(dir)
    s.table(pt).agg(count(lit(1)).as("n_pr_edges"))
      .crossJoin(s.table(ct).agg(count(lit(1)).as("n_cc_edges")))
  }, Some("""WITH b AS (SELECT DISTINCT o_custkey*2 AS src,
        l_suppkey*2+1 AS dst FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT src, dst FROM b
        UNION ALL SELECT dst, src FROM b),
      cc AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
        WHERE src <> dst)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_pr_edges,
        (SELECT CAST(count(*) AS BIGINT) FROM cc) AS n_cc_edges"""))

  private val x22b = QueryDef("x22b_pagerank_bucketed", (s, dir) => {
    import graft.operators.GraphRank
    val (pt, ct, _) = x22BucketedNames(dir)
    if (!s.catalog.tableExists(pt) || !s.catalog.tableExists(ct))
      writeBucketedGraph(s, dir)
    GraphRank.pageRankFromBucketed(s, pt, iters = 4)
  }, Some(graft.operators.GraphRank.oracleSql(
    """SELECT src, dst FROM (SELECT DISTINCT o_custkey*2 AS src,
         l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b
       UNION ALL
       SELECT dst AS src, src AS dst FROM (SELECT DISTINCT
         o_custkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b2""", iters = 4)))

  // X22C — connected components COLD-STARTED from the bucketed CC
  // table (symmetrize + distinct + clustering all baked in at write
  // time by x22w): the label loop's per-round neighbor join reads the
  // layout exchange-free from the first job. Oracle: the recursive-CTE
  // reachable-min over the same edge set — layout is result-inert for
  // CC exactly as for PageRank.
  private val x22c = QueryDef("x22c_components_bucketed", (s, dir) => {
    import graft.operators.GraphRank
    val (pt, ct, _) = x22BucketedNames(dir)
    if (!s.catalog.tableExists(pt) || !s.catalog.tableExists(ct))
      writeBucketedGraph(s, dir)
    GraphRank.componentsFromBucketed(s, ct)
  }, Some(graft.operators.GraphRank.componentsOracleSql(
    """SELECT src AS doc_a, dst AS doc_b FROM (SELECT DISTINCT
         o_custkey*2 AS src, l_suppkey*2+1 AS dst FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey) b""")))

  // content-hash table written with a format-level bloom on `h`
  // (Formats.writeParquetBloom), then a needle query — find every doc
  // sharing doc 7's content hash (the planted re-crawl dups make it
  // non-vacuous). min/max stats can't prune a point probe on a hash
  // column (every row group spans the hash space); the bloom is what
  // skips row groups at scale. The oracle runs the same lookup on the
  // plain table, so the hash-match also certifies the bloom-written
  // file is a lossless round trip; ParquetBloomSpec proves the filter
  // actually exists in the footer and behaves one-sided, and the sf5
  // probe measures the needle-scan payoff.
  private val x23 = QueryDef("x23_parquet_bloom_lookup", (s, dir) => {
    import graft.sources.Formats
    val tmp = System.getProperty("java.io.tmpdir") + "/graft_bloom_pq"
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    Formats.writeParquetBloom(t, tmp, Seq("h"), expectedNdv = 100000L)
    val needle = Tables.documents(s, dir)
      .filter(col("doc_id") === 7L).select(md5(col("text")).as("h"))
    s.read.parquet(tmp).join(broadcast(needle), "h")
      .groupBy("h").agg(count(lit(1)).as("n_dups"),
        min("doc_id").as("first_id"), max("doc_id").as("last_id"))
  }, Some("""SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n_dups,
      min(doc_id) AS first_id, max(doc_id) AS last_id
      FROM documents
      WHERE md5(text) = (SELECT md5(text) FROM documents
                         WHERE doc_id = 7)
      GROUP BY 1"""))

  // X24 — incremental cumulative-distinct over mergeable HLL sketches
  // (operators/DistinctSketch): per-day sketches of active users, a
  // window-folded cumulative union, and the EXACT cumulative count
  // (first-tick running sum) next to an `est_ok` tolerance verdict.
  // The estimate itself can't replay cross-engine (register hashing is
  // implementation-defined), so the DuckDB mirror computes the same
  // exact count with TRUE — the hash-match certifies the exact
  // arithmetic AND that every tick's sketch landed within 5% (>3
  // standard errors at lgK=12). The scale story is appendTick: a new
  // day folds into the standing state as ONE two-sketch union, no
  // history rescan (DistinctSketchSpec pins append == rebuild).
  private val x24 = QueryDef("x24_hll_cumulative_distinct", (s, dir) => {
    import graft.operators.DistinctSketch
    val ev = Tables.eventsWithTsUs(s, dir)
      .select(expr("ts_us DIV 86400000000").as("day"), col("user_id"))
    DistinctSketch.certifiedCumulative(ev, "day", "user_id")
      .withColumnRenamed("tick", "day")
  }, Some("""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day,
        user_id AS k FROM events),
      days AS (SELECT DISTINCT day FROM ev),
      ft AS (SELECT k, min(day) AS day FROM ev GROUP BY k),
      nf AS (SELECT day, CAST(count(*) AS BIGINT) AS n
             FROM ft GROUP BY day)
      SELECT d.day,
        CAST(sum(coalesce(nf.n, 0)) OVER
          (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND
           CURRENT ROW) AS BIGINT) AS exact_cum,
        TRUE AS est_ok
      FROM days d LEFT JOIN nf ON nf.day = d.day"""))

  // X25 — KMV corpus-overlap estimation (DistinctSketch.kminHashes /
  // overlapEstimate): how much does crawl snapshot A overlap crawl
  // snapshot B, WITHOUT joining them — each corpus reduces to its k
  // smallest distinct content-hash values (one TakeOrdered scan, k
  // rows persisted per snapshot), and Jaccard/union/intersection
  // estimate from the two signatures alone. The sketch estimate can't
  // replay cross-engine (xxhash64 values differ from DuckDB's hash),
  // so the x24 certification pattern: emit the EXACT overlap counts
  // (distinct normalized texts, inner join) plus tolerance verdicts;
  // the mirror computes the same exacts with TRUE — the hash-match
  // certifies the exact arithmetic AND that the estimates landed
  // inside >3-standard-error tolerances at every gate SF. Corpora:
  // doc_id%3 ∈ {0,1} vs {1,2} — bucket 1's texts (plus planted
  // re-crawl dups) form a real overlap.
  private val x25 = QueryDef("x25_kmv_corpus_overlap", (s, dir) => {
    import graft.operators.{Dedup, DistinctSketch}
    val k = 4096
    val docs = Tables.documents(s, dir)
    // 3-gram shingles (the l2 key): tens of thousands of distinct keys
    // per corpus even at gate SF, so the ESTIMATOR path is what the
    // verdicts certify (whole-doc keys would fall into the exact n<k
    // branch and prove nothing)
    def corpus(m: Int*) = docs
      .filter(pmod(col("doc_id"), lit(3)).isin(m.map(_.toLong): _*))
      .select(explode(Dedup.shingles("text", 3)).as("g"))
    val a = corpus(0, 1)
    val b = corpus(1, 2)
    val est = DistinctSketch.overlapEstimate(
      DistinctSketch.kminHashes(a, col("g"), k),
      DistinctSketch.kminHashes(b, col("g"), k), k)
    val na = a.agg(countDistinct(col("g")).as("n_a"))
    val nb = b.agg(countDistinct(col("g")).as("n_b"))
    val inter = a.distinct().join(b.distinct(), "g")
      .agg(count(lit(1)).as("n_inter"))
    na.crossJoin(nb).crossJoin(inter).crossJoin(est)
      .select(col("n_a"), col("n_b"), col("n_inter"),
        (abs(col("est_union") -
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")) <=
          lit(0.05) * (col("n_a") + col("n_b") - col("n_inter"))
            .cast("double")).as("union_ok"),
        (abs(col("est_intersection") - col("n_inter").cast("double")) <=
          lit(0.08) * (col("n_a") + col("n_b") - col("n_inter"))
            .cast("double")).as("inter_ok"))
  }, Some("""WITH toks AS (SELECT doc_id % 3 AS m,
        list_filter(string_split(text, ' '), t -> length(t) > 0) tk
        FROM documents),
      sh AS (SELECT m, unnest(list_distinct(list_transform(
          range(1, len(tk) - 1),
          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
        FROM toks WHERE len(tk) >= 3),
      an AS (SELECT DISTINCT g FROM sh WHERE m IN (0, 1)),
      bn AS (SELECT DISTINCT g FROM sh WHERE m IN (1, 2))
      SELECT CAST((SELECT count(*) FROM an) AS BIGINT) AS n_a,
             CAST((SELECT count(*) FROM bn) AS BIGINT) AS n_b,
             CAST((SELECT count(*) FROM an JOIN bn USING (g)) AS BIGINT)
               AS n_inter,
             TRUE AS union_ok, TRUE AS inter_ok"""))

  // X26 — ordered funnel analysis (view → click → purchase): per user
  // the earliest ts of each stage, a later stage counting ONLY when it
  // happens strictly after the user's earliest previous stage — the
  // product-analytics staple x1's sessionization feeds into. Scale
  // shape: ONE combinable groupBy(user) of conditional min-aggregates
  // (no window, no self-join — the naive per-stage joins would be three
  // corpus-scale shuffles), then a one-row conditional count. The
  // funnel is monotone by construction (stage k requires stage k-1),
  // which the oracle's identical CASE chain certifies cross-engine.
  private val x26 = QueryDef("x26_funnel", (s, dir) => {
    // factored through operators/Retention (round 15) so the streaming
    // standing-state sink shares this exact implementation — parity by
    // construction, pinned in StreamOpsSpec
    import graft.operators.Retention
    val ev = Tables.eventsWithTsUs(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    Retention.funnelCounts(
      Retention.stageMins(ev, "user_id", "event_type", "ts_us",
        Seq("view", "click", "purchase")),
      Seq("view", "click", "purchase"))
  }, Some("""WITH pu AS (SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) t_view,
        min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) t_click,
        min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
          t_purchase
      FROM events GROUP BY user_id),
      st AS (SELECT
        t_view IS NOT NULL AS rv,
        t_view IS NOT NULL AND t_click > t_view AS rc,
        t_view IS NOT NULL AND t_click > t_view AND
          t_purchase > t_click AS rp
      FROM pu)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(CAST(rv AS BIGINT)) AS BIGINT) AS n_view,
        CAST(sum(CAST(rc AS BIGINT)) AS BIGINT) AS n_view_click,
        CAST(sum(CAST(rp AS BIGINT)) AS BIGINT) AS n_view_click_purchase
      FROM st"""))

  // X27 — retention cohorts (the activation dashboard): users cohorted
  // by FIRST-activity day, each cohort's distinct active users counted
  // at day offsets 0..7. Scale shape: one groupBy(user) for the cohort
  // day, one distinct over (user, day), one 8-byte-key join back, one
  // combinable groupBy (cohort, offset) — no window, no per-day scans.
  private val x27 = QueryDef("x27_retention_cohorts", (s, dir) => {
    // factored through operators/Retention (round 15): one-shot =
    // retentionTable(retentionState(activeDays)) — the same functions
    // the streaming sink folds per batch, so the at-ingest dashboard
    // provably equals this query (StreamOpsSpec)
    import graft.operators.Retention
    Retention.retentionTable(Retention.retentionState(
      Retention.activeDays(Tables.eventsWithTsUs(s, dir),
        "user_id", "ts_us")))
  }, Some("""WITH act AS (SELECT DISTINCT user_id,
        epoch_us(ts) // 86400000000 AS day FROM events),
      cohort AS (SELECT user_id, min(day) AS cohort_day
        FROM act GROUP BY user_id)
      SELECT c.cohort_day, a.day - c.cohort_day AS "offset",
        CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      FROM act a JOIN cohort c USING (user_id)
      WHERE a.day - c.cohort_day <= 7
      GROUP BY 1, 2"""))

  // X28 — parquet corrupt-file quarantine scan
  // (Formats.scanParquetQuarantining): the customer table written as
  // two valid parquet files plus three planted corrupt arms (truncated
  // tail, alien bytes, 4-byte stub); the scan must read every valid
  // row, list exactly the three bad files with their reasons, and
  // never die — where the plain read fails on the first bad footer
  // and ignoreCorruptFiles drops them SILENTLY (FormatsSpec pins the
  // plain-read failure). Oracle: the mirror knows the fixture, so
  // row count, quarantine count, and the sorted reason list are all
  // exact cross-engine values.
  private val x28 = QueryDef("x28_parquet_quarantine_scan", (s, dir) => {
    import graft.sources.Formats
    // Deterministic per-sf-dir fixture, built ATOMICALLY
    // (graft.core.Fixtures: staging dir + rename publish) so repeated
    // bench/verify invocations — including CONCURRENT JVMs sharing
    // /tmp — reuse one complete directory and can never scan or wipe
    // a half-built one. The `stage*` write dirs land in staging too,
    // so the published dir holds only the scan's intended files.
    val fixtureBase = graft.core.Fixtures.ensure(
      "graft_x28_" + Integer.toHexString(dir.hashCode)) { stagingDir =>
      val tmp = stagingDir.toString
      val src = Tables.customer(s, dir)
      for (i <- 1 to 2) {
        val d = s"$tmp/stage$i"
        src.filter(pmod(col("c_custkey"), lit(2)) === (i - 1).toLong)
          .coalesce(1).write.mode("overwrite").parquet(d)
        val part = new java.io.File(d).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$tmp/good$i.parquet"))
        graft.core.Fixtures.wipe(new java.io.File(d))
      }
      val goodBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$tmp/good1.parquet"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/torn.parquet"),
        java.util.Arrays.copyOfRange(goodBytes, 0, goodBytes.length - 9))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/alien.parquet"),
        "not parquet at all PAR1".getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/stub.parquet"),
        Array[Byte](80, 65, 82, 49))
    }
    val (data, quarantined) =
      Formats.scanParquetQuarantining(s, fixtureBase.toString)
    val rows = data.agg(count(lit(1)).as("n_rows"),
      sum("c_custkey").cast("long").as("key_sum"))
    val quar = quarantined.agg(
      count(lit(1)).as("n_quarantined"),
      array_join(sort_array(collect_list(col("reason"))), ",")
        .as("reasons"))
    rows.crossJoin(quar)
  }, Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        CAST(3 AS BIGINT) AS n_quarantined,
        'bad-footer-magic,bad-header-magic,too-short-for-parquet'
          AS reasons
      FROM customer"""))

  // X29 — time-series gap fill with LINEAR INTERPOLATION (the resample
  // step between w2's forward fill and real metric dashboards): per
  // user the sparse daily metric series densifies to every day between
  // the user's first and last observation, missing days interpolating
  // between the bracketing observations. Scale shape: one combinable
  // (user, day) aggregate, a per-user sequence explode (bounded by the
  // date span), and per-USER windows — never global ones; a single
  // user's row count is calendar-bounded, so the window key cannot
  // collapse. Per-day values aggregate by max (not avg — a double avg
  // is partition-order-dependent and would never hash-match); the
  // interpolation is one deterministic double expression mirrored
  // verbatim.
  private val x29 = QueryDef("x29_interpolate", (s, dir) => {
    val daily = Tables.eventsWithTsUs(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_us DIV 86400000000").as("day"),
        col("value"))
      .groupBy("user_id", "day").agg(max("value").as("v"))
      .filter(pmod(col("user_id"), lit(7L)) === 0L) // keep it sparse
    val spans = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val dense = spans
      .select(col("user_id"),
        explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
    val w = Window.partitionBy("user_id").orderBy("day")
    val prevW = w.rowsBetween(Window.unboundedPreceding, 0)
    val nextW = w.rowsBetween(0, Window.unboundedFollowing)
    dense
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(prevW))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(prevW))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(nextW))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(nextW))
      .select(col("user_id"), col("day"),
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("day") - col("pd")).cast("double") /
            (col("nd") - col("pd")).cast("double")).as("value"),
        col("v").isNotNull.as("is_observed"))
  }, Some("""WITH daily AS (SELECT user_id,
        epoch_us(ts) // 86400000000 AS day, max(value) AS v
      FROM events WHERE event_type = 'purchase'
        AND user_id % 7 = 0
      GROUP BY 1, 2),
      spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY user_id),
      grid AS (SELECT s.user_id, u.day
        FROM spans s,
          LATERAL (SELECT unnest(range(s.d0, s.d1 + 1)) AS day) u),
      dense AS (SELECT g.user_id, g.day, d.v
        FROM grid g
        LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day),
      anno AS (SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM dense)
      SELECT user_id, day,
        CASE WHEN v IS NOT NULL THEN v
             ELSE pv + (nv - pv) * CAST(day - pd AS DOUBLE)
                    / CAST(nd - pd AS DOUBLE) END AS value,
        v IS NOT NULL AS is_observed
      FROM anno"""))

  val defs: Seq[QueryDef] =
    Seq(x1, x2, x3, x4, x5, x5p, x6, x7, x8, x9, x10, x11, x12, x12p, x13,
      x14, x15,
      x16w, x16, x17, x18, x19, x20, x21, x22, x22p, x22w, x22b, x22c,
      x23,
      x24, x25, x26,
      x27, x28, x29)
}
