package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.Exact

/** Sources/sinks (SURVEY §2.1), projections (§2.2), filters (§2.3) and
  * scalar expressions (§2.4), each registered with a DuckDB oracle.
  *
  * Reference semantics being re-expressed (cited per query): BBT-ETL-DW
  * scripts/etl_extract.py (CSV scan), scripts/etl_transform/add_columns.py
  * (derived columns), scripts/etl_transform/data_cleaning.py (when/cast
  * normalization), scripts/etl_transform/etl_gold/map_cols.py (date spine,
  * typed-null scaffolding).
  */
object Relational {

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft/$name"

  // S1 — CSV scan with header + explicit schema (etl_extract.py:48 uses
  // inferSchema; production path here pins the schema to avoid the
  // double-scan inference costs at scale). Round-trips `region` through CSV
  // so the oracle can check against the original parquet.
  private val s1 = QueryDef("s1_csv_scan", (s, dir) => {
    val out = tmp("s1_region_csv")
    Tables.region(s, dir)
      .write.mode("overwrite").option("header", "true").csv(out)
    s.read
      .option("header", "true")
      .schema(StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType))))
      .csv(out)
  }, Some("SELECT r_regionkey, r_name FROM region"))

  // S2 — parquet scan + pushed-down aggregate over the biggest table.
  private val s2 = QueryDef("s2_parquet_scan", (s, dir) => {
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      min("l_orderkey").as("min_ok"),
      max("l_orderkey").as("max_ok"))
  }, Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
             FROM lineitem"""))

  // S3 — parquet sink (overwrite) then re-scan; mirrors the medallion-layer
  // writes (etl_extract.py:54 etc.). Oracle reads the source table directly.
  private val s3 = QueryDef("s3_parquet_sink", (s, dir) => {
    val out = tmp("s3_nation_parquet")
    Tables.nation(s, dir).write.mode("overwrite").parquet(out)
    s.read.parquet(out)
  }, Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  // S5 — literal/range source (map_cols.py:204-206 date spine uses the same
  // shape; numeric variant here, date spine is e11/g4).
  private val s5 = QueryDef("s5_range_source", (s, _) => {
    s.range(1000).agg(
      sum("id").cast("long").as("sum_id"),
      count(lit(1)).as("n"))
  }, Some("""SELECT CAST(sum(r.range) AS BIGINT) AS sum_id,
             CAST(count(*) AS BIGINT) AS n FROM range(1000) r"""))

  // S6 — local-collection source (notebooks/etl_audit.ipynb cell 1 builds an
  // inline DataFrame the same way).
  private val s6 = QueryDef("s6_local_collection", (s, _) => {
    import s.implicits._
    Seq((1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", 30.0))
      .toDF("id", "tag", "score")
  }, Some("""SELECT id, tag, CAST(score AS DOUBLE) AS score
             FROM (VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25),
             (3, 'gamma', 30.0)) AS t(id, tag, score)"""))

  // P1 — select + alias (fixed Gold schemas, map_cols.py:43-49).
  private val p1 = QueryDef("p1_select_alias", (s, dir) => {
    Tables.lineitem(s, dir).select(
      col("l_orderkey").as("okey"),
      col("l_linenumber").as("line"),
      col("l_returnflag").as("rflag"),
      col("l_extendedprice").as("price"))
  }, Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
             l_returnflag AS rflag, l_extendedprice AS price FROM lineitem"""))

  // P2 — withColumn derive (add_columns.py:89-92 TotalAmount shape).
  private val p2 = QueryDef("p2_withcolumn", (s, dir) => {
    Tables.lineitem(s, dir)
      .withColumn("gross", col("l_extendedprice") * (lit(1.0) + col("l_tax")))
      .select("l_orderkey", "l_linenumber", "gross")
  }, Some("""SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 + l_tax) AS gross FROM lineitem"""))

  // P3 — withColumnRenamed (data_cleaning.py:133 suffix-strip shape).
  private val p3 = QueryDef("p3_rename", (s, dir) => {
    Tables.orders(s, dir)
      .withColumnRenamed("o_orderkey", "order_id")
      .withColumnRenamed("o_custkey", "customer_id")
      .select("order_id", "customer_id", "o_orderstatus")
  }, Some("""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
             o_orderstatus FROM orders"""))

  // P4 — multi-column drop (sales_tax.py:76-77).
  private val p4 = QueryDef("p4_drop", (s, dir) => {
    Tables.customer(s, dir).drop("c_acctbal", "c_mktsegment")
  }, Some("SELECT c_custkey, c_name, c_nationkey FROM customer"))

  // P5 — distinct projection (map_cols.py:179).
  private val p5 = QueryDef("p5_distinct", (s, dir) => {
    Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
  }, Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  // P6 — programmatic column-list select (add_columns.py:122-124 builds
  // columns_to_save = df.columns + [derived]).
  private val p6 = QueryDef("p6_collist_select", (s, dir) => {
    val df = Tables.part(s, dir)
    val derived = (col("p_retailprice") * lit(0.9)).as("discounted")
    df.select(df.columns.map(col).toSeq :+ derived: _*)
  }, Some("SELECT *, p_retailprice * 0.9 AS discounted FROM part"))

  // F1 — null/not-null predicates (audit_report.py:52, sales_tax.py:70-73).
  // nullif manufactures nulls so the predicate actually discriminates.
  private val f1 = QueryDef("f1_null_pred", (s, dir) => {
    Tables.events(s, dir)
      .withColumn("props_nn", expr("nullif(props, '{\"k\": 0}')"))
      .filter(col("props_nn").isNotNull && col("value").isNotNull)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
  }, Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
             WHERE nullif(props, '{"k": 0}') IS NOT NULL
               AND value IS NOT NULL
             GROUP BY event_type"""))

  // F2 — regex filter (audit_report.py:107,123-127 format checks).
  private val f2 = QueryDef("f2_rlike", (s, dir) => {
    Tables.documents(s, dir)
      .filter(col("text").rlike("join .* filter|window .* scan"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
  }, Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
             WHERE regexp_matches(text, 'join .* filter|window .* scan')
             GROUP BY lang"""))

  // F3 — comparison predicates (audit_report.py:113-138).
  private val f3 = QueryDef("f3_compare", (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 30 && col("l_discount") < 0.05)
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("double").as("qty"))
  }, Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(l_quantity) AS DOUBLE) AS qty
             FROM lineitem WHERE l_quantity >= 30 AND l_discount < 0.05"""))

  // F4 — set membership (sales_currency.py:103-110 eurozone isin).
  private val f4 = QueryDef("f4_isin", (s, dir) => {
    Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
  }, Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n FROM customer
             WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
             GROUP BY c_mktsegment"""))

  // F5 — date-window filter (anomalies.py:84,91 last-365-days shape, with a
  // fixed window for determinism).
  private val f5 = QueryDef("f5_date_window", (s, dir) => {
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("n"), Exact.exactSum(col("o_totalprice"), 2).as("spend"))
  }, Some(s"""SELECT CAST(count(*) AS BIGINT) AS n,
             ${Exact.exactSumSql("o_totalprice", 2)} AS spend
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
               AND o_orderdate < TIMESTAMP '1999-01-01'"""))

  // F6 — compound boolean (&&, ||, !) (audit_report.py:113 etc.).
  private val f6 = QueryDef("f6_compound", (s, dir) => {
    Tables.lineitem(s, dir)
      .filter((col("l_returnflag") === "R" || col("l_linestatus") === "O") &&
        !(col("l_discount") > 0.08))
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
  }, Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
             FROM lineitem
             WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
               AND NOT (l_discount > 0.08)
             GROUP BY l_returnflag, l_linestatus"""))

  // E1 — when/otherwise tiering (add_columns.py:113-118 VIP/Regular bands).
  private val e1 = QueryDef("e1_case_when", (s, dir) => {
    Tables.customer(s, dir)
      .withColumn("tier",
        when(col("c_acctbal") > 8000, "VIP")
          .when(col("c_acctbal") >= 1000, "Regular")
          .otherwise("Inactive"))
      .groupBy("tier").agg(count(lit(1)).as("n"))
  }, Some("""SELECT CASE WHEN c_acctbal > 8000 THEN 'VIP'
                    WHEN c_acctbal >= 1000 THEN 'Regular'
                    ELSE 'Inactive' END AS tier,
             CAST(count(*) AS BIGINT) AS n
             FROM customer GROUP BY 1"""))

  // E2 — lit constants incl. typed null (map_cols.py:89-91 SCD2 scaffold).
  private val e2 = QueryDef("e2_lit_typed_null", (s, dir) => {
    Tables.nation(s, dir).select(
      col("n_name"),
      lit(42).as("const_i"),
      lit("x").as("const_s"),
      lit(null).cast("date").as("null_d"))
  }, Some("""SELECT n_name, 42 AS const_i, 'x' AS const_s,
             CAST(NULL AS DATE) AS null_d FROM nation"""))

  // E3 — casts (audit_report.py:113-138; map_cols.py:91,139).
  private val e3 = QueryDef("e3_cast", (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 500 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast("int").cast("long").as("qty_i"),
        col("l_orderkey").cast("string").as("ok_s"),
        col("l_shipdate").cast("date").as("ship_d"))
  }, Some("""SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_quantity AS INTEGER) AS BIGINT) AS qty_i,
             CAST(l_orderkey AS VARCHAR) AS ok_s,
             CAST(l_shipdate AS DATE) AS ship_d
             FROM lineitem WHERE l_orderkey % 500 = 0"""))

  // E4 — regexp_extract (data_cleaning.py:175).
  private val e4 = QueryDef("e4_regexp_extract", (s, dir) => {
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "(\\d+)", 1)
        .cast("long"))
      .groupBy("event_type").agg(sum("k").cast("long").as("k_sum"))
  }, Some("""SELECT event_type,
             CAST(sum(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT))
                  AS BIGINT) AS k_sum
             FROM events GROUP BY event_type"""))

  // E5 — date format + parse round trip (data_cleaning.py:184-190
  // normalizes to yyyy-MM-dd; the M/d/yy LEGACY path is pinned in
  // CleaningSpec because DuckDB's %y century rule differs from Java's).
  private val e5 = QueryDef("e5_date_format", (s, dir) => {
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 500 === 0)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("d"))
  }, Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso,
             CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS d
             FROM orders WHERE o_orderkey % 500 = 0"""))

  // E6 — date parts (map_cols.py:211-214; sales_tax.py:58). Spark dayofweek
  // is 1=Sunday; DuckDB dayofweek is 0=Sunday, hence the +1 in the oracle.
  private val e6 = QueryDef("e6_date_parts", (s, dir) => {
    Tables.orders(s, dir)
      .select(
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to"))
      .groupBy("yr", "qtr", "mth").agg(
        count(lit(1)).as("n"),
        min("dow").as("min_dow"),
        max("days_to").as("max_days_to"))
  }, Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(month(o_orderdate) AS BIGINT) AS mth,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(dayofweek(o_orderdate) + 1) AS BIGINT) AS min_dow,
             CAST(max(datediff('day', CAST(o_orderdate AS DATE),
                               DATE '2002-01-01')) AS BIGINT) AS max_days_to
             FROM orders GROUP BY 1, 2, 3"""))

  // E7 — arithmetic (add_columns.py:89-92 TotalAmount). Per-row doubles are
  // bit-identical across engines when the expression tree matches.
  private val e7 = QueryDef("e7_arithmetic", (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 500 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charge"))
  }, Some("""SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
             FROM lineitem WHERE l_orderkey % 500 = 0"""))

  // E8 — string ops + equality/empty checks (data_cleaning.py:171,
  // add_columns.py:136).
  private val e8 = QueryDef("e8_strings", (s, dir) => {
    Tables.customer(s, dir)
      .filter(col("c_custkey") % 100 === 0)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_u"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(col("c_mktsegment"), lit("/"),
          col("c_nationkey").cast("string")).as("seg_nat"),
        (trim(col("c_mktsegment")) === "").cast("boolean").as("is_empty"))
  }, Some("""SELECT c_custkey, upper(c_name) AS name_u,
             CAST(length(c_name) AS BIGINT) AS name_len,
             c_mktsegment || '/' || CAST(c_nationkey AS VARCHAR) AS seg_nat,
             trim(c_mktsegment) = '' AS is_empty
             FROM customer WHERE c_custkey % 100 = 0"""))

  // E9 — fillna policy map (data_cleaning.py:81-105; add_columns.py:108).
  private val e9 = QueryDef("e9_fillna", (s, dir) => {
    Tables.customer(s, dir)
      .withColumn("seg2", expr("nullif(c_mktsegment, 'BUILDING')"))
      .withColumn("bal2", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .na.fill(Map("seg2" -> "Unknown", "bal2" -> 0.0))
      .groupBy("seg2").agg(
        count(lit(1)).as("n"),
        Exact.exactSum(col("bal2"), 2).as("bal_sum"))
  }, Some(s"""SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), 'Unknown') AS seg2,
             CAST(count(*) AS BIGINT) AS n,
             ${Exact.exactSumSql("coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)", 2)} AS bal_sum
             FROM customer GROUP BY 1"""))

  // E10 — monotonically_increasing_id (map_cols.py:44 etc.). Values are
  // partitioning-dependent, so the check asserts the invariant that matters:
  // ids are unique, one per row.
  private val e10 = QueryDef("e10_mono_id", (s, dir) => {
    Tables.supplier(s, dir)
      .withColumn("sk", monotonically_increasing_id())
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("sk")).as("n_ids"))
  }, Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_ids FROM supplier"""))

  // E11 — explode(sequence(...)) date spine (map_cols.py:204-206).
  private val e11 = QueryDef("e11_date_spine", (s, _) => {
    s.sql("""SELECT explode(sequence(to_date('2022-01-01'),
             to_date('2025-01-01'), interval 1 day)) AS cal_date""")
  }, Some("""SELECT CAST(r.range AS DATE) AS cal_date
             FROM range(DATE '2022-01-01', DATE '2025-01-02',
                        INTERVAL 1 DAY) r"""))

  // E12 — coalesce fallback (sales_currency.py:97-100).
  private val e12 = QueryDef("e12_coalesce", (s, dir) => {
    Tables.events(s, dir)
      .filter(col("event_id") % 97 === 0)
      .select(
        col("event_id"),
        coalesce(expr("nullif(event_type, 'view')"), lit("filtered"))
          .as("etype"),
        coalesce(when(col("value") > 100, col("value")), lit(-1.0))
          .as("big_value"))
  }, Some("""SELECT event_id,
             coalesce(nullif(event_type, 'view'), 'filtered') AS etype,
             coalesce(CASE WHEN value > 100 THEN value END, -1.0) AS big_value
             FROM events WHERE event_id % 97 = 0"""))

  val defs: Seq[QueryDef] = Seq(
    s1, s2, s3, s5, s6,
    p1, p2, p3, p4, p5, p6,
    f1, f2, f3, f4, f5, f6,
    e1, e2, e3, e4, e5, e6, e7, e8, e9, e10, e11, e12)
}
