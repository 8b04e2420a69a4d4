package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Tables
import graft.plans.DimBroadcast
import graft.schema.Star

/** Star-schema build (SURVEY §2.11 G1-G5; reference: BBT-ETL-DW
  * scripts/etl_transform/etl_gold/map_cols.py:43-284).
  *
  * Key-design departures from the reference, both scale-driven:
  *  - the reference assigns surrogate keys with monotonically_increasing_id
  *    (map_cols.py:44 etc.) — partitioning-dependent, so not reproducible.
  *    Dims here use row_number over the natural key: deterministic, and the
  *    single-partition window is fine because dims are dim-sized. For keys
  *    on FACT-sized tables we derive them arithmetically (datediff for
  *    calendar, orderkey*10+linenumber for the sales id) — zero shuffles,
  *    deterministic, valid at any scale.
  *  - dim sides of the fact build are size-guarded in two layers: the
  *    [[graft.plans.DimBroadcast.hint]] wrapper broadcasts only when the
  *    compile-time estimate fits the configured bound, and because the
  *    [[orderedId]]-keyed dims are RDD-backed (no estimate) the hint
  *    stands down entirely and AQE converts the shuffle join to
  *    broadcast at RUNTIME from actual sizes (GoldWarehouseSpec asserts
  *    the conversion). Either way a scaling dim can never force-OOM the
  *    driver. The only always-wide exchange is fact x orders on the
  *    order key.
  */
object Gold {

  /** G1 — deterministic surrogate key: contiguous ids in natural-key
    * order via [[orderedId]]. Identical ids to
    * `row_number().over(Window.orderBy(naturalKey))` (GoldWarehouseSpec
    * pins the equality) but without the single-partition collapse — the
    * reference's dims are bounded, ours (customer/part/supplier) GROW
    * with SF, so the key assignment itself must scale. One consequence:
    * the output is RDD-backed, so Catalyst has no size estimate for it
    * and compile-time broadcast hints stand down — AQE's runtime
    * conversion picks broadcast from the ACTUAL shuffle sizes instead
    * (asserted in GoldWarehouseSpec), which is the better mechanism at
    * every scale.
    */
  def withSurrogateKey(df: DataFrame, naturalKey: String,
                       keyName: String): DataFrame =
    orderedId(df, Seq(naturalKey), keyName)

  /** Contiguous 1-based ids in global sort order WITHOUT a global window:
    * `row_number().over(Window.orderBy(...))` collapses the whole table
    * into one partition (the reference's W1 shape, add_columns.py:170-173
    * — fine at 72 rows, fatal at scale). Here the table is range-
    * partitioned and sorted on the order columns, then ids come from a
    * per-partition count + offset pass (`zipWithIndex`): two light jobs,
    * every partition stays parallel, and for a total ordering (unique
    * order-column tuples) the assigned ids are IDENTICAL to the global
    * window's.
    *
    * EAGERNESS caveat: the range-partitioner's sampling and
    * zipWithIndex's partition-count job run when this method is CALLED,
    * not at the first downstream action (both are computed in the RDD
    * constructors). Construct keyed frames once and reuse them; a fully
    * lazy variant would trade this for an extra shuffle (window over
    * spark_partition_id) and is not worth it for id assignment that
    * happens once per pipeline build.
    *
    * For frames KNOWN BOUNDED by construction use [[orderedIdBounded]]
    * instead — fully lazy, no RDD round-trip.
    */
  def orderedId(df: DataFrame, orderCols: Seq[String],
                name: String): DataFrame = {
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** [[orderedId]] for frames KNOWN BOUNDED by construction (reference-
    * parity dims, lookup tables): a plain row_number over a global sort.
    * Entirely LAZY — no construction jobs, no RDD round-trip (the
    * zipWithIndex form's `.rdd` makes AQE materialize every upstream
    * shuffle stage AT CALL TIME, which serialized ~2 jobs per call site
    * through the parity pipeline), and Catalyst keeps optimizing through
    * it. The price is the single-partition window collapse — fatal on an
    * SF-scaling table, irrelevant on a bounded one; callers assert
    * boundedness, the default [[orderedId]] stays the scaling path. Ids
    * are identical to [[orderedId]]'s for total orderings.
    */
  def orderedIdBounded(df: DataFrame, orderCols: Seq[String],
                       name: String): DataFrame =
    df.withColumn(name, row_number()
      .over(Window.orderBy(orderCols.map(col): _*)).cast("long"))

  /** G2 — SCD2 scaffolding columns (map_cols.py:89-91: IsCurrent=true,
    * fixed effective-start, open end date).
    */
  def withScd2(df: DataFrame, startDate: String): DataFrame =
    df.withColumn("IsCurrent", lit(true))
      .withColumn("EffectiveStartDate", lit(startDate).cast("date"))
      .withColumn("EffectiveEndDate", lit(null).cast("date"))

  /** G4 — calendar dim: date spine + parts (map_cols.py:199-224). The key
    * is datediff-from-anchor: deterministic and computable on a fact row
    * without joining the dim.
    */
  def calendarDim(s: SparkSession, from: String, to: String): DataFrame =
    s.sql(s"""SELECT explode(sequence(to_date('$from'), to_date('$to'),
                interval 1 day)) AS CalendarDate""")
      .select(
        (datediff(col("CalendarDate"), lit(from).cast("date")) + 1)
          .cast("long").as("CalendarKey"),
        col("CalendarDate"),
        year(col("CalendarDate")).cast("long").as("Year"),
        quarter(col("CalendarDate")).cast("long").as("Quarter"),
        month(col("CalendarDate")).cast("long").as("Month"),
        dayofweek(col("CalendarDate")).cast("long").as("DayOfWeek"))

  /** Calendar anchor for the testdata fact (orders start 1995-01-01). */
  val calendarAnchor = "1995-01-01"

  /** Memo of [[orderedId]]-keyed dim frames, per session and dim+dir.
    * Because orderedId runs its sampling/count jobs at CONSTRUCTION (see
    * its caveat), every re-construction of factSales — plan inspection,
    * repeated query runs, DimBroadcast stats access — would otherwise
    * re-pay ~2 jobs per dim; the memo makes dim keying once-per-session.
    *
    * A weak-key map cannot reclaim these entries: the DataFrame values
    * strongly reference their SparkSession key, pinning each entry for
    * the map's lifetime. Strong identity keys plus an eviction sweep of
    * stopped sessions on every access keep long-lived multi-session JVMs
    * from accumulating dead sessions' plans instead.
    */
  private val dimMemo =
    new java.util.IdentityHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]()

  private def memoizedDim(s: SparkSession, key: String)
                         (build: => DataFrame): DataFrame =
    dimMemo.synchronized {
      val it = dimMemo.keySet.iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var perSession = dimMemo.get(s)
      if (perSession == null) {
        perSession = scala.collection.mutable.Map.empty[String, DataFrame]
        dimMemo.put(s, perSession)
      }
      perSession.getOrElseUpdate(key, build)
    }

  def dimCustomer(s: SparkSession, dir: String): DataFrame =
    memoizedDim(s, s"customer:$dir") {
      withScd2(
        withSurrogateKey(Tables.customer(s, dir), "c_custkey",
          "CustomerKey"),
        "2024-01-01")
    }

  def dimProduct(s: SparkSession, dir: String): DataFrame =
    memoizedDim(s, s"product:$dir") {
      withSurrogateKey(Tables.part(s, dir), "p_partkey", "ProductKey")
    }

  def dimStore(s: SparkSession, dir: String): DataFrame =
    memoizedDim(s, s"store:$dir") {
      withSurrogateKey(Tables.supplier(s, dir), "s_suppkey", "StoreKey")
    }

  /** G5 — fact assembly (map_cols.py:226-284): natural->surrogate mapping
    * through the dim chain, degenerate dims kept on the fact, measures at
    * line grain.
    */
  def factSales(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    // Line id: the synthetic lineitem repeats l_linenumber within an order,
    // so the unique line ordinal comes from a PARTITIONED window (per-order
    // partitions — scales, unlike a global orderBy). The full-column
    // ordering is total (no duplicate rows), hence deterministic.
    val lineId = row_number().over(
      Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate"))
    Tables.lineitem(s, dir)
      .withColumn("__line", lineId.cast("long"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(DimBroadcast.hint(
          dimCustomer(s, dir).select("c_custkey", "CustomerKey")),
        col("o_custkey") === col("c_custkey"))
      .join(DimBroadcast.hint(
          dimProduct(s, dir).select("p_partkey", "ProductKey")),
        col("l_partkey") === col("p_partkey"))
      .join(DimBroadcast.hint(
          dimStore(s, dir).select("s_suppkey", "StoreKey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(
        (col("l_orderkey") * 100 + col("__line")).cast("long")
          .as("SalesID"),
        col("CustomerKey"), col("ProductKey"), col("StoreKey"),
        (datediff(col("o_orderdate").cast("date"),
          lit(calendarAnchor).cast("date")) + 1).cast("long")
          .as("CalendarKey"),
        col("l_orderkey").as("OrderID"),
        col("o_orderdate").cast("date").as("OrderDate"),
        col("l_quantity").as("Quantity"),
        col("l_discount").as("Discount"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("Revenue"))
  }

  /** [[factSales]] as a typed Dataset: field access is compile-checked
    * downstream (SURVEY §1.1 — fixed Gold schema, so encoders fit).
    */
  def factSalesTyped(s: SparkSession, dir: String): Dataset[Star.FactSales] = {
    import s.implicits._
    factSales(s, dir).as[Star.FactSales]
  }
}
