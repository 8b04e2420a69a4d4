package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Gold

/** Dev-only scratch main. */
object Debug {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.build("graft-debug", 4)
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val j1 = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    println("after orders join: " + j1.count())
    val j2 = j1.join(broadcast(Gold.dimCustomer(s, dir).select("c_custkey", "CustomerKey")),
      col("o_custkey") === col("c_custkey"))
    println("after customer join: " + j2.count())
    val j3 = j2.join(broadcast(Gold.dimProduct(s, dir).select("p_partkey", "ProductKey")),
      col("l_partkey") === col("p_partkey"))
    println("after product join: " + j3.count())
    val j4 = j3.join(broadcast(Gold.dimStore(s, dir).select("s_suppkey", "StoreKey")),
      col("l_suppkey") === col("s_suppkey"))
    println("after store join: " + j4.count())
    println("fact count: " + Gold.factSales(s, dir).count())
    val cached = Gold.factSales(s, dir).cache()
    println("fact count cached: " + cached.count())
    println("distinct SalesID: " +
      cached.select(countDistinct("SalesID")).collect()(0).getLong(0))
    println("max linenumber: " + li.agg(max("l_linenumber")).collect()(0))
    val sales = graft.sources.Csv.readInferred(s, "/root/reference/data/raw/sales.csv")
    println("Discount dtype: " + sales.schema("Discount").dataType)
    if (args.headOption.contains("minhash")) {
      import graft.operators.Dedup
      val docs = Tables.documents(s, "/root/testdata/sf0.1")
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      time("warm docs")(docs.count())
      val sh = docs.select(col("doc_id").as("doc"),
        Dedup.shingles("text", 3).as("sh"))
        .filter(size(col("sh")) > 0).cache()
      time("shingles materialize")(sh.count())
      val exploded = sh.select(col("doc"), explode(col("sh")).as("shingle"))
      time("exploded count")(exploded.count())
      val minAggs = (0 until 64).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
      val sig = exploded.groupBy("doc").agg(minAggs.head, minAggs.tail: _*)
      time("signatures")(sig.count())
      time("full pairs")(Dedup.minHashLshPairs(docs, "doc_id", "text").count())
      time("full pairs again")(Dedup.minHashLshPairs(docs, "doc_id", "text").count())
      s.stop(); return
    }
    s.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    val rawSales = graft.sources.Csv.readInferred(s, "/root/reference/data/raw/sales.csv")
    rawSales.select(col("OrderDate"),
        graft.operators.Cleaning.normalizeDate(col("OrderDate"), "M/dd/yy").as("norm"),
        try_to_date(col("OrderDate"), "M/dd/yy").as("direct"),
        to_date(col("OrderDate"), "M/dd/yy").as("plain"))
      .filter(col("norm").isNull).show(8, false)
    s.conf.set("spark.sql.legacy.timeParserPolicy", "CORRECTED")
    val out = graft.pipeline.ReferenceParity.run(s, "/root/reference/data/raw", "2024-11-24")
    val sc = out.salesConformed.cache()
    println("salesConformed rows: " + sc.count())
    println("null TaxRateID: " + sc.filter(col("TaxRateID").isNull).count())
    println("null ExchangeID: " + sc.filter(col("ExchangeID").isNull).count())
    println("null OrderDate: " + sc.filter(col("OrderDate").isNull).count())
    sc.filter(col("ExchangeID").isNull)
      .groupBy("ProductCountry").count().show(20, false)
    out.productsFlagged.filter(col("anomaly_type").isNotNull)
      .select("ProductID", "ProductName", "product_status").show(5, false)
    out.dimProducts.filter(col("ProductStatus") === "End of Lifecycle")
      .select("ProductID", "UnitsInStock", "UnitsOnOrder").show(20, false)
    s.stop()
  }
}
