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
    println("sales schema: " + sales.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    val products = graft.sources.Csv.readInferred(s, "/root/reference/data/raw/products.csv")
    println("products schema: " + products.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    products.filter(col("UnitPrice").try_cast("float").isNull ||
        col("UnitPrice").try_cast("int") <= 0)
      .select("ProductID", "UnitPrice").show(10, false)
    s.stop()
  }
}
