package graft.schema

import java.sql.Date

/** Typed Gold-layer records (SURVEY §1.1: case-class Encoders for the
  * star schema — compile-time column safety where the schema is fixed).
  */
object Star {

  final case class DimCustomer(
      CustomerKey: Long, c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String,
      IsCurrent: Boolean, EffectiveStartDate: Date,
      EffectiveEndDate: Option[Date])

  final case class DimProduct(
      ProductKey: Long, p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)

  final case class DimStore(
      StoreKey: Long, s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)

  final case class FactSales(
      SalesID: Long, CustomerKey: Long, ProductKey: Long, StoreKey: Long,
      CalendarKey: Long, OrderID: Long, OrderDate: Date, Quantity: Double,
      Discount: Double, Revenue: Double)
}
