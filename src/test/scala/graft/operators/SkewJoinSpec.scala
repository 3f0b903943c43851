package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must be row-identical to the plain join, and approximate
  * aggregates must land near their exact counterparts. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join (inner)") {
    val li = Tables(spark, sf, "lineitem")
    val orders = Tables(spark, sf, "orders")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
    val salted = SkewJoin
      .saltedJoin(li, orders, "l_orderkey", "o_orderkey", k = 7)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val customer = Tables(spark, sf, "customer")
    val recent = Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    val plain = customer
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("matched"))
    val salted = SkewJoin
      .saltedJoin(customer, recent, "c_custkey", "o_custkey", k = 5, "left")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("matched"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("approximate aggregates land near exact values") {
    val orders = Tables(spark, sf, "orders")
    val row = orders.agg(
      countDistinct("o_custkey").as("exact_d"),
      approx_count_distinct("o_custkey", 0.02).as("approx_d"),
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"))
      .head()
    val (ed, ad) = (row.getAs[Long]("exact_d"), row.getAs[Long]("approx_d"))
    assert(math.abs(ad - ed).toDouble / ed < 0.05, s"HLL off: $ad vs $ed")
    val (ep, ap) = (row.getAs[Double]("exact_p50"), row.getAs[Double]("approx_p50"))
    assert(math.abs(ap - ep) / ep < 0.05, s"quantile sketch off: $ap vs $ep")
  }
}
