package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket association rules — pairwise support / confidence /
  * lift over order baskets (the A-Priori first pass, Agrawal & Srikant
  * 1994), the classic affinity rollup beside the reference's
  * group-by-count validations (`internal/validate/validate.go:53`).
  *
  * Scale shape: baskets are per-order item SETS, so the pair stage is a
  * SELF-EQUI-JOIN on the order key — in-join pairs are bounded by
  * C(basket_size, 2) per order with basket size bounded by items-per-
  * order (a domain constant, ~13 here), never corpus-quadratic; shuffle
  * ∝ basket items ≈ lineitems. Items are part BRANDS (dim-bounded, 25)
  * joined in via a hinted broadcast, so item counts and the rule table
  * are dim²-bounded and broadcast back. The support floor is RELATIVE
  * (pair_count·50 ≥ n_orders, i.e. 2% — integer cross-multiplication,
  * no float threshold) so the same rule binds at every corpus size.
  * Lift keeps full precision by forming both integer products exactly
  * in BIGINT and paying ONE double division — IEEE-identical
  * cross-engine, pinned by the hash gate. */
object MarketBasket {

  /** Relative support floor: pair must appear in ≥ 1/SupportDen of baskets. */
  val SupportDen = 50L

  def marketBasket(s: SparkSession, dir: String): DataFrame = {
    // Basket-first shape (optimization guide §2.3/§2.4): ONE corpus
    // exchange builds per-order item sets (collect_set both dedups —
    // replacing the former distinct() shuffle — and groups); the pair
    // stage then explodes C(basket,2) combinations IN-TASK from the
    // sorted set instead of a corpus self-join on the order key (which
    // cost two more corpus exchanges). Sorted set + "later elements
    // only" is exactly the former item_a < item_b join condition, so
    // pair_count / item counts / n_orders are row-identical.
    val baskets = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      .groupBy("ok").agg(array_sort(collect_set(col("item"))).as("items"))
      .localCheckpoint(true) // read 3×: n_orders + item counts + pairs
    val n1 = baskets.agg(count(lit(1)).as("n_orders"))
    val itemCounts = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("c"))
    val pairs = baskets.select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "y -> struct(x AS item_a, y AS item_b))))")).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("pair_count"))
    pairs
      .crossJoin(broadcast(n1))
      .filter(col("pair_count") * SupportDen >= col("n_orders"))
      .join(broadcast(itemCounts.toDF("item_a", "count_a")), "item_a")
      .join(broadcast(itemCounts.toDF("item_b", "count_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("pair_count"),
        col("count_a"), col("count_b"), col("n_orders"),
        round(col("pair_count").cast("double") /
          col("n_orders").cast("double"), 6).as("support"),
        round(col("pair_count").cast("double") /
          col("count_a").cast("double"), 6).as("conf_ab"),
        round(col("pair_count").cast("double") /
          col("count_b").cast("double"), 6).as("conf_ba"),
        round((col("n_orders") * col("pair_count")).cast("double") /
          (col("count_a") * col("count_b")).cast("double"), 6).as("lift"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "market_basket" -> marketBasket)

  val oracles: Map[String, String] = Map(
    "market_basket" ->
      s"""WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM items),
        |ic AS (SELECT item, count(*)::BIGINT AS c FROM items GROUP BY 1),
        |pc AS (
        |  SELECT a.item AS item_a, b.item AS item_b,
        |         count(*)::BIGINT AS pair_count
        |  FROM items a JOIN items b
        |    ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2)
        |SELECT pc.item_a, pc.item_b, pc.pair_count,
        |  ca.c AS count_a, cb.c AS count_b, tot.n_orders,
        |  round(pc.pair_count::DOUBLE / tot.n_orders::DOUBLE, 6) AS support,
        |  round(pc.pair_count::DOUBLE / ca.c::DOUBLE, 6) AS conf_ab,
        |  round(pc.pair_count::DOUBLE / cb.c::DOUBLE, 6) AS conf_ba,
        |  round((tot.n_orders * pc.pair_count)::DOUBLE /
        |        (ca.c * cb.c)::DOUBLE, 6) AS lift
        |FROM pc
        |CROSS JOIN tot
        |JOIN ic ca ON pc.item_a = ca.item
        |JOIN ic cb ON pc.item_b = cb.item
        |WHERE pc.pair_count * $SupportDen >= tot.n_orders""".stripMargin)
}
