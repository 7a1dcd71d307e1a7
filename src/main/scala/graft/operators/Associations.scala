package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association analysis: co-occurrence support and lift
  * over transaction "baskets" (the classic Agrawal-Srikant frequent-
  * itemset surface, restricted to pairs — the tier a curation pipeline
  * reads before paying for full itemset mining).
  *
  * Not in the reference (its only job is word count — SURVEY.md §2.5);
  * this is the relational sibling of the text tier's collocation scoring
  * (q84): same "observed together vs expected under independence"
  * contract, over order contents instead of token bigrams.
  *
  * Scale posture (100 TB): pair explosion is bounded by the basket-size
  * cap — a basket of m items emits C(m,2) pairs, so `maxBasket` bounds
  * per-basket work at a constant independent of corpus size (the
  * NearDupMaxBucket argument; oversized baskets are bulk-order noise for
  * association purposes and are dropped WHOLE, mirrored by the oracle so
  * the capped path is what the gate checks). Everything else is
  * equi-join + map-side-combinable counts; the item dimension (brands)
  * is broadcast-sized.
  *
  * Determinism: support counts are exact BIGINT; `support_ppm` is BIGINT
  * floor division; `lift` is one double division of exact-in-double
  * integers rounded at 4 dp — bit-identical in any IEEE engine. (At
  * corpus sizes where n_ab · n_baskets approaches 2^53, switch the lift
  * arithmetic to DECIMAL — the q126 caveat.)
  */
object Associations {

  /** Pairwise brand association over order baskets: one row per
    * unordered brand pair with co-occurrence support, per-item support,
    * ppm support, and lift = P(a,b) / (P(a)·P(b)).
    *
    * `minSupport` keeps the output to statistically meaningful pairs
    * (and bounds it at any sf); `maxBasket` is the scale cap above.
    */
  def brandLift(lineitem: DataFrame, part: DataFrame,
      minSupport: Long = 20L, maxBasket: Int = 16): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    // basket = the distinct brand set of one order
    val items = lineitem.select(col("l_orderkey").as("basket"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("basket"), col("p_brand").as("item"))
      .distinct()
    // cap: drop oversized baskets WHOLE (both the pair and single-item
    // counts must see the same basket population or lift skews)
    val sized = items.groupBy("basket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBasket)
      .select("basket")
    val kept = items.join(sized, Seq("basket"), "left_semi")
    val nBaskets = kept.select("basket").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val singles = kept.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(singles.select(col("item").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(singles.select(col("item").as("item_b"), col("n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets)) // 1-row total — bounded by construction
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_baskets"),
        expr("(n_ab * 1000000) div n_baskets").as("support_ppm"),
        round(col("n_ab").cast("double") * col("n_baskets")
          / (col("n_a") * col("n_b")), 4).as("lift"))
  }
}
