package graft.queries

import graft.tables.Tables
import graft.syntax._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The remaining TPC-H query shapes (Q2,4,7–22), completing the 22-query
  * suite started in [[Relational]] (Q1/Q3/Q5/Q6). The driver corpus is
  * TPC-H-ish but slimmer — no `partsupp` table, no
  * commit/receipt dates, ship modes, phones, or comments — so each query
  * keeps its CANONICAL PLAN SHAPE (the property the suite actually
  * benchmarks: semi/anti joins, correlated-subquery decorrelation,
  * disjunctive join predicates, two-level aggregation, scalar-subquery
  * cutoffs) and adapts the missing column to a derivable stand-in,
  * documented per query.
  *
  * Cross-engine determinism follows the Relational module's two rules:
  * money/derived sums go through DECIMAL (associative), and every query
  * ends in a total-order sort. Any top-k cut orders by a once-ROUNDED
  * measure with a key tiebreak (q3 discipline) so the boundary row is
  * identical in both engines.
  *
  * Scale notes common to all: region/nation/supplier/part are dimension
  * tables (broadcast — the fact side never shuffles for them); customer
  * follows the q5 precedent (broadcast at these SFs; at 100 TB it would
  * be the one dimension worth bucketing). The only exchanges are
  * lineitem⋈orders on orderkey and explicit groupBys; data-dependent
  * small sides (q18's >300-qty orders, q15's max-revenue row) are left
  * unhinted for AQE to convert at runtime.
  */
object Tpch {
  type Q = (SparkSession, String) => DataFrame

  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  private def derivedSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  private def revenue: Column = $"l_extendedprice" * (lit(1.0) - $"l_discount")

  /** Nations of one region with the region name attached (broadcast leaf). */
  private def regionNations(s: SparkSession, d: String, r: String): DataFrame =
    Tables
      .nation(s, d)
      .join(
        broadcast(Tables.region(s, d).filter($"r_name" === r).select($"r_regionkey")),
        $"n_regionkey" === $"r_regionkey"
      )
      .select($"n_nationkey", $"n_name")

  // ---------------------------------------------------------------------
  // Q2 — minimum-cost supplier. No partsupp: the (part, supplier)
  // relationship is the DISTINCT (l_partkey, l_suppkey) pairs actually
  // shipped, and ps_supplycost's stand-in for the MIN is s_acctbal. The
  // correlated `= (SELECT MIN ...)` is hand-decorrelated into a per-part
  // MIN aggregate joined back — the same rewrite Catalyst's
  // RewriteCorrelatedScalarSubquery performs, made explicit so the plan
  // is two passes over the small pair set instead of a per-row subquery.
  // ---------------------------------------------------------------------
  val q2MinAcctSupp: Q = (s, d) => {
    val eur = regionNations(s, d, "EUROPE")
    val sup = Tables
      .supplier(s, d)
      .join(broadcast(eur), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val pts = Tables.part(s, d).filter($"p_size" === 15).select($"p_partkey", $"p_brand")
    val cand = Tables
      .lineitem(s, d)
      .select($"l_partkey", $"l_suppkey")
      .distinct() // one shuffle on the pair key; everything below is map-side
      .join(broadcast(pts), $"l_partkey" === $"p_partkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand")
    val minBal = cand.groupBy($"p_partkey".as("mb_partkey")).agg(min($"s_acctbal").as("min_bal"))
    cand
      .join(minBal, $"p_partkey" === $"mb_partkey" && $"s_acctbal" === $"min_bal")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
  }

  // ---------------------------------------------------------------------
  // Q4 — order-priority checking. The commit/receipt lateness predicate
  // becomes "some lineitem shipped more than 30 days after the order
  // date"; the EXISTS keeps its plan shape: a LEFT SEMI join with a
  // cross-side range conjunct on top of the orderkey equi-key.
  // ---------------------------------------------------------------------
  val q4OrderPriority: Q = (s, d) => {
    val ord = Tables
      .orders(s, d)
      .filter(
        $"o_orderdate" >= lit("1997-07-01").cast("date") &&
          $"o_orderdate" < lit("1997-10-01").cast("date")
      )
    val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
    ord
      .join(
        li,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi"
      )
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------------
  // Q7 — volume shipping between two trade blocs. The fixed nation pair
  // is region-level here (single nations are empty at sf0.001 with 10
  // suppliers); the disjunctive pair predicate and the
  // (supp, cust, year) rollup survive intact.
  // ---------------------------------------------------------------------
  val q7RegionVolume: Q = (s, d) => {
    val supBloc = Tables
      .supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"r_name".as("supp_region"))
    val custBloc = Tables
      .customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"r_name".as("cust_region"))
    Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("date") &&
          $"l_shipdate" < lit("1998-01-01").cast("date")
      )
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate", revenue.as("volume"))
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supBloc), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(custBloc), $"o_custkey" === $"c_custkey")
      .filter(
        ($"supp_region" === "ASIA" && $"cust_region" === "EUROPE") ||
          ($"supp_region" === "EUROPE" && $"cust_region" === "ASIA")
      )
      .groupBy($"supp_region", $"cust_region", year($"l_shipdate").cast("int").as("l_year"))
      .agg(derivedSum($"volume").as("volume"))
      .select($"supp_region", $"cust_region", $"l_year", round($"volume", 6).as("volume"))
      .orderBy($"supp_region", $"cust_region", $"l_year")
  }

  // ---------------------------------------------------------------------
  // Q8 — national market share: of the ECONOMY-part revenue sold to
  // AMERICA-region customers, the fraction supplied by NATION_6, per
  // order year. Numerator and denominator are separate DECIMAL sums cast
  // to double once; the division is a single deterministic double op.
  // ---------------------------------------------------------------------
  val q8MarketShare: Q = (s, d) => {
    val amerCust = Tables
      .customer(s, d)
      .join(broadcast(regionNations(s, d, "AMERICA")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val econPart = Tables.part(s, d).filter($"p_type" === "ECONOMY").select($"p_partkey")
    val supNat = Tables
      .supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Tables
      .lineitem(s, d)
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(econPart), $"l_partkey" === $"p_partkey")
      .join(broadcast(amerCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supNat), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("int").as("o_year"))
      .agg(
        derivedSum(when($"n_name" === "NATION_6", revenue).otherwise(lit(0.0))).as("nat_vol"),
        derivedSum(revenue).as("tot_vol")
      )
      .select($"o_year", round($"nat_vol" / $"tot_vol", 6).as("mkt_share"))
      .orderBy($"o_year")
  }

  // ---------------------------------------------------------------------
  // Q9 — product-type profit. ps_supplycost's stand-in is a deterministic
  // unit cost of 0.5 × p_retailprice; profit = revenue − cost·quantity,
  // computed per-row in IEEE (bit-exact across engines for a fixed
  // expression tree) then DECIMAL-summed. Parts are the 'widget' line.
  // ---------------------------------------------------------------------
  val q9ProductProfit: Q = (s, d) => {
    val widg = Tables
      .part(s, d)
      .filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice")
    val supNat = Tables
      .supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    Tables
      .lineitem(s, d)
      .join(broadcast(widg), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supNat), $"l_suppkey" === $"s_suppkey")
      .groupBy($"nation", year($"o_orderdate").cast("int").as("o_year"))
      .agg(
        derivedSum(
          $"l_extendedprice" * (lit(1.0) - $"l_discount") -
            lit(0.5) * $"p_retailprice" * $"l_quantity"
        ).as("sum_profit")
      )
      .select($"nation", $"o_year", round($"sum_profit", 6).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  // ---------------------------------------------------------------------
  // Q10 — returned-item reporting: top-20 customers by revenue lost to
  // returns in 1996-Q4 orders. The cut orders by ROUNDED revenue with the
  // custkey tiebreak (q3 discipline).
  // ---------------------------------------------------------------------
  val q10ReturnedItems: Q = (s, d) => {
    val ord = Tables
      .orders(s, d)
      .filter(
        $"o_orderdate" >= lit("1996-10-01").cast("date") &&
          $"o_orderdate" < lit("1997-01-01").cast("date")
      )
      .select($"o_orderkey", $"o_custkey")
    val custNat = Tables
      .customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    Tables
      .lineitem(s, d)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", revenue.as("rev"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custNat), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(derivedSum($"rev").as("revenue"))
      .select($"c_custkey", $"c_name", round($"revenue", 6).as("revenue"), $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // Q11 — important stock. partsupp value becomes shipped lineitem value
  // from ASIA-region suppliers; the `HAVING > fraction × (SELECT SUM …)`
  // scalar subquery is the point of the query. TPC-H's fixed fraction
  // scales inversely with SF (0.0001/SF) — a constant goes degenerate as
  // the part count grows — so the cutoff here is 2× the MEAN part value
  // (total / n_parts), SF-invariant by construction. Per-part value and
  // the total are EXACT decimal sums cast to double once, and the
  // threshold is computed in double on both engines — comparing in
  // DECIMAL instead would overflow DuckDB's 38-digit product
  // (DECIMAL(38,6) × DECIMAL(4,4) silently promotes to double there
  // while Spark keeps decimal, a cross-engine boundary mismatch).
  // ---------------------------------------------------------------------
  val q11ImportantParts: Q = (s, d) => {
    val asiaSup = Tables
      .supplier(s, d)
      .join(broadcast(regionNations(s, d, "ASIA")), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val vals = Tables
      .lineitem(s, d)
      .join(broadcast(asiaSup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(revenue.cast(DecimalType(18, 6))).as("value_dec"))
    val total = vals.agg((sum($"value_dec").cast(DoubleType) / count(lit(1))).as("mean_d"))
    vals
      .crossJoin(broadcast(total))
      .filter($"value_dec".cast(DoubleType) > lit(2.0) * $"mean_d")
      .select($"l_partkey", $"value_dec".cast(DoubleType).as("value"))
      .orderBy($"value".desc, $"l_partkey")
  }

  // ---------------------------------------------------------------------
  // Q12 — shipping-mode priority classes. No l_shipmode column: the mode
  // is derived as a ship-latency class (≤7d FAST, ≤30d REGULAR, else
  // SLOW) — same CASE + two conditional counts over one orderkey join.
  // ---------------------------------------------------------------------
  val q12ShipClass: Q = (s, d) => {
    val li = Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1997-01-01").cast("date") &&
          $"l_shipdate" < lit("1998-01-01").cast("date")
      )
      .select($"l_orderkey", $"l_shipdate")
    val lag = datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date"))
    li.join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn(
        "ship_class",
        when(lag <= 7, "FAST").when(lag <= 30, "REGULAR").otherwise("SLOW")
      )
      .groupBy($"ship_class")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L)
          .otherwise(0L)).as("low_line_count")
      )
      .orderBy($"ship_class")
  }

  // ---------------------------------------------------------------------
  // Q13 — customer order-count distribution: LEFT OUTER join so
  // zero-order customers survive, then a two-level aggregate (count per
  // customer → customers per count). The o_comment NOT LIKE filter's
  // stand-in excludes one priority class inside the join's right side.
  // ---------------------------------------------------------------------
  val q13OrderCountDist: Q = (s, d) => {
    val ord = Tables
      .orders(s, d)
      .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
      .select($"o_custkey", $"o_orderkey")
    Tables
      .customer(s, d)
      .select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  // ---------------------------------------------------------------------
  // Q14 — promotion effect: promo revenue share of one ship month.
  // ---------------------------------------------------------------------
  val q14PromoShare: Q = (s, d) => {
    val pt = Tables.part(s, d).select($"p_partkey", $"p_type")
    Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1997-09-01").cast("date") &&
          $"l_shipdate" < lit("1997-10-01").cast("date")
      )
      .join(broadcast(pt), $"l_partkey" === $"p_partkey")
      .agg(
        derivedSum(when($"p_type" === "PROMO", revenue).otherwise(lit(0.0))).as("promo_rev"),
        derivedSum(revenue).as("tot_rev")
      )
      .select(round(lit(100.0) * $"promo_rev" / $"tot_rev", 6).as("promo_share"))
  }

  // ---------------------------------------------------------------------
  // Q15 — top supplier: the revenue view + `= (SELECT MAX …)` scalar.
  // Per-supplier revenue is rounded ONCE before the max comparison so
  // the winner is decided on identical doubles in both engines.
  // ---------------------------------------------------------------------
  val q15TopSupplier: Q = (s, d) => {
    val rev = Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1997-01-01").cast("date") &&
          $"l_shipdate" < lit("1997-04-01").cast("date")
      )
      .groupBy($"l_suppkey")
      .agg(round(derivedSum(revenue), 6).as("total_revenue"))
    val mx = rev.agg(max($"total_revenue").as("max_revenue"))
    rev
      .crossJoin(broadcast(mx))
      .filter($"total_revenue" === $"max_revenue")
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  // ---------------------------------------------------------------------
  // Q16 — supplier variety per part profile. The partsupp relationship is
  // the distinct shipped (part, supplier) pair set; the complaint NOT IN
  // subquery's stand-in is negative-balance suppliers, kept as a true
  // anti join (Catalyst turns NOT IN over a non-null key into exactly
  // this).
  // ---------------------------------------------------------------------
  val q16SupplierVariety: Q = (s, d) => {
    val excl = Tables.supplier(s, d).filter($"s_acctbal" < 0).select($"s_suppkey")
    val pts = Tables
      .part(s, d)
      .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO")
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables
      .lineitem(s, d)
      .select($"l_partkey", $"l_suppkey")
      .distinct()
      .join(broadcast(excl), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(pts), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  // ---------------------------------------------------------------------
  // Q17 — small-quantity-order revenue: lineitems below 20% of their
  // part's average quantity. The correlated AVG decorrelates into a
  // per-part aggregate joined back. l_quantity is integer-valued, so the
  // double sum behind AVG is exact in any order — the 0.2×avg boundary
  // is deterministic without a DECIMAL detour.
  // ---------------------------------------------------------------------
  val q17SmallQtyRev: Q = (s, d) => {
    val b3 = Tables.part(s, d).filter($"p_brand" === "Brand#3").select($"p_partkey")
    val li = Tables
      .lineitem(s, d)
      .join(broadcast(b3), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val avgQ = li.groupBy($"l_partkey".as("aq_partkey")).agg(avg($"l_quantity").as("avg_qty"))
    li.join(broadcast(avgQ), $"l_partkey" === $"aq_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((moneySum($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
      .select(round($"avg_yearly", 6).as("avg_yearly"))
  }

  // ---------------------------------------------------------------------
  // Q18 — large-volume customers: orders whose total quantity clears 300.
  // The qty rollup is a data-dependent small side — unhinted, so AQE
  // converts the orderkey join to broadcast at runtime if it fits.
  // ---------------------------------------------------------------------
  val q18LargeOrders: Q = (s, d) => {
    val big = Tables
      .lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 300)
    Tables
      .orders(s, d)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.customer(s, d).select($"c_custkey", $"c_name")),
        $"o_custkey" === $"c_custkey")
      .select(
        $"c_name",
        $"c_custkey",
        $"o_orderkey",
        $"o_orderdate".cast("date").as("o_orderdate"),
        $"o_totalprice",
        $"total_qty"
      )
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  // ---------------------------------------------------------------------
  // Q19 — disjunctive predicate join: an OR of three (brand, size-range,
  // quantity-range) conjuncts riding one partkey equi-join. Catalyst
  // extracts the equi-key and evaluates the disjunction as a post-join
  // filter on the broadcast hash join — the shape that degrades to a
  // cartesian product in engines that can't split the predicate.
  // ---------------------------------------------------------------------
  val q19Disjunctive: Q = (s, d) => {
    val pt = Tables.part(s, d).select($"p_partkey", $"p_brand", $"p_size")
    Tables
      .lineitem(s, d)
      .select($"l_partkey", $"l_quantity", revenue.as("rev"))
      .join(
        broadcast(pt),
        $"l_partkey" === $"p_partkey" && (
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
            ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
            ($"p_brand" === "Brand#34" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30))
        )
      )
      .agg(derivedSum($"rev").as("revenue"))
      .select(round($"revenue", 6).as("revenue"))
  }

  // ---------------------------------------------------------------------
  // Q20 — potential part promotion: EUROPE-region suppliers who shipped
  // more than 300 units of red parts in 1997. The nested IN-chain
  // (supplier IN … partsupp IN … parts) flattens to one aggregate over
  // the red-part lineitems and a LEFT SEMI join into supplier.
  // ---------------------------------------------------------------------
  val q20ExcessSuppliers: Q = (s, d) => {
    val red = Tables.part(s, d).filter($"p_name".startsWith("red")).select($"p_partkey")
    val shipped = Tables
      .lineitem(s, d)
      .filter(
        $"l_shipdate" >= lit("1997-01-01").cast("date") &&
          $"l_shipdate" < lit("1998-01-01").cast("date")
      )
      .join(broadcast(red), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 300)
    Tables
      .supplier(s, d)
      .join(broadcast(regionNations(s, d, "EUROPE")), $"s_nationkey" === $"n_nationkey")
      .join(shipped, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  // ---------------------------------------------------------------------
  // Q21 — suppliers who kept orders waiting. The missing receipt/commit
  // dates make the fault marker l_returnflag = 'R': in multi-supplier
  // finished orders, the supplier who is the ONLY one with a returned
  // line. The EXISTS / NOT EXISTS pair is computed as one per-order
  // aggregate (distinct suppliers, distinct faulty suppliers) — two
  // conditions read off one grouped pass instead of two correlated
  // subqueries rescanning lineitem.
  // ---------------------------------------------------------------------
  val q21WaitingSupplier: Q = (s, d) => {
    val li = Tables
      .lineitem(s, d)
      .join(
        Tables.orders(s, d).filter($"o_orderstatus" === "F").select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey",
        "left_semi"
      )
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val perOrder = li
      .groupBy($"l_orderkey".as("po_orderkey"))
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"l_returnflag" === "R", $"l_suppkey")).as("n_r_supp")
      )
      .filter($"n_supp" > 1 && $"n_r_supp" === 1)
    li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey")
      .distinct()
      .join(perOrder, $"l_orderkey" === $"po_orderkey")
      // GROUP BY s_name, like the TPC-H spec and the oracle (r11 review:
      // grouping by suppkey disagreed with the oracle's per-name rollup
      // whenever two suppliers share a name — names are data, not keys;
      // the generator's Supplier#N convention merely hid the dependency)
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  // ---------------------------------------------------------------------
  // Q22 — global sales opportunity: rich customers (balance above the
  // positive-balance average — a scalar subquery) with no recent orders
  // (anti join), rolled up by nation. The average divides an exact
  // DECIMAL sum by the count so both engines compare against the same
  // double.
  // ---------------------------------------------------------------------
  val q22IdleCustomers: Q = (s, d) => {
    val avgBal = Tables
      .customer(s, d)
      .filter($"c_acctbal" > 0)
      .agg((moneySum($"c_acctbal") / count(lit(1))).as("avg_bal"))
    val recent = Tables
      .orders(s, d)
      .filter($"o_orderdate" >= lit("1999-01-01").cast("date"))
      .select($"o_custkey")
    Tables
      .customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), moneySum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  val queries: Map[String, Q] = Map(
    "q2_min_acct_supp"   -> q2MinAcctSupp,
    "q4_order_priority"  -> q4OrderPriority,
    "q7_region_volume"   -> q7RegionVolume,
    "q8_market_share"    -> q8MarketShare,
    "q9_product_profit"  -> q9ProductProfit,
    "q10_returned_items" -> q10ReturnedItems,
    "q11_important_parts" -> q11ImportantParts,
    "q12_ship_class"     -> q12ShipClass,
    "q13_order_count_dist" -> q13OrderCountDist,
    "q14_promo_share"    -> q14PromoShare,
    "q15_top_supplier"   -> q15TopSupplier,
    "q16_supplier_variety" -> q16SupplierVariety,
    "q17_small_qty_rev"  -> q17SmallQtyRev,
    "q18_large_orders"   -> q18LargeOrders,
    "q19_disjunctive"    -> q19Disjunctive,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "q21_waiting_supplier" -> q21WaitingSupplier,
    "q22_idle_customers" -> q22IdleCustomers
  )

  private val rev6 =
    "round(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6)"

  val oracles: Map[String, String] = Map(
    "q2_min_acct_supp" ->
      """WITH cand AS (
        |  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size = 15 AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand FROM cand c
        |WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= DATE '1997-07-01' AND o_orderdate < DATE '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_region_volume" ->
      s"""SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  round(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
        |    OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
        |GROUP BY 1, 2, 3 ORDER BY supp_region, cust_region, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_6'
        |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |      AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      - 0.5 * p_retailprice * l_quantity
        |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, $rev6 AS revenue, c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS value_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value FROM vals
        |WHERE CAST(value_dec AS DOUBLE)
        |    > 2.0 * (SELECT CAST(SUM(value_dec) AS DOUBLE) / COUNT(*) FROM vals)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_ship_class" ->
      """SELECT CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 7 THEN 'FAST'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'REGULAR'
        |    ELSE 'SLOW' END AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY ship_class""".stripMargin,
    "q13_order_count_dist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
        |                   WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) c
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(18,6))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, $rev6 AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_rev" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
        |  AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |  SUM(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT $rev6 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE 'red%'
        |      AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |    GROUP BY l_suppkey HAVING SUM(l_quantity) > 300)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F')
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey FROM li l1
        |  WHERE l1.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM li l2
        |                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM li l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |) w JOIN supplier ON w.l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                     / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= DATE '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
