package graft.queries

import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting — the fallback when AQE's runtime skew-join split
  * (enabled in every graft session) can't help: e.g. a single hot key in
  * a shuffle join against a side too large to broadcast.
  *
  * The big side gets a deterministic pseudo-uniform salt in [0, salts);
  * the small side is replicated `salts` ways; the join key becomes
  * (key, salt) so one hot key spreads over `salts` reducer partitions.
  * Replication cost: |small| × salts rows — chosen by the caller.
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int
  ): DataFrame = {
    require(salts > 0)
    // the salt must vary WITHIN a key (salting BY the key — or by a row
    // hash, when hot rows are bit-identical — re-concentrates the hot
    // key); a per-physical-row counter is uniform by construction
    val saltedBig = big.withColumn(
      "__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")
    )
    val saltedSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(saltedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
