package graft

import graft.etl.{ShopifyEtl, SquareEtl, ZoloSchemas}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.4 property-based invariants over generated payloads:
  * explode conservation, header/detail consistency, market-attribution
  * totality, SES bounds.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling loop (the scalatest/scalacheck bridge is not
    * in the offline cache — raw Gen + seeds gives the same coverage).
    */
  private def forSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  import spark.implicits._

  private val genItemization = for {
    qty  <- Gen.choose(1, 9)
    cents <- Gen.choose(100L, 99999L)
    vid  <- Gen.choose(100, 120)
  } yield (qty.toDouble, s"sq-$vid", cents)

  private val genPayment = for {
    id    <- Gen.uuid.map(_.toString.take(8))
    items <- Gen.nonEmptyListOf(genItemization).map(_.take(6))
    hour  <- Gen.choose(0, 23)
    day   <- Gen.choose(1, 28)
  } yield (id, f"2019-06-$day%02dT$hour%02d:30:00Z", items)

  private def paymentsDf(ps: List[(String, String, List[(Double, String, Long)])]) = {
    val rows = ps.map { case (id, ts, items) =>
      Row(
        id,
        ts,
        Row("dev1"),
        items.map { case (q, vid, c) => Row(q, "var", Row(vid), Row(c), null) },
        Seq(Row(Row(1000L), Row(100L)))
      )
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      ZoloSchemas.squarePayment
    )
  }

  test("explode conserves quantity and dollars; market attribution is total") {
    forSamples(Gen.nonEmptyListOf(genPayment).map(_.take(8)), 10) { ps0 =>
      val ps = ps0.distinctBy(_._1)
      if (ps.nonEmpty) {
        val raw = paymentsDf(ps)
        val det = SquareEtl.details(raw)
        // explode row count = total itemizations
        assert(det.count() == ps.map(_._3.size).sum)
        // conservation: sum of detail quantities equals input sum
        val qtySum = det.agg(sum($"quantity")).collect()(0).getLong(0)
        assert(qtySum == ps.flatMap(_._3).map(_._1.toInt).sum)
        val wm = SquareEtl.withMarket(det)
        // attribution total: never null
        assert(wm.filter($"market".isNull).count() == 0)
        // header/detail consistency: header dollars = per-payment detail sums
        val header = SquareEtl.headerTable(wm).collect()
          .map(r => r.getString(0) -> r.getDouble(3)).toMap
        val detSums = wm.groupBy($"payment_id").agg(sum($"dollars").as("s"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(header.keySet == detSums.keySet)
        header.foreach { case (k, v) => assert(math.abs(v - detSums(k)) < 1e-9) }
      }
    }
  }

  test("union row counts add across source slices") {
    forSamples(Gen.zip(Gen.choose(1, 20), Gen.choose(1, 20)), 5) { case (a, b) =>
      val d1 = (1 to a).map(i => (s"a$i", 1.0)).toDF("id", "v")
      val d2 = (1 to b).map(i => (s"b$i", 2.0)).toDF("id", "v")
      assert(d1.union(d2).count() == a + b)
    }
  }

  test("SES forecast bounded by series min/max for any alpha in (0,1]") {
    forSamples(
      Gen.zip(Gen.nonEmptyListOf(Gen.choose(0.0, 1000.0)).map(_.take(50)), Gen.choose(0.01, 1.0)),
      50
    ) { case (xs0, alpha) =>
      if (xs0.nonEmpty) {
        val xs = xs0.toArray
        val f = graft.forecast.Models.sesForecast(xs, alpha)
        assert(f >= xs.min - 1e-9 && f <= xs.max + 1e-9)
      }
    }
  }

  test("Croston degenerates to SES(0.2) with interval exactly 1 on all-positive demand") {
    forSamples(Gen.nonEmptyListOf(Gen.choose(0.1, 1000.0)).map(_.take(50)), 50) { xs0 =>
      if (xs0.nonEmpty) {
        val xs = xs0.toArray
        val Some((z, p)) = graft.forecast.SeriesAnalysis.crostonFold(xs)
        // every period has demand: q stays 1, so p0 = 1 and every update
        // is 0.2*1 + 0.8*p — the fixed point p == 1.0 EXACTLY in IEEE
        assert(p == 1.0)
        assert(z == graft.forecast.Models.sesForecast(xs, 0.2))
      }
    }
  }

  test("Holt-Winters fixed point: a constant series stays at (c, 0, 0) to relative 1e-12") {
    forSamples(Gen.zip(Gen.choose(1, 1000000), Gen.choose(1, 13), Gen.choose(0, 20)), 40) {
      case (ci, m, extra) =>
        // the TRUE fixed point is (level=c, trend=0, seasonal=0); in IEEE
        // even 0.3*c + 0.7*c rounds off c by ulps, so the recursion may
        // drift at ulp-per-step scale — the property worth locking is
        // that the drift stays at rounding noise, never grows
        val c  = ci.toDouble
        val xs = Array.fill(2 * m + 1 + extra)(c)
        val Some((l, b, s0)) = graft.forecast.SeriesAnalysis.hwFold(xs, m)
        assert(math.abs(l - c) <= 1e-12 * c, s"level drifted: $l vs $c")
        assert(math.abs(b) <= 1e-12 * c && math.abs(s0) <= 1e-12 * c, s"($b, $s0)")
    }
  }

  test("Croston is zero-run invariant in the demand level: z ignores gap lengths") {
    forSamples(Gen.nonEmptyListOf(Gen.choose(0.1, 100.0)).map(_.take(20)), 30) { ds0 =>
      if (ds0.nonEmpty) {
        val ds = ds0.toArray
        // same demand events, different inter-arrival gaps: demand level z
        // must match (only p moves); fold equality is exact
        val sparse1 = ds.flatMap(d => Array(d, 0.0))
        val sparse2 = ds.flatMap(d => Array(d, 0.0, 0.0, 0.0))
        val Some((z1, _)) = graft.forecast.SeriesAnalysis.crostonFold(sparse1)
        val Some((z2, _)) = graft.forecast.SeriesAnalysis.crostonFold(sparse2)
        assert(z1 == z2)
      }
    }
  }

  test("watermark filter is monotone: later watermark keeps a subset") {
    val df = graft.tables.Tables.events(spark, sf0001)
    val w1 = df.filter($"ts" > lit("2024-01-10").cast("timestamp")).count()
    val w2 = df.filter($"ts" > lit("2024-01-20").cast("timestamp")).count()
    assert(w2 <= w1)
  }

  test("chunking covers every token exactly (stride accounting) for any doc length") {
    // chunk sizes for n tokens with stride s, window w: starts 0,s,2s,…
    // every token is in ⌈w/s⌉ or fewer chunks; total chunk tokens =
    // Σ min(w, n - start). Verified against the corpus query itself.
    val out = graft.text.Chunking.textChunk(spark, sf0001)
      .groupBy($"doc_id").agg(sum($"n_tokens").as("ct"), count(lit(1)).as("nc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (w, s) = (graft.text.Chunking.chunkTokens, graft.text.Chunking.chunkStride)
    docs.foreach { case (id, n) =>
      val starts = 0 to math.max(n - 1, 0) by s
      val expectTokens = starts.map(st => math.max(math.min(w, n - st), 0)).sum
      val expectChunks = starts.count(st => n - st > 0)
      assert(out(id) == (expectTokens.toLong, expectChunks.toLong), s"doc $id n=$n")
    }
  }

  test("packing: every doc assigned once; no pack over budget except oversize singletons") {
    val rows = graft.text.Chunking.textPack(spark, sf0001).collect()
    val docs = rows.map(_.getLong(0))
    assert(docs.distinct.length == docs.length) // exactly-once assignment
    rows.groupBy(r => (r.getLong(1), r.getLong(2))).foreach { case (_, members) =>
      val total = members.map(_.getAs[Int]("n_tokens").toLong).sum
      if (total > graft.text.Chunking.packBudget)
        assert(members.length == 1, s"over-budget pack with ${members.length} docs")
    }
  }

  test("incremental rollup merge is BIT-exact vs one-shot for any cut date") {
    // the DECIMAL-partial-sum associativity claim, swept across cuts that
    // split mid-corpus, before all data, and after all data
    val oneShot = graft.forecast.ForecastJobs
      .weeklySeries(spark, sf0001, minWeeks = 5)
      .orderBy($"profile_name", $"week_date")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    Seq("1970-01-01", "1994-03-15", "1996-01-01", "1997-11-30", "2005-01-01").foreach { cut =>
      val merged = graft.forecast.ForecastJobs
        .weeklyIncrementalJob(spark, sf0001, cut)
        .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      assert(merged.toSeq == oneShot.toSeq, s"cut=$cut diverged from one-shot rollup")
    }
  }

  test("decontamination pairs carry the TRUE shared distinct-8-gram count") {
    def grams(text: String): Set[String] = {
      val w = text.split(' ')
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    def bucket(t: String): Char = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.text.Chunking.pipeDecontaminate(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (t, e, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!Set('e', 'f').contains(bucket(docs(t))), s"train doc $t is in an eval bucket")
      assert(Set('e', 'f').contains(bucket(docs(e))), s"eval doc $e is in the train bucket")
      // no gram bucket hits the cap at this SF, so the reported count is
      // exactly the distinct-8-gram intersection
      assert(n == (grams(docs(t)) & grams(docs(e))).size.toLong, s"pair ($t,$e)")
    }
  }
}
