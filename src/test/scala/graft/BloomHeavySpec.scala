package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.BloomKernel
import graft.ops.{BloomJoin, HeavyHitters}

/** Bloom-pruned join, Misra-Gries heavy hitters, Markov transitions. */
class BloomHeavySpec extends SparkSpec {

  private def forSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("bloom kernel never yields a false negative; false positives stay rare") {
    val keys = Gen.listOfN(3000, Gen.choose(Long.MinValue, Long.MaxValue))
    forSamples(keys, n = 20) { ks =>
      val bits = new Array[Long](BloomJoin.Words)
      ks.foreach(k => BloomKernel.set(bits, k, BloomJoin.Hashes))
      val arr = new GenericArrayData(bits.map(l => l: Any))
      // completeness: every inserted key probes true
      assert(ks.forall(k => BloomKernel.mightContain(arr, k, BloomJoin.Hashes)))
      // fpp sanity at 3k keys / 2^18 bits / 5 hashes: well under 5%
      val inserted = ks.toSet
      val probes = (1L to 20000L).filterNot(inserted)
      val fp = probes.count(k => BloomKernel.mightContain(arr, k, BloomJoin.Hashes))
      assert(fp.toDouble / probes.size < 0.05, s"fp rate ${fp.toDouble / probes.size}")
    }
  }

  test("bloom-pruned join is row-identical to the plain join and probes pre-join") {
    val pruned = BloomJoin.bloomPrunedRevenue(spark, sfDir)
    // the probe must sit in the plan (pre-shuffle fact filter)
    assert(pruned.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
    val dim = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 490000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = graft.sources.Tables.lineitem(spark, sfDir)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
      .orderBy("o_orderpriority")
    assert(pruned.collect().toSeq == plain.collect().toSeq)
  }

  test("misra-gries summary keeps every item above n/(k+1) even with k << vocab") {
    val mg = HeavyHitters.MisraGries(8)
    // zipf-ish stream over a 50-word vocab, an order of magnitude over budget
    val stream = Gen.listOfN(2000,
      Gen.frequency((1 to 50).map(i => (51 - i) * (51 - i) -> Gen.const(s"w$i")): _*))
    forSamples(stream, n = 40) { s =>
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // distributed shape: fold 4 partitions, then tree-merge
      val bufs = s.grouped((s.size + 3) / 4)
        .map(_.foldLeft(mg.zero)(mg.reduce)).toList
      val merged = bufs.reduce(mg.merge)
      val candidates = mg.finish(merged).toSet
      val bound = s.size.toDouble / (8 + 1)
      exact.foreach { case (w, c) =>
        if (c > bound) assert(candidates.contains(w), s"$w ($c > $bound) lost")
      }
      assert(candidates.size <= 8)
    }
  }

  test("heavy words equal the exact one-shot groupBy at the same threshold") {
    val got = HeavyHitters.heavyWords(spark, sfDir).collect().toSeq
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(filter(
        split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " "),
        w => w =!= "")).as("word"))
    val n = toks.count()
    val exact = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 30 > n)
      .orderBy(col("cnt").desc, col("word")).collect().toSeq
    assert(got == exact && got.nonEmpty)
  }

  test("markov transition probabilities are a distribution per from_type") {
    val rows = graft.analytics.Analytics.markovTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"$from mass $mass")
      assert(rs.forall(r => r.getDouble(3) > 0 && r.getLong(2) > 0))
    }
    // every non-final event of every user contributes exactly one transition
    val ev = graft.sources.Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }
}
