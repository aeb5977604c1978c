package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Advanced
import graft.sources.Tables

class AdvancedSpec extends AnyFunSuite {
  import TestSpark._

  test("robust outlier: doubled median and quadrupled MAD match a local sort") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("adv_robust_outlier")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n - 1) / 2) + s(n / 2)
    }
    ev.groupBy(_._1).foreach { case (t, vs) =>
      val cs = vs.map(_._2).toSeq
      val m2 = med2(cs)
      val devs = cs.map(c => math.abs(2 * c - m2))
      val m4 = med2(devs)
      val out = devs.count(d => 2 * d > 3 * m4).toLong
      val (n, gm2, gm4, gout) = rows(t)
      assert(n == cs.length.toLong && gm2 == m2 && gm4 == m4 && gout == out,
        s"$t: got ($n,$gm2,$gm4,$gout) expected " +
          s"(${cs.length},$m2,$m4,$out)")
    }
  }

  test("transition matrix: conserves transitions, shares total ~10000 bps") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("adv_transition_matrix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // total transitions = total events minus one per active user
    val ev = graft.sources.Tables.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum == expected,
      "every adjacent event pair must appear exactly once")
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val bpsSum = ts.map(_._4).sum
      // integer div loses at most (n_pairs - 1) bps to truncation
      assert(bpsSum <= 10000L && bpsSum >= 10000L - ts.length + 1,
        s"$from shares sum to $bpsSum bps")
    }
  }

  test("outlier screen: integer 3-sigma inequality equals the float z-score") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("adv_outlier_events")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    // recompute per type with plain doubles; the exact-integer test
    // must agree wherever the float margin is not razor-thin (here
    // the synthetic values sit far from the 3-sigma boundary)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long")
        .as("c")).collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (t, vs) =>
      val xs = vs.map(_._2.toDouble)
      val n = xs.length
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / n)
      val floatOut = xs.count(x => math.abs(x - mu) > 3 * sd)
      val (cnt, out) = rows(t)
      assert(cnt == n.toLong, s"$t count")
      assert(out == floatOut.toLong,
        s"$t integer test ($out) vs float z-score ($floatOut)")
    }
  }

  test("as-of join only ever matches strictly-prior clicks") {
    val rows = Advanced.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) < r.getLong(2),
        s"click at ${r.getLong(3)} not strictly before purchase ${r.getLong(2)}")
    }
  }

  test("salted join equals plain join") {
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val salted = Advanced.saltedJoin(l, o, "k", salt = 8)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = l.join(o, "k")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join is correct under heavy key skew") {
    import spark.implicits._
    // one key owns half the fact rows — the shape that stalls a
    // plain hash shuffle at scale
    val fact = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = (1L to 10000L).map(k => (k, s"d$k")).toDF("k", "name")
    val salted = Advanced.saltedJoin(fact, dim, "k", salt = 16)
    val plain = fact.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).collect()(0).getLong(0) ==
      plain.agg(sum("v")).collect()(0).getLong(0))
  }

  test("salted join replicates nothing when no key is hot") {
    // lineitem orderkey multiplicity is ≤7 at any SF — far below the
    // hot threshold — so the build side must flow through 1:1 and the
    // shuffle volume equals the plain join's.
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val (_, saltedR) = Advanced.saltedSides(l, o, "k", salt = 8,
      sampleFraction = 0.05, hotRowThreshold = 1000L)
    assert(saltedR.count() == o.count(),
      "cold-key build rows were replicated")
  }

  test("salted join replicates ONLY the hot keys' build rows") {
    import spark.implicits._
    val salt = 16
    // one key owns half the fact rows; every other key is cold
    val fact = (1 to 10000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "v").repartition(8)
    val dim = (1L to 10000L).map(k => (k, s"d$k")).toDF("k", "name")
    val (_, saltedR) = Advanced.saltedSides(fact, dim, "k", salt,
      sampleFraction = 0.05, hotRowThreshold = 1000L)
    val n = saltedR.count()
    // exactly one hot key detected → dim.count + (salt-1)*1 rows
    assert(n == dim.count() + (salt - 1),
      s"expected ${dim.count() + (salt - 1)} salted build rows, got $n")
    // and the hot key's fact rows spread over >1 subkey
    val (saltedL, _) = Advanced.saltedSides(fact, dim, "k", salt,
      sampleFraction = 0.05, hotRowThreshold = 1000L)
    val hotSalts = saltedL.filter(col("k") === 1L)
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(hotSalts > 1, s"hot key not spread: $hotSalts subkey(s)")
  }

  test("HLL approx distinct stays within 5% of exact") {
    val df = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()(0)
    val exact = df.getLong(0).toDouble
    val approx = df.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("deterministic HLL estimate lands near exact (m=64, ~2.5 sigma)") {
    val m = 64.0
    Advanced.hllDistinct(spark, sf).collect().foreach { r =>
      val (raw, v, exact) =
        (r.getDouble(1), r.getLong(2).toDouble, r.getLong(3).toDouble)
      // the standard estimator: linear counting in the small range
      // (raw <= 2.5m with empty registers), raw HLL above it — ln is
      // applied HERE, not in the query, to keep the oracle bit-exact
      val est = if (raw <= 2.5 * m && v > 0) m * math.log(m / v) else raw
      assert(math.abs(est - exact) / exact <= 0.35,
        s"${r.getString(0)}: est $est (raw $raw, V=$v) vs exact $exact")
    }
  }

  test("upsert keeps latest versions: updates replace, inserts add") {
    val snap = Tables.orders(spark, sf)
    val total = snap.count()
    val nUpd = snap.filter(col("o_orderkey") % 10 === 3).count()
    val nIns = snap.filter(col("o_orderkey") % 100 === 7).count()
    val rows = Advanced.upsert(spark, sf).collect()
    // merged cardinality: every base key once + disjoint inserts
    assert(rows.map(_.getLong(1)).sum == total + nIns)
    // updated keys surface with the CDC status, none survive as v1
    val byStatus = rows.map(r => r.getString(0) -> r).toMap
    assert(byStatus("U").getLong(1) == nUpd)
    assert(byStatus("N").getLong(1) == nIns)
    // version accounting: v2 for every U and N row, v1 elsewhere
    val v2 = byStatus("U").getLong(3) + byStatus("N").getLong(3)
    assert(v2 == 2 * (nUpd + nIns))
  }

  test("resample grid is gapless per user and forward-fill is complete") {
    val rows = Advanced.resample(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val slots = rs.map(_.getLong(1)).toSeq.sorted
      assert(slots == (slots.head to slots.last).toSeq,
        s"user $u grid has gaps")
      // first slot holds an event by construction; afterwards the
      // forward fill means no nulls anywhere
      assert(rs.forall(!_.isNullAt(3)), s"user $u has unfilled slots")
    }
    // event accounting survives the re-gridding
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(2)).sum == purchases)
  }

  test("quantile profile is monotone across q per group") {
    val rows = SparkEntry.queries("q28_quantiles")(spark, sf).collect()
    assert(rows.length == 12) // 3 flags x 4 quantiles
    rows.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      val byQ = rs.sortBy(_.getString(1)).map(_.getDouble(2)).toSeq
      assert(byQ == byQ.sorted, s"$flag quantiles not monotone: $byQ")
    }
  }

  test("session revenue table agrees with q21's session counts") {
    val sess = Advanced.sessionRevenue(spark, sf).collect()
    val q21 = SparkEntry.queries("q21_sessionize")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byUser = sess.groupBy(_.getLong(0))
    assert(byUser.keySet == q21.keySet)
    byUser.foreach { case (u, rs) =>
      val (nEvents, nSessions) = q21(u)
      assert(rs.length == nSessions, s"user $u session count")
      assert(rs.map(_.getLong(2)).sum == nEvents, s"user $u event total")
      // session ids are 1..n and sessions never overlap in time
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq == (1L to nSessions).toSeq)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(6) < b.getLong(5),
          s"user $u sessions overlap")
        case _ =>
      }
    }
    // length profile partitions the corpus exactly
    val prof = graft.operators.TextAnalysis.lengthProfile(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect()(0).getLong(0)
    assert(prof == 500L)
  }

  test("funnel stages are monotone and bounded by the user population") {
    val r = Advanced.funnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && p >= 0, s"non-monotone funnel ($v, $c, $p)")
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(v <= users)
    assert(v > 0)
  }

  test("kmv sketch estimates land inside the 1/sqrt(k) envelope of exact counts") {
    val r = Advanced.kmvOverlap(spark, sf).collect()(0)
    val k = r.getLong(0)
    val (estA, estB, estU) = (r.getLong(4), r.getLong(5), r.getLong(6))
    val (inter, jacPm, estI) = (r.getLong(7), r.getLong(8), r.getLong(9))
    // sketch invariants
    assert(k == 128 && inter >= 0 && inter <= k)
    assert(r.getLong(3) <= r.getLong(1) && r.getLong(3) <= r.getLong(2),
      "union kth-min must be <= each set's kth-min")
    // exact ground truth (the computation the sketch exists to avoid)
    val items = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_18", "NATION_19"))
      .select(col("n_name").as("nm"), col("l_partkey").as("pk")).distinct()
    val exact = items.groupBy(col("pk"))
      .agg(countDistinct(col("nm")).as("ns"))
      .agg(count(lit(1)).as("u"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).as("i"))
      .collect()(0)
    val (exU, exI) = (exact.getLong(0), exact.getLong(1))
    val exA = items.filter(col("nm") === "NATION_18").count()
    val exB = items.filter(col("nm") === "NATION_19").count()
    // KMV standard error is ~n/sqrt(k-2); allow 3 sigma (~27% at k=128)
    def within(est: Long, ex: Long): Unit =
      assert(math.abs(est - ex) <= math.max(3 * ex / 11, 3),
        s"estimate $est vs exact $ex beyond 3/sqrt(k)")
    within(estA, exA); within(estB, exB); within(estU, exU)
    within(estI, exI)
    within(jacPm, 1000L * exI / exU)
  }

  test("null-skew rewrite equals the plain left join, and bypasses nulls") {
    val rewritten = Advanced.nullSkewJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // the un-rewritten plan: one LEFT join, nulls and all
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "purchase", col("user_id")).as("pkey"))
    val dim = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("upc"))
    val plain = e.join(dim, e("pkey") === dim("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("user_id").isNotNull, 1L).otherwise(0L)).as("m"),
        sum(coalesce(col("upc"), lit(0L))).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rewritten == plain)
    // the null population exists (the rewrite has something to bypass)
    // and non-purchase rows never match
    val (n, m, c) = rewritten.filterNot(_._1 == "purchase").values
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    assert(n > 0 && m == 0 && c == 0,
      "non-purchase (null-key) rows must bypass unmatched")
    assert(rewritten("purchase")._2 == rewritten("purchase")._1,
      "every purchase row must match its own user's profile")
  }

  test("retention cohort: offset-0 counts the whole cohort, later offsets subsets") {
    val rows = Advanced.retentionCohort(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    val cohortSize = rows.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSize.nonEmpty, "every cohort must have an offset-0 row")
    // a user's first event defines their cohort, so offset 0 counts
    // every member; any later offset counts a subset of those members
    rows.foreach { case ((c, off), n) =>
      val size = cohortSize.getOrElse(c,
        fail(s"cohort $c has offset $off but no offset-0 row"))
      assert(n <= size, s"cohort $c offset $off: $n > cohort size $size")
    }
    // offset-0 totals tally exactly the distinct user population
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cohortSize.map(_._2).sum == users)
  }

  test("decay score: bounded by raw revenue and exact at age zero") {
    val rows = Advanced.decayScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"user ${r.getLong(0)}: decayed ${r.getLong(1)} > raw ${r.getLong(2)}")
    }
    // recompute one user exactly driver-side (integer semantics)
    val e = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        expr("unix_micros(ts) div 86400000000").as("day")).collect()
    val nowDay = e.map(_.getLong(2)).max
    val uid = rows.head.getLong(0)
    val expected = e.filter(_.getLong(0) == uid)
      .groupBy(r => (nowDay - r.getLong(2)) / 7)
      .map { case (k, rs) =>
        val ck = rs.map(_.getLong(1)).sum
        if (k >= 63) 0L else ck / (1L << k)
      }.sum
    assert(rows.head.getLong(1) == expected)
  }

  test("profile histogram tiles the value domain with consistent bounds") {
    val rows = Advanced.profileHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(lo >= b * 2500000L && hi < (b + 1) * 2500000L,
        s"bucket $b bounds [$lo, $hi] escape the bucket")
      assert(lo <= hi)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  test("user paths conserve complete 3-step windows, shares total ~10000 bps") {
    import org.apache.spark.sql.functions._
    val rows = Advanced.userPaths(spark, sf).collect()
    assert(rows.nonEmpty)
    // Σ n_paths == Σ_user max(0, n_events − 2): every user stream of
    // n events holds exactly n−2 complete 3-windows
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(greatest(col("n") - 2, lit(0L)))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == expected)
    // integer-floor shares must land just under the full 10^4 bps
    val bps = rows.map(_.getLong(4)).sum
    assert(bps <= 10000 && bps > 10000 - rows.length)
  }

  test("attribution conserves every micro-cent of purchase value") {
    import org.apache.spark.sql.functions._
    val rows = Advanced.attribution(spark, sf).collect()
    val channels = rows.map(_.getString(0)).toSeq
    assert(channels == channels.sorted && channels.contains("direct"))
    val credited = rows.filter(!_.isNullAt(2)).map(_.getLong(2)).sum
    val totalMicros = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long") * 1000000L))
      .head().getLong(0)
    // exact identity, not a tolerance: floor shares + remainder to the
    // most recent touch partition the purchase total perfectly
    assert(credited == totalMicros)
  }
}
