package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Correctness of the approximate (rows-only-oracle) operators against
  * their exact counterparts at sf0.001. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] = pairSet(Dedup.ngramJaccard(spark, sf))

  test("ngramJaccard equals the brute-force O(n²) ground truth (recall 1)") {
    // the prefix filter + length filter + rep collapse all claim
    // recall EXACTLY 1 — prove it against an unblocked cross join
    import org.apache.spark.sql.functions._
    val arrs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), expr(
        """array_distinct(CASE WHEN size(t) >= 3 THEN
             transform(sequence(1, size(t) - 2),
               i -> concat(element_at(t, i), '_', element_at(t, i + 1),
                           '_', element_at(t, i + 2)))
           ELSE cast(array() as array<string>) END)""").as("shs"))
    val a = arrs.select(col("doc_id").as("x"), col("shs").as("sa"))
    val b = arrs.select(col("doc_id").as("y"), col("shs").as("sb"))
    val brute = a.crossJoin(b).filter(col("x") < col("y"))
      .withColumn("inter", expr("size(array_intersect(sa, sb))").cast("long"))
      .withColumn("na", size(col("sa")).cast("long"))
      .withColumn("nb", size(col("sb")).cast("long"))
      // na + nb > 0: two shingle-less docs pass 0 >= 0 vacuously but
      // have no defined Jaccard; ngramJaccard excludes them
      .filter(col("na") + col("nb") > 0)
      .filter(col("inter") * 9 >= (col("na") + col("nb")) * 4)
    assert(pairSet(brute) == exactPairs)
  }

  test("minhash+LSH finds exactly the exact-Jaccard pair set (tau=0.8)") {
    val lsh = pairSet(Dedup.minhashLsh(spark, sf))
    // LSH candidates are verified with exact Jaccard, so precision is 1;
    // recall at tau=0.8 with 16x8 bands is ~1 - (1-0.8^8)^16 ~ 0.96
    assert(exactPairs.nonEmpty, "test data should contain planted near-dups")
    assert(lsh.subsetOf(exactPairs), s"false positives: ${lsh -- exactPairs}")
    assert(lsh.size >= (exactPairs.size * 0.9).toInt,
      s"recall too low: ${lsh.size}/${exactPairs.size}")
  }

  test("simhash bands find the planted near-dups") {
    val sim = pairSet(Dedup.simhash(spark, sf))
    // hamming<=3 on 64-bit simhash is a tighter notion than jaccard>=0.8;
    // it must at least overlap the planted dups and add no wild pairs
    assert(sim.nonEmpty, "no simhash pairs found")
    val overlap = sim.intersect(exactPairs).size
    assert(overlap >= math.min(sim.size, exactPairs.size) / 2,
      s"simhash pairs disjoint from jaccard truth: $overlap")
  }

  test("knn LSH and IVF achieve useful recall vs brute force") {
    def nbrs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = nbrs(Similarity.knnBrute(spark, sf))
    val lsh = nbrs(Similarity.knnLsh(spark, sf))
    val lshRecall = lsh.intersect(brute).size.toDouble / brute.size
    assert(lshRecall >= 0.5, f"LSH recall $lshRecall%.2f below 0.5")
    val ivf = nbrs(Similarity.knnIvf(spark, sf))
    val ivfRecall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"LSH recall $lshRecall%.2f, trained-IVF recall $ivfRecall%.2f")
    assert(ivfRecall >= 0.4, f"IVF recall $ivfRecall%.2f below 0.4")
  }

  test("IVF k-means training moves vectors off their seed cells") {
    // The trained quantizer must be more than the label partition it
    // was seeded with: after two Lloyd rounds at least one corpus
    // vector's nearest trained centroid differs from its raw label
    // (otherwise the 'training' is a no-op and the operator is just
    // the label-as-cell baseline again).
    import org.apache.spark.sql.functions._
    val s = spark
    val e = graft.sources.Tables.embeddings(s, sf)
    val moved = Similarity.trainedCells(s, sf)
      .join(e.select(col("vec_id"), col("label").cast("long").as("lab")),
        Seq("vec_id"))
      .filter(col("cell") =!= col("lab"))
      .count()
    info(s"$moved vectors assigned off their seed label cell")
    assert(moved > 0, "two Lloyd rounds left every assignment on its seed label")
  }

  test("incremental dedup audit identities hold and match a direct recount") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("dedup_incremental")(spark, sf).collect()(0)
    val (batch, dupCorpus, dupBatch, admitted, idSum) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(batch == dupCorpus + dupBatch + admitted,
      "admission accounting does not partition the batch")
    // direct recount on the 500-doc corpus
    val fps = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(lower(trim(col("text"))).cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val (b, c) = fps.partition(_._1 % 5 == 0)
    val corpusSet = c.map(_._2).toSet
    val freshRows = b.filterNot(x => corpusSet(x._2))
    val admittedIds = freshRows.groupBy(_._2).values.map(_.map(_._1).min)
    assert(batch == b.length && dupCorpus == b.length - freshRows.length)
    assert(admitted == admittedIds.size && idSum == admittedIds.sum)
  }

  test("kmeans clustering partitions the whole corpus, checksums included") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ml_kmeans")(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n,
      "cluster sizes do not partition the corpus")
    // every vec_id counted exactly once: checksums sum to 0+1+...+n-1
    assert(rows.map(_.getLong(4)).sum == n * (n - 1) / 2)
    // the audit is over the SAME assignment knnIvf probes
    val direct = Similarity.trainedCells(spark, sf)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(direct(r.getLong(0)) == r.getLong(1)))
  }

  test("exact dedup groups every document exactly once") {
    val total = Dedup.exact(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_dups")).collect()(0).getLong(0)
    assert(total == 500L) // sf0.001 documents count
  }

  test("product quantization: every code and error matches a driver-side re-encode") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.pq(spark, sf).collect()
    assert(rows.length == 500)
    // independent re-encode: collect the constant-size codebook and
    // the raw vectors, brute-force the integer argmin per subspace
    val book = Similarity.pqCodebook(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap // (ss, cell, i) -> c
    val cells = book.keys.map(_._2).toSet.toSeq.sorted
    assert(cells == (0L to 9L), s"unexpected cells: $cells")
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val x = vecs(id).map(v => math.round(v.toDouble * 1000000))
      var errSum = 0L
      (0 until 4).foreach { ss =>
        val (bestCell, bestD2) = cells.map { cell =>
          var d2 = 0L
          ((ss * 16) until (ss * 16 + 16)).foreach { i =>
            val diff = x(i) - book((ss.toLong, cell, i.toLong))
            d2 += diff * diff
          }
          (cell, d2)
        }.minBy { case (cell, d2) => (d2, cell) }
        assert(r.getLong(1 + ss) == bestCell,
          s"vec $id ss $ss: operator code ${r.getLong(1 + ss)} != $bestCell")
        errSum += bestD2
      }
      assert(r.getLong(5) == errSum,
        s"vec $id err_sq ${r.getLong(5)} != recomputed $errSum")
    }
    // compression is real: 500 vectors collapse onto fewer code words
    val words = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet
    assert(words.size < rows.length,
      "every vector got a unique code word — quantization is vacuous")
  }

  test("ADC search: top-5 equals a driver-side table-lookup ranking over all candidates") {
    import org.apache.spark.sql.functions._
    val book = Similarity.pqCodebook(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val cells = book.keys.map(_._2).toSet.toSeq.sorted
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(v => math.round(v.toDouble * 1000000)))
      .toMap
    // re-encode every vector (the emb_pq spec proved this matches)
    def encode(x: Array[Long]): Array[Long] =
      (0 until 4).map { ss =>
        cells.minBy { cell =>
          var d2 = 0L
          ((ss * 16) until (ss * 16 + 16)).foreach { i =>
            val diff = x(i) - book((ss.toLong, cell, i.toLong)); d2 += diff * diff
          }
          (d2, cell)
        }
      }.toArray
    val codes = vecs.map { case (id, x) => id -> encode(x) }
    val out = Similarity.knnPq(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getLong(2)))
      }
    assert(out.keySet == (0L until 20L).toSet)
    out.foreach { case (q, got) =>
      val qx = vecs(q)
      // distance tables: (ss, cell) -> d2 between query subvector, centroid
      val dt = (for (ss <- 0 until 4; cell <- cells) yield {
        var d2 = 0L
        ((ss * 16) until (ss * 16 + 16)).foreach { i =>
          val diff = qx(i) - book((ss.toLong, cell, i.toLong)); d2 += diff * diff
        }
        (ss.toLong, cell) -> d2
      }).toMap
      val expected = codes.toSeq.filter(_._1 != q)
        .map { case (id, cs) =>
          (id, cs.zipWithIndex.map { case (c, ss) => dt((ss.toLong, c)) }.sum)
        }
        .sortBy { case (id, adc) => (adc, id) }.take(5)
      assert(got.toSeq == expected,
        s"query $q: ${got.toSeq} != $expected")
    }
  }

  test("range search returns exactly the above-threshold pairs") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      q <- vecs.keys if q < 20
      c <- vecs.keys if c != q && cos(vecs(q), vecs(c)) >= 0.4
    } yield (q, c)).toSet
    val got = Similarity.rangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"range set mismatch: got ${got.size}, want ${want.size}")

    // norms: spot-check the fold against a hand computation
    val norms = Similarity.norms(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    vecs.take(5).foreach { case (id, v) =>
      val hand = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      assert(math.abs(norms(id) - hand) < 1e-9, s"vec $id norm mismatch")
    }
  }

  test("IVFPQ: equals a driver-side replay of probe + ADC, useful recall") {
    import org.apache.spark.sql.functions._
    // ---- replay the coarse half: trained centroids + probe sets
    val cents = Similarity.trainedCentroids(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val coarse = Similarity.trainedCells(spark, sf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def probe(q: Long): Set[Long] = cents.toSeq
      .map { case (cell, c) => (cell, cos(vecs(q), c)) }
      .sortBy { case (cell, s) => (-s, cell) }.take(3).map(_._1).toSet
    // ---- replay the PQ half: codebook + codes + per-query tables
    val book = Similarity.pqCodebook(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val cells = book.keys.map(_._2).toSet.toSeq.sorted
    val micro = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000000))
    }
    def subD2(x: Array[Long], ss: Int, cell: Long): Long = {
      var d2 = 0L
      ((ss * 16) until (ss * 16 + 16)).foreach { i =>
        val diff = x(i) - book((ss.toLong, cell, i.toLong)); d2 += diff * diff
      }
      d2
    }
    val codes = micro.map { case (id, x) =>
      id -> (0 until 4).map(ss =>
        cells.minBy(cell => (subD2(x, ss, cell), cell))).toArray
    }
    // ---- composed expectation: ADC shortlist over probed cells,
    // then exact cosine re-rank of the top-64
    val out = Similarity.knnIvfPq(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(2)).map(_.getLong(1))
      }
    assert(out.keySet == (0L until 20L).toSet)
    out.foreach { case (q, got) =>
      val probed = probe(q)
      val shortlist = codes.toSeq
        .filter { case (id, _) => id != q && probed.contains(coarse(id)) }
        .map { case (id, cs) =>
          (id, cs.zipWithIndex.map { case (c, ss) =>
            subD2(micro(q), ss, c) }.sum)
        }
        .sortBy { case (id, adc) => (adc, id) }.take(64).map(_._1)
      val expected = shortlist
        .map(id => (id, cos(vecs(q), vecs(id))))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got.toSeq == expected, s"query $q: ${got.toSeq} != $expected")
      // pruning is real: every neighbor came from a probed cell
      got.foreach { id => assert(probed.contains(coarse(id))) }
    }
    // recall vs exact: the composed index still finds real neighbors
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mine = out.toSeq.flatMap { case (q, ids) => ids.map(id => (q, id)) }
      .toSet
    val recall = mine.intersect(brute).size.toDouble / brute.size
    info(f"IVFPQ recall vs brute force: $recall%.2f")
    // the exact re-rank of the ADC shortlist holds the same floor the
    // IVF spec asserts (0.4) — ADC-only top-5 measured 0.17
    assert(recall >= 0.4, f"IVFPQ recall $recall%.2f below 0.4")
  }

  test("cosine expression agrees with a hand computation") {
    import spark.implicits._
    import graft.functions.VectorFunctions.cosineSim
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1f, 0f, 2f), Array(2f, 1f, 0f)))
      .toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b"))).collect()(0).getDouble(0)
    val want = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(got - want) < 1e-12)
  }
}
