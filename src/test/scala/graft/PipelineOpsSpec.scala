package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** Specs for the round-2 pipeline operators: stratified sampling,
  * repetition stats, contamination screen, survivorship dedup. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("shingle staging honors spark.graft.scratch.dir (shared-storage knob)") {
    val conf = spark.conf
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scratch-conf-").toString
    try {
      conf.set("spark.graft.scratch.dir", dir)
      Dedup.clearStage()
      Dedup.stageShingles(spark, sf)
      val staged = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty)
      assert(staged.exists(_.getName.startsWith("graft-shingles-")),
        s"staging ignored the configured dir: ${staged.mkString(",")}")
    } finally {
      conf.unset("spark.graft.scratch.dir")
      Dedup.clearStage() // next caller re-stages in the default location
    }
  }

  test("substring dedup finds planted shared passages and nothing else") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8-token passage planted in docs 1 and 2 at different offsets;
    // docs 3/4 unique; doc 5 repeats the passage TWICE to check n_occ
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = java.nio.file.Files.createTempDirectory("graft-subdup-")
    Seq(
      (1L, s"lead in words here $passage tail one two three"),
      (2L, s"completely different opening $passage and another ending"),
      (3L, "nothing shared with anyone in this document at all today"),
      (4L, "another fully unique piece of text goes right here now"),
      (5L, s"$passage middle filler tokens $passage"))
      .toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val rows = Dedup.substring(spark, dir.toString).collect()
    assert(rows.nonEmpty, "planted passage not found")
    // every reported span really is cross-document
    assert(rows.forall(_.getLong(2) >= 2))
    // the planted full-passage window is among them: 3 docs, 4 occs
    val planted = rows.filter(r => r.getLong(4) == 1L && r.getLong(5) == 5L
      && r.getLong(2) == 3L)
    assert(planted.exists(_.getLong(3) == 4L),
      s"expected the planted window with n_occ=4: ${rows.mkString(";")}")
    // unique docs never appear as first_doc of a shared span
    assert(!rows.exists(r => r.getLong(4) == 3L || r.getLong(4) == 4L))
    // and on the real corpus the exact duplicate docs share passages
    val corpus = Dedup.substring(spark, sf)
    assert(corpus.count() > 0)
  }

  test("substring max-growth merges window chains into maximal passages") {
    import spark.implicits._
    // a 12-token passage shared by docs 1/2 spans FIVE overlapping
    // 8-token windows; maximal growth must merge them into ONE
    // passage of len_tokens=12 — not five 8-token reports. Doc 3
    // shares only the first 8 tokens (a strict sub-span): its own
    // maximal run is the 8-token window, reported as a separate
    // passage with n_docs=1 (its partners' runs are longer).
    val p12 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val p8 = p12.split(" ").take(8).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-submax-")
    Seq(
      (1L, s"intro words lead here $p12 tail one two three"),
      (2L, s"different opening text $p12 and another close"),
      (3L, s"only the short prefix $p8 nothing more shared"),
      (4L, "a fully unique document with no overlap at all present"))
      .toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val rows = graft.operators.Dedup.substringMax(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // the full 12-token passage: one group, docs 1+2, merged length
    val full = rows.filter(t => t._2 == 12L)
    assert(full.length == 1, s"expected one 12-token passage: ${rows.mkString(";")}")
    assert(full.head._3 == 2L && full.head._5 == 1L && full.head._6 == 2L)
    // doc 3's maximal run is exactly the 8-token prefix, alone
    val sub = rows.filter(t => t._2 == 8L)
    assert(sub.length == 1 && sub.head._3 == 1L && sub.head._5 == 3L)
    // no group ever reports a passage shorter than the window
    assert(rows.forall(_._2 >= 8L))
    // and NOTHING else: the unique doc contributes no passage
    assert(rows.length == 2, s"unexpected extra passages: ${rows.mkString(";")}")
    // fingerprints really are the passage md5s
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(x: String) = md.digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(full.head._1 == m(p12) && sub.head._1 == m(p8))
    // on the real corpus: passages exist and are never shorter than
    // the window; the corpus' exact-duplicate docs must surface as
    // full-document passages with n_docs >= 2
    val corpus = graft.operators.Dedup.substringMax(spark, sf).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(_.getLong(1) >= 8L))
    assert(corpus.exists(_.getLong(2) >= 2L),
      "expected at least one genuinely cross-document maximal passage")

    // the APPLY side on the same planted corpus: every shared span
    // is removed, everything else survives byte-for-byte
    val mdScrub = java.security.MessageDigest.getInstance("MD5")
    def fp(x: String) = mdScrub.digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val scrub = graft.operators.Dedup.substringScrub(spark, dir.toString)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1: 20 tokens, the 12-token passage removed, frame kept
    assert(scrub(1L) == (20L, 12L,
      fp("intro words lead here tail one two three")))
    // doc 3: only the 8-token prefix goes
    assert(scrub(3L) == (15L, 8L,
      fp("only the short prefix nothing more shared")))
    // doc 4: untouched, fingerprint of the (re-joined) original
    assert(scrub(4L) == (10L, 0L,
      fp("a fully unique document with no overlap at all present")))
  }

  test("duplicate clusters: components agree with the pair graph") {
    val rows = Dedup.components(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no clusters found on the test corpus")
    val comp = rows.toMap
    // labels are consistent with the underlying pair set: both ends of
    // every near-dup pair carry the same component, and the component
    // id is the smallest member
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (x, y) =>
      assert(comp(x)._1 == comp(y)._1, s"pair ($x,$y) split across clusters")
    }
    rows.groupBy(_._2._1).foreach { case (label, members) =>
      assert(label == members.map(_._1).min,
        s"component $label is not its min member")
      // n_members equals the actual cluster size
      assert(members.forall(_._2._2 == members.size))
    }
    // the survivor is the longest member of its own cluster
    val keeps = Dedup.components(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val chars = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keeps.groupBy(_._2).foreach { case (_, members) =>
      val keep = members.head._3
      assert(members.map(_._1).contains(keep), "survivor outside cluster")
      assert(members.forall(m => chars(keep) >= chars(m._1)),
        "survivor is not the longest member")
    }
  }

  test("stratified sample hits the configured rates within tolerance") {
    val rows = TextAnalysis.sampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, (n, k)) =>
      val rate = if (lang == "en") 0.1 else 0.5
      val tol = 4 * math.sqrt(rate * (1 - rate) / n) // ±4σ binomial
      assert(math.abs(k.toDouble / n - rate) <= tol,
        s"$lang sampled $k/$n, expected ~$rate")
    }
  }

  test("repetition stats are internally consistent") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, bps) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d <= n && bps >= 0 && bps <= 10000)
      if (n > 0) assert(bps == 10000 * (n - d) / n)
    }
  }

  test("contamination screen emits one row per eval phrase") {
    val rows = TextAnalysis.contamination(spark, sf).collect()
    assert(rows.length == TextAnalysis.EVAL_NGRAMS.length)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1))) // occ >= docs
  }

  test("survivor picks the longest doc per group, same groups as exact") {
    val surv = Dedup.survivor(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Dedup.exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(surv.keySet == exact.keySet) // identical duplicate groups
    // survivor's keep_chars must be the group's actual doc length
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    surv.foreach { case (_, (keepId, keepChars)) =>
      assert(docs(keepId) == keepChars)
    }
  }

  test("scrub redacts every denylist hit and nothing else") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.scrub(spark, sf).collect()
    assert(rows.exists(_.getLong(1) > 0), "denylist never hit")
    // every replacement grows the doc by 10 - len(word); bounds:
    // words are 3..5 chars, so growth per hit is in [5, 7]
    rows.foreach { r =>
      val (hits, before, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (hits == 0) assert(after == before)
      else assert(after - before >= 5 * hits && after - before <= 7 * hits,
        s"doc ${r.getLong(0)}: $hits hits grew $before -> $after")
    }
    // untouched docs keep their original fingerprint
    val origFp = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_.getLong(1) == 0).foreach { r =>
      assert(r.getString(4) == origFp(r.getLong(0)))
    }
  }

  test("pipeline v2: per-source rollup reconciles with its stages") {
    val rows = SparkEntry.queries("txt_pipeline_v2")(spark, sf).collect()
    val keptTotal = rows.map(_.getLong(1)).sum
    val gopherKept = SparkEntry.queries("txt_gopher_filter")(spark, sf)
      .collect().count(_.getLong(10) == 1L)
    assert(keptTotal == gopherKept,
      s"pipeline keeps $keptTotal docs, gopher filter kept $gopherKept")
    rows.foreach { r =>
      // each doc plants at most one of each PII kind
      assert(r.getLong(2) <= 3 * r.getLong(1), s"${r.getString(0)} pii bound")
      assert(r.getLong(3) > 0, "cleaned corpus has bytes")
    }
  }

  test("gopher filter: flags recompute from stats, every varying rule fires") {
    val rows = SparkEntry.queries("txt_gopher_filter")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, mwl, stop, dist) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (rl, rm, rs, rr, kept) = (r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))
      assert(rl == (if (n >= 20) 1L else 0L))
      assert(rm == (if (mwl >= 300 && mwl <= 1000) 1L else 0L))
      assert(rs == (if (stop >= 2) 1L else 0L))
      assert(rr == (if (dist >= 50) 1L else 0L))
      assert(kept == rl * rm * rs * rr)
    }
    // the corpus-splitting rules must each fire both ways — a filter
    // that keeps (or drops) everything tests nothing
    Seq(6 -> "r_len", 8 -> "r_stop", 9 -> "r_rep").foreach { case (i, nm) =>
      val vals = rows.map(_.getLong(i)).toSet
      assert(vals == Set(0L, 1L), s"$nm never splits the corpus")
    }
  }

  test("pii scrub: planted contacts detected, redacted text is pattern-free") {
    val rows = SparkEntry.queries("txt_pii_scrub")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L),
        s"doc $id email count")
      assert(r.getLong(2) == (if (id % 4 == 0) 1L else 0L),
        s"doc $id ip count")
      assert(r.getLong(3) == (if (id % 5 == 0) 1L else 0L),
        s"doc $id phone count")
    }
    // end-to-end: rebuild one planted doc, run the same redaction
    // chain by hand, and check nothing PII-shaped survives it
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select(col("text"))
      .collect().head.getString(0)
    val aug = base + " contact user0@example.com from 10.0.0.0 call +1-555-0000"
    val clean = aug
      .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
      .replaceAll("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
      .replaceAll("\\+1-555-\\d{4}", "<PHONE>")
    assert(!clean.contains("@example.com") && !clean.contains("10.0.0.0") &&
      !clean.contains("+1-555"), s"pii survived: $clean")
    assert(clean.contains("<EMAIL>") && clean.contains("<IP>") &&
      clean.contains("<PHONE>"))
    // and the operator's fingerprint for doc 0 equals the hand chain's
    val fp0 = rows.find(_.getLong(0) == 0L).get.getString(5)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(clean.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp0 == expect, "doc 0 fingerprint mismatch vs hand redaction")
  }

  test("shard manifest packs contiguous, complete, size-bounded shards") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.shardManifest(spark, sf).collect()
      .sortBy(_.getLong(0))
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // shards are contiguous ids and non-overlapping doc ranges
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
      case _ =>
    }
    // no shard exceeds target + one max-size doc (the packing bound)
    val maxDoc = docs.agg(max(expr("octet_length(text)")))
      .collect()(0).getInt(0)
    rows.foreach(r => assert(r.getLong(2) <= 256L * 1024 + maxDoc))
  }

  test("source mix: shares total ~10000 bps, dup rates bounded, all docs counted") {
    val rows = SparkEntry.queries("txt_source_mix")(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == docs)
    // integer-div shares undershoot: total in (10000 - n_sources, 10000]
    val share = rows.map(_.getLong(3)).sum
    assert(share <= 10000 && share > 10000 - rows.length,
      s"token shares sum to $share bps")
    rows.foreach(r => assert(r.getLong(4) >= 0 && r.getLong(4) < 10000))
  }

  test("sequence packing: every sequence full except the last, tokens conserved") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("txt_pack_sequences")(spark, sf).collect()
      .sortBy(_.getLong(0))
    // contiguous ids from 0
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    // concat-and-chunk leaves no holes: all but the last exactly 2048
    rows.init.foreach(r => assert(r.getLong(4) == 2048L,
      s"sequence ${r.getLong(0)} not full: ${r.getLong(4)}"))
    assert(rows.last.getLong(4) <= 2048L)
    // token conservation: filled tokens = corpus tokens
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum == corpus)
    // straddler accounting: a doc is full in exactly one sequence
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
  }

  test("embedding LSH dedup: recall 1.0 on planted exact dups, subset of exact") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // plant exact duplicates: vectors 0..9 re-appear as ids 10000..10009
    val dups = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val planted = e.unionByName(dups)
    val found = graft.operators.Dedup.embeddingLshOn(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // an exact dup agrees on every plane -> every band collides ->
    // the pair MUST surface (this is the recall-1.0-on-dups contract)
    (0L until 10L).foreach { i =>
      assert(found.contains((i, i + 10000L)), s"planted dup pair $i missing")
    }
    // and nothing outside the exact >= tau pair set sneaks in: the
    // cosine verify makes blocking affect recall only, never precision
    val exact = {
      val a = planted.select(col("vec_id").as("x"), col("embedding").as("ea"))
      val b = planted.select(col("vec_id").as("y"), col("embedding").as("eb"))
      a.crossJoin(b).filter(col("x") < col("y"))
        .filter(graft.functions.VectorFunctions
          .cosineSim(col("ea"), col("eb")) >= 0.45)
        .select(col("x"), col("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(found.subsetOf(exact), s"non-near-dup pairs: ${found -- exact}")
  }

  test("bloom admission: no false negatives, forced collisions accounted as FPs") {
    import spark.implicits._
    val corpus = Seq("fpA", "fpB", "fpC", "fpD", "fpE", "fpF", "fpG", "fpH")
      .toDF("fp")
    val batch = Seq((1L, "fpA"), (2L, "fresh1"), (3L, "fresh2"),
      (4L, "fresh3")).toDF("doc_id", "fp")
    def run(m: Long): (Long, Long, Long, Long, Long, Long) = {
      val r = Dedup.bloomAdmitOn(batch, corpus, m).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
    // tiny bitmap: 8 fps x 3 probes over 4 bits saturate it, so every
    // fresh doc is a bloom FALSE POSITIVE and must be accounted
    val (bs, hit, dup, fp, adm, idSum) = run(4L)
    assert(bs == 4L && dup == 1L && adm == 3L && idSum == 2L + 3 + 4)
    assert(hit == 4L, s"saturated 4-bit bloom must hit everything, got $hit")
    assert(fp == hit - dup, "FP accounting must close the hit ledger")
    // wide bitmap: the true dup still hits (no false negatives is
    // structural), and with 2^20 bits the fresh docs all miss
    val (_, hitW, dupW, fpW, admW, idSumW) = run(1L << 20)
    assert(dupW == 1L && hitW == 1L && fpW == 0L && admW == 3L &&
      idSumW == 9L, s"wide bloom: hit=$hitW fp=$fpW")
    // count-derived geometry: smallest power of two >= 16n
    assert(Dedup.bloomAdmitBits(400L) == 8192L)
    assert(Dedup.bloomAdmitBits(512L) == 8192L)
    assert(Dedup.bloomAdmitBits(513L) == 16384L)
    assert(Dedup.bloomAdmitBits(0L) == 16L)
  }

  test("semantic dedup: planted cell-mates drop, verdict matches brute force") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val assigned = graft.operators.Similarity.trainedCells(spark, sf)
    // plant exact duplicates INTO their original's cell: ids 0..9
    // re-appear as 20000..20009 with identical vectors and cells
    val dups = assigned.filter(col("vec_id") < 10)
      .select((col("vec_id") + 20000L).as("vec_id"), col("cell"),
        col("embedding"))
    val verdict = Dedup.semanticOn(assigned.unionByName(dups))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = verdict.map(v => v._1 -> v._3).toMap
    // an exact copy sits at cosine 1.0 from its lower-id original in
    // the same cell -> MUST be dropped
    (20000L until 20010L).foreach { i =>
      assert(byId(i) == 0L, s"planted dup $i not dropped")
    }
    // the verdict IS the brute-force within-cell rule: dropped iff a
    // lower-id cell-mate at cosine >= 0.45 exists
    val rows = assigned.unionByName(dups).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray.map(_.toDouble)))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    rows.foreach { case (id, cell, emb) =>
      val hasLower = rows.exists { case (id2, cell2, emb2) =>
        cell2 == cell && id2 < id && cos(emb2, emb) >= 0.45
      }
      assert(byId(id) == (if (hasLower) 0L else 1L),
        s"verdict for $id disagrees with brute force")
    }
    assert(verdict.length == rows.length, "verdict must cover every vector")
  }

  test("embedding LSH dedup: corpus-driven bandBits keeps candidates ~linear") {
    import graft.operators.Dedup
    // the derivation itself: occupancy n/2^bandBits pinned at ~16
    assert(Dedup.lshBandBits(500) == 5)
    assert(Dedup.lshBandBits(2000) == 7)
    assert(Dedup.lshBandBits(1L << 30) == 26)
    assert(Dedup.lshBandBits(1) == 4)              // floor
    assert(Dedup.lshBandBits(Long.MaxValue) == 59) // fits a word per band
    // ×32 probe on duplicate-free corpora (distinct deterministic
    // vectors), so every candidate is a RANDOM collision — the term
    // the adaptive constant exists to bound. With the old fixed
    // bandBits=4 the count would grow ~32²≈1000×; corpus-driven must
    // stay ~32× (per-unit flat).
    def corpus(n: Int) = {
      val sp = spark
      import sp.implicits._
      (0 until n).map { i =>
        val r = new scala.util.Random(i * 2654435761L)
        (i.toLong, Array.fill(64)(r.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding").repartition(32)
    }
    val small = 1000
    val big = 32 * small
    val cSmall = Dedup.lshCandidates(corpus(small),
      Dedup.lshBandBits(small)).count()
    val cBig = Dedup.lshCandidates(corpus(big),
      Dedup.lshBandBits(big)).count()
    val perUnit = (cBig.toDouble / big) / (cSmall.toDouble / small)
    assert(perUnit <= 2.0,
      s"candidate volume superlinear: $cSmall@$small -> $cBig@$big " +
        f"(per-unit ratio $perUnit%.2f)")
  }

  test("image header parse: real PNG/JPEG/GIF bytes, robust to garbage") {
    import graft.operators.{ImageHeaders, ImageSynth}
    // a genuine 1x1 transparent PNG (standard fixture bytes)
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(ImageHeaders.parse(realPng).contains(("png", 1L, 1L)))
    // synthesized payloads round-trip their dimensions
    assert(ImageHeaders.parse(ImageSynth.png(640, 480))
      .contains(("png", 640L, 480L)))
    assert(ImageHeaders.parse(ImageSynth.jpeg(123, 45))
      .contains(("jpeg", 123L, 45L)))
    // the JPEG parser walks APP0+COM segments to reach the SOF — a
    // parser that reads fixed offsets instead gets these wrong
    val j = ImageSynth.jpeg(1000, 2000)
    assert(ImageHeaders.parse(j).contains(("jpeg", 1000L, 2000L)))
    // GIF little-endian screen size
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x10, 0x01, 0x02, 0x00) ++ new Array[Byte](4)
    assert(ImageHeaders.parse(gif).contains(("gif", 272L, 2L)))
    // garbage, text, truncation: None, never a throw
    assert(ImageHeaders.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.parse(realPng.take(12)).isEmpty)
    assert(ImageHeaders.parse(j.take(6)).isEmpty)
    // a JPEG whose stream hits image data before any SOF: None
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    assert(ImageHeaders.parse(noSof).isEmpty)
  }

  test("WAV header parse: real RIFF chunk walk, robust to garbage") {
    import graft.operators.{AudioHeaders, AudioSynth}
    // parameters round-trip through a real little-endian chunk walk
    assert(AudioHeaders.parse(AudioSynth.wav(2, 44100, 16, 1000,
      extraChunk = false)).contains((2L, 44100L, 16L, 4000L)))
    // a LIST chunk before fmt forces the walk — fixed offsets fail
    assert(AudioHeaders.parse(AudioSynth.wav(1, 8000, 8, 50,
      extraChunk = true)).contains((1L, 8000L, 8L, 50L)))
    // odd-size chunk is even-padded per the RIFF spec: hand-build one
    val odd = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
      val body = AudioSynth.wav(1, 8000, 16, 4, extraChunk = false).drop(12)
      bos.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + 3 + 1 + body.length)
      bos.write("WAVE".getBytes("US-ASCII"))
      bos.write("junk".getBytes("US-ASCII")); le32(3)
      bos.write(Array[Byte](1, 2, 3, 0)) // 3 bytes + pad byte
      bos.write(body)
      bos.toByteArray
    }
    assert(AudioHeaders.parse(odd).contains((1L, 8000L, 16L, 8L)))
    // garbage, text, truncation, missing data chunk: None, never throw
    assert(AudioHeaders.parse("RIFFnot really audio".getBytes).isEmpty)
    assert(AudioHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(AudioHeaders.parse(
      AudioSynth.wav(1, 8000, 16, 4, extraChunk = false).take(20)).isEmpty)
    val noData = AudioSynth.wav(1, 8000, 16, 0, extraChunk = false)
      .dropRight(8) // strip the (empty) data chunk
    assert(AudioHeaders.parse(noData).isEmpty)
  }

  test("WAV PCM windows: dataRange walk slices byte-exact 100-frame windows") {
    import graft.operators.{AudioHeaders, AudioSynth, Multimodal}
    // id=9: ch=2, bits=16 (9%3!=0), align=4, 230 frames (planted
    // directly, not via the query's id%100 arithmetic), LIST chunk
    val b = AudioSynth.wavPcm(9L, 2, 16000, 16, 230, extraChunk = true)
    val (off, len, align) = AudioHeaders.dataRange(b).get
    assert((off, len, align) == (62L, 920L, 4L)) // 44 + 18 LIST, 230*4
    // the planted fill really is at the resolved range
    (0 until len.toInt).foreach { j =>
      assert(b(off.toInt + j) == (32 + ((9 + 7L * j) % 95)).toByte)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def dgOf(buf: Array[Byte], o: Int, n: Int) = { md.reset()
      md.update(buf, o, n); md.digest().map("%02x".format(_)).mkString }
    // hostile inputs: never throw
    assert(AudioHeaders.dataRange(b.take(30)).isEmpty)
    assert(AudioHeaders.dataRange("RIFFWAVEnope".getBytes).isEmpty)
    // the query emits exactly the per-window digests for planted docs
    val rows = Multimodal.audioSamples(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val align2 = (id % 2 + 1) * (if (id % 3 == 0) 8 else 16) / 8
      val n = (id % 100 + 1) * 10
      assert(id % 7 != 3 && id % 7 != 5, "rejected kinds leaked through")
      assert(r.getLong(3) <= 100 && r.getLong(4) == r.getLong(3) * align2)
      assert(r.getLong(2) == 44 + (if (id % 2 == 0) 18 else 0) +
        r.getLong(1) * 100 * align2)
      // last window is partial iff 100 does not divide the count
      if (r.getLong(1) == (n - 1) / 100) {
        val expect = n - r.getLong(1) * 100
        assert(r.getLong(3) == expect, s"doc $id last window frames")
      }
    }
    // spot-check one digest against a locally rebuilt payload
    val r0 = rows.find(r => r.getLong(0) % 7 != 3 && r.getLong(0) % 7 != 5).get
    val id0 = r0.getLong(0)
    val b0 = AudioSynth.wavPcm(id0, (id0 % 2 + 1).toInt,
      (8000 + (id0 % 5) * 2000).toInt, if (id0 % 3 == 0) 8 else 16,
      ((id0 % 100 + 1) * 10).toInt, extraChunk = id0 % 2 == 0)
    assert(r0.getString(5) ==
      dgOf(b0, r0.getLong(2).toInt, r0.getLong(4).toInt))
  }

  test("perceptron quality classifier: integer training learns and reproduces") {
    val rows = SparkEntry.queries("ml_perceptron_quality")(spark, sf)
      .collect()
    // the model card: one weight per hash bucket, in order
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    val errors = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == errors), "final_errors must be constant")
    val docs = graft.sources.Tables.documents(spark, sf).count()
    // it LEARNED: the final epoch misclassifies far fewer docs than
    // the all-zero model (which misclassifies everything)
    assert(errors < docs / 2,
      s"final errors $errors of $docs — model failed to learn")
    assert(rows.exists(_.getLong(1) != 0L), "no feature weight moved")
    // bit-reproducible: a full retrain yields the identical model
    val again = SparkEntry.queries("ml_perceptron_quality")(spark, sf)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("BPE: deterministic merge table, application conserves bounds") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("txt_bpe")(spark, sf).collect()
    // run-to-dry under the budget: training stopped strictly inside
    // the budget, and dry means every vocab word is ONE symbol after
    // the full merge sequence (merged symbols are shared across
    // words, so the count lands at ≤ Σ(len−1), data-dependently)
    assert(m.length < graft.operators.TextAnalysis.BpeMergeBudget)
    val mergePairs = m.map(r => (r.getString(1), r.getString(2)))
    val vocabWords = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .filter(col("f") >= graft.operators.TextAnalysis.BpeMinFreq)
      .select(col("w")).collect().map(_.getString(0))
    vocabWords.foreach { w =>
      val enc = graft.functions.BpeEncode.encode(
        w, mergePairs.map(_._1), mergePairs.map(_._2))
      assert(enc.length == 1 && enc(0) == w,
        s"vocab word $w not fully merged: ${enc.mkString("|")}")
    }
    // ranks contiguous from 1; merged symbol is the concatenation
    assert(m.map(_.getLong(0)).toSeq == (1L to m.length).toSeq)
    m.foreach(r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2)))
    // training is deterministic: an uncached retrain (bypassing the
    // session memo) reproduces the identical merge ORDER
    val m2 = graft.operators.TextAnalysis.trainMerges(spark, sf)
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq == m2)
    // application: per-doc subword count sits between the alpha word
    // count (every word >= 1 token) and the alpha char count (no
    // merge ever splits)
    val toks = SparkEntry.queries("txt_bpe_tokens")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bounds = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(toks.keySet == bounds.keySet)
    toks.foreach { case (d, n) =>
      val (nw, nc) = bounds(d)
      assert(n >= nw && n <= nc, s"doc $d: $n outside [$nw, $nc]")
    }
    // merges actually compress: strictly fewer tokens than chars
    assert(toks.values.sum < bounds.values.map(_._2).sum)
  }

  test("BPE-budgeted packing: full sequences, subword conservation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("txt_pack_bpe")(spark, sf).collect()
      .sortBy(_.getLong(0))
    // contiguous ids, every sequence full except the last
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    rows.init.foreach(r => assert(r.getLong(4) == 2048L,
      s"sequence ${r.getLong(0)} not full: ${r.getLong(4)}"))
    assert(rows.last.getLong(4) <= 2048L)
    // conservation: filled subwords = the per-doc subword totals
    val total = SparkEntry.queries("txt_bpe_tokens")(spark, sf)
      .agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum == total)
  }

  test("BPE coverage audit reconciles with the per-doc token counts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("txt_bpe_coverage")(spark, sf).collect()
    assert(rows.nonEmpty)
    // subword volume across languages equals the per-doc pipeline's
    val perDoc = SparkEntry.queries("txt_bpe_tokens")(spark, sf)
      .agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == perDoc)
    rows.foreach { r =>
      val (words, subwords, unmerged, fert) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // a word is at least one subword; unmerged words are a subset
      assert(subwords >= words && unmerged <= words)
      // fertility is the integer percent of exactly those two sums
      assert(fert == 100 * subwords / words)
    }
    // the trained table compresses the corpus: somewhere a multi-char
    // word merged below its character count
    assert(rows.map(_.getLong(3)).sum < rows.map(_.getLong(1)).sum)
  }

  test("BPE application plan: ONE projection regardless of merge count") {
    import org.apache.spark.sql.functions.sum
    val merges = graft.operators.TextAnalysis.bpeMerges(spark, sf)
      .map { case (a, b, _) => (a, b) }
    assert(merges.length > 80) // run-to-dry training, not the toy 25-cap
    val small = graft.operators.TextAnalysis
      .bpeTokenCountsWith(spark, sf, merges.take(2))
    val full = graft.operators.TextAnalysis
      .bpeTokenCountsWith(spark, sf, merges)
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int, Boolean) = {
      val p = df.queryExecution.executedPlan.toString
      (p.sliding("Project".length).count(_ == "Project"),
        p.sliding("bpe_encode".length).count(_ == "bpe_encode"),
        p.contains("replace("))
    }
    val (projS, encS, replS) = shape(small)
    val (projF, encF, replF) = shape(full)
    // the merge table rides as a reference object: K changes NOTHING
    // about the plan — same projection count, one bpe_encode, and no
    // K-chained replace anywhere
    assert(projS == projF, s"projections grew with K: $projS -> $projF")
    assert(encS == 1 && encF == 1)
    assert(!replS && !replF, "chained replace() back in the apply plan")
    // and the application result is insensitive to HOW the plan was
    // built only for the same table: fewer merges => more subwords
    val nSmall = small.agg(sum("n_subwords")).collect()(0).getLong(0)
    val nFull = full.agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(nSmall > nFull)
  }

  test("BpeEncode: greedy left-to-right fold semantics, rank order, memo") {
    import graft.functions.BpeEncode
    def enc(w: String, m: (String, String)*): Seq[String] =
      BpeEncode.encode(w, m.map(_._1).toArray, m.map(_._2).toArray).toSeq
    // the overlapping-repeat case that distinguishes the fold from a
    // string-level replace: the fold re-merges against the NEW last
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "aa"))
    assert(enc("aaa", ("a", "a")) == Seq("aa", "a"))
    // rank order matters: (a,b) first consumes the b that (b,c) would
    assert(enc("abc", ("a", "b"), ("b", "c")) == Seq("ab", "c"))
    assert(enc("abc", ("b", "c"), ("a", "b")) == Seq("a", "bc"))
    // chains compose into longer symbols across ranks
    assert(enc("abab", ("a", "b"), ("ab", "ab")) == Seq("abab"))
    // untouched words and single chars survive
    assert(enc("xyz") == Seq("x", "y", "z"))
    assert(enc("q", ("a", "b")) == Seq("q"))
    // the memoized count agrees with the raw fold
    val t = new BpeEncode.Table(Array("a", "aa"), Array("a", "a"))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("aaaaa")
    // rank1: aaaaa -> [aa,aa,a]; rank2 (aa,a): -> [aa,aaa]
    assert(BpeEncode.count(u, t) == 2L)
    assert(BpeEncode.count(u, t) == 2L) // second call hits the memo
  }

  test("langid: trigram profiles classify a mixed-language corpus, margin yields und") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog and runs into the forest looking for food"),
      (2L, "fr", "le gouvernement de la république a annoncé que les enfants et les parents seraient invités"),
      (3L, "de", "der schnelle braune fuchs springt über den faulen hund und die kinder sprechen in der schule"),
      (4L, "es", "el gobierno de la república anunció que los niños y los padres hablan español en la escuela"),
      (5L, "zh", "今天天气很好我们一起去公园散步然后回家吃饭"),
      (6L, "und", "ok"), // too short for any signal -> no clear winner
      (7L, "en", "it is going to rain and the wind is strong so we stay in the house"),
      (8L, "fr", "il faut que nous allions chercher les lettres et les paquets de la poste"),
      (9L, "de", "ich möchte ein buch über die geschichte und die sprache der deutschen lesen"),
      (10L, "es", "quiero comprar las manzanas y los tomates en el mercado de la ciudad"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdOn(corpus).collect()
    out.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: predicted ${r.getString(2)}, labeled ${r.getString(1)}")
    }
    // the confident predictions carry a real margin (>= 20% of top)
    out.filter(_.getString(2) != "und").foreach { r =>
      assert(5 * (r.getLong(3) - r.getLong(4)) >= r.getLong(3))
    }
  }

  test("kmeans update: batch fully assigned, fit stats internally consistent") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val rows = SparkEntry.queries("ml_kmeans_update")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val batchSize = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0).count()
    assert(rows.map(_._2).sum == batchSize,
      "every batch vector must land in exactly one cell")
    rows.foreach { case (cell, n, mn, sm, mx) =>
      assert(n > 0)
      assert(mn <= mx && mn * n <= sm && sm <= mx * n,
        s"cell $cell stats inconsistent: n=$n min=$mn sum=$sm max=$mx")
      assert(mx <= 1000000L, s"cell $cell cosine above 1")
    }
    // assignment agrees with the corpus-wide trained assignment for
    // the overlapping vectors (same centroids, same argmax)
    val corpusCells = graft.operators.Similarity.trainedCells(spark, sf)
      .filter(col("vec_id") % 5 === 0)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == corpusCells,
      "update assignment diverges from the trained corpus assignment")
  }

  test("filtered search: every neighbor carries the query's target label") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("sim_knn_filtered")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, tgt, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(tgt == (q + 3) % 10)
      assert(labels(n) == tgt, s"query $q neighbor $n label ${labels(n)}")
      assert(n != q)
    }
    // exactly 5 ranked rows per query — pre-filtering, never a
    // post-filter that comes up short
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"query $q ranks malformed")
    }
  }

  test("mrl search: shortlist rerank recalls most exact neighbors") {
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("sim_knn_brute")
    val mrl = pairs("sim_knn_mrl")
    assert(mrl.size == exact.size, "same result shape as exact top-k")
    val overlap = (exact & mrl).size
    // measured 88/100 at sf0.001 (prefix 32, depth 64) on UNtrained
    // synthetic vectors; assert a wide floor so the property — the
    // prefix shortlist recovers most true neighbors — is pinned
    // without riding the exact corpus
    assert(overlap >= 70, s"recall@5 too low: $overlap/${exact.size}")
    // and per query the result is exactly K ranked rows
    val perQ = SparkEntry.queries("sim_knn_mrl")(spark, sf).collect()
      .groupBy(_.getLong(0))
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"query $q ranks malformed")
    }
  }

  test("mix sample: rates track target weights, scarcest source binds at ~100%") {
    val rows = SparkEntry.queries("txt_mix_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    val byIdx = rows.map { case (src, n, rate, adm) =>
      (src.drop(3).toInt, n, rate, adm)
    }.sortBy(_._1)
    // admission rate is monotone in the target weight (idx + 1)
    byIdx.sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(a._3 < b._3, s"rate not increasing: src${a._1} -> src${b._1}")
    }
    // the heaviest-weight source is the scarce one — it binds the
    // feasible mixture, so its rate saturates near 10000 bps
    assert(byIdx.last._3 >= 9900L && byIdx.last._3 <= 10000L)
    byIdx.foreach { case (i, n, rate, adm) =>
      assert(rate >= 0L && rate <= 10000L)
      assert(adm >= 0L && adm <= n, s"src$i admitted more than it has")
    }
  }

  test("lm buckets: per-language terciles are balanced and score-ordered") {
    val rows = SparkEntry.queries("txt_lm_buckets")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val sizes = docs.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      // ntile(3): bucket sizes within 1 of each other
      val s = (1L to 3L).map(b => sizes.getOrElse(b, 0L))
      assert(s.max - s.min <= 1, s"$lang tercile sizes skewed: $s")
      // ordering: the head's worst score is no worse than the
      // middle's best, and so on down (ties may touch, never cross)
      def scores(b: Long) = docs.filter(_._4 == b).map(_._3)
      for (b <- 1L to 2L if scores(b).nonEmpty && scores(b + 1).nonEmpty)
        assert(scores(b).min >= scores(b + 1).max,
          s"$lang bucket $b not score-ordered vs ${b + 1}")
    }
    val names = rows.map(r => r._4 -> r._5).distinct.toMap
    assert(names == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("lm score: proper probabilities, model-typical text beats shuffled text") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("txt_lm_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    // mean bigram micro-probability is a probability: (0, 1e6]
    rows.foreach { r =>
      val sc = r.getLong(2)
      assert(sc > 0 && sc <= 1000000L,
        s"doc ${r.getLong(0)} score $sc outside (0, 1e6]")
      assert(r.getLong(1) > 0)
    }
    // n_bigrams == normalized length - 1 (cross-check one doc end-to-end)
    val probe = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"), (length(col("t")) - 1).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == probe(r.getLong(0))))
    // discrimination: corpus-typical text must outscore the same
    // characters in scrambled order (the quality-filter property)
    val best = rows.map(_.getLong(2)).max
    val worst = rows.map(_.getLong(2)).min
    assert(best > worst, "scorer assigns one score to every doc")
  }

  test("audio features: signed 16-bit decode, window aggregates exact") {
    // hand-built mono 16-bit WAV: 3 frames with a NEGATIVE sample —
    // the planted corpus never sets the sign bit, so pin the
    // sign-extension path explicitly
    val pcm = Seq[Short](1000, -2000, 300)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + pcm.length * 2)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    bos.write("data".getBytes("US-ASCII")); le32(pcm.length * 2)
    pcm.foreach(v => le16(v & 0xffff))
    val wins = graft.operators.Multimodal
      .pcmWindowStats(7L, bos.toByteArray, bits = 16, framesPerWin = 2L)
    assert(wins.map(_.win_idx) == Seq(0L, 1L), "two windows (last partial)")
    val w0 = wins.head
    assert(w0.n_frames == 2L && w0.sum_amp == -1000L &&
      w0.energy == 1000L * 1000 + 2000L * 2000 &&
      w0.peak_abs == 2000L && w0.min_amp == -2000L,
      s"window 0 stats wrong: $w0")
    val w1 = wins(1)
    assert(w1.n_frames == 1L && w1.sum_amp == 300L && w1.energy == 90000L &&
      w1.peak_abs == 300L && w1.min_amp == 300L, s"window 1 stats wrong: $w1")
    // garbage never yields rows
    assert(graft.operators.Multimodal
      .pcmWindowStats(9L, "not a wav".getBytes, 16, 2L).isEmpty)
  }

  test("MP4 box walk: real ISO-BMFF framing, v0/v1/largesize/to-EOF, robust") {
    import graft.operators.{VideoHeaders, VideoSynth}
    // parameters round-trip through a real big-endian box walk
    assert(VideoHeaders.parse(VideoSynth.mp4(1000, 5000L, 2,
      extraBox = false)).contains(("isom", 1000L, 5000L, 2L)))
    // a free box before moov forces the walk — fixed offsets fail
    assert(VideoHeaders.parse(VideoSynth.mp4(600, 1234L, 1,
      extraBox = true)).contains(("isom", 600L, 1234L, 1L)))
    // version-1 mvhd: u64 duration wider than any u32
    assert(VideoHeaders.parse(VideoSynth.mp4(90000, 5000000000L, 3,
      extraBox = false, v1 = true))
      .contains(("isom", 90000L, 5000000000L, 3L)))
    // size==1 largesize framing of the free box must be stepped over
    val withLarge = {
      val base = VideoSynth.mp4(1000, 7000L, 1, extraBox = false)
      val ftypLen = 16
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(base, 0, ftypLen)
      bos.write(VideoSynth.boxLarge("free",
        "payload".getBytes("US-ASCII")))
      bos.write(base, ftypLen, base.length - ftypLen)
      bos.toByteArray
    }
    assert(VideoHeaders.parse(withLarge).contains(("isom", 1000L, 7000L, 1L)))
    // size==0 (box to end of file): patch moov's size field to zero
    // after dropping the trailing mdat so moov IS the last box
    val toEof = {
      val full = VideoSynth.mp4(1000, 9000L, 2, extraBox = false)
      val noMdat = full.dropRight(12) // mdat is 8 hdr + 4 payload
      val ftypLen = 16
      noMdat(ftypLen) = 0; noMdat(ftypLen + 1) = 0
      noMdat(ftypLen + 2) = 0; noMdat(ftypLen + 3) = 0
      noMdat
    }
    assert(VideoHeaders.parse(toEof).contains(("isom", 1000L, 9000L, 2L)))
    // garbage, truncation, missing mvhd: None, never throw
    assert(VideoHeaders.parse("ftypnot a movie at all".getBytes).isEmpty)
    assert(VideoHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(VideoHeaders.parse(
      VideoSynth.mp4(1000, 5000L, 1, extraBox = false).take(30)).isEmpty)
    val noMvhd = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(VideoSynth.box("ftyp",
        "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0)))
      bos.write(VideoSynth.box("moov",
        VideoSynth.box("trak", "trakstub".getBytes("US-ASCII"))))
      bos.toByteArray
    }
    assert(VideoHeaders.parse(noMvhd).isEmpty)
    // the oracle-backed query parses every planted payload back
    val rows = SparkEntry.queries("mm_video_meta")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "isom")
      assert(r.getLong(2) == 1000 + (id % 4) * 500)
      assert(r.getLong(3) == (id % 90 + 1) * 1000)
      assert(r.getLong(4) == id % 3 + 1)
    }
  }

  test("MP4 sample tables: stsz/stsc/stco walk slices chunked samples") {
    import graft.operators.{VideoHeaders, VideoSynth}
    // id=9 → spc=1: every sample its own chunk, 4-byte gaps between
    val b = VideoSynth.mp4Sampled(9L, 1000, 1000L, 3, extraBox = true)
    val samples = VideoHeaders.parseSamples(b).get
    assert(samples.size == 3)
    assert(samples.map(_._1) == Seq(0, 1, 2), "one chunk per sample")
    // chunks are NOT contiguous: each next offset skips the gap
    samples.sliding(2).foreach { case Seq((_, o1, s1), (_, o2, _)) =>
      assert(o2 == o1 + s1 + VideoSynth.chunkGap,
        "next chunk must start after the inter-chunk gap")
    }
    samples.zipWithIndex.foreach { case ((_, off, sz), i) =>
      assert(sz == 20 + ((9 + i) % 7) * 10)
      // the sliced bytes ARE the planted fill — byte-exact extraction
      val fill = (65 + ((9 + i) % 26)).toByte
      (off.toInt until (off + sz).toInt).foreach(j => assert(b(j) == fill))
    }
    // the last sample ends exactly at end-of-file (mdat fully used)
    val (_, lo, ls) = samples.last
    assert(lo + ls == b.length)
    // id=4 → n=5, spc=2: k=3 chunks, last partial ⇒ 2-entry stsc run
    // list (1,2),(3,1) — the multi-chunk multi-entry layout
    val b4 = VideoSynth.mp4Sampled(4L, 1000, 1000L, 5, extraBox = true)
    val s4 = VideoHeaders.parseSamples(b4).get
    assert(s4.map(_._1) == Seq(0, 0, 1, 1, 2), "stsc run expansion")
    // within a chunk samples are contiguous; across chunks gapped
    assert(s4(1)._2 == s4(0)._2 + s4(0)._3)
    assert(s4(2)._2 == s4(1)._2 + s4(1)._3 + VideoSynth.chunkGap)
    assert(s4(4)._2 == s4(3)._2 + s4(3)._3 + VideoSynth.chunkGap)
    s4.zipWithIndex.foreach { case ((_, off, sz), i) =>
      assert(sz == 20 + ((4 + i) % 7) * 10)
      val fill = (65 + ((4 + i) % 26)).toByte
      (off.toInt until (off + sz).toInt).foreach(j => assert(b4(j) == fill))
    }
    assert(s4.last._2 + s4.last._3 == b4.length)
    // fixed-size stsz form (sample_size != 0): patch it in
    val fixed = {
      val c = b.clone()
      // stsz payload starts right after its header inside stbl; find it
      val i = {
        var k = 0
        while (!(c(k) == 's' && c(k + 1) == 't' && c(k + 2) == 's' &&
          c(k + 3) == 'z')) k += 1
        k + 4 // payload start (after the 4cc; header size precedes 4cc)
      }
      // payload: [verflags][sample_size][count] — set sample_size=25
      c(i + 4) = 0; c(i + 5) = 0; c(i + 6) = 0; c(i + 7) = 25
      c
    }
    val fixedSamples = VideoHeaders.parseSamples(fixed).get
    assert(fixedSamples.map(_._3) == Seq(25L, 25L, 25L),
      "fixed-size stsz form must be honored")
    // truncation and garbage: None, never throw
    assert(VideoHeaders.parseSamples(b.take(40)).isEmpty)
    assert(VideoHeaders.parseSamples("ftypnope".getBytes).isEmpty)
    // legal-but-hostile tables never throw either (the ADVICE
    // contract): a moov whose stco points past EOF, and an empty
    // stsz, both resolve to None instead of AIOOBE/NoSuchElement
    val clipped = b4.take(b4.length - 30) // moov intact, mdat short
    assert(VideoHeaders.parseSamples(clipped).isEmpty,
      "sample ranges past EOF must be rejected, not sliced")
    val emptyStsz = {
      val c = b.clone()
      val i = {
        var k = 0
        while (!(c(k) == 's' && c(k + 1) == 't' && c(k + 2) == 's' &&
          c(k + 3) == 'z')) k += 1
        k + 4
      }
      // zero the sample count: [verflags][sample_size][count=0]
      c(i + 8) = 0; c(i + 9) = 0; c(i + 10) = 0; c(i + 11) = 0
      c
    }
    assert(VideoHeaders.parseSamples(emptyStsz).isEmpty,
      "an empty sample table must yield None, not head-of-empty")
  }

  test("split audit: complete, disjoint, deterministic, near target shares") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("txt_split")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.values.map(_._1).sum == corpus, "splits must partition the corpus")
    // hash uniformity: train targets 95% — allow a generous envelope
    // at sf0.001's 500 docs (binomial sigma ~1%)
    val trainBps = rows("train")._3
    assert(trainBps > 9200 && trainBps < 9800,
      s"train share $trainBps bps far from the 9500 target")
    // share arithmetic is exact integer division of the same counts
    rows.values.foreach { case (n, _, bps) =>
      assert(bps == 10000 * n / corpus)
    }
    // determinism: a second run reproduces the table exactly
    val again = SparkEntry.queries("txt_split")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(again == rows)
  }

  test("phash near-dup: real PNG decode, banded LSH matches brute force") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Multimodal, ImageSynth, DHash}
    // the payloads are REAL PNGs: the JDK codec round-trips the pixels
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageSynth.realPng(7L)))
    assert(img != null && img.getWidth == 32 && img.getHeight == 32)
    assert((img.getRGB(0, 0) & 0xff) == ((img.getRGB(0, 0) >> 16) & 0xff),
      "gray payload must decode gray")
    // ids 40 apart with perturbation 0 are pixel-identical → distance 0
    val h40 = DHash.of(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageSynth.realPng(1L))))
    val h41 = DHash.of(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageSynth.realPng(1L + 40 * 3))))
    assert(h40 == h41, "identical images must hash identically")
    val pairs = Multimodal.phashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.nonEmpty)
    // every reported near-dup shares a base pattern: perceptually
    // independent images never land within the Hamming threshold
    pairs.keys.foreach { case (a, b) =>
      assert(a % 40 == b % 40, s"cross-base pair ($a, $b) reported")
    }
    // exactness: LSH output == brute force restricted to band-sharing
    // (the algorithm's contract), and ⊇ ALL pairs within 3 bits (the
    // pigeonhole guarantee: 4 bands, ≤3 flips leave one band intact)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val hashes = docs.map(id => id -> DHash.of(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageSynth.realPng(id))))).toMap
    def sharesBand(x: Long, y: Long): Boolean =
      (0 until 4).exists(b => ((x >> (b * 16)) & 0xffffL) ==
        ((y >> (b * 16)) & 0xffffL))
    val sorted = docs.sorted
    val brute = (for {
      i <- sorted.indices.iterator
      j <- (i + 1) until sorted.length
      a = sorted(i); b = sorted(j)
      dist = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if dist <= 6 && sharesBand(hashes(a), hashes(b))
    } yield (a, b) -> dist.toLong).toMap
    assert(pairs == brute, "LSH pairs must equal band-sharing brute force")
    sorted.indices.foreach { i =>
      ((i + 1) until sorted.length).foreach { j =>
        val (a, b) = (sorted(i), sorted(j))
        val dist = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
        if (dist <= 3)
          assert(pairs.contains((a, b)),
            s"≤3-bit pair ($a, $b, dist $dist) missed — pigeonhole broken")
      }
    }
  }

  test("image features: quantized tile decode equals the planted field in both codecs") {
    import graft.operators.{ImageSynth, Multimodal}
    // all 160 payload variants: 40 bases x {png, jpeg} x {d=0, d=1}
    (0L until 160L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageSynth.realImage(id)))
      val base = id % 40
      val d = (id / 80) % 2
      for (by <- 0 until 8; bx <- 0 until 9) {
        var sum = 0L
        for (py <- 0 until 4; px <- 0 until 4) {
          val rgb = img.getRGB(bx * 4 + px, by * 4 + py)
          sum += (299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        }
        val q = math.max(0L, math.min(4L, (sum / 16 - 15 + 27) / 55))
        assert(q == ImageSynth.fieldIdx(base, d, bx, by).toLong,
          s"id=$id block ($bx,$by): decoded level $q != planted")
      }
    }
  }

  test("cross-codec phash: JPEG round-trip hashes bit-equal to planted field") {
    import graft.operators.{ImageSynth, DHash, Multimodal}
    // EXHAUSTIVE over the payload universe: ids mod 160 cover every
    // (base, codec, perturbation) combination — if each codec's
    // decoded dHash equals the planted-field arithmetic for all 160,
    // it does at every corpus scale, which is what licenses the
    // DuckDB oracle to recompute hashes arithmetically
    (0L until 160L).foreach { id =>
      val h = DHash.ofBytes(ImageSynth.realImage(id))
      val codec = if ((id / 40) % 2 == 0) "png" else "jpeg"
      assert(h != null, s"id $id ($codec) failed to decode")
      assert(h.longValue == ImageSynth.plantedHash(id),
        s"id $id ($codec): decoded hash ${h.longValue} != planted " +
          s"${ImageSynth.plantedHash(id)} — lossy round-trip broke a bit")
    }
    // cross-codec identity: same (base, d) through PNG and through
    // JPEG are the SAME perceptual hash (ids 40 apart, same id/80)
    (0L until 40L).foreach { base =>
      assert(DHash.ofBytes(ImageSynth.realImage(base)).longValue ==
        DHash.ofBytes(ImageSynth.realImage(base + 40)).longValue,
        s"base $base: PNG and JPEG encodings hash apart")
    }
    // the perturbed variant is a near-dup, never far: hamming ≤ 2
    (0L until 80L).foreach { id =>
      val d0 = ImageSynth.plantedHash(id)
      val d1 = ImageSynth.plantedHash(id + 80)
      assert(java.lang.Long.bitCount(d0 ^ d1) <= 2,
        s"id $id: perturbation moved ${java.lang.Long.bitCount(d0 ^ d1)} bits")
    }
    // the query groups cross-codec docs under one hash
    val rows = Multimodal.phashGroups(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(r => r.getLong(2) > 0 && r.getLong(3) > 0),
      "no phash group holds both PNG and JPEG members")
    // group doc counts cover the whole corpus exactly once
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("recall audit: hits and misses reconcile against both sub-pipelines") {
    import graft.operators.Similarity
    val truth = Similarity.knnBrute(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val approx = Similarity.knnIvf(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val audit = Similarity.recallAudit(spark, sf).collect()
    assert(audit.length == 20, s"expected 20 query rows, got ${audit.length}")
    audit.foreach { r =>
      val (q, k, hits, missSum, bps) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val tq = truth.filter(_._1 == q)
      assert(k == tq.length, s"q$q: k $k != true top-k size ${tq.length}")
      assert(hits == tq.count(approx.contains),
        s"q$q: n_hits $hits != recomputed ${tq.count(approx.contains)}")
      assert(missSum == tq.filterNot(approx.contains).map(_._2).sum,
        s"q$q: missed_id_sum does not pin the miss set")
      assert(bps == 10000 * hits / k, s"q$q: recall_bps $bps inconsistent")
    }
    // the index is useful but not perfect here — the audit must be
    // able to show BOTH (all-10000 or all-0 would verify nothing)
    val bpsVals = audit.map(_.getLong(4))
    assert(bpsVals.max == 10000, "no query achieved full recall")
    assert(bpsVals.min < 10000, "nprobe=3 missed nothing — audit vacuous")
  }

  test("lang confusion: cells partition the corpus and mirror the per-doc audit") {
    import graft.operators.TextAnalysis
    val perDoc = TextAnalysis.langId(spark, sf)
      .select("labeled_lang", "pred_lang", "doc_id").collect()
    val expected = perDoc.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) =>
        (k, (rs.length.toLong, rs.map(_.getLong(2)).sum)) }
    val cells = TextAnalysis.langConfusion(spark, sf).collect()
    assert(cells.length == expected.size,
      s"cell count ${cells.length} != distinct (labeled, pred) pairs ${expected.size}")
    assert(cells.map(_.getLong(2)).sum == perDoc.length,
      "cells do not partition the corpus")
    cells.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(expected(k) == ((r.getLong(2), r.getLong(3))),
        s"cell $k disagrees with the per-doc audit")
    }
  }
}
