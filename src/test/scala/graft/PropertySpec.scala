package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.operators.Advanced

/** Property-based invariants over generated data (raw ScalaCheck
  * driven from ScalaTest; the plus-bridge artifact is not on the
  * offline classpath). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("rolling hash is deterministic and within the modulus") {
    check("rolling-hash", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val hs = Seq(s, s).toDF("s")
        .select(RollingHash.rollingHash(col("s")).as("h"))
        .collect().map(_.getLong(0))
      hs(0) == hs(1) && hs(0) >= 0 && hs(0) < 2147483647L
    })
  }

  test("cosine self-similarity is 1 on generated vectors") {
    import graft.functions.VectorFunctions.cosineSim
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f))
      .suchThat(_.exists(_ != 0f))
    check("cosine-self", Prop.forAll(vecGen) { xs =>
      val arr = xs.toArray
      val self = Seq((arr, arr)).toDF("a", "b")
        .select(cosineSim(col("a"), col("b"))).collect()(0).getDouble(0)
      math.abs(self - 1.0) < 1e-9
    }, n = 10)
  }

  test("image header parser never throws and never misreads synth dims") {
    import graft.operators.{ImageHeaders, ImageSynth}
    // total on arbitrary byte arrays — a header parser fed a 100 TB
    // binary column must degrade to None, never to a task failure
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    check("parse-total", Prop.forAll(bytesGen) { b =>
      ImageHeaders.parse(b) // must not throw
      true
    }, n = 200)
    // truncation at ANY point parses or rejects, never throws
    val full = ImageSynth.jpeg(640, 480) ++ ImageSynth.png(13, 7)
    check("parse-truncation", Prop.forAll(
      Gen.chooseNum(0, full.length)) { k =>
      ImageHeaders.parse(full.take(k))
      true
    }, n = 100)
    // synth round-trip holds for arbitrary in-range dimensions
    val dimGen = Gen.chooseNum(1, 65535)
    check("synth-roundtrip", Prop.forAll(dimGen, dimGen) { (w, h) =>
      ImageHeaders.parse(ImageSynth.jpeg(w, h))
        .contains(("jpeg", w.toLong, h.toLong)) &&
      ImageHeaders.parse(ImageSynth.png(w, h))
        .contains(("png", w.toLong, h.toLong))
    }, n = 50)
  }

  test("sample-table and PCM-range parsers are total on hostile bytes") {
    import graft.operators.{VideoHeaders, AudioHeaders, VideoSynth, AudioSynth}
    // arbitrary bytes: degrade to None, never to a task failure
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray)
    check("samples-total", Prop.forAll(bytesGen) { b =>
      VideoHeaders.parseSamples(b)
      AudioHeaders.dataRange(b)
      true
    }, n = 200)
    // truncating a VALID payload at ANY byte: parse or reject, never
    // throw, and never yield a byte range outside the buffer — the
    // exact contract the r10 ADVICE asked the sample walk to keep
    val mp4 = VideoSynth.mp4Sampled(4L, 1000, 1000L, 5, extraBox = true)
    check("mp4-truncation", Prop.forAll(Gen.chooseNum(0, mp4.length)) { k =>
      val cut = mp4.take(k)
      VideoHeaders.parseSamples(cut).forall(_.forall {
        case (_, off, sz) => off >= 0 && off + sz <= cut.length
      })
    }, n = 150)
    val wav = AudioSynth.wavPcm(11L, 2, 16000, 16, 77, extraChunk = true)
    check("wav-truncation", Prop.forAll(Gen.chooseNum(0, wav.length)) { k =>
      val cut = wav.take(k)
      AudioHeaders.dataRange(cut).forall {
        case (off, len, align) =>
          off >= 0 && off + len <= cut.length && align > 0
      }
    }, n = 150)
    // single-byte corruption anywhere in the header region: still
    // total, and any returned ranges stay inside the buffer
    check("mp4-corruption", Prop.forAll(
      Gen.chooseNum(0, mp4.length - 1), Gen.chooseNum(-128, 127)) { (i, v) =>
      val c = mp4.clone(); c(i) = v.toByte
      VideoHeaders.parseSamples(c).forall(_.forall {
        case (_, off, sz) => off >= 0 && off + sz <= c.length
      })
    }, n = 200)
  }

  test("salted join equals plain join on generated key distributions") {
    val keysGen = Gen.listOfN(200, Gen.chooseNum(1L, 10L)).suchThat(_.nonEmpty)
    check("salted-join", Prop.forAll(keysGen) { keys =>
      val fact = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "v")
      val dim = (1L to 10L).map(k => (k, s"d$k")).toDF("k", "name")
      val salted = Advanced.saltedJoin(fact, dim, "k", salt = 4)
        .agg(count(lit(1)), sum("v")).collect()(0)
      val plain = fact.join(dim, "k")
        .agg(count(lit(1)), sum("v")).collect()(0)
      salted == plain
    }, n = 5)
  }

  test("driver contract: every query has an oracle and every oracle a query") {
    // an entry missing from oracleSql silently downgrades the
    // driver's correctness gate to a rows-only check; a dangling
    // oracle is dead SQL that drifts — both are contract breaks
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    // oracle SQL must be non-empty and free of unresolved interpolation
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty && !sql.contains("${"),
        s"$k oracle looks malformed")
    }
  }
}
