package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{RollingHash, VectorFunctions}

/** Edge cases for the native expressions: nulls, empty and mismatched
  * arrays, unicode, and interpreted-vs-codegen agreement. */
class FunctionsEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("sorted_intersect_size: empties, nulls, duplicates, equals array_intersect") {
    import graft.functions.SortedIntersectSize.sortedIntersectSize
    val df = Seq(
      (Some(Seq("a", "b", "c")), Some(Seq("b", "c", "d"))),
      (Some(Seq.empty[String]), Some(Seq("a"))),
      (None, Some(Seq("a"))),
      // duplicates inside an input count once (set semantics)
      (Some(Seq("a", "b", "b", "c")), Some(Seq("b", "b", "c"))))
      .toDF("a", "b")
    val got = df.select(sortedIntersectSize(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 2L)
    assert(got(1).getLong(0) == 0L)
    assert(got(2).isNullAt(0))
    assert(got(3).getLong(0) == 2L)
    // random sorted arrays agree with size(array_intersect)
    val rnd = new scala.util.Random(11)
    val rand = Seq.fill(50)((
      Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct.sorted,
      Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct.sorted))
      .toDF("a", "b")
    val both = rand.select(
      sortedIntersectSize(col("a"), col("b")).as("m"),
      expr("size(array_intersect(a, b))").cast("long").as("r")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("cosine: null inputs give null, zero vectors give NaN") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(1f, 2f))),
      (None, Some(Array(1f, 2f))),
      (Some(Array(0f, 0f)), Some(Array(1f, 2f))))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0).isNaN)
  }

  test("cosine: mismatched lengths truncate BOTH vectors to the prefix") {
    val df = Seq((Array(1f, 0f, 9f), Array(1f, 0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSim(col("a"), col("b")))
      .collect()(0).getDouble(0)
    // dot and both norms computed over the 2-dim common prefix -> 1.0
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("rolling_hash: empty string is 0, unicode codepoints counted once") {
    val df = Seq("", "a", "é", "😀" /* 😀, surrogate pair */)
      .toDF("s")
    val got = df.select(RollingHash.rollingHash(col("s"))).collect()
      .map(_.getLong(0))
    assert(got(0) == 0L)
    assert(got(1) == 'a'.toLong)
    assert(got(2) == 0xe9L)
    assert(got(3) == 0x1f600L) // one codepoint, not two UTF-16 units
  }

  test("interpreted eval matches codegen for the native expressions") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f), "graft"))
      .toDF("a", "b", "s")
    val fast = df.select(
      VectorFunctions.cosineSim(col("a"), col("b")).as("c"),
      RollingHash.rollingHash(col("s")).as("h")).collect()(0)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val slow = df.select(
        VectorFunctions.cosineSim(col("a"), col("b")).as("c"),
        RollingHash.rollingHash(col("s")).as("h")).collect()(0)
      assert(fast.getDouble(0) == slow.getDouble(0))
      assert(fast.getLong(1) == slow.getLong(1))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
