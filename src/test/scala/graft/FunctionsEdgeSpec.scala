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

  test("sorted_intersect_size: null ELEMENTS follow array_intersect semantics") {
    import graft.functions.SortedIntersectSize.sortedIntersectSize
    val df = Seq(
      // null present in both inputs: matches itself, counted once
      (Seq(Option.empty[String], Some("a"), Some("b")),
        Seq(Option.empty[String], Some("b"))),
      // null on one side only: contributes nothing
      (Seq(Option.empty[String], Some("a")), Seq(Some("a"))),
      // a mid-array null (caller ignored the sorted-nulls-first
      // contract): skipped, never dereferenced — no NPE
      (Seq(Some("a"), Option.empty[String]),
        Seq(Option.empty[String], Some("a"))))
      .toDF("a", "b")
    val got = df.select(sortedIntersectSize(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 2L) // {null, b}
    assert(got(1).getLong(0) == 1L) // {a}
    assert(got(2).getLong(0) == 1L) // left null is mid-array: skipped
    // agreement with array_intersect on the contract-conforming rows
    val ref = df.limit(2)
      .select(expr("size(array_intersect(a, b))").cast("long")).collect()
    assert(ref(0).getLong(0) == 2L && ref(1).getLong(0) == 1L)
    // and via the SQL registry (ADVICE: user-reachable path must not NPE)
    GraftExtensions.install(spark)
    val sqlGot = spark.sql(
      "SELECT sorted_intersect_size(array(NULL, 'a'), array(NULL, 'a'))")
      .collect()(0).getLong(0)
    assert(sqlGot == 2L)
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
