package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  // getOrCreate would return the shared extension-less test session, so
  // build an isolated one and restore the shared default afterwards.
  private lazy val spark: SparkSession = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.setDefaultSession(SparkSpec.session)
    SparkSession.setActiveSession(SparkSpec.session)
    super.afterAll()
  }

  test("injected SQL functions work") {
    val r = spark.sql(
      "SELECT long_array_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d").collect()
    assert(r.head.getLong(0) == 32L)
    val sh = spark.sql(
      "SELECT size(word_shingles3('a b c d')) AS n").collect()
    assert(sh.head.getInt(0) == 2)
    val mh = spark.sql(
      "SELECT size(minhash_md5(word_shingles3('a b c d e'), 8)) AS k").collect()
    assert(mh.head.getInt(0) == 8)
  }

  test("long_array_dot matches the declarative idiom's null semantics") {
    // unequal lengths → null (zip_with null-pads → null product → null sum)
    val r1 = spark.sql(
      "SELECT long_array_dot(array(1L,2L), array(1L,2L,3L)) AS d").collect()
    assert(r1.head.isNullAt(0), "length mismatch must yield null")
    // null element → null
    val r2 = spark.sql(
      "SELECT long_array_dot(array(1L, CAST(NULL AS BIGINT)), array(1L,2L)) AS d").collect()
    assert(r2.head.isNullAt(0), "null element must yield null")
    // and the declarative idiom agrees on both shapes
    val r3 = spark.sql(
      "SELECT aggregate(zip_with(array(1L,2L), array(1L,2L,3L), (x,y) -> x*y), 0L, (a,u) -> a+u) AS d").collect()
    assert(r3.head.isNullAt(0))
  }

  test("optimizer rule rewrites aggregate(zip_with) idiom to long_array_dot") {
    // must be file-backed: a local relation would be constant-folded
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v")
      .selectExpr("aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (acc, u) -> acc + u) AS dot")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("long_array_dot"), s"rule did not fire:\n$optimized")
    assert(df.collect().forall(_.getLong(0) > 0L))
  }
}
