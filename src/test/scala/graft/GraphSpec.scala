package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** q129 triangle counting: the degree-ordered enumeration must agree
  * with the naive closed-wedge count on arbitrary graphs — including
  * shapes the dedup corpus doesn't produce (hubs, cliques, chains). */
class GraphSpec extends SparkSpec {

  /** Brute force: triangles = |{(a,b,c) : a<b<c, all three edges}| via
    * a canonicalized 3-way self-join. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield 1).size.toLong
  }

  test("triangleCountOf equals brute force on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 20 + trial * 10
      val edges = (0 until n * 3).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val df = edges.toDF("d1", "d2")
      val row = Dedup.triangleCountOf(df).head
      val expected = bruteTriangles(edges)
      assert(row.getAs[Long]("n_triangles") == expected,
        s"trial $trial: got ${row.getAs[Long]("n_triangles")}, brute force $expected")
      assert(row.getAs[Long]("n_edges") == edges.size.toLong)
      // wedge identity: Σ C(deg, 2) over the degree frame
      val degs = edges.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map(_._2.size.toLong)
      assert(row.getAs[Long]("n_wedges") == degs.map(d => d * (d - 1) / 2).sum)
    }
  }

  test("triangle count on known shapes: clique, chain, star") {
    import spark.implicits._
    // K4: 4 triangles; 4-chain: 0; star-5: 0
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(Dedup.triangleCountOf(k4.toDF("d1", "d2")).head
      .getAs[Long]("n_triangles") == 4L)
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val chainRow = Dedup.triangleCountOf(chain).head
    assert(chainRow.getAs[Long]("n_triangles") == 0L)
    assert(chainRow.getAs[Double]("clustering") == 0.0)
    val star = (1L to 5L).map(i => (0L, i)).toDF("d1", "d2")
    assert(Dedup.triangleCountOf(star).head.getAs[Long]("n_triangles") == 0L)
  }
}
