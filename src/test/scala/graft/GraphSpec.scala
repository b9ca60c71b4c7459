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

  test("q223 edge cohesion: clique edges cohere, chain/star edges are bridges") {
    import spark.implicits._
    def byEdge(edges: Seq[(Long, Long)]) =
      Dedup.edgeCohesionOf(edges.toDF("d1", "d2")).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
          (r.getAs[Long]("n_common"), Option(r.get(r.fieldIndex("cohesion_ppm")))
            .map(_.asInstanceOf[Long]), r.getAs[Boolean]("is_local_bridge"))).toMap
    // K4: every edge has the 2 off-edge vertices in common, union =
    // (3-1)+(3-1)-2 = 2 => cohesion exactly 1e6, no bridges
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    byEdge(k4).foreach { case (e, (nc, coh, br)) =>
      assert(nc == 2L && coh.contains(1000000L) && !br, s"K4 edge $e: $nc $coh $br")
    }
    // 4-chain: middle edge (1,2) has no common neighbor but non-empty
    // union (0 and 3) => cohesion 0, bridge; end edges too
    val chain = byEdge(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(chain.values.forall { case (nc, _, br) => nc == 0L && br })
    assert(chain((1L, 2L))._2.contains(0L))
    // isolated pair edge: union empty => NULL cohesion, still a bridge
    val pair = byEdge(Seq((7L, 8L)))
    assert(pair((7L, 8L)) == ((0L, None, true)),
      s"isolated pair must have null cohesion: $pair")
    // triangle with a pendant: the pendant edge is the bridge, the
    // triangle edges are not — the per-edge split q129's global
    // clustering cannot express
    val tri = byEdge(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 9L)))
    assert(!tri((0L, 1L))._3 && tri((2L, 9L))._3)
  }
}
