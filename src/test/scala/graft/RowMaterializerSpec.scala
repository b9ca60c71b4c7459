package graft

import graft.model.{Cell, Mutation, RowState}
import graft.streaming.RowMaterializer
import graft.streaming.RowMaterializer.RowCells
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class RowMaterializerSpec extends SparkSpec {

  private def put(seq: Long, ts: Long, row: String, qual: String, v: String) =
    Mutation(seq, ts, "t", row, Seq(Cell("f", qual, v, ts, "put")))

  test("applyMutation: latest-cell-wins and out-of-order ignore") {
    val st0 = RowCells(Map.empty, 0L, deleted = false)
    val st1 = RowMaterializer.applyMutation(st0, put(1, 100, "r1", "a", "v1"))
    val st2 = RowMaterializer.applyMutation(st1, put(2, 200, "r1", "a", "v2"))
    assert(st2.cells("f:a").value == "v2")
    // out-of-order older write must NOT overwrite
    val st3 = RowMaterializer.applyMutation(st2, put(3, 150, "r1", "a", "stale"))
    assert(st3.cells("f:a").value == "v2")
    // same ts: higher seq (WAL order) wins
    val st4 = RowMaterializer.applyMutation(st3, Mutation(4, 200, "t", "r1",
      Seq(Cell("f", "a", "v4", 200, "put"))))
    assert(st4.cells("f:a").value == "v4")
  }

  test("applyMutation: qualifier delete and row tombstone") {
    val st0 = RowCells(Map.empty, 0L, deleted = false)
    val st1 = RowMaterializer.applyMutation(st0, put(1, 100, "r1", "a", "v1"))
    val st2 = RowMaterializer.applyMutation(st1, Mutation(2, 200, "t", "r1",
      Seq(Cell("f", "a", null, 200, "delete"))))
    assert(!st2.cells.contains("f:a"))
    val st3 = RowMaterializer.applyMutation(st2, put(3, 300, "r1", "b", "v3"))
    val st4 = RowMaterializer.applyMutation(st3, Mutation(4, 400, "t", "r1",
      Seq(Cell("f", "", null, 400, "delete_row"))))
    assert(st4.deleted && st4.cells.isEmpty)
  }

  test("streaming materialize over MemoryStream applies WAL order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Mutation]
    val states = RowMaterializer.materialize(spark, input.toDS())
    val query = states.writeStream
      .format("memory").queryName("rowstates").outputMode(OutputMode.Update).start()
    try {
      input.addData(put(1, 100, "r1", "a", "v1"), put(2, 200, "r2", "a", "x1"))
      query.processAllAvailable()
      input.addData(put(3, 300, "r1", "a", "v2"), put(4, 50, "r2", "a", "stale"))
      query.processAllAvailable()
      val byKey = spark.table("rowstates").as[RowState].collect()
        .groupBy(_.rowkey).map { case (k, v) => k -> v.maxBy(_.version) }
      assert(byKey("r1").cells("f:a") == "v2")   // newer update applied
      assert(byKey("r2").cells("f:a") == "x1")   // stale update ignored
    } finally query.stop()
  }

  test("batch materializeBatch equals streaming semantics") {
    import spark.implicits._
    val muts = Seq(
      put(1, 100, "r1", "a", "v1"), put(2, 200, "r1", "a", "v2"),
      put(3, 150, "r1", "b", "w1"),
      Mutation(4, 250, "t", "r1", Seq(Cell("f", "b", null, 250, "delete"))))
    val out = RowMaterializer.materializeBatch(spark, muts.toDS()).collect()
    assert(out.length == 1)
    assert(out.head.cells == Map("f:a" -> "v2"))
  }
}
