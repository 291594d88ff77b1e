package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStream

final case class AggEvent(g: String, v: Long)

class AggMaintainStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def build(df: DataFrame): DataFrame =
    df.groupBy("g").agg(
      count(lit(1)).as("cnt"), sum($"v").as("total"),
      min($"v").as("lo"), max($"v").as("hi"))

  private def rows(df: DataFrame) =
    df.select("g", "cnt", "total", "lo", "hi")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("streamed aggregate store equals the full batch recompute; replay can't double-count") {
    implicit val sqlCtx = spark.sqlContext
    val aggPath = java.nio.file.Files.createTempDirectory("graft_agg").toString + "/fact_agg"
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_aggckpt").toString
    val input   = MemoryStream[AggEvent]
    val q = EventStream.aggMaintainStream(
      input.toDF(), aggPath, ckpt, keys = Seq("g"), build = build,
      sums = Seq("cnt", "total"), mins = Seq("lo"), maxs = Seq("hi"))
    val batch1 = (1 to 60).map(i => AggEvent(s"g${i % 5}", i.toLong))
    val batch2 = (61 to 100).map(i => AggEvent(s"g${i % 7}", i.toLong)) // new groups g5,g6
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got      = rows(EventStream.readAggStore(spark, aggPath))
    val expected = rows(build((batch1 ++ batch2).toDF()))
    got shouldBe expected

    // at-least-once redelivery: re-running the LAST batch with its own
    // batchId merges from the epoch BELOW it and overwrites — state is
    // re-derived, not double-applied
    EventStream.aggMaintainBatch(batch2.toDF(), batchId = 1L, aggPath,
      Seq("g"), build, Seq("cnt", "total"), Seq("lo"), Seq("hi"))
    rows(EventStream.readAggStore(spark, aggPath)) shouldBe expected
    // and doing it twice more still converges (epoch pruning keeps the base)
    EventStream.aggMaintainBatch(batch2.toDF(), batchId = 1L, aggPath,
      Seq("g"), build, Seq("cnt", "total"), Seq("lo"), Seq("hi"))
    rows(EventStream.readAggStore(spark, aggPath)) shouldBe expected
  }
}
