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

  test("retainEpochs keeps a grace window for slow readers pinned to an old epoch") {
    val aggPath = java.nio.file.Files.createTempDirectory("graft_aggret").toString + "/fact_agg"
    def epochDirs = Option(new java.io.File(aggPath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .map(_.getName.stripPrefix("epoch=").toLong).sorted.toSeq
    val batches = (0 to 4).map { b =>
      (1 to 20).map(i => AggEvent(s"g${i % 3}", (b * 100 + i).toLong))
    }
    // retainEpochs = 3: after batch b the store holds epochs {b-2, b-1, b}
    batches.zipWithIndex.foreach { case (evs, b) =>
      EventStream.aggMaintainBatch(evs.toDF(), batchId = b.toLong, aggPath,
        Seq("g"), build, Seq("cnt", "total"), Seq("lo"), Seq("hi"),
        retainEpochs = 3)
    }
    epochDirs shouldBe Seq(2L, 3L, 4L)

    // a reader that pinned epoch 3 BEFORE batch 4 published can still read
    // its snapshot afterwards (with the default retain=2 it would be pruned)
    val pinned = spark.read.parquet(s"$aggPath/epoch=3")
    rows(pinned) shouldBe rows(build(batches.take(4).flatten.toDF()))
    // newest epoch is still the full fold of everything
    rows(EventStream.readAggStore(spark, aggPath)) shouldBe
      rows(build(batches.flatten.toDF()))

    // retainEpochs < 2 would sacrifice the replay merge base — rejected
    an[IllegalArgumentException] shouldBe thrownBy {
      EventStream.aggMaintainBatch(batches.head.toDF(), batchId = 9L, aggPath,
        Seq("g"), build, Seq("cnt", "total"), retainEpochs = 1)
    }
  }
}
