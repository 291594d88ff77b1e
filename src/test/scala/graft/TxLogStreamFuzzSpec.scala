package graft

import graft.gold.TxLog
import org.apache.spark.sql.functions._

/** Randomized restart/vacuum fuzz for the incremental TxLog source — the
  * scenario class the deterministic specs pin one case of, randomized:
  * random append histories drained in several passes with random
  * admission control (maxVersionsPerTrigger / maxBytesPerTrigger),
  * random RESTARTS between passes (same checkpoint), and random VACUUMS
  * guarded by `committedReaderFloor` between passes. Invariant: the sink
  * holds EVERY committed row EXACTLY ONCE at the end — a restart that
  * double-reads (offset regression), drops (skipped version), or crashes
  * on a vacuumed-but-committed range (the round-13 restart-initialization
  * bug) all break it.
  */
class TxLogStreamFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(r: Range) = r.map(i => (i.toLong, s"p$i")).toDF("id", "payload")

  test("random append/drain/restart/vacuum sequences deliver exactly-once") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + 0x1B873593L)
      val work = java.nio.file.Files.createTempDirectory(s"txsfz$seed").toString
      val path = s"$work/t"
      val out = s"$work/out"; val ckpt = s"$work/ckpt"
      var next = 0L
      var v = -1L
      def commit(): Unit = {
        val n = 5L + rnd.nextLong(40L)
        if (v < 0) TxLog.init(df(next.toInt until (next + n).toInt)
          .repartition(1 + rnd.nextInt(3)), path)
        else TxLog.append(df(next.toInt until (next + n).toInt), path, v)
        v += 1; next += n
      }
      commit() // v0 exists before the first drain
      (0 until 3).foreach { pass =>
        (0 until rnd.nextInt(3)).foreach(_ => commit())
        // random admission control per pass (options are source-construction
        // inputs; offsets semantics are unchanged across passes)
        val child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", 4)
        var reader = child.readStream.format("graft-txlog").option("path", path)
        rnd.nextInt(3) match {
          case 0 => reader = reader.option("maxVersionsPerTrigger",
            (1 + rnd.nextInt(3)).toString)
          case 1 => reader = reader.option("maxBytesPerTrigger",
            (1L + rnd.nextLong(4000L)).toString)
          case _ => ()
        }
        val q = reader.load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        // random vacuum between passes, floored by what the checkpoint
        // has committed — must never break the next restart
        if (rnd.nextBoolean() && v >= 1) {
          val floor = graft.streaming.TxLogSource
            .committedReaderFloor(spark, ckpt)
          val retainNeeded = (v - floor + 1).toInt.max(1)
          val sink = new graft.runner.Alerts.CollectingSink
          TxLog.vacuum(path, retainVersions = retainNeeded + rnd.nextInt(2),
            minAgeMs = 0L, readerFloor = Some(floor), alerts = Some(sink))
          withClue(s"seed=$seed pass=$pass floor=$floor v=$v: ") {
            sink.alerts shouldBe empty // retention respected the floor
          }
        }
      }
      withClue(s"seed=$seed: ") {
        spark.read.parquet(out).select("id").as[Long].collect().sorted shouldBe
          (0L until next).toArray
      }
    }
  }
}
