package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RetractableAgg

/** Delete-aware maintenance must equal a full recompute on EVERY branch:
  * extremum-touching deletes (affected-group recompute), extremum-sparing
  * deletes (pure monoid path), whole-group deletion (group vanishes via
  * the count support column), NULL group keys (null-safe joins), and the
  * refcount distinct store's increment/decrement/vanish/raise life cycle.
  */
class RetractableAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(t: (java.lang.Long, String, Long)*): DataFrame =
    t.toSeq.toDF("id", "grp", "v")

  private val keys = Seq("grp")

  private def fullRecompute(newBase: DataFrame): Seq[Seq[Any]] =
    RetractableAgg.buildAgg(newBase, keys, sums = Seq("v"),
        mins = Seq("v"), maxs = Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def maintain(oldBase: DataFrame, inserts: DataFrame,
      deletes: DataFrame, newBase: DataFrame): Seq[Seq[Any]] =
    RetractableAgg.applyChanges(
      RetractableAgg.buildAgg(oldBase, keys, sums = Seq("v"),
        mins = Seq("v"), maxs = Seq("v")),
      newBase, inserts, deletes, keys,
      sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("every delete branch equals the full recompute") {
    val oldBase = rows(
      (1L, "a", 1L), (2L, "a", 5L), (3L, "a", 9L),   // extremum-touching: min 1 deleted
      (4L, "b", 10L), (5L, "b", 20L), (6L, "b", 30L), // extremum-sparing: middle deleted
      (7L, "c", 7L),                                  // whole group deleted
      (8L, null, 100L), (9L, null, 200L)              // NULL group key
    )
    val deletes = rows((1L, "a", 1L), (5L, "b", 20L), (7L, "c", 7L),
      (9L, null.asInstanceOf[String], 200L))
    val inserts = rows((10L, "a", 4L), (11L, "d", 40L))
    val delIds = Set(1L, 5L, 7L, 9L)
    val newBase = oldBase.filter(!col("id").isin(delIds.toSeq: _*))
      .unionByName(inserts)
    maintain(oldBase, inserts, deletes, newBase) shouldBe fullRecompute(newBase)
    // group c must be GONE, group d born, null group maintained
    val grps = fullRecompute(newBase).map(_.head)
    grps should contain allOf ("a", "b", "d", null)
    grps should not contain "c"
  }

  test("randomized insert/delete sequences equal full recompute") {
    val rnd = new scala.util.Random(5)
    val all = (1L to 400L).map(i =>
      (java.lang.Long.valueOf(i),
        if (i % 37 == 0) null else s"g${rnd.nextInt(6)}",
        rnd.nextInt(50).toLong))
    val insertIds = all.filter(_ => rnd.nextBoolean()).map(_._1.longValue()).toSet
    val arrived = all.filterNot(t => insertIds(t._1.longValue()))
    val deleted = arrived.filter(_ => rnd.nextInt(4) == 0)
    val oldBase = rows(arrived: _*)
    val inserts = rows(all.filter(t => insertIds(t._1.longValue())): _*)
    val deletes = rows(deleted: _*)
    val deletedIds = deleted.map(_._1.longValue()).toSet
    val newBase = rows(all.filterNot(t => deletedIds(t._1.longValue())): _*)
    maintain(oldBase, inserts, deletes, newBase) shouldBe fullRecompute(newBase)
  }

  test("a delete of a never-present row raises loudly") {
    // deletes stay strictly inside the stored (min, max) so the group is
    // NOT affected-recomputed (that path re-derives truth from newBase and
    // is insensitive to phantom deletes) — the monoid path must catch the
    // negative count
    val oldBase = rows((1L, "a", 1L), (2L, "a", 9L))
    val deletes = rows((3L, "a", 5L), (4L, "a", 5L), (5L, "a", 5L))
    val e = intercept[Exception] {
      RetractableAgg.applyChanges(
        RetractableAgg.buildAgg(oldBase, keys, Seq("v"), Seq("v"), Seq("v")),
        oldBase, rows(), deletes, keys, Seq("v"), Seq("v"), Seq("v")).collect()
    }
    e.getMessage should include("negative")
  }

  private def rowsN(t: (java.lang.Long, String, java.lang.Long)*): DataFrame =
    t.toSeq.toDF("id", "grp", "v")

  test("NULL-measure deletes keep the group alive (__affected stays boolean)") {
    // group a mixes NULL and non-NULL measures; the delete batch removes
    // ONLY NULL-valued rows, so its min/max over v are NULL — an
    // un-coalesced NULL comparison would poison the __affected OR-fold and
    // the group would silently vanish despite live rows. Group n has a
    // NULL stored extremum (all rows NULL in v) — the other NULL side.
    val oldBase = rowsN(
      (1L, "a", null), (2L, "a", 5L), (3L, "a", 9L),
      (4L, "n", null), (5L, "n", null))
    val deletes = rowsN((1L, "a", null), (4L, "n", null))
    val newBase = oldBase.filter(!col("id").isin(1L, 4L))
    val maintained = RetractableAgg.applyChanges(
      RetractableAgg.buildAgg(oldBase, keys, Seq("v"), Seq("v"), Seq("v")),
      newBase, rowsN(), deletes, keys, Seq("v"), Seq("v"), Seq("v"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    maintained shouldBe fullRecompute(newBase)
    (maintained.map(_.head) should contain).allOf("a", "n")
  }

  test("a delete for a group absent from the maintained aggregate raises") {
    val oldBase = rows((1L, "a", 1L))
    val deletes = rows((2L, "z", 5L))
    val e = intercept[Exception] {
      RetractableAgg.applyChanges(
        RetractableAgg.buildAgg(oldBase, keys, Seq("v"), Seq("v"), Seq("v")),
        oldBase, rows(), deletes, keys, Seq("v"), Seq("v"), Seq("v")).collect()
    }
    e.getMessage should include("absent")
  }

  test("a distinct-store delete of a never-held (group, value) pair raises") {
    val store = RetractableAgg.buildDistinctStore(rows((1L, "a", 1L)), keys, "v")
    val e = intercept[Exception] {
      RetractableAgg.maintainDistinctStore(store, rows(),
        rows((2L, "a", 2L)), keys, "v").collect()
    }
    e.getMessage should include("absent")
  }

  test("property fuzz: 100 random insert/delete interleavings, maintained == recompute") {
    // arbitrary multi-step interleavings over a truth buffer: NULL group
    // keys, NULL measures (~20%), group births/deaths, extremum-touching
    // and -sparing deletes all occur by construction. Even seeds fuzz the
    // group aggregate (count/sum/min/max), odd seeds the distinct store.
    def run(seed: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      var nextId = 0L
      def mk(n: Int): Vector[(java.lang.Long, String, java.lang.Long)] =
        (0 until n).map { _ =>
          nextId += 1
          val grp = if (rnd.nextInt(10) == 0) null else s"g${rnd.nextInt(4)}"
          val v: java.lang.Long =
            if (rnd.nextInt(5) == 0) null
            else java.lang.Long.valueOf(rnd.nextInt(30).toLong)
          (java.lang.Long.valueOf(nextId), grp, v)
        }.toVector
      var truth = mk(5 + rnd.nextInt(8))
      val steps = 2 + rnd.nextInt(2)
      if (seed % 2 == 0) {
        var stored = RetractableAgg.buildAgg(rowsN(truth: _*), keys,
          Seq("v"), Seq("v"), Seq("v"))
        for (_ <- 0 until steps) {
          val ins = mk(rnd.nextInt(8))
          val delSet = truth.filter(_ => rnd.nextInt(3) == 0)
          truth = truth.filterNot(delSet.toSet) ++ ins
          stored = RetractableAgg.applyChanges(stored, rowsN(truth: _*),
            rowsN(ins: _*), rowsN(delSet: _*), keys,
            Seq("v"), Seq("v"), Seq("v"))
        }
        withClue(s"seed=$seed: ") {
          stored.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq shouldBe
            fullRecompute(rowsN(truth: _*))
        }
      } else {
        var store = RetractableAgg.buildDistinctStore(rowsN(truth: _*), keys, "v")
        for (_ <- 0 until steps) {
          val ins = mk(rnd.nextInt(8))
          val delSet = truth.filter(_ => rnd.nextInt(3) == 0)
          truth = truth.filterNot(delSet.toSet) ++ ins
          store = RetractableAgg.maintainDistinctStore(store,
            rowsN(ins: _*), rowsN(delSet: _*), keys, "v")
        }
        withClue(s"seed=$seed: ") {
          // the FULL store (refcounts, not just distinctness) must equal
          // a from-scratch build over the truth
          store.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq shouldBe
            RetractableAgg.buildDistinctStore(rowsN(truth: _*), keys, "v")
              .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
        }
      }
    }
    // single-row-scale frames: one shuffle partition strips pure task-
    // scheduling overhead from the ~40 stages each sequence plans
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try (0 until 100).foreach(run)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("distinct refcount store: decrement, vanish at zero, equal full recompute") {
    val oldBase = rows(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 2L), // value 1 twice
      (4L, "b", 5L))
    val inserts = rows((5L, "a", 3L), (6L, "b", 5L))
    val deletes = rows((1L, "a", 1L), (3L, "a", 2L)) // value 2 vanishes, 1 survives
    val store = RetractableAgg.buildDistinctStore(oldBase, keys, "v")
    val maintained = RetractableAgg.maintainDistinctStore(store, inserts,
      deletes, keys, "v")
    val counts = RetractableAgg.distinctCounts(maintained, keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("a" -> 2L, "b" -> 1L) // a: {1, 3}; b: {5}
    // refcount exactness, not just distinctness
    val refs = maintained.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    refs(("a", 1L)) shouldBe 1L
    refs(("b", 5L)) shouldBe 2L
    refs.get(("a", 2L)) shouldBe None
    // over-delete raises
    val e = intercept[Exception] {
      RetractableAgg.maintainDistinctStore(maintained, rows(),
        rows((9L, "b", 5L), (10L, "b", 5L), (11L, "b", 5L)), keys, "v").collect()
    }
    e.getMessage should include("negative")
  }
}
