package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation
}

import graft.gold.TxLog

/** Optimizer rule: AUTOMATIC file skipping from the stats recorded IN the
  * TxLog commit log — the planner-side consumer of `TxLog`'s per-add-file
  * [[graft.gold.TxLog.ColStats]] (exactly how Delta's planner prunes from
  * its transaction-log `stats`, where `RewriteSkipIndexScan` plays the
  * same role for the sidecar `_graft_stats` index). With this rule a user
  * writes the ordinary `TxLog.read(spark, path).filter(col <op> literal)`
  * and the scan is rewritten to only the files whose recorded [min, max]
  * box can satisfy the filter — ZERO extra jobs (the stats came off the
  * snapshot resolution the read already performed) and, unlike the
  * sidecar, never stale: stats commit atomically with their add actions.
  *
  * Fires ONLY when `spark.graft.txlogStats.path` names the table root
  * (same scoping discipline as the sibling rules: set it on a
  * `spark.newSession()` child). Eligible shape: a `Filter` directly over
  * a parquet relation whose root paths are all files of that table dir —
  * exactly what `TxLog.read` plans. Bound extraction is shared with
  * `RewriteSkipIndexScan` (`col <op> literal` conjuncts, both operand
  * orders). Two stat domains prune: LONG-domain bounds (integrals as
  * themselves, DATE as epoch days, TIMESTAMP_NTZ as epoch micros — the
  * log's canonical units are Catalyst's literal units by construction)
  * and STRING bounds against the log's truncated string stats
  * (`strMin`/`strMax`, compared in UTF8String BINARY order — the order
  * both Spark's min/max and the stats writer use; truncation keeps the
  * bounds sound, see [[graft.gold.TxLog.ColStats]]). String bounds can
  * be ONE-SIDED (a truncated maximum degrades to unbounded-above) — each
  * side prunes independently. Residual conjuncts and the full row-level
  * Filter are always kept: the rule prunes I/O, never meaning.
  *
  * Soundness: a file is dropped only when the snapshot's stats PROVE
  * `max < lo` or `min > hi` on some constrained column; files absent from
  * the stats map (a time-travel scan of since-removed files, a legacy
  * stat-less commit) or with NULL bounds are always kept. The stats map
  * is resolved per (table, current version) and cached — version
  * monotonicity makes the cache exact, and a scan of an OLDER version
  * only ever sees files missing from the newer map (kept, sound).
  */
object RewriteTxLogStatsScan extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  val PathKey = "spark.graft.txlogStats.path"

  // Fired-once marker. KNOWN INHERITANCE BEHAVIOR (shared with the
  // sibling RewriteSkipIndexScan, kept deliberately): the tag propagates
  // through makeCopy into derived plans, so reusing an ALREADY-OPTIMIZED
  // filtered-TxLog DataFrame lineage inside a later query skips pruning
  // there (kept-all — perf-only, never correctness). Build fresh reads
  // per query (TxLog.read is cheap metadata) to always prune.
  private val Checked = TreeNodeTag[Boolean]("graft.txlogStats.checked")

  import RewriteSkipIndexScan.{BV, BvLong, BvStr}

  // (tablePath → (version, fileName → colName → (lower, upper))) —
  // metadata scale; exact because a TxLog version's stats are immutable.
  // Bounds are Option per side: string stats can be one-sided. Bounded:
  // one entry per armed table, evicted FIFO-ish past MaxCachedTables so
  // a long-lived process cycling through many table paths cannot grow
  // the map without bound (pruning is (path, version)-keyed, so eviction
  // is always sound — the next scan just reloads).
  private val MaxCachedTables = 64
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Map[String, Map[String, (Option[BV], Option[BV])]])]()

  /** For tests: drop all cached stats. */
  def invalidateCache(): Unit = cache.clear()

  private def loadStats(tablePath: String)
      : Map[String, Map[String, (Option[BV], Option[BV])]] = {
    val v = TxLog.currentVersion(tablePath).getOrElse(
      throw new IllegalArgumentException(
        s"RewriteTxLogStatsScan: $PathKey is set to '$tablePath' but no " +
          "TxLog table exists there - unset the config or fix the path"))
    val hit = cache.get(tablePath)
    if (hit != null && hit._1 == v) return hit._2
    val snap = TxLog.snapshot(tablePath)
    val m = snap.stats.map { case (f, fs) =>
      f -> fs.cols.flatMap { case (c, cs) =>
        val bounds: Option[(Option[BV], Option[BV])] =
          if (cs.typ == "s") {
            if (cs.strMin.isEmpty && cs.strMax.isEmpty) None
            else Some((cs.strMin.map(BvStr.apply): Option[BV],
              cs.strMax.map(BvStr.apply): Option[BV]))
          } else if (cs.min.isDefined && cs.max.isDefined)
            Some((Some(BvLong(cs.min.get)): Option[BV],
              Some(BvLong(cs.max.get)): Option[BV]))
          else None
        bounds.map(c -> _)
      }
    }
    if (cache.size >= MaxCachedTables) cache.clear()
    cache.put(tablePath, (v, m))
    m
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val tablePath = conf.getConfString(PathKey, "").trim
    if (tablePath.isEmpty) return plan
    val wanted = new Path(tablePath).toUri.getPath
    lazy val session = SparkSession.active

    plan.transform {
      case f @ Filter(cond,
          rel @ LogicalRelation(fsRel: HadoopFsRelation, _, _, _, _))
          if rel.getTagValue(Checked).isEmpty &&
            fsRel.location.rootPaths.nonEmpty &&
            fsRel.location.rootPaths.forall(p =>
              Option(p.getParent).exists(_.toUri.getPath == wanted)) =>
        rel.setTagValue(Checked, true)
        // the sibling rule's conjunct extraction: long-domain AND string
        // bounds (cross-domain comparisons never prune — BV.lt is false)
        val bounds = RewriteSkipIndexScan
          .extractBounds(splitConjunctivePredicates(cond))
        if (bounds.isEmpty) f
        else {
          val stats = loadStats(tablePath)
          val roots = fsRel.location.rootPaths
          val kept = roots.filter { p =>
            stats.get(p.getName) match {
              case Some(cols) => bounds.forall { case (c, (lo, hi)) =>
                cols.get(c) match {
                  case Some((smn, smx)) =>
                    val wholeFileBelow =
                      (for (l <- lo; mx <- smx) yield mx.lt(l))
                        .getOrElse(false)
                    val wholeFileAbove =
                      (for (h <- hi; mn <- smn) yield h.lt(mn))
                        .getOrElse(false)
                    !(wholeFileBelow || wholeFileAbove)
                  case None => true // no stats for this column: keep
                }
              }
              case None => true // unknown file (time travel / legacy): keep
            }
          }
          if (kept.size == roots.size) f
          else {
            val pruned = new InMemoryFileIndex(
              session, kept, Map.empty, Some(fsRel.dataSchema))
            val newRel = rel.copy(relation =
              fsRel.copy(location = pruned)(session))
            newRel.setTagValue(Checked, true)
            Filter(cond, newRel)
          }
        }
    }
  }
}
