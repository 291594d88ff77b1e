package graft.runner

import scala.collection.mutable

/** Minimal deterministic DAG runner — the engine-level replacement for the
  * reference's Airflow orchestration (SURVEY §2.10): topological execution,
  * fail-fast gates, per-task timing report.
  *
  * Tasks run sequentially in topological order (dependencies first,
  * declaration order as tiebreak): Spark parallelizes *within* each task
  * across the cluster, so task-level concurrency buys little and costs
  * determinism. A task that throws marks all transitively dependent tasks
  * SKIPPED — the circuit-breaker / DQ-gate semantics of the reference
  * (`requirements/...:60, 103-113`).
  */
object Pipeline {

  /** `retries`: re-run the body up to this many extra times on failure
    * before marking the task Failed — the Airflow per-task `retries`
    * parity (reference DAGs set retries=1..2 on flaky IO tasks). Retries
    * re-run the WHOLE body; pipeline tasks are idempotent by construction
    * (overwrite writes), so a retry can never double-apply.
    */
  final case class Task(name: String, deps: Seq[String] = Nil,
      retries: Int = 0)(val body: () => Unit)

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(error: Throwable) extends Status
  final case class Skipped(because: String) extends Status

  final case class TaskResult(name: String, status: Status, durationMs: Long)

  final case class Report(results: Seq[TaskResult]) {
    def succeeded: Boolean = results.forall(_.status == Succeeded)
    def failed: Seq[TaskResult] =
      results.filter(r => r.status.isInstanceOf[Failed])
    override def toString: String =
      results.map(r => f"${r.name}%-40s ${r.status.getClass.getSimpleName}%-12s ${r.durationMs}%6d ms")
        .mkString("\n")
  }

  /** `alerts`: every Failed task fires a `task_failed` alert, and a
    * non-succeeding run fires one `run_failed` summary — the reference's
    * Slack failure-callback contract through a pluggable [[Alerts.Sink]].
    * Alert emission never masks the task's own failure.
    */
  def run(tasks: Seq[Task], alerts: Option[Alerts.Sink] = None,
      pipelineName: String = "medallion"): Report = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.foreach(t => t.deps.foreach(d =>
      require(byName.contains(d), s"task ${t.name} depends on unknown task $d")))

    // Kahn topological order, declaration order as tiebreak.
    val order    = mutable.ArrayBuffer.empty[Task]
    val done     = mutable.Set.empty[String]
    var frontier = tasks.filter(_.deps.isEmpty)
    var pending  = tasks.filterNot(_.deps.isEmpty)
    while (frontier.nonEmpty) {
      order ++= frontier
      done ++= frontier.map(_.name)
      val (ready, rest) = pending.partition(_.deps.forall(done))
      frontier = ready
      pending = rest
    }
    require(pending.isEmpty, s"dependency cycle involving: ${pending.map(_.name).mkString(", ")}")

    val failedTasks = mutable.Set.empty[String]
    val results = order.map { t =>
      val blockedBy = t.deps.filter(failedTasks)
      if (blockedBy.nonEmpty) {
        failedTasks += t.name
        TaskResult(t.name, Skipped(s"upstream failed: ${blockedBy.mkString(",")}"), 0L)
      } else {
        val t0 = System.nanoTime()
        def attempt(left: Int): Status =
          try { t.body(); Succeeded }
          catch {
            case e: Throwable =>
              if (left > 0) attempt(left - 1) else Failed(e)
          }
        attempt(t.retries) match {
          case Succeeded =>
            TaskResult(t.name, Succeeded, (System.nanoTime() - t0) / 1000000)
          case f @ Failed(e) =>
            failedTasks += t.name
            safeSend(alerts, Alerts.Alert("task_failed", pipelineName,
              t.name, String.valueOf(e)))
            TaskResult(t.name, f, (System.nanoTime() - t0) / 1000000)
          case s => TaskResult(t.name, s, 0L) // unreachable
        }
      }
    }
    val report = Report(results.toSeq)
    if (!report.succeeded)
      safeSend(alerts, Alerts.Alert("run_failed", pipelineName, "",
        s"${report.failed.size} failed, " +
          s"${report.results.count(_.status.isInstanceOf[Skipped])} skipped"))
    report
  }

  /** The never-masks contract is enforced HERE, not per sink: a throwing
    * sink (webhook down, exactly when alerts fire) must not abort the
    * run loop or eat the original failure.
    */
  private def safeSend(alerts: Option[Alerts.Sink], a: Alerts.Alert): Unit =
    alerts.foreach { s =>
      try s.send(a)
      catch {
        case e: Throwable =>
          System.err.println(s"[alerts] sink failed for ${a.severity}/${a.task}: $e")
      }
    }
}
