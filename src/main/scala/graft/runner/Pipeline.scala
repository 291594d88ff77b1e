package graft.runner

import scala.collection.mutable

/** Minimal deterministic DAG runner — the engine-level replacement for the
  * reference's Airflow orchestration (SURVEY §2.10): topological execution,
  * fail-fast gates, per-task timing report.
  *
  * `parallelism = 1` (default) runs tasks sequentially in topological
  * order (dependencies first, declaration order as tiebreak).
  * `parallelism > 1` runs INDEPENDENT tasks concurrently on a fixed pool —
  * the Airflow executor-pool parity the reference DAGs rely on (their
  * bronze tasks fan out). Output is deterministic either way: each task
  * owns its output paths, the report lists results in topological
  * declaration order regardless of completion order, and Spark schedules
  * concurrent jobs from multiple driver threads natively. Concurrency
  * overlaps the per-task fixed costs (driver planning, file listing,
  * commit protocol) that dominate small runs and remain real at 100 TB —
  * data-level parallelism *within* a task is Spark's job either way.
  * A task that throws marks all transitively dependent tasks SKIPPED —
  * the circuit-breaker / DQ-gate semantics of the reference
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
      pipelineName: String = "medallion", parallelism: Int = 1): Report = {
    require(parallelism >= 1, "Pipeline.run: parallelism must be >= 1")
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

    val report =
      if (parallelism == 1) runSequential(order.toSeq, alerts, pipelineName)
      else runParallel(order.toSeq, alerts, pipelineName, parallelism)
    if (!report.succeeded)
      safeSend(alerts, Alerts.Alert("run_failed", pipelineName, "",
        s"${report.failed.size} failed, " +
          s"${report.results.count(_.status.isInstanceOf[Skipped])} skipped"))
    report
  }

  /** Base/cap for the exponential retry backoff: 100ms · 2^attempt,
    * capped at 5s, jittered uniformly in [half, full] — immediate
    * zero-delay re-runs hammer exactly the transient condition (storage
    * blip, lock contention) a retry budget exists to ride out, and the
    * jitter de-synchronizes parallel tasks retrying against the same
    * resource (the thundering-herd rule every retry client follows).
    */
  private val RetryBaseBackoffMs = 100L
  private val RetryMaxBackoffMs = 5000L

  /** Run `t`'s body with its retry budget (bounded exponential backoff +
    * jitter between attempts); returns the result + fires the task_failed
    * alert on final failure (shared by both executors).
    */
  private def execute(t: Task, alerts: Option[Alerts.Sink],
      pipelineName: String): TaskResult = {
    val t0 = System.nanoTime()
    def attempt(left: Int): Status =
      try { t.body(); Succeeded }
      catch {
        case e: Throwable =>
          if (left > 0) {
            val exp = math.min(RetryMaxBackoffMs,
              RetryBaseBackoffMs << math.min(20, t.retries - left))
            val sleep = exp / 2 + java.util.concurrent.ThreadLocalRandom
              .current().nextLong(exp / 2 + 1)
            try Thread.sleep(sleep)
            catch { case _: InterruptedException =>
              Thread.currentThread().interrupt() }
            attempt(left - 1)
          } else Failed(e)
      }
    attempt(t.retries) match {
      case Succeeded =>
        TaskResult(t.name, Succeeded, (System.nanoTime() - t0) / 1000000)
      case f @ Failed(e) =>
        safeSend(alerts, Alerts.Alert("task_failed", pipelineName,
          t.name, String.valueOf(e)))
        TaskResult(t.name, f, (System.nanoTime() - t0) / 1000000)
      case s => TaskResult(t.name, s, 0L) // unreachable
    }
  }

  private def runSequential(order: Seq[Task], alerts: Option[Alerts.Sink],
      pipelineName: String): Report = {
    val failedTasks = mutable.Set.empty[String]
    val results = order.map { t =>
      val blockedBy = t.deps.filter(failedTasks)
      if (blockedBy.nonEmpty) {
        failedTasks += t.name
        TaskResult(t.name, Skipped(s"upstream failed: ${blockedBy.mkString(",")}"), 0L)
      } else {
        val r = execute(t, alerts, pipelineName)
        if (r.status.isInstanceOf[Failed]) failedTasks += t.name
        r
      }
    }
    Report(results.toSeq)
  }

  /** Dataflow executor: every task whose dependencies all SUCCEEDED is
    * eligible as soon as the last of them completes; a fixed pool of
    * `parallelism` threads drains the ready set. Failure semantics are
    * identical to the sequential path (transitive SKIP), and the report
    * preserves topological declaration order, so the only observable
    * difference is wall-clock.
    */
  private def runParallel(order: Seq[Task], alerts: Option[Alerts.Sink],
      pipelineName: String, parallelism: Int): Report = {
    import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors}
    import java.util.concurrent.atomic.AtomicInteger
    val results = new ConcurrentHashMap[String, TaskResult]()
    val dependents: Map[String, Seq[Task]] =
      order.flatMap(t => t.deps.map(_ -> t)).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
    val remainingDeps = new ConcurrentHashMap[String, AtomicInteger]()
    order.foreach(t => remainingDeps.put(t.name, new AtomicInteger(t.deps.size)))
    val pool = Executors.newFixedThreadPool(parallelism)
    val latch = new CountDownLatch(order.size)
    // dedicated first-completion token per task — NOT derived from
    // `results` state: the old containsKey guard could see a task as
    // "already complete" after a partial failure between results.put and
    // latch.countDown and leave the latch hung forever
    val completed = new ConcurrentHashMap[String, java.lang.Boolean]()

    def complete(t: Task, r: TaskResult): Unit =
      if (completed.putIfAbsent(t.name, java.lang.Boolean.TRUE) == null) {
        results.put(t.name, r)
        // count down BEFORE fanning out: this task is done regardless of
        // what dependent scheduling does
        latch.countDown()
        dependents.getOrElse(t.name, Nil).foreach { d =>
          // per-dependent guard: one dependent's scheduling failure must
          // not strand its siblings (or the latch)
          try { if (remainingDeps.get(d.name).decrementAndGet() == 0) schedule(d) }
          catch {
            case e: Throwable => complete(d, TaskResult(d.name, Failed(e), 0L))
          }
        }
      }

    def schedule(t: Task): Unit =
      // pool.submit can itself reject; complete() is idempotent, so
      // failing the task here is always safe
      try {
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              // a defensive path may have completed this task as Failed
              // before its deps all finished — never run the body of a
              // task whose fate is already recorded
              if (completed.containsKey(t.name)) return
              // deps are all COMPLETE here (scheduling fires on the last
              // decrement); blocked = any dep that did not succeed
              val blockedBy = t.deps.filter(d =>
                results.get(d).status != Succeeded)
              if (blockedBy.nonEmpty)
                complete(t, TaskResult(t.name,
                  Skipped(s"upstream failed: ${blockedBy.mkString(",")}"), 0L))
              else complete(t, execute(t, alerts, pipelineName))
            } catch {
              // execute() never throws; this guards the bookkeeping itself
              // so a bug here can never hang the latch
              case e: Throwable =>
                complete(t, TaskResult(t.name, Failed(e), 0L))
            }
        })
        ()
      } catch {
        case e: Throwable => complete(t, TaskResult(t.name, Failed(e), 0L))
      }

    try {
      order.filter(_.deps.isEmpty).foreach(schedule)
      latch.await()
    } finally pool.shutdown()
    Report(order.map(t => results.get(t.name)))
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
