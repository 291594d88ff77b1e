package graft.runner

/** Failure alerting — the reference wires Slack webhooks into its DAG
  * failure callbacks (Meta_Guideline.md:4330-4354;
  * dags/basic/03_file_processing_v2_dag.py:17-37). The engine keeps the
  * CONTRACT (structured alert per failed task + a run-level summary,
  * emitted from the runner's failure path) behind a sink trait; the
  * hermetic default appends JSON lines to a file — production drops in an
  * HTTP/webhook sink behind the same trait without touching the runner.
  */
object Alerts {

  final case class Alert(
      severity: String,   // "task_failed" | "run_failed"
      pipeline: String,
      task: String,
      message: String)

  /** THREAD-SAFETY CONTRACT: the parallel DAG runner (`Pipeline.run` with
    * `parallelism > 1`) fires `send` from multiple pool threads
    * concurrently — implementations must be safe under concurrent calls.
    * (JsonFileSink's single append write is atomic enough per POSIX
    * O_APPEND; CollectingSink synchronizes.)
    */
  trait Sink {
    def send(alert: Alert): Unit
  }

  /** JSON-lines file sink (append; parents created). Alert emission must
    * never mask the original failure — IO errors surface on stderr only.
    */
  final class JsonFileSink(path: String) extends Sink {
    override def send(a: Alert): Unit = try {
      val f = new java.io.File(path)
      Option(f.getParentFile).foreach(_.mkdirs())
      // escape every JSON-forbidden control character (< 0x20), not just
      // \n — exception messages carry \r, \t, and parser context bytes
      val esc = (s: String) => s.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c    => c.toString
      }
      val line = s"""{"severity":"${esc(a.severity)}","pipeline":"${
        esc(a.pipeline)}","task":"${esc(a.task)}","message":"${
        esc(a.message)}"}"""
      java.nio.file.Files.write(f.toPath,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch {
      case e: Throwable =>
        System.err.println(s"[alerts] sink write failed: $e")
    }
  }

  /** In-memory sink for specs. Synchronized: the parallel runner can fire
    * alerts from several pool threads at once (see [[Sink]]'s contract),
    * and an unguarded ArrayBuffer append under that race can lose or
    * corrupt entries. `alerts` returns an immutable snapshot.
    */
  final class CollectingSink extends Sink {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Alert]
    def alerts: Seq[Alert] = synchronized(buf.toList)
    override def send(a: Alert): Unit = synchronized { buf += a; () }
  }
}
