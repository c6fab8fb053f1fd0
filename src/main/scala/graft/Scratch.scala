package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-query scratch directories for side-effecting operators (CSV/JSON
  * round-trips, partitioned sinks, streaming checkpoints). Each key gets a
  * fresh directory under java.io.tmpdir; the previous run's contents are
  * removed so every invocation is deterministic from a clean slate.
  */
object Scratch {

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { st =>
        st.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
      }

  /** Empty, freshly-created scratch dir for `key`. The root is
    * process-unique so concurrently-running harness JVMs (Verify, Bench,
    * sbt test) can never clobber each other's side-effect directories.
    */
  def fresh(key: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_scratch_${ProcessHandle.current().pid()}", key)
    deleteRec(p)
    Files.createDirectories(p)
    p.toString
  }
}
