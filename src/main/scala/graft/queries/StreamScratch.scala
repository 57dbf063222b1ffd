package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Scratch roots for the streaming catalog entries: pid-scoped (parallel
  * JVMs never collide) and cleared WHOLE on every call — the up-front-clean
  * convention every stream entry must follow (a stale checkpoint from a
  * previous run would mark input files already-processed and silently
  * serve old rows; a stale input dir fails the stage write). Factored
  * here because the inlined copies let one entry ship clearing only a
  * subtree (caught by round-11 self-review). */
private[graft] object StreamScratch {

  /** The fixed per-entry root path (no side effects — specs derive it to
    * inspect checkpoints/segments after a run). */
  def path(name: String): Path =
    Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stream_${name}_${ProcessHandle.current().pid()}")

  /** The fixed per-entry root, deleted recursively if present. */
  def fresh(name: String): Path = {
    val root = path(name)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(root)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    root
  }
}
