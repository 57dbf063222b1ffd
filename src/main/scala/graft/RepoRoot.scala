package graft

import java.nio.file.{Files, Path, Paths}

/** The ONE resolution of the repository root for artifacts that two
  * processes must agree on (fixture files the DuckDB oracle reads,
  * `target/bench.json` the driver scrapes). A cwd-relative path silently
  * splits the two sides when a forked JVM, IDE runner, or CI wrapper
  * launches from a different directory — the r4 advisory fixed this for
  * fixtures; `Bench` briefly re-introduced it (r5 review), hence the shared
  * anchor. Resolution order: `-Dgraft.repo.root` override, else walk up
  * from the cwd to the first directory holding `build.sbt` (the repo-root
  * marker), else the cwd itself. */
object RepoRoot {
  lazy val dir: Path =
    sys.props.get("graft.repo.root").map(Paths.get(_)).getOrElse {
      var p = Paths.get("").toAbsolutePath
      var root = p
      while (p != null) {
        if (Files.exists(p.resolve("build.sbt"))) { root = p; p = null }
        else p = p.getParent
      }
      root
    }
}
