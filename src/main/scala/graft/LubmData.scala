package graft

/** Location of the LUBM University0 N-Triples fixtures (the reference's
  * own benchmark corpus, `benchmarks/data/university0_*.nt`). The path is
  * resolvable via the `GRAFT_LUBM_DIR` env var or the `graft.lubm.dir`
  * system property so the library runs on machines without the reference
  * checkout at the default location; consumers that need the files
  * (q_lubm gates, LubmSpec) check `available` and skip or fail with a
  * clear message instead of a raw path error.
  */
object LubmData {
  val dir: String = sys.env.getOrElse("GRAFT_LUBM_DIR",
    sys.props.getOrElse("graft.lubm.dir", "/root/reference/benchmarks/data"))

  /** Glob covering the University0 files, for Spark reads. */
  val glob: String = s"$dir/university0_*.nt"

  def available: Boolean = {
    val d = new java.io.File(dir)
    d.isDirectory &&
      Option(d.listFiles()).exists(_.exists(_.getName.matches("university0_.*\\.nt")))
  }

  def requireAvailable(): Unit =
    require(available,
      s"LUBM fixtures not found under '$dir' — set GRAFT_LUBM_DIR (or " +
        "-Dgraft.lubm.dir) to a directory containing university0_*.nt")
}
