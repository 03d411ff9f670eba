package graft

/** Tiny env-gated phase profiler for the update path (set
  * GRAFT_PROF_UPDATE=1; used by ProfUpdate to attribute driver-side time
  * between planning, probes, and collects). Zero overhead when off.
  */
object Prof {
  val on: Boolean = sys.env.get("GRAFT_PROF_UPDATE").contains("1")
  def t[A](label: String)(f: => A): A =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[prof-u] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
}
