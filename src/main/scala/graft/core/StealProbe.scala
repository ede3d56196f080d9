package graft.core

/** Hypervisor CPU-steal probe. The benches' external-contention signal was
  * 1-min host loadavg minus this JVM's cores — but on this box a whole
  * morning of 2-3x wall-time spread measured ext_load 0.0 throughout, while
  * /proc/stat showed nonzero `steal` even at idle: the contention is another
  * GUEST on the hypervisor, invisible to the guest's own load average. Steal
  * ticks over the timed region catch exactly that.
  *
  * Reads the aggregate cpu line of /proc/stat; returns (stealTicks,
  * totalTicks). Missing file / short line (non-Linux, masked procfs) degrades
  * to (0, 0) and [[pct]] reports 0.0 — absence of evidence, flagged nowhere.
  */
object StealProbe {
  final case class Snap(steal: Long, total: Long)

  def snapshot(): Snap =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val v = src.getLines().next().split("\\s+").drop(1).map(_.toLong)
        // total = first 8 fields only (user nice system idle iowait irq
        // softirq steal): the kernel folds guest/guest_nice (fields 9-10)
        // into user already, so summing them would double-count guest time
        // and deflate the reported steal% on a VM-hosting box
        Snap(if (v.length > 7) v(7) else 0L, v.take(8).sum)
      } finally src.close()
    } catch { case _: Throwable => Snap(0L, 0L) }

  /** percent of CPU time stolen by the hypervisor between two snapshots. */
  def pct(a: Snap, b: Snap): Double =
    if (b.total <= a.total) 0.0
    else 100.0 * (b.steal - a.steal) / (b.total - a.total).toDouble
}
