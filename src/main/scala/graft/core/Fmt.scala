package graft.core

import java.util.Locale

/** Locale-independent number formatting for machine-read artifacts.
  *
  * Scala's `f""` interpolator uses the JVM default locale; on a
  * comma-decimal locale (de_DE, fr_FR, ...) `f"$x%.1f"` renders `0,3`,
  * which corrupts hand-built JSON (bench/scaling output), the staged
  * comma-delimited csv fixtures, and any `"%.6f".toFloat` round-trip.
  * Every artifact-producing format goes through here instead.
  */
object Fmt {
  def f1(d: Double): String = String.format(Locale.ROOT, "%.1f", Double.box(d))
  def f2(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
  def f3(d: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(d))
  def f4(d: Double): String = String.format(Locale.ROOT, "%.4f", Double.box(d))
  def f6(d: Double): String = String.format(Locale.ROOT, "%.6f", Double.box(d))
  def f0(d: Double): String = String.format(Locale.ROOT, "%.0f", Double.box(d))
}
