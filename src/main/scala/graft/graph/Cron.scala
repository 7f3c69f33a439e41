package graft.graph

import java.time.LocalDateTime

/** Minimal 5-field cron evaluator for node `trigger:` expressions
  * (reference test_config_editor.py:104 `trigger: "1 * * * *"` — the
  * platform schedules these server-side; this evaluator is the engine-side
  * stand-in so a host loop can ask "is this node due at time T?" / "when
  * does it fire next?" without a daemon).
  *
  * Fields: minute hour day-of-month month day-of-week. Supports `*`,
  * star-slash-n steps, `a-b` ranges, and `a,b,c` lists. Day-of-month vs
  * day-of-week follow classic cron OR semantics when both are restricted.
  */
final case class Cron(expr: String) {
  private val Array(minF, hourF, domF, monF, dowF) = {
    val parts = expr.trim.split("\\s+")
    require(parts.length == 5, s"cron '$expr' must have 5 fields")
    parts
  }

  // Parse one field into its match set AT CONSTRUCTION: a malformed token
  // ('a', a zero step, '99') is a named IllegalArgumentException when the
  // Cron is built, not a NumberFormatException thrown mid-isDue from
  // inside the scheduler's filter over every node (where one bad trigger
  // aborted the whole graph's tick). Each part is [range][/step]: star, n,
  // or a-b, optionally followed by /k.
  private def parseField(field: String, min: Int, max: Int,
      name: String): scala.collection.immutable.BitSet = {
    def bad(part: String, why: String) = throw new IllegalArgumentException(
      s"cron '$expr': $why in $name field '$part'")
    val b = scala.collection.mutable.BitSet.empty
    field.split(",").foreach { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, k) =>
          (r, try k.toInt catch {
            case _: NumberFormatException => bad(part, s"non-numeric step '$k'")
          })
        case _ => bad(part, "malformed step")
      }
      if (step < 1) bad(part, s"step must be >= 1, got $step")
      val (lo, hi) =
        try rangePart match {
          case "*" => (min, max)
          case s if s.contains("-") =>
            s.split("-").map(_.toInt) match {
              case Array(a, bb) => (a, bb)
              case _ => bad(part, "malformed range")
            }
          case s => val v = s.toInt; (v, v)
        } catch {
          case _: NumberFormatException => bad(part, "non-numeric value")
        }
      if (lo < min || hi > max || lo > hi)
        bad(part, s"out of range [$min, $max]")
      var v = lo
      while (v <= hi) { if ((v - lo) % step == 0) b += v; v += 1 }
    }
    scala.collection.immutable.BitSet.fromSpecific(b)
  }

  // precomputed per-field match sets: isDue is O(1) lookups, so nextFire's
  // worst-case ~2.1M-minute scan (never-firing expressions like Feb 31)
  // does no per-minute string parsing
  private val minSet = parseField(minF, 0, 59, "minute")
  private val hourSet = parseField(hourF, 0, 23, "hour")
  private val domSet = parseField(domF, 1, 31, "day-of-month")
  private val monSet = parseField(monF, 1, 12, "month")
  private val dowSet = parseField(dowF, 0, 7, "day-of-week")

  /** Does this expression fire at the given minute? */
  def isDue(t: LocalDateTime): Boolean = {
    val minOk = minSet(t.getMinute)
    val hourOk = hourSet(t.getHour)
    val monOk = monSet(t.getMonthValue)
    val domOk = domSet(t.getDayOfMonth)
    // 0 = Sunday, and 7 is the standard alias: Sunday matches as either
    val dow = t.getDayOfWeek.getValue % 7
    val dowOk = dowSet(dow) || (dow == 0 && dowSet(7))
    // vixie cron keys "restricted" on a leading `*`: "*/2" in dom is still
    // an unrestricted field for the dom/dow OR rule
    val domRestricted = !domF.startsWith("*")
    val dowRestricted = !dowF.startsWith("*")
    val dayOk =
      if (domRestricted && dowRestricted) domOk || dowOk // classic OR rule
      else domOk && dowOk
    minOk && hourOk && monOk && dayOk
  }

  /** Next fire time strictly after `t` (minute granularity; scans at most
    * ~4 years before giving up, which covers every valid expression).
    */
  def nextFire(t: LocalDateTime): Option[LocalDateTime] = {
    var cur = t.plusMinutes(1).withSecond(0).withNano(0)
    var i = 0
    val limit = 4 * 366 * 24 * 60
    while (i < limit) {
      if (isDue(cur)) return Some(cur)
      cur = cur.plusMinutes(1)
      i += 1
    }
    None
  }
}
