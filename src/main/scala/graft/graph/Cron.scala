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

  private def matches(field: String, value: Int, min: Int, max: Int): Boolean =
    field.split(",").exists { part =>
      // each part is [range][/step]: *, n, a-b, optionally followed by /k
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, k) => (r, k.toInt)
      }
      val (lo, hi) = rangePart match {
        case "*" => (min, max)
        case s if s.contains("-") =>
          val Array(a, b) = s.split("-").map(_.toInt); (a, b)
        case s => val v = s.toInt; (v, v)
      }
      value >= lo && value <= hi && (value - lo) % step == 0
    }

  /** Does this expression fire at the given minute? */
  def isDue(t: LocalDateTime): Boolean = {
    val minOk = matches(minF, t.getMinute, 0, 59)
    val hourOk = matches(hourF, t.getHour, 0, 23)
    val monOk = matches(monF, t.getMonthValue, 1, 12)
    val domOk = matches(domF, t.getDayOfMonth, 1, 31)
    // 0 = Sunday, and 7 is the standard alias: Sunday matches as either
    val dow = t.getDayOfWeek.getValue % 7
    val dowOk = matches(dowF, dow, 0, 6) ||
      (dow == 0 && matches(dowF, 7, 0, 7))
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
