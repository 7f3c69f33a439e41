package graft.api

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets
import java.time.Instant

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-node key→value state persisted across executions (reference
  * node.py:417-505 — "a wrapper around a Table object" whose rows live in
  * the backing store; here a JSON document in the catalog root, which keeps
  * it human-inspectable and O(1)).
  *
  * Also carries run control: [[shouldContinue]] is the time-budget guard
  * (reference node.py:465-480 — ~10-minute hard limit, default stop at 80%
  * of the limit or 120 s before it, whichever is greater) and
  * [[requestNewRun]] asks the scheduler for a follow-up execution
  * (reference node.py:482-500).
  */
class State(stateDir: Path, nodeId: String,
    executionStartMillis: Long = System.currentTimeMillis(),
    executionLimitMillis: Long = 10 * 60 * 1000L) {

  private val path = stateDir.resolve(s"$nodeId.json")
  private var cache: Map[String, JValue] = loadFile()
  private var newRunRequested: Option[NewRunRequest] = None

  private def loadFile(): Map[String, JValue] = {
    def parse(p: Path): Map[String, JValue] =
      JsonMethods.parse(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
        case JObject(fields) => fields.toMap
        case _ => Map.empty
      }
    // Recovery for persist()'s non-atomic fallback window (same contract
    // as TableCatalog.load): tmp, when present, is always a COMPLETELY
    // written document, so a truncated/missing final file recovers from
    // tmp instead of bricking the node with a parse error every run.
    val tmp = stateDir.resolve(s"$nodeId.json.tmp")
    if (Files.exists(path)) {
      try parse(path)
      catch { case _: Throwable =>
        if (Files.exists(tmp)) parse(tmp)
        else parse(path) // tmp consumed => the replace finished; re-read
      }
    } else if (Files.exists(tmp)) {
      // crash before the move — but a crash DURING the tmp write leaves a
      // truncated tmp with no final file; that must start the node empty,
      // not throw out of the constructor on every subsequent run
      try parse(tmp) catch { case _: Throwable => Map.empty }
    } else Map.empty
  }

  private def persist(): Unit = {
    Files.createDirectories(stateDir)
    // tmp + atomic rename (same pattern as TableCatalog.save): a crash
    // mid-write must not leave truncated JSON — stream cursors live here,
    // and an unparseable file would block the node until hand-repaired
    val tmp = stateDir.resolve(s"$nodeId.json.tmp")
    Files.write(tmp,
      JsonMethods.compact(JsonMethods.render(JObject(cache.toList: _*)))
        .getBytes(StandardCharsets.UTF_8))
    try
      Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // Some filesystems (network/overlay mounts) can't rename atomically;
      // a best-effort plain replace beats failing every state persist.
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, path,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def toJ(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case sh: Short => JLong(sh.toLong)
    case by: Byte => JLong(by.toLong)
    case d: Double => JDouble(d)
    // numeric types must stay NUMERIC across the persistence round-trip —
    // the catch-all's stringification silently changed a Float value into
    // a String on the next execution (reference is Python: one float type)
    case f: Float => JDouble(f.toDouble)
    case bd: BigDecimal => JDecimal(bd)
    case bd: java.math.BigDecimal => JDecimal(BigDecimal(bd))
    case bi: BigInt => JInt(bi)
    case b: Boolean => JBool(b)
    case t: Instant => JString(t.toString)
    case seq: Seq[_] => JArray(seq.map(toJ).toList)
    case m: Map[_, _] => JObject(m.toList.map { case (k, x) => k.toString -> toJ(x) })
    case other => JString(other.toString)
  }

  private def fromJ(j: JValue): Any = j match {
    case JString(s) => s
    case JLong(l) => l
    case JInt(i) => i.toLong
    case JDouble(d) => d
    case JDecimal(d) => d
    case JBool(b) => b
    case JNull => null
    case JArray(xs) => xs.map(fromJ)
    case JObject(fs) => fs.map { case (k, v) => k -> fromJ(v) }.toMap
    case _ => null
  }

  /** node.py:424-426 set — REPLACE the whole state dict. */
  def setState(state: Map[String, Any]): Unit = {
    cache = state.map { case (k, v) => k -> toJ(v) }
    persist()
  }

  /** node.py:429-431 set_value — store a value for one key. */
  def set(key: String, value: Any): Unit = { cache += key -> toJ(value); persist() }

  /** node.py:434-436 get — the current whole state dict. */
  def getState: Map[String, Any] = cache.map { case (k, v) => k -> fromJ(v) }

  /** node.py:439-449 get_value — per-key access. */
  def get(key: String): Option[Any] = cache.get(key).map(fromJ)

  def getValue(key: String, default: Any = null): Any =
    get(key).getOrElse(default)

  /** node.py:451-463 get_datetime — value parsed as a timestamp. */
  def getDatetime(key: String): Option[Instant] = get(key).map {
    case s: String => Instant.parse(s)
    case l: Long => Instant.ofEpochMilli(l)
    case other => Instant.parse(other.toString)
  }

  /** Remove a single key. */
  def remove(key: String): Unit = { cache -= key; persist() }

  /** node.py:502-505 reset — clear all state for this node. */
  def reset(): Unit = { cache = Map.empty; persist() }

  /** node.py:465-480 should_continue. */
  def shouldContinue(pctOfLimit: Option[Double] = None,
      secondsTillLimit: Option[Long] = None): Boolean = {
    val elapsed = System.currentTimeMillis() - executionStartMillis
    val stopAt = (pctOfLimit, secondsTillLimit) match {
      case (Some(p), _) => (executionLimitMillis * p).toLong
      case (None, Some(s)) => executionLimitMillis - s * 1000L
      case (None, None) =>
        // default: 80% of limit or 120 s before it, whichever is GREATER
        math.max((executionLimitMillis * 0.8).toLong, executionLimitMillis - 120000L)
    }
    elapsed < stopAt
  }

  /** node.py:482-500 request_new_run. */
  def requestNewRun(triggerDownstream: Boolean = true,
      waitAtleastSeconds: Option[Long] = None): Unit =
    newRunRequested = Some(NewRunRequest(triggerDownstream, waitAtleastSeconds))

  /** Read by the graph runner after the node returns. */
  def pendingNewRun: Option[NewRunRequest] = newRunRequested
}

case class NewRunRequest(triggerDownstream: Boolean, waitAtleastSeconds: Option[Long])
