package graft

import java.nio.file.Paths
import java.time.{Instant, LocalDate}

import graft.api.{Connection, GraftEngine, Parameter, State}

/** State KV persistence (node.py:417-505) + typed parameters
  * (node.py:516-542).
  */
class StateParamSpec extends SparkSpec {

  test("state set/get round-trips across instances (persistence)") {
    val dir = Paths.get(freshRoot())
    val s1 = new State(dir, "n1")
    s1.set("count", 42L)
    s1.set("name", "abc")
    s1.set("ratio", 1.5)
    s1.set("flag", true)
    val s2 = new State(dir, "n1")
    assert(s2.get("count") == Some(42L))
    assert(s2.get("name") == Some("abc"))
    assert(s2.get("ratio") == Some(1.5))
    assert(s2.get("flag") == Some(true))
    assert(s2.get("missing").isEmpty)
    assert(s2.getValue("missing", "dflt") == "dflt")
  }

  test("set replaces the whole dict; set_value sets one key (node.py:424-431)") {
    val dir = Paths.get(freshRoot())
    val s = new State(dir, "n")
    s.set("a", 1L); s.set("b", 2L)
    s.setState(Map("c" -> 3L))          // whole-dict replace
    assert(new State(dir, "n").getState == Map("c" -> 3L))
  }

  test("state is per-node") {
    val dir = Paths.get(freshRoot())
    new State(dir, "a").set("k", 1L)
    assert(new State(dir, "b").get("k").isEmpty)
  }

  test("get_datetime parses stored timestamps (node.py:451-463)") {
    val dir = Paths.get(freshRoot())
    val s = new State(dir, "n")
    val t = Instant.parse("2024-05-01T10:30:00Z")
    s.set("last_run", t)
    assert(new State(dir, "n").getDatetime("last_run") == Some(t))
  }

  test("reset clears all node state (node.py:502-505)") {
    val dir = Paths.get(freshRoot())
    val s = new State(dir, "n")
    s.set("k", 1L); s.reset()
    assert(new State(dir, "n").get("k").isEmpty)
  }

  test("should_continue honors the execution budget (node.py:465-480)") {
    val dir = Paths.get(freshRoot())
    val fresh = new State(dir, "n", System.currentTimeMillis(), 600000L)
    assert(fresh.shouldContinue())
    val exhausted = new State(dir, "n", System.currentTimeMillis() - 590000L, 600000L)
    assert(!exhausted.shouldContinue())
    // custom thresholds
    assert(!fresh.shouldContinue(pctOfLimit = Some(0.0)))
    assert(fresh.shouldContinue(secondsTillLimit = Some(1L)))
  }

  test("request_new_run is visible to the runner (node.py:482-500)") {
    val s = new State(Paths.get(freshRoot()), "n")
    assert(s.pendingNewRun.isEmpty)
    s.requestNewRun(triggerDownstream = false, waitAtleastSeconds = Some(30L))
    assert(s.pendingNewRun.exists(r => !r.triggerDownstream && r.waitAtleastSeconds == Some(30L)))
  }

  test("parameters resolve with defaults, casts, and required semantics") {
    val params = Map[String, Any]("limit" -> 2, "rate" -> "0.5", "on" -> true,
      "day" -> "2024-02-01", "conn" -> Map("connection_type" -> "jdbc", "url" -> "x"))
    assert(Parameter[Long]("limit").resolve(params) == 2L)
    assert(Parameter[Double]("rate").resolve(params) == 0.5)
    assert(Parameter[Boolean]("on").resolve(params))
    assert(Parameter[LocalDate]("day").resolve(params) == LocalDate.of(2024, 2, 1))
    assert(Parameter[Connection]("conn").resolve(params).connectionType == "jdbc")
    assert(Parameter[Long]("absent", default = Some(7L)).resolve(params) == 7L)
    // default="MISSING" sentinel => required (node.py:539-540)
    assertThrows[IllegalArgumentException] {
      Parameter[String]("absent").resolve(params)
    }
  }

  test("list/connection parameters accept Jackson java.util values (graph.yml types)") {
    val jl = new java.util.ArrayList[Any]()
    jl.add("a"); jl.add("b")
    val jm = new java.util.LinkedHashMap[String, Any]()
    jm.put("connection_type", "jdbc"); jm.put("url", "x")
    val params = Map[String, Any]("tags" -> jl, "conn" -> jm)
    assert(Parameter[Seq[Any]]("tags").resolve(params) == Seq("a", "b"))
    val c = Parameter[Connection]("conn").resolve(params)
    assert(c.connectionType == "jdbc" && c.props("url") == "x")
  }

  test("engine wires parameters to nodes (B10)") {
    val e = new GraftEngine(spark, freshRoot()).withParameters(Map("k" -> 5))
    assert(e.parameter(Parameter[Long]("k")) == 5L)
  }
}
