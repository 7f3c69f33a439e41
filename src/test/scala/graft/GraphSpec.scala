package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.graph.{GraphLoader, GraphRunner}

/** graph.yml semantics (SURVEY.md §2.B; golden yaml per FIXTURES.md §1). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val goldenYaml =
    """title: graph
      |slug: test-graph
      |exposes:
      |  outputs:
      |    - output
      |functions:
      |  - node_file: node_1.py
      |    id: ab234567
      |    title: my node
      |    trigger: 1 * * * *
      |    inputs:  {node_in: hook}
      |    outputs: {node_out: my_table}
      |    parameters: {limit: 2}
      |  - node_file: agg.sql
      |    id: ab234569
      |    inputs:  {src: my_table}
      |    outputs: {out: agg_table}
      |  - webhook: hook
      |    id: ab234570
      |stores:
      |  - table: my_table
      |    id: ab234568
      |    schema: sc
      |  - stream: s
      |""".stripMargin

  test("golden graph.yml parses every observed key (FIXTURES.md §1)") {
    val g = GraphLoader.parse(goldenYaml)
    assert(g.title == Some("graph") && g.slug == Some("test-graph"))
    assert(g.exposes == Map("outputs" -> Seq("output")))
    assert(g.functions.size == 3)
    val n1 = g.functions.head
    assert(n1.id == "ab234567" && n1.nodeFile == Some("node_1.py"))
    assert(n1.trigger == Some("1 * * * *"))
    assert(n1.inputs == Map("node_in" -> "hook"))
    assert(n1.outputs == Map("node_out" -> "my_table"))
    assert(n1.parameters == Map("limit" -> 2))
    assert(g.functions(1).isSql)
    assert(g.functions(2).isWebhook && g.functions(2).webhook == Some("hook"))
    assert(g.stores.map(s => (s.name, s.kind)) ==
      Seq(("my_table", "table"), ("s", "stream")))
    assert(g.stores.head.schema == Some("sc"))
  }

  test("nodes without ids get 8-char base-36 ids stamped (helpers.py:128-132)") {
    val g = GraphLoader.parse("functions:\n  - node_file: a.py\n")
    assert(g.functions.head.id.matches("[a-z0-9]{8}"))
  }

  test("pipeline: function node -> sql node cascade, driven by table events") {
    val dir = Files.createTempDirectory("graph-")
    Files.write(dir.resolve("agg.sql"),
      """SELECT k, SUM(v) AS total, {{ params.scale }} AS scale
        |FROM {{ src }} GROUP BY k""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val yaml =
      """functions:
        |  - node_file: producer
        |    id: aaaaaaaa
        |    outputs: {out: raw}
        |  - node_file: agg.sql
        |    id: bbbbbbbb
        |    inputs:  {src: raw}
        |    outputs: {out: totals}
        |    parameters: {scale: 7}
        |stores:
        |  - table: raw
        |  - table: totals
        |""".stripMargin
    val g = GraphLoader.parse(yaml)
    val runner = new GraphRunner(spark, g, freshRoot(), Some(dir))
      .register("producer", eng => {
        eng.table("out", "w").append(
          Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v"))
      })
    runner.runAll()
    // the sql node ran because `raw` gained a create event; re-run is idempotent
    val totals = runner.runNode("bbbbbbbb")
    val out = totals.table("totals").read.orderBy("k")
      .as[(String, Long, Int)].collect().toSeq
    assert(out == Seq(("a", 3L, 7), ("b", 5L, 7)))
  }

  test("sql template renders '$' and backslash parameter values literally") {
    val dir = Files.createTempDirectory("graph-")
    Files.write(dir.resolve("tag.sql"),
      "SELECT k, '{{ params.tag }}' AS tag FROM {{ src }}"
        .getBytes(StandardCharsets.UTF_8))
    val yaml =
      """functions:
        |  - node_file: producer
        |    id: aaaaaaaa
        |    outputs: {out: t_src}
        |  - node_file: tag.sql
        |    id: bbbbbbbb
        |    inputs:  {src: t_src}
        |    outputs: {out: t_tagged}
        |    parameters: {tag: "US$1"}
        |""".stripMargin
    val runner = new GraphRunner(spark, GraphLoader.parse(yaml), freshRoot(), Some(dir))
      .register("producer", eng =>
        eng.table("out", "w").append(Seq(("a", 1L)).toDF("k", "v")))
    runner.trigger("aaaaaaaa")
    val out = runner.runNode("bbbbbbbb").table("t_tagged").read
      .select("tag").as[String].collect().toSeq
    assert(out == Seq("US$1")) // NOT a regex group substitution
  }

  test("trigger cascades downstream only when inputs gain events") {
    val dir = Files.createTempDirectory("graph-")
    Files.write(dir.resolve("pass.sql"),
      "SELECT * FROM {{ src }}".getBytes(StandardCharsets.UTF_8))
    val yaml =
      """functions:
        |  - node_file: producer
        |    id: aaaaaaaa
        |    outputs: {out: t_raw}
        |  - node_file: pass.sql
        |    id: bbbbbbbb
        |    inputs:  {src: t_raw}
        |    outputs: {out: t_copy}
        |""".stripMargin
    val root = freshRoot()
    val runner = new GraphRunner(spark, GraphLoader.parse(yaml), root, Some(dir))
      .register("producer", eng =>
        eng.table("out", "w").append(Seq((1L, "x")).toDF("id", "v")))
    runner.trigger("aaaaaaaa")
    val probe = new graft.api.GraftEngine(spark, root, "probe")
    assert(probe.table("t_copy").read.count() == 1)
  }

  test("component nodes (uses:) resolve from the local registry and flatten (B4)") {
    val dir = Files.createTempDirectory("graph-")
    val reg = dir.resolve("components")
    val compDir = reg.resolve("acme").resolve("enrich").resolve("v1")
    Files.createDirectories(compDir)
    Files.write(compDir.resolve("graph.yml"),
      """functions:
        |  - node_file: enrich_step
        |    id: eeeeeeee
        |    inputs:  {in: comp_in}
        |    outputs: {out: comp_out}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("graph.yml"),
      """functions:
        |  - uses: acme/enrich@v1
        |    id: ffffffff
        |    inputs:  {comp_in: raw}
        |    outputs: {comp_out: enriched}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val g = GraphLoader.load(dir.resolve("graph.yml"), Some(reg))
    assert(g.functions.size == 1)
    val inner = g.functions.head
    assert(inner.id == "ffffffff/eeeeeeee")
    assert(inner.inputs == Map("in" -> "raw"))
    assert(inner.outputs == Map("out" -> "enriched"))
  }

  test("cron trigger expressions evaluate and drive runDue (B9)") {
    import java.time.LocalDateTime
    import graft.graph.Cron
    val t = LocalDateTime.of(2026, 8, 12, 14, 1) // Wednesday
    assert(Cron("1 * * * *").isDue(t))
    assert(!Cron("2 * * * *").isDue(t))
    assert(Cron("*/1 * * * *").isDue(t))
    assert(Cron("1 14 * * *").isDue(t) && !Cron("1 13 * * *").isDue(t))
    assert(Cron("1 * 12 * *").isDue(t) && !Cron("1 * 13 * *").isDue(t))
    assert(Cron("1 * * * 3").isDue(t) && !Cron("1 * * * 4").isDue(t))
    assert(Cron("0-5 * * * *").isDue(t) && Cron("1,7 * * * *").isDue(t))
    // classic OR rule: dom OR dow when both restricted
    assert(Cron("1 * 13 * 3").isDue(t))
    // stepped ranges and the Sunday-as-7 alias
    assert(Cron("1-10/2 * * * *").isDue(t) && !Cron("0-10/2 * * * *").isDue(t))
    val sunday = LocalDateTime.of(2026, 8, 16, 14, 1)
    assert(Cron("1 * * * 7").isDue(sunday) && Cron("1 * * * 0").isDue(sunday))
    assert(Cron("1 * * * 5-7").isDue(sunday) && !Cron("1 * * * 5-7").isDue(t))
    assert(Cron("1 * * * *").nextFire(t) ==
      Some(LocalDateTime.of(2026, 8, 12, 15, 1)))

    val dir = Files.createTempDirectory("graph-")
    val yaml =
      """functions:
        |  - node_file: producer
        |    id: aaaaaaaa
        |    trigger: "1 * * * *"
        |    outputs: {out: t_cron}
        |""".stripMargin
    val root = freshRoot()
    val runner = new GraphRunner(spark, GraphLoader.parse(yaml), root, Some(dir))
      .register("producer", eng =>
        eng.table("out", "w").append(Seq((1L, "x")).toDF("id", "v")))
    assert(runner.runDue(LocalDateTime.of(2026, 8, 12, 14, 2)).isEmpty)
    assert(runner.runDue(t) == Seq("aaaaaaaa"))
    val probe = new graft.api.GraftEngine(spark, root, "probe")
    assert(probe.table("t_cron").read.count() == 1)
  }

  test("child store shadowing a parent port stays internal when exposes is declared") {
    val dir = Files.createTempDirectory("graph-")
    val subDir = dir.resolve("sub"); Files.createDirectories(subDir)
    // child exposes only sub_in/sub_out; its internal store `scratch`
    // happens to share a name with a parent-side port binding
    Files.write(subDir.resolve("graph.yml"),
      """exposes:
        |  inputs:  [sub_in]
        |  outputs: [sub_out]
        |functions:
        |  - node_file: inner
        |    id: cccccccc
        |    inputs:  {in: sub_in, aux: scratch}
        |    outputs: {out: sub_out}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("graph.yml"),
      """functions:
        |  - node_file: sub/graph.yml
        |    id: dddddddd
        |    inputs:  {sub_in: parent_raw, scratch: parent_secret}
        |    outputs: {sub_out: parent_out}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val g = GraphLoader.load(dir.resolve("graph.yml"))
    val inner = g.functions.head
    assert(inner.inputs("in") == "parent_raw")
    assert(inner.inputs("aux") == "dddddddd/scratch")  // NOT parent_secret
    assert(inner.outputs("out") == "parent_out")
  }

  test("subgraph nodes flatten into the parent DAG with rebound ports") {
    val dir = Files.createTempDirectory("graph-")
    val subDir = dir.resolve("sub"); Files.createDirectories(subDir)
    Files.write(subDir.resolve("graph.yml"),
      """functions:
        |  - node_file: inner
        |    id: cccccccc
        |    inputs:  {in: sub_in}
        |    outputs: {out: sub_out}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("graph.yml"),
      """functions:
        |  - node_file: sub/graph.yml
        |    id: dddddddd
        |    inputs:  {sub_in: parent_raw}
        |    outputs: {sub_out: parent_out}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val g = GraphLoader.load(dir.resolve("graph.yml"))
    assert(g.functions.size == 1)
    val inner = g.functions.head
    assert(inner.id == "dddddddd/cccccccc")
    assert(inner.inputs == Map("in" -> "parent_raw"))
    assert(inner.outputs == Map("out" -> "parent_out"))
  }

  test("a fresh runner over an existing catalog does not replay history") {
    // regression: seenEvents started at 0 in every new runner, so process
    // restarts treated all historical manifest events as new and re-ran
    // every consumer (duplicating rows in append-output nodes)
    val yaml =
      """functions:
        |  - node_file: producer
        |    id: aaaaaaa1
        |    outputs: {out: raw2}
        |  - node_file: consumer
        |    id: bbbbbbb1
        |    inputs:  {in: raw2}
        |    outputs: {out: log2}
        |  - node_file: noop
        |    id: ccccccc1
        |    outputs: {out: scratch2}
        |stores:
        |  - table: raw2
        |  - table: log2
        |  - table: scratch2
        |""".stripMargin
    val g = GraphLoader.parse(yaml)
    val root = freshRoot()
    def wire(r: GraphRunner): GraphRunner = r
      .register("producer", eng =>
        eng.table("out", "w").append(Seq((1L, "x")).toDF("id", "v")))
      .register("consumer", eng =>
        eng.table("out", "w").append(
          eng.table("in").read.selectExpr("id", "v")))
      .register("noop", _ => ())
    wire(new GraphRunner(spark, g, root)).runAll()
    val e = new graft.api.GraftEngine(spark, root)
    val after1 = e.table("log2").read.count()
    assert(after1 == 1L)
    // fresh runner, unrelated trigger: consumer must NOT re-run
    wire(new GraphRunner(spark, g, root)).trigger("ccccccc1")
    assert(e.table("log2").read.count() == after1)
  }

  test("installed-but-empty bindings connect nothing; sql() skip never poisons the memo") {
    // empty bindings map != no bindings: a graph node with zero declared
    // ports must not get unrestricted store access
    val e0 = new graft.api.GraftEngine(spark, freshRoot())
      .withBindings(Map.empty)
    intercept[IllegalArgumentException] { e0.table("anything") }
    assert(!e0.table("opt", required = false).isConnected)
    // sql() skips unconnected explicit names WITHOUT memoizing a dummy,
    // so a later required open still fails loudly
    val e1 = new graft.api.GraftEngine(spark, freshRoot())
      .withBindings(Map("in" -> "t_in"))
    e1.sql("SELECT 1 AS x", tables = Seq("ghost"))
    intercept[IllegalArgumentException] { e1.table("ghost") }
  }
}
