package graft.graph

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** One `functions:` entry (reference edit.py:101-200): a python/sql/
  * subgraph node (`node_file`), webhook, or reusable component (`uses`).
  */
case class NodeConfig(
    id: String,
    title: Option[String],
    nodeFile: Option[String],
    webhook: Option[String],
    uses: Option[String],
    trigger: Option[String],
    inputs: Map[String, String],
    outputs: Map[String, String],
    parameters: Map[String, Any]) {
  def isSql: Boolean = nodeFile.exists(_.endsWith(".sql"))
  def isSubgraph: Boolean = nodeFile.exists(_.endsWith("graph.yml"))
  def isWebhook: Boolean = webhook.isDefined
  /** All stores this node reads / writes. */
  def inputStores: Set[String] = inputs.values.toSet
  def outputStores: Set[String] =
    outputs.values.toSet ++ webhook.toSet
}

/** One `stores:` entry (reference edit.py:128-154): `table:` or `stream:`. */
case class StoreConfig(name: String, kind: String, id: Option[String], schema: Option[String])

/** Parsed graph.yml (reference edit.py:19-232; shape per FIXTURES.md §1). */
case class GraphConfig(
    title: Option[String],
    slug: Option[String],
    exposes: Map[String, Seq[String]],
    functions: Seq[NodeConfig],
    stores: Seq[StoreConfig])

/** graph.yml parser + subgraph flattener (reference lookup.py:213-250,
  * create.py:126, edit.py:296-304 — nested graphs get id-prefixed and
  * inlined into the parent DAG).
  */
object GraphLoader {
  private val mapper = new ObjectMapper(new YAMLFactory())

  /** 8-char base-36 node id (reference helpers.py:128-132). */
  def newId(rng: scala.util.Random = new scala.util.Random()): String = {
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    (1 to 8).map(_ => chars(rng.nextInt(chars.length))).mkString
  }

  def parse(yaml: String): GraphConfig = {
    val root = Option(mapper.readValue(yaml, classOf[java.util.Map[String, Object]]))
      .map(_.asScala.toMap).getOrElse(Map.empty)

    def str(m: Map[String, Any], k: String): Option[String] =
      m.get(k).collect { case s: String => s; case other if other != null => other.toString }

    def strMap(m: Map[String, Any], k: String): Map[String, String] =
      m.get(k) match {
        case Some(j: java.util.Map[_, _]) =>
          j.asScala.map { case (a, b) => a.toString -> b.toString }.toMap
        case _ => Map.empty
      }

    def anyMap(m: Map[String, Any], k: String): Map[String, Any] =
      m.get(k) match {
        case Some(j: java.util.Map[_, _]) =>
          j.asScala.map { case (a, b) => a.toString -> (b: Any) }.toMap
        case _ => Map.empty
      }

    // `functions:` is authoritative; accept legacy `nodes:` (lookup.py:128).
    val fnList = root.get("functions").orElse(root.get("nodes")) match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
          val n = m.asScala.map { case (a, b) => a.toString -> (b: Any) }.toMap
          NodeConfig(
            id = str(n, "id").getOrElse(newId()),
            title = str(n, "title"),
            nodeFile = str(n, "node_file"),
            webhook = str(n, "webhook"),
            uses = str(n, "uses"),
            trigger = str(n, "trigger"),
            inputs = strMap(n, "inputs"),
            outputs = strMap(n, "outputs"),
            parameters = anyMap(n, "parameters"))
        }
      case _ => Seq.empty
    }

    val storeList = root.get("stores") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
          val s = m.asScala.map { case (a, b) => a.toString -> (b: Any) }.toMap
          val (name, kind) = str(s, "table") match {
            case Some(t) => (t, "table")
            case None => (str(s, "stream").getOrElse(
              throw new IllegalArgumentException("store needs table: or stream:")), "stream")
          }
          StoreConfig(name, kind, str(s, "id"), str(s, "schema"))
        }
      case _ => Seq.empty
    }

    val exposes = root.get("exposes") match {
      case Some(j: java.util.Map[_, _]) =>
        j.asScala.toSeq.map { case (k, v) =>
          k.toString -> (v match {
            case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
            case other => Seq(other.toString)
          })
        }.toMap[String, Seq[String]]
      case _ => Map.empty[String, Seq[String]]
    }

    GraphConfig(str(root, "title"), str(root, "slug"), exposes, fnList, storeList)
  }

  /** Load from disk and flatten subgraph AND component nodes into the
    * parent DAG: a child graph's nodes are inlined with `<nodeId>/`-prefixed
    * ids, and its exposed ports are rebound to the parent's
    * `inputs:`/`outputs:` bindings (reference edit.py:296-304,
    * test_lookup.py:7-24; components edit.py:175-200).
    *
    * `componentsDir` is the local registry: `uses: org/component@v1`
    * resolves to `<componentsDir>/org/component/v1/graph.yml` — the
    * engine-side stand-in for the platform's published-component store.
    */
  def load(path: Path, componentsDir: Option[Path] = None): GraphConfig =
    load(path, componentsDir, Set.empty)

  private def load(path: Path, componentsDir: Option[Path],
      loading: Set[Path]): GraphConfig = {
    // cycle detection: a subgraph/component that (transitively) includes
    // itself must be a named error, not a StackOverflowError
    val canonical = path.toAbsolutePath.normalize
    if (loading(canonical)) throw new IllegalArgumentException(
      s"cyclic subgraph/component reference: $canonical includes itself " +
        s"(inclusion chain: ${loading.mkString(" -> ")})")
    val cfg = parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
    // a bare relative path ("graph.yml") has a null parent — resolve
    // child refs against the current directory, not NPE
    val parentDir = Option(canonical.getParent)
      .getOrElse(java.nio.file.Paths.get("."))

    def inline(node: NodeConfig, childPath: Path): Seq[NodeConfig] = {
      val child = load(childPath, componentsDir, loading + canonical)
      // ports exposed by the child resolve to the parent's bound stores —
      // but only names the child lists under `exposes:` are rebindable;
      // a child-internal store that merely shares a parent port's name
      // stays internal (prefixed). A child with no exposes block exposes
      // everything (legacy permissive wiring).
      val exposed: Set[String] = child.exposes.values.flatten.toSet
      val all: Map[String, String] = node.inputs ++ node.outputs
      val rebind: Map[String, String] =
        if (exposed.isEmpty) all else all.view.filterKeys(exposed).toMap
      // entry nodes: consume nothing the child graph itself produces —
      // these are what the wrapper's `trigger:` cron fires after
      // flattening (the rest of the child DAG follows via cascade)
      val childProduced: Set[String] = child.functions.flatMap(_.outputs.values).toSet
      child.functions.map { n =>
        val isEntry = n.inputs.values.forall(st => !childProduced(st))
        n.copy(
          id = s"${node.id}/${n.id}",
          inputs = n.inputs.map { case (p, st) => p -> rebind.getOrElse(st, s"${node.id}/$st") },
          outputs = n.outputs.map { case (p, st) => p -> rebind.getOrElse(st, s"${node.id}/$st") },
          // the wrapper's instantiation parameters flow to every child
          // node (wrapper wins over child defaults — reference
          // edit.py:175-200, a component is parameterized at use site);
          // its cron lands on the child's entry nodes unless they
          // schedule themselves
          parameters = n.parameters ++ node.parameters,
          trigger = if (isEntry) n.trigger.orElse(node.trigger) else n.trigger)
      }
    }

    val flattened = cfg.functions.flatMap {
      case sub if sub.isSubgraph =>
        inline(sub, parentDir.resolve(sub.nodeFile.get))
      case comp if comp.uses.isDefined =>
        val dir = componentsDir.getOrElse(throw new IllegalArgumentException(
          s"node ${comp.id} uses '${comp.uses.get}' but no components dir was given"))
        comp.uses.get match {
          case s"$org/$name@$ver" =>
            inline(comp, dir.resolve(org).resolve(name).resolve(ver).resolve("graph.yml"))
          case other => throw new IllegalArgumentException(
            s"malformed component ref '$other' (want org/component@version)")
        }
      case plain => Seq(plain)
    }
    cfg.copy(functions = flattened)
  }
}
