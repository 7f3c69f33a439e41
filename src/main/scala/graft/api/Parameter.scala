package graft.api

import java.time.{Instant, LocalDate}

/** Credentials bundle tagged with a connection type (reference
  * node.py:508-510 — "a dict subclass"); maps onto e.g. JDBC options.
  */
case class Connection(connectionType: String, props: Map[String, String] = Map.empty)

/** Typed scalar config injected into a node from graph config (reference
  * node.py:516-542). The 8-type domain is the reference's
  * (node.py:513): str, int, float, bool, datetime, date, list, Connection.
  * `default = None` with `required = true` reproduces the `"MISSING"`
  * sentinel semantics (node.py:520, :539-540): resolving an unbound
  * required parameter throws.
  */
case class Parameter[A](
    name: String,
    description: Option[String] = None,
    default: Option[A] = None)(implicit conv: ParamType[A]) {

  def required: Boolean = default.isEmpty

  /** Resolve against a node's `parameters:` map. */
  def resolve(params: Map[String, Any]): A =
    params.get(name) match {
      case Some(v) => conv.cast(v)
      case None => default.getOrElse(
        throw new IllegalArgumentException(s"missing required parameter '$name'"))
    }
}

/** Conversion typeclass covering the reference's parameter type domain. */
trait ParamType[A] { def cast(v: Any): A }

object ParamType {
  private def fail(v: Any, to: String) =
    throw new IllegalArgumentException(s"cannot cast $v to $to")

  implicit val str: ParamType[String] = {
    case s: String => s
    case other => other.toString
  }
  implicit val int: ParamType[Long] = {
    case l: Long => l
    case i: Int => i.toLong
    case s: String => s.toLong
    case other => fail(other, "int")
  }
  implicit val float: ParamType[Double] = {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case other => fail(other, "float")
  }
  implicit val bool: ParamType[Boolean] = {
    case b: Boolean => b
    case s: String => s.toBoolean
    case other => fail(other, "bool")
  }
  implicit val datetime: ParamType[Instant] = {
    case t: Instant => t
    case l: Long => Instant.ofEpochMilli(l)
    case s: String => Instant.parse(s)
    case other => fail(other, "datetime")
  }
  implicit val date: ParamType[LocalDate] = {
    case d: LocalDate => d
    case s: String => LocalDate.parse(s)
    case other => fail(other, "date")
  }
  implicit val list: ParamType[Seq[Any]] = {
    case s: Seq[_] => s
    // graph.yml values arrive as Jackson java.util collections
    case l: java.util.List[_] =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
    case other => fail(other, "list")
  }
  implicit val connection: ParamType[Connection] = {
    case c: Connection => c
    case m: Map[_, _] =>
      val props = m.map { case (k, v) => k.toString -> v.toString }
      Connection(props.getOrElse("connection_type", "generic"), props)
    case m: java.util.Map[_, _] =>
      val props = scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
        .map { case (k, v) => k.toString -> v.toString }.toMap
      Connection(props.getOrElse("connection_type", "generic"), props)
    case other => fail(other, "connection")
  }
}
