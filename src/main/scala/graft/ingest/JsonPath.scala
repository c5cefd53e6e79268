package graft.ingest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/** Minimal JSONPath evaluator over Jackson trees — enough for the
  * reference's JSONPath data-source option (default path `$.*`,
  * `lib/src/data_source/with_jsonpath.rs:18-21`): root `$`, child
  * access `.name` / `['name']`, wildcard `.*` / `[*]`, array index
  * `[n]`, and recursive descent `..name`.
  *
  * Documents are driver-side and whole-buffered — identical to the
  * reference, which parses the full text before slicing
  * (`with_jsonpath.rs:27-43`).
  */
object JsonPath {

  sealed private trait Step
  private case class Child(name: String) extends Step
  private case object Wildcard extends Step
  private case class Index(i: Int) extends Step
  private case class Descend(name: String) extends Step

  final case class JsonPathException(msg: String) extends RuntimeException(msg)

  private def parse(path: String): List[Step] = {
    val p = path.trim
    if (!p.startsWith("$")) throw JsonPathException(s"path must start with $$: $path")
    val steps = scala.collection.mutable.ListBuffer.empty[Step]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' if i + 1 < p.length && p.charAt(i + 1) == '.' =>
          // recursive descent: ..name
          val start = i + 2
          var j = start
          while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
          if (j == start) throw JsonPathException(s"empty descent at $i: $path")
          steps += Descend(p.substring(start, j))
          i = j
        case '.' =>
          val start = i + 1
          if (start < p.length && p.charAt(start) == '*') { steps += Wildcard; i = start + 1 }
          else {
            var j = start
            while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
            if (j == start) throw JsonPathException(s"empty segment at $i: $path")
            steps += Child(p.substring(start, j))
            i = j
          }
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) throw JsonPathException(s"unclosed [ at $i: $path")
          val inner = p.substring(i + 1, end).trim
          if (inner == "*") steps += Wildcard
          else if (inner.startsWith("'") || inner.startsWith("\""))
            steps += Child(inner.substring(1, inner.length - 1))
          else steps += Index(inner.toInt)
          i = end + 1
        case c => throw JsonPathException(s"unexpected '$c' at $i: $path")
      }
    }
    steps.toList
  }

  /** Evaluate; returns all matched nodes in document order. */
  def select(root: JsonNode, path: String): Seq[JsonNode] =
    parse(path).foldLeft(Seq(root)) { (nodes, step) => nodes.flatMap(applyStep(_, step)) }

  private def applyStep(n: JsonNode, step: Step): Seq[JsonNode] = step match {
    case Child(name) => Option(n.get(name)).toSeq
    case Index(i) =>
      n match {
        case a: ArrayNode =>
          val idx = if (i < 0) a.size + i else i
          Option(a.get(idx)).toSeq
        case _ => Nil
      }
    case Wildcard =>
      n match {
        case a: ArrayNode  => a.elements().asScala.toSeq
        case o: ObjectNode => o.properties().asScala.map(_.getValue).toSeq
        case _             => Nil
      }
    case Descend(name) => descend(n, name)
  }

  private def descend(n: JsonNode, name: String): Seq[JsonNode] = {
    val here = Option(n.get(name)).toSeq
    val below = n match {
      case a: ArrayNode  => a.elements().asScala.toSeq.flatMap(descend(_, name))
      case o: ObjectNode => o.properties().asScala.map(_.getValue).toSeq.flatMap(descend(_, name))
      case _             => Nil
    }
    here ++ below
  }
}
