package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ingest.JsonPath
import org.scalatest.funsuite.AnyFunSuite

class JsonPathSpec extends AnyFunSuite {
  private val m = new ObjectMapper()
  private val doc = m.readTree(
    """{"store":{"books":[{"title":"A","price":10},{"title":"B","price":20}],
        "bike":{"price":99}},"extra":[1,2,3]}""")

  test("$ selects the root") {
    assert(JsonPath.select(doc, "$") == Seq(doc))
  }

  test("child and index access") {
    val r = JsonPath.select(doc, "$.store.books[1].title")
    assert(r.map(_.asText()) == Seq("B"))
  }

  test("bracket child with quotes") {
    val r = JsonPath.select(doc, "$['store']['bike'].price")
    assert(r.map(_.asInt()) == Seq(99))
  }

  test("wildcard over array") {
    val r = JsonPath.select(doc, "$.store.books[*].title")
    assert(r.map(_.asText()) == Seq("A", "B"))
  }

  test("$.* over object selects values") {
    val r = JsonPath.select(doc, "$.*")
    assert(r.size == 2)
  }

  test("recursive descent finds all prices") {
    val r = JsonPath.select(doc, "$..price")
    assert(r.map(_.asInt()).sorted == Seq(10, 20, 99))
  }

  test("negative index") {
    val r = JsonPath.select(doc, "$.extra[-1]")
    assert(r.map(_.asInt()) == Seq(3))
  }

  test("missing path yields empty") {
    assert(JsonPath.select(doc, "$.nope.x").isEmpty)
  }

  test("malformed path rejected") {
    intercept[JsonPath.JsonPathException](JsonPath.select(doc, "store.books"))
  }
}
