package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonDropKeys

/** Property test for the structural envelope stripper: for randomized JSON
  * objects, stripping top-level keys via the streaming token-copy must agree
  * with the reference semantics (decode into a tree, delete the entries,
  * re-encode — query_payload.go:117-158), for any key order, nesting depth,
  * escape content, and envelope-name lookalikes below the top level.
  */
class JsonDropKeysSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val drop = Set("__event__", "__crdb__")

  /** Oracle: tree-based removal of top-level keys. */
  private def oracle(json: String): String = {
    val node = mapper.readTree(json)
    if (!node.isObject) json
    else {
      val obj = node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      drop.foreach(obj.remove)
      mapper.writeValueAsString(obj)
    }
  }

  private def randomValue(r: scala.util.Random, depth: Int): Any = {
    val choice = if (depth >= 3) r.nextInt(5) else r.nextInt(7)
    choice match {
      case 0 => r.nextInt(1000000)
      case 1 => BigDecimal("4E+2") // engineering decimal must survive
      case 2 => null
      case 3 => r.nextBoolean()
      case 4 =>
        // strings incl. quotes, backslashes, and envelope-name lookalikes
        Seq("plain", "a\"b\\c", "say \"__event__\" loudly", "tab\there",
          "unicode ✓ ok", "__crdb__").apply(r.nextInt(6))
      case 5 => (0 until r.nextInt(3)).map(_ => randomValue(r, depth + 1))
      case 6 => randomObj(r, depth + 1)
    }
  }

  private def randomObj(r: scala.util.Random, depth: Int): Map[String, Any] = {
    val keys = r.shuffle(
      Seq("__event__", "__crdb__", "pk", "v", "note", "x1").take(2 + r.nextInt(4))
    )
    keys.map(k => k -> randomValue(r, depth)).toMap
  }

  private def toJson(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
    case null => mapper.nullNode()
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case d: BigDecimal => mapper.getNodeFactory.numberNode(d.bigDecimal)
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case s: String => mapper.getNodeFactory.textNode(s)
    case seq: Seq[_] =>
      val a = mapper.createArrayNode()
      seq.foreach(x => a.add(toJson(x)))
      a
    case m: Map[_, _] =>
      val o = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[com.fasterxml.jackson.databind.JsonNode](k.toString, toJson(x)) }
      o
  }

  test("strip agrees with tree-based removal on 500 randomized objects (property)") {
    val r = new scala.util.Random(1234L)
    (0 until 500).foreach { i =>
      val obj = randomObj(r, 0)
      val json = mapper.writeValueAsString(toJson(obj))
      val got = JsonDropKeys.strip(json, drop)
      val want = oracle(json)
      // compare as TREES (key order preserved by both, but numbers may be
      // re-rendered; tree equality is the semantic contract)
      assert(mapper.readTree(got) == mapper.readTree(want), s"case $i: $json")
      // and the kept top-level key ORDER must be preserved verbatim
      val gotKeys = {
        val it = mapper.readTree(got).fieldNames()
        val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next(); b.result()
      }
      val wantKeys = {
        val it = mapper.readTree(want).fieldNames()
        val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next(); b.result()
      }
      assert(gotKeys == wantKeys, s"case $i key order: $json")
    }
  }

  test("non-object and malformed inputs pass through unchanged") {
    assert(JsonDropKeys.strip("[1,2,3]", drop) == "[1,2,3]")
    assert(JsonDropKeys.strip("42", drop) == "42")
    assert(JsonDropKeys.strip("not json {", drop) == "not json {")
    assert(JsonDropKeys.strip("""{"truncated": """, drop) == """{"truncated": """)
  }

  test("exact wire text of numbers is preserved (2^53+1, 4E+2)") {
    val json = """{"__event__":"insert","big":9007199254740993,"dec":4E+2,"__crdb__":{"u":"1.0"}}"""
    val got = JsonDropKeys.strip(json, drop)
    assert(got == """{"big":9007199254740993,"dec":4E+2}""")
  }
}
