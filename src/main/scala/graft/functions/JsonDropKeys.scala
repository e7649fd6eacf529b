package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
// (JsonParser used for the signature of stripParsed)
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remove a fixed set of TOP-LEVEL keys from a JSON object, structurally.
  *
  * This is the envelope-stripping step of the CDC-query codec: row payloads
  * arrive as `{"__event__":"insert", ...row columns..., "__crdb__":{...}}`
  * and the row image is everything minus the envelope keys (reference:
  * internal/source/cdc/query_payload.go:117-158, which decodes the object
  * into a map and deletes the envelope entries — the same structural
  * semantics as this token-copy).
  *
  * Unlike a regex rewrite, this survives any key order (`__event__` first,
  * last, or between), nested objects/arrays inside the dropped values, and
  * string values that happen to contain the literal text of an envelope key.
  * Numbers are copied exactly (BigDecimal/BigInteger — no double round-trip,
  * matching the codec rule that JSON numerics never lose precision).
  *
  * Non-object or malformed input is returned unchanged — downstream typed
  * parsing (`from_json` with an explicit schema) is the validation point,
  * exactly as for the plain ndjson envelope.
  */
case class JsonDropKeys(child: Expression, dropKeys: Seq[String])
    extends UnaryExpression {
  require(dropKeys.nonEmpty)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val dropSet: Set[String] = dropKeys.toSet

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(JsonDropKeys.strip(s, dropSet))
  }

  // the drop set rides as a broadcast-referenced object; the parse kernel
  // is one static call, so the feed-decode projection stays whole-stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef =
      ctx.addReferenceObj("dropSet", dropSet, "scala.collection.immutable.Set")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.JsonDropKeys.strip($c.toString(), $setRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonDropKeys =
    copy(child = newChild)
}

object JsonDropKeys {
  private val factory: JsonFactory = new JsonFactory()

  def strip(json: String, drop: Set[String]): String = {
    try {
      val p = factory.createParser(json)
      try stripParsed(p, json, drop)
      finally p.close()
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => json
    }
  }

  private def stripParsed(p: JsonParser, json: String, drop: Set[String]): String = {
    if (p.nextToken() != JsonToken.START_OBJECT) return json
    val sw = new java.io.StringWriter(json.length)
    val g = factory.createGenerator(sw)
    g.writeStartObject()
    var depth = 1
    while (depth > 0) {
      val t = p.nextToken()
      if (t == null) return json // truncated input: treat as malformed
      if (t == JsonToken.FIELD_NAME && depth == 1 && drop.contains(p.currentName())) {
        p.nextToken() // move onto the value...
        p.skipChildren() // ...and skip its whole subtree (no-op for scalars)
      } else {
        t match {
          // numbers copied as their exact wire text (no double round-trip:
          // 2^53+1 and 4E+2 survive byte-identical)
          case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
            g.writeNumber(p.getText)
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
            g.copyCurrentEvent(p); depth += 1
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
            g.copyCurrentEvent(p); depth -= 1
          case _ => g.copyCurrentEvent(p)
        }
      }
    }
    g.flush()
    sw.toString
  }
}
