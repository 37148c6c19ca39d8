package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import graft.jmespath.JmesPath

/** One-shot differential harness: reads [{expr, doc}] from args(0), writes
  * [{expr, result|error}] to args(1) for comparison against another JMESPath
  * implementation. Dev tool — not part of the engine surface.
  */
object JmesCross {
  def main(args: Array[String]): Unit = {
    val mapper = new ObjectMapper()
    val cases = mapper.readTree(new java.io.File(args(0)))
    val out = mapper.createArrayNode()
    cases.forEach { c =>
      val o = mapper.createObjectNode()
      o.set[com.fasterxml.jackson.databind.JsonNode]("expr", c.get("expr"))
      try {
        val r = JmesPath.compile(c.get("expr").textValue()).searchNode(c.get("doc"))
        o.put("result", JmesPath.serialize(r))
      } catch {
        case _: JmesPath.JmesPathParseException => o.put("error", "parse")
        case _: JmesPath.JmesPathRuntimeException => o.put("error", "runtime")
      }
      out.add(o)
    }
    mapper.writeValue(new java.io.File(args(1)), out)
  }
}
