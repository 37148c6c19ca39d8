package graft.rules

import graft.config.{Field, GraftConfig, JmesPathSubset, Regexes}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `hotdog -t file` rule-test entry point (reference: src/rules.rs:16-57):
  * every rule's matcher is applied to the RAW line as `msg` (no syslog parse,
  * no actions, no first-match short-circuit), collecting ALL matching rule
  * indexes. Non-msg-field rules are skipped (src/rules.rs:42-44).
  */
object TestMode {
  /** Comma-joined matching rule indexes, e.g. "0,2"; "" when nothing matches. */
  def matchesStr(cfg: GraftConfig, line: Column): Column = {
    val parts = cfg.rules.zipWithIndex.map { case (r, i) =>
      if (r.field != Field.Msg) lit(null).cast("string")
      else {
        // jmespath wins when both matchers are set (src/rules.rs:74-94)
        val cond = (r.jmespath, r.regex) match {
          case (Some(j), _) =>
            get_json_object(line, JmesPathSubset.toJsonPath(j)).isNotNull
          case (None, Some(p)) => line.rlike(Regexes.toJava(p))
          case _ => lit(false)
        }
        when(line.isNotNull && cond, lit(i.toString)).otherwise(lit(null).cast("string"))
      }
    }
    array_join(array(parts: _*), ",") // array_join drops nulls
  }
}
