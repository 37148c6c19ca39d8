package graft.syslog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression (whole-stage-codegen'd) syslog parse — the vectorized
  * fast path used by the analytic queries. Covers well-formed lines whose
  * structured-data element is `-` or a single non-nested bracket group; the
  * [[ParseSyslog]] expression (backed by [[Syslog.parseLine]]) is the fully
  * general path used by the streaming pipeline. The two are cross-checked in
  * SyslogSpec.
  *
  * Output struct: (msg, severity, facility, hostname, appname) — the
  * reference's SyslogMessage (src/parse.rs:11-18); severity = pri % 8 and
  * facility = pri / 8 decoded to keywords (src/parse.rs:77-105 golden values).
  */
object SyslogCols {
  /** groups: 1=pri 2=ts 3=host 4=app 5=procid 6=msgid 7=sd 8=msg */
  val P5424 =
    "^<(\\d{1,3})>1 (\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:\\d{2})) (\\S+) (\\S+) (\\S+) (\\S+) (-|\\[[^\\]]*\\]) (.*)$"

  /** groups: 1=pri 2=host 3=app 4=msg */
  val P3164 =
    "^<(\\d{1,3})>(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) {1,2}\\d{1,2} \\d{2}:\\d{2}:\\d{2} (\\S+) ([^: ]+): (.*)$"

  private def sevCol(pri: Column): Column =
    element_at(typedLit(Syslog.Severities), (pri % 8 + 1).cast("int"))
  private def facCol(pri: Column): Column =
    element_at(typedLit(Syslog.Facilities), (floor(pri / 8) + 1).cast("int"))
  private def nilNull(c: Column): Column = when(c === "-", lit(null)).otherwise(c)

  private def outStruct(msg: Column, sev: Column, fac: Column, host: Column, app: Column) =
    struct(msg.as("msg"), sev.as("severity"), fac.as("facility"),
      host.as("hostname"), app.as("appname"))

  val NullParse: Column =
    lit(null).cast("struct<msg:string,severity:string,facility:string,hostname:string,appname:string>")

  def parse5424(line: Column): Column = {
    val pri = regexp_extract(line, P5424, 1).cast("int")
    when(line.rlike(P5424) && pri <= 191,
      outStruct(
        regexp_extract(line, P5424, 8),
        sevCol(pri), facCol(pri),
        nilNull(regexp_extract(line, P5424, 3)),
        nilNull(regexp_extract(line, P5424, 4))))
      .otherwise(NullParse)
  }

  def parse3164(line: Column): Column = {
    val pri = regexp_extract(line, P3164, 1).cast("int")
    when(line.rlike(P3164) && pri <= 191,
      outStruct(
        regexp_extract(line, P3164, 4),
        sevCol(pri), facCol(pri),
        regexp_extract(line, P3164, 2),
        regexp_extract(line, P3164, 3)))
      .otherwise(NullParse)
  }

  /** RFC 5424 first, RFC 3164 fallback (reference: src/parse.rs:21-60);
    * null = unparseable (caller drops + counts, src/connection.rs:91-95). */
  def parseAuto(line: Column): Column = coalesce(parse5424(line), parse3164(line))
}
