package graft.syslog

/** The parsed log record — five string columns, msg non-null
  * (reference: src/parse.rs:11-18).
  */
final case class SyslogMessage(
    msg: String,
    severity: Option[String],
    facility: Option[String],
    hostname: Option[String],
    appname: Option[String])

/** RFC 5424 parser with RFC 3164 "loose" fallback (reference:
  * src/parse.rs:21-60). The keyword tables mirror the syslog PRI decode the
  * reference inherits from its syslog crates: severity = pri % 8,
  * facility = pri / 8 (golden values asserted at src/parse.rs:77-105:
  * pri 13 → user/notice, pri 190 → local7/info).
  */
object Syslog {
  val Severities: IndexedSeq[String] =
    Vector("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

  val Facilities: IndexedSeq[String] = Vector(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6", "local7")

  /** RFC3339-ish timestamp, as RFC 5424 requires. */
  private val Rfc3339 =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})""".r

  /** RFC 3164 timestamp: `Mmm [d]d hh:mm:ss`. */
  private val Bsd =
    """(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{1,2} \d{2}:\d{2}:\d{2}""".r

  /** Attempt RFC 5424, then loose RFC 3164; None = unparseable (the caller
    * counts `error.log_parse` and drops, reference src/connection.rs:91-95).
    */
  def parseLine(line: String): Option[SyslogMessage] =
    parse5424(line).orElse(parse3164(line))

  private def nil(tok: String): Option[String] = if (tok == "-") None else Some(tok)

  private def pri(line: String): Option[(Int, Int)] = {
    if (!line.startsWith("<")) return None
    val close = line.indexOf('>')
    if (close < 2 || close > 4) return None
    val digits = line.substring(1, close)
    if (!digits.forall(_.isDigit)) return None
    val p = digits.toInt
    if (p > 191) None else Some((p, close + 1))
  }

  /** `<PRI>1 TS HOST APP PROCID MSGID SD [SP MSG]`; SD is `-` or one or more
    * bracketed elements. NILVALUE `-` → null hostname/appname.
    */
  def parse5424(line: String): Option[SyslogMessage] = {
    for {
      (p, off) <- pri(line)
      rest = line.substring(off)
      _ <- if (rest.startsWith("1 ")) Some(()) else None
      toks = rest.drop(2).split(" ", 6)
      _ <- if (toks.length >= 6) Some(()) else None
      Array(ts, host, app, _, _, sdAndMsg) = toks
      _ <- if (Rfc3339.pattern.matcher(ts).matches()) Some(()) else None
      msg <- stripStructuredData(sdAndMsg)
    } yield SyslogMessage(
      msg = msg,
      severity = Some(Severities(p % 8)),
      facility = Some(Facilities(p / 8)),
      hostname = nil(host),
      appname = nil(app))
  }

  /** Drop the structured-data prefix: `-` or `[elem]…`, then one space, then
    * the free-form message. `]` inside an element may be escaped as `\]`.
    */
  private def stripStructuredData(s: String): Option[String] = {
    if (s.startsWith("- ")) return Some(s.drop(2))
    if (s == "-") return Some("")
    if (!s.startsWith("[")) return None
    var i = 0
    while (i < s.length && s.charAt(i) == '[') {
      var depthClosed = false
      i += 1
      while (i < s.length && !depthClosed) {
        s.charAt(i) match {
          case '\\' => i += 1
          case ']'  => depthClosed = true
          case _    => ()
        }
        i += 1
      }
      if (!depthClosed) return None
    }
    if (i >= s.length) Some("")
    else if (s.charAt(i) == ' ') Some(s.substring(i + 1))
    else None
  }

  /** Loose/legacy parse: accepted only when a timestamp was recovered
    * (reference: src/parse.rs:33-55). Subset: `<PRI>` optional; BSD or
    * RFC3339 timestamp; then `host tag: msg` (tag optional).
    */
  def parse3164(line: String): Option[SyslogMessage] = {
    val (sev, fac, rest) = pri(line) match {
      case Some((p, off)) =>
        (Some(Severities(p % 8)), Some(Facilities(p / 8)), line.substring(off))
      case None => (None, None, line)
    }
    val m = Bsd.pattern.matcher(rest)
    val startsBsd = m.lookingAt()
    val tsEnd =
      if (startsBsd) m.end()
      else {
        val r = Rfc3339.pattern.matcher(rest)
        if (r.lookingAt()) r.end() else return None
      }
    val after = rest.substring(tsEnd).dropWhile(_ == ' ')
    val hostEnd = after.indexOf(' ')
    if (hostEnd <= 0) return None
    val host = after.substring(0, hostEnd)
    val tail = after.substring(hostEnd + 1)
    // `tag: msg` — tag must be a short token without spaces; else no appname
    val colon = tail.indexOf(": ")
    val (app, msg) =
      if (colon > 0 && !tail.substring(0, colon).contains(' '))
        (Some(tail.substring(0, colon).takeWhile(_ != '[')), tail.substring(colon + 2))
      else (None, tail)
    Some(SyslogMessage(msg, sev, fac, Some(host), app))
  }
}
