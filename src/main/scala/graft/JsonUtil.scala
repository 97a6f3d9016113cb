package graft

/** JSON string escaping shared by the tool mains (Verify, ProbeCompare):
  * backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL or a quote in a path would otherwise emit invalid
  * JSON and silently break the driver's json.load. */
private[graft] object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
