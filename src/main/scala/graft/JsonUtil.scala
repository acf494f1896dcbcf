package graft

/** Shared minimal JSON string escaping for the driver-contract mains
  * (Bench/Verify emit hand-assembled one-line JSON; no JSON library is on
  * the dependency list). Escapes backslash, quote, and ALL control chars
  * (< 0x20) — a tab or CR in builder-authored SQL would otherwise make the
  * driver's json.load fail and silently zero a round's artifacts. */
private[graft] object JsonUtil {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
