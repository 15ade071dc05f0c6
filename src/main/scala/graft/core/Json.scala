package graft.core

/** Minimal JSON string escaping shared by every main that hand-writes
  * driver-read JSON (Verify's oracle_sql.json, RunOne's sliced copy).
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or
  * CR in builder-authored SQL would otherwise make the driver's
  * json.load fail and silently zero the round's correctness. ONE
  * definition on purpose: two drifting copies would let the sliced
  * and full oracle files disagree on the comparison input. */
object Json {
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
