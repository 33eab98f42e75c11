package graft

/** Minimal JSON string escaping shared by every structured-log and
  * metadata emitter (Verify's oracle dump, stage events, job summaries).
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or CR
  * in an arbitrary string (SQL text, stage names embedding plan strings)
  * would otherwise make a consumer's json.load fail. */
object Jsons {
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
