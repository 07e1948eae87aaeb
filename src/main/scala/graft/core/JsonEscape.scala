package graft.core

/** JSON string escaping shared by the driver-facing mains
  * (Bench's stdout line, Verify's oracle_sql.json): backslash, quote,
  * and ALL control chars (< 0x20) — a tab or CR in builder-authored SQL
  * would otherwise make the driver's json.load fail and silently zero a
  * round's correctness/bench artifact. One implementation so a future
  * escaping fix cannot land in one artifact and miss the other.
  */
object JsonEscape {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
