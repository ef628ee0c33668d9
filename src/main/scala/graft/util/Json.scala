package graft.util

/** Minimal JSON string escaping shared by every hand-rolled JSON writer
  * (Verify's oracle dump, the orchestrator status file, Bench output) so a
  * quote/backslash/control char in a value can never produce malformed JSON.
  */
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
