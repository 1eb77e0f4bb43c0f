package graft.tools

/** JSON string escaping shared by every hand-rolled artifact writer
  * (Verify's oracle dump, ScaleProbe/SkewProbe rows). Escapes
  * backslash, quote, and ALL control chars (< 0x20) — a tab or CR in
  * builder-authored free text (SQL, claim/knob/note strings) would
  * otherwise make the driver's `json.load` fail and silently zero a
  * round's receipts. */
object JsonText {
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
