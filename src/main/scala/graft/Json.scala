package graft

/** The one JSON string emitter for the driver artifacts. Bench and
  * Verify both hand-author JSON (no JSON library on the classpath);
  * a single escaper keeps them from drifting — control chars, quotes,
  * and backslashes must be escaped EVERYWHERE or one odd path/SQL
  * string silently breaks the round's artifact parse.
  */
private[graft] object Json {
  /** JSON string literal, fully escaped. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Array of ALREADY-RENDERED JSON values. */
  def arr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  /** Bounded array of strings: at most `cap` names plus an overflow
    * marker — a mass failure must not blow the driver's stdout window.
    */
  def cappedStrArr(xs: Seq[String], cap: Int = 8): String = {
    val shown = xs.take(cap).map(str)
    val extra =
      if (xs.length > cap) Seq(str(s"...+${xs.length - cap} more")) else Nil
    arr(shown ++ extra)
  }
}
