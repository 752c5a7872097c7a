package graft.table

/** Spark escapes special characters in partition directory names with %XX
  * (hive convention — see Spark's ExternalCatalogUtils.escapePathName).
  * Logical partition paths in the commit log use the raw cast-to-string
  * contract ("f=1995-01-01 00:00:00"), so every hop between logical path and
  * filesystem path goes through these two functions. Dates are the critical
  * case (SURVEY §7.3: the string-format contract must hold or resume counts
  * diverge).
  */
object PathCodec {
  private val needsEscape: Set[Char] =
    "\"#%'*/:=?\\{[]^".toSet

  private def escapeComponent(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (c < ' ' || c == '\u007F' || needsEscape(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  /** Logical partition path ("f=v/f2=v2", raw values) → on-disk relative dir
    * path (escaped values).
    */
  def escape(partitionPath: String): String =
    partitionPath.split("/").map { component =>
      component.split("=", 2) match {
        case Array(k, v) => s"${escapeComponent(k)}=${escapeComponent(v)}"
        case _ => escapeComponent(component)
      }
    }.mkString("/")

  /** On-disk dir path → logical partition path. */
  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
