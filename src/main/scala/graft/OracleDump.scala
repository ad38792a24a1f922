package graft

/** Dev helper: write SparkEntry.oracleSql as oracle_sql.json into
  * args(0) without running any queries (pairs with [[VerifySome]] for
  * a single-key selfcheck loop). */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter(s"${args(0)}/oracle_sql.json")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t")
    out.println(SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}"))
    out.close()
  }
}
