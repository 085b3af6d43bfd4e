package graft.tools
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(2)
    println("[ansi] enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    val r = try { spark.sql("SELECT 1.0/0.0 AS x").collect()(0).toString }
      catch { case e: Throwable => "THROWS: " + e.getClass.getSimpleName }
    println("[ansi] 1.0/0.0 -> " + r)
    val r2 = try { spark.sql("SELECT CAST(1 AS INT) * 2147483647 * 2 AS y").collect()(0).toString }
      catch { case e: Throwable => "THROWS: " + e.getClass.getSimpleName }
    println("[ansi] int overflow -> " + r2)
    spark.stop()
  }
}
