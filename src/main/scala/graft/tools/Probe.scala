package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for probing Spark behavior in this environment. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exprs = Seq(
      "hex(cast('abc' as binary))",
      "cast(conv(substr(md5('tok'),1,15),16,10) as bigint)",                    // expect 435407939895074749
      "cast(conv(substr(md5('tok'),1,8),16,10) as bigint)",                     // expect 1622020974
      "shiftright(cast(conv(substr(md5('tok'),1,8),16,10) as bigint), 3) & 1",  // expect 1
      "aggregate(zip_with(array(0.1d,0.2d), array(0.3d,0.4d), (x,y)->x*y), 0d, (a,x)->a+x)", // expect 0.11000000000000001
      "split('a  b c', '\\\\s+')",
      "transform(sequence(0, 2), i -> concat_ws(' ', element_at(array('a','b','c','d'), i+1), element_at(array('a','b','c','d'), i+2)))",
      "array_min(transform(array('x','y'), s -> cast(conv(substr(md5(s),1,8),16,10) as bigint)))",
      "size(filter(split('the fast dog', ' '), t -> t in ('the','a')))",
      "substring(cast('abcd' as binary), 1, 2)",
      "length(cast('abcd' as binary))"
    )
    exprs.foreach { e =>
      try println(s"PROBE $e => " + spark.sql(s"SELECT $e").collect().head.get(0))
      catch { case ex: Throwable => println(s"PROBE $e FAIL " + ex.getMessage.linesIterator.next()) }
    }
    spark.stop()
  }
}
