// temp dev check — deleted after use
package graft
import org.apache.spark.sql.SparkSession
object CountCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    for (q <- args(1).split(",")) {
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(s"[countcheck] $q $n")
    }
    spark.stop()
  }
}
