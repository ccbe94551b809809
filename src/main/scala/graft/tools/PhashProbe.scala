package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val media = t("media build+count") {
      val m = graft.queries.TextPipeline.phashMedia(spark, dir); println(m.count()); m
    }
    val sig = t("sig compute") {
      val s = graft.queries.TextPipeline.phashSig(media).localCheckpoint(true)
      println(s.count()); s
    }
    t("full entry") {
      println(graft.queries.TextPipeline.phashNearDup(spark, dir).count())
    }
    spark.stop()
  }
}
