package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Config sweep for `s_range_lsh_mp` (r14 VERDICT Next #4): macro radius
  * recall vs candidate mass for band-count × probe-set combinations, next
  * to the single-probe `s_range_lsh` point. The frozen entry constants
  * (Similarity.RangeMpBands, 4 probes/band) are chosen from this table —
  * target ≥ 0.85 macro recall at ≤ 35% candidate mass (the 64-band
  * single-probe row measured 0.708 / ~23%).
  *
  * Usage: runMain graft.tools.RangeMpProbe <sfDir>
  */
object RangeMpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.Tables.embeddings(spark, dir).count()
    println(f"corpus=$corpus rows ($dir)")
    val configs = Seq((64, false), (54, false), (32, true), (27, true), (24, true), (16, true))
    for ((b, dbl) <- configs) {
      val t0 = System.nanoTime()
      val rows = graft.queries.Similarity.rangeLshMpCore(spark, dir, b, dbl)
        .agg(sum("n_found").as("f"), sum("n_exact").as("e"),
             sum("n_cands").as("c"), count(lit(1)).as("q")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val (f, e, c, q) = (rows.getLong(0), rows.getLong(1), rows.getLong(2), rows.getLong(3))
      // degenerate-fixture guards (r15 ADVICE): recall is NaN when no
      // exact in-radius mass exists, and cands/q divides by zero with no
      // queries — abort loudly instead of printing garbage
      require(q > 0, s"degenerate fixture: zero query vectors in $dir")
      require(e > 0, s"degenerate fixture: zero exact in-radius pairs in $dir " +
        "(recall undefined at this tau/geometry)")
      val mass = c.toDouble / (q * (corpus - 1))
      println(f"bands=$b%3d probes=${if (dbl) 4 else 2} recall=${f.toDouble / e}%.3f " +
        f"mass=$mass%.3f cands/q=${c / q}%d ($sec%.1f s)")
    }
    spark.stop()
  }
}
