package graft

/** No-Spark memory-bandwidth ceiling probe for the spark-submit scaling
  * launcher (`scripts/spark_submit_scaling.sh`): prints the window's
  * achievable N→4N memory-bandwidth scaling as one parseable line, using
  * the SAME streaming-sum probe `graft.Bench`'s in-process protocol embeds
  * per round ([[Bench.bwBurn]]). Plain `java -cp <jar>` launchable — no
  * SparkSession, so the probe costs ~3 s and measures only the box.
  */
object MembwCeiling {
  def main(args: Array[String]): Unit = {
    val nSmall = if (args.nonEmpty) args(0).toInt else 2
    val s = Bench.bwBurn(nSmall, 1500)
    val b = Bench.bwBurn(nSmall * 4, 1500)
    println(f"membw_ceiling=${b / (4.0 * s)}%.4f")
  }
}
