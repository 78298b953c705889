package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession

/** Dev utility backing SCALE.md's band-width sizing rule: measure the
  * SRP candidate-pair count on one synthetic corpus at two band widths —
  * the 16-bit default (sized for ~10⁶ corpora) and the 24-bit widening
  * (96 planes / 4 bands) the rule prescribes beyond that — to show the
  * quadratic random-collision term collapsing while the planted near-dup
  * pairs (the linear term) survive. `srpWeights` derives any prefix of
  * 128 planes byte-identically, so widening never changes oracle-pinned
  * planes.
  * Usage: tools/run.sh graft.ScaleProbeMain [corpusParquet]
  */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val path =
      if (args.nonEmpty) args(0) else "/tmp/graft_scale/emb_256000"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(path)
    val n = emb.count()
    Seq(64 -> "16-bit bands (default)", 96 -> "24-bit bands (widened)")
      .foreach { case (bits, label) =>
        val t0 = System.nanoTime()
        val bands = Dedup.srpBands(emb, "vec_id", "embedding", 64, bits, 4)
        val cand = Dedup.cosineVerifiedPairs(
          Dedup.srpKeptBands(bands, Dedup.srpHotBuckets(bands, 4096))).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"n=$n%-8d bits=$bits%-3d $label%-24s pairs=$cand%-9d ${dt}%6.2f s")
      }
    spark.stop()
  }
}
