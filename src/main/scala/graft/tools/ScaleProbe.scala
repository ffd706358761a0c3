package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only companion to the r10 scale curve (SCALE_CURVE.md): the two
  * cell-bucketed ANN families measured superlinear under the FIXTURE
  * parameterization (centroid stride fixed at 50 → C ∝ N → the
  * corpus×centroid assignment pass is Θ(N²/50)). This probe times
  * semDedup / the IVF store pair at one scale under a RANGE of
  * centroid counts, so the curve's shape can be attributed to the
  * C-knob rather than to the operators: total ≈ Θ(N·C) assignment +
  * Θ(N²·topN²/C) within-cell pair work, optimal near C ∝ √(N).
  *
  * Usage: runMain graft.tools.ScaleProbe <dir> <stride1,stride2,...>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val strides = args(1).split(",").map(_.trim.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    println(s"[probe] corpus rows=$n dir=$dir")
    def time(label: String)(f: => Long): Unit = {
      // rep 1 warms, rep 2 reports (matches the bench's min-of-reps idea)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[probe] $label: ${ts.map(_._1).min}%.2f s (rows=${ts.last._2})")
    }
    strides.foreach { st =>
      val cents = Similarity.sampleCentroids(emb, st)
      val c = cents.count()
      time(s"semDedup stride=$st C=$c") {
        Similarity.semDedup(emb, Similarity.sampleCentroids(emb, st),
          threshold = 0.4, nProbe = 2).count()
      }
      val store = java.nio.file.Files
        .createTempDirectory("graft_probe_").toString + "/store"
      time(s"ivf append+topk stride=$st C=$c") {
        Similarity.ivfStoreAppend(emb.filter(col("vec_id") % 2 === 0), cents, store)
        Similarity.ivfStoreAppend(emb.filter(col("vec_id") % 2 === 1), cents, store)
        Similarity.ivfTopKFromStore(spark.read.parquet(store),
          emb.filter(col("vec_id") < 10), cents, k = 5, nProbe = 3).count()
      }
    }
    spark.stop()
  }
}
