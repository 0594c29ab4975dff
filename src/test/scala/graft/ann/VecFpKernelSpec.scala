package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct unit specs of the VecFp codegen kernels — the end-to-end
  * guarantees live in the knn_pq/knn_ivfpq oracles; these pin the
  * kernel edge semantics in isolation, in particular the fail-fast a
  * broken model construction must hit instead of a plausible partial
  * distance. */
class VecFpKernelSpec extends SparkSpec {
  import spark.implicits._

  private def causes(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ causes(x.getCause))

  test("adcDist sums exactly the referenced slots") {
    val kpq = 4
    // codes (1, 3) with kpq=4 -> slots 1 and 4+3=7
    val dt = Map(0 -> 10L, 1 -> 20L, 7 -> 300L, 5 -> 999L)
    val got = Seq((Seq(1, 3), dt)).toDF("codes", "dt")
      .select(VecFpExprs.adcDist(col("codes"), col("dt"), kpq).as("d"))
      .as[Long].head()
    assert(got == 320L)
  }

  test("adcDist fails fast on a missing distance-table slot") {
    // slot 7 absent: the replaced element_at fold propagated NULL here;
    // the kernel must throw, never return the partial sum 20
    val dt = Map(0 -> 10L, 1 -> 20L)
    val e = intercept[Exception] { // IllegalStateException, possibly
      // wrapped in a SparkException depending on the eval path
      Seq((Seq(1, 3), dt)).toDF("codes", "dt")
        .select(VecFpExprs.adcDist(col("codes"), col("dt"), 4))
        .collect()
    }
    assert(causes(e).exists(m =>
      m.contains("adc_dist") && m.contains("slot 7")), causes(e).mkString)
  }
}
