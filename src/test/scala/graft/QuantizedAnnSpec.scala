package graft

import graft.operators.Similarity
import graft.queries.Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s06 int8-quantized ANN (§2 #34): reconstruction bound, recall vs
  * the exact s01 ground truth, and the s01 plan shape (broadcast
  * query side + WindowGroupLimit) preserved under quantization.
  */
class QuantizedAnnSpec extends AnyFunSuite with SparkSpec {

  private lazy val embs = Ops.t(spark, sfDir, "embeddings")

  test("quantized values are integers on the ±127 grid; reconstruction bounded") {
    val v = transform(col("embedding"), x => x.cast("double"))
    val q = Similarity.quantized(embs)
    val joined = embs.select(col("vec_id"), v.as("v0"))
      .withColumn("amax", array_max(transform(col("v0"), x => abs(x))))
      .join(q, "vec_id")
    val bad = joined.select(
      // grid check: every quantized component is an integer in [-127, 127]
      exists(col("v"), x => x =!= round(x) || abs(x) > Similarity.QuantLevels).as("offgrid"),
      // reconstruction: |x - q*amax/127| <= amax/(2*127) + tiny fp slack
      exists(zip_with(col("v0"), col("v"), (x, qq) =>
        abs(x - qq * col("amax") / Similarity.QuantLevels) >
          col("amax") / (2.0 * Similarity.QuantLevels) + lit(1e-12)).as("err"),
        identity).as("outofbound"))
      .filter(col("offgrid") || col("outofbound"))
    assert(bad.count() == 0)
  }

  test("recall@10 vs exact ground truth stays high on the int8 grid") {
    val truth = Similarity.bruteForceTopK(embs, Similarity.defaultQueries(embs))
    val approx = Similarity.quantizedTopK(embs)
    val r = Similarity.recallAtK(approx, truth)
    assert(r >= 0.9, f"int8 quantized recall@10 = $r%.3f < 0.9")
  }

  test("plan keeps the s01 shape: broadcast query side, WindowGroupLimit top-k") {
    val plan = GraftEngine.explainPlan(Similarity.quantizedTopK(embs))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not map-side pre-trimmed:\n$plan")
  }
}
