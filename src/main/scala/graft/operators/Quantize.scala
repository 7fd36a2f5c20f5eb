package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scalar (int8-style) embedding quantization — the storage-side
  * optimization of a large vector corpus: per-vector symmetric scale
  * `s = max|x| / 127`, codes `q_i = round(x_i / s)` ∈ [−127, 127], and
  * search runs on the dequantized reconstruction `q_i · s`. At 100 TB
  * this is a 4× scan-volume reduction for float32 corpora with ~1e-2
  * relative reconstruction error — combined with IVF bucketing it is
  * the standard disk-ANN layout.
  *
  * Codes are carried as doubles holding integral values: the VALUES are
  * exactly the int8 grid, while keeping every arithmetic step (round,
  * multiply) bit-reproducible in the DuckDB oracle — both engines round
  * half away from zero.
  */
object Quantize {

  /** (id, q array<double> of integral codes, scale double). Zero
    * vectors quantize to all-zero codes with scale 0.
    */
  def scalarQuantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    emb.select(
      col(idCol).as("id"),
      when(scale === 0.0, transform(v, _ => lit(0.0)))
        .otherwise(transform(v, x => round(x / scale))).as("q"),
      scale.as("scale"))
  }

  /** Dequantized reconstruction: (id, vec array<double>) — drop-in for
    * any Similarity operator's corpus side.
    */
  def dequantized(quantized: DataFrame): DataFrame =
    quantized.select(
      col("id"),
      transform(col("q"), q => q * col("scale")).as("vec"))
}
