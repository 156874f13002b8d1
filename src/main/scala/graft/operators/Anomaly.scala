package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-statistics anomaly scoring, shared by the batch query
  * (`q_anomaly_zscore`) and the streaming form
  * ([[graft.streaming.StreamAnomaly]]).
  *
  * Each row scores against the mean/stddev of the `window` rows
  * BEFORE it within its key (time-ordered): the "is this point
  * normal given recent history" gate. The rolling moments are sums
  * of DECIMAL(18,6)-quantized values — exact and order-independent,
  * where double window-sums are association-dependent (Spark's
  * sliding accumulator vs DuckDB's segment tree disagree in ulps) —
  * converted to DOUBLE only for the final mean/variance/sqrt
  * arithmetic, which is IEEE-deterministic given identical inputs.
  * Rows without a full `window` of history, or with zero variance,
  * are left unscored (z = null).
  *
  * Scale: one shuffle on the key; the rows-frame is O(1) state per
  * row in Spark's sliding-window evaluator. The streaming form keeps
  * the same `window` values per key as explicit state.
  */
object Anomaly {

  /** Adds a `z` column; null when history is short or variance 0. */
  def rollingZ(events: DataFrame, keyCol: Column, orderCols: Seq[Column],
      valueCol: Column, window: Int = 20): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(-window, -1)
    val dv = valueCol.cast("decimal(18,6)")
    events
      .withColumn("__s", sum(dv).over(w))
      .withColumn("__sq", sum(dv * dv).over(w))
      .withColumn("__c", count(dv).over(w))
      .withColumn("__mean", col("__s").cast("double") / col("__c"))
      // variance via the decimal numerator (c·Σx² − (Σx)²)/c²: the
      // E[x²] − E[x]² form subtracts two near-equal doubles and
      // cancels catastrophically for large-offset series (values
      // ~1e7 with σ ~1e-3 compute __var = 0 and silently leave every
      // row unscored); the decimal difference avoids that failure
      // mode entirely. Precision envelope, stated honestly: the two
      // products exceed decimal(38) at full scale 12, so Spark's
      // precision-loss rule rounds them at scale 6 — the numerator
      // is exact down to 1e-6·c, which leaves series with
      // σ ≲ 1e-4 unscored (__var rounds to ≤ 0). That floor is the
      // INPUT's own 1e-6 quantization grid writ large: sub-grid
      // dispersion is below the operator's measurement resolution
      // by construction, not silently mis-scored. Oracle and
      // streaming twin replay the identical formula; the readout
      // rounds at 1e-4, absorbing the shared quantization.
      .withColumn("__var",
        (col("__sq") * col("__c") - col("__s") * col("__s"))
          .cast("double") / (col("__c") * col("__c")))
      .withColumn("z", when(col("__c") === window && col("__var") > 0,
        (valueCol - col("__mean")) / sqrt(col("__var"))))
      .drop("__s", "__sq", "__c", "__mean", "__var")
  }
}
