package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staging view over Silver trades.
  *
  * Re-expresses `processing/dbt/models/staging/stg_trades.sql:8-34`:
  * computed trade_value, hour/minute extraction, minute/hour buckets and
  * quality filters. Pure narrow projection — no shuffle.
  *
  * trade_value is computed as a double product cast to DECIMAL(18,8):
  * bit-for-bit deterministic on any engine (IEEE double multiply) while
  * keeping the money column exact for downstream decimal sums.
  *
  * Note Spark's `date_trunc` returns TIMESTAMP (LTZ) even for NTZ input,
  * so the buckets are cast back to TIMESTAMP_NTZ (session is UTC).
  */
object Staging {

  def stgTrades(silver: DataFrame): DataFrame =
    silver
      .filter(col("trade_time").isNotNull && col("price") > 0 && col("size") > 0)
      .withColumn("trade_value",
        (col("price").cast("double") * col("size").cast("double"))
          .cast("decimal(18,8)"))
      .withColumn("trade_hour", hour(col("trade_time")))
      .withColumn("trade_minute", minute(col("trade_time")))
      .withColumn("minute_bucket",
        date_trunc("minute", col("trade_time")).cast("timestamp_ntz"))
      .withColumn("hour_bucket",
        date_trunc("hour", col("trade_time")).cast("timestamp_ntz"))
}
