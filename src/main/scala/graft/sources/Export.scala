package graft.sources

import org.apache.spark.sql.DataFrame

/** Export layer (K1/K3 + the CSV dumps of
  * src/polaroam/get_stops_and_clusters.py:157-185).
  */
object Export {

  /** Single-file CSV with header (K3). coalesce(1) is an explicit
    * small-result convenience, as in the reference's collected write — do
    * not use for large frames.
    */
  def csvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Snappy parquet sink (K1). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
