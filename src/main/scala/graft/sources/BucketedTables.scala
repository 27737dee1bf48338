package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-partition a table by its join key ONCE at
  * write time so every later equi-join or aggregation on that key runs
  * exchange-free (co-located). At 100 TB the token table is written
  * bucketed by doc_id hash; per-doc joins (dedup verify, enrichment,
  * checkpoint reconciliation) then never shuffle the big side again —
  * the write amortizes the one unavoidable shuffle across every
  * downstream job.
  *
  * Bucketing uses Spark's managed-table bucket layout (HashPartitioning
  * contract), so both sides of a join bucketed by the same column count
  * report compatible output partitionings and Catalyst elides both
  * exchanges (PlanSpec asserts this).
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed by `keyCol`. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int,
                    sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keyCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
