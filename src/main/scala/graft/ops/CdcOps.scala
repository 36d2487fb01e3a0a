package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared keyed-changelog compaction: ONE definition of "latest record
  * per key by (ts, seq)" used by both the batch CDC queries
  * (`graft.queries.CdcQueries`) and the streaming snapshot maintainer
  * (`graft.stream.CdcIngest`) — the two are documented twins and their
  * tie-break rule must not drift. `seq` breaks equal-timestamp ties
  * deterministically. */
object CdcOps {
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
                   seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
