package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Strict doc_id normalization shared by the streaming scorers
  * ([[StreamingClassify]]'s degrade delivery,
  * [[StreamingDecontaminate]]): the LONG projection of the id column,
  * refusing non-integral source types up front and raising IN-ROW on
  * null ids. A bare `cast("long")` would NULL every string/decimal id
  * under non-ANSI SQL and the per-doc groupBy downstream would then
  * collapse all malformed docs into one doc_id=NULL output row —
  * silent garbage where the batch operators
  * ([[graft.ops.Dedup.hammingNearDup]],
  * `StoreVersioning.requireLongIds`) loudly refuse. This is the same
  * guard applied at the streaming seam, so whether malformed input
  * errors or silently corrupts can never flip with the delivery or
  * the model size.
  */
private[streaming] object StrictDocId {

  def longDocId(df: DataFrame, idCol: String = "doc_id"): Column = {
    val t = df.schema(idCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
      s"streaming scorer id column '$idCol' must be an integral type, got " +
        s"$t — map your ids to longs first (a silent cast would null " +
        "them out and collapse every malformed doc into one NULL-id row)")
    when(col(idCol).isNotNull, col(idCol).cast("long"))
      .otherwise(raise_error(lit(
        s"streaming scorer: null id in '$idCol' — a null id would fold " +
          "all its docs into a single NULL-keyed output row"))).as(idCol)
  }
}
