package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.datasources.BucketingUtils

/** Bridge into the `private[sql]` bucket-file naming law — the file
  * name is the ONLY place a bucketed table records which bucket a file
  * belongs to, and [[graft.sources.Sinks]]' partition-pruned compaction
  * needs to split a table's files into touched/untouched bucket sets.
  * Lives in an org.apache.spark.sql subpackage solely for access;
  * contains no logic. */
object BucketBridge {
  /** Bucket id encoded in a bucketed-table file name (`..._NNNNN.ext`),
    * None for a non-bucketed file name. */
  def bucketIdOf(fileName: String): Option[Int] =
    BucketingUtils.getBucketId(fileName)

  /** (numBuckets, bucketColumnNames) of a catalog table, None when the
    * table is not bucketed — lets the append path cluster incoming
    * rows into one write task per bucket. */
  def bucketSpecOf(spark: org.apache.spark.sql.SparkSession,
                   table: String): Option[(Int, Seq[String])] =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(b => (b.numBuckets, b.bucketColumnNames))
}
