package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention-invariant signal: the meter must attribute
  * CPU to the gate that spent it — monotone snapshots, non-trivial
  * accrual for real work, and (the property the listener-bus drain
  * exists for) NO bleed of a finished job's task time into the next
  * snapshot window. */
class TaskTimeMeterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("task-time-meter-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("snapshots are monotone, accrue CPU for real work, and do not bleed across windows") {
    val meter = new TaskTimeMeter(spark.sparkContext)
    val s0 = meter.snapshotSec()
    assert(s0 >= 0.0)
    // a job with genuine per-row CPU (hash chain over 2M rows)
    spark.range(0, 2000000, 1, 4)
      .selectExpr("bit_xor(xxhash64(xxhash64(xxhash64(id))))")
      .write.format("noop").mode("overwrite").save()
    val s1 = meter.snapshotSec()
    assert(s1 > s0, s"no CPU accrued: $s0 -> $s1")
    // the drain property: with NO work between snapshots, the delta is
    // exactly zero — every task-end event of the previous job was
    // consumed by the s1 snapshot, none leaks into this window
    val s2 = meter.snapshotSec()
    assert(s2 == s1, s"task time bled across windows: $s1 -> $s2")
    // and a second job accrues on top (monotone, never resets)
    spark.range(0, 2000000, 1, 4)
      .selectExpr("bit_xor(xxhash64(id))")
      .write.format("noop").mode("overwrite").save()
    assert(meter.snapshotSec() > s2)
  }
}
