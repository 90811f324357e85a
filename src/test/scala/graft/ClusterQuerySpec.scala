package graft

import scala.collection.immutable.ListMap
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.ClusterQuery

/** C1–C9 cluster-topology queries: the chooseworkers selection law over
  * synthetic host maps (mirroring
  * /root/reference/test/misctests_singleprocess.jl:38-51) plus live
  * local-session sanity. */
class ClusterQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("clusterquery-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val hosts = ListMap(
    "hostA" -> IndexedSeq("e1", "e2", "e3"),
    "hostB" -> IndexedSeq("e4", "e5"),
    "hostC" -> IndexedSeq("e6"))

  test("chooseWorkers prefers the local host, then fills in host order") {
    assert(ClusterQuery.chooseWorkers(hosts, 2, "hostA") == IndexedSeq("e1", "e2"))
    assert(ClusterQuery.chooseWorkers(hosts, 3, "hostB") == IndexedSeq("e4", "e5", "e1"))
    assert(ClusterQuery.chooseWorkers(hosts, 4, "hostC") == IndexedSeq("e6", "e1", "e2", "e3"))
    assert(ClusterQuery.chooseWorkers(hosts, 6, "hostB") ==
      IndexedSeq("e4", "e5", "e1", "e2", "e3", "e6"))
  }

  test("chooseWorkers with an unknown caller host fills from all hosts in order") {
    assert(ClusterQuery.chooseWorkers(hosts, 2, "nowhere") == IndexedSeq("e1", "e2"))
  }

  test("live session: topology accessors are consistent") {
    val cq = new ClusterQuery(spark)
    assert(cq.workers.nonEmpty)
    assert(cq.hostnames.length == cq.workers.length)
    assert(cq.nodenames.distinct == cq.nodenames)
    assert(cq.procsNode.values.map(_.size).sum == cq.workers.length)
    assert(cq.nprocsNode == cq.procsNode.map { case (h, ps) => (h, ps.size) })
    assert(cq.oneWorkerPerNode.keySet == cq.procsNode.keySet)
    // E8: trimming law
    assert(cq.trimmedParallelism(2) == 2)
    assert(cq.trimmedParallelism(0) == 1)
    assert(cq.trimmedParallelism(1000000) == spark.sparkContext.defaultParallelism)
  }
}
