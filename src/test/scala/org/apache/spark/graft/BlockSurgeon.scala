package org.apache.spark.graft

import org.apache.spark.SparkEnv
import org.apache.spark.storage.RDDBlockId

/** Test-only hook into Spark's block manager (package-private API):
  * removes a SINGLE cached partition of an RDD, simulating the
  * partial-sweep scenario the derivation cache's validity probe must
  * detect — a 1-row probe alone reads only the first partition and
  * would serve a frame whose later blocks are gone.
  */
object BlockSurgeon {
  def removeRddBlock(rddId: Int, split: Int): Unit =
    SparkEnv.get.blockManager.master.removeBlock(RDDBlockId(rddId, split))
}
