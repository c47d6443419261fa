package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Sessions

/** Pins the cluster-sizing arithmetic in [[Sessions.forCluster]] — the
  * numbers SCALE.md's 100 TB claims are computed from. Builder-level
  * checks only (no cluster to start): the configs must land in the
  * builder's option map with the derived values.
  */
class ClusterTuningSpec extends AnyFunSuite {

  // builder options are private and starting a session per case is too
  // heavy — read the known `options` map reflectively
  private def opts(b: SparkSession.Builder): Map[String, String] = {
    val field = Iterator.iterate[Class[_]](b.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields.find(_.getName.endsWith("options")))
      .next()
    field.setAccessible(true)
    field.get(b).asInstanceOf[scala.collection.mutable.Map[String, String]].toMap
  }

  test("1000-executor / 100 TB shape: volume floor dominates the core rule") {
    val b = Sessions.forCluster(SparkSession.builder(),
      executors = 1000, coresPerExecutor = 4, executorMemGb = 8, inputTb = 100.0)
    val o = opts(b)
    // 2 x 4000 cores = 8000; 100 TB / 200 MB = ~476838 partitions -> volume wins
    assert(o("spark.sql.shuffle.partitions").toLong >= 476000L)
    assert(o("spark.sql.files.maxPartitionBytes").toLong == 256L << 20)
    assert(o("spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong == 128L << 20)
    assert(o("spark.executor.instances") == "1000")
    // the coalescing target must sit below the scan split size — AQE can
    // only merge partitions upward toward maxPartitionBytes, never split
    // a too-big scan task downward
    assert(o("spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong <
      o("spark.sql.files.maxPartitionBytes").toLong)
  }

  test("small-cluster shape: core rule dominates; semantics configs ride along") {
    val b = Sessions.forCluster(SparkSession.builder(),
      executors = 10, coresPerExecutor = 4, inputTb = 0.1)
    val o = opts(b)
    // 2 x 40 = 80 cores-rule vs 0.1 TB / 200 MiB = ceil(476.8) = 477 ->
    // volume still wins here; drop volume to see the core rule
    assert(o("spark.sql.shuffle.partitions").toLong == 477L)
    val b2 = Sessions.forCluster(SparkSession.builder(), executors = 10)
    assert(opts(b2)("spark.sql.shuffle.partitions").toLong == 80L)
    // the bit-for-bit semantics flags from tune() must be present
    assert(opts(b2)("spark.sql.session.timeZone") == "UTC")
    assert(opts(b2)("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(opts(b2)("spark.sql.parquet.outputTimestampType") == "TIMESTAMP_MICROS")
  }
}
