package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Skip (not fail) a test that reads the driver-generated testdata on
    * a machine where it was never generated — TestdataDriftSpec's
    * assume() posture, shared so every suite guards the same way. */
  def assumeTestdata(sfDir: String = "/root/testdata/sf0.001"): Unit =
    assume(new java.io.File(s"$sfDir/documents.parquet").exists(),
      s"driver-generated testdata missing at $sfDir")

  override def afterAll(): Unit = {
    // keep the session for sibling suites; SparkSession is process-shared
    super.afterAll()
  }
}
