package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + scratch catalog dir for engine specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def freshRoot(): String =
    Files.createTempDirectory("graft-test-").toString

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // library functions arrive via the extensions hook, the same way a
    // cluster deployment gets them (spark.sql.extensions=graft.GraftExtensions)
    .withExtensions(new GraftExtensions)
    .getOrCreate()
}
