package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object SparkTestSession {
  /** Root of the driver-generated parquet fixtures. Suites build their
    * sf paths from here (round-13 advisor: the absolute path had no
    * single owner, so every new suite re-hardcoded the machine
    * coupling); override with SPARK_GRAFT_TESTDATA when the fixtures
    * live elsewhere. */
  val fixtureRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")

  def fixture(sf: String): String = s"$fixtureRoot/$sf"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
