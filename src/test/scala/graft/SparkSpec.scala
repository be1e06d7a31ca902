package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkSpec.session

  def dfFromTuples3(data: Seq[(String, String, String)], names: (String, String, String)): DataFrame = {
    val s = spark
    import s.implicits._
    data.toDF(names._1, names._2, names._3)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
