package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (spark_guide.md).
  * Built through [[graft.GraftSession.builder]] so specs run on the same
  * session contract users get — including the SQL extension (graft
  * parser + table-valued functions), which queries like q149 need.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.GraftSession
    .builder("graft-test", Some("local[4]"), Some(4))
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
