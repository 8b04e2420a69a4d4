package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole suite (Test/fork gives it a JVM). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.build("graft-test", 4)
}
