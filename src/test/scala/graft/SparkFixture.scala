package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole forked test JVM, plus the
  * reference's 7-row person fixture (`person/BaseTest.kt:11-19`) and the
  * join fixture (`person/JoinTests.kt:11-19`). */
object SparkFixture {
  lazy val spark: SparkSession = GraftSession.build("4")

  /** name, age, city(nullable), weight(nullable) — exact reference rows. */
  lazy val person: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("Alice", 15, Option("London"), Option(54)),
      ("Bob", 45, Option("Dubai"), Option(87)),
      ("Mark", 20, Option("Moscow"), Option.empty[Int]),
      ("Mark", 40, Option("Milan"), None),
      ("Bob", 30, Option("Tokyo"), Option(68)),
      ("Alice", 20, Option.empty[String], Option(55)),
      ("Mark", 30, Option("Moscow"), Option(90))
    ).toDF("name", "age", "city", "weight")
  }

  /** name, origin, grade, age — reference `JoinTests.kt` right side. */
  lazy val person2: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("Alice", "London", 3, Option("young")),
      ("Alice", "London", 5, Option("old")),
      ("Bob", "Tokyo", 4, Option("young")),
      ("Bob", "Paris", 5, Option("old")),
      ("Mark", "Moscow", 1, Option("young")),
      ("Mark", "Moscow", 2, Option("old")),
      ("Bob", "Paris", 4, Option.empty[String])
    ).toDF("name", "origin", "grade", "age")
  }
}
