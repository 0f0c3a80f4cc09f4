package graft

import org.apache.spark.sql.functions._
import graft.core.Chain

case class Employee(id: Long, name: String)
case class TeamMember(player: String, sport: String, weight: Double, height: Double)

/**
 * Merge semantics mirrored from the reference's merge test fixtures
 * (reference: tests/unit/lib/test_datachain_merge.py — employees × team,
 * FIXTURES.md A4): left/inner/full cardinalities, unmatched-side nulls,
 * different-name join keys, self-merge.
 */
class MergeFixtureSpec extends SparkSpec {
  import spark.implicits._

  private def employees = Chain.readValues(spark, Seq(
    Employee(1, "Alice"), Employee(2, "Bob"),
    Employee(3, "Charlie"), Employee(4, "David")))

  private def team = Chain.readValues(spark, Seq(
    TeamMember("Alice", "soccer", 55.5, 160.0),
    TeamMember("Charlie", "tennis", 70.0, 175.0),
    TeamMember("Zoe", "chess", 50.0, 155.0)))

  test("left merge on name==player keeps all employees, nulls for unmatched") {
    val m = employees.merge(team, on = Seq("name"), rightOn = Seq("player"))
    assert(m.count() === 4)
    val bob = m.toDF.filter(col("name") === "Bob").head()
    assert(bob.isNullAt(bob.fieldIndex("sport")))
    val alice = m.toDF.filter(col("name") === "Alice").head()
    assert(alice.getAs[String]("sport") === "soccer")
  }

  test("inner merge keeps only matches") {
    val m = employees.merge(team, on = Seq("name"), rightOn = Seq("player"),
      how = "inner")
    assert(m.toDF.select("name").as[String].collect().toSet ===
      Set("Alice", "Charlie"))
  }

  test("full merge keeps both sides' unmatched rows") {
    val m = employees.merge(team, on = Seq("name"), rightOn = Seq("player"),
      how = "full_outer")
    assert(m.count() === 5) // 4 employees + Zoe
    val zoe = m.toDF.filter(col("player") === "Zoe").head()
    assert(zoe.isNullAt(zoe.fieldIndex("name")))
  }

  test("self-merge renames colliding non-key columns with rname prefix") {
    val m = employees.merge(employees, on = Seq("id"))
    assert(m.toDF.columns.toSeq === Seq("id", "name", "right_name"))
    assert(m.count() === 4)
    val r = m.toDF.filter(col("id") === 1).head()
    assert(r.getAs[String]("name") === r.getAs[String]("right_name"))
  }

  test("merge requires keys or a condition") {
    intercept[IllegalArgumentException](employees.merge(team, on = Seq.empty))
    intercept[IllegalArgumentException](
      employees.merge(team, on = Seq("name"), rightOn = Seq("player", "sport")))
  }
}
