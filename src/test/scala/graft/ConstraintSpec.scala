package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.MergeSink

/** CHECK constraints: declared once, enforced on every admitted batch
  * across all write paths with SQL CHECK semantics (NULL passes,
  * FALSE rejects, the whole commit aborts untouched); tombstones are
  * exempt; violations name every failed constraint with a sample row.
  */
class ConstraintSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def df(rows: Seq[(Long, java.lang.Long)], rv: Long): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v").withColumn("rv", lit(rv))
  }

  test("violating batch aborts untouched; valid admits; NULL passes") {
    val t = tmp("ck_basic")
    MergeSink.setCheckConstraint(spark, t, "positive", "v >= 0")
    MergeSink.setCheckConstraint(spark, t, "small-id", "id < 100")
    // valid (and a NULL v, which SQL CHECK lets through)
    MergeSink.upsertBatch(df(Seq((1L, 10L), (2L, null)), 1L),
      t, "id", "rv", 0L, "load")
    assert(MergeSink.currentState(spark, t).get.count() == 2L)
    // violates BOTH constraints: nothing commits, both names reported
    val e = intercept[MergeSink.ConstraintViolationException] {
      MergeSink.upsertBatch(df(Seq((3L, 30L), (200L, -5L)), 2L),
        t, "id", "rv", 1L, "load")
    }
    assert(e.getMessage.contains("positive") &&
      e.getMessage.contains("small-id"))
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L))
    assert(MergeSink.currentState(spark, t).get.count() == 2L)
    // declared list round-trips in order
    assert(MergeSink.checkConstraints(spark, t) ==
      Seq("positive" -> "v >= 0", "small-id" -> "id < 100"))
    // drop one; the other still bites
    assert(MergeSink.dropCheckConstraint(spark, t, "small-id"))
    MergeSink.upsertBatch(df(Seq((200L, 5L)), 2L), t, "id", "rv", 1L, "load")
    intercept[MergeSink.ConstraintViolationException] {
      MergeSink.upsertBatch(df(Seq((4L, -1L)), 3L), t, "id", "rv", 2L, "load")
    }
  }

  test("tombstones are exempt; declaration parse-fails fast; missing column is loud") {
    val t = tmp("ck_tomb")
    MergeSink.setCheckConstraint(spark, t, "positive", "v >= 0")
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    // a delete carries no meaningful data columns — it must pass
    MergeSink.upsertBatch(
      df(Seq((1L, null)), 2L).withColumn("__deleted", lit(true)),
      t, "id", "rv", 1L, "load")
    assert(MergeSink.currentState(spark, t).get.count() == 0L)
    // a typo fails at declaration time, not at the next write
    intercept[Exception] {
      MergeSink.setCheckConstraint(spark, t, "typo", "v >>>= 0")
    }
    // a batch lacking the constrained column fails with a clear message
    val s2 = spark
    import s2.implicits._
    val noV = Seq((5L, 5L)).toDF("id", "rv")
    val e = intercept[MergeSink.ConstraintViolationException] {
      MergeSink.upsertBatch(noV, t, "id", "rv", 2L, "load")
    }
    assert(e.getMessage.contains("lacks"))
  }

  test("CREATE TABLE check.* options declare constraints inline") {
    val cat = "ckddl"
    val wh = tmp("ckddl_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.c")
    spark.sql(
      s"""CREATE TABLE $cat.c.t (id BIGINT, v BIGINT, rv BIGINT)
         |USING `graft-merge`
         |OPTIONS (key 'id', seq 'rv', `check.positive` 'v >= 0')
         |""".stripMargin)
    assert(spark.sql(s"SELECT name, expression FROM $cat.c.t.constraints")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq == Seq(("positive", "v >= 0")))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.c.t VALUES (1, -1, 1)")
    }
    assert(e.getMessage.contains("positive"))
    spark.sql(s"INSERT INTO $cat.c.t VALUES (1, 1, 1)")
    assert(spark.table(s"$cat.c.t").count() == 1L)
  }

  test("staged CTAS/RTAS: check.* constraints commit with the statement, not before") {
    val cat = "ckstg"
    val wh = tmp("ckstg_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.c")
    // a CTAS whose own rows violate its inline constraint: the staged
    // write enforces it, the whole statement aborts, and NO table and
    // NO _constraints sidecar survive for a later CREATE to inherit
    val e = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE $cat.c.t USING `graft-merge`
           |OPTIONS (key 'id', seq 'rv', `check.positive` 'v >= 0')
           |AS SELECT CAST(1 AS BIGINT) AS id, CAST(-5 AS BIGINT) AS v,
           |  CAST(1 AS BIGINT) AS rv""".stripMargin)
    }
    assert(e.getMessage.contains("positive") ||
      Option(e.getCause).exists(_.getMessage.contains("positive")))
    assert(spark.sql(s"SHOW TABLES IN $cat.c").count() == 0L)
    val strandedSidecars = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      .filter(_.getFileName.toString == "_constraints").count()
    assert(strandedSidecars == 0L, "failed CTAS stranded a _constraints file")
    // the same CTAS with valid rows commits table AND constraint together
    spark.sql(
      s"""CREATE TABLE $cat.c.t USING `graft-merge`
         |OPTIONS (key 'id', seq 'rv', `check.positive` 'v >= 0')
         |AS SELECT CAST(1 AS BIGINT) AS id, CAST(5 AS BIGINT) AS v,
         |  CAST(1 AS BIGINT) AS rv""".stripMargin)
    assert(spark.sql(s"SELECT name FROM $cat.c.t.constraints")
      .collect().map(_.getString(0)).toSeq == Seq("positive"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.c.t VALUES (2, -1, 2)")
    }
    // an aborted staged REPLACE leaves the OLD constraint set active —
    // the new rule must not leak onto the live table
    val e2 = intercept[Exception] {
      spark.sql(
        s"""REPLACE TABLE $cat.c.t USING `graft-merge`
           |OPTIONS (key 'id', seq 'rv', `check.tiny` 'v < 3')
           |AS SELECT CAST(1 AS BIGINT) AS id, CAST(5 AS BIGINT) AS v,
           |  CAST(2 AS BIGINT) AS rv""".stripMargin)
    }
    assert(e2.getMessage.contains("tiny") ||
      Option(e2.getCause).exists(_.getMessage.contains("tiny")))
    assert(spark.sql(s"SELECT name FROM $cat.c.t.constraints")
      .collect().map(_.getString(0)).toSeq == Seq("positive"),
      "aborted RTAS leaked its staged constraint onto the live table")
    // v = 5 still admits: 'tiny' is really gone, 'positive' still bites
    spark.sql(s"INSERT INTO $cat.c.t VALUES (3, 5, 3)")
    assert(spark.table(s"$cat.c.t").count() == 2L)
  }

  test("SQL surface: add_check/drop_check procedures guard INSERT and DML") {
    val cat = "ckspec"
    val wh = tmp("ck_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.c")
    spark.sql(
      s"""CREATE TABLE $cat.c.t (id BIGINT, v BIGINT, rv BIGINT)
         |USING `graft-merge` OPTIONS (key 'id', seq 'rv')""".stripMargin)
    assert(spark.sql(s"CALL $cat.sys.add_check('c.t', 'positive', 'v >= 0')")
      .head().getInt(0) == 1)
    // constraints are discoverable through the .constraints metadata table
    assert(spark.sql(s"SELECT name, expression FROM $cat.c.t.constraints")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq == Seq(("positive", "v >= 0")))
    spark.sql(s"INSERT INTO $cat.c.t VALUES (1, 10, 1), (2, 20, 1)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.c.t VALUES (3, -30, 2)")
    }
    assert(e.getMessage.contains("positive"))
    assert(spark.table(s"$cat.c.t").count() == 2L)
    // UPDATE through row-level ops is guarded too
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.c.t SET v = -1 WHERE id = 1")
    }
    assert(e2.getMessage.contains("positive"))
    assert(spark.table(s"$cat.c.t").filter(col("v") < 0).count() == 0L)
    // DELETE (tombstones) passes the constraint untouched
    spark.sql(s"DELETE FROM $cat.c.t WHERE id = 2")
    assert(spark.table(s"$cat.c.t").count() == 1L)
    // dropped -> the write admits
    assert(spark.sql(s"CALL $cat.sys.drop_check('c.t', 'positive')")
      .head().getInt(0) == 1)
    spark.sql(s"INSERT INTO $cat.c.t VALUES (3, -30, 2)")
    assert(spark.table(s"$cat.c.t").count() == 2L)
  }
}
