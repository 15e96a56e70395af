package graft

import graft.format.LanceFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ALTER TABLE RENAME COLUMN (Delta column-mapping-by-name shape).
  * Contracts pinned here:
  *  - one metadata commit, zero data rewritten: fragments written BEFORE
  *    and AFTER the rename both read through the new name (stable
  *    physical names)
  *  - filter pushdown and stats pruning still work on the renamed column
  *  - structured rules REMAP in the same commit (UNIQUE key component,
  *    declared NOT NULL incl. its schema flag); free-form CHECK rules
  *    and index sidecars referencing the old name REFUSE loudly
  *  - chained renames and rename-back resolve to the right physical name
  *  - DML addresses the new name; take() reads through it
  *  - SQL surfaces: ALTER TABLE ... RENAME COLUMN, CALL rename_column
  */
class RenameColumnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "rename-")
      .toAbsolutePath.toString

  private def fs(dir: String) =
    LanceFormat.fileSystem(new Path(dir), spark.sessionState.newHadoopConf())

  test("old and new fragments read through the new name; pushdown survives") {
    val dir = tmpDir()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
      .write.format("lance").mode("overwrite").save(dir)
    val v1 = Lance.versions(spark, dir).size
    Lance.renameColumn(spark, dir, "v", "price")
    // metadata-only: one new version, same fragment files
    assert(Lance.versions(spark, dir).size == v1 + 1)
    val m = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m.mapping == Map("price" -> "v"))
    assert(m.schema.fieldNames.toSeq == Seq("id", "s", "price"))
    // fragments written AFTER the rename carry the same PHYSICAL name
    Seq((3L, "c", 30.0)).toDF("id", "s", "price")
      .write.format("lance").mode("append").save(dir)
    val back = spark.read.format("lance").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "price"))
    assert(back.select(sum(col("price"))).head.getDouble(0) == 60.0)
    // filter pushdown on the renamed column hits rows in OLD fragments
    assert(back.filter(col("price") === 10.0).select("id").as[Long].head() == 1L)
    // and in NEW fragments
    assert(back.filter(col("price") > 25.0).count() == 1)
    // projection of just the renamed column
    assert(back.select("price").as[Double].collect().sorted.toSeq ==
      Seq(10.0, 20.0, 30.0))
    // old name is gone
    intercept[Exception](back.select("v").collect())
    // chained rename + rename back resolve the physical name correctly
    Lance.renameColumn(spark, dir, "price", "cost")
    assert(LanceFormat.readLatest(fs(dir), new Path(dir)).get.mapping ==
      Map("cost" -> "v"))
    Lance.renameColumn(spark, dir, "cost", "v")
    val m3 = LanceFormat.readLatest(fs(dir), new Path(dir)).get
    assert(m3.mapping.isEmpty, s"rename-back must clear the mapping: ${m3.mapping}")
    assert(spark.read.format("lance").load(dir)
      .select(sum(col("v"))).head.getDouble(0) == 60.0)
  }

  test("structured rules remap; CHECK and index references refuse") {
    val dir = tmpDir()
    Seq((1L, 1L, Some(10.0))).toDF("src", "doc", "v")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.addUniqueConstraint(spark, dir, Seq("src", "doc"))
    Lance.setNotNull(spark, dir, "v")
    Lance.renameColumn(spark, dir, "doc", "doc_id")
    Lance.renameColumn(spark, dir, "v", "score")
    val rules = Lance.constraints(spark, dir)
    assert(rules("unique_src_doc") == "__unique__:src,doc_id", rules.toString)
    assert(rules.contains("not_null_score") && !rules.contains("not_null_v"))
    // the declaration survived: schema flag under the NEW name, and a
    // null batch refuses with the remapped rule's name
    assert(!spark.read.format("lance").load(dir).schema("score").nullable)
    val e = intercept[Exception] {
      Seq((2L, 2L, Option.empty[Double])).toDF("src", "doc_id", "score")
        .write.format("lance").mode("append").save(dir)
    }
    assert(e.getMessage.contains("not_null_score") ||
      Option(e.getCause).exists(_.getMessage.contains("not_null_score")), e.getMessage)
    // the remapped UNIQUE still enforces on the renamed component
    Seq((1L, 2L, Some(1.0))).toDF("src", "doc_id", "score")
      .write.format("lance").mode("append").save(dir) // new tuple: lands
    intercept[Exception] {
      Seq((1L, 2L, Some(2.0))).toDF("src", "doc_id", "score")
        .write.format("lance").mode("append").save(dir) // collision: refused
    }
    // free-form CHECK referencing the column refuses the rename
    Lance.addConstraint(spark, dir, "score_pos", "score > 0.0")
    val c = intercept[Exception](Lance.renameColumn(spark, dir, "score", "s2"))
    assert(c.getMessage.contains("score_pos"), c.getMessage)
    // an index sidecar referencing the column refuses the rename
    val dir2 = tmpDir()
    Seq((1L, "alpha beta"), (2L, "gamma")).toDF("id", "text")
      .write.format("lance").mode("overwrite").save(dir2)
    graft.index.ScalarIndex.build(spark, dir2, "id")
    val i = intercept[Exception](Lance.renameColumn(spark, dir2, "id", "key"))
    assert(i.getMessage.contains("index"), i.getMessage)
    // basic refusals
    intercept[Exception](Lance.renameColumn(spark, dir, "nope", "x"))
    intercept[Exception](Lance.renameColumn(spark, dir, "src", "doc_id"))
  }

  test("a stale append cannot silently revert a rename; physical reuse refuses") {
    val dir = tmpDir()
    Seq((1L, 10.0)).toDF("id", "v").write.format("lance").mode("overwrite").save(dir)
    val root = new Path(dir)
    val f = fs(dir)
    val staleSchema = LanceFormat.readLatest(f, root).get.schema // (id, v)
    Lance.renameColumn(spark, dir, "v", "price")
    // the lost-update shape: a writer that derived its schema before the
    // rename commits — its "v" IS price's stable physical name, so the
    // retry loop maps it back to the current logical name
    val m = LanceFormat.commitAppend(f, root, staleSchema, Seq.empty)
    assert(m.schema.fieldNames.toSeq == Seq("id", "price"),
      s"rename must survive a stale append: ${m.schema.fieldNames.toSeq}")
    assert(m.mapping == Map("price" -> "v"))
    // time travel still shows the OLD name at the pre-rename version
    assert(spark.read.format("lance").option("versionAsOf", "1").load(dir)
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // rename-flavored resurrection: a NEW column may not reuse the
    // physical name — old fragments hold its bytes
    val e = intercept[Exception] {
      Seq((2L, 20.0, "x")).toDF("id", "price", "v").write.format("lance")
        .option("write.merge-schema", "true").mode("append").save(dir)
    }
    assert(e.getMessage.contains("PHYSICAL") ||
      Option(e.getCause).exists(_.getMessage.contains("PHYSICAL")), e.getMessage)
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_ren2", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_ren2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_ren2.db")
      spark.sql("CREATE TABLE lance_ren2.db.t (id BIGINT, v DOUBLE) USING lance")
      spark.sql("INSERT INTO lance_ren2.db.t VALUES (1, 5.0)")
      spark.sql("ALTER TABLE lance_ren2.db.t RENAME COLUMN v TO price")
      val a = intercept[Exception](
        spark.sql("ALTER TABLE lance_ren2.db.t ADD COLUMNS (v STRING)"))
      assert(a.getMessage.contains("PHYSICAL"), a.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_ren2")
      spark.conf.unset("spark.sql.catalog.lance_ren2.warehouse")
    }
  }

  test("DML and take() address the new name; SQL surfaces work") {
    val dir = tmpDir()
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .write.format("lance").mode("overwrite").save(dir)
    Lance.renameColumn(spark, dir, "v", "price")
    operators.Dml.updateWhere(spark, dir, col("id") === 2L,
      Seq("price" -> lit(99.0)))
    assert(spark.read.format("lance").load(dir)
      .filter(col("id") === 2L).select("price").as[Double].head() == 99.0)
    operators.Dml.deleteWhere(spark, dir, col("price") === 30.0)
    assert(spark.read.format("lance").load(dir).count() == 2)
    val taken = Lance.take(spark, dir, Seq(0L))
    assert(taken.schema.fieldNames.contains("price"))
    // SQL: catalog ALTER + CALL
    val wh = tmpDir()
    spark.conf.set("spark.sql.catalog.lance_ren", "graft.catalog.LanceCatalog")
    spark.conf.set("spark.sql.catalog.lance_ren.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE lance_ren.db")
      spark.sql("CREATE TABLE lance_ren.db.t (id BIGINT, amount DOUBLE) USING lance")
      spark.sql("INSERT INTO lance_ren.db.t VALUES (1, 5.0), (2, 7.0)")
      spark.sql("ALTER TABLE lance_ren.db.t RENAME COLUMN amount TO total")
      assert(spark.sql("SELECT SUM(total) FROM lance_ren.db.t")
        .head.getDouble(0) == 12.0)
      spark.sql("CALL lance_ren.rename_column('db.t', 'total', 'grand_total')")
      assert(spark.sql("SELECT SUM(grand_total) FROM lance_ren.db.t")
        .head.getDouble(0) == 12.0)
    } finally {
      spark.conf.unset("spark.sql.catalog.lance_ren")
      spark.conf.unset("spark.sql.catalog.lance_ren.warehouse")
    }
  }
}
