package graft

import graft.SparkSpec
import graft.operators.Export

/** The ctl-style lake maintenance surface driven through the REAL CLI
  * entry point (`Main.main`). Only the session-free commands run here —
  * `lake-read`/`lake-compact`/`lake-delete` spin up and STOP a Spark
  * session (correct for a CLI process, fatal to the suite's shared
  * session), and their underlying operators are spec'd in
  * `ExportLayoutSpec`; the CLI glue for them is the same option plumbing
  * these two commands exercise. */
class LakeCliSpec extends SparkSpec {
  import spark.implicits._

  private def captureOut(body: => Unit): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8"))(body)
    buf.toString("UTF-8")
  }

  test("lake-versions and lake-vacuum operate the snapshot log from the CLI") {
    val out = new java.io.File("target/qtmp", "lakecli")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(out)
    val dir = out.getAbsolutePath
    Export.replaceSnapshot(spark, Seq((1L, "a")).toDF("k", "s"), dir,
      meta = Map("batch" -> "0"))
    Export.replaceSnapshot(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      dir)
    // lake-versions: planning-side listing, no Spark session involved
    val listing = captureOut {
      Main.main(Array("lake-versions", "--table", dir))
    }.trim.split("\n").toSeq
    assert(listing.size === 2, s"unexpected listing: $listing")
    assert(listing(0).startsWith("v1 files=") &&
      listing(0).contains("batch=0"), listing(0))
    assert(listing(1).startsWith("v2 files="), listing(1))
    // lake-vacuum: retention through the CLI
    val vac = captureOut {
      Main.main(Array("lake-vacuum", "--table", dir, "--keep", "1"))
    }
    assert(vac.contains("dropped 1 versions"), vac)
    assert(Export.snapshotVersions(dir) === Seq(2))
    assert(Export.readSnapshot(spark, dir, 2).count() === 2)
    // empty table: graceful, not a crash
    val none = captureOut {
      Main.main(Array("lake-versions", "--table",
        new java.io.File(out, "missing").getAbsolutePath))
    }
    assert(none.contains("no versions"), none)
  }

  // lake-retag spins up and STOPS a Spark session like
  // lake-compact/lake-delete (correct for a CLI process, fatal to the
  // suite's shared session) — its operator is spec'd in
  // GraftLakeDppSpec; the CLI glue is the same option plumbing the
  // session-free verbs exercise here.

  test("lake-hint migrates a legacy table to O(1) planning from the CLI") {
    val out = new java.io.File("target/qtmp", "lakecli_hint")
    graft.util.Dirs.deleteRec(out)
    val dir = out.getAbsolutePath
    Export.replaceSnapshot(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    Export.appendSnapshot(spark, Seq((2L, "b")).toDF("k", "s"), dir)
    // simulate a legacy table: drop the hint the commits wrote
    val hint = new java.io.File(out, "_versions.hint")
    assert(hint.exists() && hint.delete())
    val msg = captureOut {
      Main.main(Array("lake-hint", "--table", dir))
    }
    assert(msg.contains("2 versions") && msg.contains("v1..v2"), msg)
    assert(hint.exists(), "lake-hint must write the head pointer")
    assert(Export.snapshotVersions(dir) === Seq(1, 2))
    // empty table: clean message via exit — covered by lake-versions path
  }

  test("lake-restore rolls the head back from the CLI, planning-side only") {
    val out = new java.io.File("target/qtmp", "lakecli_restore")
    graft.util.Dirs.deleteRec(out)
    val dir = out.getAbsolutePath
    Export.replaceSnapshot(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    Export.replaceSnapshot(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), dir)
    val msg = captureOut {
      Main.main(Array("lake-restore", "--table", dir, "--to-version", "1"))
    }
    assert(msg.contains("restored") && msg.contains("version 3"), msg)
    assert(Export.latestSnapshotVersion(dir) === 3)
    assert(Export.snapshotMeta(dir, 3) === Map("restored_from" -> "1"))
    assert(Export.readSnapshot(spark, dir, 3).count() === 1)
    // history shows the restore as a commit fact (committed_at included)
    val listing = captureOut {
      Main.main(Array("lake-versions", "--table", dir))
    }.trim.split("\n").toSeq
    assert(listing.size === 3)
    assert(listing(2).contains("restored_from=1") &&
      listing(2).contains("committed_at="), listing(2))
  }

  test("lake-clone forks a table from the CLI, planning-side only") {
    val src = new java.io.File("target/qtmp", "lakecli_clonesrc")
    val dst = new java.io.File("target/qtmp", "lakecli_clonedst")
    graft.util.Dirs.deleteRec(src); graft.util.Dirs.deleteRec(dst)
    Export.replaceSnapshot(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src.getAbsolutePath)
    val msg = captureOut {
      Main.main(Array("lake-clone", "--table", src.getAbsolutePath,
        "--to", dst.getAbsolutePath))
    }
    assert(msg.contains("cloned") && msg.contains("zero data copied"), msg)
    assert(Export.snapshotFiles(dst.getAbsolutePath, 1) ===
      Export.snapshotFiles(src.getAbsolutePath, 1))
    assert(Export.readSnapshot(spark, dst.getAbsolutePath, 1).count() === 2)
    assert(Export.snapshotMeta(dst.getAbsolutePath, 1)
      .get("cloned_from").exists(_.endsWith("@v1")))
  }

  test("lake-rename and lake-drop-column are metadata-only CLI verbs") {
    val t = new java.io.File("target/qtmp", "lakecli_rename")
    graft.util.Dirs.deleteRec(t)
    Export.replaceSnapshot(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "n"),
      t.getAbsolutePath)
    val files = Export.snapshotFiles(t.getAbsolutePath, 1)
    val m1 = captureOut {
      Main.main(Array("lake-rename", "--table", t.getAbsolutePath,
        "--from", "n", "--to", "chars"))
    }
    assert(m1.contains("renamed") && m1.contains("no data rewritten"), m1)
    val m2 = captureOut {
      Main.main(Array("lake-drop-column", "--table", t.getAbsolutePath,
        "--column", "s"))
    }
    assert(m2.contains("dropped"), m2)
    assert(Export.snapshotFiles(t.getAbsolutePath, 3) === files,
      "both verbs are metadata-only")
    val head = Export.readSnapshot(spark, t.getAbsolutePath, 3)
    assert(head.columns.toSeq === Seq("k", "chars"))
    assert(head.as[(Long, Long)].collect().sortBy(_._1).toSeq ===
      Seq((1L, 10L), (2L, 20L)))
    // ADD COLUMN: metadata-only too; existing rows read back null,
    // and re-adding the dropped name serves fresh nulls, never old bytes
    val m3 = captureOut {
      Main.main(Array("lake-add-column", "--table", t.getAbsolutePath,
        "--column", "s", "--type", "string"))
    }
    assert(m3.contains("added column s"), m3)
    assert(Export.snapshotFiles(t.getAbsolutePath, 4) === files)
    val readded = Export.readSnapshot(spark, t.getAbsolutePath, 4)
    assert(readded.columns.toSeq === Seq("k", "chars", "s"))
    assert(readded.select("s").collect().forall(_.isNullAt(0)),
      "dropped bytes resurfaced under the re-added name")
  }
}
