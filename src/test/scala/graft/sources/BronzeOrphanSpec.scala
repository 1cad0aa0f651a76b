package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

/** dropOrphanLocation must QUARANTINE (rename aside), never delete: a
  * "missing catalog entry" can mean a crashed run's debris — or a fresh
  * metastore over a persisted warehouse, where the bytes are live data
  * owned by another catalog. The contract: the recreate path is unwedged
  * AND the original bytes remain recoverable under `<loc>.orphan-<ts>`.
  */
class BronzeOrphanSpec extends SparkTestBase {

  test("orphan location is quarantined, not destroyed, and recreate proceeds") {
    val s = spark
    import s.implicits._
    s.sql("CREATE DATABASE IF NOT EXISTS bronze")
    val table = "orphan_spec_t"
    s.sql(s"DROP TABLE IF EXISTS bronze.$table")

    val dbLoc = s.catalog.getDatabase("bronze").locationUri.stripSuffix("/")
    val loc = new Path(s"$dbLoc/$table")
    val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
    // clear quarantine debris from earlier runs of this spec
    val parent = loc.getParent
    if (fs.exists(parent))
      fs.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(s"$table.orphan-"))
        .foreach(fs.delete(_, true))

    // Plant "live data without a catalog entry": write parquet directly at
    // the managed location, as a foreign catalog (or crashed run) would.
    Seq(("precious", 1), ("bytes", 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(loc.toString)
    assert(fs.exists(loc))

    Bronze.dropOrphanLocation(s, "bronze", table)

    // recreate path unwedged: the managed location is free again
    assert(!fs.exists(loc), "orphan location must be vacated for recreate")
    // ...but the bytes survived in quarantine
    val quarantined = fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(s"$table.orphan-"))
    assert(quarantined.length == 1,
      s"expected exactly one quarantine dir, got ${quarantined.toSeq}")
    val saved = s.read.parquet(quarantined.head.toString)
      .as[(String, Int)].collect().toSet
    assert(saved == Set(("precious", 1), ("bytes", 2)))

    // and register() over the vacated location works end-to-end
    val src = java.nio.file.Files.createTempDirectory("orphan-src").toString
    Seq(("fresh", 9)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$src/$table.parquet")
    Bronze.register(s, s"$src/$table.parquet", table)
    assert(s.table(s"bronze.$table").count() == 1)

    s.sql(s"DROP TABLE IF EXISTS bronze.$table")
    quarantined.foreach(fs.delete(_, true))
  }

  test("no-op when the location does not exist") {
    Bronze.dropOrphanLocation(spark, "bronze", "orphan_spec_never_created")
  }
}
