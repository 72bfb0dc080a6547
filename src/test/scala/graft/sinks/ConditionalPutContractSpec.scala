package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec

/** The shared publish-contention contract (exclusivity, winner-bytes-
  * intact, loser cleanup — [[ConditionalPutContract]]) run against ALL
  * THREE `tryPublishNew` paths: local hard-link, HDFS-contract rename
  * (through the contract-faithful [[MemHdfsFileSystem]] fake), and a
  * registered object-store seam ([[MemBlobStore.ifNoneMatchPut]] over
  * [[MemObjectStoreFileSystem]]). Plus the two negative halves of the
  * story: the `mos` scheme REFUSES without a seam, and its raw rename
  * demonstrably loses commits — the hazard the refusal exists for. */
class ConditionalPutContractSpec extends SparkSpec {

  private def hconf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.memhdfs.impl", classOf[MemHdfsFileSystem].getName)
    c.set("fs.mos.impl", classOf[MemObjectStoreFileSystem].getName)
    c
  }

  test("contract: local hard-link path (file scheme)") {
    val f = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(Files.createTempDirectory("cpc-file").toString)
    ConditionalPutContract.check(f, dir, rounds = 25)
  }

  test("contract: HDFS rename-without-overwrite path (memhdfs fake)") {
    MemBlobStore.clear("b1")
    val f = FileSystem.get(new java.net.URI("memhdfs://b1/"), hconf)
    ConditionalPutContract.check(f, new Path("memhdfs://b1/t"), rounds = 25)
  }

  test("contract: registered If-None-Match seam over the object store") {
    MemBlobStore.clear("b2")
    ManifestSink.registerConditionalPut("mos", MemBlobStore.ifNoneMatchPut)
    try {
      val f = FileSystem.get(new java.net.URI("mos://b2/"), hconf)
      ConditionalPutContract.check(f, new Path("mos://b2/t"), rounds = 25)
    } finally ManifestSink.deregisterConditionalPut("mos")
  }

  test("object-store scheme without a seam refuses loudly") {
    val f = FileSystem.get(new java.net.URI("mos://b3/"), hconf)
    val e = intercept[UnsupportedOperationException] {
      ManifestSink.tryPublishNew(f, new Path("mos://b3/t/0.manifest"), "x")
    }
    assert(e.getMessage.contains("registerConditionalPut"))
    // and nothing was published
    assert(!MemBlobStore.bucket("b3").containsKey("/t/0.manifest"))
  }

  test("object-store rename is NOT a conditional put (the hazard)") {
    // Two sequential renames onto the same destination BOTH succeed —
    // the second silently overwrites the first. This is the lost-commit
    // behavior that makes rename-as-commit unsafe on object stores, and
    // exactly what the refusal above prevents ManifestSink from relying
    // on. (Sequential is the deterministic witness: if even a fully
    // serialized second rename wins, the primitive is unconditional;
    // under true contention it can only be worse.)
    MemBlobStore.clear("b4")
    val f = FileSystem.get(new java.net.URI("mos://b4/"), hconf)
    def put(name: String, content: String): Unit = {
      val out = f.create(new Path(s"mos://b4/$name"), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    put("t1.tmp", "first-writer")
    put("t2.tmp", "second-writer")
    assert(f.rename(new Path("mos://b4/t1.tmp"), new Path("mos://b4/dst")))
    assert(f.rename(new Path("mos://b4/t2.tmp"), new Path("mos://b4/dst")),
      "second rename onto an existing destination must 'succeed' on an " +
        "object store — that is the modeled hazard")
    val got = new String(MemBlobStore.bucket("b4").get("/dst"), "UTF-8")
    assert(got === "second-writer") // first writer's commit silently lost
  }

  test("memhdfs rename IS a conditional put (contract sanity)") {
    MemBlobStore.clear("b5")
    val f = FileSystem.get(new java.net.URI("memhdfs://b5/"), hconf)
    def put(name: String, content: String): Unit = {
      val out = f.create(new Path(s"memhdfs://b5/$name"), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    put("t1.tmp", "first-writer")
    put("t2.tmp", "second-writer")
    assert(f.rename(new Path("memhdfs://b5/t1.tmp"), new Path("memhdfs://b5/dst")))
    assert(!f.rename(new Path("memhdfs://b5/t2.tmp"), new Path("memhdfs://b5/dst")))
    val got = new String(MemBlobStore.bucket("b5").get("/dst"), "UTF-8")
    assert(got === "first-writer")
    // the loser's source is left intact for it to clean up
    assert(MemBlobStore.bucket("b5").containsKey("/t2.tmp"))
  }

  test("FULL table lifecycle runs on the object-store fake via the seam") {
    // the deployment-scale claim, end to end: with ONLY the
    // If-None-Match seam registered, the whole sink stack — parquet
    // data writes through Spark's committer, manifest commits, stats,
    // snapshot reads, time travel, multi-writer contention — runs on a
    // filesystem with object-store rename semantics. The commit point
    // is never a rename: data lands under never-reused UUID dirs and
    // the manifest publishes through the seam.
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    MemBlobStore.clear("e2e")
    hconf // install fs.mos.impl
    ManifestSink.registerConditionalPut("mos", MemBlobStore.ifNoneMatchPut)
    try {
      val dir = "mos://e2e/tbl"
      assert(ManifestSink.append(spark.range(0, 100).toDF("v"), dir) === 0L)
      assert(ManifestSink.appendWithStats(
        spark.range(100, 200).toDF("v"), dir, Seq("v"),
        ndvCols = Seq("v"), topKCols = Seq("v")) === 1L)
      assert(ManifestSink.read(spark, dir).count() === 200)
      assert(ManifestSink.read(spark, dir).agg(sum($"v")).head()
        .getLong(0) === (0 until 200).sum.toLong)
      // snapshot isolation / time travel against the older version
      assert(ManifestSink.readAt(spark, dir, 0).count() === 100)
      // stats recorded through the fake round-trip
      assert(ManifestSink.ndvEstimate(spark, dir, "v").isEmpty ||
        ManifestSink.ndvEstimate(spark, dir, "v").get > 0.0)
      assert(ManifestSink.maxKeyRows(spark, dir, "v").isEmpty ||
        ManifestSink.maxKeyRows(spark, dir, "v").get >= 1L)
      // multi-writer contention: 6 concurrent appends, exactly once each
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (0 until 6).map { t =>
        scala.concurrent.Future {
          ManifestSink.append(
            spark.range(1000L + t * 10, 1000L + t * 10 + 10).toDF("v"), dir)
        }
      }
      val versions = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(180, "s"))
      pool.shutdown()
      assert(versions.sorted === (2L until 8L))
      val vals = ManifestSink.read(spark, dir)
        .filter($"v" >= 1000).collect().map(_.getLong(0))
      assert(vals.length === 60)
      assert(vals.toSet === (1000L until 1060L).toSet)
    } finally ManifestSink.deregisterConditionalPut("mos")
  }

  test("lifecycle also runs on the HDFS-contract fake, no seam needed") {
    // same stack, rename-without-overwrite commit primitive: the sink
    // must not depend on the seam where the filesystem's own rename IS
    // a conditional put
    import spark.implicits._
    MemBlobStore.clear("e2eh")
    hconf
    val dir = "memhdfs://e2eh/tbl"
    assert(ManifestSink.append(spark.range(0, 50).toDF("v"), dir) === 0L)
    assert(ManifestSink.append(spark.range(50, 80).toDF("v"), dir) === 1L)
    assert(ManifestSink.read(spark, dir).count() === 80)
    assert(ManifestSink.readAt(spark, dir, 0).count() === 50)
  }

  test("seam-backed publish composes with manifest read-back") {
    // beyond the bare primitive: a small end-to-end read of what the
    // seam published, through the filesystem the sink would use
    MemBlobStore.clear("b6")
    ManifestSink.registerConditionalPut("mos", MemBlobStore.ifNoneMatchPut)
    try {
      val f = FileSystem.get(new java.net.URI("mos://b6/"), hconf)
      val p = new Path("mos://b6/t/_manifests/0.manifest")
      assert(ManifestSink.tryPublishNew(f, p, "data/batch-1\t42"))
      assert(!ManifestSink.tryPublishNew(f, p, "loser"))
      val in = f.open(p)
      val bytes = new Array[Byte](64)
      val n = in.read(bytes); in.close()
      assert(new String(bytes, 0, n, "UTF-8") === "data/batch-1\t42")
      // listing sees exactly the published name
      val names = f.listStatus(new Path("mos://b6/t/_manifests"))
        .map(_.getPath.getName).toSeq
      assert(names === Seq("0.manifest"))
    } finally ManifestSink.deregisterConditionalPut("mos")
  }
}
