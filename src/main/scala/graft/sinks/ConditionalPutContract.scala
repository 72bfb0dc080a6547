package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CyclicBarrier}

import org.apache.hadoop.fs.{FileSystem, Path}

/** The conformance contract every manifest publish path must satisfy —
  * local hard-link, HDFS-contract rename, and any third-party
  * [[ManifestSink.registerConditionalPut]] seam.
  *
  * [[check]] races `writers` barrier-synchronized threads per round,
  * each publishing distinct content at the SAME never-before-used name
  * (the manifest commit shape), and asserts, every round:
  *
  *   1. EXCLUSIVITY — exactly one publisher reports a win. Zero winners
  *      is a livelock (nobody committed); two is a lost commit (the
  *      failure POSIX rename and object-store copy+delete both have).
  *   2. WINNER BYTES INTACT — the published name holds exactly the
  *      winner's content: a loser must never clobber, truncate, or
  *      interleave through a shared temp.
  *   3. LOSER CLEANUP — after the round, the directory holds ONLY the
  *      published names: losers (and the winner) removed their temps.
  *
  * Seam implementors: register the seam, then run
  * `ConditionalPutContract.check(fs, new Path("scheme://bucket/dir"))`
  * — the same harness the built-in paths pass in
  * ConditionalPutContractSpec. A seam that passes here provides the
  * exclusivity [[ManifestSink.append]]'s commit-race rebase and the
  * single-writer gates build on. */
object ConditionalPutContract {

  /** Race `writers` threads × `rounds` names under `dir`; throw
    * `AssertionError` on any contract violation. `dir` must be empty
    * (or absent) on entry and is left holding exactly `rounds`
    * manifests. */
  def check(f: FileSystem, dir: Path, rounds: Int = 40,
      writers: Int = 8): Unit = {
    (0 until rounds).foreach { i =>
      val p = new Path(dir, s"$i.manifest")
      val wins = new ConcurrentLinkedQueue[Int]()
      val errs = new ConcurrentLinkedQueue[Throwable]()
      val barrier = new CyclicBarrier(writers)
      val ths = (0 until writers).map { t =>
        new Thread(() => {
          try {
            barrier.await()
            if (ManifestSink.tryPublishNew(f, p, s"writer-$t")) wins.add(t)
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      ths.foreach(_.start()); ths.foreach(_.join())
      assert(errs.isEmpty, s"round $i: publisher threw ${errs.peek()}")
      assert(wins.size == 1,
        s"round $i: expected exactly one winner, got ${wins.size} " +
          s"(${if (wins.isEmpty) "livelock" else "LOST COMMIT"})")
      val in = f.open(p)
      val content =
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      assert(content == s"writer-${wins.peek()}",
        s"round $i: published bytes '$content' are not the winner's " +
          s"(writer-${wins.peek()}) — a loser clobbered the name")
    }
    // loser cleanup: nothing but the published manifests survives
    val names = f.listStatus(dir).map(_.getPath.getName).sorted
    val expected = (0 until rounds).map(i => s"$i.manifest").sorted
    assert(names.toSeq == expected,
      s"stray files after contention (temps not cleaned): " +
        s"${names.filterNot(expected.contains).mkString(", ")}")
  }
}
