package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("catalog pins are the visibility boundary, not table commits") {
    val root = Files.createTempDirectory("cat").toString
    val (ta, tb) = (root + "/a", root + "/b")
    val cat = root + "/cat"
    val va = ManifestSink.append(Seq(1L, 2L).toDF("v"), ta)
    val vb = ManifestSink.append(Seq(10L).toDF("v"), tb)
    val cv = Catalog.publish(spark, cat,
      Map("a" -> (ta, va), "b" -> (tb, vb)))
    assert(cv === 0L)
    assert(Catalog.readTable(spark, cat, "a").count() === 2)
    // a later TABLE commit is invisible through the catalog until pinned
    val va2 = ManifestSink.append(Seq(3L).toDF("v"), ta)
    assert(Catalog.readTable(spark, cat, "a").count() === 2)
    Catalog.publish(spark, cat, Map("a" -> (ta, va2)))
    assert(Catalog.readTable(spark, cat, "a").count() === 3)
    // table b untouched throughout
    assert(Catalog.readTable(spark, cat, "b").count() === 1)
  }

  test("a paired publish is atomic: no catalog version tears the pair") {
    val root = Files.createTempDirectory("catp").toString
    val (ta, tb) = (root + "/a", root + "/b")
    val cat = root + "/cat"
    // invariant: a and b always carry the SAME row count in any
    // published snapshot, though their table commits happen one after
    // the other
    (1 to 4).foreach { r =>
      val va = ManifestSink.append(Seq.fill(3)(r.toLong).toDF("v"), ta)
      val vb = ManifestSink.append(Seq.fill(3)(-r.toLong).toDF("v"), tb)
      Catalog.publish(spark, cat, Map("a" -> (ta, va), "b" -> (tb, vb)))
    }
    // EVERY catalog version ever published holds the invariant — the
    // mid-transaction states (a committed, b not, catalog not) were
    // simply never visible
    (0L to Catalog.version(spark, cat)).foreach { v =>
      val na = Catalog.readTableAt(spark, cat, v, "a").count()
      val nb = Catalog.readTableAt(spark, cat, v, "b").count()
      assert(na === nb, s"catalog v$v tears the pair: a=$na b=$nb")
    }
    assert(Catalog.readTable(spark, cat, "a").count() === 12)
  }

  test("concurrent publishers of disjoint tables all land (OCC)") {
    val root = Files.createTempDirectory("catr").toString
    val cat = root + "/cat"
    val dirs = (0 until 8).map { i =>
      val d = s"$root/t$i"
      ManifestSink.append(Seq(i.toLong).toDF("v"), d)
      d
    }
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          Catalog.publish(spark, cat, Map(s"t$i" -> (dirs(i), 0L)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"publisher failed: ${errs.peek()}")
    // every transaction landed in some catalog version; the final pin
    // set carries all eight
    assert(Catalog.version(spark, cat) === 7L)
    assert(Catalog.pins(spark, cat).keySet ===
      (0 until 8).map(i => s"t$i").toSet)
  }

  test("vacuum with pinnedVersions never breaks a published snapshot") {
    val root = Files.createTempDirectory("catv").toString
    val ta = root + "/a"
    val cat = root + "/cat"
    val v0 = ManifestSink.append(Seq(1L, 2L).toDF("v"), ta)
    Catalog.publish(spark, cat, Map("a" -> (ta, v0)))
    // the table moves on: a replace supersedes v0's only batch dir
    ManifestSink.replace(Seq(9L).toDF("v"), ta)
    ManifestSink.append(Seq(10L).toDF("v"), ta)
    val protect = Catalog.pinnedVersions(spark, cat, ta)
    assert(protect === Seq(0L))
    // protected vacuum: keeps v0's manifest AND its data alive even
    // though both are outside the retention window and unreferenced by
    // the retained snapshot
    assert(ManifestSink.vacuum(spark, ta, keepVersions = 1,
      protectVersions = protect).isEmpty)
    assert(Catalog.readTable(spark, cat, "a")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // without protection the same vacuum reclaims the pinned batch —
    // the hazard pinnedVersions exists to prevent
    assert(ManifestSink.vacuum(spark, ta, keepVersions = 1).nonEmpty)
    intercept[Exception] {
      Catalog.readTable(spark, cat, "a").collect()
    }
  }

  test("stale pins are refused; rollback is explicit") {
    val root = Files.createTempDirectory("cats").toString
    val ta = root + "/a"
    val cat = root + "/cat"
    ManifestSink.append(Seq(1L).toDF("v"), ta)
    val va2 = ManifestSink.append(Seq(2L).toDF("v"), ta)
    Catalog.publish(spark, cat, Map("a" -> (ta, va2)))
    // pinning backward without opting in = a lost-update hazard
    intercept[IllegalArgumentException] {
      Catalog.publish(spark, cat, Map("a" -> (ta, 0L)))
    }
    // pinning a version the table never committed is refused outright
    intercept[IllegalArgumentException] {
      Catalog.publish(spark, cat, Map("a" -> (ta, 99L)))
    }
    // explicit rollback: allowed, and time travel still sees both eras
    val cv = Catalog.publish(spark, cat, Map("a" -> (ta, 0L)),
      allowRollback = true)
    assert(Catalog.readTable(spark, cat, "a").count() === 1)
    assert(Catalog.readTableAt(spark, cat, cv - 1, "a").count() === 2)
  }
}
