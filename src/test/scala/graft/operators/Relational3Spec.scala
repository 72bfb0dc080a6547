package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Relational3Spec extends SparkSpec {
  import spark.implicits._

  test("q48 count-based multiset ops equal the built-in ALL operators") {
    val ls = Seq("F", "F", "O", "O", "O", "P").toDF("status")
    val os = Seq("F", "O", "O", "X", "X").toDF("status")
    // count-based form (the q48 shape)
    val lc = ls.groupBy($"status").agg(count(lit(1)).as("__ln"))
    val oc = os.groupBy($"status").agg(count(lit(1)).as("__on"))
    val fast = lc.join(oc, Seq("status"), "full_outer")
      .na.fill(0L, Seq("__ln", "__on"))
      .select($"status",
        least($"__ln", $"__on").as("n_inter"),
        greatest($"__on" - $"__ln", lit(0L)).as("n_except"))
      .filter($"n_inter" > 0 || $"n_except" > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // built-in row-level operators
    val slow = ls.intersectAll(os).groupBy($"status")
      .agg(count(lit(1)).as("n_inter"))
      .join(os.exceptAll(ls).groupBy($"status")
        .agg(count(lit(1)).as("n_except")), Seq("status"), "full_outer")
      .na.fill(0L, Seq("n_inter", "n_except"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast === slow)
    assert(fast === Set(("F", 1L, 0L), ("O", 2L, 0L), ("X", 0L, 2L)))
  }
}
