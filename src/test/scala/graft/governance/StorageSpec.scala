package graft.governance

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Footer-only storage audit: certified by invariants against the
  * real testdata footer (the oracle session cannot reach files — see
  * [[Storage]]'s Scaladoc for why this operator is spec-certified). */
class StorageSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("parquetFootprint: one row per leaf column, value counts equal row count") {
    val fp = Storage.parquetFootprint(spark, dir, "lineitem").collect()
    val table = graft.Tables.lineitem(spark, dir)
    assert(fp.map(_.getString(0)).toSet == table.schema.fieldNames.toSet)
    val n = table.count()
    fp.foreach { r =>
      assert(r.getLong(1) == n, s"${r.getString(0)}: n_values != row count")
      assert(r.getLong(2) > 0L, s"${r.getString(0)}: empty compressed chunk")
      assert(r.getLong(3) >= r.getLong(2) / 100,
        s"${r.getString(0)}: nonsensical uncompressed size")
    }
  }

  test("parquetFootprint: shares are exact ppm of total compressed bytes") {
    val fp = Storage.parquetFootprint(spark, dir, "orders").collect()
    val totalComp = fp.map(_.getLong(2)).sum
    fp.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L / totalComp)
    }
    val s = fp.map(_.getLong(4)).sum
    // floor per column: sum can undershoot by at most (columns-1) ppm
    assert(s <= 1000000L && s > 1000000L - fp.length)
  }
}
