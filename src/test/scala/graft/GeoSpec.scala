package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {

  /** Driver-side brute-force referee over the same planting. */
  private def brute(keys: Seq[Long], nQ: Int, r: Long)
      : Map[Long, (Long, Option[(Long, Long)])] = {
    val pts = keys.map(k => (k, k * 7919L % 10000L, k * 104729L % 10000L))
    (0 until nQ).map { qi =>
      val (qx, qy) = (qi * 2741L + 1234L) % 10000L -> ((qi * 6151L + 4321L) % 10000L)
      val hits = pts.map { case (k, x, y) =>
        (k, (x - qx) * (x - qx) + (y - qy) * (y - qy))
      }.filter(_._2 <= r * r)
      val best = if (hits.isEmpty) None
        else Some(hits.map { case (k, d2) => (d2, k) }.min)
      qi.toLong -> (hits.size.toLong, best)
    }.toMap
  }

  test("radiusSearch: pruned cell join equals the brute-force " +
    "referee, empty queries emit explicit zero rows") {
    import spark.implicits._
    val keys = (1L to 50L)
    val cust = keys.toDF("c_custkey")
    // small radius: several queries have no hits among 50 points
    val got = Geo.radiusSearch(cust, nQueries = 5, radius = 900L,
      cellSize = 500L).collect()
    assert(got.length == 5)
    val want = brute(keys, 5, 900L)
    got.foreach { row =>
      val (n, best) = want(row.getLong(0))
      assert(row.getLong(3) == n, s"qid ${row.getLong(0)} count")
      best match {
        case Some((d2, k)) =>
          assert(row.getLong(4) == d2 && row.getLong(5) == k)
        case None =>
          assert(row.isNullAt(4) && row.isNullAt(5))
      }
    }
    assert(got.exists(_.getLong(3) == 0L),
      "fixture choice should include an empty query")
  }

  test("radiusSearch: fixture-wide pruning losslessness at the " +
    "declared parameters") {
    val keys = tables.customer.select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val want = brute(keys, 5, 650L)
    val got = Geo.radiusSearch(tables.customer).collect()
    assert(got.length == 5)
    got.foreach { row =>
      val (n, best) = want(row.getLong(0))
      assert(row.getLong(3) == n, s"qid ${row.getLong(0)}")
      best.foreach { case (d2, k) =>
        assert(row.getLong(4) == d2 && row.getLong(5) == k)
      }
    }
  }
}
