package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {

  /** The md5 planting (incl. the %50 twin convention), driver-side. */
  private def plant(k: Long): (Long, Long) = {
    val ek = if (k % 50L == 1L) k + 1L else k
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(ek.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 10000L
      + (if (k % 50L == 1L) 1L else 0L),
      java.lang.Long.parseLong(hex.substring(8, 16), 16) % 10000L)
  }

  /** Driver-side brute-force referee over the same planting. */
  private def brute(keys: Seq[Long], nQ: Int, r: Long)
      : Map[Long, (Long, Option[(Long, Long)])] = {
    val pts = keys.map { k => val (x, y) = plant(k); (k, x, y) }
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

  test("distanceSelfJoin: each qualifying pair exactly once, equal to " +
    "the n² referee") {
    import spark.implicits._
    def bruteP(keys: Seq[Long], r: Long): Set[(Long, Long, Long)] = {
      val pts = keys.map { k => val (x, y) = plant(k); (k, x, y) }
      (for {
        (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
        d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        if d2 <= r * r
      } yield (a, b, d2)).toSet
    }
    // crafted: keys whose planted coords collide or sit in adjacent
    // cells (cellSize 100 stresses cross-cell pairs)
    val keys = (1L to 400L)
    val got = Geo.distanceSelfJoin(keys.toDF("c_custkey"),
      radius = 60L, cellSize = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == bruteP(keys, 60L))
    assert(got.length == got.toSet.size, "a pair emitted twice")
    // fixture-wide at the declared parameters
    val fxKeys = tables.customer.select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val fx = Geo.distanceSelfJoin(tables.customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fx.toSet == bruteP(fxKeys, 25L))
    assert(fx.length == fx.toSet.size)
    // the %50 twin planting keeps the gate non-vacuous at EVERY sf:
    // each twin key pairs with its successor at d² = 1
    val twins = fxKeys.filter(k => k % 50L == 1L && fxKeys.contains(k + 1L))
    assert(twins.nonEmpty)
    twins.foreach { k =>
      assert(fx.contains((k, k + 1L, 1L)), s"twin pair ($k, ${k + 1})")
    }
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
