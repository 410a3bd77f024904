package graft.sources

/** Core record types of the reference domain (reference Utils.scala:8-14):
  * primitives only (String/Double), the canonical long-form records that
  * flow between pipeline stages.
  */
final case class SitelinkEntry(id: String, site: String, title: String)

final case class PagecountEntry(site: String, title: String, pageviews: Double)

final case class SitelinkPageviewsEntry(
    id: String, site: String, title: String, pageviews: Double)

final case class RankedEntry(
    id: String, site: String, title: String, pageviews: Double, rank: Double)
