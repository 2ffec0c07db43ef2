package org.apache.spark.sql

/** Bridge to the `private[sql]` [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * trait — the analyzer's seam for catalogs whose tables resolve reads
  * through a v1 `CatalogTable` (the Delta-catalog route). Graft's
  * catalog table extends this public re-export; the single abstract
  * member (`v1Table`) passes through unchanged. */
trait GraftV1FallbackBridge
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
