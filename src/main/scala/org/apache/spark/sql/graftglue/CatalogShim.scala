package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.{Table, V1Table}

/** One visibility seam for the DSv2 catalog layer: `V1Table` — the
  * wrapper the session catalog hands back for tables whose provider
  * is a V1 data source — is `private[sql]`, so unwrapping it to read
  * the underlying `CatalogTable` (provider, location) must happen
  * under the `org.apache.spark.sql` package. Same pattern external
  * connectors use; no copied Spark code. */
object CatalogShim {

  /** The catalog metadata behind a session-catalog `Table`, when it
    * is the V1 wrapper. */
  def v1Meta(tbl: Table): Option[CatalogTable] = tbl match {
    case v1: V1Table => Some(v1.v1Table)
    case _           => None
  }
}
