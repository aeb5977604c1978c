package org.apache.spark.sql.graftglue

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Visibility seam for `V2TableWithV1Fallback` — the interface
  * `DataStreamWriter.toTable` consults to route streaming writes on
  * a DSv2 table through its provider's V1 `StreamSinkProvider` (the
  * exact seam Delta's table uses). It is `private[sql]`, so a table
  * outside the `org.apache.spark.sql` package can only implement it
  * through a bridging trait that lives inside; no copied Spark
  * code. */
trait V1FallbackTable extends V2TableWithV1Fallback
