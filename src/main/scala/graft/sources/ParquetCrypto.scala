package graft.sources

import java.util.Base64

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** In-process KMS for parquet MODULAR ENCRYPTION — the Spark-native
  * route for at-rest column encryption (the reference ships a whole
  * key-management service for this role:
  * hadoop-common/src/main/java/org/apache/hadoop/crypto/key/kms/KMSClientProvider.java:1;
  * on Spark the file format itself owns encryption and the engine
  * only needs a `KmsClient` that can hand master keys to parquet-mr's
  * public keytools machinery).
  *
  * Master keys come from the Hadoop conf key
  * `graft.encryption.key.list` — comma-separated `keyId:base64` pairs,
  * the demo stand-in for a real key service. Everything else (local
  * AES-GCM key wrapping, key metadata in the footer, per-column data
  * keys, wrong-key tag refusal) is parquet's `LocalWrapKmsClient` /
  * `PropertiesDrivenCryptoFactory` doing exactly what it would do
  * against a production KMS: at 100 TB nothing here is per-row work —
  * key unwrap happens once per file per task and is cached by
  * parquet's KeyToolkit.
  */
class GraftKmsClient extends LocalWrapKmsClient {
  private var masterKeys: Map[String, Array[Byte]] = Map.empty

  override protected def initializeInternal(): Unit = {
    val entries = Option(
      hadoopConfiguration.getTrimmedStrings(GraftKmsClient.KeyListProp))
      .getOrElse(Array.empty[String])
    masterKeys = entries.iterator.map { ent =>
      ent.split(":", 2) match {
        case Array(id, b64) => id.trim -> Base64.getDecoder.decode(b64.trim)
        case _ => throw new KeyAccessDeniedException(
          s"malformed ${GraftKmsClient.KeyListProp} entry: $ent")
      }
    }.toMap
    if (masterKeys.isEmpty)
      throw new KeyAccessDeniedException(
        s"${GraftKmsClient.KeyListProp} is empty — no master keys")
  }

  override protected def getMasterKeyFromServer(keyId: String): Array[Byte] =
    masterKeys.getOrElse(keyId,
      throw new KeyAccessDeniedException(s"unknown master key: $keyId"))
}

object GraftKmsClient {
  val KeyListProp = "graft.encryption.key.list"
}
