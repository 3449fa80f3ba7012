package pp;

import java.nio.charset.StandardCharsets;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.parquet.crypto.DecryptionKeyRetriever;
import org.apache.parquet.crypto.DecryptionPropertiesFactory;
import org.apache.parquet.crypto.FileDecryptionProperties;

/**
 * Parquet Modular Encryption reader hook for the reference corpus.
 *
 * The reference publishes the footer/column keys for its 6
 * *.parquet.encrypted files (reference README.md:37-50): footer key id
 * "kf", column keys "kc1" (double_field) and "kc2" (float_field), with
 * AAD prefix "tester" on two of the files. This factory hands those
 * keys to parquet-mr via the standard DecryptionPropertiesFactory SPI
 * (activated per-read with the public conf key
 * parquet.crypto.factory.class) -- no custom read path, Spark's normal
 * vectorized parquet reader does the decryption.
 *
 * The AAD prefix is only supplied when the caller sets
 * playground.aad.prefix in the (per-read) Hadoop conf: files that
 * store their prefix do not need it; the *disable_aad_storage* variant
 * requires it.
 */
public class PlaygroundDecryptionFactory implements DecryptionPropertiesFactory {

  // README.md lists the keys as digit sequences, e.g. {0,1,2,...}; these
  // are the ASCII digit characters (same convention as Arrow's
  // test-encryption-util.h string keys), not raw byte values.
  private static final byte[] KEY_FOOTER = "0123456789012345".getBytes(StandardCharsets.UTF_8);
  private static final byte[] KEY_COL1 = "1234567890123450".getBytes(StandardCharsets.UTF_8);
  private static final byte[] KEY_COL2 = "1234567890123451".getBytes(StandardCharsets.UTF_8);

  /** Published corpus key for a key id; null when unknown. */
  static byte[] keyFor(String keyId) {
    switch (keyId) {
      case "kf":
        return KEY_FOOTER;
      case "kc1":
        return KEY_COL1;
      case "kc2":
        return KEY_COL2;
      default:
        return null;
    }
  }

  @Override
  public FileDecryptionProperties getFileDecryptionProperties(Configuration conf, Path path) {
    DecryptionKeyRetriever retriever =
        keyMetaData -> {
          String keyId = new String(keyMetaData, StandardCharsets.UTF_8);
          switch (keyId) {
            case "kf":
              return KEY_FOOTER;
            case "kc1":
              return KEY_COL1;
            case "kc2":
              return KEY_COL2;
            default:
              return null;
          }
        };
    FileDecryptionProperties.Builder builder =
        FileDecryptionProperties.builder()
            .withKeyRetriever(retriever)
            .withPlaintextFilesAllowed();
    String aadPrefix = conf.get("playground.aad.prefix");
    if (aadPrefix != null) {
      builder.withAADPrefix(aadPrefix.getBytes(StandardCharsets.UTF_8));
    }
    return builder.build();
  }
}
